package graft

import org.apache.spark.sql.functions._

/** Round-14 additions: roundsPerCycle batching of the fixed-round
 * power-iteration family (Eigenvector/Hits/Katz/Salsa) — k rounds
 * chained lazily per lineage cut must never change the trajectory. */
class Round14Spec extends TestBase {
  import spark.implicits._

  // 25-vertex circulant with chords, forced DISTRIBUTED (threshold 0) so
  // the batched superstep loop itself is under test, not the local tail
  private def fixture: GraphFrame = {
    val v = (0L until 25L).toDF(GraphFrame.ID)
    val e = v.select(col(GraphFrame.ID).as(GraphFrame.SRC),
        pmod(col(GraphFrame.ID) + 7, lit(25)).as(GraphFrame.DST))
      .unionByName(v.filter(col(GraphFrame.ID) % 3 === 0)
        .select(col(GraphFrame.ID).as(GraphFrame.SRC),
          pmod(col(GraphFrame.ID) * 3 + 1, lit(25)).as(GraphFrame.DST)))
      .filter(col(GraphFrame.SRC) =!= col(GraphFrame.DST))
    GraphFrame(v, e)
  }

  private def assertSame(runs: Seq[Map[Long, Seq[Double]]], tag: String): Unit = {
    val base = runs.head
    for (m <- runs.tail; (k, xs) <- base) {
      val ys = m(k)
      xs.zip(ys).foreach { case (x, y) =>
        // sums are re-associated across plans, so exact bit equality is
        // not the contract — agreement far below the oracle's 6-decimal
        // rounding is
        assert(math.abs(x - y) <= 1e-12 * math.max(1.0, math.abs(x)),
          s"$tag vertex $k: $xs vs $ys")
      }
    }
  }

  test("eigenvector: roundsPerCycle never changes the trajectory") {
    val g = fixture
    val runs = Seq(1, 3, 8).map { k =>
      g.eigenvector.maxIter(10).setSmallGraphThreshold(0).roundsPerCycle(k)
        .run().collect()
        .map(r => r.getLong(0) -> Seq(r.getDouble(1))).toMap
    }
    assertSame(runs, "eigenvector")
  }

  test("katz: roundsPerCycle never changes the trajectory") {
    val g = fixture
    val runs = Seq(1, 3, 8).map { k =>
      g.katz.alpha(0.05).beta(1.0).maxIter(9).setSmallGraphThreshold(0)
        .roundsPerCycle(k).run().collect()
        .map(r => r.getLong(0) -> Seq(r.getDouble(1))).toMap
    }
    assertSame(runs, "katz")
  }

  test("hits: roundsPerCycle never changes the trajectory (odd maxIter)") {
    val g = fixture
    val runs = Seq(1, 3, 8).map { k =>
      g.hits.maxIter(5).setSmallGraphThreshold(0).roundsPerCycle(k)
        .run().collect()
        .map(r => r.getLong(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap
    }
    assertSame(runs, "hits")
  }

  test("salsa: roundsPerCycle never changes the trajectory") {
    val g = fixture
    val runs = Seq(1, 3, 8).map { k =>
      g.salsa.maxIter(5).setSmallGraphThreshold(0).roundsPerCycle(k)
        .run().collect()
        .map(r => r.getLong(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap
    }
    assertSame(runs, "salsa")
  }

  test("batched distributed path still matches the local tail") {
    val g = fixture
    def pair(tag: String, dist: => Map[Long, Seq[Double]],
        local: => Map[Long, Seq[Double]]): Unit =
      assertSame(Seq(dist, local), tag)
    pair("eigenvector",
      g.eigenvector.maxIter(10).setSmallGraphThreshold(0).run().collect()
        .map(r => r.getLong(0) -> Seq(r.getDouble(1))).toMap,
      g.eigenvector.maxIter(10).run().collect()
        .map(r => r.getLong(0) -> Seq(r.getDouble(1))).toMap)
    pair("hits",
      g.hits.maxIter(5).setSmallGraphThreshold(0).run().collect()
        .map(r => r.getLong(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap,
      g.hits.maxIter(5).run().collect()
        .map(r => r.getLong(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap)
  }

  test("roundsPerCycle rejects out-of-range k") {
    val g = fixture
    intercept[IllegalArgumentException] { g.eigenvector.roundsPerCycle(0) }
    intercept[IllegalArgumentException] { g.katz.roundsPerCycle(9) }
    intercept[IllegalArgumentException] { g.hits.roundsPerCycle(0) }
    intercept[IllegalArgumentException] { g.salsa.roundsPerCycle(9) }
  }

  // ---------------- maxLinksPerPage + quantileCut ----------------

  test("extractLinks cap keeps first n non-empty links and counts the rest") {
    val rows = Seq(
      (1, "<a href=\"u1\">a</a><a href=''>e</a><a href='u2'>b</a>" +
        "<a href=\"u3\">c</a>"),
      (2, "<a href=\"only\">x</a>"),
      (3, "no links here")).toDF("id", "html")
    // NOTE: double-quoted matches extract before single-quoted ones, so
    // document order within each quote style — u1, u3 then u2
    val capped = pipeline.Web.extractLinks(rows, "id", "html",
      maxLinksPerPage = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(capped.toSet == Set((1, "u1", 1L), (1, "u3", 1L), (2, "only", 0L)),
      capped.mkString(", "))
    // uncapped output is the original (id, link) shape — no new column
    assert(pipeline.Web.extractLinks(rows, "id", "html")
      .columns.toSeq == Seq("id", "link"))
    intercept[IllegalArgumentException] {
      pipeline.Web.extractLinks(rows, "id", "html", maxLinksPerPage = -1)
    }
  }

  test("linkGraph cap bounds the per-page fan-out before aggregation") {
    val rows = Seq((1, "http://s.com/p",
      "<a href=\"http://a.com/1\">1</a><a href=\"http://b.com/2\">2</a>" +
        "<a href=\"http://c.com/3\">3</a>")).toDF("id", "url", "html")
    val capped = pipeline.Web.linkGraph(rows, "id", "url", "html",
      maxLinksPerPage = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(capped == Map(("s.com", "a.com") -> 1L, ("s.com", "b.com") -> 1L),
      capped.toString)
  }

  test("quantileCut keeps score >= the group's exact q-threshold; nulls drop") {
    val rows = Seq((1, "en", 1.0), (2, "en", 2.0), (3, "en", 3.0),
      (4, "en", 4.0), (5, "de", 10.0))
      .toDF("id", "lang", "sc")
      .unionByName(Seq((6, "en")).toDF("id", "lang")
        .withColumn("sc", lit(null).cast("double")))
    val kept = pipeline.Sampling.quantileCut(rows, "lang", "sc", 0.5)
      .collect().map(_.getInt(0)).sorted.toSeq
    // en: n=4, rank ceil(0.5*4)=2 → threshold 2.0 → keep 2,3,4; de: its
    // only value is its own threshold → keep 5; the null-score row drops
    assert(kept == Seq(2, 3, 4, 5), kept.toString)
    // schema preserved
    assert(pipeline.Sampling.quantileCut(rows, "lang", "sc", 0.5)
      .columns.toSeq == Seq("id", "lang", "sc"))
  }

  // ---------------- unigram LM tokenizer ----------------

  test("unigram hard-EM train + viterbi encode on a hand-computed fixture") {
    val docs = Seq((1, "ab ab b")).toDF("id", "text")
    val (v, e) = pipeline.Tokenizer.unigramTrainEncode(docs, "id", "text",
      vocabSize = 2, maxPieceLen = 2, iterations = 2)
    val vm = v.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // seed: ab=2, a=2, b=3 (C=7, V=3). EM segments "ab"->[ab], "b"->[b]
    // both rounds -> counts ab=2, b=1, a=0; final smoothed costs over
    // denom 3+3=6: ab -round(ln(3/6)e6)=693147, a ln(1/6)->1791759,
    // b ln(2/6)->1098612
    assert(vm == Map("ab" -> ((2L, 693147L)), "a" -> ((0L, 1791759L)),
      "b" -> ((1L, 1098612L))), vm.toString)
    val em = e.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 3 words -> 3 tokens, cost 2*693147 + 1098612
    assert(em.toSeq == Seq((1, 3L, 3L, 2484906L, 0L)), em.mkString(", "))
  }

  test("unigram viterbi tie-break: equal (cost, ntok) prefers the smaller backpointer") {
    val docs = Seq((1, "abc")).toDF("id", "text")
    val v = pipeline.Tokenizer.unigramTrain(docs, "text",
      vocabSize = 4, maxPieceLen = 2, iterations = 1)
    val counts = v.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // all seed pieces count 1 -> equal costs; [a,bc] and [ab,c] tie on
    // (cost, ntok); bp at pos 3 takes the smaller start (1, piece "bc")
    assert(counts == Map("a" -> 1L, "bc" -> 1L, "ab" -> 0L, "b" -> 0L,
      "c" -> 0L), counts.toString)
  }

  test("unigram encode reports unsegmentable and over-long words, never costs them") {
    val docs = Seq((1, "ab xy"), (2, "toolong ab")).toDF("id", "text")
    import spark.implicits._
    val vocab = Seq(("ab", 100L)).toDF("piece", "cost_micro_nats")
    val got = pipeline.Tokenizer.unigramEncode(docs, "id", "text", vocab,
      maxPieceLen = 2, maxWordLen = 4).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1: "xy" shares no vocab piece -> skipped; doc 2: "toolong" is
    // over maxWordLen -> skipped; "ab" encodes in both
    assert(got == Map(1 -> ((2L, 1L, 100L, 1L)), 2 -> ((2L, 1L, 100L, 1L))),
      got.toString)
  }

  test("hits maxIter=0 still normalizes the all-ones init (no loop, no observation)") {
    val m = fixture.hits.maxIter(0).setSmallGraphThreshold(0).run().collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // 25 vertices, all-ones both columns → each value 1/sqrt(25) = 0.2
    assert(m.size == 25 && m.values.forall { case (h, a) =>
      math.abs(h - 0.2) < 1e-15 && math.abs(a - 0.2) < 1e-15 }, m.toString)
  }

  // ---------------- WordPiece tokenizer ----------------

  test("wordpiece vocab + greedy longest-match encode on a hand-computed fixture") {
    val docs = Seq((1, "abab ab cd")).toDF("id", "text")
    val (v, e) = pipeline.Tokenizer.wordpieceVocabEncode(docs, "id", "text",
      vocabSize = 2, maxPieceLen = 2, maxWordLen = 8)
    val vm = v.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // multi-char counts: ab=2, ##ba=1, ##ab=1, cd=1 → top-2 = ab, ##ab
    // ('#' < 'c'); singles: a=2, c=1, ##a=1, ##b=3, ##d=1
    assert(vm == Map("ab" -> 2L, "##ab" -> 1L, "a" -> 2L, "c" -> 1L,
      "##a" -> 1L, "##b" -> 3L, "##d" -> 1L), vm.toString)
    val em = e.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // abab → [ab, ##ab] (longest-first, NOT a+##b+...); ab → [ab];
    // cd → [c, ##d] (cd lost the top-2 race) → 5 tokens, 0 UNK
    assert(em.toSeq == Seq((1, 3L, 5L, 0L)), em.mkString(", "))
  }

  test("wordpiece encode reports stuck and over-long words as UNK, never costs them") {
    val docs = Seq((1, "ab aq abq toolong")).toDF("id", "text")
    val vocab = Seq("ab", "##b", "x").toDF("piece")
    val got = pipeline.Tokenizer.wordpieceEncode(docs, "id", "text", vocab,
      maxPieceLen = 2, maxWordLen = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // "aq" stuck at pos 0, "abq" stuck at pos 2 (no ##q), "toolong" over
    // maxWordLen → 3 UNK; only "ab" encodes (1 token)
    assert(got.toSeq == Seq((1, 4L, 1L, 3L)), got.mkString(", "))
  }

  // ---------------- streaming ANN index ingest ----------------

  test("streaming ANN ingest: grown index equals the from-scratch index (re-ingest idempotent)") {
    val dim = 8
    def vec(id: Long): Seq[Float] =
      (0 until dim).map(j => ((id * 31 + j * 7) % 13).toFloat - 6f)
    val all = (0L until 30L).map(id => (id, vec(id)))
    val df = all.toDF("vec_id", "embedding")
    val model = pipeline.Similarity.ivfPqModel(df, "vec_id", "embedding",
      nlist = 4, m = 4, ksub = 4)
    val corpusIdx = pipeline.Similarity.ivfPqIndex(
      all.filter(_._1 < 14).toDF("vec_id", "embedding"),
      "vec_id", "embedding", model).localCheckpoint(true)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    var live: org.apache.spark.sql.DataFrame = null
    val q = streaming.EventStreams.annIngestStream(
        in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        model, corpusIdx, (idx, _) => live = idx)
      .queryName("r14_ann_ingest").start()
    // batch 1 re-ingests 10-13 over the corpus index; batch 2 is novel
    in.addData(all.filter(x => x._1 >= 10 && x._1 < 20)); q.processAllAvailable()
    in.addData(all.filter(_._1 >= 20)); q.processAllAvailable()
    q.stop()
    val scratch = pipeline.Similarity.ivfPqIndex(df, "vec_id", "embedding", model)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Any](2).toList))
    val (l, s0) = (rows(live), rows(scratch))
    assert(l.length == s0.length && l.toSet == s0.toSet,
      s"live ${l.length} vs scratch ${s0.length}")
  }

  // ---------------- Gopher composite quality rules ----------------

  test("gopher rules: each flag fires on its own hand-built document") {
    val docs = Seq(
      (1, "the cat sat with the mat here now yes we"), // clean → keep
      (2, "a b"),                                      // too short, avg len 1
      (3, "x\n• one\n• two\n• three\n• four"),         // 4/5 bullet lines
      (4, "see more here ok fine stuff...\nand more too..."), // ellipsis + symbols
      (5, null.asInstanceOf[String]))                  // null text → empty
      .toDF("id", "text")
    val got = pipeline.Text.gopherRules(docs, "id", "text",
      minWords = 5, maxWords = 100, maxBulletPct = 50, minStopwords = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    def flag(id: Int, name: String): Boolean =
      got(id).getBoolean(got(id).fieldIndex(name))
    assert(flag(1, "keep"), got(1).toString)
    assert(!flag(2, "ok_word_count") && !flag(2, "ok_word_length") &&
      !flag(2, "keep"), got(2).toString)
    assert(!flag(3, "ok_bullets"), got(3).toString)
    assert(!flag(4, "ok_ellipsis") && !flag(4, "ok_symbol_ratio"),
      got(4).toString)
    assert(got(5).getLong(got(5).fieldIndex("n_words")) == 0L &&
      !flag(5, "keep"), got(5).toString)
    // exact count audit on the clean doc: 10 words, 31 chars, 2 stopwords
    assert(got(1).getLong(got(1).fieldIndex("n_words")) == 10L &&
      got(1).getLong(got(1).fieldIndex("n_word_chars")) == 31L &&
      got(1).getLong(got(1).fieldIndex("n_stopwords_found")) == 2L,
      got(1).toString)
  }

  // ---------------- r14 optimization: banded (thresholded) levenshtein --

  test("fuzzyPairs banded verify: maxDist=0 keeps only exact duplicates") {
    // the r14 optimization switched the verify to the THRESHOLDED
    // levenshtein (banded DP, -1 past the band); threshold = 0 is its
    // edge case — only dist-0 (equal strings) may survive, with dist
    // reported as 0, and near-misses (dist 1) must drop
    val rows = Seq((1L, "same"), (2L, "same"), (3L, "sane"), (4L, "same"))
      .toDF("id", "name")
    val got = pipeline.Dedup.fuzzyPairs(rows, "id", "name",
        substring(col("name"), 1, 2), maxDist = 0, maxBlock = 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)), got.toString)
  }

  test("fuzzyPairs banded verify: reported distances are exact, far pairs drop") {
    // distances 0..maxDist must come back EXACT (not clamped), and a pair
    // past the band must vanish rather than appear with -1
    val rows = Seq((1L, "abcdef"), (2L, "abcdex"), (3L, "abcxyx"),
      (4L, "abcdef")).toDF("id", "name")
    val single = pipeline.Dedup.fuzzyPairs(rows, "id", "name",
        substring(col("name"), 1, 3), maxDist = 2, maxBlock = 10)
      .as[(Long, Long, Int)].collect().toSet
    // 1-2: 1 edit; 1-4: 0; 2-4: 1; 2-3: 2 edits; 1-3: 3 edits (dropped);
    // 3-4: 3 edits (dropped)
    assert(single == Set((1L, 2L, 1), (1L, 4L, 0), (2L, 4L, 1), (2L, 3L, 2)),
      single.toString)
    val multi = pipeline.Dedup.fuzzyPairs(rows, "id", "name",
        Seq(substring(col("name"), 1, 3), substring(col("name"), -1, 1)),
        maxDist = 2, maxBlock = 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(multi == single, s"multi-key banded verify diverged: $multi")
  }
}
