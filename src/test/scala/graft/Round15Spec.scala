package graft

import org.apache.spark.sql.functions._

/** Round-15 optimization equivalence pins: every restructured operator
 * must produce bit-identical output to its previous spelling (the oracle
 * gate proves it end-to-end at the SFs; these pin the specific
 * equivalence arguments at operator granularity). */
class Round15Spec extends TestBase {
  import spark.implicits._

  private lazy val vecs = {
    // 12 deterministic 4-dim embeddings with some mutual-neighbor
    // structure (three tight groups of four)
    val rows = (0 until 12).map { i =>
      val g = i / 4
      val j = i % 4
      (i.toLong, Seq(1.0f + g, 0.5f * j, if (g == 1) 2f else 0f, 0.1f * i))
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }

  test("knnGraph mutual: unordered-pair aggregation equals the reversed-pair self-join") {
    val got = pipeline.Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3)
    // reference: the r14 spelling — directed top-k joined to its reverse
    val t = pipeline.Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3,
      mutual = false)
    val ref = t.as("f").join(t.as("r"),
        col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
      .filter(col("f.src") < col("f.dst"))
      .select(col("f.src").as("src"), col("f.dst").as("dst"))
    assert(rows(got) == rows(ref))
    assert(got.count() > 0, "fixture must exercise at least one mutual edge")
  }

  test("cmsTopK single-pass spelling equals the counter-build + estimate reference") {
    val toks = spark.createDataFrame(
      (0 until 300).map(i => Tuple1(s"tok${i % 17}"))).toDF("term")
    val got = pipeline.Sketches.cmsTopK(toks, "term", k = 5, depth = 3, width = 16)
    val counters = pipeline.Sketches.cmsCounters(toks, "term", depth = 3, width = 16)
    val est = pipeline.Sketches.cmsEstimate(counters, toks.select(col("term")),
      "term", depth = 3, width = 16)
    val ref = est.orderBy(col("est").desc, col("key").asc).limit(5)
      .select(col("key"), col("est"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("est").desc, col("key").asc)).cast("long").as("rank"))
    assert(rows(got) == rows(ref))
  }

  test("labelSpread base-join restructure equals the state-join spelling") {
    val labeled = vecs.withColumn("label",
      concat(lit("L"), pmod(col("vec_id"), lit(3))))
    val got = pipeline.Similarity.labelSpread(labeled, "vec_id", "embedding",
      "label", k = 3, rounds = 3, seedFraction = 0.5)
    // reference: the r14 per-round spelling (state joined back to ITSELF),
    // run inline — seeds keep their initial label under both spellings
    // because when(is_seed, _lab) never overwrites a seed
    val t = math.round(0.5 * 65536.0).toInt
    val e = pipeline.Similarity.knnGraph(labeled, "vec_id", "embedding", 3)
    val und = e.select(col("src").as("_u"), col("dst").as("_v"))
      .unionByName(e.select(col("dst").as("_u"), col("src").as("_v")))
      .persist()
    val isSeed = conv(substring(md5(concat_ws("|", lit(42L),
      col("vec_id").cast("string"))), 1, 4), 16, 10).cast("int") < lit(t)
    var state = labeled.select(col("vec_id").as("_id"),
      when(isSeed, col("label")).otherwise(lit(null)).as("_lab"),
      isSeed.as("is_seed")).localCheckpoint(true)
    for (_ <- 1 to 3) {
      val votes = und.join(state.select(col("_id").as("_u"), col("_lab")), "_u")
        .filter(col("_lab").isNotNull)
        .groupBy(col("_v").as("_id"), col("_lab")).agg(count(lit(1)).as("_n"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("_id")
        .orderBy(col("_n").desc, col("_lab").asc)
      val win = votes.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1).select(col("_id"), col("_lab").as("_new"))
      state = state.join(win, Seq("_id"), "left_outer")
        .select(col("_id"),
          when(col("is_seed"), col("_lab")).otherwise(col("_new")).as("_lab"),
          col("is_seed")).localCheckpoint(true)
    }
    val ref = state.select(col("_id").as("vec_id"), col("_lab").as("label"),
      col("is_seed"))
    assert(rows(got) == rows(ref))
    und.unpersist(true)
  }

  test("bpeTrain lazy merge chain is exact across the lineage-cut boundary") {
    // 5 identical docs of 12 zero-padded words: every adjacent pair counts
    // 5, so ties resolve lexicographically and the first symbol grows one
    // word per merge — 10 merges crosses the internal cutEvery=8 re-root
    val words = (1 to 12).map(i => f"w$i%02d")
    val docs = spark.createDataFrame(
      (0 until 5).map(i => (i.toLong, words.mkString(" ")))).toDF("id", "text")
    val got = pipeline.Tokenizer.bpeTrain(docs, "text", numMerges = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expected = (1 to 10).map { r =>
      (r, words.take(r).mkString(" "), words(r), 5L)
    }
    assert(got.toSeq == expected)
  }

  test("unigramTrain observed denominator matches the returned counts") {
    val docs = spark.createDataFrame(
      (0 until 20).map(i => (i.toLong, "abc abd bc bc ab"))).toDF("id", "text")
    val v = pipeline.Tokenizer.unigramTrain(docs, "text", vocabSize = 6,
      maxPieceLen = 3, iterations = 2).collect()
    val denom = v.map(_.getLong(1)).sum + v.length
    v.foreach { r =>
      // Spark's round() is HALF_UP away from zero — mirror it exactly
      val expect = -BigDecimal(
        math.log((r.getLong(1) + 1).toDouble / denom) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(r.getLong(2) == expect,
        s"piece ${r.getString(0)}: cost ${r.getLong(2)} != $expect")
    }
  }
}
