package graft

import org.apache.spark.sql.functions._

/** Round-13 additions: web-corpus preparation (markup strip, URL
 * canonicalization) and the hop-batched iterative paths. */
class Round13Spec extends TestBase {
  import spark.implicits._

  // ---------------- stripMarkup ----------------

  test("stripMarkup removes spans, comments, tags; decodes entities once") {
    val rows = Seq(
      (1, "<html><head><script type=\"x\">if (a < b) { run() }</script>" +
        "<STYLE>p { color: red }</STYLE></head>" +
        "<body><h1>Hi</h1><p>a &amp; b &lt;tag&gt; &quot;q&quot; " +
        "&#39;s&#39;&nbsp;end</p><!-- secret --></body></html>"),
      (2, "no markup at all"),
      (3, "double &amp;amp; stays encoded once"),
      (4, "a<br>b\t\tc\n\nd")).toDF("id", "html")
    val got = pipeline.Web.stripMarkup(rows, "id", "html").collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap
    // 15 raw tag matches: the "<" inside the script body greedily pairs
    // with the next ">" (the </script> close) — a diagnostic count, not
    // a parse
    assert(got(1) == ("Hi a & b <tag> \"q\" 's' end", 15), got(1))
    assert(got(2) == ("no markup at all", 0L), got(2))
    // single decode pass: "&amp;amp;" means the literal text "&amp;"
    assert(got(3) == ("double &amp; stays encoded once", 0L), got(3))
    // tags and whitespace runs become single spaces
    assert(got(4) == ("a b c d", 1L), got(4))
  }

  test("stripMarkup: unterminated script drops the rest (stated bound)") {
    val rows = Seq((1, "<p>keep</p><script>lost forever")).toDF("id", "html")
    val got = pipeline.Web.stripMarkup(rows, "id", "html").collect().head
    // the span regex needs a closing tag; the orphan open tag is still
    // stripped as a tag, leaving the script BODY as text — stated in the
    // scaladoc as the streaming-extractor bound
    assert(got.getString(1) == "keep lost forever", got.getString(1))
  }

  test("stripMarkup is idempotent on its own output") {
    val rows = Seq((1, "<p>a &amp; b</p>")).toDF("id", "html")
    val once = pipeline.Web.stripMarkup(rows, "id", "html")
      .select(col("id"), col("text").as("html"))
    val twice = pipeline.Web.stripMarkup(once, "id", "html").collect().head
    // "a & b" survives a second pass unchanged (no tags, "&" alone is
    // not an entity)
    assert(twice.getString(1) == "a & b" && twice.getLong(2) == 0L)
  }

  // ---------------- urlCanonical ----------------

  private def canon(url: String): (String, String, String) = {
    val r = pipeline.Web.urlCanonical(
      Seq((1, url)).toDF("id", "url"), "id", "url").collect().head
    (r.getString(1), r.getString(2), r.getString(3))
  }

  test("urlCanonical lowercases scheme/host, drops default port + www key") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b") ==
      ("http://www.example.com/A/b", "example.com", "example.com/A/b"))
    assert(canon("HTTPS://Ex.com:443/") ==
      ("https://ex.com/", "ex.com", "ex.com/"))
    // non-default and non-http(s) ports survive
    assert(canon("http://ex.com:8080/x")._1 == "http://ex.com:8080/x")
    assert(canon("ftp://Ex.com:21/x")._1 == "ftp://ex.com:21/x")
  }

  test("urlCanonical drops userinfo, fragment, tracking params; sorts query") {
    assert(canon("https://u:p@ex.com/x?b=2&utm_source=s&a=1&gclid=g#frag") ==
      ("https://ex.com/x?a=1&b=2", "ex.com", "ex.com/x?a=1&b=2"))
    // tracking-only query leaves no '?'
    assert(canon("http://ex.com/x?utm_campaign=c")._1 == "http://ex.com/x")
    // bare utm param without '=' is still tracking
    assert(canon("http://ex.com/x?utm_x&a=1")._1 == "http://ex.com/x?a=1")
  }

  test("urlCanonical trims trailing slashes; root path stays '/'") {
    assert(canon("http://ex.com/a/b///")._1 == "http://ex.com/a/b")
    assert(canon("http://ex.com")._1 == "http://ex.com/")
    assert(canon("http://ex.com/?a=1")._1 == "http://ex.com/?a=1")
  }

  test("urlCanonical: non-URLs produce null outputs, never a wrong key") {
    val r = pipeline.Web.urlCanonical(
      Seq((1, "not a url"), (2, "relative/path"), (3, null))
        .toDF("id", "url"), "id", "url").collect()
    r.foreach(row => assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3),
      row.toString))
  }

  test("urlCanonical url_key collides http/https/www variants of one page") {
    val ks = Seq("http://www.ex.com/p?a=1", "https://ex.com/p/?a=1&utm_s=x",
      "HTTP://EX.COM:80/p?a=1").map(u => canon(u)._3)
    assert(ks.distinct == Seq("ex.com/p?a=1"), ks.toString)
  }

  test("extractLinks finds double/single-quoted hrefs case-insensitively") {
    val rows = Seq(
      (1, "<a href=\"http://a.com/x\">1</a><A HREF='B.com/y'>2</A>" +
        "<a href=\"\">empty</a><link href=\"/css\">"),
      (2, "no links here")).toDF("id", "html")
    val got = pipeline.Web.extractLinks(rows, "id", "html").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    // empty href drops; relative, schemeless and absolute all surface raw
    assert(got == Set((1, "http://a.com/x"), (1, "B.com/y"), (1, "/css")),
      got.toString)
  }

  test("linkGraph: absolute by host key, site-relative to source, rest drop") {
    val rows = Seq(
      (1, "http://WWW.Src.com/p",
        "<a href=\"https://A.com:443/x\">1</a>" +       // absolute -> a.com
          "<a href=\"/self\">2</a>" +                   // relative -> src.com
          "<a href=\"//cdn.com/x\">3</a>" +             // protocol-relative: no scheme -> drop
          "<a href=\"#frag\">4</a>" +                   // fragment -> drop
          "<a href=\"/self2\">5</a>"),
      (2, "not a url", "<a href=\"http://a.com/\">x</a>")) // null src -> drop
      .toDF("id", "url", "html")
    val got = pipeline.Web.linkGraph(rows, "id", "url", "html").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("src.com", "a.com") -> 1L, ("src.com", "src.com") -> 2L),
      got.toString)
  }

  test("hostStats: per-host rows, distinct pages, dup ratio; non-URLs drop") {
    val rows = Seq(
      (1, "http://a.com/x?utm_s=1"), (2, "https://WWW.A.com/x"),
      (3, "http://a.com/y"), (4, "http://b.org/"), (5, "nope"))
      .toDF("id", "url")
    val got = pipeline.Web.hostStats(rows, "id", "url").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // a.com: 3 rows, 2 canonical pages (the www/https/utm variants of /x
    // collide on url_key), dup ratio 1 - 2/3
    assert(got == Map("a.com" -> ((3L, 2L, 0.3333)),
      "b.org" -> ((1L, 1L, 0.0))), got.toString)
  }

  test("corpusDiff classifies added/removed/changed/unchanged; null-safe") {
    val oldSnap = Seq((1, "same"), (2, "orig"), (3, "gone"),
      (5, null.asInstanceOf[String])).toDF("doc_id", "text")
    val newSnap = Seq((1, "same"), (2, "edited"), (4, "new"),
      (5, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = pipeline.Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // null text is PRESENT (unchanged vs null), never misread as absent
    assert(got == Map(1 -> "unchanged", 2 -> "changed", 3 -> "removed",
      4 -> "added", 5 -> "unchanged"), got.toString)
  }

  test("groupQuantiles: exact rank arithmetic, ties, q=0/1, null values") {
    val rows = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(2.0)),
      ("a", Some(10.0)), ("b", Some(5.0)), ("b", Option.empty[Double]))
      .toDF("grp", "v")
    val got = pipeline.Sampling.groupQuantiles(rows, "grp", "v",
        Seq(0.0, 0.5, 0.75, 1.0)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    // a: sorted [1,2,2,10], n=4 — q0 -> rank1=1, q.5 -> rank2=2,
    // q.75 -> rank3=2 (the tie value), q1 -> rank4=10
    assert(got(("a", 0.0)) == ((1.0, 4L)) && got(("a", 0.5)) == ((2.0, 4L)) &&
      got(("a", 0.75)) == ((2.0, 4L)) && got(("a", 1.0)) == ((10.0, 4L)))
    // b: null excluded, n=1, every q lands on the single value
    assert(got(("b", 0.5)) == ((5.0, 1L)) && got(("b", 1.0)) == ((5.0, 1L)))
  }

  test("keepBest keeps (score desc, id asc); null and NaN scores never win") {
    val rows = Seq((1, 10, 0.5), (1, 11, 0.9), (1, 12, 0.9),
      (2, 20, 0.1), (3, 30, Double.NaN), (4, 40, Double.NaN), (4, 41, 0.2))
      .toDF("cl", "id", "sc")
      .unionByName(Seq((3, 31)).toDF("cl", "id")
        .withColumn("sc", lit(null).cast("double")))
    val got = pipeline.Dedup.keepBest(rows, "cl", "id", "sc").collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getLong(3))).toMap
    // cluster 1: score tie 0.9/0.9 -> smaller id 11; cluster 3 is
    // all-NaN/null — both demote to null in the key, id asc keeps 30;
    // cluster 4: NaN loses to a REAL score (Spark/DuckDB would sort NaN
    // as the largest double — keepBest maps it to null in the order key
    // so a failed quality computation never becomes the representative)
    assert(got == Map(1 -> ((11, 3L)), 2 -> ((20, 1L)), 3 -> ((30, 2L)),
      4 -> ((41, 2L))), got.toString)
    // integer scores skip the isNaN guard but keep the same ordering
    val ints = pipeline.Dedup.keepBest(
      Seq((1, 10, 5), (1, 11, 7)).toDF("cl", "id", "sc"), "cl", "id", "sc")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(ints == Map(1 -> 11), ints.toString)
  }

  // ---------------- hop-batched iterative paths ----------------

  test("temporal reachability: hopsPerCycle never changes the fixpoint") {
    val v = (0L until 25L).toDF(GraphFrame.ID)
    val e = v.select(col(GraphFrame.ID).as(GraphFrame.SRC),
        pmod(col(GraphFrame.ID) + 7, lit(25)).as(GraphFrame.DST))
      .withColumn("time",
        (pmod(col(GraphFrame.SRC) * 2 + col(GraphFrame.DST), lit(7)) + 1)
          .cast("double"))
    val runs = Seq(1, 3, 8).map { k =>
      new lib.TemporalReachability(GraphFrame(v, e)).source(0L)
        .timeCol("time").setSmallGraphThreshold(0).hopsPerCycle(k).run()
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    }
    assert(runs.distinct.size == 1, runs.toString)
  }

  test("independent cascade: hopsPerCycle never changes the activation rounds") {
    val v = (0L until 25L).toDF(GraphFrame.ID)
    val e = v.select(col(GraphFrame.ID).as(GraphFrame.SRC),
      pmod(col(GraphFrame.ID) + 7, lit(25)).as(GraphFrame.DST))
    val runs = Seq(1, 4).map { k =>
      new lib.IndependentCascade(GraphFrame(v, e)).p(0.5).hashSeed(9L)
        .setSmallGraphThreshold(0).hopsPerCycle(k).run(Seq(0L))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    }
    assert(runs.distinct.size == 1, runs.toString)
  }

  test("temporal reachability: binding maxIter = exactly maxIter sweeps under batching") {
    val v = (0L until 6L).toDF(GraphFrame.ID)
    // chain 0 -> 1 -> ... -> 5, all times 1: arrival 1 everywhere reachable
    val e = v.filter(col(GraphFrame.ID) < 5)
      .select(col(GraphFrame.ID).as(GraphFrame.SRC),
        (col(GraphFrame.ID) + 1).as(GraphFrame.DST))
      .withColumn("time", lit(1.0))
    def reached(k: Int) =
      new lib.TemporalReachability(GraphFrame(v, e)).source(0L)
        .timeCol("time").maxIter(3).setSmallGraphThreshold(0)
        .hopsPerCycle(k).run()
        .filter(col("arrival").isNotNull).count()
    // 3 sweeps reach exactly vertices 0..3, whatever the batch size
    assert(reached(1) == 4 && reached(2) == 4 && reached(8) == 4)
  }

  test("maximal matching: NaN weights rejected, -0.0 equals 0.0") {
    val v = (0L until 4L).toDF(GraphFrame.ID)
    val bad = Seq((0L, 1L, Double.NaN)).toDF(
      GraphFrame.SRC, GraphFrame.DST, "w")
    val err = intercept[IllegalArgumentException] {
      GraphFrame(v, bad).maximalMatching.weightCol("w").run()
    }
    assert(err.getMessage.contains("NaN"))
    // -0.0 vs 0.0 must not flip the tail/distributed agreement
    val mixed = Seq((0L, 1L, -0.0), (1L, 2L, 0.0), (2L, 3L, -0.0)).toDF(
      GraphFrame.SRC, GraphFrame.DST, "w")
    def pairs(g: org.apache.spark.sql.DataFrame) =
      g.select(GraphFrame.SRC, GraphFrame.DST).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tail = pairs(GraphFrame(v, mixed).maximalMatching.seed(7L)
      .weightCol("w").run())
    val dist = pairs(GraphFrame(v, mixed).maximalMatching.seed(7L)
      .weightCol("w").setSmallGraphThreshold(0).run())
    assert(tail == dist && tail.nonEmpty, s"tail=$tail dist=$dist")
  }
}
