package graft

import org.apache.spark.sql.functions._

/** Exact maximal duplicated spans (prefix-doubling construction):
 * hand-computed fixtures for exact positions/lengths, maximality,
 * the seed minimum, the boilerplate bucket cap, and the dyadic
 * length-budget truncation. */
class DupSpansMaximalSpec extends TestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], seedTokens: Int = 4,
      maxBucket: Int = 256): Set[(Long, Int, Int, String)] =
    pipeline.Text.dupSpansMaximal(docs.toDF("doc_id", "text"), "doc_id", "text",
        seedTokens, maxBucket)
      .select(col("doc_id"), col("pos"), col("len"), col("span"))
      .as[(Long, Int, Int, String)].collect().toSet

  test("a shared run is reported exactly once per doc, at its maximal extent") {
    // docs share the 6-token run "c d e f g h"; doc 1 has it at pos 2,
    // doc 2 at pos 0. Only the span START is maximal; interior suffixes
    // (pos 3 len 5, ...) must be filtered as contained.
    val docs = Seq(
      (1L, "a b c d e f g h x y"),
      (2L, "c d e f g h q r s t"))
    val got = run(docs)
    assert(got == Set(
      (1L, 2, 6, "c d e f g h"),
      (2L, 0, 6, "c d e f g h")), got.toString)
  }

  test("two independent maximal spans in one document are both reported") {
    val docs = Seq(
      (1L, "p q r s z1 z2 m n o w"),
      (2L, "p q r s k1 k2 k3 m n o w"))
    val got = run(docs)
    assert(got == Set(
      (1L, 0, 4, "p q r s"), (2L, 0, 4, "p q r s"),
      (1L, 6, 4, "m n o w"), (2L, 7, 4, "m n o w")), got.toString)
  }

  test("duplicates shorter than seedTokens are not reported") {
    val docs = Seq(
      (1L, "a b c x1 x2 x3 x4 x5"),
      (2L, "a b c y1 y2 y3 y4 y5"))
    assert(run(docs).isEmpty) // shared run is 3 < seedTokens = 4
  }

  test("within-document repeats alone do not qualify (cross-doc contract)") {
    val docs = Seq(
      (1L, "a b c d e a b c d e"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
    assert(run(docs).isEmpty)
  }

  test("maximal length is exact, not dyadic-quantized") {
    // shared run of 7 tokens with seedTokens=4: the greedy descent must
    // report len=7 (4+2+1), not 4 or 8
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 a1 a2"),
      (2L, "s1 s2 s3 s4 s5 s6 s7 b1 b2"))
    val got = run(docs)
    assert(got == Set(
      (1L, 0, 7, "s1 s2 s3 s4 s5 s6 s7"),
      (2L, 0, 7, "s1 s2 s3 s4 s5 s6 s7")), got.toString)
  }

  test("long matches are exact with no length cap or quantization") {
    // 40 shared tokens then divergence: exactly ONE maximal span per doc,
    // pos 0 len 40 (every later start is contained and filtered)
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text + " u1"), (2L, text + " v1"))
    val got = run(docs)
    assert(got == Set((1L, 0, 40, text), (2L, 0, 40, text)), got.toString)
  }

  test("boilerplate buckets above maxBucket are dropped") {
    // the same 4-token window in 5 positions across docs; maxBucket=4
    // drops the bucket entirely (mine such phrases with topNgrams)
    val docs = Seq(
      (1L, "h1 h2 h3 h4 a1 a2 a3 a4 a5"),
      (2L, "h1 h2 h3 h4 b1 b2 b3 b4 b5"),
      (3L, "h1 h2 h3 h4 c1 c2 c3 c4 c5"),
      (4L, "h1 h2 h3 h4 d1 d2 d3 d4 d5"),
      (5L, "h1 h2 h3 h4 e1 e2 e3 e4 e5"))
    assert(run(docs, maxBucket = 4).isEmpty)
    assert(run(docs, maxBucket = 5).nonEmpty)
  }

  test("non-power-of-two seeds work (no dyadic constraint)") {
    val docs = Seq(
      (1L, "q1 q2 q3 q4 q5 x1"),
      (2L, "q1 q2 q3 q4 q5 y1"))
    val got = run(docs, seedTokens = 3)
    assert(got == Set(
      (1L, 0, 5, "q1 q2 q3 q4 q5"),
      (2L, 0, 5, "q1 q2 q3 q4 q5")), got.toString)
  }

  test("parameter validation fails loudly") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      pipeline.Text.dupSpansMaximal(df, "doc_id", "text", seedTokens = 0))
    intercept[IllegalArgumentException](
      pipeline.Text.dupSpansMaximal(df, "doc_id", "text", maxBucket = 1))
  }

  test("a document over the token cap fails loudly, naming the knob") {
    // per-pair LCE cost is bounded by document length: a giant single
    // document must hit the fail-loud guard (THRESHOLDS row 14), not
    // melt a task. Lower the cap so the fixture stays tiny.
    spark.conf.set(GraftConf.DupSpansMaxDocTokensKey, "8")
    try {
      val docs = Seq(
        (1L, (1 to 20).map(i => s"t$i").mkString(" ")),
        (2L, "a b c d e")).toDF("doc_id", "text")
      val ex = intercept[Exception] {
        pipeline.Text.dupSpansMaximal(docs, "doc_id", "text").collect()
      }
      val msg = ex.toString + Option(ex.getCause).map(_.toString).getOrElse("")
      assert(msg.contains("maxdoctokens") || msg.contains("exceeds 8 tokens"),
        msg)
      // contamination path carries the same guard on BOTH corpora
      val bench = Seq((9L, "a b c d e")).toDF("doc_id", "text")
      intercept[Exception] {
        pipeline.Text.contaminatedSpans(docs, bench, "doc_id", "text").collect()
      }
      // 0 disables: the same oversized corpus runs clean
      spark.conf.set(GraftConf.DupSpansMaxDocTokensKey, "0")
      pipeline.Text.dupSpansMaximal(docs, "doc_id", "text").collect()
    } finally spark.conf.unset(GraftConf.DupSpansMaxDocTokensKey)
  }
}
