package graft

import org.apache.spark.sql.functions._

/** Corpus rebuild with duplicated spans cut (keep the globally first
 * occurrence): hand-checked fixtures. */
class CutDupSpansSpec extends TestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], seedTokens: Int = 4)
      : Map[Long, (String, Long)] =
    pipeline.Text.cutDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        seedTokens = seedTokens)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("the smallest (doc, pos) occurrence survives; the others are cut") {
    val got = run(Seq(
      (1L, "a b c d e x y"),
      (2L, "p q a b c d e z")))
    assert(got(1L) == ("a b c d e x y", 0L), got.toString)
    assert(got(2L) == ("p q z", 5L), got.toString)
  }

  test("a fully duplicated document empties; untouched docs re-tokenize verbatim") {
    val got = run(Seq(
      (1L, "s1 s2 s3 s4 s5"),
      (2L, "s1 s2 s3 s4 s5"),
      (3L, "completely unrelated content here now")))
    assert(got(1L) == ("s1 s2 s3 s4 s5", 0L), got.toString)
    assert(got(2L) == ("", 5L), got.toString)
    assert(got(3L) == ("completely unrelated content here now", 0L), got.toString)
  }

  test("two spans cut from one doc sum their removed tokens") {
    val got = run(Seq(
      (1L, "a1 a2 a3 a4 mid b1 b2 b3 b4"),
      (2L, "a1 a2 a3 a4 other stuff q b1 b2 b3 b4")))
    assert(got(1L)._2 == 0L, got.toString)
    assert(got(2L) == ("other stuff q", 8L), got.toString)
  }

  test("cut corpus has no remaining cross-doc duplicate at the seed width") {
    // property on a denser fixture: re-running the detector on the
    // cleaned corpus finds nothing at the same seed width
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 t1 t2"),
      (2L, "w1 w2 w3 w4 w5 w6 u1 u2"),
      (3L, "z0 w1 w2 w3 w4 w5 w6 v1"))
    val cleaned = run(docs).toSeq.map { case (d, (t, _)) => (d, t) }
    val again = pipeline.Text.dupSpansMaximal(
      cleaned.toDF("doc_id", "text"), "doc_id", "text", seedTokens = 4)
    assert(again.isEmpty, again.collect().mkString(" "))
  }
}
