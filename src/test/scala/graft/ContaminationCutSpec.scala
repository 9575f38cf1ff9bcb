package graft

import graft.pipeline.Text

/** Cross-corpus decontamination: detection finds exact maximal train
 * spans that appear in the bench split, and the cut removes EVERY
 * occurrence (no keep-first winner, unlike cutDupSpans). */
class ContaminationCutSpec extends TestBase {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight")
  ).toDF("doc_id", "text")

  test("detection: maximal train span matching a bench document, reported once") {
    val train = Seq(
      (1L, "intro words then the quick brown fox jumps over something else"),
      (2L, "no overlap here at all whatsoever in this text")
    ).toDF("doc_id", "text")
    val spans = Text.contaminatedSpans(train, bench, "doc_id", "text",
        seedTokens = 4).collect()
    // doc 1 shares "the quick brown fox jumps over" (6 tokens) at pos 3
    assert(spans.length == 1)
    val r = spans.head
    assert(r.getAs[Long]("doc_id") == 1L && r.getAs[Int]("pos") == 3 &&
      r.getAs[Int]("len") == 6 &&
      r.getAs[String]("span") == "the quick brown fox jumps over")
  }

  test("cut removes EVERY contaminated occurrence — no keep-first winner") {
    val train = Seq(
      (1L, "the quick brown fox and again the quick brown fox ends"),
      (2L, "clean document stays exactly as written here ok")
    ).toDF("doc_id", "text")
    val out = Text.cutContaminated(train, bench, "doc_id", "text",
        seedTokens = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_removed_tokens"))).toMap
    assert(out(1L) == (("and again ends", 8L))) // both 4-token occurrences cut
    assert(out(2L) == (("clean document stays exactly as written here ok", 0L)))
    assert(out.size == 2) // one row per TRAIN doc; bench never in output
  }

  test("train-train duplicates are NOT contamination") {
    val train = Seq(
      (1L, "shared sentence appears twice across train docs one"),
      (2L, "shared sentence appears twice across train docs two")
    ).toDF("doc_id", "text")
    assert(Text.contaminatedSpans(train, bench, "doc_id", "text",
      seedTokens = 4).count() == 0)
    val out = Text.cutContaminated(train, bench, "doc_id", "text",
        seedTokens = 4).collect()
    assert(out.forall(_.getAs[Long]("n_removed_tokens") == 0L))
  }

  test("docs shorter than seedTokens and over-wide buckets never match") {
    val train = Seq((1L, "the quick brown")).toDF("doc_id", "text") // 3 < 4
    assert(Text.contaminatedSpans(train, bench, "doc_id", "text",
      seedTokens = 4).count() == 0)
    // boilerplate cap: the window appears maxBucket+ times in train —
    // bucket dropped, nothing reported
    val boiler = (1L to 10L)
      .map(i => (i, "the quick brown fox jumps over filler " + i))
      .toDF("doc_id", "text")
    assert(Text.contaminatedSpans(boiler, bench, "doc_id", "text",
      seedTokens = 4, maxBucket = 5).count() == 0)
    intercept[IllegalArgumentException] {
      Text.contaminatedSpans(train, bench, "doc_id", "text", seedTokens = 0)
    }
  }
}
