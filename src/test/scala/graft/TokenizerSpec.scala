package graft

import org.apache.spark.sql.functions._

/** Word-level BPE trainer: hand-checked merge sequence, greedy
 * left-to-right overlap semantics, and encode counts. */
class TokenizerSpec extends TestBase {
  import spark.implicits._

  test("bpeTrain learns the hand-computed merge sequence") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val m = pipeline.Tokenizer.bpeTrain(docs, "text", 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) === ((1, "a", "b", 3L)))
    assert(m(1) === ((2, "a b", "c", 2L)))
    assert(m(2) === ((3, "a b", "a b c", 1L)))
  }

  test("greedy left-to-right: x x x merges to two symbols, not a chain") {
    val docs = Seq((1L, "x x x")).toDF("doc_id", "text")
    val (_, enc) = pipeline.Tokenizer.bpeTrainEncode(docs, "doc_id", "text", 1)
    val r = enc.head()
    assert(r.getLong(1) === 3L) // raw
    assert(r.getLong(2) === 2L) // ⟨x x⟩⟨x⟩
  }

  test("bpeEncode token counts after the learned merges") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val (_, enc) = pipeline.Tokenizer.bpeTrainEncode(docs, "doc_id", "text", 3)
    val got = enc.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((5L, 1L)), 2L -> ((3L, 1L))))
  }

  test("early stop when no pairs remain; boundary chars rejected") {
    val single = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(pipeline.Tokenizer.bpeTrain(single, "text", 3).count() === 0)
    val bad = Seq((1L, "has ⟨ bracket")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      pipeline.Tokenizer.bpeTrain(bad, "text", 1)
    }
  }

  test("chunk: overlapping word windows cover the text without redundant tails") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val out = pipeline.Text.chunk(docs, "doc_id", "text",
        chunkWords = 4, overlapWords = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    // doc 1: starts 1,3,5,7 (start 9 would be a pure suffix of 7-10)
    assert(out((1L, 0)) === (("w1 w2 w3 w4", 4L)))
    assert(out((1L, 1)) === (("w3 w4 w5 w6", 4L)))
    assert(out((1L, 2)) === (("w5 w6 w7 w8", 4L)))
    assert(out((1L, 3)) === (("w7 w8 w9 w10", 4L)))
    assert(!out.contains((1L, 4)))
    assert(out((2L, 0)) === (("a b", 2L)))
    assert(out((3L, 0)) === (("solo", 1L)))
    intercept[IllegalArgumentException] {
      pipeline.Text.chunk(docs, "doc_id", "text", chunkWords = 4, overlapWords = 4)
    }
  }
}
