package graft

import graft.pipeline.Text

class PmiSpec extends TestBase {
  import spark.implicits._

  test("hand-computed PMI; exact-count ties break on (w1, w2)") {
    // tokens: a x3, b x2, c x1 (N=6); bigrams: (a,b) x2, (a,c) x1 (M=3)
    // PMI(a,b) = ln((2/3)/((3/6)(2/6))) = ln 4;  PMI(a,c) = ln 4 too
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val rows = Text.pmiBigrams(docs, "doc_id", "text", minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 2)
    assert(rows(0) == ("a", "b", 2L, math.log(4.0))) // tie: (a,b) before (a,c)
    assert(rows(1) == ("a", "c", 1L, math.log(4.0)))
  }

  test("bound rare phrase outranks frequent-frequent pair; minCount filters") {
    val docs = ((1 to 30).map(i => (i.toLong, "the cat and the dog")) ++
      Seq((31L, "zx qy"), (32L, "zx qy"), (33L, "zx qy")))
      .toDF("doc_id", "text")
    val top = Text.pmiBigrams(docs, "doc_id", "text", minCount = 3, topK = 1)
      .head()
    assert((top.getString(0), top.getString(1)) == ("zx", "qy"),
      "the always-together rare pair must outscore 'the cat'")
    // minCount drops sub-threshold pairs entirely
    val none = Text.pmiBigrams(docs, "doc_id", "text", minCount = 50, topK = 5)
    assert(none.isEmpty)
  }

  test("topK is a deterministic total-order cut") {
    val docs = (1 to 40).map(i => (i.toLong, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7}"))
      .toDF("doc_id", "text")
    val a = Text.pmiBigrams(docs, "doc_id", "text", minCount = 1, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val b = Text.pmiBigrams(docs.repartition(9), "doc_id", "text", minCount = 1, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(a == b && a.length == 5)
  }
}
