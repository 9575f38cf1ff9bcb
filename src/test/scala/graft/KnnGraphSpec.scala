package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Mutual-kNN graph semantics: hub exclusion, canonical ordering, and the
 * directed variant's rank column. */
class KnnGraphSpec extends TestBase {
  import spark.implicits._

  // 2-D toy geometry: two tight pairs far apart, plus a "hub" between them
  // that everyone likes but that can only afford ONE top choice at k=1.
  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.98f, 0.05f)), // near 1
    (3L, Seq(0.0f, 1.0f)),
    (4L, Seq(0.05f, 0.98f)), // near 3
    (5L, Seq(0.7f, 0.7f))    // hub: equidistant-ish from both pairs
  ).toDF("vec_id", "embedding")

  test("mutual k=1: only the two tight pairs form edges — the hub bonds nothing") {
    val got = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("directed k=1 keeps the rank and the hub's own pick") {
    val got = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 1, mutual = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.size == 5 && got.forall(_._3 == 1))
    assert(got.contains((1L, 2L, 1)) && got.contains((2L, 1L, 1)))
    // the hub picks SOMEONE, but nobody picks the hub
    assert(got.exists(_._1 == 5L) && !got.exists(_._2 == 5L))
  }

  test("mutual edges are canonical (src < dst) and a subset of the directed edge set") {
    val mu = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mu.forall { case (a, b) => a < b })
    val di = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 2, mutual = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mu.forall { case (a, b) => di.contains((a, b)) && di.contains((b, a)) })
    // k=2 gives the hub mutual bonds (it IS in everyone's top-2)
    assert(mu.exists(e => e._1 == 5L || e._2 == 5L))
  }

  test("semantic clusters: CC over mutual k=1 separates the two pairs, hub isolated") {
    val edges = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 1)
    val cc = GraphFrame(vecs.select(col("vec_id").as("id")), edges)
      .connectedComponents.run()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc(1L) == cc(2L) && cc(3L) == cc(4L) && cc(1L) != cc(3L))
    assert(cc(5L) != cc(1L) && cc(5L) != cc(3L))
  }

  test("mipsTopK ranks by raw dot: a long vector beats a better-aligned short one") {
    // query (1,0): cosine prefers (0.9, 0) [cos=1] over (2, 1) [cos~0.89],
    // MIPS prefers (2, 1) [dot=2] over (0.9, 0) [dot=0.9]
    val v = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.0f)),
      (3L, Seq(2.0f, 1.0f))).toDF("vec_id", "embedding")
    val mips = Similarity.mipsTopK(v, "vec_id", "embedding", k = 1,
        queryFilter = col("vec_id") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(mips == Seq((1L, 3L)))
    val cos = Similarity.topK(v, "vec_id", "embedding", k = 1,
        queryFilter = col("vec_id") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cos == Seq((1L, 2L)))
  }
}
