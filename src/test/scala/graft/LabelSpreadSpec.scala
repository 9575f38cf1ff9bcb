package graft

import graft.pipeline.Similarity

/** Label spreading over the mutual-kNN graph: seed clamping, mode rule,
 * per-round recomputation, and class recovery on separable geometry. */
class LabelSpreadSpec extends TestBase {
  import spark.implicits._

  // three one-hot classes of four identical vectors each: mutual k=3
  // bonds exactly the class cliques, so spreading must recover classes
  private val vecs = (0L until 12L).map(i =>
    (i, Seq.tabulate(3)(d => if (d == (i % 3).toInt) 1.0f else 0.0f), (i % 3).toInt))
    .toDF("vec_id", "embedding", "label")

  test("non-seeds recover their class from seed neighbors (separable geometry)") {
    val out = Similarity.labelSpread(vecs, "vec_id", "embedding", "label",
      k = 3, rounds = 2, seedFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.get(1), r.getBoolean(2)))
    assert(out.length == 12)
    val labeled = out.filter(_._2 != null)
    // every labeled vertex (seed or spread) carries its true class
    labeled.foreach { case (id, lab, _) => assert(lab == (id % 3).toInt, s"id $id") }
    // some seeds AND some spread labels exist at fraction 0.5 over 12 ids
    assert(out.exists(_._3) && out.exists(r => !r._3 && r._2 != null))
  }

  test("seedFraction 1.0 clamps everything; 0.0 spreads nothing") {
    val all = Similarity.labelSpread(vecs, "vec_id", "embedding", "label",
      k = 3, rounds = 1, seedFraction = 1.0).collect()
    assert(all.forall(_.getBoolean(2)) && all.forall(_.get(1) != null))
    val none = Similarity.labelSpread(vecs, "vec_id", "embedding", "label",
      k = 3, rounds = 3, seedFraction = 0.0).collect()
    assert(none.forall(r => !r.getBoolean(2) && r.get(1) == null))
  }

  test("deterministic: identical draw and labels across invocations") {
    def run() = Similarity.labelSpread(vecs, "vec_id", "embedding", "label",
      k = 3, rounds = 2, seedFraction = 0.5)
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), r.getBoolean(2))).toSet
    assert(run() == run())
  }

  /** The engine's own 16-bit draw, computed locally: first two md5 bytes
   * of "42|id" as an unsigned int — lets the test CHOOSE seed ids. */
  private def h16(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"42|$id".getBytes("UTF-8"))
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }

  test("mode tie on equal counts picks the smaller label") {
    val seeds = (0L until 100L).filter(h16(_) < 32768).take(4)
    val center = (0L until 100L).find(h16(_) >= 32768).get
    // five near-identical vectors: mutual k=4 bonds all pairs, so the
    // non-seed center sees two label-7 seeds and two label-3 seeds — a
    // dead tie the rule must break toward the SMALLER label (3)
    val rows = seeds.zipWithIndex.map { case (id, i) =>
      (id, Seq(1.0f, 0.001f * i), if (i < 2) 7 else 3)
    } :+ ((center, Seq(1.0f, 0.01f), 99))
    val tie = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.labelSpread(tie, "vec_id", "embedding", "label",
      k = 4, rounds = 1, seedFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    assert(out(center) == 3, s"tie must break to the smaller label: $out")
    seeds.zipWithIndex.foreach { case (id, i) =>
      assert(out(id) == (if (i < 2) 7 else 3), "seeds stay clamped")
    }
  }
}
