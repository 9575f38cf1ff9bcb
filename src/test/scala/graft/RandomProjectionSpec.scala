package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

class RandomProjectionSpec extends TestBase {
  import spark.implicits._

  test("bit-exact against a hand-computed ±1 dot product") {
    val vec = Seq.tabulate(8)(i => (i + 1).toFloat) // 1..8
    val df = Seq((7L, vec)).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(df, "vec_id", "embedding", dOut = 4)
      .head().getSeq[Double](1)
    val want = (0 until 4).map { p =>
      (0 until 8).map(i => Similarity.planeSign(p, i) * (i + 1).toDouble).sum /
        math.sqrt(4.0)
    }
    assert(got.length == 4)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$got vs $want") }
  }

  test("deterministic and width-stable across rows and invocations") {
    val df = (0L until 20L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 10).toFloat)))
      .toDF("vec_id", "embedding")
    def run() = Similarity.randomProjection(df, "vec_id", "embedding", dOut = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val a = run(); val b = run()
    assert(a.keySet == b.keySet && a.forall { case (k, v) => v == b(k) })
    assert(a.values.forall(_.length == 3))
  }

  test("identical vectors project identically; scaled input scales output") {
    val df = Seq((1L, Seq(2.0f, 4.0f, 6.0f, 8.0f)),
      (2L, Seq(2.0f, 4.0f, 6.0f, 8.0f)),
      (3L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val m = Similarity.randomProjection(df, "vec_id", "embedding", dOut = 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(m(1L) == m(2L))
    m(1L).zip(m(3L)).foreach { case (a, b) => assert(a == 2.0 * b) }
  }

  test("dOut must be positive") {
    val df = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.randomProjection(df, "vec_id", "embedding", dOut = 0)
    }
  }
}
