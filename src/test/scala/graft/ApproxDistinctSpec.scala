package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling

class ApproxDistinctSpec extends TestBase {
  import spark.implicits._

  test("below k distinct values the count is exact; duplicates collapse") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "v")
    val m = Sampling.approxDistinct(df, "g", "v", k = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(m == Map("a" -> 2.0, "b" -> 1.0))
  }

  test("estimate lands within the KMV error envelope above k") {
    // 600 distinct values in one group, k = 32 → rel. error ~1/sqrt(30);
    // assert a generous 4-sigma band (the draw is fixed, not random, so
    // this is a regression pin as much as a statistical check)
    val df = (0 until 600).map(i => ("g", s"value_$i")).toDF("g", "v")
    val est = Sampling.approxDistinct(df, "g", "v", k = 32).head().getDouble(1)
    assert(est > 600 * 0.35 && est < 600 * 2.2, s"estimate $est for 600 distinct")
  }

  test("deterministic across invocations and independent of row duplication") {
    val base = (0 until 200).map(i => ("g", s"tok$i"))
    val once = base.toDF("g", "v")
    val thrice = (base ++ base ++ base).toDF("g", "v").repartition(7)
    val a = Sampling.approxDistinct(once, "g", "v", k = 16).head().getDouble(1)
    val b = Sampling.approxDistinct(thrice, "g", "v", k = 16).head().getDouble(1)
    assert(a == b, "multiplicity must not move a distinct-count sketch")
  }

  test("null groups and null values are excluded; k must be >= 3") {
    val df = Seq((null.asInstanceOf[String], "x"), ("a", null.asInstanceOf[String]),
      ("a", "y")).toDF("g", "v")
    val rows = Sampling.approxDistinct(df, "g", "v", k = 4).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "a"
      && rows.head.getDouble(1) == 1.0)
    intercept[IllegalArgumentException] {
      Sampling.approxDistinct(df, "g", "v", k = 2)
    }
  }
}
