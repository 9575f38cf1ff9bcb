package graft

import graft.pipeline.Sampling

class GroupSampleSpec extends TestBase {
  import spark.implicits._

  private val df = (1L to 50L).map(i => (i, if (i % 3 == 0) "a" else "b"))
    .toDF("id", "g")

  test("exactly k rows per group (or the whole group when smaller)") {
    val out = Sampling.groupSample(df, "g", "id", k = 4)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(out.count(_._1 == "a") == 4 && out.count(_._1 == "b") == 4)
    val tiny = Sampling.groupSample(df.filter("id <= 4"), "g", "id", k = 10)
    assert(tiny.count() == 4) // groups smaller than k pass through whole
  }

  test("deterministic across runs and partitionings; seed changes the draw") {
    def run(d: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.groupSample(d, "g", "id", k = 5, seed = seed)
        .collect().map(_.getLong(0)).toSet
    val a = run(df, 42L)
    val b = run(df.repartition(13), 42L)
    assert(a == b, "partitioning must not move the sample")
    assert(a != run(df, 7L), "a different seed should draw differently")
  }

  test("original columns pass through unchanged, no helper column leaks") {
    val out = Sampling.groupSample(df, "g", "id", k = 2)
    assert(out.columns.toSeq == Seq("id", "g"))
    intercept[IllegalArgumentException] { Sampling.groupSample(df, "g", "id", 0) }
  }
}
