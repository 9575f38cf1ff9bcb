package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * The SQL extension surface: a session built with
 * `spark.sql.extensions=graft.GraftExtensions` can call the native
 * expressions from pure SQL, with the same results as the Scala API.
 *
 * This spec builds its own SparkSession (the extension must be present at
 * session construction), so it does not share the suite-wide session.
 */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // `spark.sql.extensions` only applies at session construction. If another
    // suite already built the shared JVM-wide session, getOrCreate() would
    // return it and silently ignore the config — so stop and clear any
    // pre-existing session first. Later suites rebuild via TestBase.session,
    // which detects the stopped context.
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    // Clear the default session so later suites build their own fresh one.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("graft_kcore_merge is callable from SQL and matches the kernel") {
    val r = spark.sql(
      "SELECT graft_kcore_merge(array(3, 1, 4, 2), 3) AS core").head().getInt(0)
    // neighbors sorted desc: 4,3,2,1 capped at core=3 -> 3,3,2,1; h = 2 ranks with c>=rank... compute via kernel
    val expected = {
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(3, 1, 4, 2))
      graft.expressions.KCoreMerge.merge(arr, 3)
    }
    assert(r == expected)
  }

  test("graft_axpb matches FiniteAXPlusB.axpb") {
    val r = spark.sql(
      "SELECT graft_axpb(CAST(12345 AS BIGINT), CAST(67890 AS BIGINT), CAST(777 AS BIGINT)) AS y")
      .head().getLong(0)
    assert(r == graft.expressions.FiniteAXPlusB.axpb(12345L, 67890L, 777L))
  }

  test("graft_array_dot computes the dot product in SQL") {
    val r = spark.sql(
      "SELECT graft_array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(math.abs(r - 32.0) < 1e-12)
  }

  test("graft_adc_distance sums table entries at the candidate's codes") {
    val r = spark.sql(
      "SELECT graft_adc_distance(array(0, 2), array(array(1.0D, 9.0D, 9.0D), array(9.0D, 9.0D, 2.0D))) AS d")
      .head().getDouble(0)
    assert(r == 3.0)
  }

  test("arity errors are surfaced at analysis time") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_array_dot(array(1.0D))").collect()
    }
    assert(err.getMessage.contains("graft_array_dot") ||
      err.getMessage.toLowerCase.contains("argument"))
  }

  test("register() adds the functions to an extension-less session") {
    // A child session without the extension config would share the registry;
    // instead verify the imperative path re-registers idempotently here.
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_array_dot(array(2.0D), array(8.0D))").head().getDouble(0)
    assert(r == 16.0)
  }

  test("functions constant-fold over literals and codegen over columns") {
    // literals: Catalyst folds the native expression at optimization time
    val folded = spark.sql("SELECT graft_array_dot(array(1.0D, 0.0D), array(0.5D, 0.5D)) AS d")
    assert(folded.queryExecution.optimizedPlan.toString().contains("0.5"))
    // columns: the call stays inside a whole-stage-codegen'd projection
    val plan = spark.sql(
      "SELECT graft_array_dot(array(CAST(id AS DOUBLE)), array(2.0D)) AS d FROM range(3)")
    val physical = plan.queryExecution.executedPlan.toString()
    assert(physical.contains("WholeStageCodegen") || physical.startsWith("*("))
    assert(plan.orderBy("d").collect().map(_.getDouble(0)).toSeq == Seq(0.0, 2.0, 4.0))
  }
}
