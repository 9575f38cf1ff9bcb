package graft

import org.apache.spark.sql.functions._

/** Port of the reference's cache-hygiene checks
 * (ConnectedComponentsSuite.scala:311-321 "not leaking cached data"):
 * after an algorithm's result is materialized and unpersisted, the
 * session must hold no leftover persisted RDDs — localCheckpoint cuts
 * are persisted at the RDD level, where `Dataset.unpersist` is a
 * CacheManager no-op, so the IterationManager must free them itself. */
class CacheHygieneSpec extends TestBase {
  import spark.implicits._

  private def leftoverIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def assertNoLeak(run: => org.apache.spark.sql.DataFrame): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = leftoverIds()
    val result = run
    result.count()
    result.unpersist(true)
    val after = leftoverIds() -- before
    assert(after.isEmpty,
      s"leaked persistent RDDs after unpersist: ${after.toSeq.sorted}")
  }

  test("connectedComponents does not leak cached data") {
    // force the distributed superstep path (threshold 0) so localCheckpoint
    // cuts actually happen — the union-find fast path barely persists
    assertNoLeak(friends.connectedComponents.setSmallGraphThreshold(0).run())
  }

  test("connectedComponents union-find fast path does not leak cached data") {
    assertNoLeak(friends.connectedComponents.run())
  }

  test("pageRank does not leak cached data") {
    assertNoLeak(friends.pageRank.maxIter(6).run().vertices)
  }

  test("shortestPaths does not leak cached data") {
    assertNoLeak(friends.shortestPaths.landmarks(Seq("a", "d")).run())
  }

  test("kCore does not leak cached data") {
    assertNoLeak(friends.kCore.run())
  }
}
