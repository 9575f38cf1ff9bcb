package graft

import org.apache.spark.sql.functions._

/** Port of the reference's cache-hygiene checks
 * (ConnectedComponentsSuite.scala:311-321 "not leaking cached data"):
 * after an algorithm's result is materialized and released, the
 * session must hold no leftover persisted RDDs — localCheckpoint cuts
 * are persisted at the RDD level, where `Dataset.unpersist` is a
 * CacheManager no-op, so the IterationManager must free them itself.
 * Results themselves are lineage-cut (IterationManager.finish), so the
 * caller-side cleanup is `GraphFrame.release` (Dataset.unpersist kept
 * for any CacheManager-backed frames a result may still carry). */
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
    GraphFrame.release(result)
    val after = leftoverIds() -- before
    assert(after.isEmpty,
      s"leaked persistent RDDs after unpersist+release: ${after.toSeq.sorted}")
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

  // Round-6 regression: a result that is a no-op (or rename-only)
  // projection of the final round's state canonicalizes `sameResult` with
  // it, so the old persist+count+close pattern let close() uncache the
  // result and free the checkpoint blocks its recompute needed
  // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND across every fixed-iteration
  // algorithm). finish() must survive both tail shapes: last round a
  // lineage cut (even) and last round a lazy persist (odd).
  private def finishSurvives(rounds: Int): Unit = {
    import org.apache.spark.sql.functions._
    val mgr = new lib.IterationManager(2)
    var state = (0L until 20L).toDF("id").withColumn("x", lit(0.0))
    state = mgr.cycle(state, 0)
    for (i <- 1 to rounds)
      state = mgr.cycle(state.withColumn("x", col("x") + 1.0), i)
    val result = mgr.finish(state.select(col("id"), col("x")))
    val total = result.select(sum("x")).as[Double].head()
    assert(total == 20.0 * rounds, s"rounds=$rounds: got $total")
    GraphFrame.release(result)
  }

  test("finish: no-op-projection result survives close (last round = cut)") {
    finishSurvives(4)
  }

  test("finish: no-op-projection result survives close (last round = lazy persist)") {
    finishSurvives(5)
  }
}
