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

  // Round-13 (verdict ask): EVERY shared-frame pipeline op must leave
  // zero residual persistent RDDs after compute + releaseShared — a user
  // session looping these ops otherwise accretes one pinned frame per
  // call until LRU eviction (the scaladoc contract, now asserted per op).
  private def assertReleaseShared(name: String)(
      run: => org.apache.spark.sql.DataFrame): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.catalog.clearCache()
    val before = leftoverIds()
    val result = run
    result.count()
    pipeline.releaseShared(result)
    val after = leftoverIds() -- before
    assert(after.isEmpty,
      s"$name leaked pinned frames after releaseShared: ${after.toSeq.sorted}")
  }

  private lazy val hygieneDocs = {
    val rows = (0 until 40).map(i =>
      (i.toLong, s"alpha beta gamma delta token$i epsilon zeta " * 3))
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  test("fuzzyPairs (single key) releases its shared block frame") {
    assertReleaseShared("fuzzyPairs") {
      pipeline.Dedup.fuzzyPairs(hygieneDocs, "doc_id", "text",
        substring(col("text"), 1, 10), maxDist = 2, maxBlock = 100)
    }
  }

  test("fuzzyPairs (multi key) releases its shared block frame") {
    assertReleaseShared("fuzzyPairs-multi") {
      pipeline.Dedup.fuzzyPairs(hygieneDocs, "doc_id", "text",
        Seq(substring(col("text"), 1, 10), length(col("text")).cast("string")),
        maxDist = 2, maxBlock = 100)
    }
  }

  test("ngramJaccard releases its shared shingle frame") {
    assertReleaseShared("ngramJaccard") {
      pipeline.Dedup.ngramJaccard(hygieneDocs, "doc_id", "text",
        n = 3, minShared = 2)
    }
  }

  test("containmentPairs releases its shared shingle frame") {
    assertReleaseShared("containmentPairs") {
      pipeline.Dedup.containmentPairs(hygieneDocs, "doc_id", "text",
        n = 3, minShared = 2, threshold = 0.1)
    }
  }

  test("tfCosinePairs releases its shared term frame") {
    assertReleaseShared("tfCosinePairs") {
      pipeline.Text.tfCosinePairs(hygieneDocs, "doc_id", "text",
        minCosine = 0.5, maxDocFreq = 100)
    }
  }

  test("dsirWeights releases its shared (doc,bucket,n) frame") {
    assertReleaseShared("dsirWeights") {
      pipeline.Text.dsirWeights(hygieneDocs, "doc_id", "text",
        col("doc_id") < 10, buckets = 64)
    }
  }

  test("coOccurrence releases its shared basket frame") {
    assertReleaseShared("coOccurrence") {
      pipeline.Recommend.coOccurrence(
        hygieneDocs.selectExpr("doc_id % 5 AS basket", "doc_id AS item"),
        "basket", "item", maxBasket = 100)
    }
  }

  test("cliques4 releases its shared oriented-edge frames") {
    assertReleaseShared("cliques4") {
      lib.Cliques.cliques4(friends)
    }
  }

  // r15 (ADVICE item): hostRank's host-edge pin is operator-internal —
  // the result must be self-contained on BOTH PageRank paths (the local
  // tail's join-back used to reference the cached edges, pinning a
  // crawl-sized frame until session cache clear)
  test("hostRank does not leak its internal edge pin") {
    val pages = spark.createDataFrame((0 until 30).map { i =>
      (i.toLong, s"http://h${i % 3}.com/p$i",
        s"""<a href="http://h${(i + 1) % 3}.com/x">a</a>""")
    }).toDF("id", "url", "html")
    assertNoLeak(pipeline.Web.hostRank(pages, "id", "url", "html", maxIter = 3))
  }
}
