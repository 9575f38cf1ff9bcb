package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming steady-state near-dup ingest: per-micro-batch matching vs a
 * static MinHash index, the stated cross-batch blind window, and
 * batch-operator agreement within a micro-batch. */
class StreamingIncrementalDedupSpec extends TestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "completely different corpus text about spark partitions and shuffles"))

  // near-identical to corpus doc 1 (one token changed at the end)
  private val nearDup1 = "the quick brown fox jumps over the lazy dog tonight"

  private def runBatches(batches: Seq[Seq[(Long, String)]],
      matchNewPairs: Boolean = true, growIndex: Boolean = false,
      indexSink: (DataFrame, Long) => Unit = null): Seq[(Long, Seq[Row])] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = pipeline.Dedup.minhashIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text").persist()
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Row])]
    val q = EventStreams.incrementalNearDupStream(docs, "doc_id", "text",
        index, (pairs, id) => got.synchronized { got += ((id, pairs.collect().toSeq)) },
        matchNewPairs = matchNewPairs, growIndex = growIndex, indexSink = indexSink)
      .queryName(s"inc_dedup_${System.nanoTime()}").start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally { q.stop(); index.unpersist(false) }
    got.toSeq
  }

  test("every micro-batch matches against the static index") {
    val out = runBatches(Seq(
      Seq((100L, nearDup1)),
      Seq((200L, nearDup1))))
    val nonEmpty = out.filter(_._2.nonEmpty)
    assert(nonEmpty.size === 2, s"both batches should match corpus doc 1: $out")
    for ((_, rows) <- nonEmpty) {
      val vsCorpus = rows.filter(_.getLong(1) == 1L)
      assert(vsCorpus.nonEmpty, s"expected a match vs corpus doc 1 in $rows")
      assert(vsCorpus.head.getDouble(2) > 0.4) // high lane agreement
    }
  }

  test("within-batch novel pairs match; cross-batch novel pairs are the stated blind window") {
    val novel = "zebra umbrella quartz fjord waltz nymph vexing blimp jocks"
    val out = runBatches(Seq(
      Seq((100L, novel), (101L, novel)), // same novel text, same batch
      Seq((200L, novel)))) // same novel text, NEXT batch
    val batch0 = out.head._2
    // 101 matched 100 within the micro-batch (later doc points at earlier)
    assert(batch0.exists(r => r.getLong(0) == 101L && r.getLong(1) == 100L), s"$batch0")
    // batch 1: doc 200 is a novel dup of docs from the PREVIOUS batch —
    // NOT matched (the documented blind window until the index refreshes)
    val batch1 = out(1)._2
    assert(batch1.isEmpty, s"cross-batch novel dup must not match: $batch1")
  }

  test("growIndex closes the cross-batch blind window") {
    val novel = "zebra umbrella quartz fjord waltz nymph vexing blimp jocks"
    val out = runBatches(Seq(
      Seq((100L, novel)),
      Seq((200L, novel)),  // novel dup of batch-0's doc — must be caught
      Seq((300L, novel))), // and batch 2 must see BOTH earlier batches
      growIndex = true)
    assert(out.head._2.isEmpty, s"batch 0 has nothing to match: ${out.head}")
    val b1 = out(1)._2.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(b1.contains((200L, 100L, 1.0)), s"cross-batch dup not caught: $b1")
    val b2 = out(2)._2.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b2 == Set((300L, 100L), (300L, 200L)), s"batch 2 matches: $b2")
  }

  test("growIndex still matches the static corpus, and appends AFTER matching") {
    val out = runBatches(Seq(
      Seq((100L, nearDup1)),
      Seq((200L, nearDup1))), growIndex = true)
    val b0 = out.head._2.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b0 == Set((100L, 1L)), s"batch 0: $b0") // corpus match only, never itself
    val b1 = out(1)._2.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1 == Set((200L, 1L), (200L, 100L)), s"batch 1: $b1")
  }

  test("indexSink receives each batch's fingerprints (the durable-growth hook)") {
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    runBatches(Seq(
      Seq((100L, nearDup1), (101L, nearDup1)),
      Seq((200L, nearDup1))), growIndex = true,
      indexSink = (idx, id) => sunk.synchronized {
        sunk += ((id, idx.select("doc_id").collect().map(_.getLong(0)).toSet))
      })
    assert(sunk.map(_._2) == Seq(Set(100L, 101L), Set(200L)), s"$sunk")
  }

  test("one micro-batch equals the batch operator row-for-row") {
    val newDocs = Seq((100L, nearDup1), (101L, nearDup1),
      (102L, "yet another unrelated document about streaming state stores"))
    val streamed = runBatches(Seq(newDocs)).flatMap(_._2)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val index = pipeline.Dedup.minhashIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text")
    val batch = pipeline.Dedup.incrementalNearDups(
        newDocs.toDF("doc_id", "text"), "doc_id", "text", index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch)
  }

  test("index built with different parameters fails loudly at stream definition") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val narrow = pipeline.Dedup.minhashIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text", bands = 4, rowsPerBand = 2)
    val in = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      EventStreams.incrementalNearDupStream(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", narrow, (_, _) => ())
    }
    assert(e.getMessage.contains("index built with different parameters"))
  }
}
