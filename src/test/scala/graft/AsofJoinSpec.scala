package graft

import org.apache.spark.sql.functions._

/** As-of join: hand-checked semantics (backward lookup, ties, strict
 * mode, missing match) and a differential test against a naive
 * driver-side implementation on random data. */
class AsofJoinSpec extends TestBase {
  import spark.implicits._

  private val right = Seq(
    (1L, 100L, 10L), (1L, 200L, 11L), (1L, 200L, 12L), (1L, 300L, 13L),
    (2L, 150L, 20L)).toDF("k", "ts", "rid")
  private val left = Seq(
    (1L, 50L, 1L), (1L, 200L, 2L), (1L, 250L, 3L), (2L, 150L, 4L),
    (3L, 999L, 5L)).toDF("k", "ts", "lid")

  test("backward as-of: latest right at or before each left row") {
    val out = pipeline.Events.asofJoin(left, right, Seq("k"),
        "ts", "ts", Seq("rid", "ts"), prefix = "m_")
      .select("lid", "m_rid", "m_ts").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) === ((None, None)))           // nothing at or before 50
    assert(out(2L) === ((Some(12L), Some(200L)))) // tie at 200 -> largest rid
    assert(out(3L) === ((Some(12L), Some(200L))))
    assert(out(4L) === ((Some(20L), Some(150L)))) // equal ts included
    assert(out(5L) === ((None, None)))           // key with no right rows
  }

  test("reserved _asof_* column names in either input are rejected loudly") {
    val poisoned = left.withColumn("_asof_ts", lit(1L))
    val ex = intercept[IllegalArgumentException] {
      pipeline.Events.asofJoin(poisoned, right, Seq("k"), "ts", "ts", Seq("rid"))
    }
    assert(ex.getMessage.contains("_asof_ts"))
    val poisonedR = right.withColumn("_asof_hit", lit(1L))
    intercept[IllegalArgumentException] {
      pipeline.Events.asofJoin(left, poisonedR, Seq("k"), "ts", "ts", Seq("rid"))
    }
  }

  test("strict mode excludes equal timestamps") {
    val out = pipeline.Events.asofJoin(left, right, Seq("k"),
        "ts", "ts", Seq("rid"), prefix = "m_", strict = true)
      .select("lid", "m_rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L) === Some(10L)) // the 200s are excluded, 100 remains
    assert(out(4L) === None)      // only right row is at the same ts
  }

  test("forward as-of: earliest right at or after; strict; naive differential") {
    val out = pipeline.Events.asofJoin(left, right, Seq("k"),
        "ts", "ts", Seq("rid", "ts"), prefix = "m_", direction = "forward")
      .select("lid", "m_rid", "m_ts").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) === ((Some(10L), Some(100L)))) // next after 50 is 100
    assert(out(2L) === ((Some(12L), Some(200L)))) // tie at 200 -> largest rid
    assert(out(3L) === ((Some(13L), Some(300L))))
    assert(out(4L) === ((Some(20L), Some(150L)))) // equal ts included
    assert(out(5L) === ((None, None)))
    // strict: equal ts excluded
    val s = pipeline.Events.asofJoin(left, right, Seq("k"),
        "ts", "ts", Seq("rid"), prefix = "m_", strict = true,
        direction = "forward")
      .select("lid", "m_rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(s(2L) === Some(13L)) // the 200s excluded, 300 remains
    assert(s(4L) === None)
    // differential vs naive on random data
    val rng = new scala.util.Random(41)
    val rr = (1 to 300).map(_ =>
      (rng.nextInt(8).toLong, rng.nextInt(50).toLong * 10, rng.nextLong().abs))
    val ll = (1 to 200).map(i =>
      (rng.nextInt(10).toLong, rng.nextInt(60).toLong * 10, i.toLong))
    val got = pipeline.Events.asofJoin(
        ll.toDF("k", "ts", "lid"), rr.toDF("k", "ts", "rid"),
        Seq("k"), "ts", "ts", Seq("rid"), prefix = "m_", direction = "forward")
      .select("lid", "m_rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    for ((k, ts, lid) <- ll) {
      val cand = rr.filter(x => x._1 == k && x._2 >= ts)
      val want =
        if (cand.isEmpty) None
        else {
          val minTs = cand.map(_._2).min
          Some(cand.filter(_._2 == minTs).map(_._3).max) // largest payload
        }
      assert(got(lid) === want, s"left ($k, $ts, $lid)")
    }
    intercept[IllegalArgumentException] {
      pipeline.Events.asofJoin(left, right, Seq("k"), "ts", "ts",
        Seq("rid"), direction = "sideways")
    }
  }

  test("matches a naive implementation on random data") {
    val rng = new scala.util.Random(23)
    val r = (1 to 300).map(_ =>
      (rng.nextInt(8).toLong, rng.nextInt(50).toLong * 10, rng.nextLong().abs))
    val l = (1 to 200).map(i =>
      (rng.nextInt(10).toLong, rng.nextInt(60).toLong * 10, i.toLong))
    val got = pipeline.Events.asofJoin(
        l.toDF("k", "ts", "lid"), r.toDF("k", "ts", "rid"),
        Seq("k"), "ts", "ts", Seq("rid"), prefix = "m_")
      .select("lid", "m_rid").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    val byKey = r.groupBy(_._1)
    val want = l.map { case (k, ts, lid) =>
      val cands = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(c => (c._2, c._3))._3))
    }.toMap
    assert(got === want)
  }

  test("tie-break property: winner is partition-count-invariant and " +
      "independent of trailing rightCols order (nulls and NaN present)") {
    // many deliberate (key, ts) ties; rid unique and FIRST in rightCols, so
    // the documented contract ("pass a unique id as rightCols.head") must
    // yield ONE winner per left row no matter how the inputs are
    // partitioned or how the remaining payload columns are ordered —
    // even with null and NaN values in those trailing columns
    val rng = new scala.util.Random(97)
    val rrows = (1 to 240).map { i =>
      val payload: java.lang.Double =
        if (i % 7 == 0) null
        else if (i % 11 == 0) Double.NaN
        else rng.nextDouble()
      (rng.nextInt(5).toLong, rng.nextInt(6).toLong * 100, i.toLong, payload,
        if (i % 5 == 0) null else s"s${rng.nextInt(3)}")
    }
    val lrows = (1 to 120).map(i =>
      (rng.nextInt(6).toLong, rng.nextInt(8).toLong * 100, i.toLong))
    def winners(lparts: Int, rparts: Int, tail: Seq[String]): Map[Long, Option[Any]] =
      pipeline.Events.asofJoin(
          lrows.toDF("k", "ts", "lid").repartition(lparts),
          rrows.toDF("k", "ts", "rid", "d", "s").repartition(rparts),
          Seq("k"), "ts", "ts", "rid" +: tail, prefix = "m_")
        .select("lid", "m_rid").collect()
        .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    val base = winners(1, 1, Seq("d", "s"))
    // the unique head makes the expected winner computable: max (ts, rid)
    val byKey = rrows.groupBy(_._1)
    lrows.foreach { case (k, ts, lid) =>
      val cands = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
      val want = if (cands.isEmpty) None else Some(cands.maxBy(c => (c._2, c._3))._3)
      assert(base(lid) === want, s"lid=$lid")
    }
    assert(winners(7, 3, Seq("d", "s")) === base)
    assert(winners(16, 16, Seq("d", "s")) === base)
    assert(winners(3, 7, Seq("s", "d")) === base) // permuted trailing cols
  }
}
