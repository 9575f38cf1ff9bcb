package graft

import org.apache.spark.sql.functions._

/** Triad census: the classify lookup is validated against an INDEPENDENT
 * permutation-canonical reference classifier over all 64 codes, and the
 * operator against brute-force enumeration on random digraphs. */
class TriadCensusSpec extends TestBase {
  import spark.implicits._
  import graft.lib.TriadCensus

  /** Reference classifier: canonicalize by trying all 6 vertex
   * permutations and match against a catalog of the 16 types given as
   * explicit arc sets (Holland–Leinhardt pictures) — a completely
   * different method from the production rule-based classify. */
  private val catalog: Map[String, Set[(Int, Int)]] = Map(
    "003" -> Set(),
    "012" -> Set((0, 1)),
    "102" -> Set((0, 1), (1, 0)),
    "021D" -> Set((1, 0), (1, 2)), // B sends to both
    "021U" -> Set((0, 1), (2, 1)), // both send to B
    "021C" -> Set((0, 1), (1, 2)),
    "111D" -> Set((0, 1), (1, 0), (2, 1)), // A<->B<-C
    "111U" -> Set((0, 1), (1, 0), (1, 2)), // A<->B->C
    "030T" -> Set((0, 1), (0, 2), (1, 2)),
    "030C" -> Set((0, 1), (1, 2), (2, 0)),
    "201" -> Set((0, 1), (1, 0), (1, 2), (2, 1)),
    "120D" -> Set((1, 0), (1, 2), (0, 2), (2, 0)), // B sends to both, A<->C
    "120U" -> Set((0, 1), (2, 1), (0, 2), (2, 0)), // both send to B, A<->C
    "120C" -> Set((0, 1), (1, 2), (0, 2), (2, 0)), // chain through B, A<->C
    "210" -> Set((0, 1), (1, 0), (1, 2), (2, 1), (0, 2)),
    "300" -> Set((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)))

  private def arcsOf(code: Int): Set[(Int, Int)] = {
    val bits = Seq((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1))
    bits.zipWithIndex.collect { case (arc, i) if ((code >> i) & 1) == 1 => arc }.toSet
  }

  private def refClassify(code: Int): String = {
    val arcs = arcsOf(code)
    val perms = Seq(0, 1, 2).permutations.toSeq
    catalog.collectFirst { case (name, pic)
      if perms.exists(p => arcs.map { case (x, y) => (p(x), p(y)) } == pic) => name
    }.getOrElse(sys.error(s"code $code matched no catalog picture"))
  }

  test("the 64-entry classify lookup matches the permutation-canonical reference on every code") {
    (0 until 64).foreach { code =>
      assert(TriadCensus.codeToType(code) == refClassify(code),
        s"code $code: lookup ${TriadCensus.codeToType(code)} vs ref ${refClassify(code)}")
    }
  }

  /** Brute-force census of an explicit arc list over vertices 0..n-1. */
  private def bruteCensus(n: Int, arcs: Set[(Long, Long)]): Map[String, BigInt] = {
    val counts = scala.collection.mutable.Map.empty[String, BigInt]
      .withDefaultValue(BigInt(0))
    for (a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n) {
      val bits = Seq((a, b), (b, a), (a, c), (c, a), (b, c), (c, b))
        .zipWithIndex.map { case ((x, y), i) =>
          if (arcs((x.toLong, y.toLong))) 1 << i else 0 }.sum
      val t = TriadCensus.codeToType(bits)
      counts(t) += 1
    }
    counts.toMap.withDefaultValue(BigInt(0))
  }

  private def runCensus(n: Int, arcs: Set[(Long, Long)]): Map[String, BigInt] = {
    val v = (0L until n.toLong).toDF("id")
    val e = arcs.toSeq.toDF("src", "dst")
    GraphFrame(v, e).triadCensus.run().collect()
      .map(r => r.getString(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
  }

  test("operator equals brute force on deterministic pseudo-random digraphs") {
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 12
      val arcs = (for (a <- 0L until n; b <- 0L until n
        if a != b && rnd.nextDouble() < 0.25) yield (a, b)).toSet
      val got = runCensus(n, arcs)
      val want = bruteCensus(n, arcs)
      TriadCensus.allTypes.foreach { t =>
        assert(got(t) == want(t), s"seed $seed type $t: ${got(t)} vs ${want(t)}") }
      assert(got.values.sum == BigInt(n) * (n - 1) * (n - 2) / 6)
    }
  }

  test("duplicates, self-loops and dangling endpoints drop before the census") {
    // triangle 0->1->2->0 plus noise: dup arc, loop, edge to vertex 99
    val v = (0L to 3L).toDF("id")
    val e = Seq((0L, 1L), (0L, 1L), (1L, 2L), (2L, 0L), (1L, 1L), (0L, 99L))
      .toDF("src", "dst")
    val got = GraphFrame(v, e).triadCensus.run().collect()
      .map(r => r.getString(0) -> r.getDecimal(1).longValueExact()).toMap
    // cleaned graph: 0->1->2->0 over vertices {0,1,2,3}; triple {0,1,2}
    // is the cycle, the three triples containing vertex 3 each see one
    // asym pair
    assert(got("030C") == 1L && got("012") == 3L && got("003") == 0L)
    assert(got.values.sum == 4L) // C(4,3) triples
  }
}
