package graft.lib

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Holland–Leinhardt triad census (engine extension): the counts of all 16
 * directed-triad isomorphism classes (003, 012, 102, 021D/U/C, 111D/U,
 * 030T/C, 201, 120D/U/C, 210, 300) over the simple digraph — the classic
 * social-network structural signature (motif spectrum of order 3).
 *
 * Counting strategy (Batagelj–Mrvar style): only triads with ≥ 2
 * connected pairs are ENUMERATED — as wedges around each center vertex,
 * the same O(Σ deg²) shape as triangle counting — and classified by an
 * isomorphism-invariant 64-entry lookup on the six direction bits.
 * A triple whose third pair is also connected is found once per its 3
 * centers, so closed-class counts divide by 3 exactly. The three
 * remaining classes never touch a join: with A asym pairs, M mutual
 * pairs and n vertices,
 * `012 = A·(n−2) − Σ asymPairs(t)·count(t)`,
 * `102 = M·(n−2) − Σ mutualPairs(t)·count(t)`, and 003 is the C(n,3)
 * remainder — exact integer arithmetic in BigInt on the driver (13
 * collected class counts + three scalars), emitted as DECIMAL(38,0) so
 * web-scale C(n,3) values cannot overflow anything.
 *
 * Scale: one pair-canonicalization aggregation, one self-join on the
 * wedge center (skew caveat: a degree-d hub contributes C(d,2) wedges —
 * the same hotspot triangle counting has), one broadcast-sized lookup.
 * No driver state beyond the 16 counts.
 */
class TriadCensus(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}
  import TriadCensus._

  /** Returns exactly 16 rows `(triad: string, count: decimal(38,0))`,
   * one per isomorphism class, including zero counts. */
  def run(): DataFrame = {
    val spark = g.vertices.sparkSession
    val e = g.edges.select(col(SRC), col(DST))
      .filter(col(SRC).isNotNull && col(DST).isNotNull && col(SRC) =!= col(DST))
      .distinct()
      .join(g.vertices.select(col(ID).as(SRC)), Seq(SRC), "left_semi")
      .join(g.vertices.select(col(ID).as(DST)), Seq(DST), "left_semi")
      .select(col(SRC), col(DST))
    // canonical pair table: (u < v, fwd = u→v present, bwd = v→u present)
    val pairs = e
      .select(least(col(SRC), col(DST)).as("u"), greatest(col(SRC), col(DST)).as("v"),
        (col(SRC) < col(DST)).as("_isFwd"))
      .groupBy("u", "v")
      .agg(max(when(col("_isFwd"), 1).otherwise(0)).as("fwd"),
        max(when(!col("_isFwd"), 1).otherwise(0)).as("bwd"))
      .persist()
    val n = g.vertices.select(col(ID)).distinct().count()
    val amRow = pairs.agg(
      sum(when(col("fwd") + col("bwd") === 1, 1L).otherwise(0L)),
      sum(when(col("fwd") + col("bwd") === 2, 1L).otherwise(0L))).head()
    val asymPairsN = if (amRow.isNullAt(0)) 0L else amRow.getLong(0)
    val mutualPairsN = if (amRow.isNullAt(1)) 0L else amRow.getLong(1)
    // both orientations around a center c: out bit (c→w), in bit (w→c)
    val half = pairs.select(col("u").as("c"), col("v").as("w"),
        col("fwd").as("ob"), col("bwd").as("ib"))
      .unionByName(pairs.select(col("v").as("c"), col("u").as("w"),
        col("bwd").as("ob"), col("fwd").as("ib")))
    // wedges (c; x < y), third-pair bits from a left join back to pairs;
    // 6-bit code in the (c, x, y) labeling — the lookup is isomorphism-
    // invariant, so the labeling choice is free
    val wedges = half.as("p")
      .join(half.as("q"),
        col("p.c") === col("q.c") && col("p.w") < col("q.w"))
      .select(col("p.c").as("c"), col("p.w").as("x"), col("q.w").as("y"),
        col("p.ob").as("cx"), col("p.ib").as("xc"),
        col("q.ob").as("cy"), col("q.ib").as("yc"))
      .join(pairs.select(col("u").as("x"), col("v").as("y"),
          col("fwd").as("xy"), col("bwd").as("yx")),
        Seq("x", "y"), "left")
      .select((col("cx") + col("xc") * 2 + col("cy") * 4 + col("yc") * 8 +
        coalesce(col("xy"), lit(0)) * 16 + coalesce(col("yx"), lit(0)) * 32)
        .as("code"))
    val lookup = typedlit(codeToType)
    val enumerated = wedges
      .select(element_at(lookup, col("code")).as("triad"))
      .groupBy("triad").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pairs.unpersist(false)

    val counts = scala.collection.mutable.Map.empty[String, BigInt]
    enumerated.foreach { case (t, c) =>
      val div = if (closedTypes(t)) 3L else 1L
      require(c % div == 0, s"triad census internal error: $t count $c not divisible by $div")
      counts(t) = BigInt(c / div)
    }
    val nB = BigInt(n)
    val corrAsym = counts.map { case (t, c) => c * asymPairsIn(t) }
      .foldLeft(BigInt(0))(_ + _)
    val corrMut = counts.map { case (t, c) => c * mutualPairsIn(t) }
      .foldLeft(BigInt(0))(_ + _)
    counts("012") = BigInt(asymPairsN) * (nB - 2).max(BigInt(0)) - corrAsym
    counts("102") = BigInt(mutualPairsN) * (nB - 2).max(BigInt(0)) - corrMut
    val total = if (nB >= 3) nB * (nB - 1) * (nB - 2) / 6 else BigInt(0)
    counts("003") = total - counts.filterKeys(_ != "003").values
      .foldLeft(BigInt(0))(_ + _)

    import org.apache.spark.sql.types._
    val dec = DecimalType(38, 0)
    val schema = StructType(Seq(StructField("triad", StringType),
      StructField("count", dec)))
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      allTypes.map(t => Row(t,
        new java.math.BigDecimal(counts.getOrElse(t, BigInt(0)).bigInteger))): _*)
    spark.createDataFrame(rows, schema)
  }
}

object TriadCensus {
  /** Census order of Holland & Leinhardt (M-A-N labels + orientation). */
  val allTypes: Seq[String] = Seq("003", "012", "102", "021D", "021U",
    "021C", "111D", "111U", "030T", "030C", "201", "120D", "120U", "120C",
    "210", "300")

  private val closedTypes: Set[String] =
    Set("030T", "030C", "120D", "120U", "120C", "210", "300")

  private[graft] def asymPairsIn(t: String): Int = t match {
    case "021D" | "021U" | "021C" | "120D" | "120U" | "120C" => 2
    case "111D" | "111U" | "210" => 1
    case "030T" | "030C" => 3
    case "012" => 1
    case _ => 0
  }

  private[graft] def mutualPairsIn(t: String): Int = t match {
    case "111D" | "111U" | "120D" | "120U" | "120C" => 1
    case "201" | "210" => 2
    case "300" => 3
    case "102" => 1
    case _ => 0
  }

  /** Classify the 6 direction bits of a labeled triple (a, b, c):
   * bit0 a→b, bit1 b→a, bit2 a→c, bit3 c→a, bit4 b→c, bit5 c→b.
   * Isomorphism-invariant by construction (rules depend only on pair
   * states and in/out-star structure). */
  private[graft] def classify(code: Int): String = {
    val ab = (code & 1, (code >> 1) & 1)
    val ac = ((code >> 2) & 1, (code >> 3) & 1)
    val bc = ((code >> 4) & 1, (code >> 5) & 1)
    // vertex labels 0=a, 1=b, 2=c; arcs as (from, to)
    val arcs = Seq(
      if (ab._1 == 1) Some((0, 1)) else None, if (ab._2 == 1) Some((1, 0)) else None,
      if (ac._1 == 1) Some((0, 2)) else None, if (ac._2 == 1) Some((2, 0)) else None,
      if (bc._1 == 1) Some((1, 2)) else None, if (bc._2 == 1) Some((2, 1)) else None
    ).flatten
    def state(p: (Int, Int)): Int = p._1 + p._2 // 0 null, 1 asym, 2 mutual
    val states = Seq(state(ab), state(ac), state(bc))
    val m = states.count(_ == 2); val a = states.count(_ == 1)
    val outdeg = (0 to 2).map(v => arcs.count(_._1 == v))
    val indeg = (0 to 2).map(v => arcs.count(_._2 == v))
    (m, a) match {
      case (0, 0) => "003"
      case (0, 1) => "012"
      case (1, 0) => "102"
      case (0, 2) =>
        if (outdeg.contains(2)) "021D" // one sender to both others
        else if (indeg.contains(2)) "021U" // one receiver from both
        else "021C" // chain
      case (1, 1) =>
        // mutual dyad {p,q}; the asym arc links the outsider o to the dyad
        val dyad = Seq((0, 1), (0, 2), (1, 2))(states.indexOf(2))
        val asymArc = arcs.find(x =>
          !(Set(x._1, x._2) == Set(dyad._1, dyad._2))).get
        val o = (0 to 2).find(v => v != dyad._1 && v != dyad._2).get
        if (asymArc._1 == o) "111D" else "111U" // outsider sends → D
      case (0, 3) =>
        if (outdeg.forall(_ == 1) && indeg.forall(_ == 1)) "030C" else "030T"
      case (2, 0) => "201"
      case (1, 2) =>
        // mutual dyad; outsider o carries both asym arcs
        val dyad = Seq((0, 1), (0, 2), (1, 2))(states.indexOf(2))
        val o = (0 to 2).find(v => v != dyad._1 && v != dyad._2).get
        val sends = arcs.count(x => x._1 == o && Set(dyad._1, dyad._2)(x._2))
        if (sends == 2) "120D" else if (sends == 0) "120U" else "120C"
      case (2, 1) => "210"
      case (3, 0) => "300"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  /** 64-entry code → class lookup embedded as a literal map column. */
  private[graft] val codeToType: Map[Int, String] =
    (0 until 64).map(c => c -> classify(c)).toMap
}
