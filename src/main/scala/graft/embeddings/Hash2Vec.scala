package graft.embeddings

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hash2Vec: vocabulary-free sequence embeddings by feature hashing
 * (Argerich, Torré Zaffaroni, Cano, "Hash2Vec: feature hashing for word
 * embeddings", arXiv:1608.08940) — the faithful counterpart of reference
 * embeddings/Hash2Vec.scala:48-584.
 *
 * Semantics (identical to the reference): for every occurrence of an
 * element `x` in a sequence, every context element `w` within
 * `contextSize` positions contributes `sign(w) * decay(|distance|)` to
 * `x`'s accumulator at lane `hash(w) % dim`; per-element vectors are the
 * sum over all occurrences in the corpus, optionally L2-normalized with a
 * `log(norm+1)/sqrt(dim)` magnitude channel appended ("safe norm",
 * reference Hash2Vec.scala:68-92). Elements whose occurrences have no
 * context (length-1 sequences) still get a zero vector, matching the
 * reference's allocate-on-first-sight behavior (Hash2Vec.scala:371-377).
 *
 * Architecture divergence (deliberate, Spark-first): the reference runs
 * `rdd.mapPartitions` with hand-paged local float matrices so only one
 * pre-aggregated vector per (partition, element) reaches the shuffle
 * (Hash2Vec.scala:299-325). Here the same math is a generator + ONE
 * aggregation: [[graft.expressions.LaneSumAgg]] scatter-adds each
 * (element, lane, ±decay) contribution into a dense double[dim] combine
 * buffer with map-side partials, so exactly one dim-wide vector per
 * (partition, element) reaches the shuffle — the same bound the
 * reference's paged matrices achieve — and the aggregate output IS the
 * dense vector (no second shuffle, no map re-pack). The paged matrix is
 * what a row-at-a-time engine needs; partial aggregation is how the same
 * dataflow is said natively in Spark.
 *
 * Hashing is seeded and deterministic (no RNG state, task-retry-safe):
 * `xxhash64` by default, `md5` mode for bit-exact SQL-oracle replay (the
 * same switch the MIS / random-walk operators use).
 */
object Hash2Vec {

  /** ±1 sign and lane index of a context element, from the element's
   * string form. Two independent hash families (lane vs sign) via
   * distinct tags, mirroring the reference's two seeds
   * (hashingSeed/signHashingSeed, Hash2Vec.scala:61-62). */
  private def laneExpr(w: Column, dim: Int, hashMode: String, seed: Long): Column =
    hashMode match {
      case "md5" =>
        (conv(substring(md5(concat(lit("i|"), w, lit(s"|$seed"))), 1, 4), 16, 10)
          .cast("int") % dim).cast("int")
      case _ => pmod(xxhash64(lit("i"), w, lit(seed)), lit(dim)).cast("int")
    }

  private def signExpr(w: Column, hashMode: String, seed: Long): Column = {
    val bit = hashMode match {
      case "md5" =>
        conv(substring(md5(concat(lit("s|"), w, lit(s"|$seed"))), 1, 1), 16, 10)
          .cast("int") % 2
      case _ => pmod(xxhash64(lit("s"), w, lit(seed)), lit(2)).cast("int")
    }
    when(bit === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Gaussian decay weights for distances 1..contextSize (reference
   * decayGaussian, Hash2Vec.scala:50-52); "constant" weighs every context
   * position 1.0. */
  private def decayWeights(decay: String, contextSize: Int, sigma: Double): Seq[Double] =
    decay match {
      case "gaussian" => (1 to contextSize).map(d => math.exp(-(d * d) / (sigma * sigma)))
      case "constant" => Seq.fill(contextSize)(1.0)
      case other => throw new IllegalArgumentException(s"unsupported decay function $other")
    }

  /**
   * Embed the elements of `seqCol` (an array column; elements of any
   * atomic type — hashed by their string form). Returns
   * (id: element type, vector: array<double>) with one row per distinct
   * element; `vector` has `dim` lanes, plus the magnitude channel when
   * `doNorm && safeNorm`.
   */
  def embedSequences(df: DataFrame, seqCol: String,
      dim: Int = 64, contextSize: Int = 5,
      decay: String = "gaussian", gaussianSigma: Double = 1.0,
      doNorm: Boolean = true, safeNorm: Boolean = true,
      hashMode: String = "xxhash64", seed: Long = 42L): DataFrame = {
    require(dim > 0 && contextSize > 0)
    val weights = typedlit(decayWeights(decay, contextSize, gaussianSigma))
    val c = contextSize
    val seq0 = col(seqCol)

    // Lane index and sign depend only on the context element's VALUE, so
    // hash each occurrence ONCE (one (lane, sign) struct per position)
    // instead of once per (occurrence, context) pair — 2c× fewer md5/
    // xxhash evaluations; the window generator below just slices this
    // array in lockstep with the sequence. (Round-9 profile: the md5s
    // were ~60% of the query's time at contextSize 2.)
    // ensureParallelism (r15): a one-row-group parquet source otherwise
    // runs the whole hash+window pipeline below on a single core
    val pre = graft.pipeline.ensureParallelism(df).select(seq0.as("_seq"),
      transform(seq0, w => struct(laneExpr(w, dim, hashMode, seed).as("i"),
        signExpr(w, hashMode, seed).as("s"))).as("_ls"))
    val s = col("_seq")
    val ls = col("_ls")

    // Per center position i (0-based), contributions from the clamped
    // window [pos-c, pos+c] \ {pos} (pos = i+1, 1-based), as
    // (center, lane, value) structs built by nested higher-order
    // functions — one generator row per (occurrence, context) pair, no
    // duplication of the sequence array per center. A zero sentinel per
    // center guarantees context-free elements still surface (zero vector).
    val pairs = flatten(transform(s, (center, i) => {
      val pos = i + lit(1)
      val lStart = greatest(pos - c, lit(1))
      val left = slice(ls, lStart, pos - lStart)
      val right = slice(ls, pos + lit(1), least(pos + c, size(s)) - pos)
      val sentinel = struct(center.as("cid"), lit(0).as("i"), lit(0.0).as("v"))
      def contrib(p: Column, dist: Column): Column =
        struct(center.as("cid"), p.getField("i").as("i"),
          (p.getField("s") * element_at(weights, dist)).as("v"))
      concat(
        array(sentinel),
        transform(left, (p, j) => contrib(p, pos - (lStart + j))),
        transform(right, (p, j) => contrib(p, j + lit(1))))
    }))

    // one aggregation: (element, lane, v) scatter-adds into a dense
    // double[dim] buffer with map-side partials (LaneSumAgg), replacing
    // the two-shuffle groupBy(id, lane) -> sum -> groupBy(id) -> re-pack
    // pipeline; per (element, partition) the combine state is one dim-wide
    // vector — the same bound the reference's paged matrices achieve
    val sums = pre
      .select(explode(pairs).as("_p"))
      .select(col("_p.cid").as("_id"), col("_p.i").as("_i"), col("_p.v").as("_v"))
      .groupBy("_id")
      .agg(graft.expressions.IterAggregates
        .laneSum(col("_i"), col("_v"), dim).as("_dense"))
    val dense = col("_dense")

    val vec =
      if (!doNorm) dense
      else {
        val nrm = sqrt(aggregate(dense, lit(0.0), (a, x) => a + x * x))
        val scaled = transform(dense, x => when(nrm > 0, x / nrm).otherwise(x))
        if (safeNorm) concat(scaled, array(log(nrm + lit(1.0)) / math.sqrt(dim)))
        else scaled
      }
    sums.select(col("_id").as("id"), vec.as("vector"))
  }

  /** Graph-node embeddings: deterministic random walks fed through
   * [[embedSequences]] (the reference's default wiring — Hash2Vec's
   * sequenceCol defaults to the random-walk output column,
   * Hash2Vec.scala:58). */
  def forGraph(g: graft.GraphFrame, dim: Int = 64, contextSize: Int = 5,
      walkLength: Int = 10, walksPerVertex: Int = 5,
      decay: String = "gaussian", gaussianSigma: Double = 1.0,
      doNorm: Boolean = true, safeNorm: Boolean = true,
      hashMode: String = "xxhash64", seed: Long = 42L): DataFrame = {
    val walks = g.randomWalks
      .setWalkLength(walkLength).setWalksPerVertex(walksPerVertex)
      .setSeed(seed).setHashMode(hashMode)
      .run()
    embedSequences(walks.select(col("random_walk").cast("array<string>").as("seq")),
      "seq", dim, contextSize, decay, gaussianSigma, doNorm, safeNorm, hashMode, seed)
  }
}
