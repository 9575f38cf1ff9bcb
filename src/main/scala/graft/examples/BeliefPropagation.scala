package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Sum-product belief propagation for pairwise Ising models with
 * color-scheduled (checkerboard) message updates (role of reference
 * examples/BeliefPropagation.scala:136-262, which schedules by graph
 * coloring; its update rule is the mean-field one — this implementation
 * does the full sum-product message passing, so marginals are EXACT on
 * trees, which is what the unit test pins).
 *
 * Model: P(X) ∝ exp[Σ_i a_i·x_i + Σ_ij b_ij·x_i·x_j], x_i ∈ {-1,+1}.
 *
 * Messages are kept in log-odds form λ_{i→j} = ½·log m_{i→j}(+1)/m_{i→j}(-1),
 * which for binary states collapses the sum-product update to the closed
 * form
 * {{{ λ_{i→j} ← atanh( tanh(b_ij) · tanh( a_i + Σ_{k∈N(i)\ j} λ_{k→i} ) ) }}}
 * and the belief to P(x_i = +1) = σ(2·(a_i + Σ_k λ_{k→i})).
 *
 * Scale shape: the state is ONE DataFrame of directed messages
 * (i, j, b, λ) — two rows per undirected edge. Each color step is a
 * per-vertex sum aggregation plus equi-joins on edge keys (no collect, no
 * cross join); lineage is truncated per step like every other iterative
 * operator here. A sweep updates each color class once, so messages into
 * a vertex always read the OTHER classes' latest values — Gauss–Seidel
 * by color, the reference's scheduling.
 */
object BeliefPropagation {

  private def atanh(x: Column): Column =
    lit(0.5) * log((lit(1.0) + x) / (lit(1.0) - x))

  /**
   * Run sum-product BP. `g.vertices` must carry `a` (vertex field) and
   * `color` (scheduling class — neighboring vertices must differ);
   * `g.edges` carries `b` (coupling), one row per undirected edge.
   * Returns the vertices augmented with `belief` = P(x_i = +1).
   */
  def sumProduct(g: GraphFrame, sweeps: Int = 5): DataFrame = {
    import GraphFrame.{ID, SRC, DST}
    val v = g.vertices
    val colors = v.select("color").distinct().orderBy("color")
      .collect().map(_.get(0)).toSeq
    val e = g.edges.select(col(SRC).as("i"), col(DST).as("j"), col("b"))
    // per-round state goes through the IterationManager: lineage cut every
    // 2 color-rounds, superseded rounds freed once a newer one is
    // materialized (a bare per-round localCheckpoint leaked sweeps×colors
    // edge-sized frames until session GC), result handed out
    // self-contained via finish()
    val mgr = new graft.lib.IterationManager(2)
    var msgs = mgr.cycle(e.unionByName(
        e.select(col("j").as("i"), col("i").as("j"), col("b")))
      .withColumn("lam", lit(0.0)), 0)
    var round = 1

    val vi = v.select(col(ID).as("i"), col("a"))
    val vj = v.select(col(ID).as("j"), col("color").as("_colorJ"))
    // Deterministic float summation (r15): a plain sum("lam") adds the
    // incoming messages in whatever order the partials arrive, so two
    // runs of the same model could differ in the last ULP (the flaky
    // exact-equality determinism assertion in RefSuitePortSpec — the
    // r14 driver's red test gate). Fold the per-vertex inbox in sender-id
    // order instead: same O(degree) work, bit-identical on every run.
    def inboxSum(df: DataFrame, recvAs: String): DataFrame =
      df.groupBy(col("j").as(recvAs))
        .agg(aggregate(
          sort_array(collect_list(struct(col("i"), col("lam")))),
          lit(0.0), (acc, x) => acc + x("lam")).as("_inbox"))
    for (_ <- 1 to sweeps; c <- colors) {
      // Σ of current messages INTO each vertex (as sender i of the update)
      val s = inboxSum(msgs, "i").withColumnRenamed("_inbox", "_si")
      // the reverse message λ_{j→i}, excluded from sender i's product
      val rev = msgs.select(col("j").as("i"), col("i").as("j"),
        col("lam").as("_lamRev"))
      msgs = msgs
        .join(rev, Seq("i", "j"))
        .join(s, Seq("i"), "left_outer")
        .join(vi, Seq("i"))
        .join(vj, Seq("j"))
        .withColumn("lam", when(col("_colorJ") === lit(c),
            atanh(tanh(col("b")) *
              tanh(col("a") + coalesce(col("_si"), lit(0.0)) - col("_lamRev"))))
          .otherwise(col("lam")))
        .select(col("i"), col("j"), col("b"), col("lam"))
      msgs = mgr.cycle(msgs, round)
      round += 1
    }
    val sFinal = inboxSum(msgs, ID).withColumnRenamed("_inbox", "_s")
    mgr.finish(v.join(sFinal, Seq(ID), "left_outer")
      .withColumn("belief", lit(1.0) /
        (lit(1.0) + exp(lit(-2.0) * (col("a") + coalesce(col("_s"), lit(0.0))))))
      .drop("_s"))
  }
}
