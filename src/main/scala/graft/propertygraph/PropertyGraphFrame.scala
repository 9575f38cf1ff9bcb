package graft.propertygraph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/** A named, typed set of vertices: any DataFrame plus the column holding
 * the group-local id (semantics: reference
 * propertygraph/property/VertexPropertyGroup.scala). */
case class VertexPropertyGroup(name: String, df: DataFrame, idCol: String)

/** A named, typed set of edges between two vertex groups. `weightCol` must
 * be numeric when given; undirected groups are symmetrized on conversion
 * (reference propertygraph/property/EdgePropertyGroup.scala:72-113). */
case class EdgePropertyGroup(
    name: String,
    df: DataFrame,
    srcCol: String, srcGroup: String,
    dstCol: String, dstGroup: String,
    weightCol: Option[String] = None,
    directed: Boolean = true)

/**
 * Heterogeneous property graph mapped onto the single homogeneous
 * [[GraphFrame]]: group-local ids are namespaced as
 * `concat(groupName, sha2(id, 256))` so ids from different groups can
 * never collide (reference propertygraph/PropertyGraphFrame.scala:33-190).
 */
class PropertyGraphFrame(
    val vertexGroups: Seq[VertexPropertyGroup],
    val edgeGroups: Seq[EdgePropertyGroup]) {
  import GraphFrame.{ID, SRC, DST, WEIGHT}

  /** The namespaced global id for a group-local id column. */
  def globalId(group: String, id: Column): Column =
    concat(lit(group), sha2(id.cast("string"), 256))

  /** Collapse to a homogeneous GraphFrame:
   * vertices (id, vertex_group), edges (src, dst, edge_group, weight). */
  def toGraphFrame: GraphFrame = {
    val vs = vertexGroups.map { g =>
      g.df.select(globalId(g.name, col(g.idCol)).as(ID),
        lit(g.name).as("vertex_group"))
    }.reduce(_ unionByName _).distinct()
    val es = edgeGroups.map { g =>
      val base = g.df.select(
        globalId(g.srcGroup, col(g.srcCol)).as(SRC),
        globalId(g.dstGroup, col(g.dstCol)).as(DST),
        lit(g.name).as("edge_group"),
        g.weightCol.map(w => col(w).cast("double")).getOrElse(lit(1.0)).as(WEIGHT))
      if (g.directed) base
      else base.unionByName(base.select(col(DST).as(SRC), col(SRC).as(DST),
        col("edge_group"), col(WEIGHT)))
    }.reduce(_ unionByName _)
    GraphFrame(vs, es)
  }

  /** Bipartite projection of an A→B edge group onto A: connect two A-side
   * vertices whenever they share a B-side neighbor; weight = number of
   * shared neighbors (reference PropertyGraphFrame.scala:109-152).
   *
   * `maxDegree` is an OPT-IN hub cap (default: none — exact parity with
   * the reference): a B-side vertex shared by d A-vertices fans the
   * self-join out d²/2 pairs, so one hub key can dominate the whole job
   * at scale. Capped, B-vertices with degree > maxDegree are dropped
   * before the join (hash-agg degree count + anti-join — the hub's edges
   * never meet the join), making `weight` a lower bound that ignores
   * hub-mediated co-occurrence — the same trade, and the same mechanism,
   * as `Dedup.ngramJaccard.maxDocFreq`. */
  def bipartiteProjection(edgeGroup: String,
      maxDegree: Int = Int.MaxValue): DataFrame = {
    val g = edgeGroups.find(_.name == edgeGroup).getOrElse(
      throw new IllegalArgumentException(s"no edge group named '$edgeGroup'"))
    val e0 = g.df.select(col(g.srcCol).as("a"), col(g.dstCol).as("b")).distinct()
    val e = if (maxDegree == Int.MaxValue) e0 else {
      val hubs = e0.groupBy("b").agg(count(lit(1)).as("_deg"))
        .filter(col("_deg") > maxDegree)
        .select("b")
      // persisted: both self-join sides read the capped frame
      e0.join(hubs, Seq("b"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    e.as("x").join(e.as("y"),
        col("x.b") === col("y.b") && col("x.a") < col("y.a"))
      .groupBy(col("x.a").as(SRC), col("y.a").as(DST))
      .agg(count(lit(1)).as(WEIGHT))
  }
}
