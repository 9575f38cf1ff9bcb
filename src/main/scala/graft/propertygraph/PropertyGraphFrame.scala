package graft.propertygraph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}
import graft.GraphFrame

/** A property group's data failed structural validation (missing column,
 * non-numeric weight) — reference InvalidPropertyGroupException. */
class InvalidPropertyGroupException(msg: String) extends IllegalArgumentException(msg)

/** A named, typed set of vertices: any DataFrame plus the column holding
 * the group-local primary key (API parity: reference
 * propertygraph/property/VertexPropertyGroup.scala). `applyMaskOnId=false`
 * keeps raw ids (cast to string) instead of the collision-proof
 * `concat(name, sha2(id, 256))` mask — for graphs where one group's ids
 * are already globally unique and human-readable output matters. */
case class VertexPropertyGroup(
    name: String,
    data: DataFrame,
    primaryKeyColumn: String,
    applyMaskOnId: Boolean = true) {

  private[propertygraph] def validate(): this.type = {
    if (!data.columns.contains(primaryKeyColumn))
      throw new InvalidPropertyGroupException(
        s"source column $primaryKeyColumn does not exist, existed columns " +
          s"[${data.columns.mkString(", ")}]")
    this
  }

  private def maskedId: Column =
    if (applyMaskOnId)
      concat(lit(name), sha2(col(primaryKeyColumn).cast(StringType), 256))
    else col(primaryKeyColumn).cast(StringType)

  /** (external_id, id): the group-local key next to its global id — the
   * reverse-lookup table [[PropertyGraphFrame.joinVertices]] uses to map
   * algorithm output back to user ids. */
  private[propertygraph] def internalIdMapping: DataFrame = data
    .select(col(primaryKeyColumn).as(PropertyGraphFrame.EXTERNAL_ID))
    .withColumn(GraphFrame.ID,
      concat(lit(name), sha2(col(PropertyGraphFrame.EXTERNAL_ID).cast(StringType), 256)))

  private[propertygraph] def getData(filter: Column = lit(true)): DataFrame =
    data.filter(filter)
      .select(maskedId.as(GraphFrame.ID),
        lit(name).as(PropertyGraphFrame.PROPERTY_GROUP_COL_NAME))
}

object VertexPropertyGroup {
  def apply(name: String, data: DataFrame, primaryKeyColumn: String): VertexPropertyGroup =
    new VertexPropertyGroup(name, data, primaryKeyColumn).validate()

  def apply(name: String, data: DataFrame): VertexPropertyGroup =
    new VertexPropertyGroup(name, data, GraphFrame.ID).validate()
}

/** A named, typed set of edges between two vertex groups (API parity:
 * reference propertygraph/property/EdgePropertyGroup.scala). The weight
 * column must exist and be numeric; undirected groups are symmetrized on
 * conversion. Endpoint masking follows each endpoint GROUP's own
 * `applyMaskOnId`. */
case class EdgePropertyGroup(
    name: String,
    data: DataFrame,
    srcPropertyGroup: VertexPropertyGroup,
    dstPropertyGroup: VertexPropertyGroup,
    isDirected: Boolean,
    srcColumnName: String,
    dstColumnName: String,
    weightColumnName: String) {

  private[propertygraph] def validate(): this.type = {
    for ((c, what) <- Seq(srcColumnName -> "source", dstColumnName -> "dest",
        weightColumnName -> "weight"))
      if (!data.columns.contains(c))
        throw new InvalidPropertyGroupException(
          s"$what column $c does not exist, existed columns [${data.columns.mkString(", ")}]")
    val wt = data.schema(weightColumnName).dataType
    if (!wt.isInstanceOf[NumericType])
      throw new InvalidPropertyGroupException(
        s"weight column $weightColumnName must be numeric type, but was $wt")
    this
  }

  private def mask(group: VertexPropertyGroup, c: String): Column =
    if (group.applyMaskOnId) concat(lit(group.name), sha2(col(c).cast(StringType), 256))
    else col(c).cast(StringType)

  private[propertygraph] def getData(filter: Column = lit(true)): DataFrame = {
    val base = data.filter(filter).select(
      mask(srcPropertyGroup, srcColumnName).as(GraphFrame.SRC),
      mask(dstPropertyGroup, dstColumnName).as(GraphFrame.DST),
      col(weightColumnName).cast("double").as(GraphFrame.WEIGHT))
    if (isDirected) base
    else base.union(base.select(
      col(GraphFrame.DST).as(GraphFrame.SRC),
      col(GraphFrame.SRC).as(GraphFrame.DST),
      col(GraphFrame.WEIGHT)))
  }
}

object EdgePropertyGroup {
  def apply(name: String, data: DataFrame,
      srcPropertyGroup: VertexPropertyGroup, dstPropertyGroup: VertexPropertyGroup,
      isDirected: Boolean, srcColumnName: String, dstColumnName: String,
      weightColumnName: String): EdgePropertyGroup =
    new EdgePropertyGroup(name, data, srcPropertyGroup, dstPropertyGroup,
      isDirected, srcColumnName, dstColumnName, weightColumnName).validate()

  /** Column-valued weight: materialized as the standard weight column
   * first (reference EdgePropertyGroup object overload). */
  def apply(name: String, data: DataFrame,
      srcPropertyGroup: VertexPropertyGroup, dstPropertyGroup: VertexPropertyGroup,
      isDirected: Boolean, srcColumnName: String, dstColumnName: String,
      weightColumn: Column): EdgePropertyGroup =
    apply(name, data.withColumn(GraphFrame.WEIGHT, weightColumn),
      srcPropertyGroup, dstPropertyGroup, isDirected,
      srcColumnName, dstColumnName, GraphFrame.WEIGHT)
}

/**
 * Heterogeneous property graph mapped onto the single homogeneous
 * [[GraphFrame]] (API parity: reference
 * propertygraph/PropertyGraphFrame.scala:33-190): group-local ids are
 * namespaced as `concat(groupName, sha2(id, 256))` so ids from different
 * groups can never collide; `toGraphFrame` selects and filters group
 * subsets, `projectionBy` collapses a bipartite edge group, and
 * `joinVertices` maps algorithm output back to the original ids.
 */
case class PropertyGraphFrame(
    vertexPropertyGroups: Seq[VertexPropertyGroup],
    edgesPropertyGroups: Seq[EdgePropertyGroup]) {
  import GraphFrame.{SRC, DST, WEIGHT}
  import PropertyGraphFrame._

  private lazy val vertexGroups: Map[String, VertexPropertyGroup] =
    vertexPropertyGroups.map(g => g.name -> g).toMap
  private lazy val edgeGroups: Map[String, EdgePropertyGroup] =
    edgesPropertyGroups.map(g => g.name -> g).toMap

  /** Collapse the selected, filtered groups to a homogeneous GraphFrame:
   * vertices (id, property_group), edges (src, dst, weight) with
   * undirected groups symmetrized. Missing filter-map entries default to
   * keep-all (divergence note: the reference requires an entry per listed
   * group and fails on absence). */
  def toGraphFrame(
      vertexPropertyGroups: Seq[String],
      edgePropertyGroups: Seq[String],
      edgeGroupFilters: Map[String, Column],
      vertexGroupFilters: Map[String, Column]): GraphFrame = {
    vertexPropertyGroups.foreach(n => require(vertexGroups.contains(n),
      s"Vertex property group $n does not exist"))
    edgePropertyGroups.foreach(n => require(edgeGroups.contains(n),
      s"Edge property group $n does not exist"))
    val vs = vertexPropertyGroups
      .map(n => vertexGroups(n).getData(vertexGroupFilters.getOrElse(n, lit(true))))
      .reduce(_ union _)
    val es = edgePropertyGroups
      .map(n => edgeGroups(n).getData(edgeGroupFilters.getOrElse(n, lit(true))))
      .reduce(_ union _)
    GraphFrame(vs, es)
  }

  /** All groups, no filters. */
  def toGraphFrame: GraphFrame =
    toGraphFrame(vertexPropertyGroups.map(_.name), edgesPropertyGroups.map(_.name),
      Map.empty, Map.empty)

  /** Bipartite projection as a NEW property graph (reference semantics:
   * PropertyGraphFrame.scala:109-152): the through-group and its edge
   * group are dropped, and a `projected_<edgeGroup>` undirected edge group
   * connects left-side vertices once per SHARED NEIGHBOR (no aggregation —
   * two vertices sharing three neighbors get three parallel edges), with
   * weight 1.0 or `newEdgeWeight(leftW, rightW)` per shared neighbor.
   * For an aggregated count-weight projection with a hub cap, see
   * [[bipartiteProjection]]. */
  def projectionBy(
      leftBiGraphPart: String,
      rightBiGraphPart: String,
      edgeGroup: String,
      newEdgeWeight: Option[(Column, Column) => Column] = None): PropertyGraphFrame = {
    val old = edgeGroups.getOrElse(edgeGroup,
      throw new IllegalArgumentException(s"no edge group named '$edgeGroup'"))
    require(old.srcPropertyGroup.name == leftBiGraphPart,
      s"Edge Property Group should have $leftBiGraphPart source group but has " +
        old.srcPropertyGroup.name)
    require(old.dstPropertyGroup.name == rightBiGraphPart,
      s"Edge Property Group should have $rightBiGraphPart destination group but has " +
        old.dstPropertyGroup.name)
    val keptV = vertexPropertyGroups.filterNot(_.name == rightBiGraphPart)
    val keptE = edgesPropertyGroups.filterNot(_.name == edgeGroup)
    val d = old.data
    val projected = d.as("e1")
      .join(d.as("e2"), col(s"e1.${old.dstColumnName}") === col(s"e2.${old.dstColumnName}"))
      .where(col(s"e1.${old.srcColumnName}") < col(s"e2.${old.srcColumnName}"))
      .select(
        col(s"e1.${old.srcColumnName}").as(SRC),
        col(s"e2.${old.srcColumnName}").as(DST),
        newEdgeWeight match {
          case Some(f) => f(col(s"e1.${old.weightColumnName}"),
            col(s"e2.${old.weightColumnName}")).as(WEIGHT)
          case None => lit(1.0).as(WEIGHT)
        })
    PropertyGraphFrame(keptV, keptE :+ EdgePropertyGroup(
      name = s"projected_$edgeGroup",
      data = projected,
      srcPropertyGroup = vertexGroups(leftBiGraphPart),
      dstPropertyGroup = vertexGroups(leftBiGraphPart),
      isDirected = false,
      srcColumnName = SRC, dstColumnName = DST, weightColumnName = WEIGHT))
  }

  /** Map per-vertex algorithm output (from a graph built by
   * [[toGraphFrame]]) back to each group's ORIGINAL ids: one row per
   * group-member, `external_id` carrying the group-local key (reference
   * PropertyGraphFrame.scala:169-190). */
  def joinVertices(verticesData: DataFrame, vertexGroups: Seq[String]): DataFrame = {
    require(vertexGroups.forall(this.vertexGroups.contains),
      s"unknown vertex group among: ${vertexGroups.mkString(", ")}")
    vertexGroups.map { vg =>
      val group = this.vertexGroups(vg)
      val forGroup = verticesData.filter(col(PROPERTY_GROUP_COL_NAME) === lit(vg))
      if (group.applyMaskOnId)
        group.internalIdMapping
          .join(forGroup, Seq(GraphFrame.ID), "left")
          .drop(GraphFrame.ID)
      else
        group.getData()
          .join(forGroup, GraphFrame.ID)
          .withColumnRenamed(GraphFrame.ID, EXTERNAL_ID)
    }.reduce(_ union _)
  }

  /** AGGREGATED bipartite projection onto the edge group's source side —
   * this engine's scale-shaped extension (no reference counterpart):
   * connect two source vertices once per pair, weight = NUMBER of shared
   * neighbors, with an OPT-IN hub cap.
   *
   * `maxDegree` (default: none — parity with [[projectionBy]]'s uncapped
   * join): a through-vertex shared by d sources fans the self-join out
   * d²/2 pairs, so one hub key can dominate the whole job at scale.
   * Capped, through-vertices with degree > maxDegree are dropped before
   * the join (hash-agg degree count + anti-join — the hub's edges never
   * meet the join), making `weight` a lower bound that ignores
   * hub-mediated co-occurrence — the same trade, and the same mechanism,
   * as `Dedup.ngramJaccard.maxDocFreq`. */
  def bipartiteProjection(edgeGroup: String,
      maxDegree: Int = Int.MaxValue): DataFrame = {
    val g = edgeGroups.getOrElse(edgeGroup,
      throw new IllegalArgumentException(s"no edge group named '$edgeGroup'"))
    val e0 = g.data.select(col(g.srcColumnName).as("a"), col(g.dstColumnName).as("b"))
      .distinct()
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

object PropertyGraphFrame {
  /** Vertex-group tag column in [[PropertyGraphFrame.toGraphFrame]] output. */
  val PROPERTY_GROUP_COL_NAME = "property_group"

  /** Original group-local id column in [[PropertyGraphFrame.joinVertices]]
   * output. */
  val EXTERNAL_ID = "external_id"
}
