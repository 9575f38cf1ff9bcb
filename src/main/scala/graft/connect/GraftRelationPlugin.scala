package graft.connect

import java.util.Optional

import org.apache.spark.connect.proto.Relation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connect.planner.SparkConnectPlanner
import org.apache.spark.sql.connect.plugin.RelationPlugin
import org.apache.spark.sql.graftshim.GraftShims
import org.sparkproject.connect.protobuf.{Any => ProtoAny}

/**
 * Spark Connect server plugin: lets any Connect client (Python, Go, JVM)
 * run graft algorithms by sending a `graft.GraftRelation` extension
 * relation — the same server-plugin surface the reference exposes
 * (reference connect/.../GraphFramesConnect.scala implements
 * `RelationPlugin` over its GraphFramesAPI proto,
 * graphframes.proto:13-44).
 *
 * Enable on the Connect server with
 * {{{
 *   spark.connect.extensions.relation.classes=graft.connect.GraftRelationPlugin
 * }}}
 *
 * The client embeds two serialized `spark.connect.Relation` payloads
 * (vertices, edges) plus an algorithm name and a JSON parameter object in
 * the message ([[GraftRelation]] documents the .proto); this plugin turns
 * the payload relations back into DataFrames with the server's own
 * planner, dispatches through [[GraftConnectDispatch]] (the exact Scala
 * API), and hands the result's logical plan back to Connect. Messages
 * with a foreign `type_url` return empty so other registered plugins get
 * their turn.
 */
class GraftRelationPlugin extends RelationPlugin {

  override def transform(raw: Array[Byte],
      planner: SparkConnectPlanner): Optional[LogicalPlan] = {
    val any = ProtoAny.parseFrom(raw)
    if (!any.getTypeUrl.endsWith("/" + GraftRelationPlugin.TypeName) &&
        any.getTypeUrl != GraftRelationPlugin.TypeName) {
      Optional.empty()
    } else {
      val msg = WireFormat.decode(any.getValue.toByteArray)
      val session = planner.session
      def toDf(bytes: Array[Byte]) =
        GraftShims.ofRows(session, planner.transformRelation(Relation.parseFrom(bytes)))
      val edges = msg.edges.map(toDf).getOrElse(
        throw new IllegalArgumentException("GraftRelation.edges is required"))
      val out = GraftConnectDispatch.run(msg.vertices.map(toDf), edges,
        msg.algorithm, msg.paramsJson)
      Optional.of(GraftShims.logicalPlan(out))
    }
  }
}

object GraftRelationPlugin {
  /** Fully-qualified proto message name clients pack into `Any.type_url`
   * (with or without the conventional `type.googleapis.com/` prefix). */
  val TypeName = "graft.GraftRelation"
}
