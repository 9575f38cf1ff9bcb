package graft

import org.apache.spark.sql.DataFrame

/**
 * Entry point for the CLASSIC (py4j) Python client — role of reference
 * core/src/main/scala/org/graphframes/GraphFramePythonAPI.scala:1-19,
 * which exposes a tiny JVM object the python wrapper reaches through the
 * gateway. Here the object is one method: the python side passes java
 * DataFrames plus the same (algorithm, params_json) pair the Connect
 * client ships over the wire, and the call lands on the SAME
 * [[connect.GraftConnectDispatch]] method table — one server-side
 * surface, two transports, zero drift between them.
 */
object GraftPythonAPI {

  /** Runs `algorithm` with `paramsJson` over (vertices, edges) —
   * `vertices` may be null (inferred from edges / single-table pipeline
   * ops, exactly as on the Connect path). */
  def run(vertices: DataFrame, edges: DataFrame,
      algorithm: String, paramsJson: String): DataFrame =
    connect.GraftConnectDispatch.run(Option(vertices), edges, algorithm,
      Option(paramsJson).getOrElse(""))

  /** The accepted algorithm names (for client-side error messages). */
  def algorithms(): Array[String] =
    connect.GraftConnectDispatch.algorithms.toArray
}
