package graft

object DebugPR {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val v = Seq(("a", 34), ("b", 36), ("c", 30), ("d", 29), ("e", 32),
      ("f", 36), ("g", 60)).toDF("id", "age")
    val e = Seq(("a", "b"), ("b", "c"), ("c", "b"), ("f", "c"), ("e", "f"),
      ("e", "d"), ("d", "a"), ("a", "e")).toDF("src", "dst")
    val g = GraphFrame(v, e)
    println("=== run()")
    val outDeg = g.outDegrees
    val v2 = g.vertices.join(outDeg, Seq("id"), "left_outer")
      .na.fill(0, Seq("outDegree"))
      .withColumnRenamed("outDegree", "_pr_outdeg")
    val g2 = GraphFrame(v2, g.edges)
    import org.apache.spark.sql.functions._
    val pregel = g2.pregel
      .withVertexColumn("pagerank", lit(1.0),
        lit(0.15) + lit(0.85) * coalesce(lib.Pregel.msg, lit(0.0)))
      .sendMsgToDst(lib.Pregel.src("pagerank") / lib.Pregel.src("_pr_outdeg"))
      .aggMsgs(sum(lib.Pregel.msg))
      .setMaxIter(6)
    val raw = pregel.run()
    println("raw.storageLevel = " + raw.storageLevel)
    println("=== raw.count()")
    println(raw.count())
    val dropped = raw.drop("_pr_outdeg")
    println("dropped.storageLevel = " + dropped.storageLevel)
    println("=== dropped.count()")
    println(dropped.count())
    val res = GraphFrame(dropped, g.edges)
    println("=== vertices.count()")
    println(res.vertices.count())
    println("=== unpersist")
    res.vertices.unpersist(true)
    println("leftovers: " + spark.sparkContext.getPersistentRDDs.keySet.toSeq.sorted)
    spark.stop()
  }
}
