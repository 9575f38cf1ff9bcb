package graft

object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("g_out_degrees", "p_token_count", "g_motif_mutual", "g_filter_vertices")) {
      println(s"########## $q")
      val df = SparkEntry.queries(q)(spark, dir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s.linesIterator.filter(l =>
        l.contains("ReadSchema") || l.contains("PushedFilters") ||
        l.contains("(") && (l.contains("Scan") || l.contains("Join") ||
          l.contains("Exchange") || l.contains("WholeStageCodegen"))).mkString("\n"))
    }
    spark.stop()
  }
}
