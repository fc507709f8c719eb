object Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    var cart = List.empty[String]
    var bnlj = List.empty[String]
    graft.SparkEntry.queries.foreach { case (n, fn) =>
      try {
        val df = fn(spark, d)
        df.write.format("noop").mode("overwrite").save()
        val p = df.queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) cart ::= n
        if (p.contains("BroadcastNestedLoopJoin")) bnlj ::= n
      } catch { case e: Throwable => println(s"SWEEPFAIL $n ${e.getMessage}") }
    }
    println("SWEEP cartesian: " + cart.sorted.mkString(","))
    println("SWEEP bnlj: " + bnlj.sorted.mkString(","))
    spark.stop()
  }
}
