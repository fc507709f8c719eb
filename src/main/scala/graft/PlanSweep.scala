package graft

import org.apache.spark.sql.SparkSession

/** Whole-registry physical-plan audit: builds every `SparkEntry.queries`
  * plan against an SF dir and reports, per query, the operators that are
  * red flags at scale — `CartesianProduct` (always a bug here) and
  * `BroadcastNestedLoopJoin` (legal only for the audited one-row /
  * dimension-bound broadcasts, e.g. bbox range joins and corpus-total
  * frames). Exit code 1 if any CartesianProduct appears, so the sweep can
  * gate a commit. Plans are BUILT (analyzed + physical planning), not
  * executed — the sweep costs seconds, not a verify run.
  *
  * Usage: `runMain graft.PlanSweep <sfDir>`
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    var cartesian = 0; var bnlj = 0; var failed = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val nCart = "CartesianProduct".r.findAllIn(plan).length
        val nB = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
        cartesian += nCart; bnlj += nB
        if (nCart > 0) println(s"[plansweep] CARTESIAN $name ($nCart)")
        else if (nB > 0) println(s"[plansweep] bnlj $name ($nB)")
      } catch { case e: Throwable =>
        failed += 1
        println(s"[plansweep] FAILED $name: ${e.getMessage}")
      }
    }
    println(s"[plansweep] queries=${SparkEntry.queries.size} " +
      s"cartesian=$cartesian bnlj=$bnlj failed=$failed")
    spark.stop()
    if (cartesian > 0 || failed > 0) sys.exit(1)
  }
}
