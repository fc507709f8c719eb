package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    // Warm the session once (codegen compiler, parquet footers, FS cache)
    // so the first measured query doesn't absorb JVM/session startup.
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach {
      t =>
        try Queries.T(spark, sfDir, t).write.format("noop")
          .mode("overwrite").save()
        catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop write materializes EVERY column (count() would let Spark prune
      // value columns and flatter column-heavy queries); a crashed query
      // records the -1 sentinel so failures can't masquerade as fast runs
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The summary must be parseable by the driver: stop Spark FIRST so no
    // shutdown logging can land after (or interleave with) the JSON, print
    // it as the process's final stdout line, and also persist it to a file
    // as a log-truncation-proof channel (r02's tail was truncated and
    // BENCH_r02.json recorded parsed:null).
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}")
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "bench_result.json")), line + "\n")
    catch { case _: Throwable => () }
    println(line)
  }
}
