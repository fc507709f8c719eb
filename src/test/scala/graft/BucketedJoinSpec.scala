package graft

import org.apache.spark.sql.functions._
import graft.engine.Sinks

/** Co-located joins on bucketed tables: the SCALE.md claim that bucketing
  * both sides on the join key removes the shuffle entirely — asserted
  * against the actual executed plan.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two same-bucketed tables runs with zero Exchange") {
    val ev = Queries.T(spark, sf001, "events")
    // saveAsTable refuses a leftover location even in overwrite mode when
    // the catalog entry is gone (fresh session) — clean both.
    Seq("b_fact", "b_dim").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Sinks.writeBucketed(ev.select(col("user_id"), col("value")),
      "b_fact", Seq("user_id"), 8)
    Sinks.writeBucketed(
      ev.groupBy(col("user_id")).agg(count(lit(1)).as("n")),
      "b_dim", Seq("user_id"), 8)
    val joined = spark.table("b_fact")
      .join(spark.table("b_dim").hint("merge"), Seq("user_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // and the result is still correct
    val got = joined.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .orderBy(col("user_id")).limit(3).collect().map(_.getLong(1)).toSeq
    val want = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .orderBy(col("user_id")).limit(3).collect().map(_.getLong(1)).toSeq
    assert(got == want)
  }
}
