package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** The streaming face of the window aggregation: same transform as the
  * batch-oracle query q47, driven through MemoryStream with a watermark.
  */
class StreamingSpec extends SparkSpec {

  test("windowedCounts over a MemoryStream emits per-hour aggregates") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = Streaming.windowedCounts(df, "ts", "1 hour", Some("2 hours"))
    val q = agg.writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 11:10:00"), "view", 4.0))
      q.processAllAvailable()
      val rows = sp.sql("SELECT * FROM wincounts ORDER BY w_start, event_type")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Timestamp]("w_start") ==
        Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(rows(0).getAs[Long]("n") == 2)
      assert(rows(0).getAs[Double]("sum_value") == 3.0)
      assert(rows(1).getAs[String]("event_type") == "view")
    } finally q.stop()
  }

  test("batch and streaming faces of the transform agree") {
    val sp = spark
    import sp.implicits._
    val batch = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val out = Streaming.windowedCounts(batch, "ts", "1 hour").collect()
    assert(out.length == 1 && out(0).getAs[Long]("n") == 2)
  }
}
