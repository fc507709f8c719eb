package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming showcase (SURVEY §2.9): the reference is strictly
  * batch, so streaming is an extension — the batch window aggregation
  * reused under `readStream`. The transform is written against a plain
  * DataFrame so the SAME function serves batch (oracle-checked) and
  * streaming (watermarked, tested via MemoryStream in the spec).
  */
object Streaming {

  /** Tumbling-window event aggregation: count + mean value per
    * (window, event_type). On a stream, `withWatermark` bounds state; on a
    * batch frame the watermark is a no-op and the result is
    * oracle-checkable SQL.
    */
  def windowedCounts(events: DataFrame, tsCol: String, windowLen: String,
      watermark: Option[String] = None): DataFrame = {
    val src = watermark match {
      case Some(w) => events.withWatermark(tsCol, w)
      case None    => events
    }
    src.groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"), col("n"),
        col("sum_value"))
  }

  /** Sliding-window variant (window + slide) — the streaming face of
    * OP-WIN-1's trailing-window semantics.
    */
  def slidingCounts(events: DataFrame, tsCol: String, windowLen: String,
      slide: String): DataFrame =
    events.groupBy(window(col(tsCol), windowLen, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
}
