package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-memory cardinality sketches. Everything here is ENGINE-EXACT by
  * construction: the sketch state (which of `m` hash buckets are occupied)
  * is a deterministic function of the value set under the engine's shared
  * polynomial hash, so two engines that mirror the formula produce
  * bit-identical estimates — unlike library HLLs, whose register layouts
  * and hash seeds are implementation details no oracle can follow.
  */
object Sketches {

  /** Linear-counting distinct estimate per group (Whang et al.,
    * "A Linear-Time Probabilistic Counting Algorithm", TODS 1990):
    * hash each value into one of `m` buckets, count occupied buckets per
    * group, and estimate `n̂ = m · ln(m / empty)`. Output
    * `(groupCols…, occupied, est_distinct)`; a saturated sketch
    * (`empty = 0`, meaning `m` was sized below the true cardinality)
    * yields a null estimate rather than a fabricated number.
    *
    * Scale: the only wide op is one `(group, bucket)` DISTINCT — partial
    * (map-side) aggregation caps per-task state at `m` buckets per group,
    * and the post-distinct rowcount is ≤ `m · |groups|` regardless of
    * input size. That is the whole point: distinct-counting a 100 TB
    * column costs a bounded-size shuffle instead of a value-grain one.
    * Nulls are excluded (SQL COUNT DISTINCT convention). Estimate error
    * is the standard-error of linear counting (≈ √m·(e^t−t−1)/n for load
    * t = n/m); size `m` comfortably above the expected cardinality.
    */
  def linearCountDistinct(df: DataFrame, groupCols: Seq[String],
      valueCol: String, m: Int = 4096): DataFrame = {
    require(m >= 2, "need at least two buckets")
    val bucket: Column = pmod(
      graft.functions.PolyHash.polyhash(col(valueCol).cast("string")), lit(m))
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ bucket.as("__b"): _*)
      .distinct()
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("occupied"))
      .withColumn("est_distinct", when(col("occupied") < m,
        round(lit(m.toDouble) * log(lit(m.toDouble) /
          (lit(m.toLong) - col("occupied")).cast("double"))).cast("bigint")))
  }
}
