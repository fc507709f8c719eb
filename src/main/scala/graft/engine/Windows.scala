package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OP-WIN-1 sliding feature windows and OP-AGG-3 spatial coarsening. */
object Windows {

  /** OP-WIN-1 — trailing `n`-step sliding window per spatial key
    * (`inference/carboninference/core.py:73-117`): for every row with ≥ n−1
    * predecessors in its partition, the ordered trailing slice of each
    * feature column as an array. Partitioning by the spatial key keeps the
    * shuffle to exactly one exchange; the window itself is a single sort
    * within partitions — at 100 TB the partition count follows the spatial
    * key cardinality (~1M ERA5 cells), far above executor count.
    */
  def slidingFeatures(df: DataFrame, partCols: Seq[String], timeCol: String,
      featureCols: Seq[String], n: Int = 32): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(-(n - 1), 0)
    val withArrays = featureCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_win", collect_list(col(c)).over(w))
    }
    withArrays.filter(size(col(s"${featureCols.head}_win")) === n)
  }

  /** OP-AGG-3 — block-mean spatial downsample (`dataset.py:160-161`): mean
    * over `block`×`block` index blocks with `boundary="trim"` semantics
    * (partial edge blocks dropped via exact-count filter). Pure hash
    * aggregate — map-side partial aggregation makes this shuffle only one
    * row per block.
    */
  def coarsen(df: DataFrame, xIdx: String, yIdx: String,
      valueCols: Seq[String], block: Int, trim: Boolean = true): DataFrame = {
    val g = df.groupBy(floor(col(xIdx) / block).cast("long").as("block_x"),
        floor(col(yIdx) / block).cast("long").as("block_y"))
      .agg(count(lit(1)).as("n_cells"),
        valueCols.map(c => avg(col(c)).as(s"${c}_mean")): _*)
    if (trim) g.filter(col("n_cells") === (block.toLong * block)) else g
  }
}
