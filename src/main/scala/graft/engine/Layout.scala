package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout helpers: space-filling-curve keys for multi-dimensional
  * data clustering.
  *
  * Why this matters at 100 TB: parquet data-skipping prunes row groups by
  * per-column min/max, which a sort on ONE column only tightens for that
  * column. Writing the lake ordered by a Z-order (Morton) key over the two
  * query dimensions (lat/lon grid cells, time/key, …) makes BOTH columns'
  * min/max ranges tight in every file, so a bbox-style predicate (the
  * reference's clip pipelines, `engine/Joins.bboxClip`) skips all but the
  * touched tiles instead of scanning the full fact table.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bitsPerDim` bits of two
    * non-negative integer grid coordinates — x on even bits, y on odd.
    * Pure codegen'd bit arithmetic (shift/mask/or fold), no UDF; callers
    * quantize continuous dimensions to a grid first (e.g.
    * `floor(lat / cell)` — the 0.25° ERA5 grid is already integral).
    */
  def zorderKey(x: Column, y: Column, bitsPerDim: Int = 16): Column = {
    require(bitsPerDim >= 1 && bitsPerDim <= 31,
      s"bitsPerDim must be in [1,31], got $bitsPerDim")
    (0 until bitsPerDim).map { k =>
      shiftleft(shiftrightunsigned(x.cast("long"), k).bitwiseAND(lit(1L)),
        2 * k).bitwiseOR(
        shiftleft(shiftrightunsigned(y.cast("long"), k).bitwiseAND(lit(1L)),
          2 * k + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster a frame for writing: range-partition on the Z-order key of
    * (x, y) into `numFiles` output partitions, sorted within each — the
    * "OPTIMIZE ZORDER BY" shape without a table format. Each output file
    * then covers one compact curve segment, i.e. a tight (x, y) tile, so
    * min/max skipping works on both dimensions.
    */
  def layoutByZOrder(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bitsPerDim: Int = 16, keyCol: String = "__zkey"): DataFrame =
    df.withColumn(keyCol, zorderKey(x, y, bitsPerDim))
      .repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
}
