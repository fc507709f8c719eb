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

  /** Hilbert-curve index of non-negative grid coordinates — the
    * stronger locality twin of [[zorderKey]] (Z-order's bit interleave
    * has long diagonal jumps between quadrant boundaries; the Hilbert
    * walk is Manhattan-adjacent at EVERY step, so range scans over the
    * key touch tighter (x, y) tiles — the Hilbert-vs-Z tradeoff every
    * table-layout paper measures). Standard Wikipedia xy→d algorithm
    * (per-level quadrant code `(3·rx) XOR ry`, flip+swap rotation),
    * unrolled `order` levels as a chain of per-level projections —
    * column-name chaining, not one nested Column, because each level
    * reads the previous level's x twice and y twice (a single
    * expression tree would grow 4^order nodes; named columns keep it
    * linear until codegen, which shares subexpressions). Pure integer
    * bit arithmetic — engine-exact.
    *
    * Inputs must lie on `[0, 2^order)`; callers quantize/mod upstream
    * (the zorderKey contract). Key range `[0, 4^order)`.
    */
  def withHilbertKey(df: DataFrame, xCol: String, yCol: String,
      order: Int, outCol: String): DataFrame = {
    require(order >= 1 && order <= 31,
      s"order must be in [1,31], got $order")
    var cur = df.withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn(outCol, lit(0L))
    var s = 1L << (order - 1)
    while (s > 0) {
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L))
            .otherwise(lit(0L)))
        .withColumn(outCol, col(outCol) + lit(s) * lit(s) *
          (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hy"))
            .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__hy", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hx"))
            .otherwise(col("__hx"))).otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
      s >>= 1
    }
    cur.drop("__hx", "__hy", "__rx", "__ry", "__nx")
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
