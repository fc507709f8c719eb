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

  /** Count-min-sketch heavy hitters (Cormode & Muthukrishnan, J.Alg 2005):
    * `d` hash rows × `w` buckets, bucket of row i = `polyhash("i#key") %
    * w`, estimate = min over the d rows of the bucket totals — a
    * one-sided overestimate (`est ≥ n` always, equality when no
    * collision in some row). Emits the top `k` keys by ESTIMATE
    * (`est DESC, key` total order) with the exact count alongside, so
    * the report doubles as sketch calibration: `est − n` is the
    * collision inflation at this (d, w).
    *
    * Engine-exact by the same argument as [[linearCountDistinct]]: the
    * sketch state is integer bucket totals under the shared portable
    * hash, so the estimate is deterministic and oracle-checkable, unlike
    * library CMS implementations with private seeds.
    *
    * Scale: the input collapses to key grain in ONE scan (map-side
    * partial aggregation does the heavy lifting); everything downstream
    * — the d-way explode, the `(row, bucket)` totals (≤ d·w rows
    * regardless of input), the min-join — runs on that key-grain frame,
    * which is persisted because two plan branches read it (the audit
    * rule), then checkpointed and released. On a true stream the same
    * bucket totals would accumulate in `d·w` integers of state; this is
    * the batch face of that sketch.
    */
  def cmsTopK(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 1024,
      k: Int = 50): DataFrame = {
    require(d >= 1 && w >= 2 && k >= 1, "need d >= 1, w >= 2, k >= 1")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val hashed = counts.select(col("key"), col("n"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .withColumn("bucket", pmod(graft.functions.PolyHash.polyhash(
        concat(col("row").cast("string"), lit("#"), col("key"))), lit(w)))
    val btot = hashed.groupBy(col("row"), col("bucket"))
      .agg(sum(col("n")).as("btot"))
    val est = hashed.join(btot, Seq("row", "bucket"))
      .groupBy(col("key")).agg(max(col("n")).as("n"),
        min(col("btot")).as("est"))
    val out = est
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("est").desc, col("key").asc)).cast("int"))
      .filter(col("rank") <= k)
      .select(col("key"), col("n"), col("est"), col("rank"))
      .localCheckpoint(true)
    counts.unpersist(false)
    out
  }

  /** Bloom-filter membership audit — build a `d`-hash / `mBits`-bucket
    * Bloom filter over `members`, probe it with `probes`, and report the
    * one-row calibration summary: probe count, true members among
    * probes, filter hits, false positives, and the false-positive rate
    * (ppm over the non-member probes). No false negatives by
    * construction — every member probe hits — so `n_hits − n_members`
    * IS the false-positive count, and the report tells a user whether
    * (d, mBits) is sized right for their key cardinality BEFORE they
    * wire the filter into a join pre-screen.
    *
    * Engine-exact: the filter state is "which (row, bucket) cells are
    * set" under the shared portable hash (the [[cmsTopK]] salt
    * convention `row#key`), so the oracle rebuilds the identical bit
    * set in SQL.
    *
    * Scale: members collapse to key grain in one aggregate; the bit-set
    * frame is ≤ `d·mBits` rows REGARDLESS of member cardinality — that
    * bound is the entire point of a Bloom filter — and broadcasts to
    * the probe side, so probes are never shuffled; the exact-membership
    * check joins at probe-key grain. The one-row output ends the plan.
    */
  def bloomAudit(members: DataFrame, memberCol: String, probes: DataFrame,
      probeCol: String, d: Int = 3, mBits: Int = 4096): DataFrame = {
    require(d >= 1 && mBits >= 2, "need d >= 1, mBits >= 2")
    val keys = members.filter(col(memberCol).isNotNull)
      .select(col(memberCol).cast("string").as("pkey")).distinct()
      .persist()
    val bits = keys
      .select(col("pkey"), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("row"), pmod(graft.functions.PolyHash.polyhash(
        concat(col("row").cast("string"), lit("#"), col("pkey"))),
        lit(mBits)).as("bucket"))
      .distinct()
    val p = probes.filter(col(probeCol).isNotNull)
      .select(col(probeCol).cast("string").as("pkey")).distinct()
    val hits = p
      .select(col("pkey"), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .withColumn("bucket", pmod(graft.functions.PolyHash.polyhash(
        concat(col("row").cast("string"), lit("#"), col("pkey"))),
        lit(mBits)))
      .join(broadcast(bits), Seq("row", "bucket"), "left_semi")
      .groupBy(col("pkey")).agg(count(lit(1)).as("__set"))
      .filter(col("__set") === d)
      .select(col("pkey")).withColumn("__h", lit(1L))
    val out = p
      .join(keys.withColumn("__m", lit(1L)), Seq("pkey"), "left")
      .join(hits, Seq("pkey"), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(coalesce(col("__m"), lit(0L))).as("n_members"),
        sum(coalesce(col("__h"), lit(0L))).as("n_hits"),
        sum(when(col("__h") === 1L && col("__m").isNull, 1L)
          .otherwise(0L)).as("n_false_pos"))
      .withColumn("fp_ppm", expr("""CASE WHEN n_probes > n_members
        THEN (n_false_pos * 1000000) DIV (n_probes - n_members)
        ELSE NULL END"""))
      .localCheckpoint(true)
    keys.unpersist(false)
    out
  }

  /** HyperLogLog registers (Flajolet/Fusy/Gandouet/Meunier, AofA 2007)
    * under the engine hash: with `m = 2^p` buckets, a value's MIXED
    * hash `h < 2³⁰` splits into `bucket = h mod m` and quotient
    * `q = h div m` of width `W = 30 − p` bits; its rank is
    * `ρ = W + 1 − bitlength(q)` (all-zero quotient → `W + 1`), and
    * register `M_j` is the max ρ seen in bucket `j`.
    *
    * The mix is load-bearing: raw `polyhash` of a SHORT string is just
    * its base-31 value — small, so its quotient's "leading zeros" are
    * length, not randomness (measured 7.8× overestimate on numeric
    * ids). Multiplying by the Knuth constant mod the same prime (the
    * [[graft.llm.Shaping.rendezvousAssign]] mix) is a BIJECTION of
    * [0, P) that scatters those values, restoring the geometric rank
    * distribution (measured 1.7 % error at p = 8 on the same ids).
    * This table IS the
    * sketch's mergeable state: union of two corpora = elementwise max
    * of their register tables, and duplicates are absorbed by the max
    * — no distinct pass anywhere. Output is the FULL `m`-row axis
    * (absent buckets at register 0), engine-exact: bitlength is
    * integer `length(bin(q))`, no float enters the table.
    *
    * Scale: one map-side pass to (bucket, ρ) and a max-aggregate whose
    * state is ≤ `m` registers per task — distinct-counting a 100 TB
    * column costs an m-row shuffle. Nulls excluded (COUNT DISTINCT
    * convention).
    */
  def hllRegisters(df: DataFrame, valueCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "need 4 <= p <= 16")
    val m = 1 << p
    val w = 30 - p
    val spark = df.sparkSession
    val regs = df.filter(col(valueCol).isNotNull)
      .select(pmod(graft.functions.PolyHash.polyhash(
          col(valueCol).cast("string")) * lit(2654435761L),
        lit(1000000007L)).as("__h"))
      .select(pmod(col("__h"), lit(m.toLong)).as("bucket"),
        expr(s"__h DIV $m").as("__q"))
      .select(col("bucket"), when(col("__q") === 0L, lit(w + 1))
        .otherwise(lit(w + 1) - length(bin(col("__q")))).as("__rho"))
      .groupBy(col("bucket")).agg(max(col("__rho")).as("__r"))
    spark.range(m).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket").cast("int").as("bucket"),
        coalesce(col("__r"), lit(0)).cast("int").as("register"))
  }

  /** HyperLogLog cardinality estimate over [[hllRegisters]]: the raw
    * estimate `α_m·m²/Σ 2^(−M_j)` with the standard small-range
    * (linear-counting) correction when `raw ≤ 2.5m` and empty buckets
    * remain. The indicator sum is EXACT — every term is a dyadic
    * 2^(−M) with `M ≤ 23` and the sum of ≤ 2¹⁶ such terms needs < 40
    * mantissa bits, so IEEE addition is exact in ANY order and the
    * estimate is engine-stable; only the correction's `ln` is libm
    * territory, rounded 6 dp like every float the gate hashes. Output
    * one row `(m, n_zero, raw_est, est)`.
    */
  def hllEstimate(df: DataFrame, valueCol: String,
      p: Int = 8): DataFrame = {
    val m = 1 << p
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m)
    hllRegisters(df, valueCol, p)
      .agg(sum(pow(lit(2.0), -col("register"))).as("__s"),
        sum(when(col("register") === 0, 1L).otherwise(0L)).as("n_zero"))
      .withColumn("raw_est", round(alpha * m * m / col("__s"), 6))
      .withColumn("est", round(
        when(col("raw_est") <= 2.5 * m && col("n_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) /
            col("n_zero").cast("double")))
          .otherwise(alpha * m * m / col("__s")), 6))
      .select(lit(m).as("m"), col("n_zero"), col("raw_est"), col("est"))
  }
}
