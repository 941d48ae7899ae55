package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling-window rollup + retention-tier cascade.
  *
  * Semantics source: thunder's within-record aggregation family —
  * `thunder/series/series.py :: Series.downsample` (mean over
  * non-overlapping bins), `:: Series.series_stats` (count/mean/std/
  * min/max in one pass, population std ddof=0) and
  * `:: Series.stat_by_index` (grouped aggregation by index label).
  * Re-expressed Spark-first: the "index label" is the tumbling time
  * bucket `date_trunc(unit, ts)`, the per-record fold becomes a
  * `groupBy(key, bucket)` hash aggregate with map-side partial
  * aggregation (one shuffle on `(key, bucket)`).
  *
  * == Exactness & scale design ==
  * Internal stats are *mergeable and order-independent*:
  *   - `cnt` (long), `min_v`, `max_v` — trivially associative.
  *   - `sum_d  = sum(cast(v as decimal(38,6)))`   — exact decimal sum.
  *   - `sumsq_d = sum(cast(v*v as decimal(38,12)))` — v*v is one IEEE
  *     multiply (deterministic per row), then exact decimal sum.
  * Decimal sums are associative, so the result is bit-identical no
  * matter how AQE splits/coalesces partitions or in what order
  * partials merge — the property that makes `rollup1h(rollup1m(raw))
  * === rollup1h(raw)` EXACT (FIXTURES.md §B.4) and keeps a
  * 1000-executor run reproducible. Presentation stats (mean, stddev
  * ddof=0) are derived by scalar IEEE ops on the exact sums, so they
  * are deterministic too.
  *
  * At 100 TB the plan is: parquet scan (ts/key pruned) → partial agg
  * (map-side, no data explosion) → single hash-partition exchange on
  * (key, bucket) → final agg. Tier N+1 reads tier N output (orders of
  * magnitude smaller than raw), never the raw table.
  */
object Rollup {

  /** Supported retention tiers: truncation unit for `date_trunc`. */
  val tiers: Seq[String] = Seq("minute", "hour", "day")

  def bucket(ts: Column, unit: String): Column = date_trunc(unit, ts)

  /** Raw points `(key, ts, v)` → internal mergeable rollup rows
    * `(key, bucket, cnt, sum_d, sumsq_d, min_v, max_v)`. */
  def rollupRaw(points: DataFrame, unit: String): DataFrame = {
    // Quantize the signal to decimal(18,6) FIRST, then do all sums in
    // exact decimal arithmetic: d and d*d are exact, so every engine
    // (and every shuffle order) produces bit-identical sums. Casting
    // v*v (a non-decimal-representable double) directly would make the
    // last decimal digit engine-dependent.
    val vd = col("v").cast("decimal(18,6)")
    points
      .where(col("v").isNotNull)
      .groupBy(col("key"), bucket(col("ts"), unit).as("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(vd).as("sum_d"),
        sum(vd * vd).as("sumsq_d"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }

  /** Tier cascade: merge finer-tier rollup rows into a coarser bucket.
    * Exact — only associative decimal/long/min/max merges. */
  def cascade(finer: DataFrame, unit: String): DataFrame =
    finer
      .groupBy(col("key"), bucket(col("bucket"), unit).as("bucket"))
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_d")).as("sum_d"),
        sum(col("sumsq_d")).as("sumsq_d"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Derive presentation columns (mean, population stddev) from the
    * mergeable sums. All scalar IEEE ops — deterministic. sumsq_d is
    * rescaled from its accumulated scale 12 to the true scale 6 BEFORE
    * the double cast: a scale-12 unscaled value crosses 2^53 long
    * before the scale-6 sums do, and wide-decimal→double casts are not
    * correctly rounded in every engine past that point (the DuckDB
    * oracle mirrors this rescale — see RollupQueries.presentSql). */
  def present(rollup: DataFrame): DataFrame = {
    val mean = col("sum_d").cast("double") / col("cnt")
    val ex2 = col("sumsq_d").cast("decimal(38,6)").cast("double") / col("cnt")
    rollup.select(
      col("key"),
      col("bucket"),
      col("cnt"),
      col("sum_d").cast("double").as("sum_v"),
      mean.as("mean_v"),
      col("min_v"),
      col("max_v"),
      sqrt(greatest(ex2 - mean * mean, lit(0.0))).as("std_v"))
  }

  /** Convenience: full cascade raw → 1m → 1h → 1d, returned per tier
    * (each tier computed from the previous, not from raw). */
  def cascadeAll(points: DataFrame): Map[String, DataFrame] = {
    val m = rollupRaw(points, "minute")
    val h = cascade(m, "hour")
    val d = cascade(h, "day")
    Map("1m" -> m, "1h" -> h, "1d" -> d)
  }
}
