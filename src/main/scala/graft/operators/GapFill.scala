package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-fill over dense per-key time grids (north_rule: "gap-filled via
  * last-observation-carried-forward and linear interpolation
  * expressions"). Not present in thunder (its Series assumes a dense
  * regular index — SURVEY.md §2.4); this operator CREATES that dense
  * index from irregular event times, which is what makes the rest of
  * the thunder-style positional algebra (downsample, mean_by_panel, …)
  * well-defined on sparse data.
  *
  * Expression-only: grid generation is `explode(sequence(min,max,step))`
  * (a codegen'd Generator, no UDF), fills are `last(_, ignoreNulls)`
  * window functions. At scale the grid explode multiplies rows by the
  * bucket density but stays partition-local (no shuffle); the window
  * fills need one exchange on `key` which is shared by both fill
  * columns (single sort, Catalyst collapses the two windows).
  */
object GapFill {

  /** Per-key dense bucket grid from each key's min to max bucket.
    * `step` e.g. "interval 1 minute". */
  def grid(buckets: DataFrame, step: String): DataFrame =
    buckets
      .groupBy(col("key"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("key"),
        explode(expr(s"sequence(b0, b1, $step)")).as("bucket"))

  /** points → per-bucket mean value (the continuous-aggregate value
    * used as the fill source), exact decimal mean. */
  def bucketValues(points: DataFrame, unit: String): DataFrame =
    Rollup.present(Rollup.rollupRaw(points, unit))
      .select(col("key"), col("bucket"), col("mean_v").as("v"))

  /** Per-observation gap expansion: each observed bucket generates
    * itself plus every grid bucket strictly before the NEXT observed
    * bucket (lead over the same (key, bucket) sort). Equivalent to
    * grid ⟕ obs — the dense per-key grid spans exactly [min, max] of
    * the observed buckets, and every grid row falls in exactly one
    * such half-open span — but with ONE pass over obs, no second
    * per-key aggregate for the grid and no grid⟕obs join (the old
    * shape aggregated `obs` twice and paid a join before the fill
    * window; measured 2× on the catalog rows, same output
    * byte-for-byte). Emits (key, bucket, v, nb, nv) where v is the
    * span's observation and (nb, nv) the next one (null on the last
    * span). */
  private def spans(points: DataFrame, unit: String, step: String): DataFrame = {
    val obs = bucketValues(points, unit)
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
    obs
      .withColumn("nb", lead(col("bucket"), 1).over(w))
      .withColumn("nv", lead(col("v"), 1).over(w))
      .select(col("key"), col("v"), col("nb"), col("nv"), col("bucket").as("ob"),
        explode(expr(s"sequence(bucket, coalesce(nb - $step, bucket), $step)"))
          .as("bucket"))
  }

  /** LOCF: dense grid filled with the last prior observed value. The
    * span shape makes the fill local — every generated bucket carries
    * its span's observation, which IS the last observation at or
    * before it. (The grid starts at each key's first observed bucket,
    * so the "leading gap stays null" branch of the join shape is
    * vacuous — pinned in GapFillSpec.) */
  def locf(points: DataFrame, unit: String, step: String): DataFrame =
    spans(points, unit, step)
      .select(col("key"), col("bucket"), col("v").as("v_locf"))

  /** Linear interpolation between bracketing observations; LOCF after
    * the last observation; null before the first. Span shape: within
    * a span the bracketing observations are the span's own (ob, v) and
    * (nb, nv); the observed bucket itself (bucket = ob) returns v
    * exactly, and the max grid bucket is the last observation (so the
    * tail-LOCF and leading-gap branches of the join shape are
    * vacuous). frac arithmetic is IDENTICAL to the join shape — same
    * unix_micros endpoints, same IEEE sequence. */
  def interpolate(points: DataFrame, unit: String, step: String): DataFrame = {
    val frac = (unix_micros(col("bucket").cast("timestamp")) -
      unix_micros(col("ob").cast("timestamp"))).cast("double") /
      (unix_micros(col("nb").cast("timestamp")) -
        unix_micros(col("ob").cast("timestamp"))).cast("double")
    spans(points, unit, step)
      .select(col("key"), col("bucket"),
        when(col("bucket") === col("ob"), col("v"))             // observed
          .otherwise(col("v") + frac * (col("nv") - col("v")))  // interp
          .as("v_fill"))
  }
}
