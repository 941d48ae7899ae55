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

  /** LOCF: dense grid left-joined to observed buckets, nulls filled
    * with the last prior observed value; leading gap stays null
    * (FIXTURES.md §B.3). */
  def locf(points: DataFrame, unit: String, step: String): DataFrame = {
    val obs = bucketValues(points, unit)
    val g = grid(obs, step)
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.join(obs, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        last(col("v"), ignoreNulls = true).over(w).as("v_locf"))
  }

  /** Linear interpolation between bracketing observations; LOCF after
    * the last observation; null before the first. */
  def interpolate(points: DataFrame, unit: String, step: String): DataFrame = {
    val obs = bucketValues(points, unit)
    val g = grid(obs, step)
    val wPrev = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next observation" as a reverse cumulative last(): a forward
    // first(ignoreNulls) over (current → unboundedFollowing) rescans
    // the tail per row — O(n·gap); the desc running frame is O(n)
    val wNextDesc = Window.partitionBy(col("key")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = g.join(obs, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"), col("v"),
        last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
        last(when(col("v").isNotNull, col("bucket")), ignoreNulls = true)
          .over(wPrev).as("pb"),
        last(col("v"), ignoreNulls = true).over(wNextDesc).as("nv"),
        last(when(col("v").isNotNull, col("bucket")), ignoreNulls = true)
          .over(wNextDesc).as("nb"))
    val frac = (unix_micros(col("bucket").cast("timestamp")) -
      unix_micros(col("pb").cast("timestamp"))).cast("double") /
      (unix_micros(col("nb").cast("timestamp")) -
        unix_micros(col("pb").cast("timestamp"))).cast("double")
    joined.select(col("key"), col("bucket"),
      when(col("v").isNotNull, col("v"))                       // observed
        .when(col("pv").isNull, lit(null).cast("double"))      // leading gap
        .when(col("nv").isNull, col("pv"))                     // LOCF tail
        .otherwise(col("pv") + frac * (col("nv") - col("pv"))) // interp
        .as("v_fill"))
  }
}
