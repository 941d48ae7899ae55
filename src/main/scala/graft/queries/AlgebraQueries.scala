package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import Q._

/** Element-wise Series algebra + generic grouped aggregation +
  * sketched tier queries. */
object AlgebraQueries extends QuerySet {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // element_wise(minus): series minus its clipped self — exercises
    // the (key, ts) equi-join; residual is expressible row-wise in SQL
    "q_elementwise_minus" -> ((s, dir) => {
      val p = eventPoints(s, dir)
      ordered(SeriesAlgebra.minus(p, SeriesOps.clip(p, 5.0, 100.0))
        .select("key", "ts", "v"))
    }),
    "q_elementwise_dottimes" -> ((s, dir) => {
      val p = eventPoints(s, dir)
      ordered(SeriesAlgebra.dottimes(p, p).select("key", "ts", "v"))
    }),
    "q_aggregate_by_index" -> ((s, dir) =>
      // aggregate_by_index with label = day-of-month, fn = max
      ordered(SeriesAlgebra.aggregateByIndex(eventPoints(s, dir),
        dayofmonth(col("ts")).cast("int"), max(col("v"))))),
    // rows-only: sampling is engine-specific; sketched tiers are
    // approximate (ScalaTest asserts kll_n == cnt and quantile bounds)
    "q_sample" -> ((s, dir) =>
      ordered(SeriesAlgebra.sample(eventPoints(s, dir), 0.1, seed = 7)
        .select("key", "ts", "v"))),
    "q_tier_kll_cascade" -> ((s, dir) => {
      val m1 = SketchedRollup.rollupRaw(eventPoints(s, dir), "minute")
      val d1 = SketchedRollup.cascade(SketchedRollup.cascade(m1, "hour"), "day")
      ordered(SketchedRollup.present(d1).select(
        col("key"), col("bucket"), col("cnt"), col("kll_n"),
        round(col("p50"), 6).as("p50"), round(col("p90"), 6).as("p90")))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_elementwise_minus" ->
      s"""$ptsCte SELECT key, ts, v - greatest(least(v, 100.0), 5.0) AS v
         |FROM pts ORDER BY key, ts, v""".stripMargin,
    "q_elementwise_dottimes" ->
      s"""$ptsCte SELECT key, ts, v * v AS v
         |FROM pts ORDER BY key, ts, v""".stripMargin,
    "q_aggregate_by_index" ->
      s"""$ptsCte SELECT key, CAST(day(ts) AS INT) AS label, MAX(v) AS v
         |FROM pts GROUP BY 1, 2 ORDER BY key, label, v""".stripMargin,
  )
}
