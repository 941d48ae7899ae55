package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import Q._

/** Gap-fill queries: LOCF and linear interpolation over a dense
  * per-key hourly grid (north_rule). */
object GapFillQueries extends QuerySet {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gapfill_locf" -> ((s, dir) =>
      ordered(GapFill.locf(eventPoints(s, dir), "hour", "interval 1 hour"))),
    "q_gapfill_interp" -> ((s, dir) =>
      ordered(GapFill.interpolate(eventPoints(s, dir), "hour", "interval 1 hour"))),
  )

  /** hourly exact-decimal bucket means + per-key dense hourly grid. */
  private val gridCte: String =
    """WITH obs AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key,
      |         date_trunc('hour', ts) AS bucket,
      |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
      |  FROM events GROUP BY 1, 2
      |), grid AS (
      |  SELECT key, unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
      |  FROM obs GROUP BY key
      |), j AS (
      |  SELECT g.key, g.bucket, o.v FROM grid g LEFT JOIN obs o USING (key, bucket)
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_gapfill_locf" ->
      s"""$gridCte
         |SELECT key, bucket,
         |       last_value(v IGNORE NULLS) OVER
         |         (PARTITION BY key ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
         |FROM j ORDER BY key, bucket, v_locf""".stripMargin,
    "q_gapfill_interp" ->
      s"""$gridCte, f AS (
         |  SELECT key, bucket, v,
         |    last_value(v IGNORE NULLS) OVER wp AS pv,
         |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS pb,
         |    first_value(v IGNORE NULLS) OVER wn AS nv,
         |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wn AS nb
         |  FROM j
         |  WINDOW wp AS (PARTITION BY key ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wn AS (PARTITION BY key ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT key, bucket,
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN pv IS NULL THEN NULL
         |       WHEN nv IS NULL THEN pv
         |       ELSE pv + (CAST(epoch_us(bucket) - epoch_us(pb) AS DOUBLE) /
         |                  CAST(epoch_us(nb) - epoch_us(pb) AS DOUBLE)) * (nv - pv)
         |  END AS v_fill
         |FROM f ORDER BY key, bucket, v_fill""".stripMargin,
  )
}
