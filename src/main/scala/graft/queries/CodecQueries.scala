package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.KllAgg
import Q._

/** Codec + sketch queries. q_segment_roundtrip proves the Gorilla/DoD
  * encode→decode path is the identity through a full Spark plan by
  * rolling up DECODED segments and comparing against the DuckDB
  * rollup of the RAW table. KLL queries have no exact SQL oracle
  * (sketches are approximate) → rows-only driver check + ScalaTest
  * accuracy bounds. */
object CodecQueries extends QuerySet {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_segment_roundtrip" -> ((s, dir) => {
      val decoded = Segments.fromSegments(Segments.toSegments(eventPoints(s, dir), "day"))
        .select(col("key"), col("ts").cast("timestamp_ntz").as("ts"), col("v"))
      ordered(Rollup.present(Rollup.rollupRaw(decoded, "hour")))
    }),
    "q_segment_stats" -> ((s, dir) =>
      // segment-metadata-only answer (no decode): per-day count/sum/min/max
      ordered(Segments.toSegments(eventPoints(s, dir), "day")
        .select(col("key"), col("bucket"), col("n").cast("long").as("cnt"),
          col("sum_d").cast("double").as("sum_v"), col("min_v"), col("max_v")))),
    "q_kll_quantiles" -> ((s, dir) =>
      eventPoints(s, dir)
        .groupBy(col("key"))
        .agg(KllAgg.kll_sketch(col("v")).as("sk"))
        .select(col("key"),
          KllAgg.kll_n(col("sk")).as("n"),
          KllAgg.kll_quantile(col("sk"), 0.5).as("p50"),
          KllAgg.kll_quantile(col("sk"), 0.9).as("p90"),
          KllAgg.kll_quantile(col("sk"), 0.99).as("p99"))
        .orderBy("key")),
    "q_kll_cascade" -> ((s, dir) =>
      // sketch per (key, day), merged up to key — the tier path
      eventPoints(s, dir)
        .groupBy(col("key"), date_trunc("day", col("ts")).as("bucket"))
        .agg(KllAgg.kll_sketch(col("v")).as("sk"))
        .groupBy(col("key"))
        .agg(KllAgg.kll_merge(col("sk")).as("sk"))
        .select(col("key"), KllAgg.kll_n(col("sk")).as("n"),
          KllAgg.kll_quantile(col("sk"), 0.5).as("p50"))
        .orderBy("key")),
  )

  private val hourlyRollupSql: String =
    """WITH r1h AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key,
      |         date_trunc('hour', ts) AS bucket,
      |         COUNT(*) AS cnt,
      |         SUM(CAST(value AS DECIMAL(18,6))) AS sum_d,
      |         SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(18,6))) AS sumsq_d,
      |         MIN(value) AS min_v, MAX(value) AS max_v
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT key, bucket, cnt,
      |       CAST(sum_d AS DOUBLE) AS sum_v,
      |       CAST(sum_d AS DOUBLE) / cnt AS mean_v,
      |       min_v, max_v,
      |       sqrt(greatest(CAST(CAST(sumsq_d AS DECIMAL(38,6)) AS DOUBLE) / cnt -
      |            (CAST(sum_d AS DOUBLE) / cnt) * (CAST(sum_d AS DOUBLE) / cnt), 0.0)) AS std_v
      |FROM r1h ORDER BY key, bucket""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_segment_roundtrip" -> hourlyRollupSql,
    "q_segment_stats" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
        |       date_trunc('day', ts) AS bucket,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
        |       MIN(value) AS min_v, MAX(value) AS max_v
        |FROM events GROUP BY 1, 2
        |ORDER BY key, bucket, cnt, sum_v, min_v, max_v""".stripMargin,
    // KLL sketches retain every item while n per group ≤ k = 200 (no
    // compaction — true for the sf0.01 gate corpus: ~67 events/key),
    // and datasketches' INCLUSIVE getQuantile(q) is then exactly the
    // order statistic at 1-based rank ceil(q·n). These oracles certify
    // the sketch build AND the merge cascade end-to-end in the exact
    // regime; approximate-regime error bounds stay in SeriesAlgebraSpec.
    "q_kll_quantiles" ->
      s"""${Q.ptsCte}, o AS (
         |  SELECT key, v,
         |         row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
         |         COUNT(*) OVER (PARTITION BY key) AS nn
         |  FROM pts)
         |SELECT key, MAX(nn) AS n,
         |       MAX(CASE WHEN rn = CAST(ceil(0.5 * nn) AS BIGINT) THEN v END) AS p50,
         |       MAX(CASE WHEN rn = CAST(ceil(0.9 * nn) AS BIGINT) THEN v END) AS p90,
         |       MAX(CASE WHEN rn = CAST(ceil(0.99 * nn) AS BIGINT) THEN v END) AS p99
         |FROM o GROUP BY key ORDER BY key""".stripMargin,
    // the day→key merge sees the same per-key item multiset, so the
    // merged sketch is the same exact order statistic
    "q_kll_cascade" ->
      s"""${Q.ptsCte}, o AS (
         |  SELECT key, v,
         |         row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
         |         COUNT(*) OVER (PARTITION BY key) AS nn
         |  FROM pts)
         |SELECT key, MAX(nn) AS n,
         |       MAX(CASE WHEN rn = CAST(ceil(0.5 * nn) AS BIGINT) THEN v END) AS p50
         |FROM o GROUP BY key ORDER BY key""".stripMargin,
  )
}
