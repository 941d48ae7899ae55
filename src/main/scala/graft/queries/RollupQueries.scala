package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Oracle
import graft.Tables
import graft.operators._
import Q._

/** Rollup/tier-cascade queries — the engine's headline operators. */
object RollupQueries extends QuerySet {

  /** DuckDB SQL computing the 1m mergeable rollup of events.
    * The sumsq multiply widens one operand to DECIMAL(19,6) so the
    * product is computed in int128 regardless of the DuckDB build's
    * int64-multiply fast path (known quirk — CLAUDE.md). */
  private val ev1mCte: String =
    """WITH r1m AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key,
      |         date_trunc('minute', ts) AS bucket,
      |         COUNT(*) AS cnt,
      |         SUM(CAST(value AS DECIMAL(18,6))) AS sum_d,
      |         SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(18,6))) AS sumsq_d,
      |         MIN(value) AS min_v, MAX(value) AS max_v
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  /** CAST(SUM(cnt) AS BIGINT): DuckDB's SUM over BIGINT returns
    * HUGEINT, which pandas renders as float64 — the driver comparator
    * then hashes `2.0` against Spark's int64 `2` and flags a mismatch
    * even though every value is identical (the r01 cascade failure).
    * Spark's sum(long) stays long, so pin the oracle to BIGINT too. */
  private def cascadeCte(name: String, from: String, unit: String): String =
    s"""$name AS (
       |  SELECT key, date_trunc('$unit', bucket) AS bucket,
       |         CAST(SUM(cnt) AS BIGINT) AS cnt, SUM(sum_d) AS sum_d, SUM(sumsq_d) AS sumsq_d,
       |         MIN(min_v) AS min_v, MAX(max_v) AS max_v
       |  FROM $from GROUP BY 1, 2
       |)""".stripMargin

  /** Presentation SQL. sumsq_d (DECIMAL(38,12)) is rescaled to its
    * true scale 6 BEFORE the DOUBLE cast: DuckDB's wide-decimal→double
    * cast is not correctly rounded once the unscaled value exceeds
    * 2^53, and a scale-12 sum of squares crosses that long before the
    * scale-6 sums do. Mirrors [[graft.operators.Rollup.present]]. */
  private def presentSql(r: String, withStd: Boolean = true): String = {
    val std =
      if (withStd)
        """,
          |       sqrt(greatest(CAST(CAST(sumsq_d AS DECIMAL(38,6)) AS DOUBLE) / cnt -
          |            (CAST(sum_d AS DOUBLE) / cnt) * (CAST(sum_d AS DOUBLE) / cnt), 0.0)) AS std_v""".stripMargin
      else ""
    s"""SELECT key, bucket, cnt,
       |       CAST(sum_d AS DOUBLE) AS sum_v,
       |       CAST(sum_d AS DOUBLE) / cnt AS mean_v,
       |       min_v, max_v$std
       |FROM $r ORDER BY key, bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup_1m" -> ((s, dir) =>
      ordered(Rollup.present(Rollup.rollupRaw(eventPoints(s, dir), "minute")))),
    "q_rollup_1h_cascade" -> ((s, dir) =>
      ordered(Rollup.present(
        Rollup.cascade(Rollup.rollupRaw(eventPoints(s, dir), "minute"), "hour")))),
    "q_rollup_1d_cascade" -> ((s, dir) =>
      ordered(Rollup.present(
        Rollup.cascade(
          Rollup.cascade(Rollup.rollupRaw(eventPoints(s, dir), "minute"), "hour"),
          "day")))),
    "q_latency_derive" -> ((s, dir) =>
      transcriptPoints(s, dir).where(col("v").isNotNull)
        .select(col("key"), col("ts"), col("v").as("latency_ms"))
        .orderBy("key", "ts", "latency_ms")),
    // std_v dropped from the cross-engine oracle: latencies reach
    // ~1e7 ms, sumsq needs >17 significant digits, and the
    // decimal→double presentation cast legitimately differs between
    // engines at the last ulp, which the cancelled sumsq/n − mean²
    // formula amplifies. Internal sums stay exact decimal; transcript
    // std is verified bit-exactly by the LocalOracle ScalaTest.
    "q_transcript_rollup_1m" -> ((s, dir) =>
      ordered(Rollup.present(Rollup.rollupRaw(transcriptPoints(s, dir), "minute"))
        .drop("std_v"))),
    "q_text_digest" -> ((s, dir) =>
      // shuffle-order-proof digest: collect (turn_idx, text) pairs,
      // sort inside the aggregate, then hash — FIXTURES.md §B.6
      // "per-turn text equality under stable (conv_id, turn_idx)
      // order".
      Tables.transcripts(s, dir)
        .groupBy(col("conv_id"))
        .agg(
          sha2(expr(
            "concat_ws('', transform(array_sort(collect_list(struct(turn_idx, text))), s -> s.text))"),
            256).as("digest"),
          count(lit(1)).as("n_turns"))
        .orderBy("conv_id")),
  )

  val oracles: Map[String, String] = Map(
    "q_rollup_1m" -> s"$ev1mCte ${presentSql("r1m")}",
    "q_rollup_1h_cascade" ->
      s"""$ev1mCte, ${cascadeCte("r1h", "r1m", "hour")} ${presentSql("r1h")}""",
    "q_rollup_1d_cascade" ->
      s"""$ev1mCte, ${cascadeCte("r1h", "r1m", "hour")}, ${cascadeCte("r1d", "r1h", "day")} ${presentSql("r1d")}""",
    "q_latency_derive" ->
      s"""${Oracle.transcriptsCte}
         |SELECT conv_id AS key, ts,
         |       (epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx))) / 1000.0 AS latency_ms
         |FROM transcripts QUALIFY latency_ms IS NOT NULL
         |ORDER BY key, ts, latency_ms""".stripMargin,
    "q_transcript_rollup_1m" ->
      s"""${Oracle.transcriptsCte}, tpts AS (
         |  SELECT conv_id AS key, ts,
         |         (epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx))) / 1000.0 AS v
         |  FROM transcripts
         |), r1m AS (
         |  SELECT key, date_trunc('minute', ts) AS bucket,
         |         COUNT(*) AS cnt,
         |         SUM(CAST(v AS DECIMAL(18,6))) AS sum_d,
         |         SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(18,6))) AS sumsq_d,
         |         MIN(v) AS min_v, MAX(v) AS max_v
         |  FROM tpts WHERE v IS NOT NULL GROUP BY 1, 2
         |) ${presentSql("r1m", withStd = false)}""".stripMargin,
    "q_text_digest" ->
      s"""${Oracle.transcriptsCte}
         |SELECT conv_id,
         |       sha256(string_agg(text, '' ORDER BY turn_idx)) AS digest,
         |       COUNT(*) AS n_turns
         |FROM transcripts GROUP BY conv_id ORDER BY conv_id""".stripMargin,
  )
}
