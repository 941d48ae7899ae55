package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Source layer: driver-provided parquet tables plus the deterministic
  * `transcripts` view derived from `events`.
  *
  * The reference's readers (thunder/series/readers.py :: frombinary,
  * fromtext, …) map here to plain columnar parquet scans — Catalyst
  * pushes filters and prunes columns into the scan, which a hand-rolled
  * binary reader never gets for free.
  *
  * `transcripts` is a *pure function of events.parquet* so the DuckDB
  * oracle can reconstruct the identical table with ANSI SQL (see
  * [[Oracle.transcriptsCte]]): conv/turn ordering, per-turn text, role
  * and tool assignment all derive deterministically from
  * (event_id, user_id, ts) with engine-portable functions (md5,
  * row_number). This realizes the BASELINE input_hint shape
  * (conv_id, turn_idx, role, text, tool, ts) on driver data.
  */
object Tables {

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def events(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "events")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "embeddings")

  /** Deterministic transcripts view over `events`:
    * one conversation per user, turns ordered by (ts, event_id).
    * Columns match BASELINE.json input_hint exactly.
    */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    ev.select(
        concat(lit("c"), col("user_id").cast("string")).as("conv_id"),
        (row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))) - 1)
          .cast("int").as("turn_idx"),
        when(col("event_type") === "click", "user")
          .when(col("event_type") === "view", "assistant")
          .when(col("event_type") === "error", "tool")
          .otherwise("system").as("role"),
        col("event_type"),
        col("user_id"),
        col("ts"))
      .withColumn("text",
        md5(concat(col("conv_id"), lit(":"), col("turn_idx").cast("string"))))
      .withColumn("tool",
        when(col("role") === "tool", lit("search")).otherwise(lit(null).cast("string")))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }
}

/** DuckDB-side SQL fragments matching [[Tables]] exactly. The driver
  * runs each oracle statement standalone over the same parquet files,
  * so every transcript-based oracle embeds this CTE. */
object Oracle {
  /** `WITH transcripts AS (…)` reproducing [[Tables.transcripts]]. */
  val transcriptsCte: String =
    """WITH transcripts AS (
      |  SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
      |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |         CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
      |              WHEN 'error' THEN 'tool' ELSE 'system' END AS role,
      |         md5('c' || CAST(user_id AS VARCHAR) || ':' ||
      |             CAST(CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS VARCHAR)) AS text,
      |         CASE WHEN event_type = 'error' THEN 'search' ELSE NULL END AS tool,
      |         ts
      |  FROM events
      |)""".stripMargin
}
