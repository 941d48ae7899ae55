package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adapters from source tables to the engine's canonical tall form
  * `(key, ts, v)` — the Spark analogue of thunder's Series
  * construction (thunder/series/readers.py), where the "record key"
  * becomes a key column and the shared index becomes the `ts` column.
  */
object Signals {

  /** events(event_id, ts, user_id, event_type, value, props) →
    * points keyed by user. */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").as("key"),
      col("ts"),
      col("value").as("v"))

  /** transcripts(conv_id, turn_idx, role, text, tool, ts) → per-turn
    * latency points (BASELINE north_star: "per-turn latency derived
    * from ts deltas"). `latency_ms` is null for turn_idx = 0 and is
    * excluded from rollups by [[Rollup.rollupRaw]]'s null filter.
    *
    * One window shuffle on conv_id; at scale the ingest layout is
    * already range-partitioned by (bucket(conv_id), ts) with rows
    * sorted by (conv_id, turn_idx) inside partitions (Ingest.scala),
    * so this lag() runs without an extra exchange when the input
    * reports that ordering.
    */
  def latencyPoints(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    transcripts
      .select(
        col("conv_id").as("key"),
        col("ts"),
        // parquet event times are TIMESTAMP_NTZ; session TZ is pinned
        // UTC so the cast to TIMESTAMP is the identity on wall time.
        ((unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))) / 1000.0)
          .as("v"))
  }

  /** Role-transition stream — the agent-transcript analytics core:
    * one row per consecutive turn pair within a conversation, carrying
    * (from_role → to_role) and the inter-turn latency. The single most
    * asked question of an agent log — "how fast does the assistant
    * answer a user?" — is `where(from_role = 'user' AND to_role =
    * 'assistant')`; tool-call overhead is user→tool / tool→assistant;
    * the full transition matrix is one groupBy away. First turns have
    * no predecessor and emit nothing.
    *
    * Same µs-precision latency derivation and single conv_id window
    * as [[latencyPoints]] — over the bucketed ingest layout the lag
    * runs with zero exchange and no sort (the reported per-bucket
    * (conv_id, turn_idx) ordering serves the window directly), so at
    * 10^12 turns this is a scan-speed pass. */
  def roleTransitions(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    transcripts
      .select(col("conv_id"), col("turn_idx"), col("role"), col("ts"))
      .withColumn("from_role", lag(col("role"), 1).over(w))
      .withColumn("latency_ms",
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))) / 1000.0)
      .where(col("from_role").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("from_role"),
        col("role").as("to_role"), col("latency_ms"))
  }
}
