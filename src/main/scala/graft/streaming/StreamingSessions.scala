package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization over a points stream `(key, ts, v)` using
  * Spark's native `session_window` state machinery (SURVEY.md §2.4:
  * thunder is batch-only; sessions are the canonical stateful
  * streaming aggregate, so the engine exposes the Structured
  * Streaming form of [[graft.operators.SeriesOps.sessions]]).
  *
  * Convention alignment: `session_window(ts, g)` closes a session
  * when the next event lands AT OR AFTER last + g (window intervals
  * are half-open), while the batch operator splits only on a gap
  * STRICTLY greater than the threshold. Timestamps are µs-granular,
  * so `gap + 1 µs` makes the two rules identical — `delta > gap` ⇔
  * `delta ≥ gap + 1 µs` — and the streamed sessions equal the batch
  * ones bit-for-bit (spec-pinned, including a gap exactly at the
  * threshold).
  *
  * At scale: per-key session state is O(open sessions), merged by the
  * streaming aggregation's session-merge path — events of one session
  * may arrive across any micro-batch chunking, in any order, and
  * converge to the same finalized session set (the certification
  * property q_streaming_sessions asserts against the BATCH oracle).
  */
object StreamingSessions {

  /** Session aggregate shared by the batch and streaming plans: one
    * row per (key, session) with count, bounds and exact-decimal sum.
    * On a streaming frame, run in Complete mode (bounded replay) or
    * add a watermark upstream for Append. */
  def sessionAgg(points: DataFrame, gapSeconds: Long): DataFrame =
    points
      .groupBy(col("key"),
        session_window(col("ts"), s"$gapSeconds seconds 1 microseconds"))
      .agg(count(lit(1)).as("n_points"),
        min(col("ts")).as("t_start"), max(col("ts")).as("t_end"),
        sum(col("v").cast("decimal(18,6)")).cast("double").as("sum_v"))
      .select("key", "n_points", "t_start", "t_end", "sum_v")

  /** Presentation twin of [[graft.operators.SeriesOps.sessions]]:
    * attach the 0-based per-key session ordinal to a finalized
    * session set (a bounded post-processing window — sessions per key
    * are disjoint in time, so ordering by t_start is total). */
  def withSessionSeq(sessions: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("t_start"))
    sessions.withColumn("session_seq", (row_number().over(w) - 1).cast("long"))
      .select("key", "session_seq", "n_points", "t_start", "t_end", "sum_v")
  }
}
