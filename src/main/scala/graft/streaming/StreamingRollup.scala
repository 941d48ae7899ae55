package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import graft.operators.Rollup
import graft.tables.TierTable

/** Streaming ingestion of the rollup cascade (SURVEY.md §2.4: thunder
  * 1.x is batch-only; our Spark-first engine adds the Structured
  * Streaming path as the natural continuous form of the same
  * continuous aggregate).
  *
  * Two shapes:
  *  - `windowedCounts`: classic watermark + tumbling `window()` agg —
  *    append-mode output of finalized 1m rollup rows once the
  *    watermark passes (late data within the watermark merges
  *    exactly, because the stats are the same mergeable set).
  *  - `foreachBatchCascade`: micro-batch MERGE into the TierTables —
  *    the streaming twin of RollupJob: each micro-batch computes 1m
  *    partials of its new rows and MERGEs them into 1m/1h/1d. Exactly
  *    the engine's batch semantics (mergeable stats), so a stream
  *    arriving in any chunking converges to the same tier contents as
  *    one batch run — the property the test asserts.
  */
object StreamingRollup {

  /** Watermarked tumbling-window rollup over a streaming points
    * source `(key, ts, v)`; emits finalized windows (append mode). */
  def windowedRollup(points: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val vd = col("v").cast("decimal(18,6)")
    points
      .withWatermark("ts", watermark)
      .groupBy(col("key"), window(col("ts"), "1 minute"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(vd).as("sum_d"),
        sum(vd * vd).as("sumsq_d"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .select(col("key"), col("window.start").as("bucket"),
        col("cnt"), col("sum_d"), col("sumsq_d"), col("min_v"), col("max_v"))
  }

  /** foreachBatch writer MERGEing each micro-batch into the tier
    * tables rooted at `root`. Lineage = runId/batchId → restartable
    * streams don't double-merge a replayed batch. */
  def cascadeWriter(points: DataFrame, root: String, runId: String,
      nBuckets: Int = 8): DataStreamWriter[org.apache.spark.sql.Row] = {
    points.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val t1m = new TierTable(spark, s"$root/tier_1m", nBuckets)
        val t1h = new TierTable(spark, s"$root/tier_1h", nBuckets)
        val t1d = new TierTable(spark, s"$root/tier_1d", nBuckets)
        val lineage = s"$runId/$batchId"
        // persist the partials so each micro-batch is read once, not
        // re-executed per tier (same fix as RollupJob.run)
        val m1 = Rollup.rollupRaw(batch, "minute")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          t1m.merge(m1, lineage)
          val h1 = Rollup.cascade(m1, "hour")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            t1h.merge(h1, lineage)
            t1d.merge(Rollup.cascade(h1, "day"), lineage)
          } finally h1.unpersist(false)
        } finally m1.unpersist(false)
        ()
      }
      .trigger(Trigger.AvailableNow())
  }
}
