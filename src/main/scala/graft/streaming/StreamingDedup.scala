package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import graft.operators.DedupIndex

/** Streaming ingestion of the incremental dedup index — the
  * composition of the two flagship shapes: documents arrive as a
  * stream, each micro-batch is signed (shingles → minhash → band
  * buckets, only the NEW docs' text is scanned) and appended to the
  * persistent band-bucket index with runId/batchId lineage, exactly
  * like the streaming rollup cascade MERGEs tiers.
  *
  * Restart semantics: a replayed micro-batch (same runId/batchId) is
  * a lineage-checked no-op in [[graft.tables.AppendIndexTable]], so a
  * stream restarted from checkpoint converges to the same index — and
  * therefore the same candidate pairs — as a one-shot batch build
  * (asserted in StreamingSpec). */
object StreamingDedup {

  /** foreachBatch writer appending each micro-batch of documents
    * (doc_id, text) to the DedupIndex at `root`. */
  def indexWriter(docs: DataFrame, root: String, runId: String,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      nBuckets: Int = 16, portable: Boolean = false): DataStreamWriter[Row] = {
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val idx = new DedupIndex(batch.sparkSession, root, k, bands,
          shingleN, portable, nBuckets)
        idx.addBatch(batch, s"$runId/$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
  }
}

/** Streaming twin of [[graft.operators.LineDedupIndex]]: each
  * micro-batch's line-frequency partials append to the persistent
  * index with runId/batchId lineage. Partials are additive over
  * doc-disjoint micro-batches, so a stream restarted from checkpoint
  * (replayed batch = lineage no-op) converges to the same cumulative
  * frequencies — and therefore the same drop set and dedup output —
  * as the one-shot batch pass. */
object StreamingLineDedup {

  /** foreachBatch writer appending each micro-batch of documents
    * (doc_id, text) to the LineDedupIndex at `root`. */
  def indexWriter(docs: DataFrame, root: String, runId: String,
      sep: String = "\n", nBuckets: Int = 16): DataStreamWriter[Row] = {
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val idx = new graft.operators.LineDedupIndex(
          batch.sparkSession, root, sep, nBuckets)
        idx.addBatch(batch, s"$runId/$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
  }
}
