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

/** Streaming twin of [[graft.operators.SubstringDedupIndex]]: each
  * micro-batch is winnowed (only the NEW docs' text is scanned) and
  * its (doc_id, fp) fingerprint rows append with runId/batchId
  * lineage. Candidates are a pure function of the cumulative
  * fingerprint ROW SET (occupancy cap at query time), so a stream
  * restarted from checkpoint (replayed batch = lineage no-op)
  * converges to the same candidates — and therefore the same verified
  * substring dups — as one-shot [[graft.operators.Dedup.substringDups]]. */
object StreamingSubstringDedup {

  /** foreachBatch writer appending each micro-batch of documents
    * (doc_id, text) to the SubstringDedupIndex at `root`. */
  def indexWriter(docs: DataFrame, root: String, runId: String,
      k: Int = 4, window: Int = 4, nBuckets: Int = 16): DataStreamWriter[Row] = {
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val idx = new graft.operators.SubstringDedupIndex(
          batch.sparkSession, root, k, window, nBuckets)
        idx.addBatch(batch, s"$runId/$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
  }
}

/** Streaming twin of [[graft.operators.AnnIndex]] — the embedding
  * side of the same discipline. The index (and with it the quantizer
  * freeze: centroids collected ONCE at construction, never per batch)
  * is built by the caller and passed in; each micro-batch of
  * (vec_id, embedding) rows runs one scan-local cent_topk assignment
  * pass and appends with runId/batchId lineage. Assignments are
  * per-vector over doc-disjoint batches and the rank cap is applied
  * at probe time over cumulative lists, so a restarted stream
  * (replayed batch = lineage no-op) converges to the same index —
  * and therefore the same probe results — as one-shot
  * [[graft.operators.Similarity.ivfTopK]]. */
object StreamingAnn {

  /** foreachBatch writer appending each micro-batch of embeddings to
    * the caller-constructed AnnIndex (foreachBatch runs driver-side,
    * so the frozen centroid arrays never serialize). */
  def indexWriter(vecs: DataFrame, idx: graft.operators.AnnIndex,
      runId: String): DataStreamWriter[Row] = {
    vecs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idx.addBatch(batch, s"$runId/$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
  }
}
