package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.AppendIndexTable

/** Incrementally-maintained IVF embedding index (the embedding-side
  * twin of [[DedupIndex]]): the (vec_id, cent_id) assignment rows —
  * the part of the IVF build that scans every embedding — are
  * persisted per batch in an [[AppendIndexTable]] against a centroid
  * set FROZEN at index construction, so ANN over a growing corpus is
  * an incremental pipeline like the rollup cascade, not a full
  * re-assignment:
  *
  *   - `addBatch` assigns ONLY the new vectors (one scan-local
  *     [[graft.functions.VecExpressions.CentTopK]] kernel pass over
  *     the batch — no join, no window) and appends the compact
  *     (vec_id, cent_id) rows atomically with runId lineage; a crash
  *     + re-run of a batch is a lineage-checked no-op, and an empty
  *     batch commits a zero-row marker so resume polling terminates;
  *   - the frozen centroids are collected ONCE (driver-side flat
  *     arrays, the same √n-bounded set a broadcast would ship) at
  *     construction — assignment is a pure per-vector function of
  *     (embedding, frozen centroids), so the accumulated rows equal a
  *     one-shot assignment of the union of all batches by
  *     construction;
  *   - `topK` probes through [[Similarity.ivfProbe]] with the rank
  *     cap applied AT QUERY TIME over the cumulative inverted lists
  *     (never frozen at whatever a batch saw — the
  *     [[DedupIndex.candidatePairs]] discipline), so answers are
  *     identical to a one-shot [[Similarity.ivfTopK]] with the same
  *     centroid set.
  *
  * At 100 TB: per-batch cost is one kernel scan of the new
  * embeddings; the index rows are ~16 bytes/vector hash-distributed
  * by cent_id (co-locating the probe join); old embeddings are never
  * re-read for maintenance. Re-clustering (new centroids) is an
  * explicit rebuild — the standard IVF contract. */
class AnnIndex(spark: SparkSession, root: String, centroids: DataFrame,
    nBuckets: Int = 16) {

  val table = new AppendIndexTable(spark, root, nBuckets)

  /** The frozen quantizer: collected once, never re-read. */
  private val arrays = Similarity.collectCents(centroids)

  /** Assign + append one embedding batch ((vec_id, embedding) rows);
    * false = runId already committed (resume no-op). */
  def addBatch(vecs: DataFrame, runId: String): Boolean =
    table.append(
      Similarity.nearestCentsArrays(
        vecs.select(col("vec_id"), col("embedding").as("emb")),
        arrays, "vec_id", "emb", keep = 1),
      runId, hashCol = "cent_id")

  /** The accumulated (vec_id, cent_id) assignment rows. */
  def assignments: DataFrame =
    table.read().select("vec_id", "cent_id")

  /** ANN top-k over everything indexed so far — identical to one-shot
    * [[Similarity.ivfTopK]] with this index's frozen centroids over
    * the union of the batches. `corpus` supplies the embeddings for
    * the exact re-rank (the index stores only ids). */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int = 4, maxList: Int = 100000): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding").as("emb"),
      Similarity.l2norm(col("embedding")).as("nrm"))
    Similarity.ivfProbe(c, queries, k, arrays, nProbe, maxList, assignments)
  }
}
