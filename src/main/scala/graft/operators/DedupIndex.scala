package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.AppendIndexTable

/** Incrementally-maintained MinHash-LSH dedup index (r3 verdict
  * next-#5): the band-bucket signature rows — the expensive, text-
  * scanning part of the near-dup pipeline — are persisted per batch
  * in an [[AppendIndexTable]], so dedup over a growing corpus is an
  * incremental pipeline like the rollup cascade, not a full
  * recompute:
  *
  *   - `addBatch` shingles + signs ONLY the new documents (one pure
  *     projection over the new batch's text) and appends the
  *     (doc_id, band, bucket) rows atomically with runId lineage —
  *     crash + re-run of a batch is a lineage-checked no-op;
  *   - `candidatePairs` is [[Dedup.candidatesFromBanded]] over the
  *     accumulated index — a pure function of the index ROW SET, so
  *     it equals the one-shot [[Dedup.minhashLsh]] over the union of
  *     all batches by construction (including the occupancy cap,
  *     which is applied at query time over cumulative occupancy —
  *     never frozen at whatever a batch saw);
  *   - `newCandidates` answers the streaming-ingest question "which
  *     incoming docs duplicate anything seen so far" by joining the
  *     new batch's bands against the index — O(new × collisions),
  *     never re-pairing the old corpus with itself.
  *
  * At 100 TB: per-batch cost is one scan of the new documents plus a
  * join on compact (band, bucket) rows hash-distributed by bucket;
  * the raw text of old batches is never re-read.
  */
class DedupIndex(spark: SparkSession, root: String, k: Int = 32,
    bands: Int = 8, shingleN: Int = 3, portable: Boolean = false,
    nBuckets: Int = 16) {

  val table = new AppendIndexTable(spark, root, nBuckets)

  /** Sign + append one document batch; false = runId already
    * committed (resume no-op). */
  def addBatch(docs: DataFrame, runId: String): Boolean =
    table.append(
      Dedup.bandedSignatures(docs, k, bands, shingleN, portable),
      runId, hashCol = "bucket")

  /** The accumulated (doc_id, band, bucket) index rows. */
  def banded: DataFrame =
    table.read().select("doc_id", "band", "bucket")

  /** All candidate pairs over every batch indexed so far — identical
    * to one-shot minhashLsh over the union of the batches. */
  def candidatePairs(maxBucket: Int = 1000): DataFrame =
    Dedup.candidatesFromBanded(banded, maxBucket)

  /** Candidates between an incoming (not-yet-appended) batch and the
    * indexed corpus ∪ the batch itself, capped on the combined
    * occupancy. Returns (doc_a, doc_b, n_shared_bands) where at least
    * one side is a new doc. */
  def newCandidates(docs: DataFrame, maxBucket: Int = 1000): DataFrame = {
    val fresh = Dedup.bandedSignatures(docs, k, bands, shingleN, portable)
    val freshIds = fresh.select(col("doc_id")).distinct()
    val pairs = Dedup.candidatesFromBanded(banded.unionByName(fresh), maxBucket)
    pairs.join(freshIds.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .unionByName(
        pairs.join(freshIds.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi"))
      .distinct()
  }
}

/** Incrementally-maintained line-frequency index for C4-style
  * cross-document line dedup ([[Dedup.lineDedup]]) — the same
  * append-only discipline as [[DedupIndex]] (MinHash) and the IVF
  * [[AnnIndex]], applied to the boilerplate-frequency aggregate:
  *
  *   - `addBatch` explodes + hashes ONLY the new batch's lines and
  *     appends compact (lh, doc_freq) partials with runId lineage —
  *     batches carry disjoint doc_id sets (appends), so per-batch
  *     `countDistinct(doc_id)` partials SUM to the corpus-wide
  *     document frequency exactly;
  *   - `dropSet` aggregates the cumulative partials at query time
  *     (the threshold is never frozen at what a batch saw — same
  *     query-time-cap discipline as DedupIndex/AnnIndex);
  *   - `dedup(docs)` equals one-shot `lineDedup` over the union of
  *     the appended batches BY CONSTRUCTION, because the drop set is
  *     a pure function of the summed frequencies.
  *
  * At 100 TB: a day's ingest scans only its own text; the index
  * carries one compact row per distinct line hash per batch, and the
  * anti-join side stays the small boilerplate set. */
class LineDedupIndex(spark: org.apache.spark.sql.SparkSession, root: String,
    sep: String = "\n", nBuckets: Int = 16) {

  val table = new AppendIndexTable(spark, root, nBuckets)

  /** Hash + count one document batch; false = runId already committed
    * (resume no-op). Batches must not share doc_ids (append-only
    * corpus growth — re-submitting a batch is what runIds are for). */
  def addBatch(docs: DataFrame, runId: String): Boolean =
    table.append(Dedup.lineFreqs(docs, sep), runId, hashCol = "lh")

  /** Line hashes whose CUMULATIVE document frequency exceeds
    * `maxDocFreq` — the boilerplate set over everything indexed. */
  def dropSet(maxDocFreq: Int = 2): DataFrame =
    table.read().groupBy(col("lh"))
      .agg(sum(col("doc_freq")).as("doc_freq"))
      .where(col("doc_freq") > maxDocFreq)
      .select(col("lh"))

  /** Dedup `docs` against the cumulative index. When `docs` is the
    * union of every appended batch this is bit-identical to one-shot
    * [[Dedup.lineDedup]]; it also answers the incremental question
    * "clean TODAY's batch against everything seen so far" without
    * re-reading old text. */
  def dedup(docs: DataFrame, maxDocFreq: Int = 2,
      joinSep: String = "\n"): DataFrame =
    Dedup.lineDedupAgainst(docs, dropSet(maxDocFreq), sep, joinSep)
}

/** Incrementally-maintained winnowing-fingerprint index for
  * substring-level dedup ([[Dedup.substringDups]]) — the last dedup
  * family to get the append-only treatment:
  *
  *   - `addBatch` winnows ONLY the new batch's text (the expensive
  *     scan) and appends compact (doc_id, fp) rows with runId
  *     lineage;
  *   - `candidatePairs` is [[Dedup.substringCandidates]] over the
  *     cumulative rows — occupancy cap applied at query time, so it
  *     equals one-shot winnowing over the union by construction;
  *   - `dups(docs)` runs the exact-LCS verification against the
  *     supplied text — verification touches CANDIDATE docs only, so
  *     the old corpus's text is re-read only where a new collision
  *     demands it, never wholesale.
  *
  * With MinHash bands (DedupIndex), line frequencies (LineDedupIndex)
  * and IVF assignments (AnnIndex), every candidate-generating
  * structure in the engine is now append-only-maintainable with
  * certified one-shot equivalence. */
class SubstringDedupIndex(spark: SparkSession, root: String,
    k: Int = 4, window: Int = 4, nBuckets: Int = 16) {

  val table = new AppendIndexTable(spark, root, nBuckets)

  /** Winnow + append one document batch; false = runId already
    * committed (resume no-op). */
  def addBatch(docs: DataFrame, runId: String): Boolean =
    table.append(graft.operators.TextAnalysis.winnowing(docs, k, window),
      runId, hashCol = "fp")

  /** The accumulated (doc_id, fp) fingerprint rows. */
  def fps: DataFrame = table.read().select("doc_id", "fp")

  /** Candidate pairs over everything indexed — identical to one-shot
    * substring candidates over the union of the batches. */
  def candidatePairs(maxBucket: Int = 1000): DataFrame =
    Dedup.substringCandidates(fps, maxBucket)

  /** Full substring-dup output (exact LCS ≥ minWords) verified
    * against `docs` — equals one-shot [[Dedup.substringDups]] when
    * `docs` is the union of the appended batches. */
  def dups(docs: DataFrame, minWords: Int = 7,
      maxBucket: Int = 1000): DataFrame =
    Dedup.verifySubstrings(candidatePairs(maxBucket), docs, k, minWords)
}
