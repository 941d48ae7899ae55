package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators._
import Q._

/** Training-data pipeline queries over documents/embeddings: dedup,
  * text analysis, similarity search. Hash-based signatures (minhash/
  * simhash/fingerprints use Spark's xxhash64, which DuckDB cannot
  * reproduce) are rows-only checked + ScalaTest-verified; set-math
  * and cosine queries carry full oracles. */
object DocQueries extends QuerySet {

  private val stop = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "on", "that", "it", "for", "with", "as", "at", "by")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) =>
      ordered(Dedup.exact(Tables.documents(s, dir)))),
    "q_token_stats" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      ordered(d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_m")))
    }),
    "q_quality" -> ((s, dir) =>
      ordered(TextAnalysis.qualityScore(Tables.documents(s, dir))
        .select(col("doc_id"),
          round(col("alpha_ratio"), 6).as("alpha_ratio"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"),
          round(col("mean_word_len"), 6).as("mean_word_len")))),
    "q_langid" -> ((s, dir) =>
      // explicit fixed-precedence language pick so the oracle CASE
      // chain mirrors it exactly (TextAnalysis.langId is the API
      // form; tested in PipelineOpsSpec)
      ordered(langPred(Tables.documents(s, dir)))),
    // stratified sampling keyed on the certified language labels:
    // downsample en to 4/16, de to 2/16, es to 8/16, fr to 12/16 —
    // zh/und strata kept in full. The md5-class decision is replayed
    // verbatim by the oracle, so the row SET (not just counts) is
    // certified.
    "q_stratified_sample" -> ((s, dir) =>
      ordered(TextAnalysis.stratifiedSample(
        langPred(Tables.documents(s, dir)), col("lang_pred"), col("doc_id"),
        Map("en" -> 4, "es" -> 8, "fr" -> 12, "de" -> 2)))),
    // deterministic corpus shuffle + shard assignment (the training-
    // shard layout step): 8 shards, seeded md5-class — the oracle
    // replays the 16-bit bucketing and the within-shard rank verbatim
    "q_shard_corpus" -> ((s, dir) =>
      ordered(TextAnalysis.shardCorpus(
        Tables.documents(s, dir), "doc_id", nShards = 8, seed = "ep0"))),
    // token-budget corpus mixing: per-source rates derived from target
    // weights + a token budget (total/4, derived identically in the
    // oracle), decided per doc by the md5-nibble class. Weights mix
    // capped (binding) and fractional sources plus unmapped → rate 0;
    // the oracle replays the WHOLE derivation — totals, integer rate
    // quantization, nibble decision — not just the kept set
    "q_token_mix" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val total = d.select(
        sum(TextAnalysis.tokenCount(col("text")).cast("long"))).head().getLong(0)
      ordered(TextAnalysis.tokenBudgetMix(d,
        Map("src0" -> 1, "src1" -> 3, "src3" -> 2, "src5" -> 4, "src9" -> 1),
        total / 4, TextAnalysis.tokenCount(col("text"))))
    }),
    // CCNet-style perplexity filtering: unigram-LM cross-entropy of
    // every doc under an add-one-smoothed model trained on the src0
    // slice (the "target domain"). The oracle replays the WHOLE
    // derivation — reference counts, the round(ln,4)-quantized
    // log-probs incl. the OOV bucket, exact decimal tf·lp sums, the
    // scalar presentation divide
    "q_lm_score" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      // sum_lp presented as its canonical fixed-scale string (the
      // q_role_transitions decimal discipline): a raw DECIMAL column
      // hashes differently through pyarrow vs DuckDB->pandas even
      // when the values are identical; scale-4 decimal-to-string
      // rendering is identical on both engines. xent stays the double
      // divide of byte-identical operands.
      ordered(TextAnalysis.lmScore(d, d.where(col("source") === "src0"))
        .withColumn("sum_lp", col("sum_lp").cast("string")))
    }),
    // greedy sequence packing into 512-token context windows, 16
    // md5-nibble shards: per-shard sequential bin assignment (the
    // pretraining batch-shaping step). The oracle replays the greedy
    // recurrence as a recursive CTE stepping rank-by-rank within each
    // shard — an independent sequential implementation, so the
    // mapPartitions fold is certified bin-for-bin, not just counted
    "q_pack_sequences" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val shard = conv(substring(md5(col("doc_id").cast("string")), 1, 1),
        16, 10).cast("int")
      ordered(TextAnalysis.packSequences(d, "doc_id",
        TextAnalysis.tokenCount(col("text")), budget = 512L, shard))
    }),
    "q_ngram_jaccard" -> ((s, dir) => {
      val d = Tables.documents(s, dir).where(col("doc_id") < 30)
      val pairs = d.select(col("doc_id").as("doc_a"))
        .join(d.select(col("doc_id").as("doc_b")), col("doc_a") < col("doc_b"))
      ordered(Dedup.jaccard(pairs, Tables.documents(s, dir), shingleN = 3)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard")))
    }),
    "q_knn_cosine" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), 10)
        .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("q_id", "rank")
    }),
    "q_embed_norm" -> ((s, dir) =>
      ordered(Tables.embeddings(s, dir)
        .select(col("vec_id"),
          round(Similarity.l2norm(col("embedding")), 6).as("nrm")))),
    // ---- certified hash-signature queries ----
    // portable=true → md5 hash family + md5-string band buckets, so
    // the DuckDB oracle replays the exact candidate-pair computation
    "q_minhash_lsh" -> ((s, dir) =>
      ordered(Dedup.minhashLsh(Tables.documents(s, dir), k = 32, bands = 8,
        portable = true))),
    // transitive dedup clusters: portable md5 LSH candidates (bands=16,
    // the flagship near-dup configuration) → exact jaccard ≥ 0.5 →
    // min-label-propagation components. The oracle replays candidates
    // + verification + a recursive-CTE closure over CANDIDATE pairs
    // only (jaccard on the full n² would cost 15 min at sf0.1);
    // pair-set equality with brute-force ground truth is certified
    // separately by q_neardup_verified, so the chain still pins the
    // clustering against ground truth end-to-end
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cand = Dedup.minhashLsh(docs, k = 32, bands = 16, portable = true)
        .select("doc_a", "doc_b")
      val pairs = Dedup.jaccard(cand, docs)
        .where(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      Dedup.clusters(pairs).orderBy("doc_id", "cluster_id")
    }),
    // Quality-aware winner selection over the SAME cluster pipeline:
    // keep the best-quality copy per near-dup cluster (ties → min id),
    // emitting the per-doc keep/drop decision — the step that turns
    // clusters into a filtered corpus. The oracle extends the
    // q_dedup_clusters recursive-CTE replay with the composite quality
    // score and the same window.
    "q_dedup_select" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cand = Dedup.minhashLsh(docs, k = 32, bands = 16, portable = true)
        .select("doc_a", "doc_b")
      val pairs = Dedup.jaccard(cand, docs)
        .where(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      val cl = Dedup.clusters(pairs)
      // quality is only consulted for CLUSTERED docs (inner join in
      // selectRepresentatives) — semi-prune before the quality
      // projection so the regex/token metrics never run on the
      // unclustered corpus (cl is checkpointed: the extra reference
      // is a cheap re-read, not a pipeline re-execution)
      val quality = TextAnalysis.qualityScore(
          docs.join(cl.select("doc_id"), Seq("doc_id"), "left_semi"))
        .select(col("doc_id"), col("quality"))
      ordered(Dedup.selectRepresentatives(cl, quality))
    }),
    // INCREMENTAL dedup maintenance (r3 verdict next-#5): the same
    // corpus arrives as 3 doc_id-partitioned batches appended to a
    // persistent band-bucket index (AppendIndexTable: atomic commits,
    // runId lineage), with batch 1 replayed (crash-resume no-op); the
    // accumulated index's candidate pairs must equal the ONE-SHOT
    // minhashLsh pipeline — the oracle IS q_minhash_lsh's oracle.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val root = freshDir(s"graft_qdi_${math.abs(dir.hashCode).toString}")
      val idx = new DedupIndex(s, root, k = 32, bands = 8, portable = true)
      (0 until 3).foreach { i =>
        idx.addBatch(docs.where(pmod(col("doc_id"), lit(3)) === i), s"qdi_batch$i")
      }
      // replayed batch: lineage makes it a no-op, not duplicate rows
      idx.addBatch(docs.where(pmod(col("doc_id"), lit(3)) === 1), "qdi_batch1")
      ordered(idx.candidatePairs())
    }),
    // Data-file compaction (AppendIndexTable.compact — the Iceberg
    // rewriteDataFiles analog): batches append, the accumulated
    // small per-batch dirs are consolidated MID-STREAM, more batches
    // append, and a replayed batch must STILL be a lineage no-op
    // (the runId union rides the compacted manifest). Candidates over
    // the compacted index must equal one-shot minhashLsh — the oracle
    // IS q_minhash_lsh's oracle, same as q_dedup_incremental.
    "q_dedup_compacted" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val root = freshDir(s"graft_qdc_${math.abs(dir.hashCode).toString}")
      val idx = new DedupIndex(s, root, k = 32, bands = 8, portable = true)
      (0 until 2).foreach { i =>
        idx.addBatch(docs.where(pmod(col("doc_id"), lit(3)) === i), s"qdc_batch$i")
      }
      idx.table.compact()
      idx.addBatch(docs.where(pmod(col("doc_id"), lit(3)) === 2), "qdc_batch2")
      // replay after compaction: lineage survived the rewrite
      idx.addBatch(docs.where(pmod(col("doc_id"), lit(3)) === 0), "qdc_batch0")
      idx.table.compact()
      ordered(idx.candidatePairs())
    }),
    // STREAMING dedup indexing (StreamingDedup): the corpus replayed
    // as a bounded file stream in ≥3 micro-batches, each appended to
    // the persistent band index via foreachBatch with runId/batchId
    // lineage. candidatePairs is a pure function of the index ROW SET
    // (order-insensitive, so no mtime pinning needed) — the streamed
    // index must equal the ONE-SHOT minhashLsh pipeline; the oracle
    // IS q_minhash_lsh's oracle, same as q_dedup_incremental.
    "q_streaming_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val base = freshDir(s"graft_qsd_${math.abs(dir.hashCode).toString}")
      (0 until 3).foreach { i =>
        docs.where(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(s"$base/in")
      }
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      val q = graft.streaming.StreamingDedup
        .indexWriter(stream, s"$base/idx", "qsd_run", portable = true)
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      val idx = new DedupIndex(s, s"$base/idx", k = 32, bands = 8, portable = true)
      ordered(idx.candidatePairs())
    }),
    // certified: the portable md5-nibble fingerprint lets the oracle
    // replay every per-bit token majority, the chunk pigeonhole, the
    // occupancy cap and the exact hamming verification
    "q_simhash_neardups" -> ((s, dir) =>
      // maxDist 3 = the 4×16-bit pigeonhole's guaranteed-recall regime;
      // the synthetic corpus is adversarially self-similar (small
      // vocabulary), so wider radii legitimately explode the pair set
      ordered(Dedup.simhashNearDups(Tables.documents(s, dir), maxDist = 3,
        portable = true))),
    "q_fingerprint" -> ((s, dir) =>
      ordered(TextAnalysis.fingerprint(Tables.documents(s, dir))
        .select(col("doc_id"), concat_ws(",", col("fingerprint")).as("fp")))),
    // certified by a literal-hyperplane oracle: the SQL embeds the
    // same deterministic plane constants and replays bucket assignment
    // + exact re-rank — the strongest statement an ANN can make
    "q_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.lshTopK(e, e.where(col("vec_id") < 5), 10, bits = 8, tables = 6)
        .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("q_id", "rank")
    }),
    // IVF ANN (the second scale path beside sign-LSH): pivot coarse
    // quantizer (vec_id % 64), nProbe=4 — the oracle replays the WHOLE
    // pipeline (assignment argmax, probe set, re-rank) in SQL; min
    // assignment margin on these corpora is 7.7e-7, nine orders above
    // cross-engine ulp noise, so every list membership is portable
    "q_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.ivfTopK(e, e.where(col("vec_id") < 5), 10)
        .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("q_id", "rank")
    }),
    // INCREMENTAL embedding-index maintenance: the corpus arrives as 3
    // vec_id-partitioned batches assigned against FROZEN pivot
    // centroids and appended to a persistent AnnIndex (AppendIndexTable
    // commits + runId lineage, batch 1 replayed as a crash-resume
    // no-op); the probe over the accumulated index — rank cap applied
    // at query time over cumulative lists — must equal one-shot
    // ivfTopK. The oracle IS q_ann_ivf's oracle.
    "q_ann_incremental" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val root = freshDir(s"graft_qai_${math.abs(dir.hashCode).toString}")
      val idx = new AnnIndex(s, root, Similarity.pivotCentroids(e, 64))
      (0 until 3).foreach { i =>
        idx.addBatch(e.where(pmod(col("vec_id"), lit(3)) === i), s"qai_batch$i")
      }
      // replayed batch: lineage makes it a no-op, not duplicate rows
      idx.addBatch(e.where(pmod(col("vec_id"), lit(3)) === 1), "qai_batch1")
      idx.topK(e, e.where(col("vec_id") < 5), 10)
        .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("q_id", "rank")
    }),
    // STREAMING ANN indexing (StreamingAnn → AnnIndex): the same
    // embeddings arrive as a bounded 3-micro-batch stream against
    // centroids frozen ONCE at index construction; the probe over the
    // accumulated assignments must equal one-shot ivfTopK — the
    // oracle IS q_ann_ivf's oracle. Completes the
    // one-shot/batch/streaming triangle for the embedding family.
    "q_streaming_ann" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val base = freshDir(s"graft_qsann_${math.abs(dir.hashCode).toString}")
      (0 until 3).foreach { i =>
        e.where(pmod(col("vec_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(s"$base/in")
      }
      val idx = new AnnIndex(s, s"$base/idx", Similarity.pivotCentroids(e, 64))
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      val q = graft.streaming.StreamingAnn
        .indexWriter(stream, idx, "qsann_run")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      idx.topK(e, e.where(col("vec_id") < 5), 10)
        .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("q_id", "rank")
    }),
    // Recall certification with PLANTED near-duplicates: the first 20
    // vectors re-enter with one component scaled by 1.25f (exactly
    // representable, so the float arithmetic is engine-portable) →
    // 20 ground-truth pairs at cos ≥ 0.997 while the densest organic
    // pair sits at ≤ 0.60. The oracle is the brute-force all-pairs
    // scan over the same augmented corpus, so a green row proves the
    // LSH self-join finds EVERY real near-dup (verified 20/20 at
    // sf0.001/0.01/0.1) while candidates stay ~4% of all-pairs —
    // recall certified semantically without dragging the LSH toward
    // brute force on near-orthogonal noise.
    "q_cosine_neardups" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val planted = e.where(col("vec_id") < 20).select(
        (col("vec_id") + 10000).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1) * lit(1.25f)),
          slice(col("embedding"), 2, 1000000)).as("embedding"))
      ordered(Similarity.cosineSelfJoin(e.unionByName(planted), 0.9,
          bits = 8, tables = 8)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos")))
    }),
    // transitive clusters over the EMBEDDING near-dup graph — same
    // Dedup.clusters label propagation as the text path, certified by
    // the same recursive-CTE ground-truth components oracle over the
    // brute-force cosine pair graph (planted dups included)
    "q_embed_clusters" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val planted = e.where(col("vec_id") < 20).select(
        (col("vec_id") + 10000).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1) * lit(1.25f)),
          slice(col("embedding"), 2, 1000000)).as("embedding"))
      val pairs = Similarity.cosineSelfJoin(e.unionByName(planted), 0.9,
          bits = 8, tables = 8)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      graft.operators.Dedup.clusters(pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
        .orderBy("vec_id", "cluster_id")
    }),
    // Gopher-style repetition metrics over word 2-grams: the
    // most-frequent-gram count comes from a scan-local run-length
    // maximum over the sorted gram array; the oracle recomputes it
    // the natural SQL way (unnest + GROUP BY + MAX), so the lambda
    // fold is certified against an independent formulation
    "q_repetition" -> ((s, dir) =>
      ordered(TextAnalysis.repetitionStats(Tables.documents(s, dir)))),
    // benchmark decontamination: docs with doc_id % 97 = 0 act as the
    // "eval set"; every document reports how many of its distinct
    // 5-grams appear in that set (bench docs themselves score 1.0 —
    // the degenerate full-overlap case, certified too)
    "q_decontaminate" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      ordered(TextAnalysis.contamination(d, d.where(col("doc_id") % 97 === 0)))
    }),
    // training-data mix report: one grouping-sets pass over
    // (source, lang) with all margins; oracle replays the levels as
    // explicit UNION ALL with literal gid values (no cross-engine
    // GROUPING_ID bit-order assumptions — the statByIndexMulti rule)
    "q_corpus_mix" -> ((s, dir) =>
      ordered(TextAnalysis.corpusMix(Tables.documents(s, dir)))),
    // per-doc top-3 distinctive terms: tf/df rational scoring — the
    // ranking is exact int arithmetic + one division, so the full
    // (rank, term, score) rows replay byte-for-byte
    "q_keywords" -> ((s, dir) =>
      ordered(TextAnalysis.distinctiveTerms(Tables.documents(s, dir), 3))),
    // PII detection + redaction: the synthetic corpus carries no PII,
    // so the query PLANTS it deterministically (emails with per-doc
    // local parts, dotted+dashed phones, an id-derived IPv4, an
    // SSN-shaped id at a punctuation boundary, plus a 4-digit decoy
    // run that must NOT match) via expressions the oracle rebuilds
    // verbatim — certifying counts AND the redacted text byte-for-byte
    // on real match boundaries, not on an empty result
    "q_pii" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" call 555-123-4567 or 555.987.6543")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
              lit(".25 up 1234.5.6.7890"))).otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            lit(" ssn 123-45-6789.")).otherwise(lit(""))).as("text"))
      ordered(TextAnalysis.piiStats(d))
    }),
    // substring-level dedup (Lee et al. 2021): winnowing-fingerprint
    // candidates + exact longest-common-word-substring verification.
    // Planted shared passages: every doc_id % 10 == 0 doc gets a
    // 13-word passage whose 4th word varies by doc_id % 3 — pairs
    // within a variant share 13 words (≥ minWords 12, included, lcs
    // certified exactly); across variants the longest shared run is 9
    // words (excluded). The oracle replays grams, md5 window-minima,
    // the occupancy cap, and the diagonal-islands LCS verbatim.
    "q_substring_dups" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val aug = d.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" shared passage variant "),
            (col("doc_id") % 3).cast("string"),
            lit(" carries twelve exactly matching words copied across documents verbatim")))
          .otherwise(col("text")).as("text"))
      ordered(Dedup.substringDups(aug, k = 4, window = 4, minWords = 12))
    }),
    // INCREMENTAL substring dedup (SubstringDedupIndex): the same
    // planted corpus winnowed in 3 disjoint batch appends (+ a
    // lineage-skipped replay); candidates are a pure function of the
    // cumulative fingerprint ROW SET (occupancy cap at query time),
    // so the verified output must equal one-shot substringDups — the
    // oracle IS q_substring_dups' oracle. Completes the append-only
    // story for the last dedup family.
    "q_substring_dups_incremental" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val aug = d.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" shared passage variant "),
            (col("doc_id") % 3).cast("string"),
            lit(" carries twelve exactly matching words copied across documents verbatim")))
          .otherwise(col("text")).as("text"))
      val root = freshDir(s"graft_qsdi_${math.abs(dir.hashCode).toString}")
      val idx = new graft.operators.SubstringDedupIndex(s, root, k = 4, window = 4)
      (0 until 3).foreach { i =>
        idx.addBatch(aug.where(pmod(col("doc_id"), lit(3)) === i), s"qsdi_batch$i")
      }
      idx.addBatch(aug.where(pmod(col("doc_id"), lit(3)) === 2), "qsdi_batch2")
      ordered(idx.dups(aug, minWords = 12))
    }),
    // STREAMING substring-dedup indexing: the same planted corpus
    // winnowed micro-batch by micro-batch into the persistent
    // fingerprint index; the verified output over the accumulated
    // fingerprints must equal one-shot substringDups — the oracle IS
    // q_substring_dups' oracle. With MinHash, line-frequency and IVF
    // streaming writers this closes the triangle for every family.
    "q_streaming_substring_dups" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val aug = d.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" shared passage variant "),
            (col("doc_id") % 3).cast("string"),
            lit(" carries twelve exactly matching words copied across documents verbatim")))
          .otherwise(col("text")).as("text"))
      val base = freshDir(s"graft_qssd_${math.abs(dir.hashCode).toString}")
      (0 until 3).foreach { i =>
        aug.where(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(s"$base/in")
      }
      val stream = s.readStream.schema(aug.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      val q = graft.streaming.StreamingSubstringDedup
        .indexWriter(stream, s"$base/idx", "qssd_run", k = 4, window = 4)
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      val idx = new graft.operators.SubstringDedupIndex(s, s"$base/idx",
        k = 4, window = 4)
      ordered(idx.dups(aug, minWords = 12))
    }),
    // C4-style cross-document line-level dedup: multiline documents
    // built deterministically (5 shared header variants and an
    // every-other-doc footer = boilerplate to drop; the unique body
    // and a df≤2 rare footer survive), reassembled in original line
    // order — the oracle replays split/count/filter/reassemble with
    // an independent unnest + GROUP BY + ordered string_agg
    "q_line_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n",
          concat(lit("header variant "), (col("doc_id") % 5).cast("string")),
          col("text"),
          when(col("doc_id") % 2 === 0, lit("subscribe to our newsletter")),
          when(col("doc_id") % 97 === 0,
            concat(lit("rare footer "), (col("doc_id") % 3).cast("string")))
        ).as("text"))
      ordered(Dedup.lineDedup(d, maxDocFreq = 2))
    }),
    // INCREMENTAL line dedup (LineDedupIndex): the same planted corpus
    // appended in 3 disjoint batches (+ a lineage-skipped replay of
    // batch 1); per-batch countDistinct partials SUM to the global
    // document frequency because batches are doc-disjoint, so the
    // cumulative drop set — and the dedup output — must be identical
    // to one-shot lineDedup. The oracle IS q_line_dedup's oracle.
    "q_line_dedup_incremental" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n",
          concat(lit("header variant "), (col("doc_id") % 5).cast("string")),
          col("text"),
          when(col("doc_id") % 2 === 0, lit("subscribe to our newsletter")),
          when(col("doc_id") % 97 === 0,
            concat(lit("rare footer "), (col("doc_id") % 3).cast("string")))
        ).as("text"))
      val root = freshDir(s"graft_qldi_${math.abs(dir.hashCode).toString}")
      val idx = new graft.operators.LineDedupIndex(s, root)
      (0 until 3).foreach { i =>
        idx.addBatch(d.where(pmod(col("doc_id"), lit(3)) === i), s"qldi_batch$i")
      }
      idx.addBatch(d.where(pmod(col("doc_id"), lit(3)) === 1), "qldi_batch1")
      ordered(idx.dedup(d, maxDocFreq = 2))
    }),
    // STREAMING line-dedup indexing: the planted corpus replayed as a
    // bounded file stream in ≥3 micro-batches, frequency partials
    // appended per batch via foreachBatch with runId/batchId lineage.
    // Partials are additive and order-insensitive (no mtime pinning
    // needed) — the streamed index's dedup must equal ONE-SHOT
    // lineDedup; the oracle IS q_line_dedup's oracle. Completes the
    // one-shot/batch/streaming triangle for the line-dedup family.
    "q_streaming_line_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n",
          concat(lit("header variant "), (col("doc_id") % 5).cast("string")),
          col("text"),
          when(col("doc_id") % 2 === 0, lit("subscribe to our newsletter")),
          when(col("doc_id") % 97 === 0,
            concat(lit("rare footer "), (col("doc_id") % 3).cast("string")))
        ).as("text"))
      val base = freshDir(s"graft_qsld_${math.abs(dir.hashCode).toString}")
      (0 until 3).foreach { i =>
        d.where(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(s"$base/in")
      }
      val stream = s.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      val q = graft.streaming.StreamingLineDedup
        .indexWriter(stream, s"$base/idx", "qsld_run")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      val idx = new graft.operators.LineDedupIndex(s, s"$base/idx")
      ordered(idx.dedup(d, maxDocFreq = 2))
    }),
    // C4 rule filter (Raffel et al. 2020): the corpus carries no
    // newlines or sentence punctuation, so the query plants every rule
    // boundary deterministically — a kept terminal-punct line, an
    // exactly-minLineWords line, a no-punct line, a too-short line, a
    // javascript line (doc_id % 3), a 5-sentence line on even docs
    // only (odd docs fail minSentences), and the lorem-ipsum /
    // curly-brace document kills (% 31 / % 41) — via expressions the
    // oracle rebuilds verbatim, certifying line counts, the sentence
    // count, the keep flag AND the reassembled clean text
    "q_c4_filter" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n",
          col("text"),
          lit("This line ends with terminal punctuation."),
          lit("Exactly three words."),
          lit("no terminal punctuation here"),
          lit("Too short."),
          when(col("doc_id") % 2 === 0,
            lit("One two three. Four five six. Seven eight nine. Ten eleven twelve. Final sentence here.")),
          when(col("doc_id") % 3 === 0,
            lit("Please enable javascript to continue.")),
          when(col("doc_id") % 31 === 0,
            lit("Lorem ipsum dolor sit amet.")),
          when(col("doc_id") % 41 === 0,
            lit("Config sample { key: value } here."))
        ).as("text"))
      ordered(TextAnalysis.c4Filter(d))
    }),
    // Gopher rule filter (Rae et al. 2021 A1.1.2): every rule is
    // integer arithmetic, so certification needs no float discipline
    // at all. The corpus straddles the 50-word minimum naturally
    // (median ≈ 56 at every SF); the planted lines drive the other
    // rules — all 8 stop words (%2), a 9-line bullet block (%7),
    // a '#' symbol run (%11), an ellipsis-terminated line (%13),
    // all-digit words (%17), >10-char words (%19) — via expressions
    // the oracle rebuilds verbatim: counts AND flags certified.
    "q_gopher_filter" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n",
          col("text"),
          when(col("doc_id") % 2 === 0,
            lit("the results have to be consistent with that and of course.")),
          when(col("doc_id") % 7 === 0,
            lit(Seq.fill(9)("- bullet item here").mkString("\n"))),
          when(col("doc_id") % 11 === 0,
            lit("#money #tags #crypto #spam #promo #ads")),
          when(col("doc_id") % 13 === 0,
            lit("and the thought just trails off...")),
          when(col("doc_id") % 17 === 0,
            lit("12345 67890 10101 20202 30303 40404 50505")),
          when(col("doc_id") % 19 === 0,
            lit("supercalifragilisticexpialidocious antidisestablishmentarianism floccinaucinihilipilification"))
        ).as("text"))
      ordered(TextAnalysis.gopherFilter(d))
    }),
    // URL/domain blocklist filter: the corpus carries no URLs, so the
    // query plants them — a blocked domain (%5), a SUBDOMAIN of a
    // blocked domain in mixed case (%9, exercises (?i) + the
    // dot-suffix rule), a benign domain (%4), a repeat of the same
    // host (%20, dedup), and a scheme-only decoy that must NOT match —
    // via expressions the oracle rebuilds verbatim
    "q_url_filter" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws(" ",
          col("text"),
          when(col("doc_id") % 5 === 0, lit("see https://spam.example.com/path now")),
          when(col("doc_id") % 9 === 0, lit("via HTTPS://Ads.Tracker.NET/pixel?id=1")),
          when(col("doc_id") % 4 === 0, lit("docs at http://docs.example.org/guide")),
          when(col("doc_id") % 20 === 0, lit("again https://spam.example.com/other")),
          lit("malformed http:// gap stays out")
        ).as("text"))
      ordered(TextAnalysis.urlFilter(d,
        blocklist = Seq("spam.example.com", "tracker.net")))
    }),
    // END-TO-END curation capstone (Curation.curate): the composed
    // training-data recipe — PII redact → cross-doc line dedup →
    // URL/C4/Gopher flags → exact dedup (one window) → benchmark
    // decontamination — certified as ONE audit table: per-doc stage
    // flags (NULL = stage never reached), gram counts AND the final
    // cleaned text, byte-for-byte. The planted corpus exercises every
    // stage both ways. Exact-dup pairs are keyed by a pair-canonical
    // pid (docs d ≡ 1 mod 100 pair with d+100, every planted token
    // keyed on pid) so the pair's lines have document frequency
    // exactly 2 and SURVIVE the boilerplate cap — without that, line
    // dedup would shred the duplicate groups before the dedup stage
    // could see them (the stages genuinely interact; that interaction
    // is what this row certifies).
    "q_curate" -> ((s, dir) => {
      import s.implicits._
      val aug = Tables.documents(s, dir)
        .withColumn("pid", expr("CASE WHEN doc_id % 100 = 1 THEN " +
          "((doc_id - 1) div 200) * 200 + 1 ELSE doc_id END"))
        .select(col("doc_id"), concat_ws("\n",
          concat(lit("header variant "), (col("pid") % 5).cast("string")),
          when(col("doc_id") % 100 === 1,
            concat(lit("duplicate body copy "), col("pid").cast("string"),
              lit(" "),
              expr("repeat('the quick brown fox jumps over a lazy dog " +
                "again and again ', 5)"),
              lit("ends now.")))
            .otherwise(concat(col("text"),
              when(col("pid") % 7 === 0, concat(lit(" contact user"),
                col("pid").cast("string"), lit("@example.com now")))
                .otherwise(lit("")),
              when(col("pid") % 11 === 0,
                lit(" call 555-123-4567 or 555.987.6543")).otherwise(lit("")),
              lit(" tail."))),
          when(col("pid") % 2 === 0 || col("doc_id") % 100 === 1,
            concat(lit("The results do have to be consistent with that " +
              "and of course. One two three. Four five six. Seven eight " +
              "nine. Item "), col("pid").cast("string"), lit(" ends now."))),
          when(col("pid") % 5 === 0,
            concat(lit("see https://spam.example.com/path now item "),
              col("pid").cast("string"))),
          when(col("pid") % 4 === 0,
            concat(lit("docs at http://docs.example.org/guide item "),
              col("pid").cast("string"))),
          when(col("pid") % 6 === 0,
            concat(lit("benchmark question alpha squared equals four " +
              "exactly says the canonical answer key item "),
              col("pid").cast("string"), lit("."))),
          when(col("pid") % 2 === 0, lit("subscribe to our newsletter")),
          when(col("pid") % 31 === 0,
            concat(lit("Lorem ipsum dolor sit amet item "),
              col("pid").cast("string"), lit("."))),
          when(col("pid") % 41 === 0,
            concat(lit("Config sample { braces } item "),
              col("pid").cast("string"), lit(".")))
        ).as("text"))
      val bench = Seq("benchmark question alpha squared equals four " +
        "exactly says the canonical answer key item").toDF("text")
      ordered(Curation.curate(aug, bench,
        blocklist = Seq("spam.example.com")))
    }),
  )

  /** Fixed-precedence language pick over [[langScores]] — shared by
    * q_langid and q_stratified_sample so both replay the same oracle
    * CASE chain. */
  private def langPred(d: DataFrame): DataFrame =
    langScores(d).select(col("doc_id"),
      when(col("zh_s") > lit(0.05), "zh")
        .when(col("en_s") >= greatest(col("es_s"), col("de_s"), col("fr_s")) && col("en_s") > 0, "en")
        .when(col("es_s") >= greatest(col("de_s"), col("fr_s")) && col("es_s") > 0, "es")
        .when(col("de_s") >= col("fr_s") && col("de_s") > 0, "de")
        .when(col("fr_s") > 0, "fr")
        .otherwise("und").as("lang_pred"))

  private def langScores(d: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), "\\s+")
    def score(ws: Seq[String]) =
      size(filter(toks, t => t.isInCollection(ws))).cast("double")
    d.select(col("doc_id"),
      score(Seq("the", "and", "of", "to", "is", "with", "for")).as("en_s"),
      score(Seq("el", "la", "los", "las", "de", "que", "y", "en", "una")).as("es_s"),
      score(Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")).as("de_s"),
      score(Seq("le", "les", "des", "et", "est", "une", "dans")).as("fr_s"),
      (length(regexp_replace(col("text"), "[^\\x{4E00}-\\x{9FFF}]", ""))
        .cast("double") / greatest(length(col("text")), lit(1))).as("zh_s"))
  }

  private val stopList = stop.map(s => s"'$s'").mkString("[", ", ", "]")

  /** DuckDB shingle CTE (3-gram, distinct, short-doc-guarded) shared
    * by the jaccard / minhash oracles — mirror of Dedup.withShingles. */
  private def shCte(n: Int): String =
    s"""sh AS (
       |  SELECT doc_id, CASE WHEN len(toks) >= $n THEN list_distinct(
       |    [array_to_string(toks[i+1:i+$n], ' ')
       |     for i in range(0, greatest(len(toks)-$n, 0)+1)])
       |    ELSE [] END AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
       |        FROM documents)
       |)""".stripMargin

  /** Literal hyperplane as a DuckDB double list (same constants the
    * Spark side embeds — Similarity.plane is deterministic). */
  private def planeList(t: Int, b: Int, dim: Int): String =
    Similarity.plane(t, b, dim).mkString("[", ", ", "]")

  /** Sign-LSH bucket id expression over a DOUBLE[] column, replaying
    * Similarity.bucketFor bit-for-bit (min |projection| on this corpus
    * is 2.5e-7, so the sign is engine-portable). */
  private def bucketSql(e: String, t: Int, bits: Int, dim: Int): String =
    (0 until bits).map(b =>
      s"(CASE WHEN list_dot_product($e, ${planeList(t, b, dim)}) >= 0 THEN ${1L << b} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Shared CTE chain for the transitive-cluster oracles: portable-md5
    * LSH candidates (bands=16) → exact jaccard ≥ 0.5 → recursive-CTE
    * components → `cl(doc_id, cluster_id)`. MATERIALIZED is
    * load-bearing on cand/pr/e (see q_dedup_clusters comment). */
  private lazy val dedupClusterCtes: String =
    s"""${shCte(3)},
       |sig AS (
       |  SELECT doc_id,
       |    [list_min([md5(CAST(i AS VARCHAR) || ':' || x) for x in s])
       |     for i in range(0, 32)] AS sig
       |  FROM sh),
       |banded AS (
       |  SELECT doc_id, CAST(b AS INT) AS band,
       |         md5(array_to_string(sig[b*2+1:b*2+2], '|')) AS bucket
       |  FROM sig, range(0, 16) t(b)),
       |capped AS (
       |  SELECT * FROM banded
       |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 1000),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |pr AS MATERIALIZED (
       |  SELECT doc_a, doc_b
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = cand.doc_a
       |  JOIN sh sb ON sb.doc_id = cand.doc_b
       |  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
       |        len(list_distinct(list_concat(sa.s, sb.s))) >= 0.5),
       |e AS MATERIALIZED (
       |  SELECT doc_a AS u, doc_b AS w FROM pr
       |  UNION SELECT doc_b, doc_a FROM pr),
       |reach(u, w) AS (
       |  SELECT u, w FROM e
       |  UNION
       |  SELECT r.u, e.w FROM reach r JOIN e ON r.w = e.u),
       |cl AS (
       |  SELECT u AS doc_id, least(u, min(w)) AS cluster_id
       |  FROM reach GROUP BY u)""".stripMargin

  /** Full IVF pipeline replay (assignment argmax, probe set, id-only
    * exact re-rank) — shared verbatim by q_ann_ivf (one-shot pivot
    * quantizer) and q_ann_incremental (batch-appended AnnIndex with
    * the same frozen pivot centroids). */
  private lazy val ivfOracle: String =
    """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |cents AS (SELECT vec_id AS cent_id, e AS ce FROM c WHERE vec_id % 64 = 0),
      |ac AS (SELECT c.vec_id, cent_id, list_cosine_similarity(c.e, ce) AS cs
      |       FROM c CROSS JOIN cents),
      |assign AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT vec_id, cent_id,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS rn
      |    FROM ac) WHERE rn = 1),
      |q AS (SELECT vec_id AS q_id, e AS qe FROM c WHERE vec_id < 5),
      |qc AS (SELECT q_id, cent_id, list_cosine_similarity(qe, ce) AS cs
      |       FROM q CROSS JOIN cents),
      |probes AS (
      |  SELECT q_id, cent_id FROM (
      |    SELECT q_id, cent_id,
      |           row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, cent_id) AS rn
      |    FROM qc) WHERE rn <= 4),
      |cand AS (
      |  SELECT DISTINCT q_id, vec_id
      |  FROM assign JOIN probes USING (cent_id) WHERE vec_id <> q_id),
      |sc AS (
      |  SELECT cand.q_id, cand.vec_id, list_cosine_similarity(c.e, q.qe) AS cs
      |  FROM cand JOIN c USING (vec_id) JOIN q USING (q_id)),
      |r AS (
      |  SELECT q_id, vec_id, cs,
      |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rank
      |  FROM sc)
      |SELECT q_id, CAST(rank AS INT) AS rank, vec_id, round(cs, 6) + 0.0 AS cos
      |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** One-shot substring-dup replay (grams → window minima → cap →
    * diagonal islands), shared by q_substring_dups and
    * q_substring_dups_incremental. */
  private lazy val substringDupsOracle: String =
      """WITH aug AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |         THEN text || ' shared passage variant ' || CAST(doc_id % 3 AS VARCHAR) ||
        |              ' carries twelve exactly matching words copied across documents verbatim'
        |         ELSE text END AS text
        |  FROM documents),
        |tk AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM aug),
        |gr AS (
        |  SELECT doc_id,
        |         CASE WHEN len(toks) >= 4 THEN
        |           [md5(array_to_string(toks[i+1:i+4], ' ')) for i in range(0, len(toks)-4+1)]
        |         ELSE [] END AS hs
        |  FROM tk),
        |fp AS (
        |  SELECT DISTINCT doc_id, fp FROM (
        |    SELECT doc_id,
        |           unnest(CASE WHEN len(hs) >= 4 THEN
        |             [list_min(hs[i+1:i+4]) for i in range(0, len(hs)-4+1)]
        |           ELSE [] END) AS fp
        |    FROM gr)),
        |fpc AS (SELECT * FROM fp QUALIFY COUNT(*) OVER (PARTITION BY fp) <= 1000),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM fpc a JOIN fpc b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |gp AS (
        |  SELECT doc_id,
        |         unnest([{'pos': i, 'g': hs[i+1]} for i in range(0, len(hs))],
        |                recursive := true)
        |  FROM gr),
        |m AS (
        |  SELECT doc_a, doc_b, ga.pos AS pa, gb.pos AS pb
        |  FROM cand
        |  JOIN gp ga ON ga.doc_id = cand.doc_a
        |  JOIN gp gb ON gb.doc_id = cand.doc_b AND gb.g = ga.g),
        |runs AS (
        |  SELECT doc_a, doc_b, pa - pb AS diag,
        |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
        |                                 ORDER BY pa) AS isl
        |  FROM m),
        |rl AS (SELECT doc_a, doc_b, diag, isl, COUNT(*) AS run
        |       FROM runs GROUP BY doc_a, doc_b, diag, isl)
        |SELECT doc_a, doc_b, CAST(MAX(run) + 3 AS BIGINT) AS lcs_words
        |FROM rl GROUP BY doc_a, doc_b
        |HAVING MAX(run) + 3 >= 12
        |ORDER BY doc_a, doc_b, lcs_words""".stripMargin

  /** One-shot line-dedup replay: unnest-with-index + doc-frequency
    * GROUP BY + ordered string_agg reassembly over the planted
    * multiline construction. Shared by q_line_dedup and
    * q_line_dedup_incremental (the incremental index is provably
    * identical to one-shot — doc-disjoint batch partials sum to the
    * global document frequency). */
  private lazy val lineDedupOracle: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |    concat_ws(chr(10),
      |      'header variant ' || CAST(doc_id % 5 AS VARCHAR),
      |      text,
      |      CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter' END,
      |      CASE WHEN doc_id % 97 = 0 THEN 'rare footer ' || CAST(doc_id % 3 AS VARCHAR) END) AS text
      |  FROM documents),
      |lx AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM aug),
      |lines AS (
      |  SELECT doc_id,
      |         unnest([{'idx': i, 'ln': ls[i+1]} for i in range(0, len(ls))],
      |                recursive := true)
      |  FROM lx),
      |freq AS (SELECT ln, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY ln),
      |kept AS (
      |  SELECT l.doc_id, l.idx, l.ln
      |  FROM lines l JOIN freq f USING (ln) WHERE f.df <= 2),
      |reb AS (
      |  SELECT doc_id, string_agg(ln, chr(10) ORDER BY idx) AS text
      |  FROM kept GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(r.text, '') AS text
      |FROM documents d LEFT JOIN reb r USING (doc_id)
      |ORDER BY doc_id, text""".stripMargin

  /** Composed replay of the full curation pipeline — every stage is
    * the verbatim oracle fragment its standalone row already proves
    * (PII redact chain from q_pii, line dedup from q_line_dedup, C4
    * line/doc rules from q_c4_filter, Gopher integers from
    * q_gopher_filter, URL rules from q_url_filter, shingle overlap
    * from q_decontaminate), chained through CTEs in the engine's
    * stage order. Exact dedup replays the window as MIN(doc_id) over
    * the clean text itself (the engine partitions by sha256(clean) —
    * identical groups under the standard content-hash assumption). */
  private lazy val curateOracle: String = {
    val redacted = graft.operators.TextAnalysis.piiClasses.foldLeft("text") {
      case (e, (_, pat, tok)) => s"regexp_replace($e, '$pat', '$tok', 'g')"
    }
    val benchText = "benchmark question alpha squared equals four " +
      "exactly says the canonical answer key item"
    s"""WITH pidt AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 100 = 1
       |              THEN ((doc_id - 1) // 200) * 200 + 1
       |              ELSE doc_id END AS pid,
       |         text
       |  FROM documents),
       |aug AS (
       |  SELECT doc_id, concat_ws(chr(10),
       |    'header variant ' || CAST(pid % 5 AS VARCHAR),
       |    CASE WHEN doc_id % 100 = 1
       |         THEN 'duplicate body copy ' || CAST(pid AS VARCHAR) || ' ' ||
       |              repeat('the quick brown fox jumps over a lazy dog again and again ', 5) || 'ends now.'
       |         ELSE text ||
       |           CASE WHEN pid % 7 = 0 THEN ' contact user' || CAST(pid AS VARCHAR) || '@example.com now' ELSE '' END ||
       |           CASE WHEN pid % 11 = 0 THEN ' call 555-123-4567 or 555.987.6543' ELSE '' END ||
       |           ' tail.' END,
       |    CASE WHEN pid % 2 = 0 OR doc_id % 100 = 1
       |         THEN 'The results do have to be consistent with that and of course. One two three. Four five six. Seven eight nine. Item ' || CAST(pid AS VARCHAR) || ' ends now.' END,
       |    CASE WHEN pid % 5 = 0 THEN 'see https://spam.example.com/path now item ' || CAST(pid AS VARCHAR) END,
       |    CASE WHEN pid % 4 = 0 THEN 'docs at http://docs.example.org/guide item ' || CAST(pid AS VARCHAR) END,
       |    CASE WHEN pid % 6 = 0 THEN '$benchText ' || CAST(pid AS VARCHAR) || '.' END,
       |    CASE WHEN pid % 2 = 0 THEN 'subscribe to our newsletter' END,
       |    CASE WHEN pid % 31 = 0 THEN 'Lorem ipsum dolor sit amet item ' || CAST(pid AS VARCHAR) || '.' END,
       |    CASE WHEN pid % 41 = 0 THEN 'Config sample { braces } item ' || CAST(pid AS VARCHAR) || '.' END) AS text
       |  FROM pidt),
       |red AS (SELECT doc_id, $redacted AS text FROM aug),
       |lx0 AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM red),
       |lines AS (
       |  SELECT doc_id,
       |         unnest([{'idx': i, 'ln': ls[i+1]} for i in range(0, len(ls))],
       |                recursive := true)
       |  FROM lx0),
       |freq AS (SELECT ln, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY ln),
       |kept0 AS (
       |  SELECT l.doc_id, l.idx, l.ln
       |  FROM lines l JOIN freq f USING (ln) WHERE f.df <= 2),
       |reb AS (
       |  SELECT doc_id, string_agg(ln, chr(10) ORDER BY idx) AS text
       |  FROM kept0 GROUP BY doc_id),
       |lined AS (
       |  SELECT d.doc_id, coalesce(r.text, '') AS text
       |  FROM documents d LEFT JOIN reb r USING (doc_id)),
       |fl AS (
       |  SELECT doc_id, text,
       |    coalesce(array_to_string(list_filter(str_split(text, chr(10)), ln ->
       |      regexp_matches(trim(ln), '[.!?"]$$')
       |      AND len(regexp_split_to_array(trim(ln), '\\s+')) >= 3
       |      AND NOT contains(lower(ln), 'javascript')), chr(10)), '') AS clean
       |  FROM lined),
       |flags AS (
       |  SELECT doc_id, clean,
       |    CAST((len(list_filter(list_distinct(list_transform(
       |        regexp_extract_all(text, '(?i)https?://[a-z0-9.-]+'),
       |        x -> lower(regexp_replace(x, '(?i)^https?://', '')))),
       |      h -> h = 'spam.example.com'
       |           OR h LIKE '%.spam.example.com')) = 0) AS INT) AS url_keep,
       |    CAST((length(regexp_replace(clean, '[^.!?]', '', 'g')) >= 5
       |          AND NOT contains(lower(clean), 'lorem ipsum')
       |          AND NOT contains(clean, '{')) AS INT) AS c4_keep
       |  FROM fl),
       |g AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS INT) AS n_words,
       |    CAST(length(regexp_replace(clean, '\\s+', '', 'g')) AS INT) AS n_word_chars,
       |    CAST(length(regexp_replace(clean, '[^#]', '', 'g'))
       |         + (length(clean) - length(replace(clean, '...', ''))) // 3 AS INT) AS n_symbols,
       |    CAST(len(ls) AS INT) AS n_lines,
       |    CAST(len(list_filter(ls, ln -> regexp_matches(ln, '^\\s*[-*] '))) AS INT) AS n_bullet_lines,
       |    CAST(len(list_filter(ls, ln -> regexp_matches(ln, '\\.\\.\\.\\s*$$'))) AS INT) AS n_ellipsis_lines,
       |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS INT) AS n_alpha_words,
       |    CAST((CASE WHEN list_contains(lt, 'the') THEN 1 ELSE 0 END
       |        + CASE WHEN list_contains(lt, 'be') THEN 1 ELSE 0 END
       |        + CASE WHEN list_contains(lt, 'to') THEN 1 ELSE 0 END
       |        + CASE WHEN list_contains(lt, 'of') THEN 1 ELSE 0 END
       |        + CASE WHEN list_contains(lt, 'and') THEN 1 ELSE 0 END
       |        + CASE WHEN list_contains(lt, 'that') THEN 1 ELSE 0 END
       |        + CASE WHEN list_contains(lt, 'have') THEN 1 ELSE 0 END
       |        + CASE WHEN list_contains(lt, 'with') THEN 1 ELSE 0 END) AS INT) AS n_req_stops
       |  FROM (SELECT doc_id, clean,
       |          list_filter(regexp_split_to_array(clean, '\\s+'), w -> len(w) > 0) AS toks,
       |          list_transform(list_filter(regexp_split_to_array(clean, '\\s+'), w -> len(w) > 0), w -> lower(w)) AS lt,
       |          str_split(clean, chr(10)) AS ls
       |        FROM fl)),
       |fk AS (
       |  SELECT f.doc_id, f.clean, f.url_keep, f.c4_keep,
       |    CAST((g.n_words BETWEEN 50 AND 100000
       |          AND g.n_word_chars >= 3 * g.n_words
       |          AND g.n_word_chars <= 10 * g.n_words
       |          AND g.n_symbols * 10 < g.n_words
       |          AND g.n_bullet_lines * 10 < g.n_lines * 9
       |          AND g.n_ellipsis_lines * 10 < g.n_lines * 3
       |          AND g.n_alpha_words * 10 >= g.n_words * 8
       |          AND g.n_req_stops >= 2) AS INT) AS gopher_keep
       |  FROM flags f JOIN g USING (doc_id)),
       |ded AS (
       |  SELECT *,
       |    CASE WHEN url_keep = 1 AND c4_keep = 1 AND gopher_keep = 1 THEN
       |      CAST(doc_id = MIN(CASE WHEN url_keep = 1 AND c4_keep = 1
       |                             AND gopher_keep = 1 THEN doc_id END)
       |                    OVER (PARTITION BY clean) AS INT)
       |    END AS dedup_keep
       |  FROM fk),
       |cand AS (SELECT doc_id, clean FROM ded WHERE dedup_keep = 1),
       |csh AS (
       |  SELECT doc_id, CASE WHEN len(toks) >= 5 THEN list_distinct(
       |    [array_to_string(toks[i+1:i+5], ' ')
       |     for i in range(0, greatest(len(toks)-5, 0)+1)])
       |    ELSE [] END AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(lower(clean), '\\s+') AS toks
       |        FROM cand)),
       |bgr AS (
       |  SELECT DISTINCT gram FROM (
       |    SELECT unnest([array_to_string(toks[i+1:i+5], ' ')
       |                   for i in range(0, greatest(len(toks)-5, 0)+1)]) AS gram
       |    FROM (SELECT regexp_split_to_array(lower('$benchText'), '\\s+') AS toks))),
       |hits AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hit_grams
       |  FROM (SELECT doc_id, gram FROM csh, unnest(s) u(gram)) dg
       |  JOIN bgr USING (gram) GROUP BY doc_id),
       |contam AS (
       |  SELECT csh.doc_id, CAST(len(s) AS BIGINT) AS n_grams,
       |         CAST(COALESCE(hit_grams, 0) AS BIGINT) AS hit_grams
       |  FROM csh LEFT JOIN hits USING (doc_id))
       |SELECT d.doc_id, d.url_keep, d.c4_keep, d.gopher_keep, d.dedup_keep,
       |       c.n_grams, c.hit_grams,
       |       CASE WHEN c.n_grams IS NOT NULL
       |            THEN CAST(c.hit_grams * 1000 <= c.n_grams * 50 AS INT)
       |       END AS contam_keep,
       |       CAST(CASE WHEN c.n_grams IS NOT NULL
       |                 AND c.hit_grams * 1000 <= c.n_grams * 50
       |                 THEN 1 ELSE 0 END AS INT) AS keep,
       |       d.clean AS text
       |FROM ded d LEFT JOIN contam c USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  private lazy val minhashLshOracle: String =
    s"""WITH ${shCte(3)},
       |sig AS (
       |  SELECT doc_id,
       |    [list_min([md5(CAST(i AS VARCHAR) || ':' || x) for x in s])
       |     for i in range(0, 32)] AS sig
       |  FROM sh),
       |banded AS (
       |  SELECT doc_id, CAST(b AS INT) AS band,
       |         md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bucket
       |  FROM sig, range(0, 8) t(b)),
       |capped AS (
       |  SELECT * FROM banded
       |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 1000)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
       |FROM capped a JOIN capped b
       |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY doc_a, doc_b, n_shared_bands""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """WITH h AS (SELECT doc_id, sha256(text) AS hh FROM documents)
        |SELECT doc_id,
        |       MIN(doc_id) OVER (PARTITION BY hh) AS canonical_id,
        |       COUNT(*) OVER (PARTITION BY hh) AS n_dups
        |FROM h QUALIFY n_dups > 1
        |ORDER BY doc_id, canonical_id, n_dups""".stripMargin,
    "q_token_stats" ->
      // the trailing CASE mirrors TextAnalysis.tokenCount's empty-text
      // correction: splitting '' yields [''] (count 1) in both engines,
      // but the operator defines empty/whitespace-only text as 0 tokens
      """SELECT doc_id,
        |       CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |            - CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM documents ORDER BY doc_id, n_tokens, n_chars_m""".stripMargin,
    "q_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
         |  FROM documents)
         |SELECT doc_id,
         |  round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) /
         |        greatest(length(text), 1), 6) + 0.0 AS alpha_ratio,
         |  round(CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) /
         |        greatest(length(text), 1), 6) + 0.0 AS punct_ratio,
         |  round(CAST(len(list_filter(toks, t -> list_contains($stopList, t))) AS DOUBLE) /
         |        greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) + 0.0 AS stopword_ratio,
         |  round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) /
         |        greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) + 0.0 AS mean_word_len
         |FROM t
         |ORDER BY doc_id, alpha_ratio, punct_ratio, stopword_ratio, mean_word_len""".stripMargin,
    "q_langid" ->
      """WITH t AS (
        |  SELECT doc_id, text, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','is','with','for'], t))) AS DOUBLE) AS en_s,
        |    CAST(len(list_filter(toks, t -> list_contains(['el','la','los','las','de','que','y','en','una'], t))) AS DOUBLE) AS es_s,
        |    CAST(len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], t))) AS DOUBLE) AS de_s,
        |    CAST(len(list_filter(toks, t -> list_contains(['le','les','des','et','est','une','dans'], t))) AS DOUBLE) AS fr_s,
        |    CAST(length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS DOUBLE) /
        |      greatest(length(text), 1) AS zh_s
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN zh_s > 0.05 THEN 'zh'
        |       WHEN en_s >= greatest(es_s, de_s, fr_s) AND en_s > 0 THEN 'en'
        |       WHEN es_s >= greatest(de_s, fr_s) AND es_s > 0 THEN 'es'
        |       WHEN de_s >= fr_s AND de_s > 0 THEN 'de'
        |       WHEN fr_s > 0 THEN 'fr'
        |       ELSE 'und' END AS lang_pred
        |FROM sc ORDER BY doc_id, lang_pred""".stripMargin,
    // q_langid's CASE chain + the md5-nibble class decision replayed
    // per stratum (en 4/16 '4', es 8/16 '8', fr 12/16 'c', de 2/16
    // '2'; other strata kept in full)
    "q_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |                     w -> length(w) > 0) AS ts
        |  FROM documents),
        |tk AS (SELECT doc_id, source, unnest(ts) AS term FROM tok),
        |ref AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM tk WHERE source = 'src0' GROUP BY term),
        |den AS (SELECT CAST(SUM(c) AS BIGINT) + CAST(COUNT(*) AS BIGINT) + 1
        |               AS denom FROM ref),
        |lex AS (SELECT term,
        |               CAST(round(ln((c + 1) / denom), 4) AS DECIMAL(18,4)) AS lp
        |        FROM ref CROSS JOIN den),
        |unk AS (SELECT CAST(round(ln(1.0 / denom), 4) AS DECIMAL(18,4)) AS unk_lp
        |        FROM den),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tk GROUP BY doc_id, term),
        |s AS (SELECT tf.doc_id,
        |             CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |             CAST(coalesce(SUM(tf) FILTER (WHERE lex.lp IS NULL), 0)
        |                  AS BIGINT) AS oov_tokens,
        |             SUM(CAST(tf AS DECIMAL(19,0)) * coalesce(lex.lp, unk_lp))
        |               AS sum_lp
        |      FROM tf LEFT JOIN lex USING (term) CROSS JOIN unk
        |      GROUP BY tf.doc_id)
        |SELECT d.doc_id,
        |       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(s.oov_tokens, 0) AS BIGINT) AS oov_tokens,
        |       CAST(CAST(coalesce(s.sum_lp, 0) AS DECIMAL(18,4)) AS VARCHAR)
        |         AS sum_lp,
        |       CASE WHEN coalesce(s.n_tokens, 0) > 0
        |            THEN -CAST(CAST(s.sum_lp AS DECIMAL(18,4)) AS DOUBLE)
        |                 / s.n_tokens
        |            ELSE 0.0 END AS xent
        |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id, n_tokens, oov_tokens, sum_lp, xent""".stripMargin,
    "q_shard_corpus" ->
      """WITH k AS (
        |  SELECT doc_id, md5('ep0:' || CAST(doc_id AS VARCHAR)) AS key
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, key,
        |         CAST((CAST('0x' || substr(key, 1, 4) AS BIGINT) * 8) // 65536
        |              AS INT) AS shard
        |  FROM k)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
        |            - 1 AS BIGINT) AS pos
        |FROM v
        |ORDER BY doc_id, shard, pos""".stripMargin,
    "q_token_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |              - CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_tokens
        |  FROM documents),
        |a AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS avail_tokens
        |      FROM t GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 4 AS budget FROM t),
        |r AS (
        |  SELECT source, avail_tokens,
        |    CAST(CASE WHEN w = 0 OR avail_tokens <= 0 THEN 0
        |         ELSE least(16, (16 * w * budget) // (11 * avail_tokens))
        |         END AS INT) AS rate16
        |  FROM (SELECT source, avail_tokens,
        |          CASE source WHEN 'src0' THEN 1 WHEN 'src1' THEN 3
        |               WHEN 'src3' THEN 2 WHEN 'src5' THEN 4
        |               WHEN 'src9' THEN 1 ELSE 0 END AS w
        |        FROM a), tot)
        |SELECT t.doc_id, t.source, t.n_tokens, r.avail_tokens, r.rate16,
        |       CAST((strpos('0123456789abcdef',
        |             substr(md5(t.source || ':' || CAST(t.doc_id AS VARCHAR)), 1, 1)) - 1)
        |            < r.rate16 AS INT) AS keep
        |FROM t JOIN r USING (source)
        |ORDER BY doc_id, source, n_tokens, avail_tokens, rate16, keep""".stripMargin,
    "q_stratified_sample" ->
      """WITH t AS (
        |  SELECT doc_id, text, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','is','with','for'], t))) AS DOUBLE) AS en_s,
        |    CAST(len(list_filter(toks, t -> list_contains(['el','la','los','las','de','que','y','en','una'], t))) AS DOUBLE) AS es_s,
        |    CAST(len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], t))) AS DOUBLE) AS de_s,
        |    CAST(len(list_filter(toks, t -> list_contains(['le','les','des','et','est','une','dans'], t))) AS DOUBLE) AS fr_s,
        |    CAST(length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS DOUBLE) /
        |      greatest(length(text), 1) AS zh_s
        |  FROM t
        |), lp AS (
        |  SELECT doc_id,
        |    CASE WHEN zh_s > 0.05 THEN 'zh'
        |         WHEN en_s >= greatest(es_s, de_s, fr_s) AND en_s > 0 THEN 'en'
        |         WHEN es_s >= greatest(de_s, fr_s) AND es_s > 0 THEN 'es'
        |         WHEN de_s >= fr_s AND de_s > 0 THEN 'de'
        |         WHEN fr_s > 0 THEN 'fr'
        |         ELSE 'und' END AS lang_pred
        |  FROM sc)
        |SELECT doc_id, lang_pred FROM lp
        |WHERE CASE lang_pred
        |  WHEN 'de' THEN substr(md5(lang_pred || ':' || CAST(doc_id AS VARCHAR)), 1, 1) < '2'
        |  WHEN 'en' THEN substr(md5(lang_pred || ':' || CAST(doc_id AS VARCHAR)), 1, 1) < '4'
        |  WHEN 'es' THEN substr(md5(lang_pred || ':' || CAST(doc_id AS VARCHAR)), 1, 1) < '8'
        |  WHEN 'fr' THEN substr(md5(lang_pred || ':' || CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
        |  ELSE true END
        |ORDER BY doc_id, lang_pred""".stripMargin,
    // the greedy-packing recurrence as a recursive CTE: the closure
    // step advances every shard one rank per iteration. Both
    // pre-CTEs are MATERIALIZED — the recursive term re-evaluates
    // plain CTEs every iteration (CLAUDE.md invariant)
    "q_pack_sequences" ->
      """WITH RECURSIVE d AS MATERIALIZED (
        |  SELECT CAST(strpos('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) AS shard,
        |         doc_id,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |              - CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS BIGINT) AS nt
        |  FROM documents),
        |r AS MATERIALIZED (
        |  SELECT shard, doc_id, nt,
        |         CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS rk
        |  FROM d),
        |step AS (
        |  SELECT shard, rk, doc_id, nt, CAST(0 AS BIGINT) AS bin_seq, nt AS fill
        |  FROM r WHERE rk = 1
        |  UNION ALL
        |  SELECT r.shard, r.rk, r.doc_id, r.nt,
        |         CASE WHEN s.fill + r.nt > 512 THEN s.bin_seq + 1 ELSE s.bin_seq END,
        |         CASE WHEN s.fill + r.nt > 512 THEN r.nt ELSE s.fill + r.nt END
        |  FROM step s JOIN r ON r.shard = s.shard AND r.rk = s.rk + 1)
        |SELECT shard, doc_id, nt AS n_tokens, bin_seq
        |FROM step
        |ORDER BY shard, doc_id, n_tokens, bin_seq""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN list_distinct(
        |    [array_to_string(toks[i+1:i+3], ' ')
        |     for i in range(0, greatest(len(toks)-3, 0)+1)])
        |    ELSE [] END AS s
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |        FROM documents)
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |             len(list_distinct(list_concat(a.s, b.s))), 6) + 0.0 AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE a.doc_id < 30 AND b.doc_id < 30
        |ORDER BY doc_a, doc_b, jaccard""".stripMargin,
    "q_knn_cosine" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |s AS (
        |  SELECT q.q_id, c.vec_id,
        |         list_cosine_similarity(c.e, q.qe) AS cs
        |  FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id),
        |r AS (
        |  SELECT q_id, vec_id, cs,
        |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rank
        |  FROM s)
        |SELECT q_id, CAST(rank AS INT) AS rank, vec_id, round(cs, 6) + 0.0 AS cos
        |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "q_embed_norm" ->
      """SELECT vec_id,
        |       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) + 0.0 AS nrm
        |FROM embeddings ORDER BY vec_id, nrm""".stripMargin,
    "q_minhash_lsh" -> minhashLshOracle,
    // incremental index ≡ one-shot pipeline: same oracle, verbatim —
    // the strongest statement batch maintenance can make
    "q_dedup_incremental" -> minhashLshOracle,
    "q_dedup_compacted" -> minhashLshOracle,
    "q_streaming_dedup" -> minhashLshOracle,
    // MATERIALIZED is load-bearing on cand/pr/e: DuckDB inlines plain
    // CTEs per reference, and inside WITH RECURSIVE the closure step
    // would otherwise re-evaluate the candidate generation every
    // iteration (and run it single-threaded — measured 15 min at
    // sf0.1 for the brute-force variant vs seconds here)
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $dedupClusterCtes
         |SELECT doc_id, cluster_id FROM cl
         |ORDER BY doc_id, cluster_id""".stripMargin,
    // clusters + composite quality + first_value window — the same
    // ranking key the Spark side quantizes (round 6) before ordering
    "q_dedup_select" ->
      s"""WITH RECURSIVE $dedupClusterCtes,
         |qt AS (
         |  SELECT doc_id, text,
         |         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
         |  FROM documents),
         |qual AS (
         |  SELECT doc_id, round(
         |    least((CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) /
         |           greatest(length(text), 1)) / 0.7::DOUBLE, 1.0::DOUBLE) *
         |    least((CAST(len(list_filter(toks, t -> list_contains($stopList, t))) AS DOUBLE) /
         |           greatest(CAST(len(toks) AS DOUBLE), 1.0)) / 0.2::DOUBLE, 1.0::DOUBLE) *
         |    CASE WHEN (CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) /
         |               greatest(CAST(len(toks) AS DOUBLE), 1.0))
         |              BETWEEN 3.0::DOUBLE AND 10.0::DOUBLE
         |         THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END, 6) + 0.0 AS q
         |  FROM qt),
         |sel AS (
         |  SELECT cl.doc_id AS doc_id, cl.cluster_id AS cluster_id, qual.q AS quality,
         |         first_value(cl.doc_id) OVER (
         |           PARTITION BY cl.cluster_id ORDER BY qual.q DESC, cl.doc_id
         |         ) AS representative_id
         |  FROM cl JOIN qual ON qual.doc_id = cl.doc_id)
         |SELECT doc_id, cluster_id, quality, representative_id,
         |       CAST(CASE WHEN doc_id = representative_id THEN 1 ELSE 0 END AS INT) AS keep
         |FROM sel
         |ORDER BY doc_id, cluster_id, quality, representative_id, keep""".stripMargin,
    "q_fingerprint" ->
      s"""WITH ${shCte(5)}
         |SELECT doc_id,
         |       array_to_string(list_sort([md5(x) for x in s])[1:8], ',') AS fp
         |FROM sh ORDER BY doc_id, fp""".stripMargin,
    // Replays the portable simhash bit-for-bit: per-token fingerprint =
    // first 16 hex chars of md5 (nibble-major bits via strpos over the
    // hex alphabet), tf-weighted bit majorities, 4×16-bit pigeonhole
    // with the occupancy cap, exact hamming ≤ 3. Built chunk-wise
    // (16-bit ints) so no 64-bit sign-bit gymnastics are needed —
    // hamming(a,b) = Σ_chunks popcount(xor) is the same number as the
    // Spark side's single 64-bit popcount.
    "q_simhash_neardups" ->
      """WITH th AS (
        |  SELECT doc_id,
        |         [substr(md5(t), 1, 16)
        |          for t in regexp_split_to_array(lower(text), '\s+')] AS th
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, [
        |    CAST(list_sum([
        |      CASE WHEN 2 * len(list_filter(th, h ->
        |          ((strpos('0123456789abcdef', substr(h, ((c*16+j) // 4) + 1, 1)) - 1)
        |            & (1 << (3 - ((c*16+j) % 4)))) > 0)) > len(th)
        |        THEN (1::BIGINT << j) ELSE 0 END
        |      for j in generate_series(0, 15)]) AS INT)
        |    for c in generate_series(0, 3)] AS cv
        |  FROM th),
        |chunks AS (
        |  SELECT doc_id, cv, CAST(c AS INT) AS chunk, cv[CAST(c AS INT) + 1] AS cval
        |  FROM sh, range(0, 4) t(c)),
        |capped AS (
        |  SELECT * FROM chunks
        |  QUALIFY COUNT(*) OVER (PARTITION BY chunk, cval) <= 1000)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.cv[1], b.cv[1])) + bit_count(xor(a.cv[2], b.cv[2])) +
        |            bit_count(xor(a.cv[3], b.cv[3])) + bit_count(xor(a.cv[4], b.cv[4])) AS INT) AS hamming
        |FROM capped a JOIN capped b
        |  ON a.chunk = b.chunk AND a.cval = b.cval AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.cv[1], b.cv[1])) + bit_count(xor(a.cv[2], b.cv[2])) +
        |      bit_count(xor(a.cv[3], b.cv[3])) + bit_count(xor(a.cv[4], b.cv[4])) <= 3
        |ORDER BY doc_a, doc_b, hamming""".stripMargin,
    "q_cosine_neardups" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |planted AS (
        |  SELECT vec_id + 10000 AS vec_id,
        |         list_concat([CAST(CAST(emb[1] * 1.25 AS FLOAT) AS DOUBLE)], emb[2:]) AS emb
        |  FROM base WHERE vec_id < 20),
        |e AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(a.emb, b.emb), 6) + 0.0 AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.9
        |ORDER BY id_a, id_b, cos""".stripMargin,
    "q_embed_clusters" ->
      """WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |planted AS (
        |  SELECT vec_id + 10000 AS vec_id,
        |         list_concat([CAST(CAST(emb[1] * 1.25 AS FLOAT) AS DOUBLE)], emb[2:]) AS emb
        |  FROM base WHERE vec_id < 20),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |p AS MATERIALIZED (SELECT a.vec_id AS s, b.vec_id AS d
        |      FROM u a JOIN u b ON a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.emb, b.emb) >= 0.9),
        |e AS MATERIALIZED (SELECT s, d FROM p UNION SELECT d, s FROM p),
        |reach(s, d) AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s)
        |SELECT s AS vec_id, least(s, min(d)) AS cluster_id
        |FROM reach GROUP BY s
        |ORDER BY vec_id, cluster_id""".stripMargin,
    "q_ann_ivf" -> ivfOracle,
    // incremental index ≡ one-shot: the oracle IS q_ann_ivf's (the
    // accumulated assignment rows are a pure per-vector function of
    // (embedding, frozen centroids), so the replay is unchanged)
    "q_ann_incremental" -> ivfOracle,
    "q_streaming_ann" -> ivfOracle,
    "q_ann_lsh" -> {
      val (bits, tables, dim) = (8, 6, 64)
      val cb = (0 until tables).map(t =>
        s"SELECT vec_id, $t AS tbl, ${bucketSql("e", t, bits, dim)} AS bucket FROM c")
        .mkString("\nUNION ALL\n")
      val qb = (0 until tables).map(t =>
        s"SELECT q_id, $t AS tbl, ${bucketSql("qe", t, bits, dim)} AS bucket FROM q")
        .mkString("\nUNION ALL\n")
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5),
         |cb AS ($cb),
         |qb AS ($qb),
         |cand AS (
         |  SELECT DISTINCT q_id, vec_id
         |  FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket
         |  WHERE vec_id <> q_id),
         |sc AS (
         |  SELECT cand.q_id, cand.vec_id, list_cosine_similarity(c.e, q.qe) AS cs
         |  FROM cand JOIN c USING (vec_id) JOIN q USING (q_id)),
         |r AS (
         |  SELECT q_id, vec_id, cs,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rank
         |  FROM sc)
         |SELECT q_id, CAST(rank AS INT) AS rank, vec_id, round(cs, 6) + 0.0 AS cos
         |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },
    // repetitionStats mirror: raw (non-distinct) 2-grams, counts via
    // the natural unnest + GROUP BY + MAX formulation (the engine's
    // sorted-array run-length fold is an independent implementation);
    // fractions are single int→double divisions — byte-exact, no
    // rounding needed
    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
        |         CASE WHEN len(toks) >= 2 THEN
        |           [array_to_string(toks[i+1:i+2], ' ')
        |            for i in range(0, greatest(len(toks)-2, 0)+1)]
        |         ELSE [] END AS gs
        |  FROM t),
        |x AS (
        |  SELECT doc_id, n_words, CAST(len(gs) AS BIGINT) AS n_grams,
        |         CAST(len(list_distinct(gs)) AS BIGINT) AS uniq_grams, gs
        |  FROM g),
        |c AS (
        |  SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS top_n
        |  FROM (SELECT doc_id, gram, COUNT(*) AS cnt
        |        FROM x, unnest(gs) u(gram) GROUP BY doc_id, gram)
        |  GROUP BY doc_id)
        |SELECT x.doc_id, n_words, n_grams, uniq_grams,
        |       CAST(COALESCE(top_n, 0) AS BIGINT) AS top_gram_n,
        |       CASE WHEN n_grams > 0
        |            THEN CAST(n_grams - uniq_grams AS DOUBLE) / n_grams
        |            ELSE 0.0 END AS dup_gram_frac,
        |       CASE WHEN n_grams > 0
        |            THEN CAST(COALESCE(top_n, 0) AS DOUBLE) / n_grams
        |            ELSE 0.0 END AS top_gram_frac
        |FROM x LEFT JOIN c USING (doc_id)
        |ORDER BY doc_id, n_words, n_grams, uniq_grams, top_gram_n,
        |         dup_gram_frac, top_gram_frac""".stripMargin,
    // contamination mirror: distinct 5-gram shingles (shCte), bench =
    // doc_id % 97 = 0, per-doc hit counts via join against the
    // distinct bench-gram set
    "q_decontaminate" ->
      s"""WITH ${shCte(5)},
         |bench AS (
         |  SELECT DISTINCT gram FROM sh, unnest(s) u(gram)
         |  WHERE doc_id % 97 = 0),
         |hits AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hit_grams
         |  FROM (SELECT doc_id, gram FROM sh, unnest(s) u(gram)) dg
         |  JOIN bench USING (gram) GROUP BY doc_id)
         |SELECT sh.doc_id, CAST(len(s) AS BIGINT) AS n_grams,
         |       CAST(COALESCE(hit_grams, 0) AS BIGINT) AS hit_grams,
         |       CASE WHEN len(s) > 0
         |            THEN CAST(COALESCE(hit_grams, 0) AS DOUBLE) / len(s)
         |            ELSE 0.0 END AS contam_frac
         |FROM sh LEFT JOIN hits USING (doc_id)
         |ORDER BY doc_id, n_grams, hit_grams, contam_frac""".stripMargin,
    // corpusMix mirror: the rollup levels as explicit UNION ALL with
    // literal gid values; SUM(BIGINT) is HUGEINT in DuckDB → CAST
    // back to BIGINT (the r01 dtype invariant); the token-count CASE
    // mirrors TextAnalysis.tokenCount's empty-text correction
    "q_corpus_mix" ->
      // a genuinely-NULL source/lang VALUE groups as its own row and
      // surfaces as '<null>' (mirror of the engine's grouping()-based
      // labels — coalescing NULL values to '<all>' would collide with
      // the rollup margins)
      """WITH t AS (
        |  SELECT COALESCE(source, '<null>') AS source,
        |         COALESCE(lang, '<null>') AS lang, n_chars,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |              - CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS BIGINT) AS ntok
        |  FROM documents),
        |lv AS (
        |  SELECT source, lang, 0 AS gid, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |         CAST(SUM(ntok) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY source, lang
        |  UNION ALL
        |  SELECT source, '<all>', 1, CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(n_chars) AS BIGINT), CAST(SUM(ntok) AS BIGINT)
        |  FROM t GROUP BY source
        |  UNION ALL
        |  SELECT '<all>', '<all>', 3, CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(n_chars) AS BIGINT), CAST(SUM(ntok) AS BIGINT)
        |  FROM t)
        |SELECT source, lang, CAST(gid AS INT) AS gid, n_docs, n_chars,
        |       n_tokens, CAST(n_tokens AS DOUBLE) / n_docs AS mean_tokens
        |FROM lv
        |ORDER BY source, lang, gid, n_docs, n_chars, n_tokens, mean_tokens""".stripMargin,
    // distinctiveTerms mirror: identical tokenization, tf/df exact
    // counts, one double division, row_number with the same
    // (score DESC, term) tiebreak
    "q_keywords" ->
      """WITH tk AS (
        |  SELECT doc_id, term
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |        FROM documents), unnest(toks) u(term)
        |  WHERE length(term) > 0),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tk GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |       FROM tf GROUP BY term),
        |r AS (
        |  SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / df AS score,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY CAST(tf AS DOUBLE) / df DESC, term) AS rank
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, score
        |FROM r WHERE rank <= 3
        |ORDER BY doc_id, rank, term, tf, df, score""".stripMargin,
    // PII: the oracle rebuilds the planted text verbatim, counts with
    // regexp_extract_all and redacts with the same fixed class order —
    // the patterns live in the portable Java-regex ∩ RE2 subset
    "q_pii" -> {
      val aug =
        """SELECT doc_id, text ||
          |  CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
          |  CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 or 555.987.6543' ELSE '' END ||
          |  CASE WHEN doc_id % 13 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.25 up 1234.5.6.7890' ELSE '' END ||
          |  CASE WHEN doc_id % 17 = 0 THEN ' ssn 123-45-6789.' ELSE '' END AS text
          |FROM documents""".stripMargin
      val counts = graft.operators.TextAnalysis.piiClasses.map { case (n, pat, _) =>
        s"  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$n,"
      }.mkString("\n")
      val redacted = graft.operators.TextAnalysis.piiClasses.foldLeft("text") {
        case (e, (_, pat, tok)) => s"regexp_replace($e, '$pat', '$tok', 'g')"
      }
      s"""WITH aug AS ($aug)
         |SELECT doc_id,
         |$counts
         |  $redacted AS redacted
         |FROM aug
         |ORDER BY doc_id, n_email, n_ip, n_phone, n_id, redacted""".stripMargin
    },
    // substring dedup: grams → md5 → winnowing window-minima →
    // capped fingerprint self-join → gram-position join → diagonal
    // islands → max run + (k−1)
    "q_substring_dups" -> substringDupsOracle,
    // incremental fingerprint index ≡ one-shot by construction
    // (candidates are a pure function of the cumulative row set) —
    // the oracle IS q_substring_dups' oracle; likewise the streamed
    // micro-batch appends
    "q_substring_dups_incremental" -> substringDupsOracle,
    "q_streaming_substring_dups" -> substringDupsOracle,
    // line-level dedup: independent unnest-with-index + doc-frequency
    // GROUP BY + ordered string_agg reassembly over the same planted
    // multiline construction
    "q_line_dedup" -> lineDedupOracle,
    // incremental index ≡ one-shot by construction (doc-disjoint
    // batch partials sum to the global df) — the oracle IS
    // q_line_dedup's oracle, same discipline as q_dedup_incremental
    "q_line_dedup_incremental" -> lineDedupOracle,
    "q_streaming_line_dedup" -> lineDedupOracle,
    // C4 rule filter: list_filter replays the line rules, regexp_replace
    // counts terminal punctuation on the cleaned text, and the keep flag
    // replays the document rules — all over the same planted multiline
    // construction (INT casts pin DuckDB's BIGINT len/length to Spark's
    // int size()/length())
    "q_c4_filter" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10),
        |      text,
        |      'This line ends with terminal punctuation.',
        |      'Exactly three words.',
        |      'no terminal punctuation here',
        |      'Too short.',
        |      CASE WHEN doc_id % 2 = 0 THEN 'One two three. Four five six. Seven eight nine. Ten eleven twelve. Final sentence here.' END,
        |      CASE WHEN doc_id % 3 = 0 THEN 'Please enable javascript to continue.' END,
        |      CASE WHEN doc_id % 31 = 0 THEN 'Lorem ipsum dolor sit amet.' END,
        |      CASE WHEN doc_id % 41 = 0 THEN 'Config sample { key: value } here.' END) AS text
        |  FROM documents),
        |lx AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM aug),
        |k AS (
        |  SELECT doc_id, ls,
        |         list_filter(ls, ln ->
        |           regexp_matches(trim(ln), '[.!?"]$')
        |           AND len(regexp_split_to_array(trim(ln), '\s+')) >= 3
        |           AND NOT contains(lower(ln), 'javascript')) AS kl
        |  FROM lx),
        |c AS (
        |  SELECT doc_id,
        |         CAST(len(kl) AS INT) AS n_lines_kept,
        |         CAST(len(ls) - len(kl) AS INT) AS n_lines_dropped,
        |         array_to_string(kl, chr(10)) AS clean_text
        |  FROM k),
        |f AS (
        |  SELECT doc_id, n_lines_kept, n_lines_dropped,
        |         CAST(length(regexp_replace(clean_text, '[^.!?]', '', 'g')) AS INT) AS n_sentences,
        |         clean_text
        |  FROM c)
        |SELECT doc_id, n_lines_kept, n_lines_dropped, n_sentences,
        |       CAST((n_sentences >= 5
        |             AND NOT contains(lower(clean_text), 'lorem ipsum')
        |             AND NOT contains(clean_text, '{')) AS INT) AS keep,
        |       clean_text
        |FROM f
        |ORDER BY doc_id, n_lines_kept, n_lines_dropped, n_sentences, keep, clean_text""".stripMargin,
    // Gopher rules: token/line lists via list_filter, symbol count via
    // regexp_replace + non-overlapping '...' runs (exact multiple of 3,
    // so // 3 is exact), every threshold cross-multiplied in integers —
    // no floats anywhere. INT casts pin DuckDB's BIGINT len/length to
    // Spark's int size()/length().
    "q_gopher_filter" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10),
        |      text,
        |      CASE WHEN doc_id % 2 = 0 THEN 'the results have to be consistent with that and of course.' END,
        |      CASE WHEN doc_id % 7 = 0 THEN rtrim(repeat('- bullet item here' || chr(10), 9), chr(10)) END,
        |      CASE WHEN doc_id % 11 = 0 THEN '#money #tags #crypto #spam #promo #ads' END,
        |      CASE WHEN doc_id % 13 = 0 THEN 'and the thought just trails off...' END,
        |      CASE WHEN doc_id % 17 = 0 THEN '12345 67890 10101 20202 30303 40404 50505' END,
        |      CASE WHEN doc_id % 19 = 0 THEN 'supercalifragilisticexpialidocious antidisestablishmentarianism floccinaucinihilipilification' END) AS text
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 0) AS toks,
        |    str_split(text, chr(10)) AS ls
        |  FROM aug),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS INT) AS n_words,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS INT) AS n_word_chars,
        |    CAST(length(regexp_replace(text, '[^#]', '', 'g'))
        |         + (length(text) - length(replace(text, '...', ''))) // 3 AS INT) AS n_symbols,
        |    CAST(len(ls) AS INT) AS n_lines,
        |    CAST(len(list_filter(ls, ln -> regexp_matches(ln, '^\s*[-*] '))) AS INT) AS n_bullet_lines,
        |    CAST(len(list_filter(ls, ln -> regexp_matches(ln, '\.\.\.\s*$'))) AS INT) AS n_ellipsis_lines,
        |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS INT) AS n_alpha_words,
        |    CAST((CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'the') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'be') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'to') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'of') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'and') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'that') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'have') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'with') THEN 1 ELSE 0 END) AS INT) AS n_req_stops
        |  FROM t)
        |SELECT doc_id, n_words, n_word_chars, n_symbols, n_lines,
        |       n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_req_stops,
        |       CAST((n_words BETWEEN 50 AND 100000
        |             AND n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
        |             AND n_symbols * 10 < n_words
        |             AND n_bullet_lines * 10 < n_lines * 9
        |             AND n_ellipsis_lines * 10 < n_lines * 3
        |             AND n_alpha_words * 10 >= n_words * 8
        |             AND n_req_stops >= 2) AS INT) AS keep
        |FROM c
        |ORDER BY doc_id, n_words, n_word_chars, n_symbols, n_lines,
        |         n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_req_stops, keep""".stripMargin,
    // URL/domain blocklist filter: regexp_extract_all + host lowering
    // + dot-suffix blocklist rules replayed verbatim; hosts are ASCII
    // after lowering so list_sort matches Spark's binary array_sort;
    // coalesce because DuckDB array_to_string(empty list) is NULL
    // where Spark's array_join is ''
    "q_url_filter" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    concat_ws(' ',
        |      text,
        |      CASE WHEN doc_id % 5 = 0 THEN 'see https://spam.example.com/path now' END,
        |      CASE WHEN doc_id % 9 = 0 THEN 'via HTTPS://Ads.Tracker.NET/pixel?id=1' END,
        |      CASE WHEN doc_id % 4 = 0 THEN 'docs at http://docs.example.org/guide' END,
        |      CASE WHEN doc_id % 20 = 0 THEN 'again https://spam.example.com/other' END,
        |      'malformed http:// gap stays out') AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '(?i)https?://[a-z0-9.-]+') AS urls
        |  FROM aug),
        |h AS (
        |  SELECT doc_id, urls,
        |    list_distinct(list_transform(urls,
        |      x -> lower(regexp_replace(x, '(?i)^https?://', '')))) AS hosts
        |  FROM u),
        |b AS (
        |  SELECT doc_id,
        |    CAST(len(urls) AS INT) AS n_urls,
        |    coalesce(array_to_string(list_sort(hosts), ','), '') AS domains,
        |    CAST(len(list_filter(hosts, d ->
        |      d = 'spam.example.com' OR ends_with(d, '.spam.example.com')
        |      OR d = 'tracker.net' OR ends_with(d, '.tracker.net'))) AS INT) AS n_blocked
        |  FROM h)
        |SELECT doc_id, n_urls, domains, n_blocked,
        |       CAST(n_blocked = 0 AS INT) AS keep
        |FROM b
        |ORDER BY doc_id, n_urls, domains, n_blocked, keep""".stripMargin,
    // end-to-end curation pipeline: the composed stage-fragment replay
    "q_curate" -> curateOracle,
  )
}
