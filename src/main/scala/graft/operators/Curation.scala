package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed training-data recipe that
  * every stage operator in this engine exists to serve, as ONE call —
  * the pipeline a real pre-training run executes over the raw corpus.
  *
  * Stage order (the published curation recipes' canonical order —
  * C4 / Raffel et al. 2020 §2.2, Gopher / Rae et al. 2021 A1.1.2,
  * decontamination last as in GPT-3 appendix C):
  *
  *   1. PII redaction ([[TextAnalysis.redactPii]]) — scan-local.
  *   2. Cross-document line-level boilerplate removal
  *      ([[Dedup.lineDedup]]) — the one corpus-global text rewrite.
  *   3. Quality flags over the deduped text, all scan-local in one
  *      projection pass: URL blocklist (on the pre-clean text, so
  *      URL-bearing lines count even when the C4 line rule would drop
  *      them), C4 line+document rules (producing the cleaned text),
  *      Gopher document statistics (on the cleaned text — the
  *      candidate training payload).
  *   4. Exact dedup among flag survivors: keep = min doc_id per
  *      identical cleaned text (sha256 groups), ONE window pass over
  *      the full corpus — survivorship rides a conditional min, so no
  *      separate filtered branch is planned.
  *   5. Benchmark decontamination over dedup survivors only: distinct
  *      word n-gram overlap vs the eval set, SCAN-LOCAL via the
  *      [[graft.functions.GramHits]] codegen kernel (bench grams as a
  *      reference HashSet), thresholded in INTEGER arithmetic
  *      (hit·1000 ≤ n·contamPermille — no float ratio, bit-portable).
  *      Counts are identical to [[TextAnalysis.contamination]]'s
  *      broadcast-join form by construction.
  *
  * Output: one AUDIT row per input document — flags, not drops, the
  * [[TextAnalysis.c4Filter]] discipline, so funnel counts, ablations
  * and the final corpus are all one `where` away:
  * (doc_id, url_keep, c4_keep, gopher_keep, dedup_keep, n_grams,
  * hit_grams, contam_keep, keep, text). Stage flags are NULL when the
  * document never reached that stage (dedup for flag-failures,
  * contamination for dedup losers); `text` is the cleaned
  * (redacted + line-deduped + C4-line-filtered) text for EVERY doc;
  * `keep` = 1 iff every stage passed. Training corpus =
  * `where(keep = 1).select(doc_id, text)`.
  *
  * 100 TB shape — ONE LINEAR PLAN. Raw text crosses exactly three
  * exchanges, each irreducible for its stage: the line-hash frequency
  * agg shuffles hashes only; reassembly shuffles text on doc_id; the
  * dedup window shuffles on sha256(clean). Everything else — redaction,
  * every quality flag, and the decontamination counts (bench grams as
  * a codegen reference set) — is projection work riding those stages,
  * so the corpus is read once and no subtree is evaluated twice.
  */
object Curation {

  def curate(docs: DataFrame, bench: DataFrame,
      blocklist: Seq[String] = Nil,
      maxLineDocFreq: Int = 2,
      minLineWords: Int = 3, minSentences: Int = 5,
      minWords: Int = 50, maxWords: Int = 100000,
      contamN: Int = 5, contamPermille: Int = 50): DataFrame = {
    require(contamPermille >= 0 && contamPermille <= 1000,
      "contamPermille is a fraction of 1000")

    // stages 1–2: redact, then corpus-wide boilerplate-line removal
    val lined = Dedup.lineDedup(TextAnalysis.redactPii(docs), maxLineDocFreq)

    // stage 3: scan-local flags. __clean is multi-referenced (c4 keep,
    // gopher stats, output text), which blocks CollapseProject from
    // re-inlining the filter+join expression per consumer (the staged-
    // HOF discipline, see Dedup.minhashSignatures).
    val gstats = TextAnalysis.gopherStats(col("__clean"))
    val urls = regexp_extract_all(col("text"),
      lit(TextAnalysis.urlPattern), lit(0))
    val flagged = lined
      .withColumn("__clean",
        array_join(TextAnalysis.c4KeptLines(col("text"), minLineWords), "\n"))
      .withColumn("url_keep",
        (TextAnalysis.blockedCount(TextAnalysis.urlHostsOf(urls),
          blocklist) === 0).cast("int"))
      .withColumn("c4_keep", TextAnalysis.c4DocKeep(col("__clean"), minSentences))
      .withColumns(gstats.map { case (n, e) => s"__g_$n" -> e }.toMap)
      .withColumn("gopher_keep",
        TextAnalysis.gopherRule(n => col(s"__g_$n"), minWords, maxWords))
      .drop(gstats.map { case (n, _) => s"__g_$n" }: _*)

    // stage 4: exact dedup among flag survivors — one window over the
    // whole corpus; min(when(surv, doc_id)) ignores non-survivors so
    // no second branch/filter of the frame is needed
    val surv = col("url_keep") === 1 && col("c4_keep") === 1 &&
      col("gopher_keep") === 1
    val w = Window.partitionBy(sha2(col("__clean"), 256))
    val base = flagged.withColumn("dedup_keep",
      when(surv,
        (col("doc_id") === min(when(surv, col("doc_id"))).over(w)).cast("int")))

    // stage 5: decontamination over dedup survivors — SCAN-LOCAL: the
    // bench gram set (small by contract — eval sets are MBs while the
    // corpus is TBs) is collected once and rides whole-stage codegen
    // as a reference HashSet (functions.GramHits, the LshBuckets/
    // CentTopK discipline), so this stage adds ZERO exchanges and the
    // whole audit is ONE linear plan. The alternative — the broadcast-
    // join contamination() + a join back on doc_id — plans a full
    // DUPLICATE of the cleaning pipeline (per-consumer column pruning
    // defeats ReuseExchange), i.e. it re-reads and re-shuffles the
    // corpus a second time. Same distinct-gram overlap counts by
    // construction (shinglesOf is distinct; the set probe counts
    // members).
    val benchGrams: Array[String] = Dedup.withShingles(bench, contamN)
      .select(explode(col("sh")).as("gram")).distinct()
      .collect().map(_.getString(0))
    require(benchGrams.length <= (4 << 20),
      s"bench gram set has ${benchGrams.length} entries — eval sets are " +
        "small by contract; a corpus-sized right side is a dedup problem")

    // __toks is multi-referenced inside gramsOf, __sh by both counts —
    // the double-reference barrier that keeps CollapseProject from
    // re-inlining the shingle pipeline per consumer
    base
      .withColumn("__toks",
        when(col("dedup_keep") === 1, split(lower(col("__clean")), "\\s+")))
      .withColumn("__sh", Dedup.shinglesOf(col("__toks"), contamN))
      .withColumn("n_grams",
        when(col("dedup_keep") === 1, size(col("__sh")).cast("long")))
      .withColumn("hit_grams", when(col("dedup_keep") === 1,
        graft.functions.GramHits.gram_hits(col("__sh"), benchGrams.toSeq)
          .cast("long")))
      .withColumn("contam_keep", when(col("n_grams").isNotNull,
        (col("hit_grams") * 1000 <= col("n_grams") * contamPermille)
          .cast("int")))
      // contam_keep = 1 implies every earlier stage passed
      .withColumn("keep", coalesce(when(col("contam_keep") === 1, lit(1)),
        lit(0)))
      .select(col("doc_id"), col("url_keep"), col("c4_keep"),
        col("gopher_keep"), col("dedup_keep"), col("n_grams"),
        col("hit_grams"), col("contam_keep"), col("keep"),
        col("__clean").as("text"))
  }
}
