package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.synth.DocGen

/** LLM-pipeline family at realistic cardinality (r3 verdict next-#2):
  * runMain graft.PipelineBench [nDocs] [nVecs] [cores].
  *
  * Stages the deterministic DocGen corpora to parquet once (untimed),
  * then times each pipeline end-to-end by writing its OUTPUT to
  * parquet (real work forced, counts read back untimed) and reports
  * the scale-evidence numbers the 100 TB story needs:
  *   - candidate-pairs vs all-pairs ratio (sub-quadratic or bust),
  *   - occupancy-cap hit-rates (buckets over cap, rows dropped),
  *   - the autoBits / autoStep values the adaptive sizing chose,
  *   - planted-dup recall (exact + near dups are ground truth),
  *   - wall time per pipeline at this cores level.
  * Run at two local[N] levels (fresh JVM each) for the N-vs-4N
  * scaling table in BENCH.md. */
object PipelineBench {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val nVecs = if (args.length > 1) args(1).toLong else 1000000L
    val cores = if (args.length > 2) args(2).toInt else 32
    // optional 4th arg: comma-separated subset (e.g. "ivf,kmeans") for
    // targeted re-measures after a change that touches only one family
    val only: String => Boolean =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else (_ => true)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warmup

    val docsDir = s"/tmp/graft_pipe_docs_$nDocs"
    val embsDir = s"/tmp/graft_pipe_embs_$nVecs"
    if (!new java.io.File(s"$docsDir/_SUCCESS").exists())
      DocGen.documents(spark, nDocs).write.mode("overwrite").parquet(docsDir)
    if (!new java.io.File(s"$embsDir/_SUCCESS").exists())
      DocGen.embeddings(spark, nVecs).write.mode("overwrite").parquet(embsDir)
    val docs = spark.read.parquet(docsDir)
    val embs = spark.read.parquet(embsDir)

    val out = scala.collection.mutable.ArrayBuffer[String]()
    def timedWrite(name: String, df: => DataFrame): Long = {
      val dir = s"/tmp/graft_pipe_out_${name}_$nDocs"
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(dir)
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(dir).count()
      out += s""""$name":{"sec":$sec,"out_rows":$rows}"""
      // Shuffle files live until their ShuffleDependency is GC'd
      // (ContextCleaner is GC-triggered); with a large mostly-idle
      // heap the JVM may never collect, so completed stages' spill
      // accumulates for the whole app — at 10M docs/vectors that
      // overran the sandbox /tmp quota twice (ENOSPC mid-cosine).
      // An explicit GC between stages lets the cleaner reclaim them;
      // untimed, so measurements are unaffected.
      System.gc()
      Thread.sleep(2000)
      rows
    }

    // ---- exact dedup (hash-agg on sha256) ------------------------------
    if (only("exact")) timedWrite("exact_dedup", Dedup.exact(docs))

    // ---- MinHash-LSH candidates + verification ratios ------------------
    val allPairs = nDocs.toDouble * (nDocs - 1) / 2
    if (only("minhash")) {
      val nCand = timedWrite("minhash_lsh",
        Dedup.minhashLsh(docs, k = 32, bands = 8, maxBucket = 1000))
      // occupancy-cap hit-rate (untimed diagnostics over the banded index)
      val occ = Dedup.bandedSignatures(docs, 32, 8, 3, portable = false)
        .groupBy("band", "bucket").count()
      val capStats = occ.agg(
        count(lit(1)).as("buckets"),
        sum(when(col("count") > 1000, 1).otherwise(0)).as("over_cap"),
        sum(when(col("count") > 1000, col("count")).otherwise(0)).as("rows_dropped"),
        max(col("count")).as("max_occ")).head()
      // planted-dup recall: every id in [0.8n, 0.9n) is an exact dup of
      // id-0.8n → the pair (id-0.8n, id) must be a candidate (band
      // signatures identical) unless one side sits in a capped bucket
      val u = nDocs * 8 / 10; val d = nDocs * 9 / 10
      val planted = spark.range(u, d)
        .select((col("id") - u).as("doc_a"), col("id").as("doc_b"))
        .where(col("doc_a") % 500 =!= 0) // boilerplate ids are their own class
      val found = spark.read.parquet(s"/tmp/graft_pipe_out_minhash_lsh_$nDocs")
        .join(planted, Seq("doc_a", "doc_b"), "left_semi").count()
      val nPlanted = planted.count()
      out += s""""minhash_stats":{"cand_ratio":${nCand / allPairs},"buckets":${capStats.getLong(0)},"over_cap":${capStats.getLong(1)},"rows_dropped":${capStats.getLong(2)},"max_occ":${capStats.getLong(3)},"planted_exact_pairs":$nPlanted,"planted_found":$found}"""
    }

    // ---- SimHash near-dups ---------------------------------------------
    if (only("simhash")) {
      val nSim = timedWrite("simhash_neardups",
        Dedup.simhashNearDups(docs, maxDist = 3, maxBucket = 2000))
      out += s""""simhash_stats":{"cand_ratio":${nSim / allPairs}}"""
    }

    // ---- cosine self-join (embedding near-dups, adaptive bits) ---------
    // targetOccupancy 8 (not the query-path default 32): a SELF-join's
    // candidate volume is tables·n·occupancy/2, so at 10⁶ vectors the
    // tighter buckets trade ~0.8% recall (miss = (1−0.955^17)^8, and
    // recall_proxy below MEASURES it) for 4× less shuffle — the same
    // dial a 100 TB run turns
    if (only("cosine")) {
      val bits = Similarity.autoBits(nVecs, targetOccupancy = 8)
      val nCos = timedWrite("cosine_selfjoin",
        Similarity.cosineSelfJoin(embs, 0.9, bits = bits, tables = 8, maxBucket = 10000))
      val allVecPairs = nVecs.toDouble * (nVecs - 1) / 2
      // ground truth: clusterSize=10 ⇒ every same-cluster pair is a true
      // near-dup (cos ≈ 0.99) ⇒ n/10 · 45 true pairs
      val truePairs = nVecs / 10 * 45
      out += s""""cosine_stats":{"auto_bits":$bits,"pair_ratio":${nCos / allVecPairs},"true_pairs":$truePairs,"recall_proxy":${nCos.toDouble / truePairs}}"""
    }

    // ---- IVF ANN (pivot + adaptive √n sizing) --------------------------
    if (only("ivf")) {
      val step = Similarity.autoStep(nVecs)
      timedWrite("ivf_topk",
        Similarity.ivfTopK(embs, embs.where(col("vec_id") < 100), 10,
          centroidStep = 0, nProbe = 8))
      out += s""""ivf_stats":{"auto_step":$step,"n_lists":${nVecs / step}}"""
    }

    // ---- repetition metrics (scan-local Gopher-style filters) ----------
    if (only("repetition")) timedWrite("repetition",
      graft.operators.TextAnalysis.repetitionStats(docs))

    // ---- distinctive terms (tf explode + df agg + top-k window) --------
    if (only("keywords")) timedWrite("keywords",
      graft.operators.TextAnalysis.distinctiveTerms(docs, 5))

    // ---- decontamination (broadcast bench-gram probe over the scan) ----
    // bench = 1/997 of the corpus (~1k docs) standing in for an eval set
    if (only("contamination")) timedWrite("contamination",
      graft.operators.TextAnalysis.contamination(docs,
        docs.where(col("doc_id") % 997 === 0)))
    // FIXED-size eval set (first 1000 docs regardless of corpus size):
    // the realistic deployment shape — eval sets don't grow with the
    // corpus — isolating the corpus-side scaling of the probe
    if (only("contamfixed")) timedWrite("contam_fixed",
      graft.operators.TextAnalysis.contamination(docs,
        docs.where(col("doc_id") < 1000)))

    // ---- corpus-filter passes (round-5 rule projections + line dedup) --
    // semantics are oracle-certified on planted fixtures; these rows
    // measure the SHAPE at volume — the rule filters must stay one
    // Scan→Project pass (no explode, no shuffle), line dedup must stay
    // two exchanges (line-hash agg + doc_id reassembly)
    if (only("pii")) timedWrite("pii_redact",
      graft.operators.TextAnalysis.redactPii(docs))
    if (only("c4")) timedWrite("c4_filter",
      graft.operators.TextAnalysis.c4Filter(docs))
    if (only("gopher")) timedWrite("gopher_filter",
      graft.operators.TextAnalysis.gopherFilter(docs))
    if (only("url")) timedWrite("url_filter",
      graft.operators.TextAnalysis.urlFilter(docs,
        blocklist = Seq("spam.example.com", "tracker.net")))
    if (only("linededup")) timedWrite("line_dedup",
      Dedup.lineDedup(docs, maxDocFreq = 2))

    // ---- end-to-end curation (the composed capstone) -------------------
    // all five stages as ONE linear plan: redact → line dedup → URL/C4/
    // Gopher flags → exact-dedup window → scan-local decontamination
    // (fixed 1000-doc eval set, the contam_fixed deployment shape).
    // The row exists to prove composition adds no exchange and no
    // re-read: wall ≈ line_dedup + the flag projections riding its
    // scans, NOT the sum of five separate corpus passes.
    if (only("curate")) timedWrite("curate",
      graft.operators.Curation.curate(docs,
        docs.where(col("doc_id") < 1000).select("doc_id", "text"),
        blocklist = Seq("spam.example.com")))

    // ---- k-means quantizer build (the learned-centroid path) -----------
    if (only("kmeans")) {
      val t0 = System.nanoTime()
      val kc = Similarity.kmeansCentroids(embs, centroidStep = 0, maxIter = 3).count()
      out += s""""kmeans_build":{"sec":${(System.nanoTime() - t0) / 1e9},"centroids":$kc}"""
    }

    println(s"""{"bench":"pipeline","n_docs":$nDocs,"n_vecs":$nVecs,"cores":$cores,${out.mkString(",")}}""")
    spark.stop()
  }
}
