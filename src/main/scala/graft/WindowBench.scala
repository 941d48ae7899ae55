package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{SeriesAlgebra, SeriesOps, Signals, TextAnalysis}
import graft.synth.DocGen

/** Two-cores-level scaling evidence for the window/join family
  * (round-4 operators): as-of join, bucketized range join,
  * sessionization, truncated EWMA, and sequence packing — the ops
  * whose cost is a per-key window sort or a metadata-only shuffle
  * rather than a tier aggregation, so their scaling behavior is NOT
  * implied by the cascade numbers (ScalingBench).
  *
  * Usage: runMain graft.WindowBench <cores> [nTurns] [mode]
  *   mode=materialize — stage all inputs to /tmp (separate JVM, so
  *     writeback never contaminates measured runs; run_scaling.sh
  *     protocol), then exit.
  *   mode=run (default) — 1 warmup + 3 measured runs of each op,
  *     forced via noop writes (never count(): Catalyst prunes
  *     projections under count), one JSON line out.
  *
  * Inputs (all deterministic, fixed partition count so every cores
  * level reads byte-identical files):
  *   pts  — per-turn latency points (key, ts, v), null first-turns
  *          dropped;
  *   refs — 10-minute per-key mean references (key, ts, rv) for the
  *          as-of probe;
  *   iv   — 300 s-gap sessions as (key, session_seq, t_start, t_end)
  *          intervals for the range join;
  *   docs — (doc_id, n_tokens) packing metadata (token counts
  *          precomputed at staging: the packing pass itself is the
  *          thing measured, and at 100 TB it would likewise run over
  *          an ingest-time length column, never re-tokenize).
  */
object WindowBench {

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nTurns = if (args.length > 1) args(1).toLong else 16000000L
    val mode = if (args.length > 2) args(2) else "run"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // one sorted file per bucket → bucketed scans report ordering
      // and the per-key windows run with zero exchange AND zero sort
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = s"/tmp/graft_wb_$nTurns"
    val ptsDir = s"$base/pts"; val refsDir = s"$base/refs"
    val ivDir = s"$base/iv"; val docsDir = s"$base/docs"
    val nDocs = math.max(nTurns / 8, 1000L)

    if (mode == "materialize") {
      val turnsDir = s"/tmp/graft_bench_turns_$nTurns"
      Bench.materializeTurns(spark, nTurns, turnsDir)
      val turns = spark.read.parquet(turnsDir)
      def stage(dir: String)(df: => DataFrame): Unit =
        if (!new java.io.File(s"$dir/_SUCCESS").exists())
          df.repartition(64).write.mode("overwrite").parquet(dir)
      stage(ptsDir)(
        Signals.latencyPoints(turns).where(col("v").isNotNull))
      val ntz = "timestamp_ntz" // match pts' parquet type for unionByName
      // exact integer div on epoch-µs (the rangeJoin bucket rule: a
      // double quotient within one ulp of an integer flips the bucket)
      stage(refsDir)(spark.read.parquet(ptsDir)
        .groupBy(col("key"),
          timestamp_micros(
            expr("unix_micros(cast(ts as timestamp)) div 600000000L") *
              600000000L).cast(ntz).as("ts"))
        .agg(avg(col("v")).as("rv")))
      stage(ivDir)(SeriesOps.sessions(spark.read.parquet(ptsDir), 300L)
        .select(col("key"), col("session_seq"),
          col("t_start").cast(ntz).as("t_start"),
          col("t_end").cast(ntz).as("t_end")))
      stage(docsDir)(DocGen.documents(spark, nDocs)
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens")))
      // the 100 TB layout: pts persisted bucketed(key) + sorted
      // (key, ts), ONE file per bucket — the per-key window family
      // then needs no exchange and no sort (cascade design, Ingest)
      if (!new java.io.File(s"$base/pts_bkt/_SUCCESS").exists())
        spark.read.parquet(ptsDir)
          .repartition(64, col("key"))
          .write.mode("overwrite")
          .bucketBy(64, "key").sortBy("key", "ts")
          .option("path", s"$base/pts_bkt").saveAsTable(s"wb_pts_$nTurns")
      println(s"""{"materialized":$nTurns,"docs":$nDocs}""")
      spark.stop()
      return
    }

    spark.sql(s"""CREATE TABLE IF NOT EXISTS wb_pts_$nTurns (
      key STRING, ts TIMESTAMP_NTZ, v DOUBLE)
      USING parquet CLUSTERED BY (key) SORTED BY (key, ts)
      INTO 64 BUCKETS LOCATION '$base/pts_bkt'""")
    val ptsBkt = spark.table(s"wb_pts_$nTurns")

    val pts = spark.read.parquet(ptsDir)
    val refs = spark.read.parquet(refsDir)
    val iv = spark.read.parquet(ivDir)
    val docs = spark.read.parquet(docsDir)
    val ops: Seq[(String, () => DataFrame)] = Seq(
      ("asof_join", () => SeriesAlgebra.asofJoin(pts, refs, Seq("rv"))),
      ("range_join", () => SeriesAlgebra.rangeJoin(pts, iv, "t_start", "t_end", 3600L)),
      ("sessions", () => SeriesOps.sessions(pts, 300L)),
      ("ewma", () => SeriesOps.ewma(pts, 8)),
      ("pack", () => TextAnalysis.packSequences(docs, "doc_id",
        col("n_tokens"), 8192L, pmod(col("doc_id"), lit(1024)).cast("int"))),
      // same jobs over the bucketed ingest layout: exchange-free,
      // sort-free (asofJoin is excluded — its UNION forgets children's
      // partitioning, so it pays its one exchange on any layout)
      ("sessions_bkt", () => SeriesOps.sessions(ptsBkt, 300L)),
      ("ewma_bkt", () => SeriesOps.ewma(ptsBkt, 8)))

    def once(): Seq[(String, Double)] = ops.map { case (name, f) =>
      val (_, sec) = Bench.timed(Bench.forceRun(f()))
      (name, sec)
    }
    once() // warmup (JIT + page cache)
    val runs = (1 to 3).map(_ => once())
    val inRows = Map("pts" -> pts.count(), "docs" -> docs.count(),
      "refs" -> refs.count(), "iv" -> iv.count())
    val runsJson = runs.map(_.map { case (n, s) => s""""$n":$s""" }
      .mkString("{", ",", "}")).mkString("[", ",", "]")
    val rowsJson = inRows.toSeq.sortBy(_._1)
      .map { case (n, c) => s""""$n":$c""" }.mkString("{", ",", "}")
    println(s"""{"cores":$cores,"turns":$nTurns,"in_rows":$rowsJson,"runs":$runsJson}""")
    spark.stop()
  }
}
