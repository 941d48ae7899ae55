package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Signals
import graft.synth.TranscriptGen
import graft.tables.RollupJob

/** Incremental-MERGE-at-volume benchmark: the RollupJob cascade
  * (year-batched — the synthetic power-law head conversations span
  * years) over an 8M-turn synthetic table, end-to-end including all
  * tier MERGE commits. Prints one JSON line. Round-1 shape re-ran the
  * raw scan 3× per batch (BENCH.md: 270.7 s); this measures the
  * single-scan-per-batch fix.
  * Usage: runMain graft.MergeBench [nTurns] [cores]
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val nTurns = if (args.length > 0) args(0).toLong else 8000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val turnsDir = s"/tmp/graft_bench_turns_$nTurns"
    Bench.materializeTurns(spark, nTurns, turnsDir)
    val root = java.nio.file.Files.createTempDirectory("graft_mergebench").toString
    val points = Signals.latencyPoints(spark.read.parquet(turnsDir))

    val t0 = System.nanoTime()
    val job = new RollupJob(spark, root, nBuckets = 16)
    job.run(points, "mergebench", batchUnit = "year")
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = Seq("1m" -> job.tier1m, "1h" -> job.tier1h, "1d" -> job.tier1d)
      .map { case (n, t) => s""""$n":${t.read().count()}""" }.mkString(",")
    val nParts = job.tier1m.resolvedEntries.size + job.tier1h.resolvedEntries.size +
      job.tier1d.resolvedEntries.size
    println(s"""{"merge_bench_sec":$sec,"turns":$nTurns,"cores":$cores,"tier_rows":{$rows},"live_partitions":$nParts}""")
    spark.stop()
  }
}
