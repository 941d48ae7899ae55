package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.json: "throughput
  * scaling efficiency ≥0.8 between N and 4N executors"; sandbox
  * substitute per BASELINE.md: the same job at local[8] vs local[32]
  * on identical input).
  *
  * Usage: runMain graft.ScalingBench <cores> <nTurns> — runs the full
  * retention cascade over a pre-materialized synthetic transcript
  * parquet table and prints one JSON line. A fresh JVM per cores
  * level (tools/run_scaling.sh) keeps JIT/GC state comparable.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nTurns = if (args.length > 1) args(1).toLong else 8000000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      // 4× cores initial shuffle partitions smooths the skewed
      // conversation window; AQE coalesces the small tails
      .config("spark.sql.shuffle.partitions", cores * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // sorted-bucket scan ordering: elides the latency window's Sort
      // (one sorted file per bucket — BucketedCascadeSpec)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mode = if (args.length > 2) args(2) else "bucketed"
    if (mode == "materialize") {
      Bench.ensureBucketedCascadeInputs(spark, nTurns)
      println(s"""{"materialized":$nTurns}""")
      spark.stop()
      return
    }
    def once(): Seq[(String, Double, Long, Long)] =
      if (mode == "bucketed") Bench.cascadeBenchBucketed(spark, nTurns)
      else {
        val turnsDir = s"/tmp/graft_bench_turns_$nTurns"
        Bench.materializeTurns(spark, nTurns, turnsDir)
        Bench.cascadeBench(spark, turnsDir)
      }
    // warmup (JIT + page cache) + 3 measured runs (caller takes median)
    once()
    val runs = (1 to 3).map(_ => once())
    System.err.println(s"[scaling] heap max = ${Runtime.getRuntime.maxMemory() / (1 << 20)} MiB")
    val runsJson = runs.map { tiers =>
      tiers.map { case (name, sec, outRows, inRows) =>
        s""""$name":{"sec":$sec,"in_rows":$inRows,"out_rows":$outRows}"""
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val totalSecs = runs.map(_.map(_._2).sum)
    println(s"""{"cores":$cores,"turns":$nTurns,"runs":$runsJson,"totals_sec":${totalSecs.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
