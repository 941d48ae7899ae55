package graft

import org.apache.spark.sql.SparkSession

/** Fresh-JVM tier-cascade timing: runMain graft.TierBench [nTurns]
  * [cores] [runs]. Isolates the headline cascade stages from the
  * shared-JVM catalog bench (r3 verdict what's-wrong #2: the driver's
  * 1m→1h reading sits after ~40 minutes of catalog queries, inside
  * the documented ±2 s JVM-state error bar — a suspected regression
  * must be re-measured here before chasing plans). Protocol matches
  * the driver bench: bucketed ingest layout, inputs staged untimed,
  * 1 warmup pass, median of `runs` per tier. */
object TierBench {

  def main(args: Array[String]): Unit = {
    val nTurns = if (args.length > 0) args(0).toLong else 8000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warmup

    Bench.cascadeBenchBucketed(spark, nTurns) // warmup + input staging
    val all = (1 to runs).map(_ => Bench.cascadeBenchBucketed(spark, nTurns))
    val tiers = all.head.indices.map { i =>
      val (name, _, outRows, inRows) = all.head(i)
      val ts = all.map(_(i)._2).sorted
      (name, ts(runs / 2), ts.head, outRows, inRows)
    }
    val json = tiers.map { case (name, med, min, outRows, inRows) =>
      s""""$name":{"median_sec":$med,"min_sec":$min,"in_rows":$inRows,""" +
        s""""out_rows":$outRows,"in_rows_per_sec":${(inRows / med).toLong}}"""
    }.mkString("{", ",", "}")
    println(s"""{"bench":"tier_isolated","turns":$nTurns,"cores":$cores,"runs":$runs,"tiers":$json}""")
    spark.stop()
  }
}
