package graft

import org.apache.spark.sql.SparkSession

/** Focused catalog-query timing: runMain graft.QueryBench <sfDir>
  * <q1,q2,…> [runs]. One fresh JVM, one session warmup, then
  * `runs` timed noop-write executions per query; prints min/median.
  * Exists so a single regressed query can be re-measured under the
  * bench protocol without paying for the whole 69-query catalog
  * (r2 verdict what's-wrong #5: unexplained catalog-bench deltas need
  * a clean A/B, not a reading inside a 30-minute shared JVM). */
object QueryBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.forceRun(Tables.events(spark, sfDir).limit(10000))
    spark.range(1000000).selectExpr("sum(id)").collect()
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to runs).map { _ =>
        val (_, sec) = Bench.timed(Bench.forceRun(fn(spark, sfDir)))
        sec
      }.sorted
      s""""$name":{"min":${ts.head},"median":${ts(runs / 2)}}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
