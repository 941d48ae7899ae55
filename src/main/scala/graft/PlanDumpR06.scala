package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-6 plan evidence: dump `explain("formatted")` of named catalog
  * queries to plans/r06/<query>_<tag>.txt. Usage:
  *   sbt "runMain graft.PlanDumpR06 <sfDir> <tag> <q1,q2,…>"
  * Bench/Verify are untouched; this is measurement tooling only
  * (guide §1.1/§7.2 — plan-shape evidence for the optimization round).
  */
object PlanDumpR06 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, tag, names) = args.take(3)
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
    val outRoot = Paths.get("plans/r06")
    Files.createDirectories(outRoot)
    names.split(',').foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outRoot.resolve(s"${name}_$tag.txt"), plan)
      println(s"wrote plans/r06/${name}_$tag.txt")
    }
    spark.stop()
  }
}
