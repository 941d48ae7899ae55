package graft
import org.apache.spark.sql.SparkSession
// Scratch diagnostic (not part of the engine): report runtime exchange
// reuse for a named query's executed adaptive plan.
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(1).split(',').foreach { q =>
      val df = SparkEntry.queries(q)(spark, args(0))
      df.queryExecution.executedPlan.executeCollect()
      val s = df.queryExecution.executedPlan.toString
      def cnt(n: String) = s.sliding(n.length).count(_ == n)
      println(s"QQ $q reused=${cnt("ReusedExchange")} scans=${cnt("Scan parquet")} exch=${cnt("Exchange")} final=${s.contains("isFinalPlan=true")}")
    }
    spark.stop()
  }
}
