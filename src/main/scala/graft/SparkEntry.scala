package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in graft.queries.*: each QuerySet
  * pairs Spark-side queries with DuckDB ANSI oracles (identical
  * column names + ORDER BY on both sides; the driver hash-compares
  * after sorting columns by name).
  */
object SparkEntry {

  private val sets: Seq[QuerySet] =
    Seq(RollupQueries, SeriesQueries, GapFillQueries, CodecQueries,
      DocQueries, ScaleQueries, AlgebraQueries)

  /** Flagship: full retention cascade raw→1m→1h→1d over the
    * transcripts view of sf0.001, presented at the 1d tier. */
  def entry(spark: SparkSession): DataFrame = {
    val points = Signals.latencyPoints(Tables.transcripts(spark, "/root/testdata/sf0.001"))
    Rollup.present(Rollup.cascadeAll(points)("1d"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sets.map(_.queries).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    sets.map(_.oracles).reduce(_ ++ _)
}
