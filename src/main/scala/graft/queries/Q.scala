package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Oracle, Tables}
import graft.operators._

/** Shared helpers for the query catalog. Each domain object exposes a
  * `queries` map (Spark side) and an `oracles` map (DuckDB ANSI SQL
  * side) with IDENTICAL column names and ORDER BY on both sides —
  * the driver hash-compares after sorting columns by name.
  */
trait QuerySet {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

object Q {

  def eventPoints(s: SparkSession, dir: String): DataFrame =
    Signals.fromEvents(Tables.events(s, dir))

  def transcriptPoints(s: SparkSession, dir: String): DataFrame =
    Signals.latencyPoints(Tables.transcripts(s, dir))

  /** Deterministic output order: by every column, left to right. */
  def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.toSeq.map(col): _*)

  /** Per-query scratch root under tmpdir, wiped before use so a
    * stateful query (tier tables, streams) starts from nothing. */
  def freshDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), name)
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  /** DuckDB CTE `pts` = events in tall positional form; mirror of
    * Signals.fromEvents + SeriesOps.withPos. */
  val ptsCte: String =
    """WITH pts AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key, ts, value AS v,
      |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS BIGINT) AS pos
      |  FROM events
      |)""".stripMargin

  /** DuckDB per-key exact-decimal stats CTE `ks` (n, sv, svv, k_mean,
    * k_std) — mirror of SeriesOps.keyStats. */
  val keyStatsCte: String =
    """ks AS (
      |  SELECT key, COUNT(*) AS n,
      |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sv,
      |         CAST(SUM(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS svv
      |  FROM pts GROUP BY key
      |)""".stripMargin

  val kMeanSql = "(sv / n)"
  val kStdSql = s"sqrt(greatest(svv / n - $kMeanSql * $kMeanSql, 0.0))"
}
