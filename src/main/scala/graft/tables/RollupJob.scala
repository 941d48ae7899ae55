package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Rollup

/** The retention-cascade materialization job: raw points → 1m → 1h →
  * 1d tier tables as incremental day-batched MERGEs (north_rule:
  * "retention cascades materialized as incremental Iceberg MERGE
  * jobs … resumable from per-partition checkpoints").
  *
  * One batch = one day of input. Per batch: the 1m partials are
  * computed once, MERGEd into the 1m tier, then cascaded (exact
  * mergeable-stat sums) into the 1h and 1d tiers. Each merge commits
  * a snapshot whose partition entries carry lineage `runId/day` +
  * row/byte metrics, so a crashed run re-executed with the same
  * runId skips every (partition, batch) already committed — the
  * recomputed partials are deterministic, so resume is idempotent
  * (tested: interrupting after tier-1m commit and re-running yields
  * identical tier contents, no double counting).
  *
  * At 10^12-turn scale a "day batch" is a partition-pruned scan of
  * the ingest layout (Ingest.layout puts ts_day in the range key), so
  * each batch reads only its own files.
  */
final class RollupJob(spark: SparkSession, root: String, nBuckets: Int = 16) {

  val tier1m = new TierTable(spark, s"$root/tier_1m", nBuckets)
  val tier1h = new TierTable(spark, s"$root/tier_1h", nBuckets)
  val tier1d = new TierTable(spark, s"$root/tier_1d", nBuckets)

  /** Batch label pattern per granularity. Day batches suit real
    * transcript tables (bounded conversation lifetimes + partition
    * pruning); coarser granularities keep batch counts sane for
    * synthetic corpora whose power-law head conversations span years. */
  private def pattern(unit: String): String = unit match {
    case "day" => "yyyy-MM-dd"
    case "month" => "yyyy-MM"
    case "year" => "yyyy"
    case u => throw new IllegalArgumentException(s"batchUnit $u")
  }

  def distinctDays(points: DataFrame, batchUnit: String = "day"): Seq[String] =
    points.select(date_format(col("ts"), pattern(batchUnit)).as("d"))
      .distinct().orderBy("d").collect().map(_.getString(0)).toSeq

  /** Run (or resume) the cascade over `points` for all its days.
    * `sketched = true` carries a KLL percentile-sketch column through
    * every tier alongside the exact stats. */
  def run(points: DataFrame, runId: String, sketched: Boolean = false,
      batchUnit: String = "day"): Unit = {
    val days = distinctDays(points, batchUnit)
    days.foreach { day =>
      val lineage = s"$runId/$day"
      val dayPts = points.where(date_format(col("ts"), pattern(batchUnit)) === day)
      val m1 =
        if (sketched) graft.operators.SketchedRollup.rollupRaw(dayPts, "minute")
        else Rollup.rollupRaw(dayPts, "minute")
      tier1m.merge(m1, lineage)
      val h1 =
        if (sketched) graft.operators.SketchedRollup.cascade(m1, "hour")
        else Rollup.cascade(m1, "hour")
      tier1h.merge(h1, lineage)
      val d1 =
        if (sketched) graft.operators.SketchedRollup.cascade(h1, "day")
        else Rollup.cascade(h1, "day")
      tier1d.merge(d1, lineage)
    }
  }

  /** Run only the first `maxBatches` day batches (crash-simulation /
    * incremental arrival). */
  def runPartial(points: DataFrame, runId: String, maxBatches: Int): Unit = {
    distinctDays(points, "day").take(maxBatches).foreach { day =>
      val lineage = s"$runId/$day"
      val dayPts = points.where(date_format(col("ts"), "yyyy-MM-dd") === day)
      val m1 = Rollup.rollupRaw(dayPts, "minute")
      tier1m.merge(m1, lineage)
      val h1 = Rollup.cascade(m1, "hour")
      tier1h.merge(h1, lineage)
      val d1 = Rollup.cascade(h1, "day")
      tier1d.merge(d1, lineage)
    }
  }
}
