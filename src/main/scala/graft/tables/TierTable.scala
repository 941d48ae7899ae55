package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-semantics tier table: parquet data files + JSON snapshot
  * manifests with atomic commit, hidden partitioning, incremental
  * MERGE, and per-partition checkpoint lineage.
  *
  * WHY NOT REAL ICEBERG: no iceberg-spark-runtime jar exists in this
  * offline environment (checked /opt/spark/jars + coursier cache —
  * SURVEY.md §7.1), so the north_rule's "Iceberg tables / incremental
  * MERGE" lands as this thin layer implementing the same *semantics*:
  *   - snapshot isolation: readers resolve HEAD → vN.json → explicit
  *     file list; writers never mutate committed files;
  *   - atomic commit: manifest written to a temp file, then an atomic
  *     rename moves HEAD — a crashed writer leaves the table at the
  *     previous snapshot;
  *   - hidden partitioning: data laid out by (pb = bucket(key),
  *     pd = day(bucket)) — the Iceberg transform pair
  *     bucket(N, conv_id) × days(ts) from SURVEY.md §4.2;
  *   - MERGE INTO ≡ copy-on-write of affected partitions only:
  *     incoming partial rollups are combined with existing rows of
  *     the touched partitions via the exact mergeable-stat merge
  *     (sum of decimal sums — associative, so re-merging is
  *     idempotent), untouched partitions carry forward by reference;
  *   - resume: every committed partition records lineage (runId,
  *     rows, bytes) in the manifest; a re-run of the same runId skips
  *     partitions already committed (anti-join on the checkpoint
  *     set) — north_rule "resumable from per-partition checkpoints
  *     carrying lineage and row-count/byte metrics".
  * The interface is format-agnostic so a real Iceberg catalog can be
  * swapped in where one exists.
  */
final class TierTable(spark: SparkSession, root: String, nBuckets: Int = 16) {

  private val rootPath = Paths.get(root)
  private val dataDir = rootPath.resolve("data")
  private val metaDir = rootPath.resolve("_meta")
  private val headFile = metaDir.resolve("HEAD")

  Files.createDirectories(dataDir)
  Files.createDirectories(metaDir)

  // ---- manifest model (hand-rolled JSON: no extra deps) -------------

  /** One committed partition: relative dir, lineage + metrics. */
  case class PartEntry(pb: Int, pd: String, dir: String, rows: Long,
      bytes: Long, runId: String)

  case class Manifest(version: Int, parent: Int, entries: Seq[PartEntry])

  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def manifestJson(m: Manifest): String = {
    val es = m.entries.map { e =>
      s"""{"pb":${e.pb},"pd":"${esc(e.pd)}","dir":"${esc(e.dir)}","rows":${e.rows},"bytes":${e.bytes},"runId":"${esc(e.runId)}"}"""
    }.mkString("[", ",", "]")
    s"""{"version":${m.version},"parent":${m.parent},"entries":$es}"""
  }

  private def parseManifest(s: String): Manifest = {
    // minimal parser for the writer's own format
    val version = """"version":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    val parent = """"parent":(-?\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    val entry = """\{"pb":(\d+),"pd":"([^"]*)","dir":"([^"]*)","rows":(\d+),"bytes":(\d+),"runId":"([^"]*)"\}""".r
    val entries = entry.findAllMatchIn(s).map { m =>
      PartEntry(m.group(1).toInt, m.group(2), m.group(3), m.group(4).toLong,
        m.group(5).toLong, m.group(6))
    }.toSeq
    Manifest(version, parent, entries)
  }

  def currentVersion: Int =
    if (Files.exists(headFile))
      new String(Files.readAllBytes(headFile), StandardCharsets.UTF_8).trim.toInt
    else -1

  def currentManifest: Option[Manifest] = {
    val v = currentVersion
    if (v < 0) None
    else Some(parseManifest(new String(
      Files.readAllBytes(metaDir.resolve(s"v$v.json")), StandardCharsets.UTF_8)))
  }

  private def commit(m: Manifest): Unit = {
    val vFile = metaDir.resolve(s"v${m.version}.json")
    Files.write(vFile, manifestJson(m).getBytes(StandardCharsets.UTF_8))
    val tmp = metaDir.resolve(s"HEAD.tmp${m.version}")
    Files.write(tmp, m.version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, headFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- read ---------------------------------------------------------

  /** Snapshot read: the file list comes from the manifest, never from
    * directory listing — concurrent/crashed writers are invisible. */
  def read(): DataFrame = currentManifest match {
    case None => spark.emptyDataFrame
    case Some(m) if m.entries.isEmpty => spark.emptyDataFrame
    case Some(m) =>
      spark.read.parquet(m.entries.map(e => s"$root/${e.dir}"): _*)
  }

  /** Time-pruned read: only partitions whose pd (day) falls in
    * [lo, hi] are scanned — manifest-level partition pruning. */
  def read(loDay: String, hiDay: String): DataFrame = currentManifest match {
    case Some(m) =>
      val keep = m.entries.filter(e => e.pd >= loDay && e.pd <= hiDay)
      if (keep.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(keep.map(e => s"$root/${e.dir}"): _*)
    case None => spark.emptyDataFrame
  }

  // ---- merge --------------------------------------------------------

  private def withPartCols(rollup: DataFrame): DataFrame =
    rollup
      .withColumn("pb", pmod(xxhash64(col("key")), lit(nBuckets.toLong)).cast("int"))
      .withColumn("pd", date_format(col("bucket"), "yyyy-MM-dd"))

  /** Incremental MERGE of partial rollup rows (schema: key, bucket,
    * cnt, sum_d, sumsq_d, min_v, max_v) into the tier.
    *
    * Steps: 1) affected partitions = distinct (pb, pd) of the update;
    * 2) combined = (existing rows of affected ∪ updates) re-merged on
    * (key, bucket) — exact; 3) write each affected partition under
    * data/v{N}/pb=…/pd=…; 4) new manifest = carried-forward untouched
    * entries + fresh affected entries; atomic HEAD swap.
    *
    * Resume: if `runId` matches an entry already committed for an
    * affected partition at the current version, that partition is
    * skipped (its entry carries forward) — re-running a partially
    * failed job converges without double-merging.
    */
  def merge(updates: DataFrame, runId: String): Manifest = {
    val prev = currentManifest.getOrElse(Manifest(-1, -2, Nil))
    val newVersion = prev.version + 1
    val upd = withPartCols(updates).cache()
    try {
      val affected = upd.select("pb", "pd").distinct().collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      val doneForRun = prev.entries.filter(_.runId == runId)
        .map(e => (e.pb, e.pd)).toSet
      val todo = affected -- doneForRun
      if (todo.isEmpty) { // fully resumed: nothing to rewrite
        val m = Manifest(newVersion, prev.version, prev.entries)
        commit(m)
        return m
      }
      val todoDf = todo.toSeq.toDF_(spark)

      val prevByPart = prev.entries.map(e => (e.pb, e.pd) -> e).toMap
      val existingAffected: Option[DataFrame] = {
        val dirs = todo.toSeq.flatMap(prevByPart.get).map(e => s"$root/${e.dir}")
        // leaf-dir reads drop the hive-style partition columns;
        // recompute them — pb/pd are pure functions of (key, bucket)
        if (dirs.isEmpty) None else Some(withPartCols(spark.read.parquet(dirs: _*)))
      }

      val updTodo = upd.join(todoDf, Seq("pb", "pd"), "left_semi")
      val combined = existingAffected match {
        case Some(ex) => ex.unionByName(updTodo)
        case None => updTodo
      }
      // optional percentile-sketch column merges right alongside the
      // exact sums (kll is mergeable — FIXTURES.md §A.2 tier row)
      val baseAggs = Seq(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_d")).as("sum_d"),
        sum(col("sumsq_d")).as("sumsq_d"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
      val aggs =
        if (upd.columns.contains("kll"))
          baseAggs :+ graft.functions.KllAgg.kll_merge(col("kll")).as("kll")
        else baseAggs
      val merged = combined
        .groupBy(col("pb"), col("pd"), col("key"), col("bucket"))
        .agg(aggs.head, aggs.tail: _*)
        .cache()

      val counts = merged.groupBy(col("pb"), col("pd")).count().collect()
        .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap

      val outDir = s"data/v$newVersion"
      merged.write
        .partitionBy("pb", "pd")
        .mode(SaveMode.Overwrite)
        .parquet(s"$root/$outDir")
      merged.unpersist()

      val newEntries = todo.toSeq.sorted.map { case (pb, pd) =>
        val dir = s"$outDir/pb=$pb/pd=$pd"
        val bytes = dirSize(rootPath.resolve(dir))
        PartEntry(pb, pd, dir, counts.getOrElse((pb, pd), 0L), bytes, runId)
      }
      val carried = prev.entries.filterNot(e => todo.contains((e.pb, e.pd)))
      val m = Manifest(newVersion, prev.version, carried ++ newEntries)
      commit(m)
      m
    } finally upd.unpersist()
  }

  private def dirSize(p: Path): Long =
    if (!Files.exists(p)) 0L
    else Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum

  // small helper: Set[(Int,String)] → DataFrame(pb, pd)
  implicit private class TupleSeqOps(s: Seq[(Int, String)]) {
    def toDF_(spark: SparkSession): DataFrame = {
      import spark.implicits._
      s.toDF("pb", "pd")
    }
  }
}
