package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption, StandardOpenOption}
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
  *   - atomic commit with conflict detection: the manifest file is
  *     created with CREATE_NEW (a poor-man's CAS on the version), so
  *     two racing writers cannot both claim version N — the loser gets
  *     a conflict error instead of silently discarding the winner's
  *     entries; HEAD then moves by atomic rename;
  *   - DELTA manifests (manifest-of-manifests, like Iceberg's
  *     snapshot → manifest-list indirection): each commit writes only
  *     the partitions it touched plus a parent pointer; readers walk
  *     the chain to the nearest FULL snapshot, first-seen-wins. Commit
  *     I/O is O(touched partitions), not O(table partitions) — at
  *     millions of partitions a full rewrite per commit is a
  *     scale-killer. Every `compactEvery`-th commit writes a full
  *     snapshot so chains stay short;
  *   - hidden partitioning: data laid out by (pb = bucket(key),
  *     pd = day(bucket)) — the Iceberg transform pair
  *     bucket(N, conv_id) × days(ts) from SURVEY.md §4.2;
  *   - MERGE INTO ≡ copy-on-write of affected partitions only:
  *     incoming partial rollups are combined with existing rows of
  *     the touched partitions via the exact mergeable-stat merge
  *     (sum of decimal sums — associative, so re-merging is
  *     idempotent), untouched partitions carry forward by reference;
  *   - resume: every committed partition records its full lineage
  *     (ALL runIds that ever touched it, plus rows/bytes) — a re-run
  *     of a runId skips partitions that already include it, even if
  *     OTHER runs committed to the same partition in between (a single
  *     runId field would forget history and double-merge on retry).
  * The interface is format-agnostic so a real Iceberg catalog can be
  * swapped in where one exists.
  */
final class TierTable(spark: SparkSession, root: String, nBuckets: Int = 16,
    compactEvery: Int = 8) {

  private val rootPath = Paths.get(root)
  private val dataDir = rootPath.resolve("data")
  private val metaDir = rootPath.resolve("_meta")
  private val headFile = metaDir.resolve("HEAD")

  Files.createDirectories(dataDir)
  Files.createDirectories(metaDir)

  // ---- manifest model (hand-rolled JSON: no extra deps) -------------

  /** One committed partition: relative dir, full runId lineage +
    * metrics. `runIds` lists every run that has been merged into this
    * partition's current contents (ordered by commit). */
  case class PartEntry(pb: Int, pd: String, dir: String, rows: Long,
      bytes: Long, runIds: Seq[String])

  /** `full = true` → entries are the complete live-partition set;
    * otherwise a delta over `parent`. */
  case class Manifest(version: Int, parent: Int, full: Boolean,
      entries: Seq[PartEntry])

  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def manifestJson(m: Manifest): String = {
    val es = m.entries.map { e =>
      s"""{"pb":${e.pb},"pd":"${esc(e.pd)}","dir":"${esc(e.dir)}","rows":${e.rows},"bytes":${e.bytes},"runIds":"${esc(e.runIds.mkString(","))}"}"""
    }.mkString("[", ",", "]")
    s"""{"version":${m.version},"parent":${m.parent},"full":${m.full},"entries":$es}"""
  }

  private def parseManifest(s: String): Manifest = {
    // minimal parser for the writer's own format
    val version = """"version":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    val parent = """"parent":(-?\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    val full = """"full":(true|false)""".r.findFirstMatchIn(s).get.group(1).toBoolean
    val entry = """\{"pb":(\d+),"pd":"([^"]*)","dir":"([^"]*)","rows":(\d+),"bytes":(\d+),"runIds":"([^"]*)"\}""".r
    val entries = entry.findAllMatchIn(s).map { m =>
      PartEntry(m.group(1).toInt, m.group(2), m.group(3), m.group(4).toLong,
        m.group(5).toLong,
        m.group(6).split(',').toSeq.filter(_.nonEmpty))
    }.toSeq
    Manifest(version, parent, full, entries)
  }

  def currentVersion: Int =
    if (Files.exists(headFile))
      new String(Files.readAllBytes(headFile), StandardCharsets.UTF_8).trim.toInt
    else -1

  private def manifestAt(v: Int): Manifest =
    parseManifest(new String(
      Files.readAllBytes(metaDir.resolve(s"v$v.json")), StandardCharsets.UTF_8))

  def currentManifest: Option[Manifest] = {
    val v = currentVersion
    if (v < 0) None else Some(manifestAt(v))
  }

  /** Resolve the live partition set at HEAD: walk the delta chain down
    * to the nearest full snapshot, newest entry wins per partition.
    * O(chain length) manifest reads — bounded by `compactEvery`. */
  def resolvedEntries: Seq[PartEntry] = {
    val seen = scala.collection.mutable.LinkedHashMap[(Int, String), PartEntry]()
    var v = currentVersion
    var done = v < 0
    while (!done) {
      val m = manifestAt(v)
      m.entries.foreach { e =>
        if (!seen.contains((e.pb, e.pd))) seen((e.pb, e.pd)) = e
      }
      if (m.full || m.parent < 0) done = true else v = m.parent
    }
    seen.values.toSeq
  }

  /** Atomic commit with conflict detection: CREATE_NEW on the version
    * file is the CAS — a racing writer that computed the same version
    * fails here (and must retry against the new snapshot) instead of
    * silently clobbering the winner's commit. */
  private def commit(m: Manifest): Unit = {
    val vFile = metaDir.resolve(s"v${m.version}.json")
    try
      Files.write(vFile, manifestJson(m).getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW)
    catch {
      case _: FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"commit conflict: version ${m.version} of $root already exists " +
            "(concurrent writer) — re-read the snapshot and retry the merge")
    }
    val tmp = metaDir.resolve(s"HEAD.tmp${m.version}")
    Files.write(tmp, m.version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, headFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- read ---------------------------------------------------------

  /** Snapshot read: the file list comes from the resolved manifest
    * chain, never from directory listing — concurrent/crashed writers
    * are invisible. */
  def read(): DataFrame = {
    val es = resolvedEntries
    if (es.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(es.map(e => s"$root/${e.dir}"): _*)
  }

  /** Time-pruned read: only partitions whose pd (day) falls in
    * [lo, hi] are scanned — manifest-level partition pruning. */
  def read(loDay: String, hiDay: String): DataFrame = {
    val keep = resolvedEntries.filter(e => e.pd >= loDay && e.pd <= hiDay)
    if (keep.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(keep.map(e => s"$root/${e.dir}"): _*)
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
    * data/v{N}/pb=…/pd=…; 4) commit a DELTA manifest carrying only the
    * rewritten partitions (a full snapshot every `compactEvery`
    * commits); atomic CAS + HEAD swap.
    *
    * Resume: a partition whose lineage already contains `runId` is
    * skipped (entry carries forward by reference), so re-running a
    * partially failed job converges without double-merging — even if
    * other runs have since committed to the same partitions.
    *
    * Driver memory: the collected state is O(live partitions) for the
    * resolve plus O(touched partitions) for counts/bytes — the same
    * order a real Iceberg driver holds for planning; commit I/O is
    * O(touched) only.
    */
  def merge(updates: DataFrame, runId: String): Manifest = {
    val resolved = resolvedEntries.map(e => (e.pb, e.pd) -> e).toMap
    val prevVersion = currentVersion
    val newVersion = prevVersion + 1
    val makeFull = newVersion % compactEvery == 0
    val upd = withPartCols(updates).cache()
    try {
      val affected = upd.select("pb", "pd").distinct().collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      val doneForRun = resolved.collect {
        case (part, e) if e.runIds.contains(runId) => part
      }.toSet
      val todo = affected -- doneForRun
      if (todo.isEmpty) { // fully resumed: nothing to rewrite
        val m = Manifest(newVersion, prevVersion, makeFull,
          if (makeFull) resolved.values.toSeq else Nil)
        commit(m)
        return m
      }
      val todoDf = todo.toSeq.toDF_(spark)

      val existingAffected: Option[DataFrame] = {
        val dirs = todo.toSeq.flatMap(resolved.get).map(e => s"$root/${e.dir}")
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
      // hash-distribute by the partition columns before partitionBy:
      // otherwise every shuffle partition writes its own file into
      // every dir it touches (up to parallelism× small files per
      // partition dir — measured 32 files/dir at local[32]). One task
      // per (pb, pd) group → exactly one file per partition dir, the
      // same write distribution real Iceberg uses (distribution-mode
      // = hash).
      merged.repartition(col("pb"), col("pd")).write
        .partitionBy("pb", "pd")
        .mode(SaveMode.Overwrite)
        .parquet(s"$root/$outDir")
      merged.unpersist()

      val newEntries = todo.toSeq.sorted.map { case (pb, pd) =>
        val dir = s"$outDir/pb=$pb/pd=$pd"
        val bytes = dirSize(rootPath.resolve(dir))
        val lineage = resolved.get((pb, pd)).map(_.runIds).getOrElse(Nil) :+ runId
        PartEntry(pb, pd, dir, counts.getOrElse((pb, pd), 0L), bytes, lineage)
      }
      val entries =
        if (makeFull)
          resolved.filterNot { case (part, _) => todo.contains(part) }
            .values.toSeq ++ newEntries
        else newEntries
      val m = Manifest(newVersion, prevVersion, makeFull, entries)
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
