package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Oracle
import graft.Tables
import graft.operators._
import Q._

/** Rollup/tier-cascade queries — the engine's headline operators. */
object RollupQueries extends QuerySet {

  /** DuckDB SQL computing the 1m mergeable rollup of events.
    * The sumsq multiply widens one operand to DECIMAL(19,6) so the
    * product is computed in int128 regardless of the DuckDB build's
    * int64-multiply fast path (known quirk — CLAUDE.md). */
  private def ev1mCteWhere(where: String): String =
    s"""WITH r1m AS (
       |  SELECT CAST(user_id AS VARCHAR) AS key,
       |         date_trunc('minute', ts) AS bucket,
       |         COUNT(*) AS cnt,
       |         SUM(CAST(value AS DECIMAL(18,6))) AS sum_d,
       |         SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(18,6))) AS sumsq_d,
       |         MIN(value) AS min_v, MAX(value) AS max_v
       |  FROM events $where GROUP BY 1, 2
       |)""".stripMargin

  private val ev1mCte: String = ev1mCteWhere("")

  /** CAST(SUM(cnt) AS BIGINT): DuckDB's SUM over BIGINT returns
    * HUGEINT, which pandas renders as float64 — the driver comparator
    * then hashes `2.0` against Spark's int64 `2` and flags a mismatch
    * even though every value is identical (the r01 cascade failure).
    * Spark's sum(long) stays long, so pin the oracle to BIGINT too. */
  private def cascadeCte(name: String, from: String, unit: String): String =
    s"""$name AS (
       |  SELECT key, date_trunc('$unit', bucket) AS bucket,
       |         CAST(SUM(cnt) AS BIGINT) AS cnt, SUM(sum_d) AS sum_d, SUM(sumsq_d) AS sumsq_d,
       |         MIN(min_v) AS min_v, MAX(max_v) AS max_v
       |  FROM $from GROUP BY 1, 2
       |)""".stripMargin

  /** Presentation SQL. sumsq_d (DECIMAL(38,12)) is rescaled to its
    * true scale 6 BEFORE the DOUBLE cast: DuckDB's wide-decimal→double
    * cast is not correctly rounded once the unscaled value exceeds
    * 2^53, and a scale-12 sum of squares crosses that long before the
    * scale-6 sums do. Mirrors [[graft.operators.Rollup.present]]. */
  private def presentSql(r: String, withStd: Boolean = true): String = {
    val std =
      if (withStd)
        """,
          |       sqrt(greatest(CAST(CAST(sumsq_d AS DECIMAL(38,6)) AS DOUBLE) / cnt -
          |            (CAST(sum_d AS DOUBLE) / cnt) * (CAST(sum_d AS DOUBLE) / cnt), 0.0)) AS std_v""".stripMargin
      else ""
    s"""SELECT key, bucket, cnt,
       |       CAST(sum_d AS DOUBLE) AS sum_v,
       |       CAST(sum_d AS DOUBLE) / cnt AS mean_v,
       |       min_v, max_v$std
       |FROM $r ORDER BY key, bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup_1m" -> ((s, dir) =>
      ordered(Rollup.present(Rollup.rollupRaw(eventPoints(s, dir), "minute")))),
    "q_rollup_1h_cascade" -> ((s, dir) =>
      ordered(Rollup.present(
        Rollup.cascade(Rollup.rollupRaw(eventPoints(s, dir), "minute"), "hour")))),
    "q_rollup_1d_cascade" -> ((s, dir) =>
      ordered(Rollup.present(
        Rollup.cascade(
          Rollup.cascade(Rollup.rollupRaw(eventPoints(s, dir), "minute"), "hour"),
          "day")))),
    "q_latency_derive" -> ((s, dir) =>
      transcriptPoints(s, dir).where(col("v").isNotNull)
        .select(col("key"), col("ts"), col("v").as("latency_ms"))
        .orderBy("key", "ts", "latency_ms")),
    // std_v dropped from the cross-engine oracle: latencies reach
    // ~1e7 ms, sumsq needs >17 significant digits, and the
    // decimal→double presentation cast legitimately differs between
    // engines at the last ulp, which the cancelled sumsq/n − mean²
    // formula amplifies. Internal sums stay exact decimal; transcript
    // std is verified bit-exactly by the LocalOracle ScalaTest.
    "q_transcript_rollup_1m" -> ((s, dir) =>
      ordered(Rollup.present(Rollup.rollupRaw(transcriptPoints(s, dir), "minute"))
        .drop("std_v"))),
    // FLAGSHIP MACHINERY, driver-certified end-to-end (r2 verdict
    // next-#1): the incremental MERGE job over day batches — run the
    // first 2 batches, then re-run the WHOLE job with the same runId
    // (the 2 committed batches resume via partition lineage, the rest
    // merge fresh) — must equal the one-shot cascade bit-for-bit.
    // 5-day slice keeps the batch count honest (≥2) without turning
    // the catalog bench into 90 merges.
    "q_tier_merge" -> ((s, dir) => {
      val pts = tierMergeSlice(s, dir)
      val root = freshDir(s"graft_qtm_${math.abs(dir.hashCode).toString}")
      val job = new graft.tables.RollupJob(s, root, nBuckets = 4)
      job.runPartial(pts, "qtm_run", maxBatches = 2) // "crash" after 2 days
      job.run(pts, "qtm_run")                        // resume + finish
      ordered(Rollup.present(job.tier1d.read()))
    }),
    // Incremental snapshot read (readChangesSince — the Iceberg
    // incremental-scan analog): merge days 1–2.5, snapshot, merge the
    // rest (rewriting the half-done Jan-3 partitions AND creating
    // Jan 4–5); the changes read must return the CURRENT contents of
    // exactly the partitions batch 2 touched — i.e. the full Jan 3–5
    // rollup including batch 1's Jan-3 morning rows (merged content,
    // not just the delta's input), and nothing from the carried-
    // forward Jan 1–2. nBuckets = 1 makes the changed-partition set
    // day-determined BY CONSTRUCTION at every SF (at sf0.001 a day
    // has ~12 active keys, so "batch 2 hits every key bucket" would
    // be an unverifiable hash assumption with more buckets); the
    // bucket dimension of the changes scan is pinned by the
    // TierTableSpec readChangesSince test at nBuckets = 4.
    "q_tier_changes" -> ((s, dir) => {
      val pts = tierMergeSlice(s, dir)
      val root = freshDir(s"graft_qtc_${math.abs(dir.hashCode).toString}")
      val t = new graft.tables.TierTable(s, s"$root/t1m", nBuckets = 1)
      val mid = lit(tierChangesMid).cast(pts.schema("ts").dataType)
      t.merge(Rollup.rollupRaw(pts.where(col("ts") < mid), "minute"), "qtc_b1")
      val v1 = t.currentVersion
      t.merge(Rollup.rollupRaw(pts.where(col("ts") >= mid), "minute"), "qtc_b2")
      ordered(Rollup.present(t.readChangesSince(v1)))
    }),
    // Time travel (readAt — the Iceberg snapshot-read analog):
    // merge the pre-noon slice, commit, merge the rest, then read AS
    // OF the first version — committed files are immutable, so the
    // historical view must equal the batch-1-only rollup byte-for-
    // byte no matter what later commits did to the same partitions
    // (Jan 3 was REWRITTEN by batch 2 — the old dir still serves v1).
    "q_tier_timetravel" -> ((s, dir) => {
      val pts = tierMergeSlice(s, dir)
      val root = freshDir(s"graft_qtt_${math.abs(dir.hashCode).toString}")
      val t = new graft.tables.TierTable(s, s"$root/t1m", nBuckets = 1)
      val mid = lit(tierChangesMid).cast(pts.schema("ts").dataType)
      t.merge(Rollup.rollupRaw(pts.where(col("ts") < mid), "minute"), "qtt_b1")
      val v1 = t.currentVersion
      t.merge(Rollup.rollupRaw(pts.where(col("ts") >= mid), "minute"), "qtt_b2")
      ordered(Rollup.present(t.readAt(v1)))
    }),
    // Per-partition lineage + metrics (partitionMetrics — the Iceberg
    // metadata-table analog): after two merges whose day coverage
    // overlaps on exactly one partition, the manifest's RECORDED
    // row counts must equal an independent recount of the rollup, and
    // the lineage depth must equal the number of runs that touched
    // each day (Jan 3 straddles the noon cut → rewritten → 2 runs;
    // every other day → 1). No data file is read on the Spark side —
    // the metrics row certifies that commit-time metadata IS the
    // truth, which is what makes metadata-only counts/audits safe at
    // 100 TB. nBuckets = 1 (the q_tier_changes discipline) so the
    // partition set is day-determined at every SF; the bucket
    // dimension is spec-pinned at nBuckets = 4 in TierTableSpec.
    "q_tier_metrics" -> ((s, dir) => {
      val pts = tierMergeSlice(s, dir)
      val root = freshDir(s"graft_qpm_${math.abs(dir.hashCode).toString}")
      val t = new graft.tables.TierTable(s, s"$root/t1m", nBuckets = 1)
      val mid = lit(tierChangesMid).cast(pts.schema("ts").dataType)
      t.merge(Rollup.rollupRaw(pts.where(col("ts") < mid), "minute"), "qpm_b1")
      t.merge(Rollup.rollupRaw(pts.where(col("ts") >= mid), "minute"), "qpm_b2")
      ordered(t.partitionMetrics.select(
        col("pd"), col("n_rows"), col("n_runs")))
    }),
    // Key-level DELETE (deleteKeys — the Iceberg copy-on-write DELETE
    // analog / right-to-be-forgotten): merge the 5-day slice, delete
    // two user keys, read — must equal the rollup computed WITHOUT
    // those users' events, byte-for-byte, while partitions that never
    // held them carry forward by reference (pruning spec-pinned at
    // nBuckets = 4 in TierTableSpec; certified content-wise here).
    "q_tier_delete" -> ((s, dir) => {
      val pts = tierMergeSlice(s, dir)
      val root = freshDir(s"graft_qtd_${math.abs(dir.hashCode).toString}")
      val t = new graft.tables.TierTable(s, s"$root/t1m", nBuckets = 4)
      t.merge(Rollup.rollupRaw(pts, "minute"), "qtd_b1")
      t.deleteKeys(Seq("1", "2"), "qtd_del")
      ordered(Rollup.present(t.read()))
    }),
    // Predicate DELETE (deleteWhere — the general Iceberg DELETE WHERE
    // analog): partial forget of ONE key's early days. The engine
    // deletes rollup rows where (key = '1' AND bucket < Jan 3) via a
    // pushdown discovery scan + rewrite of only file-hit partitions;
    // the oracle filters the same rollup by NOT(pred).
    "q_tier_delete_where" -> ((s, dir) => {
      val pts = tierMergeSlice(s, dir)
      val root = freshDir(s"graft_qtw_${math.abs(dir.hashCode).toString}")
      val t = new graft.tables.TierTable(s, s"$root/t1m", nBuckets = 4)
      t.merge(Rollup.rollupRaw(pts, "minute"), "qtw_b1")
      val cut = lit("2024-01-03 00:00:00").cast(pts.schema("ts").dataType)
      t.deleteWhere(col("key") === "1" && col("bucket") < cut, "qtw_del")
      ordered(Rollup.present(t.read()))
    }),
    // Merge-on-read twin (deleteKeysLazy — the Iceberg v2 equality-
    // delete analog): the SAME result must come from an O(1) tombstone
    // commit + the masked read (broadcast anti-join at scan time, no
    // partition rewritten) — certified against the identical oracle as
    // the copy-on-write row above; the applyTombstones equivalence and
    // the countRows/incremental-scan caveats are spec-pinned.
    "q_tier_delete_lazy" -> ((s, dir) => {
      val pts = tierMergeSlice(s, dir)
      val root = freshDir(s"graft_qtl_${math.abs(dir.hashCode).toString}")
      val t = new graft.tables.TierTable(s, s"$root/t1m", nBuckets = 4)
      t.merge(Rollup.rollupRaw(pts, "minute"), "qtl_b1")
      t.deleteKeysLazy(Seq("1", "2"), "qtl_del")
      ordered(Rollup.present(t.read()))
    }),
    // Streaming twin of the cascade (r2 verdict next-#7): replay the
    // events table as a bounded file stream in ≥3 micro-batches
    // through StreamingRollup.cascadeWriter (foreachBatch MERGE with
    // runId/batchId lineage); the final 1m tier must hash-match the
    // batch q_rollup_1m oracle on the same input.
    "q_streaming_rollup" -> ((s, dir) => {
      val base = freshDir(s"graft_qsr_${math.abs(dir.hashCode).toString}")
      val ev = graft.Tables.events(s, dir)
      (0 until 3).foreach { i =>
        ev.where(pmod(xxhash64(col("event_id")), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(s"$base/in")
      }
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      val q = graft.streaming.StreamingRollup
        .cascadeWriter(Signals.fromEvents(stream), s"$base/tiers", "qsr_run", nBuckets = 4)
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      val t1m = new graft.tables.TierTable(s, s"$base/tiers/tier_1m", nBuckets = 4)
      ordered(Rollup.present(t1m.read()))
    }),
    // Stateful streaming latency derive (StreamingLatency): transcripts
    // replayed as a file stream chunked by turn_idx RANGES (per-conv
    // in-order arrival across micro-batches — the operator's contract),
    // lag state carried across batches by flatMapGroupsWithState
    // (NoTimeout: bounded replay, CLAUDE.md discipline); must equal the
    // batch lag-window derivation bit-for-bit.
    "q_streaming_latency" -> ((s, dir) => {
      import s.implicits._
      val base = freshDir(s"graft_qsl_${math.abs(dir.hashCode).toString}")
      val tr = graft.Tables.transcripts(s, dir)
        .select(col("conv_id"), col("turn_idx"), col("ts").cast("timestamp").as("ts"))
      // FileStreamSource orders files by modification time (ms
      // granularity, no write-order tiebreak) — fast sequential local
      // writes can land in the same millisecond, so each chunk's files
      // get an EXPLICIT increasing mtime (60 s apart) to pin the
      // replay order the operator's in-order contract requires
      var stamped = Set.empty[String]
      Seq(col("turn_idx") < 4,
          col("turn_idx") >= 4 && col("turn_idx") < 9,
          col("turn_idx") >= 9)
        .zipWithIndex.foreach { case (p, i) =>
          tr.where(p).coalesce(1).write.mode("append").parquet(s"$base/in")
          val files = Option(new java.io.File(s"$base/in").listFiles()).getOrElse(Array())
            .filter(_.getName.endsWith(".parquet"))
          files.filterNot(f => stamped(f.getName)).foreach(
            _.setLastModified(1700000000000L + i * 60000L))
          stamped ++= files.map(_.getName)
        }
      val stream = s.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
        .as[graft.streaming.StreamingLatency.TurnEvent]
      val name = s"qsl_${math.abs(base.hashCode).toString}"
      val q = graft.streaming.StreamingLatency.latencyPoints(stream, timeoutMs = 0)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).where(col("v").isNotNull)
        // back to NTZ so the dump's dtype matches the naive oracle
        // timestamps (session TZ pinned UTC → identity on wall time)
        .select(col("key"), col("ts").cast("timestamp_ntz").as("ts"),
          col("v").as("latency_ms"))
        .orderBy("key", "ts", "latency_ms")
    }),
    // Agent-transcript analytics: the full role-transition matrix with
    // exact-decimal latency stats per (from_role, to_role) — response
    // time (user→assistant), tool-call overhead (→tool / tool→), etc.
    // Rollup exactness discipline: decimal(18,6)-quantize each latency
    // BEFORE the sum. The corpus-wide sums reach ~1e10 ms (unscaled
    // > 2^53 — the zone where DuckDB's wide-decimal→double cast is not
    // correctly rounded and no rescale can help, since 6 IS the true
    // scale), so the sum is presented as its canonical decimal STRING
    // (exact and identical in both engines — the md5-hex portability
    // discipline applied to decimals); no double sum/mean/std
    // presentation (the cancelled-1e7-magnitude class). min/max ride
    // the per-row doubles q_latency_derive already hash-certifies.
    "q_role_transitions" -> ((s, dir) => {
      val tr = Signals.roleTransitions(Tables.transcripts(s, dir))
      ordered(tr.groupBy(col("from_role"), col("to_role"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("latency_ms").cast("decimal(18,6)")).as("__s"),
          min(col("latency_ms")).as("min_ms"),
          max(col("latency_ms")).as("max_ms"))
        .select(col("from_role"), col("to_role"), col("cnt"),
          col("__s").cast("string").as("sum_ms"),
          col("min_ms"), col("max_ms")))
    }),
    "q_text_digest" -> ((s, dir) =>
      // shuffle-order-proof digest: collect (turn_idx, text) pairs,
      // sort inside the aggregate, then hash — FIXTURES.md §B.6
      // "per-turn text equality under stable (conv_id, turn_idx)
      // order".
      Tables.transcripts(s, dir)
        .groupBy(col("conv_id"))
        .agg(
          sha2(expr(
            "concat_ws('', transform(array_sort(collect_list(struct(turn_idx, text))), s -> s.text))"),
            256).as("digest"),
          count(lit(1)).as("n_turns"))
        .orderBy("conv_id")),
  )

  private val tierMergeCut = "2024-01-06 00:00:00"
  private val tierChangesMid = "2024-01-03 12:00:00"

  /** First-5-days slice of the event points (ts-range predicate on
    * the raw column → pushes into the scan). */
  private def tierMergeSlice(s: SparkSession, dir: String): DataFrame = {
    val p = eventPoints(s, dir)
    p.where(col("ts") < lit(tierMergeCut).cast(p.schema("ts").dataType))
  }

  /** Fresh (deleted-if-present) temp dir for stateful query fixtures. */
  private def freshDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), name)
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  val oracles: Map[String, String] = Map(
    "q_tier_merge" ->
      s"""${ev1mCteWhere(s"WHERE ts < TIMESTAMP '$tierMergeCut'")}, ${cascadeCte("r1h", "r1m", "hour")}, ${cascadeCte("r1d", "r1h", "day")} ${presentSql("r1d")}""",
    // changes since the mid-snapshot = current contents of the
    // partitions batch 2 rewrote or created = the full rollup of the
    // days batch 2 touched (Jan 3 from 00:00 — the rewritten
    // partitions carry batch 1's morning rows too)
    "q_tier_changes" ->
      s"""${ev1mCteWhere(s"WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '$tierMergeCut'")} ${presentSql("r1m")}""",
    // delete: the post-delete table is the rollup of everyone else
    "q_tier_delete" ->
      s"""${ev1mCteWhere(s"WHERE ts < TIMESTAMP '$tierMergeCut' AND CAST(user_id AS VARCHAR) NOT IN ('1', '2')")} ${presentSql("r1m")}""",
    // predicate delete: the rollup minus the pred = TRUE rows
    "q_tier_delete_where" ->
      s"""${ev1mCteWhere(s"WHERE ts < TIMESTAMP '$tierMergeCut'")} ${presentSql(
        "(SELECT * FROM r1m WHERE NOT (key = '1' AND bucket < TIMESTAMP '2024-01-03 00:00:00')) f")}""",
    // lazy delete: identical result through the tombstone-masked read
    "q_tier_delete_lazy" ->
      s"""${ev1mCteWhere(s"WHERE ts < TIMESTAMP '$tierMergeCut' AND CAST(user_id AS VARCHAR) NOT IN ('1', '2')")} ${presentSql("r1m")}""",
    // time travel: the v1 snapshot is exactly the pre-noon rollup
    "q_tier_timetravel" ->
      s"""${ev1mCteWhere(s"WHERE ts < TIMESTAMP '$tierChangesMid'")} ${presentSql("r1m")}""",
    // metrics: recount the 1m rollup per day; lineage depth = how many
    // of the two run windows the day's buckets straddle (the noon cut
    // is minute-aligned, so bucket-level classification equals the
    // ts-level batch membership that decided which run wrote the row)
    "q_tier_metrics" ->
      s"""${ev1mCteWhere(s"WHERE ts < TIMESTAMP '$tierMergeCut'")}
         |SELECT strftime(bucket, '%Y-%m-%d') AS pd,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(MAX(CASE WHEN bucket < TIMESTAMP '$tierChangesMid' THEN 1 ELSE 0 END) +
         |            MAX(CASE WHEN bucket >= TIMESTAMP '$tierChangesMid' THEN 1 ELSE 0 END) AS INT) AS n_runs
         |FROM r1m GROUP BY 1 ORDER BY pd, n_rows, n_runs""".stripMargin,
    "q_streaming_rollup" -> s"$ev1mCte ${presentSql("r1m")}",
    "q_rollup_1m" -> s"$ev1mCte ${presentSql("r1m")}",
    "q_rollup_1h_cascade" ->
      s"""$ev1mCte, ${cascadeCte("r1h", "r1m", "hour")} ${presentSql("r1h")}""",
    "q_rollup_1d_cascade" ->
      s"""$ev1mCte, ${cascadeCte("r1h", "r1m", "hour")}, ${cascadeCte("r1d", "r1h", "day")} ${presentSql("r1d")}""",
    "q_latency_derive" ->
      s"""${Oracle.transcriptsCte}
         |SELECT conv_id AS key, ts,
         |       (epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx))) / 1000.0 AS latency_ms
         |FROM transcripts QUALIFY latency_ms IS NOT NULL
         |ORDER BY key, ts, latency_ms""".stripMargin,
    "q_streaming_latency" ->
      s"""${Oracle.transcriptsCte}
         |SELECT conv_id AS key, ts,
         |       (epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx))) / 1000.0 AS latency_ms
         |FROM transcripts QUALIFY latency_ms IS NOT NULL
         |ORDER BY key, ts, latency_ms""".stripMargin,
    "q_transcript_rollup_1m" ->
      s"""${Oracle.transcriptsCte}, tpts AS (
         |  SELECT conv_id AS key, ts,
         |         (epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx))) / 1000.0 AS v
         |  FROM transcripts
         |), r1m AS (
         |  SELECT key, date_trunc('minute', ts) AS bucket,
         |         COUNT(*) AS cnt,
         |         SUM(CAST(v AS DECIMAL(18,6))) AS sum_d,
         |         SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(18,6))) AS sumsq_d,
         |         MIN(v) AS min_v, MAX(v) AS max_v
         |  FROM tpts WHERE v IS NOT NULL GROUP BY 1, 2
         |) ${presentSql("r1m", withStd = false)}""".stripMargin,
    "q_role_transitions" ->
      s"""${Oracle.transcriptsCte},
         |tr AS (
         |  SELECT lag(role) OVER w AS from_role, role AS to_role,
         |         (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1000.0 AS latency_ms
         |  FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
         |)
         |SELECT from_role, to_role, COUNT(*) AS cnt,
         |       CAST(SUM(CAST(latency_ms AS DECIMAL(18,6))) AS VARCHAR) AS sum_ms,
         |       MIN(latency_ms) AS min_ms, MAX(latency_ms) AS max_ms
         |FROM tr WHERE from_role IS NOT NULL
         |GROUP BY 1, 2
         |ORDER BY from_role, to_role, cnt, sum_ms, min_ms, max_ms""".stripMargin,
    "q_text_digest" ->
      s"""${Oracle.transcriptsCte}
         |SELECT conv_id,
         |       sha256(string_agg(text, '' ORDER BY turn_idx)) AS digest,
         |       COUNT(*) AS n_turns
         |FROM transcripts GROUP BY conv_id ORDER BY conv_id""".stripMargin,
  )
}
