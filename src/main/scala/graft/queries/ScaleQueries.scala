package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.synth.TranscriptGen
import Q._

/** Scale-path queries: salted skew-proof aggregation (oracle: must
  * equal the plain rollup bit-for-bit), ingest-layout digest
  * invariance, synthetic-transcript pipeline, multimodal plumbing.
  * Synth/multimodal run on generated data (driver tables don't carry
  * them) → rows-only checks; their semantics are ScalaTest-pinned. */
object ScaleQueries extends QuerySet {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_rollup" -> ((s, dir) =>
      ordered(Rollup.present(
        Skew.saltedRollup(eventPoints(s, dir), "minute", salt = 8, saltFor = None)))),
    "q_ingest_digest_invariance" -> ((s, dir) => {
      // digests after the ingest shuffle — oracle recomputes from the
      // raw transcripts view; equality IS the B.6 invariant
      val tr = graft.Tables.transcripts(s, dir)
      Ingest.digests(Ingest.layout(tr, nBuckets = 8, nPartitions = 16)
          .select("conv_id", "turn_idx", "role", "text", "tool", "ts"))
        .orderBy("conv_id")
    }),
    // rows-only: synthetic 10^12-design pipeline at test scale
    "q_synth_cascade" -> ((s, dir) => {
      val tr = TranscriptGen.turns(s, nTurns = 20000, nConvs = 200, partitions = 8)
      val pts = Signals.latencyPoints(tr)
      ordered(Rollup.present(Rollup.cascadeAll(pts)("1d")).drop("std_v"))
    }),
    "q_multimodal_features" -> ((s, dir) =>
      ordered(Multimodal.featureMeans(
        Multimodal.decodeAndFeaturize(Multimodal.synthMedia(s, 300)))
        .select(col("kind"), col("pos"), round(col("mean"), 6).as("mean"), col("n")))),
  )

  private val saltedOracle: String =
    """WITH r1m AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key,
      |         date_trunc('minute', ts) AS bucket,
      |         COUNT(*) AS cnt,
      |         SUM(CAST(value AS DECIMAL(18,6))) AS sum_d,
      |         SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(18,6))) AS sumsq_d,
      |         MIN(value) AS min_v, MAX(value) AS max_v
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT key, bucket, cnt,
      |       CAST(sum_d AS DOUBLE) AS sum_v,
      |       CAST(sum_d AS DOUBLE) / cnt AS mean_v,
      |       min_v, max_v,
      |       sqrt(greatest(CAST(CAST(sumsq_d AS DECIMAL(38,6)) AS DOUBLE) / cnt -
      |            (CAST(sum_d AS DOUBLE) / cnt) * (CAST(sum_d AS DOUBLE) / cnt), 0.0)) AS std_v
      |FROM r1m ORDER BY key, bucket""".stripMargin

  val oracles: Map[String, String] = Map(
    // a salted two-phase aggregate must be indistinguishable from the
    // plain one — same oracle as q_rollup_1m
    "q_salted_rollup" -> saltedOracle,
    "q_ingest_digest_invariance" ->
      s"""${graft.Oracle.transcriptsCte}
         |SELECT conv_id,
         |       sha256(string_agg(text, '' ORDER BY turn_idx)) AS digest,
         |       COUNT(*) AS n_turns
         |FROM transcripts GROUP BY conv_id ORDER BY conv_id""".stripMargin,
  )
}
