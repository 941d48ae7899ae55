package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata structs, plus the
  * decode/feature-extract stages a training pipeline runs over them.
  *
  * The decode kernels themselves are STUBBED (this container ships no
  * image/audio libraries — clearly marked below); everything Spark-
  * side is real and tested: schema, batch shape, partition-local
  * mapPartitions execution, and deterministic fake decoding so
  * downstream operators (resize metadata, frame sampling, feature
  * stats) exercise true plumbing.
  *
  * At scale: payload columns ride in the same parquet row groups as
  * metadata; `spark.sql.files.maxPartitionBytes` bounds per-task
  * bytes; decode is mapPartitions (no shuffle) and feature columns
  * are small, so only features ever reach an exchange.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,            // image | audio | video
      payload: Array[Byte],    // opaque encoded bytes
      width: Int, height: Int, // declared metadata
      sample_rate: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      decoded_ok: Boolean,
      out_width: Int,
      out_height: Int,
      n_sampled_frames: Int,
      feature: Array[Double]) // fixed-width feature vector

  /** Deterministic synthetic media table: payload bytes derived from
    * media_id (stands in for real encoded blobs). */
  def synthMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val rng = new scala.util.Random(id)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val payload = Array.fill[Byte](256 + (id % 512).toInt)(rng.nextInt().toByte)
      MediaRow(id, kind, payload,
        width = 64 + (id % 8).toInt * 32, height = 64 + (id % 5).toInt * 32,
        sample_rate = 16000, n_frames = 1 + (id % 30).toInt)
    }
  }

  /** ??? STUB ???  — real implementation would call an image/audio
    * codec (e.g. libjpeg / ffmpeg) here. This deterministic fake
    * hashes payload bytes into a fixed-width "feature" so the
    * pipeline's correctness (schema, batching, determinism) is
    * testable without the native libs. */
  private def decodeStub(row: MediaRow, targetW: Int, targetH: Int,
      frameStride: Int): MediaFeatures = {
    val h = row.payload.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    val feat = Array.tabulate(8)(i => ((h >>> (i * 8)) & 0xFF).toDouble / 255.0)
    MediaFeatures(row.media_id, row.kind, decoded_ok = true,
      out_width = math.min(row.width, targetW),
      out_height = math.min(row.height, targetH),
      n_sampled_frames =
        if (row.kind == "video") (row.n_frames + frameStride - 1) / frameStride else 1,
      feature = feat)
  }

  /** Decode + resize + frame-sample + featurize, partition-local.
    * (mapPartitions so a real decoder could amortize per-partition
    * codec init — the standard shape for Pandas-UDF/mapInPandas
    * pipelines, here JVM-native.) */
  def decodeAndFeaturize(media: Dataset[MediaRow], targetW: Int = 224,
      targetH: Int = 224, frameStride: Int = 10): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec init" would go here
      it.map(decodeStub(_, targetW, targetH, frameStride))
    }
  }

  /** Feature-level aggregate: per kind, element-wise mean of the
    * feature vectors (posexplode + group — the across-record mean of
    * SURVEY.md §2.3 applied to multimodal features). */
  def featureMeans(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .select(col("kind"), posexplode(col("feature")))
      .groupBy(col("kind"), col("pos"))
      .agg(avg(col("col")).as("mean"), count(lit(1)).as("n"))
}
