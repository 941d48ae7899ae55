package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CodecExpressions._

/** Chunked compressed segments — the retention-tier storage form
  * (FIXTURES.md §A.3; thunder's Blocks analogue, thunder/blocks/
  * blocks.py :: Blocks, re-imagined as columnar chunk structs).
  *
  * One segment row per (key, coarse bucket): timestamps delta-of-delta
  * encoded, values Gorilla XOR encoded, plus the same mergeable stats
  * as rollup rows so tier queries can be answered from segment
  * metadata without decoding.
  *
  * Scale shape: `collect_list` is bounded by one key×bucket extent
  * (e.g. one conversation-day), so segment construction is a single
  * hash aggregate — same shuffle as the rollup itself. Decoding is
  * `explode(arrays_zip(...))`, partition-local.
  */
object Segments {

  def toSegments(points: DataFrame, unit: String = "day"): DataFrame = {
    val vd = col("v").cast("decimal(18,6)")
    points
      .where(col("v").isNotNull)
      .select(col("key"), Rollup.bucket(col("ts"), unit).as("bucket"),
        unix_micros(col("ts").cast("timestamp")).as("t_us"), col("v"))
      .groupBy(col("key"), col("bucket"))
      .agg(
        sort_array(collect_list(struct(col("t_us"), col("v")))).as("pts"),
        count(lit(1)).cast("int").as("n"),
        sum(col("v").cast("decimal(18,6)")).as("sum_d"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .select(
        col("key"), col("bucket"), col("n"),
        timestamp_micros(element_at(col("pts"), 1).getField("t_us")).as("first_ts"),
        timestamp_micros(element_at(col("pts"), -1).getField("t_us")).as("last_ts"),
        dod_encode(col("pts").getField("t_us")).as("ts_enc"),
        gorilla_encode(col("pts").getField("v")).as("val_enc"),
        col("sum_d"), col("min_v"), col("max_v"))
  }

  /** Decode segments back to tall points (bit-exact round trip). */
  def fromSegments(segments: DataFrame): DataFrame =
    segments
      .select(col("key"),
        explode(arrays_zip(
          dod_decode(col("ts_enc")).as("t_us"),
          gorilla_decode(col("val_enc")).as("v"))).as("p"))
      .select(col("key"),
        timestamp_micros(col("p.t_us")).as("ts"),
        col("p.v").as("v"))
}
