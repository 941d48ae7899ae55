package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest layout: the engine's one structural shuffle — thunder's
  * Images→Series "corner turn" (thunder/images/images.py ::
  * Images.toseries via Blocks) re-expressed as an explicit range
  * repartition (north_rule: "explicit range partitioning on (conv_id
  * hash-bucket, ts bucket)").
  *
  * Arrival-ordered transcript rows → partitions keyed by
  * (bucket(conv_id), day(ts)) with rows sorted by (conv_id, turn_idx)
  * inside each partition. Consequences at scale:
  *   - all rows of one conversation-day are co-located → the lag()
  *     latency window and per-conv digests run without another
  *     exchange;
  *   - the day component gives time-pruning at the file level when
  *     the layout is persisted (partition transforms bucket×days);
  *   - hash-bucketing conv_id spreads hot conversations' *different
  *     days* across partitions, while `nBuckets` bounds fan-out.
  */
object Ingest {

  def layout(transcripts: DataFrame, nBuckets: Int, nPartitions: Int): DataFrame =
    transcripts
      .withColumn("conv_bucket", pmod(xxhash64(col("conv_id")), lit(nBuckets.toLong)).cast("int"))
      .withColumn("ts_day", date_trunc("day", col("ts")))
      .repartitionByRange(nPartitions, col("conv_bucket"), col("ts_day"))
      .sortWithinPartitions(col("conv_bucket"), col("ts_day"), col("conv_id"), col("turn_idx"))

  /** Persist the ingest layout as a bucketed + sorted table: conv_id
    * hash-bucketed (one file per bucket) and (conv_id, turn_idx)
    * sorted inside buckets. Downstream consequence (asserted by
    * BucketedCascadeSpec): the per-conversation lag() window, the
    * rollup groupBy, and every tier cascade are all satisfied by this
    * layout — the ENTIRE retention cascade executes with zero shuffle
    * exchanges. Pay the corner-turn once at ingest, amortize forever.
    */
  def writeBucketed(transcripts: DataFrame, name: String, path: String,
      buckets: Int): Unit =
    transcripts
      .repartition(buckets, col("conv_id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "conv_id").sortBy("conv_id", "turn_idx")
      .option("path", path).saveAsTable(name)

  /** Register an existing bucketed-layout location in this session's
    * catalog (bucket metadata lives in the catalog, so each new
    * session re-declares it over the shared files). */
  def registerBucketed(spark: org.apache.spark.sql.SparkSession, name: String,
      path: String, buckets: Int): Unit =
    spark.sql(s"""CREATE TABLE IF NOT EXISTS $name (
      conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP_NTZ)
      USING parquet CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx)
      INTO $buckets BUCKETS LOCATION '$path'""")

  /** Per-conversation digest of turn texts under stable
    * (conv_id, turn_idx) ordering — FIXTURES.md §B.6. Sorting happens
    * inside the aggregate, so the digest is invariant to any physical
    * layout; comparing digests before/after `layout` proves the
    * shuffle preserved per-turn text equality. */
  def digests(transcripts: DataFrame): DataFrame =
    transcripts
      .groupBy(col("conv_id"))
      .agg(
        sha2(expr(
          "concat_ws('', transform(array_sort(collect_list(struct(turn_idx, text))), s -> s.text))"),
          256).as("digest"),
        count(lit(1)).as("n_turns"))
}
