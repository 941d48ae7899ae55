package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic synthetic transcript generator — the engine's
  * `fromrandom` (thunder/series/readers.py :: fromrandom: seeded
  * synthetic data) scaled to the 10^12-turn design point.
  *
  * Everything derives from `spark.range(n)` + xxhash64(id, seed):
  * no wall clock, no RNG state, so any row can be regenerated
  * independently on any executor — the property that lets the same
  * code synthesize 6e3 rows in a test and 1e12 rows on a cluster
  * (range is split into partitions; each partition materializes only
  * its own ids).
  *
  * Skew: conversation sizes follow a power law (hash^k mapping), so
  * a few conversations are orders of magnitude hotter than the rest —
  * the north_rule's hot-conversation skew is generated, not assumed.
  *
  * Schema = BASELINE.json input_hint:
  * (conv_id string, turn_idx int, role string, text string,
  *  tool string, ts timestamp).
  */
object TranscriptGen {

  val BASE_US = 1704067200000000L // 2024-01-01T00:00:00Z

  /** Uniform double in [0,1) from a column, via xxhash64. */
  private def u01(c: org.apache.spark.sql.Column, seed: Int) =
    (pmod(xxhash64(c, lit(seed)), lit(1L << 40)).cast("double") / (1L << 40).toDouble)

  /**
    * @param nTurns    total rows
    * @param nConvs    number of distinct conversations
    * @param skew      power-law exponent (0 = uniform, 2–4 = heavy head)
    * @param partitions range partitions (→ executor parallelism)
    */
  def turns(spark: SparkSession, nTurns: Long, nConvs: Long,
      skew: Double = 3.0, seed: Int = 42, partitions: Int = 32): DataFrame = {
    val ids = spark.range(0, nTurns, 1, partitions)
    // power-law conversation assignment: u^skew concentrates mass at 0
    val conv = floor(pow(u01(col("id"), seed), lit(skew)) * nConvs).cast("long")
    val wConv = Window.partitionBy(col("conv")).orderBy(col("id"))
    ids
      .withColumn("conv", conv)
      .withColumn("turn_idx", (row_number().over(wConv) - 1).cast("int"))
      // per-turn gap: log-uniform 1s .. ~2h, deterministic per id
      .withColumn("gap_us",
        (pow(lit(10.0), u01(col("id"), seed + 1) * 3.85) * 1000000.0).cast("long"))
      .withColumn("ts_us",
        lit(BASE_US) + (col("conv") % 86400) * 1000000L +
          sum(col("gap_us")).over(wConv.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("role",
        when(col("turn_idx") % 2 === 0, "user")
          .when(pmod(xxhash64(col("id"), lit(seed + 2)), lit(5L)) === 0, "tool")
          .otherwise("assistant"))
      .select(
        concat(lit("c"), col("conv").cast("string")).as("conv_id"),
        col("turn_idx"),
        col("role"),
        // deterministic pseudo-text, 32–224 chars, content a pure
        // function of (conv_id, turn_idx) → the text-equality
        // invariant is checkable after any shuffle
        concat_ws(" ",
          md5(concat(col("conv").cast("string"), lit(":"), col("turn_idx").cast("string"))),
          repeat(md5(concat(lit("p"), col("conv").cast("string"), lit(":"),
            col("turn_idx").cast("string"))),
            (pmod(xxhash64(col("id"), lit(seed + 3)), lit(6L)) + 1).cast("int"))).as("text"),
        when(col("role") === "tool",
          element_at(array(lit("search"), lit("exec"), lit("browse")),
            (pmod(xxhash64(col("id"), lit(seed + 4)), lit(3L)) + 1).cast("int")))
          .otherwise(lit(null).cast("string")).as("tool"),
        timestamp_micros(col("ts_us")).as("ts"))
  }
}
