package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for pipeline-family benchmarks at
  * realistic cardinality (r3 verdict next-#2: dedup/ANN were only
  * ever certified at ~5k docs / ~1k vectors). Everything derives from
  * xxhash64(ids), so any scale regenerates bit-identically and
  * generation is a pure distributed projection (no driver data, no
  * RNG state).
  *
  * Planted structure in `documents` (the ground truth the bench
  * measures recall/ratios against):
  *   - ids in [0, 0.8n): unique texts (seeded token sequences);
  *   - [0.8n, 0.9n): EXACT duplicates of id − 0.8n;
  *   - [0.9n, n): NEAR duplicates of id − 0.9n (first token flipped);
  *   - ids ≡ 0 (mod 500): boilerplate — one shared template, the
  *     degenerate hot-bucket content real corpora always carry (what
  *     the occupancy caps exist for).
  *
  * `embeddings` are clustered: `clusterSize` vectors per center,
  * center components ~U[-1,1], noise ~U[-0.1,0.1] → intra-cluster
  * cosine ≈ 0.99 (true near-dups), inter-cluster ≈ 0.
  */
object DocGen {

  def documents(spark: SparkSession, n: Long, vocab: Int = 50000,
      partitions: Int = 64): DataFrame = {
    val u = n * 8 / 10
    val d = n * 9 / 10
    val boiler = (0 until 30).map(j => s"w${j * 37 % 100}").mkString(" ")
    spark.range(0, n, 1, partitions)
      .select(col("id").as("doc_id"),
        when(col("id") < u, col("id"))
          .when(col("id") < d, col("id") - u)
          .otherwise(col("id") - d).as("cid"),
        (col("id") >= d).as("flip"))
      .select(col("doc_id"),
        when(col("doc_id") % 500 === 0, lit(boiler)).otherwise(
          concat_ws(" ", transform(
            sequence(lit(0),
              (lit(19) + pmod(xxhash64(col("cid"), lit(1)), lit(41))).cast("int")),
            j => concat(lit("w"),
              when(col("flip") && j === 0, lit("FLIP"))
                .otherwise(pmod(xxhash64(col("cid"), j, lit(2)), lit(vocab))
                  .cast("string"))))))
          .as("text"))
  }

  def embeddings(spark: SparkSession, n: Long, dim: Int = 64,
      clusterSize: Int = 10, partitions: Int = 64): DataFrame =
    spark.range(0, n, 1, partitions)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), dd =>
          (((pmod(xxhash64((col("id") / clusterSize).cast("long"), dd), lit(2001)) - 1000)
              .cast("double") / 1000.0) +
            ((pmod(xxhash64(col("id"), dd, lit(3)), lit(2001)) - 1000)
              .cast("double") / 10000.0)).cast("float"))
          .as("embedding"))
}
