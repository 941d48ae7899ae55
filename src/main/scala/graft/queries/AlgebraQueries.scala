package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import Q._

/** Element-wise Series algebra + generic grouped aggregation +
  * sketched tier queries. */
object AlgebraQueries extends QuerySet {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // element_wise(minus): series minus its clipped self — exercises
    // the (key, ts) equi-join; residual is expressible row-wise in SQL
    "q_elementwise_minus" -> ((s, dir) => {
      val p = eventPoints(s, dir)
      ordered(SeriesAlgebra.minus(p, SeriesOps.clip(p, 5.0, 100.0))
        .select("key", "ts", "v"))
    }),
    "q_elementwise_dottimes" -> ((s, dir) => {
      val p = eventPoints(s, dir)
      ordered(SeriesAlgebra.dottimes(p, p).select("key", "ts", "v"))
    }),
    "q_aggregate_by_index" -> ((s, dir) =>
      // aggregate_by_index with label = day-of-month, fn = max
      ordered(SeriesAlgebra.aggregateByIndex(eventPoints(s, dir),
        dayofmonth(col("ts")).cast("int"), max(col("v"))))),
    // rows-only: sampling is engine-specific; sketched tiers are
    // approximate (ScalaTest asserts kll_n == cnt and quantile bounds)
    "q_sample" -> ((s, dir) =>
      ordered(SeriesAlgebra.sample(eventPoints(s, dir), 0.1, seed = 7)
        .select("key", "ts", "v"))),
    // top-k hot keys (SURVEY §2.6 limit/top-k; feeds salting decisions)
    "q_top_keys" -> ((s, dir) =>
      eventPoints(s, dir).groupBy(col("key"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("v").cast("decimal(18,6)")).cast("double").as("sum_v"))
        .orderBy(desc("cnt"), col("key")).limit(10)),
    // anti join: keys active in the first week but silent in the second
    "q_anti_join" -> ((s, dir) => {
      val p = eventPoints(s, dir)
      val w1 = p.where(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp_ntz"))
      val w2 = p.where(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
      w1.select("key").distinct()
        .join(w2.select("key").distinct(), Seq("key"), "left_anti")
        .orderBy("key")
    }),
    "q_neardup_verified" -> ((s, dir) =>
      ordered(Dedup.nearDuplicates(graft.Tables.documents(s, dir), 0.5)
        .select(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard"), col("canonical_id")))),
    "q_tier_kll_cascade" -> ((s, dir) => {
      val m1 = SketchedRollup.rollupRaw(eventPoints(s, dir), "minute")
      val d1 = SketchedRollup.cascade(SketchedRollup.cascade(m1, "hour"), "day")
      ordered(SketchedRollup.present(d1).select(
        col("key"), col("bucket"), col("cnt"), col("kll_n"),
        round(col("p50"), 6).as("p50"), round(col("p90"), 6).as("p90")))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_elementwise_minus" ->
      s"""$ptsCte SELECT key, ts, v - greatest(least(v, 100.0), 5.0) AS v
         |FROM pts ORDER BY key, ts, v""".stripMargin,
    "q_elementwise_dottimes" ->
      s"""$ptsCte SELECT key, ts, v * v AS v
         |FROM pts ORDER BY key, ts, v""".stripMargin,
    "q_aggregate_by_index" ->
      s"""$ptsCte SELECT key, CAST(day(ts) AS INT) AS label, MAX(v) AS v
         |FROM pts GROUP BY 1, 2 ORDER BY key, label, v""".stripMargin,
    "q_top_keys" ->
      s"""$ptsCte SELECT key, COUNT(*) AS cnt,
         |  CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
         |FROM pts GROUP BY key ORDER BY cnt DESC, key LIMIT 10""".stripMargin,
    "q_anti_join" ->
      s"""$ptsCte
         |SELECT DISTINCT key FROM pts WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
         |EXCEPT
         |SELECT DISTINCT key FROM pts
         |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
         |ORDER BY key""".stripMargin,
    // q_neardup_verified: LSH candidates use Spark xxhash64 signatures
    // (not SQL-reproducible) → rows-only; jaccard verification itself
    // is oracle-checked by q_ngram_jaccard.
  )
}
