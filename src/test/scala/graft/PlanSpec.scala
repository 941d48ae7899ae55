package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._
import graft.queries.Q

/** Physical-plan quality gates: predicate pushdown, column pruning,
  * shuffle counts, broadcast joins, codegen coverage. These encode
  * the 100 TB design review — a plan regression (extra Exchange, lost
  * pushdown) fails the suite even while results stay correct. */
class PlanSpec extends SparkSpecBase {

  def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString()

  def countOccurrences(s: String, needle: String): Int =
    s.sliding(needle.length).count(_ == needle)

  /** Shuffle exchanges only (BroadcastExchange is not a shuffle). */
  def shuffles(plan: String): Int =
    countOccurrences(plan, "Exchange") - countOccurrences(plan, "BroadcastExchange")

  /** executedPlan.toString marks whole-stage-codegen stages "*(n)". */
  def hasCodegen(plan: String): Boolean = plan.contains("*(")

  test("ts-range filter pushes down to the parquet scan") {
    val df = SeriesOps.between(Q.eventPoints(spark, sf("sf0.001")),
      "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"no pushdown in:\n$plan")
  }

  test("rollup reads only the three needed columns from events") {
    val df = Rollup.rollupRaw(Q.eventPoints(spark, sf("sf0.001")), "minute")
    val plan = planOf(df)
    assert(plan.contains("ReadSchema: struct<ts:timestamp_ntz,user_id:bigint,value:double>"),
      s"column pruning lost:\n$plan")
  }

  test("rollup is a single exchange (map-side partial agg present)") {
    val df = Rollup.rollupRaw(Q.eventPoints(spark, sf("sf0.001")), "minute")
    val plan = planOf(df)
    assert(shuffles(plan) == 1, s"expected 1 shuffle Exchange:\n$plan")
    assert(countOccurrences(plan, "HashAggregate") == 2, // partial + final
      s"expected partial+final HashAggregate:\n$plan")
  }

  test("tier cascade adds exactly one exchange per tier") {
    val m1 = Rollup.rollupRaw(Q.eventPoints(spark, sf("sf0.001")), "minute")
    val plan = planOf(Rollup.cascade(m1, "hour"))
    assert(shuffles(plan) == 2, s"plan:\n$plan")
  }

  test("salted rollup costs exactly one extra exchange") {
    val df = Skew.saltedRollup(Q.eventPoints(spark, sf("sf0.001")), "minute", 8, None)
    val plan = planOf(df)
    assert(shuffles(plan) == 2, s"plan:\n$plan")
  }

  test("mean_by_window broadcasts the centers side") {
    import spark.implicits._
    val centers = Seq(1L, 21L).toDF("center")
    val df = SeriesOps.meanByWindow(Q.eventPoints(spark, sf("sf0.001")), centers, 2)
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centers not broadcast:\n$plan")
  }

  test("text analysis is a pure scan→project pipeline (no exchange)") {
    val df = TextAnalysis.qualityScore(Tables.documents(spark, sf("sf0.001")))
    val plan = planOf(df)
    assert(shuffles(plan) == 0, s"unexpected shuffle:\n$plan")
    assert(hasCodegen(plan), s"no codegen:\n$plan")
  }

  test("simhash is a pure projection (no exchange)") {
    val df = Dedup.simhash(Tables.documents(spark, sf("sf0.001")))
    val plan = planOf(df)
    assert(shuffles(plan) == 0, s"unexpected shuffle:\n$plan")
  }

  test("brute-force knn broadcasts queries; corpus side never shuffles before scoring") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val df = Similarity.bruteForceTopK(e, e.where(col("vec_id") < 3), 5)
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
    // the only exchange is the final per-query top-k window
    assert(shuffles(plan) <= 1, s"plan:\n$plan")
  }

  test("whole-stage codegen covers the rollup aggregate") {
    val df = Rollup.present(Rollup.rollupRaw(Q.eventPoints(spark, sf("sf0.001")), "minute"))
    // AQE: drive THIS queryExecution so its adaptive plan finalizes
    df.queryExecution.executedPlan.executeCollect()
    val plan = planOf(df)
    assert(plan.contains("isFinalPlan=true") && hasCodegen(plan), s"plan:\n$plan")
  }
}
