package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators._
import graft.synth.TranscriptGen

/** The ingest-layout contract: with transcripts stored bucketed by
  * conv_id and sorted by (conv_id, turn_idx), the latency window, the
  * 1m rollup and both tier cascades run with ZERO shuffle exchanges,
  * and the results equal the layout-naive plan bit-for-bit. */
class BucketedCascadeSpec extends SparkSpecBase {

  def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val p = df.queryExecution.executedPlan.toString
    p.sliding("Exchange".length).count(_ == "Exchange") -
      p.sliding("BroadcastExchange".length).count(_ == "BroadcastExchange")
  }

  test("bucketed layout: full cascade has zero shuffles and exact results") {
    val dir = Files.createTempDirectory("graft_bkt_spec").toString
    val tr = TranscriptGen.turns(spark, 50000, 300, partitions = 8)
    Ingest.writeBucketed(tr, "spec_turns_bkt", s"$dir/turns", buckets = 8)

    val bucketed = spark.table("spec_turns_bkt")
    val m1b = Rollup.rollupRaw(Signals.latencyPoints(bucketed), "minute")
    assert(shuffles(m1b) == 0, "raw→1m should be shuffle-free on the ingest layout")

    // exactness: same rows as the shuffled plan over the raw frame
    val m1plain = Rollup.rollupRaw(Signals.latencyPoints(tr), "minute")
    assert(m1b.exceptAll(m1plain).count() == 0 && m1plain.exceptAll(m1b).count() == 0)

    // cascade keyed by the same conv key — also shuffle-free
    assert(shuffles(Rollup.cascade(m1b, "hour")) == 0)
    assert(shuffles(Rollup.cascade(Rollup.cascade(m1b, "hour"), "day")) == 0)
  }

  test("sorted-bucket scan elides the window Sort when output ordering is honored") {
    // one sorted file per bucket (Ingest.writeBucketed's invariant) +
    // spark.sql.legacy.bucketedTableScan.outputOrdering=true → the
    // latency window's required (conv_id, turn_idx) ordering is
    // satisfied by the scan itself: no Sort node, ~37% off raw→1m at
    // 8M turns / 16 cores. Results stay bit-identical either way.
    val dir = Files.createTempDirectory("graft_bkt_spec3").toString
    val tr = TranscriptGen.turns(spark, 30000, 200, partitions = 8)
    Ingest.writeBucketed(tr, "spec_turns_bkt3", s"$dir/turns", buckets = 8)
    val prev = spark.conf.getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
    try {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val df = Rollup.rollupRaw(Signals.latencyPoints(spark.table("spec_turns_bkt3")), "minute")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Sort "), s"Sort not elided:\n$plan")
      assert(shuffles(df) == 0)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      val dfSorted = Rollup.rollupRaw(Signals.latencyPoints(spark.table("spec_turns_bkt3")), "minute")
      assert(dfSorted.queryExecution.executedPlan.toString.contains("Sort "))
      assert(df.exceptAll(dfSorted).count() == 0 && dfSorted.exceptAll(df).count() == 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
      case None => spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("window family over a bucketed (key, ts) points table: zero exchange, zero sort") {
    // the WindowBench bucketed-layout claim (BENCH.md round-4 window
    // table): sessions/ewma over a key-bucketed, (key, ts)-sorted
    // points table plan with no Exchange and no Sort, and match the
    // plain-layout results exactly
    val dir = Files.createTempDirectory("graft_bkt_spec4").toString
    val pts = Signals.latencyPoints(TranscriptGen.turns(spark, 30000, 200, partitions = 8))
      .where(col("v").isNotNull)
    pts.repartition(8, col("key"))
      .write.mode("overwrite").bucketBy(8, "key").sortBy("key", "ts")
      .option("path", s"$dir/pts").saveAsTable("spec_pts_bkt4")
    val prev = spark.conf.getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
    try {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val bkt = spark.table("spec_pts_bkt4")
      for (df <- Seq(SeriesOps.sessions(bkt, 300L), SeriesOps.ewma(bkt, 4))) {
        val plan = df.queryExecution.executedPlan.toString
        assert(shuffles(df) == 0, s"exchange not elided:\n$plan")
        assert(!plan.contains("Sort "), s"Sort not elided:\n$plan")
      }
      val a = SeriesOps.sessions(bkt, 300L)
      val b = SeriesOps.sessions(pts, 300L)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
      case None => spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("registerBucketed re-declares the layout for a fresh catalog") {
    val dir = Files.createTempDirectory("graft_bkt_spec2").toString
    val tr = TranscriptGen.turns(spark, 20000, 100, partitions = 4)
    Ingest.writeBucketed(tr, "spec_turns_bkt_w2", s"$dir/turns", buckets = 4)
    Ingest.registerBucketed(spark, "spec_turns_bkt_r2", s"$dir/turns", 4)
    val viaDdl = Rollup.rollupRaw(Signals.latencyPoints(spark.table("spec_turns_bkt_r2")), "minute")
    assert(shuffles(viaDdl) == 0)
    assert(viaDdl.count() > 0)
  }
}
