package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Point
import graft.operators.Rollup
import graft.streaming.StreamingRollup
import graft.tables.TierTable

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private val pointSchema = StructType(Seq(
    StructField("key", StringType), StructField("ts", TimestampType),
    StructField("v", DoubleType)))

  test("streamed micro-batch cascade converges to the batch rollup") {
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val tierRoot = Files.createTempDirectory("graft_stream_tier").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    val pts = (0 until 3000).map { i =>
      Point(s"k${i % 4}", t(i * 53), ((i * 17) % 300) / 4.0)
    }
    // several source files → several input splits
    pts.grouped(1000).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF().write.parquet(s"$srcDir/part$i")
    }
    val stream = spark.readStream.schema(pointSchema)
      .option("maxFilesPerTrigger", "2")
      .parquet(s"$srcDir/part*")
    val q = StreamingRollup.cascadeWriter(stream, tierRoot, "stream1")
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination(120000)

    val batch = pts.toDF()
    for ((tier, unit) <- Seq(("tier_1m", "minute"), ("tier_1h", "hour"), ("tier_1d", "day"))) {
      val got = Rollup.present(new TierTable(spark, s"$tierRoot/$tier", 8).read())
      val want = Rollup.present(Rollup.rollupRaw(batch, unit))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"tier $unit diverged")
    }
  }

  test("streamed dedup indexing converges to the one-shot pipeline; restart replays are no-ops") {
    val srcDir = Files.createTempDirectory("graft_sdx_src").toString
    val idxRoot = Files.createTempDirectory("graft_sdx_idx").toString
    val ckpt = Files.createTempDirectory("graft_sdx_ckpt").toString
    val docs = (0 until 90).map { i =>
      (i.toLong, s"shared template sentence number ${i % 60} with padding words")
    }
    docs.grouped(30).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("doc_id", "text").write.parquet(s"$srcDir/part$i")
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      val q = graft.streaming.StreamingDedup
        .indexWriter(stream, idxRoot, "sdx_run", k = 32, bands = 16, shingleN = 2)
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination(120000)
    }
    run()
    val idx = new graft.operators.DedupIndex(spark, idxRoot,
      k = 32, bands = 16, shingleN = 2)
    val vAfter = idx.table.currentVersion
    assert(vAfter >= 1, "expected multiple micro-batch appends")
    val streamed = idx.candidatePairs().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = graft.operators.Dedup.minhashLsh(
        docs.toDF("doc_id", "text"), k = 32, bands = 16, shingleN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == oneShot && streamed.nonEmpty)
    // cross-batch dup pairs present (i and i+60 live in different files)
    assert(streamed.exists { case (a, b, _) => b - a == 60 })
    // restart from the same checkpoint: AvailableNow re-run finds no new
    // files; even a forced replay of a committed batch id is a lineage
    // no-op — the index version must not move
    run()
    assert(!idx.addBatch(
      docs.take(30).toDF("doc_id", "text"), "sdx_run/0"))
    assert(idx.table.currentVersion == vAfter)
    assert(idx.candidatePairs().count() == streamed.size)
  }

  test("late out-of-order events merge exactly into already-committed tier windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tierRoot = Files.createTempDirectory("graft_stream_late").toString
    val ckpt = Files.createTempDirectory("graft_stream_late_ck").toString

    val pts = (0 until 2400).map { i =>
      Point(s"k${i % 3}", t(i * 41), ((i * 13) % 400) / 8.0)
    }
    // adversarial arrival order: the NEWER half arrives first and its
    // minute/hour/day windows are committed; then the older half
    // arrives (reversed, so within-batch order is wrong too) — every
    // one of its rows is "late" relative to windows already in the
    // tiers. The MERGE cascade has no watermark to drop them: late
    // partials combine into the committed partitions exactly
    // (mergeable stats), so the result must equal the one-shot batch.
    val (oldHalf, newHalf) = pts.splitAt(1200)
    val src = MemoryStream[Point]
    val q = StreamingRollup.cascadeWriter(src.toDF(), tierRoot, "lateRun")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .option("checkpointLocation", ckpt)
      .start()
    src.addData(newHalf); q.processAllAvailable()
    src.addData(oldHalf.reverse); q.processAllAvailable()
    q.stop()

    val batch = pts.toDF()
    for ((tier, unit) <- Seq(("tier_1m", "minute"), ("tier_1h", "hour"), ("tier_1d", "day"))) {
      val got = Rollup.present(new TierTable(spark, s"$tierRoot/$tier", 8).read())
      val want = Rollup.present(Rollup.rollupRaw(batch, unit))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"tier $unit diverged under late arrival")
    }
  }

  test("streaming session windows equal batch sessionization across adversarial splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSessions
    implicit val sqlCtx = spark.sqlContext
    // gap = 120 s; deltas strictly over, exactly at, and under the
    // threshold. The exactly-at gap (a: 0→120) must NOT split in
    // either engine — it pins the +1 µs convention alignment between
    // session_window (splits at ≥ gap) and the batch rule (> gap).
    val pts = Seq(
      Point("a", t(0), 1.0), Point("a", t(120), 2.0),
      Point("a", t(241), 3.0), Point("a", t(300), 4.0), // 121 s → new session
      Point("b", t(50), 5.0), Point("b", t(500), 6.0),  // 450 s → two sessions
      // c arrives as two separate sessions (0 | 240) until the t(120)
      // bridge lands in the LAST batch and merges them into one
      Point("c", t(0), 7.0), Point("c", t(240), 8.0), Point("c", t(120), 9.0))
    val src = MemoryStream[Point]
    val q = StreamingSessions.sessionAgg(src.toDF(), gapSeconds = 120L)
      .writeStream.format("memory").queryName("sessions_tst")
      .outputMode("complete")
      .start()
    // out-of-order, sessions split across micro-batches, bridge last
    src.addData(pts(2), pts(5), pts(7)); q.processAllAvailable()
    src.addData(pts(0), pts(3), pts(6)); q.processAllAvailable()
    src.addData(pts(1), pts(4), pts(8)); q.processAllAvailable()
    q.stop()
    val got = StreamingSessions.withSessionSeq(spark.table("sessions_tst"))
    val want = graft.operators.SeriesOps.sessions(pts.toDF(), 120L)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"streamed sessions diverged:\n${got.orderBy("key", "session_seq").collect().toSeq}" +
        s"\nvs\n${want.orderBy("key", "session_seq").collect().toSeq}")
    // the c-bridge really merged: one session of 3 points
    assert(got.where(col("key") === "c").count() == 1)
  }

  test("stateful streaming latency equals batch lag() across micro-batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingLatency
    import graft.streaming.StreamingLatency.TurnEvent
    implicit val sqlCtx = spark.sqlContext

    // 3 conversations, turns deliberately SPLIT mid-conversation across
    // two micro-batches — the case the batch window can't see and the
    // state must carry
    val turns = (0 until 3).flatMap { c =>
      (0 until 8).map(i => TurnEvent(s"c$c", i, t(c * 1000 + i * 7)))
    }
    val (b1, b2) = turns.partition(e => e.turn_idx < 5)

    val src = MemoryStream[TurnEvent]
    // timeoutMs = 0 (NoTimeout): a bounded replay must quiesce
    val q = StreamingLatency.latencyPoints(src.toDS(), timeoutMs = 0)
      .writeStream.outputMode("append").format("memory").queryName("lat_out").start()
    src.addData(b1); q.processAllAvailable()
    src.addData(b2); q.processAllAvailable()
    q.stop()

    val got = spark.table("lat_out")
      .select(col("key"), col("ts"), col("v"))
      .orderBy("key", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2))))
    val want = graft.operators.Signals.latencyPoints(
        turns.map(e => model.Turn(e.conv_id, e.turn_idx, "user", "x", None, e.ts)).toDF())
      .orderBy("key", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2))))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("watermarked windowed rollup emits exact finalized windows") {
    val srcDir = Files.createTempDirectory("graft_stream_src2").toString
    val pts = (0 until 1200).map { i =>
      Point(s"k${i % 2}", t(i * 31), (i % 50).toDouble)
    }
    pts.toDF().write.parquet(s"$srcDir/all")
    val stream = spark.readStream.schema(pointSchema).parquet(s"$srcDir/*")
    val agg = StreamingRollup.windowedRollup(stream, "5 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("win_out")
      .select("key", "bucket", "cnt", "sum_d", "sumsq_d", "min_v", "max_v")
    // append mode withholds windows newer than the watermark; all
    // emitted windows must match the batch rollup rows exactly
    val want = Rollup.rollupRaw(pts.toDF(), "minute")
    assert(got.exceptAll(want).count() == 0)
    assert(got.count() > 0)
  }
}
