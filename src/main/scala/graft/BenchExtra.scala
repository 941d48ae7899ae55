package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 auxiliary benchmarks (guide §1.4): phase isolation for the
  * heavy stateful fixtures, separate from the FROZEN graft.Bench.
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra <sfDir>"
  * Prints one JSON line of phase timings for q_streaming_rollup's
  * fixture: input staging, the streaming replay (with per-microbatch
  * durations from the engine's own progress events), and the final
  * tier read — so the row's cost decomposes into data work vs stream
  * machinery vs commit overhead.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.forceRun(Tables.events(spark, sfDir).limit(10000))
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = graft.queries.Q.freshDir("graft_bx_qsr")
    val ev = Tables.events(spark, sfDir)
    val (_, tStage) = Bench.timed {
      (0 until 3).foreach { i =>
        ev.where(pmod(xxhash64(col("event_id")), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(s"$base/in")
      }
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val (q, tStream) = Bench.timed {
      val q = graft.streaming.StreamingRollup
        .cascadeWriter(operators.Signals.fromEvents(stream),
          s"$base/tiers", "bx_run", nBuckets = 4)
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      q
    }
    val batches = q.recentProgress.toSeq.map { p =>
      s"""{"batchId":${p.batchId},"rows":${p.numInputRows},""" +
        s""""durationMs":${p.batchDuration}}"""
    }
    val (_, tRead) = Bench.timed {
      val t1m = new tables.TierTable(spark, s"$base/tiers/tier_1m", nBuckets = 4)
      Bench.forceRun(graft.queries.Q.ordered(operators.Rollup.present(t1m.read())))
    }
    println(s"""{"fixture":"q_streaming_rollup","stage_s":$tStage,""" +
      s""""stream_s":$tStream,"read_s":$tRead,""" +
      s""""batches":[${batches.mkString(",")}]}""")

    // control: the SAME 9 merges as a plain batch loop over the staged
    // slices (no streaming engine) — isolates micro-batch machinery +
    // its AQE-disablement from the data/commit work itself
    val base2 = graft.queries.Q.freshDir("graft_bx_qsr_manual")
    val files = new java.io.File(s"$base/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val (_, tManual) = Bench.timed {
      files.zipWithIndex.foreach { case (f, i) =>
        val batch = operators.Signals.fromEvents(
          spark.read.schema(ev.schema).parquet(f.toString))
        val t1m = new tables.TierTable(spark, s"$base2/tier_1m", 4)
        val t1h = new tables.TierTable(spark, s"$base2/tier_1h", 4)
        val t1d = new tables.TierTable(spark, s"$base2/tier_1d", 4)
        val m1 = operators.Rollup.rollupRaw(batch, "minute")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          t1m.merge(m1, s"bx_manual/$i")
          val h1 = operators.Rollup.cascade(m1, "hour")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            t1h.merge(h1, s"bx_manual/$i")
            t1d.merge(operators.Rollup.cascade(h1, "day"), s"bx_manual/$i")
          } finally { h1.unpersist(false); () }
        } finally { m1.unpersist(false); () }
      }
    }
    println(s"""{"fixture":"qsr_manual_9_merges","total_s":$tManual}""")
    spark.stop()
  }
}
