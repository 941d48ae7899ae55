package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Point
import graft.operators._
import graft.local.LocalOracle

/** Differential tests: every SeriesOps operator vs the pure-Scala
  * LocalOracle on the FIXTURES.md series (thunder test style). */
class SeriesOpsSpec extends SparkSpecBase {
  import spark.implicits._

  val xs = Seq(1.0, 2.0, 4.0, 7.0, 11.0, 16.0)
  val ys = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0)

  def pts(pairs: (String, Seq[Double])*): DataFrame =
    pairs.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => Point(k, t(i * 60), v) }
    }.toDF()

  def vals(df: DataFrame, key: String, vcol: String = "v"): Seq[Double] =
    df.where(col("key") === key).orderBy("ts").select(vcol).as[Double].collect().toSeq

  test("zscore matches ddof=0 oracle (B.1 fixture)") {
    val got = vals(SeriesOps.zscore(pts("a" -> xs, "b" -> ys)), "a")
    val want = LocalOracle.zscore(xs)
    got.zip(want).foreach { case (g, w) => assertClose(g, w, 1e-8) }
    // pinned fixture values
    assertClose(got.head, -1.1062442, 1e-7)
    assertClose(got.last, 1.73838374, 1e-7)
  }

  test("center/standardize/clip") {
    val p = pts("a" -> xs)
    vals(SeriesOps.center(p), "a").zip(LocalOracle.center(xs))
      .foreach { case (g, w) => assertClose(g, w, 1e-12) }
    vals(SeriesOps.standardize(p), "a").zip(LocalOracle.standardize(xs))
      .foreach { case (g, w) => assertClose(g, w, 1e-12) }
    assert(vals(SeriesOps.clip(p, 2.0, 11.0), "a") ==
      LocalOracle.clip(xs, 2.0, 11.0))
  }

  test("downsample(2) == [1.5, 5.5, 13.5] (B.1)") {
    val got = SeriesOps.downsample(pts("a" -> xs), 2)
      .orderBy("bin").select("v").as[Double].collect().toSeq
    assert(got == Seq(1.5, 5.5, 13.5))
    val got3 = SeriesOps.downsample(pts("b" -> ys), 3)
      .orderBy("bin").select("v").as[Double].collect().toSeq
    got3.zip(LocalOracle.downsample(ys, 3)).foreach { case (g, w) => assertClose(g, w, 1e-12) }
  }

  test("subsample(2) == [1, 4, 11] (B.1)") {
    assert(vals(SeriesOps.subsample(pts("a" -> xs), 2), "a") == Seq(1.0, 4.0, 11.0))
  }

  test("percentile: p20 == 2.0 on x, 1.0 on y; median 5.5 (numpy interp)") {
    val p = pts("a" -> xs, "b" -> ys)
    val p20 = SeriesOps.seriesPercentile(p, 0.2).orderBy("key").as[(String, Double)].collect()
    assert(p20.toSeq == Seq(("a", 2.0), ("b", 1.0)))
    val med = SeriesOps.seriesPercentile(p, 0.5).orderBy("key").as[(String, Double)].collect()
    assert(med.head._2 == 5.5)
    assert(med.head._2 == LocalOracle.median(xs))
  }

  test("detrend: residual+mean matches oracle; detrended series has no trend") {
    val got = vals(SeriesOps.detrendLinear(pts("a" -> xs)), "a")
    got.zip(LocalOracle.detrend(xs)).foreach { case (g, w) => assertClose(g, w, 1e-9) }
    // re-detecting a slope on the detrended series gives ~0
    val slope = {
      val n = got.length; val xbar = (n - 1) / 2.0
      val sxy = got.zipWithIndex.map { case (v, i) => (i - xbar) * (v - LocalOracle.mean(got)) }.sum
      sxy / (0 until n).map(i => (i - xbar) * (i - xbar)).sum
    }
    assertClose(slope, 0.0, 1e-9)
  }

  test("squelch zeroes low-max keys only") {
    val p = pts("a" -> xs, "b" -> ys)
    val s = SeriesOps.squelch(p, 10.0)
    assert(vals(s, "b").forall(_ == 0.0)) // max(y)=9 < 10
    assert(vals(s, "a") == xs)            // max(x)=16 survives
  }

  test("meanByPanel cyclic average") {
    val got = SeriesOps.meanByPanel(pts("a" -> xs), 3)
      .orderBy("phase").select("v").as[Double].collect().toSeq
    // panels: [1,2,4] & [7,11,16] → phase means: (1+7)/2, (2+11)/2, (4+16)/2
    assert(got == Seq(4.0, 6.5, 10.0))
  }

  test("autocorr(1) matches Pearson of shifted pairs") {
    val got = SeriesOps.autocorr(pts("a" -> xs), 1)
      .select("r").as[Double].collect().head
    val want = LocalOracle.pearson(xs.init, xs.tail)
    assertClose(got, want, 1e-9)
  }

  test("convolve 'same' with [0.25,0.5,0.25] kernel, zero-padded") {
    val got = vals(SeriesOps.convolveSame(pts("a" -> Seq(4.0, 8.0, 12.0)), Seq(0.25, 0.5, 0.25)), "a")
    assert(got == Seq(0.25 * 0 + 2.0 + 2.0, 1.0 + 4.0 + 3.0, 2.0 + 6.0 + 0.0))
  }

  test("dftBin matches LocalOracle closed form") {
    val got = SeriesOps.dftBin(pts("a" -> xs), 1)
      .select("re", "im").as[(Double, Double)].collect().head
    val (re, im) = LocalOracle.dftBin(xs, 1)
    assertClose(got._1, re, 1e-9); assertClose(got._2, im, 1e-9)
  }

  test("correlate with monotone time signal is positive for rising series") {
    val got = SeriesOps.correlateWithTime(pts("a" -> xs), 1704067200L)
      .select("r").as[Double].collect().head
    // xs rises monotonically with ts → r close to pearson(xs, positions)
    val want = LocalOracle.pearson(xs, xs.indices.map(_.toDouble))
    assertClose(got, want, 1e-6)
  }

  test("meanByWindow event-triggered average") {
    val centers = Seq(2L).toDF("center")
    val got = SeriesOps.meanByWindow(pts("a" -> xs), centers, 1)
      .orderBy("offset").select("v").as[Double].collect().toSeq
    assert(got == Seq(2.0, 4.0, 7.0)) // values at pos 1,2,3
  }

  test("crosscorr (single-pass) matches per-lag autocorr exactly") {
    val p = pts("a" -> xs, "b" -> ys)
    val got = SeriesOps.crosscorr(p, 3).orderBy("key", "lag")
      .select("key", "lag", "r").as[(String, Int, Double)].collect().toSeq
    val want = (1 to 3).flatMap { l =>
      SeriesOps.autocorr(p, l).orderBy("key")
        .select("key", "r").as[(String, Double)].collect()
        .map { case (k, r) => (k, l, r) }
    }.sortBy(t => (t._1, t._2))
    assert(got == want) // bit-exact: same sums, same closed form
  }

  test("crosscorrSignal: lag 0 against a key's own series gives r = 1") {
    val p = pts("a" -> xs, "b" -> ys)
    val signal = SeriesOps.withPos(p).where(col("key") === "a")
      .select(col("pos"), col("v").as("sig"))
    val r = SeriesOps.crosscorrSignal(p, signal, 1)
      .collect().map(row => (row.getString(0), row.getInt(1)) -> row.getDouble(2)).toMap
    assertClose(r(("a", 0)), 1.0, 1e-12)
    // lag 0 of key b vs signal a = plain Pearson(ys, xs)
    assertClose(r(("b", 0)), LocalOracle.pearson(ys, xs), 1e-9)
    assert(r.keySet == Set("a", "b").flatMap(k => (-1 to 1).map(l => (k, l))))
  }

  test("detrendPoly2 removes an exact quadratic (residual = mean)") {
    val quad = (0 until 12).map(i => 3.0 + 0.5 * i + 0.25 * i * i)
    val got = vals(SeriesOps.detrendPoly2(pts("a" -> quad)), "a")
    val m = quad.sum / quad.length
    got.foreach(v => assertClose(v, m, 1e-9))
    // and it degrades gracefully to the linear case
    val lin = (0 until 12).map(i => 2.0 + 1.5 * i)
    vals(SeriesOps.detrendPoly2(pts("a" -> lin)), "a")
      .foreach(v => assertClose(v, lin.sum / lin.length, 1e-9))
  }

  test("normalizeWindow: sliding percentile baseline (constant series → 0)") {
    val const = Seq.fill(9)(5.0)
    vals(SeriesOps.normalizeWindow(pts("a" -> const), half = 2), "a")
      .foreach(v => assertClose(v, 0.0, 1e-12))
    // window baseline follows drift where global percentile can't:
    // a step series normalized windowed has near-zero tails
    val step = Seq.fill(6)(10.0) ++ Seq.fill(6)(100.0)
    val w = vals(SeriesOps.normalizeWindow(pts("a" -> step), half = 1), "a")
    assertClose(w.head, 0.0, 1e-12)
    assertClose(w.last, 0.0, 1e-12)
  }

  test("statsAcrossKeys: across-record sum/mean/min/max/std per bucket") {
    val p = pts("a" -> xs, "b" -> ys) // aligned ts → same buckets
    val row = SeriesOps.statsAcrossKeys(p, "hour").collect().head
    val all = xs ++ ys
    assert(row.getAs[Long]("n") == all.length)
    assertClose(row.getAs[Double]("sum_v"), all.sum, 1e-12)
    assertClose(row.getAs[Double]("mean_v"), all.sum / all.length, 1e-12)
    assert(row.getAs[Double]("min_v") == all.min && row.getAs[Double]("max_v") == all.max)
    assertClose(row.getAs[Double]("std_v"), LocalOracle.stdPop(all), 1e-9)
  }

  test("distinct counts: exact, and HLL within its rsd bound") {
    val p = (0 until 5000).map(i => Point(s"k${i % 437}", t(i % 3000), i.toDouble)).toDF()
    val exact = SeriesOps.distinctKeys(p, "hour").orderBy("bucket")
      .select("n_keys").as[Long].collect()
    val approx = SeriesOps.approxDistinctKeys(p, "hour", rsd = 0.02).orderBy("bucket")
      .select("n_keys_approx").as[Long].collect()
    assert(exact.length == approx.length)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e).toDouble / e < 0.1, s"approx $a vs exact $e") }
  }

  test("sessionize: gap threshold splits sessions; summary aggregates per session") {
    // gaps: 60, 240, 60, 3600, 60 s → with gap=120 s sessions split at
    // the 240 s and 3600 s gaps
    val times = Seq(0L, 60L, 300L, 360L, 3960L, 4020L)
    val p = times.zipWithIndex.map { case (s, i) => Point("a", t(s), i + 1.0) }.toDF()
    val seq = SeriesOps.sessionize(p, gapSeconds = 120L)
      .orderBy("ts").select("session_seq").as[Long].collect().toSeq
    assert(seq == Seq(0L, 0L, 1L, 1L, 2L, 2L))
    val summary = SeriesOps.sessions(p, gapSeconds = 120L)
      .orderBy("session_seq")
      .select("session_seq", "n_points", "sum_v").as[(Long, Long, Double)]
      .collect().toSeq
    assert(summary == Seq((0L, 2L, 3.0), (1L, 2L, 7.0), (2L, 2L, 11.0)))
    // a gap exactly equal to the threshold does NOT split (strict >)
    val exact = Seq(Point("a", t(0), 1.0), Point("a", t(120), 2.0)).toDF()
    assert(SeriesOps.sessions(exact, 120L).count() == 1)
  }

  test("ewma: truncated adjusted EWMA matches hand-computed values") {
    val p = pts("a" -> xs, "b" -> ys)
    // k=8 covers the whole 6-point history
    val full = vals(SeriesOps.ewma(p, k = 8), "a", "ewma")
    val want = xs.indices.map { i =>
      val hist = (0 to i).map(j => xs(i - j) * math.pow(0.5, j))
      val den = (0 to i).map(j => math.pow(0.5, j))
      hist.sum / den.sum
    }
    full.zip(want).foreach { case (g, w) => assertClose(g, w, 1e-12) }
    assertClose(full(1), 5.0 / 3.0, 1e-12)
    assertClose(full(2), 3.0, 1e-12)
    // k=2 truncates: only current + one lag contribute
    val k2 = vals(SeriesOps.ewma(p, k = 2), "a", "ewma")
    assertClose(k2.head, xs.head, 1e-12)
    (1 until xs.length).foreach { i =>
      assertClose(k2(i), (xs(i) + 0.5 * xs(i - 1)) / 1.5, 1e-12)
    }
    // key isolation: 'b' never sees 'a' history
    assertClose(vals(SeriesOps.ewma(p, k = 4), "b", "ewma").head, ys.head, 1e-12)
  }
}
