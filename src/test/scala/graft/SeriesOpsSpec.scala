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
}
