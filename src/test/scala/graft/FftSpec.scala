package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.functions.Fft
import graft.model.Point
import graft.operators.SeriesOps

/** FFT correctness: the O(n log n) transform (radix-2 + Bluestein)
  * must agree with the naive O(n²) DFT for every length, and the
  * Spark-side fftSpectrum must agree with the independent dftBins
  * closed form on shared bins. Seeded hand-rolled property loops
  * (CodecSpec convention — scalatestplus bridge not in the offline
  * cache). */
class FftSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new Random(7)

  private def maxErr(n: Int): Double = {
    val xs = Array.fill(n)(rng.nextDouble() * 2 - 1)
    val (wre, wim) = Fft.naiveDft(xs)
    val re = xs.clone()
    val im = new Array[Double](n)
    Fft.transform(re, im)
    val scale = math.max(1.0, xs.map(math.abs).sum)
    (0 until n).map(k =>
      math.max(math.abs(re(k) - wre(k)), math.abs(im(k) - wim(k))) / scale).max
  }

  test("property: FFT == naive DFT for every n in 1..128 (powers of two AND odd/composite)") {
    (1 to 128).foreach { n =>
      val e = maxErr(n)
      assert(e < 1e-11, s"n=$n relative error $e")
    }
  }

  test("property: FFT == naive DFT on 100 random larger sizes (Bluestein path)") {
    (1 to 100).foreach { _ =>
      val n = 129 + rng.nextInt(800)
      val e = maxErr(n)
      assert(e < 1e-11, s"n=$n relative error $e")
    }
  }

  test("linearity + impulse: fft(delta at j) has unit magnitude everywhere") {
    val n = 12 // non-power-of-two
    val xs = new Array[Double](n); xs(3) = 1.0
    val im = new Array[Double](n)
    Fft.transform(xs, im)
    (0 until n).foreach { k =>
      assertClose(math.hypot(xs(k), im(k)), 1.0, 1e-12)
    }
  }

  test("fftSpectrum matches dftBins on the shared bins (k = 1..3) after round(6)") {
    val pts = (0 until 400).map { i =>
      Point(s"k${i % 4}", t(i * 61), ((i * 7919) % 997) / 8.0)
    }.toDF()
    val fft = SeriesOps.fftSpectrum(pts)
      .where(col("k").between(1, 3))
      .select(col("key"), col("k"),
        round(col("re"), 6).as("re"), round(col("im"), 6).as("im"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    val dft = SeriesOps.dftBins(pts, 3)
      .select(col("key"), col("k").cast("int"),
        round(col("re"), 6).as("re"), round(col("im"), 6).as("im"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(fft.keySet == dft.keySet && fft.nonEmpty)
    fft.foreach { case (kk, (re, im)) =>
      val (re2, im2) = dft(kk)
      assert(math.abs(re - re2) <= 1e-6 && math.abs(im - im2) <= 1e-6,
        s"$kk: ($re,$im) vs ($re2,$im2)")
    }
  }

  test("fft_coeffs null semantics: null array → null, null element → null") {
    val df = Seq(
      (0L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (1L, null.asInstanceOf[Seq[java.lang.Double]]),
      (2L, Seq[java.lang.Double](1.0, null, 3.0))
    ).toDF("id", "vs")
    val got = df.select(col("id"),
        graft.functions.FftExpressions.fft_coeffs(col("vs")).as("f"))
      .orderBy("id").collect()
    assert(!got(0).isNullAt(1) && got(1).isNullAt(1) && got(2).isNullAt(1))
  }
}
