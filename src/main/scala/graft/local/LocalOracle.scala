package graft.local

/** Pure-Scala local engine mode — the analogue of thunder's
  * `engine=None` numpy path (thunder/base.py :: Base.mode): every
  * distributed operator has a driver-local scalar implementation with
  * identical semantics, used as the differential-test oracle
  * (SURVEY.md §5). Semantics pinned to the reference:
  *   - std/var are population (ddof=0) — numpy default used by
  *     thunder/series/series.py :: Series.series_std;
  *   - percentile uses numpy linear interpolation;
  *   - downsample(k) is the mean over non-overlapping bins of k
  *     (thunder/series/series.py :: Series.downsample).
  */
object LocalOracle {

  def mean(xs: Seq[Double]): Double = xs.sum / xs.length

  /** Population variance (ddof=0). */
  def varPop(xs: Seq[Double]): Double = {
    val m = mean(xs)
    xs.map(x => (x - m) * (x - m)).sum / xs.length
  }

  def stdPop(xs: Seq[Double]): Double = math.sqrt(varPop(xs))

  /** Exact decimal mergeable stats — mirrors Rollup's internal sums. */
  def decimalStats(xs: Seq[Double]): (Long, BigDecimal, BigDecimal, Double, Double) = {
    val ds = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    (xs.length.toLong, ds.sum, ds.map(d => d * d).sum, xs.min, xs.max)
  }

  /** Std as the engine presents it: derived from exact decimal sums,
    * with sumsq rescaled to scale 6 before the double cast (mirrors
    * Rollup.present's cross-engine-safe rescale). */
  def stdPresented(xs: Seq[Double]): Double = {
    val (n, s, sq, _, _) = decimalStats(xs)
    val m = s.toDouble / n
    val ex2 = sq.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble / n
    math.sqrt(math.max(ex2 - m * m, 0.0))
  }

  /** numpy-style linear-interpolation percentile, q in [0, 100]. */
  def percentile(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    val pos = q / 100.0 * (s.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) s(lo) else s(lo) + (pos - lo) * (s(hi) - s(lo))
  }

  def median(xs: Seq[Double]): Double = percentile(xs, 50.0)

  /** Mean over non-overlapping bins of k (length must divide evenly). */
  def downsample(xs: Seq[Double], k: Int): Seq[Double] = {
    require(xs.length % k == 0, s"downsample: ${xs.length} % $k != 0")
    xs.grouped(k).map(mean).toSeq
  }

  /** Every k-th element starting at 0 (Series.subsample). */
  def subsample(xs: Seq[Double], k: Int): Seq[Double] =
    xs.zipWithIndex.collect { case (x, i) if i % k == 0 => x }

  /** (x − mean)/std with ddof=0 (Series.zscore). */
  def zscore(xs: Seq[Double]): Seq[Double] = {
    val m = mean(xs); val s = stdPop(xs)
    xs.map(x => (x - m) / s)
  }

  def center(xs: Seq[Double]): Seq[Double] = { val m = mean(xs); xs.map(_ - m) }

  def standardize(xs: Seq[Double]): Seq[Double] = { val s = stdPop(xs); xs.map(_ / s) }

  def clip(xs: Seq[Double], lo: Double, hi: Double): Seq[Double] =
    xs.map(x => math.min(math.max(x, lo), hi))

  /** Linear detrend over positional index: OLS fit of v on 0..n−1,
    * subtract fit, add back the mean (Series.detrend semantics). */
  def detrend(xs: Seq[Double]): Seq[Double] = {
    val n = xs.length
    val m = mean(xs)
    val xbar = (n - 1) / 2.0
    val sxx = (0 until n).map(i => (i - xbar) * (i - xbar)).sum
    val sxy = xs.zipWithIndex.map { case (y, i) => (i - xbar) * (y - m) }.sum
    val b = sxy / sxx
    val a = m - b * xbar
    xs.zipWithIndex.map { case (y, i) => y - (a + b * i) + m }
  }

  /** Pearson correlation of two equal-length series. */
  def pearson(xs: Seq[Double], ys: Seq[Double]): Double = {
    val mx = mean(xs); val my = mean(ys)
    val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
      math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
    num / den
  }

  /** Single-frequency DFT bin → (coherence, phase), thunder
    * Series.fourier semantics: coherence = |X_k| * 2/n / mean-removed
    * amplitude normalization; here we return the raw (re, im) sums —
    * the Spark side compares against the same closed form. */
  def dftBin(xs: Seq[Double], k: Int): (Double, Double) = {
    val n = xs.length
    val re = xs.zipWithIndex.map { case (x, i) => x * math.cos(-2.0 * math.Pi * k * i / n) }.sum
    val im = xs.zipWithIndex.map { case (x, i) => x * math.sin(-2.0 * math.Pi * k * i / n) }.sum
    (re, im)
  }

  /** LOCF gap-fill over a dense positional grid: observations at
    * `obs` positions; returns values at every grid position, null
    * (None) until the first observation. */
  def locf(grid: Seq[Long], obs: Map[Long, Double]): Seq[Option[Double]] = {
    var last: Option[Double] = None
    grid.map { g => obs.get(g).foreach(v => last = Some(v)); last }
  }

  /** Linear interpolation between bracketing observations; LOCF after
    * the last observation; None before the first. */
  def interp(grid: Seq[Long], obs: Map[Long, Double]): Seq[Option[Double]] = {
    val ks = obs.keys.toSeq.sorted
    grid.map { g =>
      // leading-gap guard: None only while g precedes the FIRST
      // observation (headOption, not lastOption — the latter made the
      // interpolation branch unreachable for any g before the last key)
      ks.headOption.filter(_ <= g) match {
        case None => None
        case Some(_) =>
          val prevK = ks.filter(_ <= g).last
          val nextK = ks.find(_ >= g)
          nextK match {
            case Some(nk) if nk == prevK => Some(obs(prevK))
            case Some(nk) =>
              val f = (g - prevK).toDouble / (nk - prevK)
              Some(obs(prevK) + f * (obs(nk) - obs(prevK)))
            case None => Some(obs(prevK)) // LOCF tail
          }
      }
    }
  }
}
