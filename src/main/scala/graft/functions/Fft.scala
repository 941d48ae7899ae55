package graft.functions

/** In-JVM fast Fourier transform for the per-record (wide-form)
  * spectrum operator — `thunder/series/series.py :: Series.fourier`
  * generalized from one frequency bin to the full spectrum.
  *
  * Forward DFT convention (matches numpy.fft.fft and the engine's
  * closed-form `dftBin`): X_k = Σ_j x_j · e^(−2πi·jk/n).
  *
  * Arbitrary n: power-of-two sizes run the iterative radix-2
  * Cooley–Tukey butterfly; every other size runs Bluestein's chirp-z
  * identity jk = (j² + k² − (k−j)²)/2, which re-expresses the DFT as
  * a circular convolution of chirp-premultiplied inputs — computed
  * with two power-of-two FFTs. Both are the textbook public-domain
  * constructions; O(n log n) for every n.
  *
  * Numerical shape: ~eps·log₂(n) relative error vs the naive O(n²)
  * sum (pinned against the naive DFT in FftSpec); bit-determinism is
  * NOT claimed across engines — spectrum outputs that feed the DuckDB
  * oracle go through the round(…, 6) libm discipline like dftBin.
  */
object Fft {

  /** In-place forward DFT of the complex sequence (re, im). */
  def transform(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(im.length == n, "re/im length mismatch")
    if (n <= 1) return
    if ((n & (n - 1)) == 0) transformRadix2(re, im)
    else transformBluestein(re, im)
  }

  /** Iterative radix-2 Cooley–Tukey; n must be a power of two. */
  def transformRadix2(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n <= 1) return
    val levels = 31 - Integer.numberOfLeadingZeros(n)
    require(1 << levels == n, s"radix-2 size must be a power of two, got $n")
    val half = n / 2
    val cosT = new Array[Double](half)
    val sinT = new Array[Double](half)
    var i = 0
    while (i < half) {
      cosT(i) = math.cos(2.0 * math.Pi * i / n)
      sinT(i) = math.sin(2.0 * math.Pi * i / n)
      i += 1
    }
    // bit-reversal permutation
    i = 0
    while (i < n) {
      val j = Integer.reverse(i) >>> (32 - levels)
      if (j > i) {
        var t = re(i); re(i) = re(j); re(j) = t
        t = im(i); im(i) = im(j); im(j) = t
      }
      i += 1
    }
    // butterflies
    var size = 2
    var done = false
    while (!done) {
      val halfsize = size / 2
      val tablestep = n / size
      var base = 0
      while (base < n) {
        var j = base
        var k = 0
        while (j < base + halfsize) {
          val l = j + halfsize
          val tpre = re(l) * cosT(k) + im(l) * sinT(k)
          val tpim = -re(l) * sinT(k) + im(l) * cosT(k)
          re(l) = re(j) - tpre
          im(l) = im(j) - tpim
          re(j) += tpre
          im(j) += tpim
          j += 1
          k += tablestep
        }
        base += size
      }
      if (size == n) done = true else size *= 2
    }
  }

  /** Bluestein chirp-z DFT for arbitrary n via circular convolution. */
  def transformBluestein(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var m = 1
    while (m < 2 * n + 1) m *= 2
    // chirp e^(−iπ·j²/n); j² reduced mod 2n in Long to avoid overflow
    val cosT = new Array[Double](n)
    val sinT = new Array[Double](n)
    var i = 0
    while (i < n) {
      val j = (i.toLong * i) % (2L * n)
      cosT(i) = math.cos(math.Pi * j / n)
      sinT(i) = math.sin(math.Pi * j / n)
      i += 1
    }
    // a = x premultiplied by the chirp; b = conjugate chirp, wrapped
    val are = new Array[Double](m)
    val aim = new Array[Double](m)
    i = 0
    while (i < n) {
      are(i) = re(i) * cosT(i) + im(i) * sinT(i)
      aim(i) = -re(i) * sinT(i) + im(i) * cosT(i)
      i += 1
    }
    val bre = new Array[Double](m)
    val bim = new Array[Double](m)
    bre(0) = cosT(0); bim(0) = sinT(0)
    i = 1
    while (i < n) {
      bre(i) = cosT(i); bim(i) = sinT(i)
      bre(m - i) = cosT(i); bim(m - i) = sinT(i)
      i += 1
    }
    // circular convolution c = a ⊛ b via two forward FFTs + inverse
    transformRadix2(are, aim)
    transformRadix2(bre, bim)
    i = 0
    while (i < m) {
      val tr = are(i) * bre(i) - aim(i) * bim(i)
      aim(i) = aim(i) * bre(i) + are(i) * bim(i)
      are(i) = tr
      i += 1
    }
    // unscaled inverse FFT = forward FFT with re/im swapped
    transformRadix2(aim, are)
    // postmultiply by the chirp, scale by 1/m
    i = 0
    while (i < n) {
      val cre = are(i) / m
      val cim = aim(i) / m
      re(i) = cre * cosT(i) + cim * sinT(i)
      im(i) = -cre * sinT(i) + cim * cosT(i)
      i += 1
    }
  }

  /** Naive O(n²) DFT — the spec's ground truth. */
  def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var k = 0
    while (k < n) {
      var sr = 0.0
      var si = 0.0
      var j = 0
      while (j < n) {
        val ang = -2.0 * math.Pi * j * k / n
        sr += x(j) * math.cos(ang)
        si += x(j) * math.sin(ang)
        j += 1
      }
      re(k) = sr; im(k) = si
      k += 1
    }
    (re, im)
  }
}
