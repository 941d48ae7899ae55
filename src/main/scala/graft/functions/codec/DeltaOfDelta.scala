package graft.functions.codec

/** Delta-of-delta timestamp compression for µs-resolution longs
  * (Gorilla paper §4.1.1 adapted to microseconds; fresh
  * implementation).
  *
  * Layout: 32-bit count; first ts raw 64 bits; first delta zigzag
  * in the bucket scheme; then delta-of-deltas, each bucketed:
  *   0                  → dod == 0 (perfectly regular cadence)
  *   10  + 14 bits      → dod ∈ [−8192, 8191]            (≤ ~8 ms jitter)
  *   110 + 20 bits      → dod ∈ [−524288, 524287]        (≤ ~0.5 s)
  *   1110 + 28 bits     → dod ∈ [−134217728, 134217727]  (≤ ~134 s)
  *   1111 + 64 bits     → raw
  * Values stored two's-complement in the bucket width.
  */
object DeltaOfDelta {

  private val widths = Array(14, 20, 28)

  private def writeDod(w: BitWriter, dod: Long): Unit = {
    if (dod == 0L) { w.writeBit(0); return }
    var i = 0
    while (i < widths.length) {
      val wd = widths(i)
      val lo = -(1L << (wd - 1)); val hi = (1L << (wd - 1)) - 1
      if (dod >= lo && dod <= hi) {
        var j = 0
        while (j <= i) { w.writeBit(1); j += 1 }
        w.writeBit(0)
        w.writeBits(dod & ((1L << wd) - 1), wd)
        return
      }
      i += 1
    }
    w.writeBits(0xFL, 4) // 1111
    w.writeBits(dod, 64)
  }

  private def readDod(r: BitReader): Long = {
    if (r.readBit() == 0) return 0L
    var i = 0
    while (i < widths.length) {
      if (r.readBit() == 0) {
        val wd = widths(i)
        val raw = r.readBits(wd)
        // sign-extend
        return (raw << (64 - wd)) >> (64 - wd)
      }
      i += 1
    }
    r.readBits(64)
  }

  def encode(ts: Array[Long]): Array[Byte] = {
    val w = new BitWriter(8 + ts.length)
    w.writeBits(ts.length.toLong, 32)
    if (ts.length == 0) return w.toBytes
    w.writeBits(ts(0), 64)
    if (ts.length == 1) return w.toBytes
    var prevDelta = ts(1) - ts(0)
    writeDod(w, prevDelta) // first delta encoded as dod vs implicit 0
    var i = 2
    while (i < ts.length) {
      val delta = ts(i) - ts(i - 1)
      writeDod(w, delta - prevDelta)
      prevDelta = delta
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[Long](n)
    if (n == 0) return out
    out(0) = r.readBits(64)
    if (n == 1) return out
    var delta = readDod(r)
    out(1) = out(0) + delta
    var i = 2
    while (i < n) {
      delta += readDod(r)
      out(i) = out(i - 1) + delta
      i += 1
    }
    out
  }
}
