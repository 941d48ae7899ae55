package graft.functions.codec

/** Gorilla XOR compression for float64 streams.
  *
  * Scheme (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
  * Time Series Database", VLDB 2015, §4.1.2 — public paper; fresh
  * implementation):
  *   - header: 32-bit count, then first value as raw 64 bits
  *   - each next value XORed with the previous:
  *       0                           → identical value
  *       1 0 + meaningful bits       → fits previous (leading,length) window
  *       1 1 + 6b leading + 6b len-1 + bits → new window
  * Bit-exact round trip for every double bit pattern, including -0.0,
  * ±Inf and NaN payloads (FIXTURES.md §B.5).
  */
object Gorilla {

  def encode(values: Array[Double]): Array[Byte] = {
    val w = new BitWriter(8 + values.length) // rough guess; grows as needed
    w.writeBits(values.length.toLong, 32)
    if (values.length == 0) return w.toBytes
    var prev = java.lang.Double.doubleToRawLongBits(values(0))
    w.writeBits(prev, 64)
    var prevLead = -1
    var prevLen = 0
    var i = 1
    while (i < values.length) {
      val cur = java.lang.Double.doubleToRawLongBits(values(i))
      val xor = cur ^ prev
      if (xor == 0L) w.writeBit(0)
      else {
        w.writeBit(1)
        val lead = java.lang.Long.numberOfLeadingZeros(xor)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        val leadC = math.min(lead, 31) // clamp so 6 bits always suffice
        val len = 64 - leadC - trail
        if (prevLead >= 0 && lead >= prevLead && trail >= 64 - prevLead - prevLen) {
          w.writeBit(0)
          w.writeBits(xor >>> (64 - prevLead - prevLen), prevLen)
        } else {
          w.writeBit(1)
          w.writeBits(leadC.toLong, 6)
          w.writeBits((len - 1).toLong, 6)
          w.writeBits(xor >>> trail, len)
          prevLead = leadC
          prevLen = len
        }
      }
      prev = cur
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[Double] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[Double](n)
    if (n == 0) return out
    var prev = r.readBits(64)
    out(0) = java.lang.Double.longBitsToDouble(prev)
    var lead = 0
    var len = 0
    var i = 1
    while (i < n) {
      if (r.readBit() == 0) out(i) = java.lang.Double.longBitsToDouble(prev)
      else {
        if (r.readBit() == 1) {
          lead = r.readBits(6).toInt
          len = r.readBits(6).toInt + 1
        }
        val bits = r.readBits(len)
        val xor = bits << (64 - lead - len)
        prev = prev ^ xor
        out(i) = java.lang.Double.longBitsToDouble(prev)
      }
      i += 1
    }
    out
  }
}
