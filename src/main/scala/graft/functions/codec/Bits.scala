package graft.functions.codec

import java.util.Arrays

/** Minimal MSB-first bit writer/reader for the segment codecs. */
final class BitWriter(initialCapacity: Int = 64) {
  private var buf = new Array[Byte](initialCapacity)
  private var bitPos = 0 // absolute bit position

  private def ensure(bits: Int): Unit = {
    val needBytes = (bitPos + bits + 7) >>> 3
    if (needBytes > buf.length) {
      buf = Arrays.copyOf(buf, math.max(buf.length * 2, needBytes))
    }
  }

  def writeBit(b: Int): Unit = {
    ensure(1)
    if ((b & 1) != 0) buf((bitPos >>> 3)) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
    bitPos += 1
  }

  /** Write the low `n` bits of `v`, MSB first. */
  def writeBits(v: Long, n: Int): Unit = {
    ensure(n)
    var i = n - 1
    while (i >= 0) {
      writeBitFast(((v >>> i) & 1L).toInt)
      i -= 1
    }
  }

  @inline private def writeBitFast(b: Int): Unit = {
    if (b != 0) buf(bitPos >>> 3) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
    bitPos += 1
  }

  def toBytes: Array[Byte] = Arrays.copyOf(buf, (bitPos + 7) >>> 3)
  def lengthBits: Int = bitPos
}

final class BitReader(bytes: Array[Byte]) {
  private var bitPos = 0

  def readBit(): Int = {
    val b = (bytes(bitPos >>> 3) >>> (7 - (bitPos & 7))) & 1
    bitPos += 1
    b
  }

  /** Read `n` bits MSB-first into the low bits of a Long. */
  def readBits(n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 1) | readBit(); i += 1 }
    v
  }
}
