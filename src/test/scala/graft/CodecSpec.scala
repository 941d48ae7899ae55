package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.codec.{DeltaOfDelta, Gorilla}

/** FIXTURES.md §B.5 codec round-trip properties — seeded randomized
  * property loops (scalatestplus bridge isn't in the offline cache,
  * so properties are hand-rolled with a fixed seed). */
class CodecSpec extends AnyFunSuite {

  private val rng = new Random(42)

  private def assertBitsEqual(xs: Array[Double], out: Array[Double]): Unit = {
    assert(out.length == xs.length)
    var i = 0
    while (i < xs.length) {
      assert(java.lang.Double.doubleToRawLongBits(out(i)) ==
        java.lang.Double.doubleToRawLongBits(xs(i)), s"at $i: ${out(i)} != ${xs(i)}")
      i += 1
    }
  }

  test("property: Gorilla round-trips arbitrary doubles bit-exactly (500 cases)") {
    for (_ <- 1 to 500) {
      val n = rng.nextInt(200)
      val xs = Array.fill(n) {
        rng.nextInt(4) match {
          case 0 => rng.nextDouble() * 1000
          case 1 => (rng.nextDouble() - 0.5) * 1e18
          case 2 => rng.nextInt(100).toDouble // repeats likely
          case _ => java.lang.Double.longBitsToDouble(rng.nextLong()) // any bits incl NaN/Inf
        }
      }
      assertBitsEqual(xs, Gorilla.decode(Gorilla.encode(xs)))
    }
  }

  test("Gorilla handles specials: -0.0, ±Inf, NaN payloads, subnormals") {
    val xs = Array(0.0, -0.0, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.NaN, java.lang.Double.longBitsToDouble(0x7ff8000000abcdefL),
      Double.MinPositiveValue, -Double.MinPositiveValue, 1.0, 1.0, 1.0)
    assertBitsEqual(xs, Gorilla.decode(Gorilla.encode(xs)))
  }

  test("Gorilla compresses constant and slowly-varying series well") {
    val const = Array.fill(1000)(42.0)
    assert(Gorilla.encode(const).length < 150) // ~1 bit/value after first
    val slow = Array.tabulate(1000)(i => 100.0 + (i % 7) * 0.25)
    assert(Gorilla.encode(slow).length < 8 * 1000 / 2) // ≥2x vs raw
  }

  test("property: DoD round-trips sorted µs timestamps with irregular gaps (500 cases)") {
    for (_ <- 1 to 500) {
      val n = rng.nextInt(300)
      val base = math.abs(rng.nextLong() % 1700000000000000L)
      var t = base
      val ts = Array.fill(n) {
        val gap = rng.nextInt(3) match {
          case 0 => 1000000L                       // exact 1s cadence
          case 1 => rng.nextInt(5000000).toLong    // ≤5s jitter
          case _ => rng.nextInt(3600) * 1000000L   // up to 1h gaps
        }
        t += gap; t
      }
      assert(DeltaOfDelta.decode(DeltaOfDelta.encode(ts)).toSeq == ts.toSeq)
    }
  }

  test("property: DoD round-trips arbitrary (unsorted, negative) longs (300 cases)") {
    for (_ <- 1 to 300) {
      val n = rng.nextInt(100)
      val ts = Array.fill(n)(rng.nextLong() % (1L << 55))
      assert(DeltaOfDelta.decode(DeltaOfDelta.encode(ts)).toSeq == ts.toSeq)
    }
  }

  test("DoD regular cadence compresses to ~1 bit per timestamp") {
    val ts = Array.tabulate(1000)(i => 1704067200000000L + i * 60000000L)
    assert(DeltaOfDelta.encode(ts).length < 160)
  }

  test("empty and singleton arrays") {
    assert(Gorilla.decode(Gorilla.encode(Array.empty[Double])).isEmpty)
    assert(Gorilla.decode(Gorilla.encode(Array(3.14))).toSeq == Seq(3.14))
    assert(DeltaOfDelta.decode(DeltaOfDelta.encode(Array.empty[Long])).isEmpty)
    assert(DeltaOfDelta.decode(DeltaOfDelta.encode(Array(7L))).toSeq == Seq(7L))
  }
}
