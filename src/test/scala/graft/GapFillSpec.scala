package graft

import org.apache.spark.sql.functions._
import graft.model.Point
import graft.operators._

/** FIXTURES.md §B.3 gap-fill contract. */
class GapFillSpec extends SparkSpecBase {
  import spark.implicits._

  // observed minute-buckets {t0: 2.0, t3: 8.0} over grid [t0, t4]:
  // obs at minute 0 and minute 3; extra key forces the grid to t4.
  val p = Seq(
    Point("a", t(0), 2.0),
    Point("a", t(180), 8.0),
    Point("a", t(240), 5.0)).toDF() // t4 observed to close the grid

  test("B.3 LOCF: [2, 2, 2, 8, 5]") {
    val got = GapFill.locf(p, "minute", "interval 1 minute")
      .orderBy("bucket").select("v_locf").as[Double].collect().toSeq
    assert(got == Seq(2.0, 2.0, 2.0, 8.0, 5.0))
  }

  test("B.3 linear interp: [2, 4, 6, 8, 5]") {
    val got = GapFill.interpolate(p, "minute", "interval 1 minute")
      .orderBy("bucket").select("v_fill").as[Double].collect().toSeq
    assert(got == Seq(2.0, 4.0, 6.0, 8.0, 5.0))
  }

  test("LocalOracle.interp mirrors the distributed B.3 fixture (differential)") {
    import graft.local.LocalOracle
    // [2,4,6,8,5]: interpolation BETWEEN observations requires the
    // leading-gap guard to check the SMALLEST key (a lastOption guard
    // made the interp branch unreachable — ADVICE r01)
    val obs = Map(0L -> 2.0, 3L -> 8.0, 4L -> 5.0)
    assert(LocalOracle.interp(0L to 4L, obs) ==
      Seq(Some(2.0), Some(4.0), Some(6.0), Some(8.0), Some(5.0)))
    // leading gap (grid before first obs) is None; LOCF tail holds
    assert(LocalOracle.interp(0L to 5L, Map(2L -> 4.0, 3L -> 6.0)) ==
      Seq(None, None, Some(4.0), Some(6.0), Some(6.0), Some(6.0)))
    // and it agrees with the distributed interpolate on the fixture
    val got = GapFill.interpolate(p, "minute", "interval 1 minute")
      .orderBy("bucket").select("v_fill").as[Double].collect().toSeq
    assert(got == LocalOracle.interp(0L to 4L, obs).map(_.get))
  }

  test("B.3 leading gap stays null; LOCF tail carries last value") {
    val q = Seq(
      Point("a", t(60), 3.0),   // first obs at minute 1
      Point("a", t(60), 5.0),   // same bucket → mean 4.0
      Point("a", t(240), 9.0),  // minute 4
      Point("b", t(0), 1.0),    // key b pins grid start before a's first obs? (per-key grids are independent)
      Point("b", t(300), 1.0)).toDF()
    val locf = GapFill.locf(q, "minute", "interval 1 minute")
      .where(col("key") === "a")
      .orderBy("bucket").select("v_locf").as[Option[Double]].collect().toSeq
    // a's own grid starts at its first bucket (minute 1) — no leading null
    assert(locf == Seq(Some(4.0), Some(4.0), Some(4.0), Some(9.0)))
    val interp = GapFill.interpolate(q, "minute", "interval 1 minute")
      .where(col("key") === "b")
      .orderBy("bucket").select("v_fill").as[Option[Double]].collect().toSeq
    assert(interp == Seq.fill(6)(Some(1.0))) // flat interp between equal endpoints
  }
}
