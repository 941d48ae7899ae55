package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.model.Point
import graft.operators._
import graft.local.LocalOracle

/** Rollup semantics pinned to FIXTURES.md §B.1/§B.2 (thunder
  * Series.series_stats, ddof=0) plus the §B.4 cascade/merge law. */
class RollupSpec extends SparkSpecBase {
  import spark.implicits._

  val xs = Seq(1.0, 2.0, 4.0, 7.0, 11.0, 16.0)
  val ys = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0)

  def points(key: String, vs: Seq[Double], stepSec: Long = 5): DataFrame =
    vs.zipWithIndex.map { case (v, i) => Point(key, t(i * stepSec), v) }.toDF()

  test("B.1 single-window stats match thunder fixture values") {
    // all 6 points inside one minute → one rollup row
    val r = Rollup.present(Rollup.rollupRaw(points("a", xs), "minute"))
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("cnt") == 6L)
    assertClose(row.getAs[Double]("sum_v"), 41.0)
    assertClose(row.getAs[Double]("mean_v"), 6.833333333333333)
    assertClose(row.getAs[Double]("min_v"), 1.0)
    assertClose(row.getAs[Double]("max_v"), 16.0)
    assertClose(row.getAs[Double]("std_v"), 5.273097339852125, 1e-12)
  }

  test("B.2 second fixture") {
    val r = Rollup.present(Rollup.rollupRaw(points("b", ys), "minute")).collect().head
    assertClose(r.getAs[Double]("mean_v"), 3.8333333333333335)
    assertClose(r.getAs[Double]("std_v"), 2.733536577809454, 1e-12)
  }

  test("B.4 cascade law: rollup1h(rollup1m(raw)) === rollup1h(raw) bit-exactly") {
    // 3 keys, 3 hours of data, one point every 37s with varying values
    val pts = (0 until 3).flatMap { k =>
      (0 until 300).map { i =>
        Point(s"k$k", t(i * 37), ((i * 7919 + k * 13) % 1000) / 7.0)
      }
    }.toDF()
    val direct = Rollup.rollupRaw(pts, "hour")
    val cascaded = Rollup.cascade(Rollup.rollupRaw(pts, "minute"), "hour")
    // exact set equality on every column including decimals
    assert(direct.exceptAll(cascaded).count() == 0)
    assert(cascaded.exceptAll(direct).count() == 0)
    val d1 = Rollup.rollupRaw(pts, "day")
    val c1 = Rollup.cascade(Rollup.cascade(Rollup.rollupRaw(pts, "minute"), "hour"), "day")
    assert(d1.exceptAll(c1).count() == 0 && c1.exceptAll(d1).count() == 0)
  }

  test("presented std equals LocalOracle decimal-derived std") {
    val r = Rollup.present(Rollup.rollupRaw(points("a", xs), "minute")).collect().head
    assert(r.getAs[Double]("std_v") == LocalOracle.stdPresented(xs))
  }

  test("latency derivation: ts deltas per conversation, null first turn") {
    val turns = Seq(
      model.Turn("c1", 0, "user", "t0", None, t(0)),
      model.Turn("c1", 1, "assistant", "t1", None, t(2)),
      model.Turn("c1", 2, "user", "t2", None, t(7)),
      model.Turn("c2", 0, "user", "t0", None, t(1)),
      model.Turn("c2", 1, "assistant", "t1", Some("search"), t(4))).toDF()
    val got = Signals.latencyPoints(turns)
      .orderBy("key", "ts").collect()
    assert(got.map(r => Option(r.get(2))).toSeq ==
      Seq(None, Some(2000.0), Some(5000.0), None, Some(3000.0)))
  }

  test("roleTransitions: consecutive pairs only, first turn emits nothing, µs latency") {
    val turns = Seq(
      model.Turn("c1", 0, "user", "t0", None, t(0)),
      model.Turn("c1", 1, "assistant", "t1", None, t(2)),
      model.Turn("c1", 2, "user", "t2", None, t(7)),
      model.Turn("c1", 3, "tool", "t3", Some("search"), t(8)),
      model.Turn("c2", 0, "user", "t0", None, t(1))).toDF()
    val got = Signals.roleTransitions(turns)
      .orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "from_role", "to_role", "latency_ms")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSeq
    // c2 has a single turn → no transition; c1 turn 0 excluded
    assert(got == Seq(
      ("c1", 1, "user", "assistant", 2000.0),
      ("c1", 2, "assistant", "user", 5000.0),
      ("c1", 3, "user", "tool", 1000.0)))
    // sub-millisecond precision survives (the Timestamp.getTime
    // ms-truncation class): 1500 µs = 1.5 ms, not 1.0
    val fine = Seq(
      model.Turn("c3", 0, "user", "a", None,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00.0005")),
      model.Turn("c3", 1, "assistant", "b", None,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00.002"))).toDF()
    val d = Signals.roleTransitions(fine).select("latency_ms")
      .collect().head.getDouble(0)
    assert(d == 1.5, s"got $d")
  }

  test("rollup excludes null latencies and counts the rest") {
    val turns = Seq(
      model.Turn("c1", 0, "user", "a", None, t(0)),
      model.Turn("c1", 1, "assistant", "b", None, t(10)),
      model.Turn("c1", 2, "user", "c", None, t(30))).toDF()
    val r = Rollup.present(
      Rollup.rollupRaw(Signals.latencyPoints(turns), "minute")).collect().head
    assert(r.getAs[Long]("cnt") == 2L)
    assertClose(r.getAs[Double]("sum_v"), 30000.0)
  }
}
