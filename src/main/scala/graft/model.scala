package graft

import java.sql.Timestamp

/** Core row types of the engine (SURVEY.md §1.2).
  *
  * The engine's canonical *tall* form is one row per observation:
  * `(key, ts, v)` — `key` is the series identity (a conversation id, a
  * user id, any entity), `ts` the event time (µs, UTC), `v` the signal
  * (Double, thunder's float64-everywhere policy — see
  * thunder/base.py :: Data.astype).
  *
  * Rollup rows carry *mergeable* statistics so that a coarser retention
  * tier is computed exactly from the next finer tier (raw→1m→1h→1d):
  * counts and decimal-quantized sums are associative + commutative,
  * which makes the cascade bit-exact regardless of shuffle order — a
  * property that matters on a 1000-executor cluster where partial
  * aggregation order is nondeterministic.
  */
object model {

  /** One turn of a multi-turn conversation transcript
    * (BASELINE.json input_hint). */
  final case class Turn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: Option[String],
      ts: Timestamp)

  /** Tall observation row — the engine's canonical series point. */
  final case class Point(key: String, ts: Timestamp, v: Double)

  /** A turn with its derived latency signal (ms since previous turn in
    * the same conversation; None for turn_idx == 0). */
  final case class TurnPoint(
      conv_id: String,
      turn_idx: Int,
      ts: Timestamp,
      latency_ms: Option[Double])

  /** Mergeable rollup statistics for one (key, bucket) window.
    *
    * `sumD` / `sumSqD` are BigDecimal-quantized (6 / 12 fractional
    * digits) so partial-aggregate merge order cannot perturb the
    * result; `m2`-style variance is derived at presentation time as
    * `sumSq/n - mean²`. Min/max/count are naturally exact.
    */
  final case class RollupRow(
      key: String,
      bucket: Timestamp,
      cnt: Long,
      sum_v: BigDecimal,
      sumsq_v: BigDecimal,
      min_v: Double,
      max_v: Double)

  /** Compressed chunk of one series for a retention tier
    * (FIXTURES.md §A.3): delta-of-delta timestamps + Gorilla XOR
    * values, plus the mergeable stats of the chunk. */
  final case class Segment(
      key: String,
      bucket: Timestamp,
      n: Int,
      first_ts: Timestamp,
      last_ts: Timestamp,
      ts_enc: Array[Byte],
      val_enc: Array[Byte],
      cnt: Long,
      sum_v: Double,
      min_v: Double,
      max_v: Double)
}
