package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-micro-batch latency derivation for streaming transcripts:
  * the stateful twin of `Signals.latencyPoints`.
  *
  * The batch form derives per-turn latency with `lag(ts) over
  * (partition by conv_id order by turn_idx)` — impossible verbatim on
  * a stream, because consecutive turns of one conversation can land in
  * different micro-batches. `flatMapGroupsWithState` carries exactly
  * the state a 10^12-turn stream needs per live conversation: the last
  * seen (turn_idx, ts) — O(live conversations) state, not O(turns).
  *
  * Contract: per-conversation in-order arrival (true of append logs /
  * Kafka partitioned by conv_id). A turn whose predecessor was not the
  * previously-seen turn (gap or replay) emits a null latency rather
  * than a wrong one — the same null-first-turn discipline the batch
  * rollup already filters. Idle conversations' state expires after
  * `timeoutMs` of processing time (bounded state, north_rule
  * checkpoint/resume discipline is handled by the sink's lineage).
  */
object StreamingLatency {

  case class TurnEvent(conv_id: String, turn_idx: Int, ts: java.sql.Timestamp)
  case class ConvState(lastIdx: Int, lastTsUs: Long)
  case class LatencyPoint(key: String, ts: java.sql.Timestamp, v: Option[Double])

  // full microsecond precision: Timestamp.getTime is ms-truncated and
  // would silently diverge from the batch path's unix_micros lag on
  // real event times (µs components); the nanos field carries the rest
  private def tsUs(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  def derive(conv: String, events: Iterator[TurnEvent],
      state: GroupState[ConvState], timeoutMs: Long): Iterator[LatencyPoint] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = events.toSeq.sortBy(_.turn_idx)
      var prev = state.getOption
      val out = sorted.map { e =>
        val v = prev match {
          case Some(s) if e.turn_idx == s.lastIdx + 1 =>
            Some((tsUs(e.ts) - s.lastTsUs) / 1000.0)
          case _ => None // first turn, or a gap we must not guess across
        }
        prev = Some(ConvState(e.turn_idx, tsUs(e.ts)))
        LatencyPoint(e.conv_id, e.ts, v)
      }
      prev.foreach(state.update)
      if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
      out.iterator
    }
  }

  /** turns stream → latency points stream (append mode).
    * `timeoutMs > 0` enables processing-time state expiry for
    * unbounded production streams (NOTE: timeout scheduling makes the
    * engine run continuous housekeeping micro-batches, so bounded
    * replays/tests should pass 0 = NoTimeout and let the query
    * terminate when the data does). */
  def latencyPoints(turns: Dataset[TurnEvent],
      timeoutMs: Long = 3600L * 1000): Dataset[LatencyPoint] = {
    implicit val pointEnc = Encoders.product[LatencyPoint]
    implicit val stateEnc = Encoders.product[ConvState]
    val mode =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    turns
      .groupByKey(_.conv_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, mode)(
        (k, es, s: GroupState[ConvState]) => derive(k, es, s, timeoutMs))
  }
}
