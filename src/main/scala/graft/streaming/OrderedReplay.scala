package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The watermark replay buffer as a REUSABLE combinator: lifts any
  * per-key event-time fold into an out-of-order-safe streaming
  * operator. Rows buffer in state until the watermark passes their
  * event time, then replay through the fold in event-time order — so
  * the operator's output equals its batch formulation for ANY arrival
  * order within the watermark (the property real feeds need: Kafka
  * topics are ordered per partition only). Rows older than the
  * watermark at arrival are late data and are dropped — the standard
  * admission contract every watermarked Spark aggregation shares.
  *
  * This is the pattern [[StreamingAnalytics.streamingAsOfJoinStream]]
  * hand-rolls at the Row level (it needs a two-sided union and
  * per-mode branching); [[StreamingAnalytics.sessionize]],
  * [[StreamingAnalytics.streamingIntervalOverlap]] and the funnel's
  * event-time mode route through THIS combinator, so the
  * buffer/drain/timeout machinery — the part that is easy to get
  * subtly wrong — exists once.
  *
  * Scale shape: per-key state = the pending buffer (bounded by that
  * key's throughput × the watermark delay, never by stream lifetime)
  * plus whatever `S` the logic keeps; each trigger sorts only a key's
  * buffer (O(b log b) on micro-batch-scale b). Wakeups are event-time
  * timeouts re-armed at the earliest pending row or the logic's own
  * close horizon — a key with neither parks its timeout far ahead (any
  * future data re-arms it; leaving a passed timestamp would re-fire
  * every batch). Pair with the RocksDB state store provider when keys
  * × buffer depth outgrow executor heap (RocksDBStateSpec).
  */
object OrderedReplay {

  /** The per-key operator semantics; everything else is the combinator's.
    * `fold` sees events in GLOBAL event-time order (ties broken by
    * `secondary`, then arrival); `onWatermark` runs after each drain
    * with the current watermark and closes whatever is provably
    * finished — any admissible future event has time >= wm, so a
    * horizon the watermark has passed can never be re-opened. Its
    * third return is the next event-time horizon to wake at (None when
    * only new data or pending events warrant waking).
    */
  trait Logic[K, E, S, O] extends Serializable {
    def eventTime(e: E): Long
    def secondary(e: E): Long = 0L
    def fold(key: K, state: Option[S], e: E): (Option[S], Seq[O])
    def onWatermark(key: K, state: Option[S], wm: Long): (Option[S], Seq[O], Option[Long])
  }

  /** Replay buffer + the logic's own state, checkpoint-persisted.
    * `pending` is ALWAYS stored sorted (time, secondary) — each trigger
    * sorts only its fresh rows and merges, so a wakeup that drains
    * nothing costs O(B), not O(B log B) over a deep buffer. */
  final case class ReplayState[E, S](pending: Seq[E], st: Option[S])

  /** Stable two-pointer merge of two sorted runs: ties take from `a`
    * (the older run) first, preserving arrival order at equal keys —
    * exactly what a stable sort of (a ++ b) would do. */
  private[graft] def mergeSorted[T](
      a: Seq[T], b: Seq[T], lt: (T, T) => Boolean): Seq[T] =
    if (b.isEmpty) a
    else if (a.isEmpty) b
    else {
      val out = Vector.newBuilder[T]
      val ai = a.iterator.buffered
      val bi = b.iterator.buffered
      while (ai.hasNext && bi.hasNext)
        out += (if (lt(bi.head, ai.head)) bi.next() else ai.next())
      ai.foreach(out += _)
      bi.foreach(out += _)
      out.result()
    }

  /** `events` MUST already carry an event-time watermark (the caller
    * owns the delay — it is the disorder bound AND the emission lag).
    */
  def replay[K, E, S, O](
      events: Dataset[E],
      key: E => K,
      logic: Logic[K, E, S, O])(
      implicit kEnc: Encoder[K],
      stateEnc: Encoder[ReplayState[E, S]],
      outEnc: Encoder[O]): Dataset[O] =
    events
      .groupByKey(key)
      .flatMapGroupsWithState[ReplayState[E, S], O](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: K, it: Iterator[E], state: GroupState[ReplayState[E, S]]) =>
          // one unified body serves data batches AND timeout wakeups (a
          // timeout delivers an empty iterator)
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption.getOrElse(ReplayState[E, S](Nil, None))
          val fresh = it.filter(e => logic.eventTime(e) >= wm) // late: dropped
            .toVector.sortBy(e => (logic.eventTime(e), logic.secondary(e)))
          def lt(x: E, y: E): Boolean = {
            val (tx, ty) = (logic.eventTime(x), logic.eventTime(y))
            tx < ty || (tx == ty && logic.secondary(x) < logic.secondary(y))
          }
          // fresh rows all have t >= wm, so they are never replayed in
          // the batch they arrive — anything earlier could still come;
          // the stored buffer is already sorted, so merge, don't re-sort
          val (ready, rest) = mergeSorted(prior.pending, fresh, lt)
            .partition(e => logic.eventTime(e) < wm)
          val out = Seq.newBuilder[O]
          var st = prior.st
          ready.foreach { e =>
            val (s2, os) = logic.fold(k, st, e)
            st = s2
            out ++= os
          }
          val (closedSt, closedOut, horizon) = logic.onWatermark(k, st, wm)
          out ++= closedOut
          if (rest.isEmpty && closedSt.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(ReplayState(rest, closedSt))
            val cands = rest.iterator.map(logic.eventTime).toSeq ++ horizon
            state.setTimeoutTimestamp(
              if (cands.nonEmpty) math.max(cands.min, wm + 1L)
              else wm + 10L * 365 * 86400000L) // parked; any data re-arms
          }
          out.result().iterator
      }
}
