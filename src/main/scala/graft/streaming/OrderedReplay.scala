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
  * [[StreamingAnalytics.sessionize]],
  * [[StreamingAnalytics.streamingIntervalOverlap]] and the funnel's
  * event-time mode route through the typed [[replay]] entry point;
  * [[StreamingAnalytics.streamingAsOfJoinStream]]'s event-time arm —
  * which needs a two-sided union with runtime Row schemas, so the
  * typed `ReplayState` encoder cannot serve it — calls the same
  * [[drain]] core directly with its own Row-packed state. Either way
  * the buffer/merge/partition/fold/timeout machinery — the part that
  * is easy to get subtly wrong — exists ONCE, in [[drain]].
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

  /** Park distance for a key with state but no wakeup horizon: far
    * enough ahead that it never fires on its own (any future data
    * re-arms it; leaving a PASSED timestamp would re-fire every batch). */
  private[streaming] val parkAheadMs = 10L * 365 * 86400000L

  /** One trigger's worth of drained work: output rows, the still-pending
    * (sorted) buffer, the logic state to persist, and the event-time
    * timeout to arm — `None` meaning "nothing left, remove the state". */
  private[streaming] final case class Drained[E, S, O](
      out: Seq[O], rest: Seq[E], st: Option[S], timeoutAt: Option[Long])

  /** THE drain machinery, exactly once: admit fresh rows (drop those
    * already behind the watermark — late data), merge them into the
    * sorted pending buffer, replay everything the watermark has passed
    * through `fold` in event-time order, run the close hook, and
    * compute the next wakeup. Both [[replay]] (typed, case-class
    * state) and [[StreamingAnalytics.streamingAsOfJoinStream]]'s
    * event-time arm (Row-typed two-sided union, Row-packed state) call
    * this; only the GroupState packing differs per caller.
    *
    * Fresh rows all have `t >= wm`, so they are never replayed in the
    * batch they arrive — anything earlier could still come; the stored
    * buffer arrives already sorted, so a wakeup that drains nothing
    * costs O(B), not O(B log B).
    */
  private[streaming] def drain[E, S, O](
      wm: Long,
      fresh0: Iterator[E],
      pending: Seq[E],
      st0: Option[S],
      eventTime: E => Long,
      lt: (E, E) => Boolean,
      fold: (Option[S], E) => (Option[S], Seq[O]),
      onWatermark: (Option[S], Long) => (Option[S], Seq[O], Option[Long]))
      : Drained[E, S, O] = {
    val fresh = fresh0.filter(e => eventTime(e) >= wm) // late: dropped
      .toVector.sortWith(lt)
    val (ready, rest) = mergeSorted(pending, fresh, lt)
      .partition(e => eventTime(e) < wm)
    val out = Seq.newBuilder[O]
    var st = st0
    ready.foreach { e =>
      val (s2, os) = fold(st, e)
      st = s2
      out ++= os
    }
    val (closedSt, closedOut, horizon) = onWatermark(st, wm)
    out ++= closedOut
    val timeoutAt =
      if (rest.isEmpty && closedSt.isEmpty) None
      else {
        val cands = rest.iterator.map(eventTime).toSeq ++ horizon
        Some(
          if (cands.nonEmpty) math.max(cands.min, wm + 1L)
          else wm + parkAheadMs)
      }
    Drained(out.result(), rest, closedSt, timeoutAt)
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
          def lt(x: E, y: E): Boolean = {
            val (tx, ty) = (logic.eventTime(x), logic.eventTime(y))
            tx < ty || (tx == ty && logic.secondary(x) < logic.secondary(y))
          }
          val d = drain[E, S, O](wm, it, prior.pending, prior.st,
            logic.eventTime, lt,
            (s, e) => logic.fold(k, s, e),
            (s, w) => logic.onWatermark(k, s, w))
          d.timeoutAt match {
            case None =>
              if (state.exists) state.remove()
            case Some(ts) =>
              state.update(ReplayState(d.rest, d.st))
              state.setTimeoutTimestamp(ts)
          }
          d.out.iterator
      }
}
