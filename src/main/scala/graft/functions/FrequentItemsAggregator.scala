package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra–Gries frequent-items state: at most k counters plus the
  * processed-item count (the count anchors the deterministic guarantee
  * a consumer filters on). */
final case class MGState(counters: Map[String, Long], n: Long)

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeable
  * form after Agarwal et al. 2013, "Mergeable Summaries") as a typed
  * Aggregator: partial states are k-bounded counter maps folded
  * map-side, so the exchange carries <= k counters per map partition
  * regardless of corpus size — the same bounded-partial property as
  * [[TopKAggregator]].
  *
  * Counter VALUES depend on fold/merge order (like any MG instance),
  * but the sketch's load-bearing property does not: any item with true
  * frequency > n/(k+1) is GUARANTEED a surviving counter, and every
  * counter underestimates by at most n/(k+1). Consumers that need a
  * deterministic answer therefore use the sketch only to bound the
  * CANDIDATE set and re-count candidates exactly in a second bounded
  * pass ([[graft.queries.TextQueries.heavyHitters]]) — the classic
  * two-pass heavy-hitter shape that never shuffles vocabulary-scale
  * data.
  */
final case class FrequentItemsAggregator(k: Int)
    extends Aggregator[String, MGState, MGState] {
  require(k >= 1, "k must be positive")

  override def zero: MGState = MGState(Map.empty, 0L)

  override def reduce(b: MGState, x: String): MGState = {
    val c = b.counters
    val nc =
      if (c.contains(x)) c.updated(x, c(x) + 1L)
      else if (c.size < k) c.updated(x, 1L)
      // full and unseen: decrement every counter (dropping zeros)
      // instead of inserting — the textbook step
      else c.flatMap { case (t, v) => if (v > 1L) Some(t -> (v - 1L)) else None }
    MGState(nc, b.n + 1L)
  }

  override def merge(a: MGState, b: MGState): MGState = {
    val sum = a.counters ++ b.counters.map { case (t, v) =>
      t -> (v + a.counters.getOrElse(t, 0L))
    }
    val trimmed =
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from all and drop <= 0:
        // error bounds add across merged summaries (Agarwal et al.)
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (t, v) => if (v > cut) Some(t -> (v - cut)) else None }
      }
    MGState(trimmed, a.n + b.n)
  }

  override def finish(r: MGState): MGState = r
  override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
  override def outputEncoder: Encoder[MGState] = Encoders.product[MGState]
}
