package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import scala.util.control.NonFatal

/** Deferred cache release, tagged to the cached frame's CONSUMER — the
  * shared release path for overflow branches whose returned plan still
  * references a persisted frame: an eager unpersist would re-trigger
  * the recompute the persist exists to stop, and never releasing leaks
  * executor cache across a long-lived session running many queries.
  *
  * The naive form ("unpersist after the NEXT completed query, whatever
  * it is") has two failure modes on a shared session: an interleaved
  * UNRELATED query releases the cache early — phase 2 silently
  * recomputes the scan the cache exists to avoid — and if the consumer
  * never runs an action, the cached frame plus the listener leak for
  * the session lifetime. This release instead fires only when a query
  * that actually READS the cached frame completes, with a bounded-miss
  * fallback so abandoned results cannot leak.
  */
object CacheRelease {

  /** Unpersist `df` after the first completed query that (a) was
    * created AFTER this registration and (b) references `df`'s analyzed
    * plan as a subtree — i.e. an actual consumer of the cache, not an
    * interleaved bystander. In-flight listener events from the internal
    * probe actions that PRECEDE registration (the overflow-branch
    * decision count, phase-1 subtotals) carry a lower QueryExecution id
    * than the sentinel and cannot release early.
    *
    * Fallback: after `maxMisses` unrelated completions the cache is
    * released anyway — an abandoned result frame must not pin executor
    * memory forever. Early release is always correctness-harmless:
    * unpersist only drops cached blocks, the consumer then recomputes.
    */
  def afterConsumer(df: Dataset[_], maxMisses: Int = 64): Unit = {
    val lm = df.sparkSession.listenerManager
    val target = df.queryExecution.analyzed
    // id high-water mark: anything created before this point is an
    // internal probe whose completion event may still be in flight
    val sentinel = df.sparkSession.range(0).queryExecution.id
    lm.register(new QueryExecutionListener {
      private[this] var misses = 0
      private def done(): Unit = { df.unpersist(); lm.unregister(this) }
      private def check(qe: QueryExecution): Unit = synchronized {
        // pre-sentinel completions are in-flight probe actions from
        // BEFORE registration — neither a consumer nor a "miss": they
        // must not erode the maxMisses budget of post-registration
        // bystanders, so ignore them entirely
        if (qe.id > sentinel) {
          val consumed =
            try qe.analyzed.exists(_.sameResult(target))
            catch { case NonFatal(_) => false }
          if (consumed) done()
          else { misses += 1; if (misses >= maxMisses) done() }
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = check(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = check(qe)
    })
  }
}
