package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.util.QueryExecutionListener

import graft.operators.CacheRelease

/** Consumer-tagged deferred cache release (round-9 ADVICE on
  * PrefixSum.unpersistAfterNextQuery): an interleaved UNRELATED query
  * must NOT release the cache, an actual consumer must, and an
  * abandoned consumer must not leak past the miss cap.
  */
class CacheReleaseSpec extends SparkSuite {
  import spark.implicits._

  /** Counts completed query executions — a sync barrier for the async
    * listener bus: events are delivered to all listeners in
    * registration order per event, so once THIS listener (registered
    * AFTER CacheRelease's) has seen n events, CacheRelease's has too.
    */
  private def withBarrier[A](body: AtomicInteger => A): A = {
    val seen = new AtomicInteger(0)
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        seen.incrementAndGet()
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
        seen.incrementAndGet()
    }
    spark.listenerManager.register(l)
    try body(seen)
    finally spark.listenerManager.unregister(l)
  }

  private def awaitAtLeast(seen: AtomicInteger, n: Int): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (seen.get() < n && System.nanoTime() < deadline) Thread.sleep(10)
    assert(seen.get() >= n, s"listener bus did not deliver $n events in 30s")
  }

  private def cached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != StorageLevel.NONE

  test("unrelated queries do not release the cache; the consumer does") {
    val df = spark.range(0, 100).select($"id", ($"id" * 2).as("v")).toDF()
    df.persist().count() // materialize (the internal phase-1 stand-in)
    withBarrier { seen =>
      val base = seen.get()
      CacheRelease.afterConsumer(df)
      // three interleaved queries that never touch df
      (1 to 3).foreach(i => spark.range(0, 10L * i).count())
      awaitAtLeast(seen, base + 3)
      assert(cached(df), "an unrelated query must not release the cache")
      // the consumer: a DERIVED frame whose plan contains df's subtree
      val consumed = df.filter($"v" > 10).count()
      assert(consumed > 0)
      awaitAtLeast(seen, base + 4)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (cached(df) && System.nanoTime() < deadline) Thread.sleep(10)
      assert(!cached(df), "the consumer's completion must release the cache")
    }
  }

  test("an abandoned consumer releases at the miss cap, not never") {
    val df = spark.range(0, 50).select($"id", ($"id" + 7).as("v")).toDF()
    df.persist().count()
    withBarrier { seen =>
      val base = seen.get()
      CacheRelease.afterConsumer(df, maxMisses = 3)
      (1 to 3).foreach(i => spark.range(0, 5L * i).count())
      awaitAtLeast(seen, base + 3)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (cached(df) && System.nanoTime() < deadline) Thread.sleep(10)
      assert(!cached(df), "the miss cap must bound an abandoned cache's lifetime")
    }
  }
}
