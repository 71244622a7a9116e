package graft

import graft.streaming.OrderedReplay
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, timestamp_millis}

/** The replay combinator tested at its own level (its three users —
  * sessionize, funnel, interval overlap — each pin end-to-end
  * semantics; this pins the MACHINERY): event-time-ordered delivery
  * for any arrival slicing, stable tie handling, the mergeSorted
  * invariant, and watermark-close horizons.
  */
object OrderedReplaySpec {
  final case class Ev(k: Long, ts: Long, id: Long)

  /** Identity logic: emit every event with a drain sequence number —
    * the combinator's delivery order made observable. No close
    * horizon; state is the per-key count of drained events. */
  final case class TapLogic()
      extends OrderedReplay.Logic[Long, Ev, Long, (Long, Long, Long)] {
    def eventTime(e: Ev): Long = e.ts
    def fold(k: Long, st: Option[Long], e: Ev) = {
      val n = st.getOrElse(0L)
      (Some(n + 1), Seq((e.k, e.id, n))) // (key, event id, drain position)
    }
    def onWatermark(k: Long, st: Option[Long], wm: Long) = (st, Nil, None)
  }

  /** Close-horizon logic: one counter per key, closed (emitted +
    * cleared) once the watermark passes lastSeen + 10s. */
  final case class CloseLogic()
      extends OrderedReplay.Logic[Long, Ev, (Long, Long), (Long, Long)] {
    def eventTime(e: Ev): Long = e.ts
    def fold(k: Long, st: Option[(Long, Long)], e: Ev) =
      (Some((e.ts, st.map(_._2).getOrElse(0L) + 1L)), Nil)
    def onWatermark(k: Long, st: Option[(Long, Long)], wm: Long) = st match {
      case Some((last, n)) if wm > last + 10000L => (None, Seq((k, n)), None)
      case Some((last, _)) => (st, Nil, Some(last + 10000L))
      case None => (None, Nil, None)
    }
  }
}

class OrderedReplaySpec extends SparkSuite {
  import spark.implicits._

  private val h0 = 1700000000000L

  test("mergeSorted equals a stable sort of the concatenation") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 20) {
      val a = Vector.fill(rnd.nextInt(20))((rnd.nextInt(10), rnd.nextInt(1000)))
        .sortBy(_._1)
      val b = Vector.fill(rnd.nextInt(20))((rnd.nextInt(10), rnd.nextInt(1000)))
        .sortBy(_._1)
      val got = OrderedReplay.mergeSorted[(Int, Int)](a, b, _._1 < _._1)
      val want = (a ++ b).sortBy(_._1) // scala sortBy is stable
      assert(got == want, s"merge diverged:\n$got\n$want")
    }
  }


  test("delivery is event-time-ordered per key for ANY arrival slicing; late rows drop") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(9)
    // unique times per key; ids encode the expected event-time rank
    val events = for {
      k <- 1L to 3L
      i <- 0L until 40L
    } yield OrderedReplaySpec.Ev(k, h0 + i * 1000L + k, i) // id = expected time rank
    val mem = MemoryStream[OrderedReplaySpec.Ev]
    val replayed = OrderedReplay.replay(
      mem.toDF()
        .withColumn("event_time", timestamp_millis(col("ts")))
        .withWatermark("event_time", "1 minute")
        .as[OrderedReplaySpec.Ev],
      (e: OrderedReplaySpec.Ev) => e.k,
      OrderedReplaySpec.TapLogic())
    val q = replayed.toDF("k", "id", "pos")
      .writeStream.format("memory").queryName("tap")
      .outputMode("append").start()
    rnd.shuffle(events).grouped(25).foreach { s =>
      mem.addData(s: _*); q.processAllAvailable()
    }
    // flush twice: the first advances the watermark, the second runs a
    // batch under it so every key's drain timeout fires
    mem.addData(OrderedReplaySpec.Ev(9L, h0 + 100L * 3600000L, 0L)); q.processAllAvailable()
    mem.addData(OrderedReplaySpec.Ev(9L, h0 + 100L * 3600000L + 1L, 0L)); q.processAllAvailable()
    val got = spark.table("tap").as[(Long, Long, Long)].collect()
      .filter(_._1 != 9L)
    q.stop()
    assert(got.length == events.size, s"every in-watermark event drains: ${got.length}")
    got.foreach { case (k, id, pos) =>
      assert(id == pos, s"key $k: event with time-rank $id drained at position $pos")
    }
    // a genuinely late row (behind the advanced watermark) drops silently
    val mem2 = MemoryStream[OrderedReplaySpec.Ev]
    val q2 = OrderedReplay.replay(
        mem2.toDF()
          .withColumn("event_time", timestamp_millis(col("ts")))
          .withWatermark("event_time", "0 seconds")
          .as[OrderedReplaySpec.Ev],
        (e: OrderedReplaySpec.Ev) => e.k, OrderedReplaySpec.TapLogic())
      .toDF("k", "id", "pos")
      .writeStream.format("memory").queryName("tap_late")
      .outputMode("append").start()
    mem2.addData(OrderedReplaySpec.Ev(1L, h0 + 3600000L, 0L)); q2.processAllAvailable()
    mem2.addData(OrderedReplaySpec.Ev(1L, h0, 99L)) // an hour behind the watermark
    q2.processAllAvailable()
    mem2.addData(OrderedReplaySpec.Ev(1L, h0 + 2 * 3600000L, 1L)); q2.processAllAvailable()
    mem2.addData(OrderedReplaySpec.Ev(1L, h0 + 3 * 3600000L, 2L)); q2.processAllAvailable()
    val ids = spark.table("tap_late").select("id").as[Long].collect().toSet
    q2.stop()
    assert(!ids.contains(99L), s"late row must be dropped, got $ids")
    assert(ids.contains(0L) && ids.contains(1L), s"in-watermark rows drain: $ids")
  }


  test("onWatermark horizons fire via timeouts and clear state") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[OrderedReplaySpec.Ev]
    val q = OrderedReplay.replay(
        mem.toDF()
          .withColumn("event_time", timestamp_millis(col("ts")))
          .withWatermark("event_time", "0 seconds")
          .as[OrderedReplaySpec.Ev],
        (e: OrderedReplaySpec.Ev) => e.k, OrderedReplaySpec.CloseLogic())
      .toDF("k", "n")
      .writeStream.format("memory").queryName("closer")
      .outputMode("append").start()
    mem.addData(OrderedReplaySpec.Ev(1L, h0, 0L), OrderedReplaySpec.Ev(1L, h0 + 1000L, 1L)); q.processAllAvailable()
    // another key's data advances the watermark past key 1's horizon;
    // key 1 itself receives NO more rows — only its timeout can close it
    mem.addData(OrderedReplaySpec.Ev(2L, h0 + 60000L, 2L)); q.processAllAvailable()
    mem.addData(OrderedReplaySpec.Ev(2L, h0 + 61000L, 3L)); q.processAllAvailable()
    mem.addData(OrderedReplaySpec.Ev(2L, h0 + 120000L, 4L)); q.processAllAvailable()
    val got = spark.table("closer").as[(Long, Long)].collect().toMap
    q.stop()
    assert(got.get(1L).contains(2L),
      s"key 1 must close with both drained events counted: $got")
  }
}
