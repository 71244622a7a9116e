package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ordering contract for [[StreamingAnalytics.streamingAsOfJoinStream]]
  * — the processing-time vs event-time temporal-join split:
  * [[AsOfStreamMode.EventTime]] buffers rows until the watermark
  * passes them and replays in event-time order (output equals the
  * batch join on ANY feed within the watermark; emission lags by the
  * watermark), [[AsOfStreamMode.Arrival]] matches each fact against
  * the freshest already-arrived dimension row (prompt emission;
  * cross-batch matching reflects arrival order).
  */
sealed trait AsOfStreamMode extends Serializable
object AsOfStreamMode {
  /** Live-enrichment contract: emit in the arriving micro-batch,
    * matched against dimension rows that have already arrived. */
  case object Arrival extends AsOfStreamMode
  /** Out-of-order-safe contract: watermark-buffered event-time replay;
    * equals the batch join for any arrival order within the watermark. */
  case object EventTime extends AsOfStreamMode
}

/** Streaming twins of the batch analytics operators: watermarked
  * event-time windows for the aggregate surface, and custom session
  * state via `flatMapGroupsWithState` — the two Structured Streaming
  * shapes a continuously-ingesting deployment of this engine runs.
  *
  * The reference has no watermark/late-data machinery at all (SURVEY
  * §2.3: late records fall into the currently-open file); these
  * operators are the additive streaming-analytics surface, with late
  * data bounded explicitly by the watermark.
  */
object StreamingAnalytics {

  /** Watermarked tumbling-window event counts over a wire-record stream
    * (streaming e_event_stats): event time from the record timestamp,
    * late data beyond `watermark` dropped, one closed row per
    * (window, topic) in append mode once the watermark passes.
    */
  def windowedEventCounts(
      records: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "1 hour"
  ): DataFrame =
    records
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("topic"))
      .agg(
        count(lit(1)).as("n_records"),
        min(col("timestamp")).as("min_ts"),
        max(col("timestamp")).as("max_ts"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("topic"), col("n_records"), col("min_ts"), col("max_ts"))

  /** One user's open session: accumulated across micro-batches. */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** A closed session, emitted when the gap elapses (or on timeout). */
  final case class ClosedSession(userId: Long, start: Long, n: Long, durationMs: Long)

  /** Input shape for streaming sessionization. */
  final case class UserEvent(userId: Long, tsMs: Long)

  /** A key's latest record (streaming compaction state). */
  final case class LatestRecord(
      topic: String, partition: Int, key: Option[String],
      offset: Long, value: String, timestamp: Long)

  /** Streaming compaction: continuously maintained latest-value-per-key
    * (the streaming twin of CompactionEngine.latestPerKey, and the
    * reference's intended compaction semantics, SURVEY §2.9) via
    * `mapGroupsWithState` in update mode — each micro-batch emits the
    * new latest record for every key it touched. State per key is one
    * record; at 100 TB of *throughput* that is bounded by the keyspace,
    * the same bound a compacted Kafka topic itself has.
    */
  def streamingCompact(records: DataFrame): Dataset[LatestRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .select(col("topic"), col("partition"), col("offset"),
        col("key"), col("value"), col("timestamp"))
      .as[(String, Int, Long, Option[String], String, Long)]
      // Option key: a null-key record and an empty-string-key record are
      // DIFFERENT compaction groups (same as the batch latestPerKey,
      // which groups null keys separately and preserves nullness)
      .groupByKey { case (t, p, _, k, _, _) => (t, p, k) }
      .mapGroupsWithState[LatestRecord, LatestRecord](GroupStateTimeout.NoTimeout()) {
        case ((topic, partition, key), rows, state: GroupState[LatestRecord]) =>
          val candidates = state.getOption.iterator ++ rows.map {
            case (t, p, o, k, v, ts) => LatestRecord(t, p, k, o, v, ts)
          }
          val latest = candidates.maxBy(_.offset)
          state.update(latest)
          latest
      }
  }

  /** Streaming exact dedup (streaming twin of the batch d_dedup_keep):
    * keep the first-seen document per content fingerprint, with state
    * BOUNDED by the watermark — `dropDuplicatesWithinWatermark` evicts a
    * fingerprint once the watermark passes its event time, so state is
    * O(docs per watermark window), not O(corpus). That is the only
    * formulation that survives an unbounded 100 TB/day ingest; plain
    * `dropDuplicates` on a stream pins every fingerprint ever seen.
    * Duplicates farther apart than the watermark are left for the batch
    * dedup pass over the archived output (the standard lambda split).
    *
    * Expects a doc stream with `text` and an epoch-millis `ts_ms`.
    */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withColumn("fingerprint", graft.functions.TextFunctions.fingerprint(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming benchmark decontamination (streaming twin of d_decontam):
    * drop any document sharing a word-3-gram with the held-out set. The
    * benchmark gram set is metadata-scale (an eval suite, not a corpus),
    * so it rides along as a literal array and the operator is a PURE
    * STATELESS FILTER — append mode, no watermark, no state store, the
    * shape that runs at any throughput. For gram sets too big for a
    * literal, swap the membership test for a broadcast Bloom filter; the
    * operator shape is unchanged.
    */
  def streamingDecontaminate(docs: DataFrame, benchGrams: Seq[String]): DataFrame =
    docs.filter(!arrays_overlap(
      graft.functions.WordNGrams.word_ngrams(col("text"), 3),
      lit(benchGrams.toArray)))

  /** Streaming near-dup probe against a static corpus index (streaming
    * twin of the batch `d_dedup_incremental`): every micro-batch of new
    * docs runs [[graft.queries.TextQueries.probeNearDups]] against the
    * precomputed [[graft.queries.TextQueries.NearDupIndex]] — band
    * hashes in-row, index equi-join, exact in-row verification. The
    * probe runs inside `foreachBatch`, so each micro-batch is a plain
    * batch frame (the candidate `distinct` is per-batch, never
    * streaming state) and NOTHING buffers across batches: state is
    * zero regardless of stream lifetime, the only shape that survives
    * unbounded ingest. The index is the batch pipeline's nightly
    * artifact; refreshing it means restarting the query with the new
    * index, exactly like any other broadcast-dimension refresh.
    * `sink` receives each micro-batch's verified (new_id, old_id,
    * jaccard) rows.
    *
    * The index frames are persisted here — without materialization
    * every trigger would re-derive the whole corpus index from source,
    * the corpus-dominated cost the index exists to amortize. The
    * caller releases them with `index.unpersist()` after stopping the
    * query (the index outlives any single query on purpose: the same
    * artifact serves concurrent probes).
    */
  def streamingNearDupProbe(
      docs: DataFrame,
      index: graft.queries.TextQueries.NearDupIndex,
      checkpoint: String,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    index.persist()
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.queries.TextQueries.probeNearDups(batch.toDF(), index))
      }
      .start()
  }

  /** Streaming distribution-drift probe — the distribution twin of
    * [[streamingNearDupProbe]], same zero-state shape: each micro-batch
    * of docs runs [[graft.queries.TextQueries.klAgainst]] against the
    * precomputed corpus
    * [[graft.queries.TextQueries.TermDistribution]], emitting one
    * (n_terms, n_tokens, n_unseen, kl_divergence) row per batch — the
    * ingest-monitoring signal that gates a crawl snapshot before it
    * joins the training mix. Nothing buffers across batches; the
    * reference is the batch side's nightly artifact, persisted here
    * because every trigger probes it. The caller releases it with
    * `ref.unpersist()` after stopping the query.
    */
  def streamingDriftProbe(
      docs: DataFrame,
      ref: graft.queries.TextQueries.TermDistribution,
      checkpoint: String,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    ref.persist()
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.queries.TextQueries.klAgainst(batch.toDF(), ref))
      }
      .start()
  }

  /** Streaming chunk-contamination probe — the chunk-granularity twin
    * of [[streamingNearDupProbe]], same zero-state shape: each
    * micro-batch of docs runs [[graft.queries.TextQueries.probeChunks]]
    * against the precomputed corpus
    * [[graft.queries.TextQueries.ChunkIndex]] (chunks fingerprinted
    * in-row, fingerprint-keyed index join, per-doc census inside
    * `foreachBatch`). Nothing buffers across batches; the index is the
    * batch pipeline's nightly artifact and is persisted here for the
    * same reason as the near-dup index — every trigger would otherwise
    * re-derive it from source. The caller releases it with
    * `index.unpersist()` after stopping the query.
    */
  def streamingChunkProbe(
      docs: DataFrame,
      index: graft.queries.TextQueries.ChunkIndex,
      checkpoint: String,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    index.persist()
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.queries.TextQueries.probeChunks(batch.toDF(), index))
      }
      .start()
  }

  /** Streaming duplicate-substring scrub — the span-removal twin of
    * [[streamingChunkProbe]], same zero-state shape: each micro-batch
    * runs [[graft.queries.TextQueries.probeScrub]] against the corpus
    * [[graft.queries.TextQueries.ScrubIndex]] (batch gram multiplicity
    * + indexed corpus counts decide the cut; rebuild is per-row array
    * algebra), emitting the scrubbed documents as they arrive — the
    * ingest-time rewrite that keeps verbatim boilerplate out of the
    * training mix without waiting for the nightly global pass. Nothing
    * buffers across batches; within-batch self-duplication is per
    * micro-batch by construction (cross-batch duplicates are the
    * nightly index rebuild's job — the standard lambda split
    * [[streamingDedup]] documents). The caller releases the persisted
    * index with `index.unpersist()` after stopping the query.
    */
  def streamingScrubProbe(
      docs: DataFrame,
      index: graft.queries.TextQueries.ScrubIndex,
      checkpoint: String,
      sink: DataFrame => Unit,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    index.persist()
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.queries.TextQueries.probeScrub(batch.toDF(), index))
      }
      .start()
  }

  /** Streaming ANN probe against the durable partition-pruned
    * [[graft.queries.SimilarityQueries.IvfIndex]] — the retrieval twin
    * of [[streamingNearDupProbe]], same zero-state shape: each
    * micro-batch of query vectors (vec_id, embedding) runs
    * [[graft.queries.SimilarityQueries.probeIvfIndex]] against the
    * nightly artifact, emitting per-query top-k neighbors as queries
    * arrive — the online-retrieval story over the same index
    * `build-index --kind ivf` / `update-index` maintain. The centroid
    * head (metadata-scale) is persisted across triggers; the VECTORS
    * frame deliberately is NOT — each probe's cell filter prunes the
    * hive-partitioned artifact at file-listing time, which caching the
    * full frame in memory would defeat. Nothing buffers across
    * batches; index refresh is `update-index`'s job (the same lambda
    * split as the other probes). The caller releases the centroid head
    * with `index.centroids.unpersist()` after stopping the query.
    */
  def streamingIvfProbe(
      queries: DataFrame,
      index: graft.queries.SimilarityQueries.IvfIndex,
      checkpoint: String,
      sink: DataFrame => Unit,
      k: Int = 5,
      nprobe: Int = 4,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    index.centroids.persist()
    queries.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.queries.SimilarityQueries.probeIvfIndex(
          index, batch.toDF(), k, nprobe))
      }
      .start()
  }

  /** Streaming OHLC bars (streaming twin of the batch `e_ohlc`):
    * watermarked hourly tumbling windows per user, the bar built by
    * the SAME min_by/max_by-over-packed-order-key aggregate as the
    * batch query — append mode emits each bar exactly once when the
    * watermark closes its hour, columns aligned with the batch gate so
    * the two are directly comparable. State is O(open bars) and each
    * bar's state is O(1): the (ts_ms, event_id) struct order key means
    * the store holds only the current extrema, never the bar's events
    * (struct ordering is exact for any id/timestamp range, matching
    * the batch query's key).
    */
  def streamingOhlcBars(
      events: DataFrame, // user_id, ts_ms, event_id, value
      watermark: String = "1 hour"): DataFrame = {
    val ordKey = struct(col("ts_ms"), col("event_id"))
    events
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", watermark)
      .groupBy(col("user_id"), window(col("event_time"), "1 hour"))
      .agg(
        min_by(col("value"), ordKey).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ordKey).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_value"))
      .select(col("user_id"),
        expr("unix_millis(window.start) div 3600000").as("hour"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming point-in-time enrichment through the NATIVE as-of
    * operator ([[graft.plans.AsOfJoin]]) — the streaming twin of the
    * batch `q_asof_order`/`q_asof_forward`/`q_asof_nearest` family and
    * the feature-store pattern: each arriving left row picks up the
    * as-of-matching row of a STATIC right table (the nightly dimension
    * artifact), so features are attached with the same
    * no-future-leakage semantics the batch queries gate. Zero
    * cross-batch state — each micro-batch runs one merge pass of the
    * custom operator (batch-side shuffle is batch-scale, right side
    * re-shuffles per trigger at dimension scale; for a large dimension,
    * pre-bucket the artifact on the key). Right-table refresh is the
    * caller's lambda split, same as the index probes.
    *
    * The sink receives the epoch's BATCH ID alongside the joined frame:
    * foreachBatch is at-least-once (a crash between the sink's write
    * and the checkpoint commit re-runs the batch on restart), so a
    * durable sink must key its write on the batch id — e.g. overwrite a
    * `batch_id=<id>` partition directory — to stay idempotent under
    * replay. Sinks that only buffer in memory can ignore it.
    */
  def streamingAsOfProbe(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTiebreak: Seq[String],
      checkpoint: String,
      sink: (DataFrame, Long) => Unit,
      direction: graft.plans.AsOfDirection = graft.plans.AsOfDirection.Backward,
      toleranceMs: Option[Long] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery =
    left.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        sink(graft.plans.AsOfJoin.join(direction, b, right,
          keys.map(k => b(k._1)), keys.map(k => right(k._2)),
          b(leftTimeCol), right(rightTimeCol),
          rightTiebreak.map(right(_)), toleranceMs), batchId)
      }
      .start()

  /** Live heavy-hitter monitor: a running Misra–Gries sketch over the
    * token stream, one [[graft.functions.MGState]] row per trigger
    * (Complete mode on a single global group). State is the k-bounded
    * counter map — O(k) forever, never O(vocabulary) — and the partials
    * crossing each trigger's exchange are k-bounded too, the property
    * that lets this watch an unbounded 100 TB/day feed. Consumers apply
    * the same two-pass discipline as the batch
    * [[graft.queries.TextQueries.heavyHitters]]: the live sketch bounds
    * the candidates (guarantee: freq > n/(k+1) ⇒ present), a bounded
    * batch re-count decides exactly.
    */
  def streamingHeavyHitters(
      docs: DataFrame, k: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .as[String]
      .groupByKey(_ => 0)
      .agg(graft.functions.FrequentItemsAggregator(k).toColumn.name("sketch"))
      .toDF("g", "sketch")
      .select("sketch")
  }

  /** Running per-source token accounting — the live input feed of the
    * batch epoch/mixing plan (`p_epoch_plan`): every micro-batch folds
    * its docs' token counts into a per-source running (n_docs,
    * n_tokens) aggregate. Token counting runs scan-side in the batch
    * (size of the whitespace split, no explode), so each trigger
    * shuffles ONE narrow row per source per map partition and the
    * state store holds source-cardinality rows — O(sources), not
    * O(stream), for any lifetime. Run with Update/Complete output into
    * the mixing dashboard; the batch plan recomputes exactly from the
    * archive whenever the live counters need re-anchoring.
    */
  def streamingTokenAccount(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        size(graft.functions.TextFunctions.wsTokens(col("text"))).cast("long").as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("n_tokens"))

  /** Streaming twin of the mergeable-HLL family
    * ([[graft.queries.SketchQueries]]): watermarked per-window
    * cardinality sketches. Each (event-time window, key) group folds
    * its ids into ONE HLL buffer held in the state store — fixed-size
    * state per open window × key whatever the throughput, the property
    * that makes streaming distinct-counting viable at all (exact
    * distinct state grows with the id universe). Rows emit in APPEND
    * mode once the watermark closes the window, carrying both the
    * estimate (the live dashboard read) and the SKETCH ITSELF — closed
    * windows are final, so the emitted rows are mergeable facts:
    * roll 24 hourly rows into a daily cardinality with `hll_union_agg`
    * without re-reading events, or fold them into the durable artifact
    * via [[graft.queries.SketchQueries.HllIndex.updatedFromSketches]]
    * (the lambda seam: live path and nightly index meet without either
    * side touching raw data again).
    *
    * Out-of-order arrival within the watermark cannot change the SET a
    * window sees, so the estimate matches the batch sketch over the
    * same rows up to DataSketches' sub-percent HIP merge-order wobble
    * (SketchSpec bounds it); the gate-style exact anchor lives in the
    * spec, which pins shuffled-arrival estimates against batch exact
    * counts.
    */
  def streamingDistinctSketches(
      events: DataFrame,
      idCol: String = "user_id",
      keyCol: String = "event_type",
      tsMsCol: String = "ts_ms",
      windowDur: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("__ev_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("__ev_time", watermark)
      .groupBy(window(col("__ev_time"), windowDur).as("w"), col(keyCol))
      .agg(hll_sketch_agg(col(idCol),
        lit(graft.queries.SketchQueries.LgK)).as("sk"))
      .select(
        unix_millis(col("w.start")).as("win_start_ms"),
        col(keyCol),
        hll_sketch_estimate(col("sk")).as("n_est"),
        col("sk"))

  /** The quantile twin of [[streamingDistinctSketches]]: watermarked
    * per-window KLL sketches of a value column — live latency/length
    * percentiles at fixed state per open window × key, closed-window
    * rows carrying the sketch so they remain mergeable facts (a day's
    * p99 from 24 hourly rows via `kll_merge_agg`, never from raw
    * events). The emitted p50/p90/p99 columns are the dashboard read;
    * a consumer needing other ranks reads the sketch. Same arrival
    * contract as the distinct twin: the window's value MULTISET is
    * arrival-order free, so estimates match a batch build up to KLL's
    * deterministic-compaction rank guarantee (spec-pinned).
    */
  def streamingQuantileSketches(
      events: DataFrame,
      valueCol: String = "value",
      keyCol: String = "event_type",
      tsMsCol: String = "ts_ms",
      windowDur: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val fns = graft.functions.KllSketch
    events
      .withColumn("__ev_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("__ev_time", watermark)
      .groupBy(window(col("__ev_time"), windowDur).as("w"), col(keyCol))
      .agg(fns.sketchAgg(col(valueCol).cast("double")).as("sk"),
        count(col(valueCol)).as("n"))
      .select(
        unix_millis(col("w.start")).as("win_start_ms"),
        col(keyCol), col("n"),
        fns.quantile(col("sk"), lit(0.5)).as("p50"),
        fns.quantile(col("sk"), lit(0.9)).as("p90"),
        fns.quantile(col("sk"), lit(0.99)).as("p99"),
        col("sk"))
  }

  /** The theta twin of [[streamingDistinctSketches]], completing the
    * streaming sketch triad (HLL cardinality / KLL quantiles / theta
    * sets): watermarked per-(window, source) theta sketches of the
    * document gram stream. Theta is the DIRECT-intersection kind —
    * closed-window rows answer "how much does tonight's crawl window
    * share with source X?" by set intersection, where an HLL row can
    * only difference union-scale estimates (the 7684-vs-2802 fixture
    * in SketchSpec) — so the live rows feed the same probes as the
    * durable `theta` index kind, and fold into it through
    * [[graft.queries.SketchQueries.ThetaIndex.updatedFromSketches]]
    * without either side re-reading raw text.
    *
    * Plan shape: grams explode INSIDE the watermarked aggregation
    * (payload text never sits in state), one update-sketch buffer per
    * open window × source — fixed-size state whatever the throughput.
    * `posexplode_outer` keeps gramless docs first-class: the null gram
    * row skips the sketch (update is null-safe) but still counts the
    * doc via the pos-0/null-pos marker, so `n_docs` is exact and a
    * short-doc-only source still emits its (empty-sketch) row — the
    * same contract the batch builder keeps. Out-of-order arrival
    * within the watermark cannot change a window's gram SET, so
    * estimates match a batch build over the same rows exactly (theta
    * update sketches dedup by key hash; no HIP order wobble —
    * spec-pinned against exact distinct counts).
    */
  def streamingThetaSketches(
      docs: DataFrame,
      tsMsCol: String = "ts_ms",
      sourceCol: String = "source",
      textCol: String = "text",
      gramN: Int = 3,
      windowDur: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val fns = graft.functions.ThetaSketch
    docs
      .withColumn("__ev_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("__ev_time", watermark)
      .select(col("__ev_time"), col(sourceCol).as("source"),
        posexplode_outer(
          graft.functions.WordNGrams.word_ngrams(col(textCol), gramN))
          .as(Seq("__p", "__g")))
      .groupBy(window(col("__ev_time"), windowDur).as("w"), col("source"))
      .agg(fns.sketchAgg(col("__g")).as("sk"),
        sum(when(col("__p").isNull || col("__p") === 0, 1L).otherwise(0L))
          .as("n_docs"))
      .select(
        unix_millis(col("w.start")).as("win_start_ms"),
        col("source"),
        col("n_docs"),
        fns.estimate(col("sk")).cast("long").as("n_grams_est"),
        col("sk"))
  }

  final case class ShardAssign(
      source: String, docId: Long, nb: Long, shardId: Long, shardOff: Long)

  /** Streaming twin of the batch shard packer
    * ([[graft.queries.TextQueries.shardPack]]): as documents arrive,
    * each source's payload stream is cut into byte-budget shards with
    * a per-source running offset held in `mapGroupsWithState`-style
    * state. Keying by SOURCE is the scale decision: a single global
    * offset would funnel every row through one state key (the
    * streaming analog of the unpartitioned window the batch side's
    * two-phase prefix sum exists to avoid); per-source counters spread
    * across the state store and match how a production shard writer
    * runs one tar stream per source/writer anyway. Docs inside one
    * micro-batch pack in doc_id order (deterministic replay); state is
    * one long per source — O(sources) for any stream lifetime. The
    * nightly batch layout recomputes exactly from the archive when
    * offsets need re-anchoring.
    */
  def streamingShardOffsets(
      docs: DataFrame, budget: Long = 65536L): Dataset[ShardAssign] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("nb"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, ShardAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[(String, Long, Long)], state: GroupState[Long]) =>
          var run = state.getOption.getOrElse(0L)
          val out = it.toArray.sortBy(_._2).map { case (_, id, nb) =>
            val a = ShardAssign(source, id, nb, run / budget, run % budget)
            run += nb
            a
          }
          state.update(run)
          out.iterator
      }
  }

  final case class HourCount(event_type: String, h: Long, x: Long)
  final case class CusumPoint(
      event_type: String, h: Long, cusum: Long, peak: Long, peak_h: Long)

  /** Streaming CUSUM level-shift monitor — the live twin of
    * [[graft.queries.AnalyticsQueries.cusumChangepoint]], the same
    * lambda split as the other probes: the BATCH census supplies each
    * type's frozen baseline (m observed hours, S total events — the
    * integer pair that centers the series as y = m·x − S without a
    * per-row division), and the stream folds Page's recursion
    * S_t = max(0, S_{t−1} + y_t) over arriving hourly counts, emitting
    * the running statistic plus the peak-so-far and its hour. Input is
    * the (type, hour, count) stream an upstream watermarked window
    * aggregate produces (hours inside one micro-batch fold in h order;
    * cross-batch ordering is the upstream watermark's job). State is
    * THREE longs per type — O(types) for any stream lifetime — and the
    * fold is exact integer algebra, so a replay (or the nightly batch
    * recomputation) reproduces it bit-for-bit.
    *
    * Types ABSENT from the baseline map are dropped (no rows emitted,
    * no state kept): a type the batch census never saw has no (m, S)
    * pair, and folding it with a degenerate stand-in (e.g. m=1, s=0 ⇒
    * y = x) would silently report every arriving count as pure excess —
    * an ever-growing false alarm. Re-run the batch census to admit new
    * types; a monitor wanting them surfaced routes the input through a
    * separate unknown-type filter instead.
    */
  def streamingCusum(
      hourly: Dataset[HourCount],
      baseline: Map[String, (Long, Long)]): Dataset[CusumPoint] = {
    val spark = hourly.sparkSession
    import spark.implicits._
    hourly
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Long, Long), CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[HourCount], state: GroupState[(Long, Long, Long)]) =>
          baseline.get(tpe) match {
            case None => Iterator.empty // unknown to the census: drop, don't fabricate a baseline
            case Some((m, s)) =>
              var (st, peak, peakH) =
                state.getOption.getOrElse((0L, Long.MinValue, 0L))
              val out = it.toArray.sortBy(_.h).map { hc =>
                st = math.max(0L, st + (m * hc.x - s))
                if (st > peak) { peak = st; peakH = hc.h }
                CusumPoint(tpe, hc.h, st, peak, peakH)
              }
              state.update((st, peak, peakH))
              out.iterator
          }
      }
  }

  final case class BudgetAdmit(
      source: String, docId: Long, nTokens: Long, cumTokens: Long, admitted: Boolean)

  /** Streaming token-budget gate — the ingest-side admission control
    * twin of the batch [[graft.queries.TextQueries.tokenBudgetSelect]]:
    * each source admits documents until its running token total
    * reaches the per-source budget, then marks the rest rejected (a
    * downstream filter drops or re-routes them). State is ONE long per
    * source — O(sources) forever — and admission is deterministic:
    * docs inside a micro-batch are considered in doc_id order, and a
    * doc is admitted only if it fits entirely (the batch twin's
    * whole-doc rule), so replays admit the identical set. The batch
    * plan re-derives the selection exactly from the archive whenever
    * the budget or order policy changes.
    */
  def streamingTokenBudget(
      docs: DataFrame, budget: Long = 10000L): Dataset[BudgetAdmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        size(graft.functions.TextFunctions.wsTokens(col("text")))
          .cast("long").as("nt"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, BudgetAdmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[(String, Long, Long)], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = it.toArray.sortBy(_._2).map { case (_, id, nt) =>
            val fits = used + nt <= budget
            if (fits) used += nt
            BudgetAdmit(source, id, nt, used, fits)
          }
          state.update(used)
          out.iterator
      }
  }

  /** STREAM-STREAM as-of join — both sides unbounded: the real-time
    * feature-store case where facts AND dimension updates arrive live
    * (events + feature writes), completing the as-of family's streaming
    * story beyond [[streamingAsOfProbe]]'s static right side. The
    * backward arm of the native operator is exactly a one-row
    * candidate memory per key — here that memory is made PERSISTENT:
    * `flatMapGroupsWithState` keys the union of both streams on the
    * join key and carries, per key, the latest right row at-or-before
    * the stream's progress; each left row emits joined against the
    * current state. State survives restarts through the checkpoint, so
    * a dimension write from last week still enriches today's facts.
    *
    * Two ordering contracts, selected by `mode` — the same split Flink
    * draws between processing-time and event-time temporal joins:
    *
    *  - [[AsOfStreamMode.EventTime]] (DEFAULT — the out-of-order-safe
    *    production contract): rows buffer in state until the watermark
    *    passes their event time, then process in (time,
    *    right-before-left, tiebreak) order. The emitted output equals
    *    the BATCH native join over the same rows for ANY arrival order
    *    within the watermark — cross-partition interleave, facts
    *    before the dimension writes they match, anything — because by
    *    the time a row processes, everything earlier has provably
    *    arrived (or is late and dropped). The price is latency: a left
    *    row emits only once the watermark passes it, i.e. roughly
    *    `watermark` behind the stream head, and per-key state is
    *    O(rows inside the watermark horizon) + the one-row dimension
    *    memory — still bounded by throughput × watermark, never by
    *    stream lifetime.
    *  - [[AsOfStreamMode.Arrival]] (the live-enrichment contract):
    *    each left row emits in the micro-batch it arrives, matched
    *    against the freshest dimension row that has ALREADY arrived
    *    with right time at-or-before the left time (a held dimension
    *    write from the future of a straggling fact does NOT match —
    *    matches never have rt > lt). Within a micro-batch rows process
    *    in (time, right-before-left, tiebreak) order, so single-batch
    *    feeds match the batch operator exactly; ACROSS batches,
    *    matching reflects arrival — a right row arriving after a left
    *    row it would have matched does not retro-match (the batch join
    *    recomputes the retroactive truth nightly). State is ONE right
    *    row per key for any stream lifetime.
    *
    * In both modes, rows older than the current WATERMARK are dropped —
    * including LEFT rows, so the output is left-total only up to the
    * watermark: a fact arriving later than `watermark` behind the
    * stream's max event time is late data and produces NO output row
    * (`watermark` sets that admission window; widen it for catch-up
    * runs over deep backlogs). Time columns normalize exactly like the
    * batch operator ([[graft.plans.AsOfJoin]]): TIMESTAMP/DATE via
    * `unix_millis` (epoch MILLISECONDS — so `toleranceMs` and
    * `watermark` mean the same thing on both paths), numerics via
    * cast; a NULL time raises per row instead of matching at epoch 0.
    * Right columns whose names clash with a left column get a `right_`
    * prefix, the CLI's merge_asof suffix convention.
    *
    * KEYLESS (GLOBAL) as-of: an empty `keys` matches every left row
    * against the single global dimension timeline (the streaming twin
    * of the batch keyless join, `q_asof_global` — calibration curves,
    * rate tables). All rows then funnel through ONE state key, so
    * per-trigger work for that key is single-task — fine exactly when
    * the right side is a global rate table and the left is the
    * bottleneck stream's per-batch slice; a high-volume keyless feed
    * should pre-aggregate upstream, same as any global stream state.
    */
  def streamingAsOfJoinStream(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTiebreak: Seq[String] = Nil,
      toleranceMs: Option[Long] = None,
      watermark: String = "1 hour",
      mode: AsOfStreamMode = AsOfStreamMode.EventTime): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val lSchema = left.schema
    val rSchema = right.schema
    // mirror the batch API's loud key-type check: the union would
    // otherwise widen mismatched key types into a confusing encoder
    // error (or silently group unequal representations apart)
    keys.zipWithIndex.foreach { case ((lk, rk), i) =>
      val lt = lSchema(lk).dataType; val rt = rSchema(rk).dataType
      require(lt == rt,
        s"key $i type mismatch: left $lk ${lt.simpleString} vs " +
          s"right $rk ${rt.simpleString} — cast one side explicitly")
    }
    // keyless global as-of: group everything on one constant key (the
    // single global timeline); see the scaladoc scale note
    val keyless = keys.isEmpty
    val nKeys = if (keyless) 1 else keys.length
    val keySchema = StructType(
      if (keyless) Seq(StructField("k0", IntegerType, nullable = false))
      else keys.zipWithIndex.map { case ((lk, _), i) =>
        StructField(s"k$i", lSchema(lk).dataType, nullable = true)
      })
    // one normalized union row: key fields, epoch-ms time, side tag
    // (right = 0 sorts before left at equal time — rt == lt is a
    // backward match), and each side's payload as a nullable struct
    val lKeyCols =
      if (keyless) Seq(lit(0).as("_k0"))
      else keys.zipWithIndex.map { case ((lk, _), i) => col(lk).as(s"_k$i") }
    val rKeyCols =
      if (keyless) Seq(lit(0).as("_k0"))
      else keys.zipWithIndex.map { case ((_, rk), i) => col(rk).as(s"_k$i") }
    // time normalization MUST match the batch operator's: TIMESTAMP/DATE
    // columns go through unix_millis (a bare cast(LongType) yields
    // SECONDS — a silent 1000x shift of tolerance and watermark), and a
    // null time raises per row instead of matching at epoch 0 — the same
    // loud contract the batch API enforces
    val l2 = left.select(lKeyCols ++ Seq(
      graft.plans.AsOfJoin.guardedEpochMs(left(leftTimeCol), "left").as("_t"),
      lit(1).as("_side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(rSchema).as("_r")): _*)
    val r2 = right.select(rKeyCols ++ Seq(
      graft.plans.AsOfJoin.guardedEpochMs(right(rightTimeCol), "right").as("_t"),
      lit(0).as("_side"),
      lit(null).cast(lSchema).as("_l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("_r")): _*)
    val unioned = l2.unionByName(r2)
      .withColumn("_et", timestamp_millis(col("_t")))
      .withWatermark("_et", watermark)
    val outSchema = StructType(
      lSchema.fields.toIndexedSeq ++ rSchema.fields.map { f =>
        val name = if (lSchema.fieldNames.contains(f.name)) s"right_${f.name}" else f.name
        StructField(name, f.dataType, nullable = true)
      })
    val tbIdx = rightTiebreak.map(rSchema.fieldIndex)
    val tol = toleranceMs
    val nL = lSchema.length
    val nR = rSchema.length
    implicit val keyEnc = Encoders.row(keySchema)
    implicit val outEnc = Encoders.row(outSchema)
    def cmpAny(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
    }
    // (time, right-before-left, right tiebreak) — the merge exec's
    // ordering; `get` indices parameterized so the same comparator
    // serves the union rows (key prefix) and the buffered pending rows
    def rowLt(tAt: Int, sideAt: Int, rAt: Int)(a: Row, b: Row): Boolean = {
      val ta = a.getLong(tAt); val tb = b.getLong(tAt)
      if (ta != tb) ta < tb
      else {
        val sa = a.getInt(sideAt); val sb = b.getInt(sideAt)
        if (sa != sb) sa < sb
        else if (sa == 0 && tbIdx.nonEmpty) {
          val ra = a.getStruct(rAt); val rb = b.getStruct(rAt)
          tbIdx.iterator.map(i => cmpAny(ra.get(i), rb.get(i)))
            .find(_ != 0).getOrElse(0) < 0
        } else false
      }
    }
    def joinedRow(l: Row, curR: Row, curT: Long, t: Long): Row = {
      val matched = curR != null && curT <= t && tol.forall(t - curT <= _)
      val rVals =
        if (matched) (0 until nR).map(curR.get)
        else IndexedSeq.fill[Any](nR)(null)
      Row.fromSeq((0 until nL).map(l.get) ++ rVals)
    }
    val grouped =
      unioned.groupByKey(r => Row.fromSeq((0 until nKeys).map(r.get)))(keyEnc)
    mode match {
      case AsOfStreamMode.Arrival =>
        val stateSchema = StructType(Seq(
          StructField("t", LongType, nullable = false),
          StructField("r", rSchema, nullable = true)))
        val stateEnc = Encoders.row(stateSchema)
        grouped.flatMapGroupsWithState[Row, Row](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (_: Row, it: Iterator[Row], state: GroupState[Row]) =>
            val wm = state.getCurrentWatermarkMs()
            val rows = it.toArray.sortWith(rowLt(nKeys, nKeys + 1, nKeys + 3))
            var curT = state.getOption.map(_.getLong(0)).getOrElse(Long.MinValue)
            var curR = state.getOption.map(_.get(1).asInstanceOf[Row]).orNull
            val out = Seq.newBuilder[Row]
            rows.foreach { r =>
              val t = r.getLong(nKeys)
              if (t >= wm) { // watermark bound: older rows are late, dropped
                if (r.getInt(nKeys + 1) == 0) {
                  // right row: freshest at-or-after the held one wins
                  if (t >= curT) { curT = t; curR = r.getStruct(nKeys + 3) }
                } else {
                  // curT <= t enforced inside joinedRow: a dimension row
                  // held from a LATER event time than this fact must not
                  // match — the contract is "latest right at-or-before",
                  // and without the check a cross-batch future write
                  // would pass the tolerance test vacuously (negative Δt)
                  out += joinedRow(r.getStruct(nKeys + 2), curR, curT, t)
                }
              }
            }
            if (curR != null) state.update(Row(curT, curR))
            out.result().iterator
        }(stateEnc, outEnc).toDF()

      case AsOfStreamMode.EventTime =>
        // pending row: (t, side, l, r) — key fields dropped (the state
        // is already per-key); buffered until the watermark passes t
        val pendingSchema = StructType(Seq(
          StructField("t", LongType, nullable = false),
          StructField("side", IntegerType, nullable = false),
          StructField("l", lSchema, nullable = true),
          StructField("r", rSchema, nullable = true)))
        val stateSchema = StructType(Seq(
          StructField("t", LongType, nullable = false),
          StructField("r", rSchema, nullable = true),
          StructField("buf", ArrayType(pendingSchema, containsNull = false),
            nullable = false)))
        val stateEnc = Encoders.row(stateSchema)
        grouped.flatMapGroupsWithState[Row, Row](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (_: Row, it: Iterator[Row], state: GroupState[Row]) =>
            // the drain machinery lives ONCE in OrderedReplay.drain —
            // this arm only supplies the two-sided fold (rights advance
            // the held dimension row, lefts emit a joined row) and the
            // Row packing of its state; pending row = (t, side, l, r),
            // logic state = the held (curT, curR) dimension row
            val wm = state.getCurrentWatermarkMs()
            val prior = state.getOption
            val priorSt: Option[(Long, Row)] = prior.flatMap { p =>
              val r = p.get(1).asInstanceOf[Row]
              if (r == null) None else Some((p.getLong(0), r))
            }
            val priorBuf = prior.map(_.getSeq[Row](2)).getOrElse(Seq.empty)
            val projected = it.map(r => Row(r.getLong(nKeys),
              r.getInt(nKeys + 1), r.getStruct(nKeys + 2), r.getStruct(nKeys + 3)))
            val d = OrderedReplay.drain[Row, (Long, Row), Row](
              wm, projected, priorBuf, priorSt,
              eventTime = _.getLong(0),
              lt = rowLt(0, 1, 3),
              fold = (st, p) => {
                val t = p.getLong(0)
                if (p.getInt(1) == 0)
                  // rights replay in time order: the held time is
                  // monotone, last tiebreak at equal time wins —
                  // exactly the batch merge
                  (Some((t, p.getStruct(3))), Nil)
                else {
                  val (curT, curR) =
                    st.getOrElse((Long.MinValue, null: Row))
                  (st, Seq(joinedRow(p.getStruct(2), curR, curT, t)))
                }
              },
              // the as-of holds its dimension row forever (any future
              // fact may still match it) and has no close horizon
              onWatermark = (st, _) => (st, Nil, None))
            d.timeoutAt match {
              case None =>
                if (state.exists) state.remove()
              case Some(ts) =>
                val (curT, curR) = d.st.getOrElse((Long.MinValue, null: Row))
                state.update(Row(curT, curR, d.rest))
                state.setTimeoutTimestamp(ts)
            }
            d.out.iterator
        }(stateEnc, outEnc).toDF()
    }
  }

  /** Stream-stream inner join — both sides unbounded: orders and events
    * join on the customer key within a bounded event-time window
    * (event within 1 hour AFTER its order). The time-range predicate +
    * both watermarks are what make the join's state finite: each side
    * buffers only rows younger than watermark + interval, so state is
    * O(throughput x window), independent of stream lifetime — the only
    * stream-stream join shape that survives an unbounded deployment.
    * Inputs carry epoch-millis columns `odate_ms` / `ts_ms`.
    */
  def streamStreamJoin(
      orders: DataFrame, events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val o = orders
      .withColumn("o_time", timestamp_millis(col("odate_ms")))
      .withWatermark("o_time", watermark)
    val e = events
      .withColumn("e_time", timestamp_millis(col("ts_ms")))
      .withWatermark("e_time", watermark)
    o.join(e,
      col("o_custkey") === col("user_id") &&
        col("e_time") >= col("o_time") &&
        col("e_time") <= col("o_time") + expr("INTERVAL 1 HOUR"))
      .select(col("o_orderkey"), col("o_custkey"), col("event_id"),
        col("odate_ms"), col("ts_ms"))
  }

  /** Stream-static dimension enrichment: an unbounded event stream
    * left-joined to a bounded dimension table. The static side
    * broadcasts (re-read per micro-batch for file sources, so slowly-
    * changing dimensions refresh without restart); the stream side
    * never shuffles and no state store is involved — the enrichment
    * shape that runs at any throughput.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, dimKey: String): DataFrame =
    events.join(broadcast(dim), col("user_id") === col(dimKey), "left")

  /** Input shape for the streaming funnel. */
  final case class TypedEvent(userId: Long, tsMs: Long, eventType: String)

  /** Per-user funnel progress: stage timestamps (-1 = not reached),
    * `done` once the completion row has been emitted (late/duplicate
    * events can never re-emit). */
  final case class FunnelState(t1: Long, t2: Long, done: Boolean)

  /** A user's first completed signup -> view -> purchase traversal. */
  final case class FunnelCompletion(
      userId: Long, signupMs: Long, purchaseMs: Long, convMs: Long)

  /** The funnel's event-time arm ([[OrderedReplay]] logic): stages
    * advance in replayed event-time order, so each keeps its earliest
    * valid timestamp by construction. Same-time ties order by STAGE
    * (signup < view < purchase), matching the batch chained-minima `>=`
    * semantics — a purchase at the same instant as the view it follows
    * completes the funnel.
    */
  final case class FunnelLogic()
      extends OrderedReplay.Logic[Long, TypedEvent, FunnelState, FunnelCompletion] {
    def eventTime(e: TypedEvent): Long = e.tsMs
    override def secondary(e: TypedEvent): Long = e.eventType match {
      case "signup" => 0L
      case "view" => 1L
      case "purchase" => 2L
      case _ => 3L
    }
    def fold(userId: Long, st: Option[FunnelState], e: TypedEvent)
        : (Option[FunnelState], Seq[FunnelCompletion]) = {
      val s = st.getOrElse(FunnelState(-1L, -1L, done = false))
      val s2 =
        if (s.done) s
        else e.eventType match {
          // replay order makes e.tsMs >= every already-folded stage time
          case "signup" if s.t1 < 0 => s.copy(t1 = e.tsMs)
          case "view" if s.t1 >= 0 && s.t2 < 0 => s.copy(t2 = e.tsMs)
          case "purchase" if s.t2 >= 0 => s.copy(done = true)
          case _ => s
        }
      val out =
        if (!s.done && s2.done)
          Seq(FunnelCompletion(userId, s2.t1, e.tsMs, e.tsMs - s2.t1))
        else Nil
      (Some(s2), out)
    }
    def onWatermark(userId: Long, st: Option[FunnelState], wm: Long)
        : (Option[FunnelState], Seq[FunnelCompletion], Option[Long]) =
      (st, Nil, None) // funnels never expire: per-user state, userbase-bounded
  }

  /** Streaming conversion funnel (streaming twin of the batch e_funnel):
    * a per-user state machine advances signup -> view -> purchase across
    * micro-batches and emits ONE completion row when the last stage
    * lands. Two arms, the same split as [[streamingAsOfJoinStream]]:
    *
    *  - `watermarkDelay = None` (default — the prompt arm): stages
    *    advance monotonically in arrival order (events sorted within a
    *    batch), completions emit in the batch their purchase arrives.
    *    In-order feeds match the batch e_funnel; a stage crossing a
    *    batch boundary out of time order can diverge, because stages
    *    never re-open.
    *  - `watermarkDelay = Some(d)` (the event-time arm, via
    *    [[OrderedReplay]]): events buffer until the watermark passes
    *    them and replay in event-time order — equal to the batch funnel
    *    for ANY arrival order within `d`, at `d` of emission latency
    *    (events later than `d` behind the stream head are late data,
    *    dropped).
    *
    * State is three longs per user (+ the replay buffer on the
    * event-time arm) — bounded by the active userbase, the same bound
    * any per-user personalization store has.
    */
  def streamingFunnel(
      events: Dataset[TypedEvent],
      watermarkDelay: Option[String] = None): Dataset[FunnelCompletion] = {
    val spark = events.sparkSession
    import spark.implicits._
    watermarkDelay match {
      case Some(d) =>
        OrderedReplay.replay(
          events
            .withColumn("event_time", timestamp_millis(col("tsMs")))
            .withWatermark("event_time", d)
            .as[TypedEvent],
          (e: TypedEvent) => e.userId,
          FunnelLogic())
      case None =>
        events
          .groupByKey(_.userId)
          .flatMapGroupsWithState[FunnelState, FunnelCompletion](
            OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
            case (userId, batchEvents, state: GroupState[FunnelState]) =>
              var s = state.getOption.getOrElse(FunnelState(-1L, -1L, done = false))
              val out = Seq.newBuilder[FunnelCompletion]
              batchEvents.toSeq.sortBy(_.tsMs).foreach { e =>
                if (!s.done) e.eventType match {
                  case "signup" if s.t1 < 0 =>
                    s = s.copy(t1 = e.tsMs)
                  case "view" if s.t1 >= 0 && s.t2 < 0 && e.tsMs >= s.t1 =>
                    s = s.copy(t2 = e.tsMs)
                  case "purchase" if s.t2 >= 0 && e.tsMs >= s.t2 =>
                    out += FunnelCompletion(userId, s.t1, e.tsMs, e.tsMs - s.t1)
                    s = s.copy(done = true)
                  case _ => ()
                }
              }
              state.update(s)
              out.result().iterator
          }
    }
  }

  /** Gap sessionization as an [[OrderedReplay]] logic: a session closes
    * when a replayed event arrives past the gap, or when the watermark
    * passes the gap horizon (no admissible event can extend it). */
  final case class SessionLogic(gapMs: Long)
      extends OrderedReplay.Logic[Long, UserEvent, SessionState, ClosedSession] {
    def eventTime(e: UserEvent): Long = e.tsMs
    def fold(userId: Long, st: Option[SessionState], e: UserEvent)
        : (Option[SessionState], Seq[ClosedSession]) = st match {
      case Some(s) if e.tsMs - s.last > gapMs =>
        (Some(SessionState(e.tsMs, e.tsMs, 1L)),
          Seq(ClosedSession(userId, s.start, s.n, s.last - s.start)))
      case Some(s) => // replay is time-ordered: e.tsMs >= s.last always
        (Some(SessionState(s.start, e.tsMs, s.n + 1L)), Nil)
      case None => (Some(SessionState(e.tsMs, e.tsMs, 1L)), Nil)
    }
    def onWatermark(userId: Long, st: Option[SessionState], wm: Long)
        : (Option[SessionState], Seq[ClosedSession], Option[Long]) = st match {
      case Some(s) if wm > s.last + gapMs =>
        (None, Seq(ClosedSession(userId, s.start, s.n, s.last - s.start)), None)
      case Some(s) => (st, Nil, Some(s.last + gapMs))
      case None => (None, Nil, None)
    }
  }

  /** Gap-based sessionization (streaming twin of the batch
    * e_sessionize): per user, a session closes after `gapMs` of
    * event-time inactivity. OUT-OF-ORDER-SAFE via [[OrderedReplay]]:
    * events buffer until the watermark passes them and replay in
    * event-time order, so closed sessions equal the batch
    * sessionization for ANY arrival order within `watermarkDelay`
    * (spec-pinned on shuffled feeds); sessions emit once the watermark
    * passes `last + gapMs`, and abandoned users' state is reclaimed by
    * the same horizon — state never pins forever.
    */
  def sessionize(
      events: Dataset[UserEvent],
      gapMs: Long,
      watermarkDelay: String = "30 minutes"
  ): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    OrderedReplay.replay(
      events
        .withColumn("event_time", timestamp_millis(col("tsMs")))
        .withWatermark("event_time", watermarkDelay)
        .as[UserEvent],
      (e: UserEvent) => e.userId,
      SessionLogic(gapMs))
  }

  /** Input shape for [[streamingIntervalOverlap]]. */
  final case class OverlapEvent(userId: Long, tsMs: Long, isError: Boolean)

  /** Per-user session state: the open session plus the ends of
    * still-live alert windows (w_end > session last) — the only windows
    * that can overlap this or a future session. Bounded by winMs × the
    * user's error rate, NOT by stream length. `start == -1` is the
    * windows-only sentinel: the session closed and was emitted, but
    * live windows remain that may overlap the user's NEXT session
    * (winMs > gapMs makes that real) — dropping them with the session
    * would undercount exactly the cross-session case.
    */
  final case class OverlapState(
      start: Long, last: Long, n: Long, winEnds: List[Long])

  /** A closed session with its overlap census. `end` is exclusive
    * (`last event + 1`), the batch query's convention. */
  final case class SessionOverlap(
      userId: Long, start: Long, end: Long, nOverlaps: Long)

  /** Interval-overlap sessionization as an [[OrderedReplay]] logic —
    * [[SessionLogic]] plus the live-window ledger and the windows-only
    * sentinel (`start == -1`): a window counts toward the open session
    * at creation (its error event extends the session, so overlap is
    * certain) and toward a later session at that session's open if
    * still live; windows outliving a closed session are HELD so a
    * cross-session overlap is never dropped.
    */
  final case class OverlapLogic(gapMs: Long, winMs: Long)
      extends OrderedReplay.Logic[Long, OverlapEvent, OverlapState, SessionOverlap] {
    def eventTime(e: OverlapEvent): Long = e.tsMs
    private def opened(ts: Long, isErr: Boolean, carried: List[Long]): OverlapState = {
      val live = carried.filter(_ > ts)
      OverlapState(ts, ts, live.length.toLong + (if (isErr) 1L else 0L),
        if (isErr) ts + winMs :: live else live)
    }
    def fold(userId: Long, st: Option[OverlapState], e: OverlapEvent)
        : (Option[OverlapState], Seq[SessionOverlap]) = st match {
      case Some(s) if s.start >= 0 && e.tsMs - s.last > gapMs =>
        (Some(opened(e.tsMs, e.isError, s.winEnds)),
          Seq(SessionOverlap(userId, s.start, s.last + 1, s.n)))
      case Some(s) if s.start >= 0 =>
        // replay is time-ordered (e.tsMs >= s.last); prune dead ends —
        // an in-session error overlaps its own session by construction,
        // counted at creation
        val live = s.winEnds.filter(_ > e.tsMs)
        (Some(OverlapState(s.start, e.tsMs,
          s.n + (if (e.isError) 1L else 0L),
          if (e.isError) e.tsMs + winMs :: live else live)), Nil)
      case held => // None, or the windows-only sentinel
        (Some(opened(e.tsMs, e.isError,
          held.map(_.winEnds).getOrElse(Nil))), Nil)
    }
    def onWatermark(userId: Long, st: Option[OverlapState], wm: Long)
        : (Option[OverlapState], Seq[SessionOverlap], Option[Long]) = st match {
      case Some(s) if s.start >= 0 && wm > s.last + gapMs =>
        // provably finished: any admissible event has t >= wm > last+gap
        val live = s.winEnds.filter(_ > wm)
        (if (live.nonEmpty) Some(OverlapState(-1L, -1L, 0L, live)) else None,
          Seq(SessionOverlap(userId, s.start, s.last + 1, s.n)),
          if (live.nonEmpty) Some(live.max) else None)
      case Some(s) if s.start >= 0 => (st, Nil, Some(s.last + gapMs))
      case Some(s) => // sentinel: prune expired windows, park until the last end
        val live = s.winEnds.filter(_ > wm)
        (if (live.nonEmpty) Some(OverlapState(-1L, -1L, 0L, live)) else None,
          Nil, if (live.nonEmpty) Some(live.max) else None)
      case None => (None, Nil, None)
    }
  }

  /** Streaming twin of the batch interval-overlap join
    * ([[graft.queries.AnalyticsQueries.intervalOverlapJoin]]): per user,
    * gap-based sessions accrue the count of error-alert windows
    * (`[ts, ts + winMs)` around each error event) overlapping them,
    * emitted as each session closes — that is, once the watermark
    * passes `last + gapMs`, at which point no admissible event can
    * extend it.
    *
    * OUT-OF-ORDER-SAFE: events buffer in state until the watermark
    * passes their event time, then replay through the session logic in
    * event-time order — so the closed sessions equal the batch query
    * for ANY arrival order within the watermark (spec-pinned on feeds
    * shuffled across micro-batches), not just time-ordered feeds.
    * Events older than the watermark at arrival are late data and are
    * dropped — the standard watermark admission contract, shared with
    * every other stateful operator here.
    *
    * The batch form day-buckets two interval sets and joins; here the
    * join dissolves into state arithmetic: a window counts toward the
    * OPEN session immediately (its error event extends the session, so
    * overlap is certain), and toward a LATER session at that session's
    * open if the window is still live (`w_end > open time` — with
    * `winMs > gapMs` an alert late in one session genuinely bleeds into
    * the next, the cross-session case the batch gate pins). Expired
    * window ends are pruned every event, so state stays O(live windows
    * + events inside the watermark horizon) per user.
    */
  def streamingIntervalOverlap(
      events: Dataset[OverlapEvent],
      gapMs: Long,
      winMs: Long,
      watermarkDelay: String = "30 minutes"): Dataset[SessionOverlap] = {
    val spark = events.sparkSession
    import spark.implicits._
    OrderedReplay.replay(
      events
        .withColumn("event_time", timestamp_millis(col("tsMs")))
        .withWatermark("event_time", watermarkDelay)
        .as[OverlapEvent],
      (e: OverlapEvent) => e.userId,
      OverlapLogic(gapMs, winMs))
  }

  /** Streaming twin of the generic interval × interval OVERLAP join
    * ([[graft.operators.IntervalJoin.overlap]]) — and deliberately NOT
    * a custom operator: keyed interval overlap between two live
    * streams is exactly what Spark's built-in stream-stream join with
    * time-range conditions exists for, so this routes through it (the
    * symmetric hash join with watermark-driven state eviction — custom
    * code would re-implement that machinery worse). The batch
    * operator's bucket-explode trick is a BATCH device to make a
    * range predicate hash-joinable; in streaming the state store IS
    * the index, no replication, no exactly-once residual needed.
    *
    * The one honest cost: state eviction needs the two WATERMARKED
    * columns (the starts) bounded against each other, and `rStart <
    * lEnd` only implies `rStart < lStart + maxLen` when interval
    * length is bounded — so `maxLenMs` is a required parameter (the
    * batch API derives widths from a stats pass; a stream cannot).
    * Rows with `end - start > maxLenMs` raise per row rather than
    * silently dropping matches. State per side = rows younger than
    * watermark + maxLen; emission is the inner-join contract (a pair
    * appears once both rows have arrived — no ordering semantics, so
    * arrival order never changes the result set within the
    * watermark). Endpoints are integral epoch-MILLISECONDS, as in the
    * other streaming twins. Output = left columns then right columns,
    * clashes `right_`-prefixed (the batch convention).
    */
  def streamingIntervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      maxLenMs: Long,
      watermark: String = "10 minutes"): DataFrame = {
    require(maxLenMs > 0, s"maxLenMs must be positive, got $maxLenMs")
    graft.operators.IntervalJoin.requireIntegral(left, leftStart, "left start")
    graft.operators.IntervalJoin.requireIntegral(left, leftEnd, "left end")
    graft.operators.IntervalJoin.requireIntegral(right, rightStart, "right start")
    graft.operators.IntervalJoin.requireIntegral(right, rightEnd, "right end")
    // loud per-row guard: an interval longer than maxLenMs would break
    // the state-eviction bound and silently lose matches. NULL
    // endpoints are DROPPED first, matching the batch operator (whose
    // bucket explode discards them) — routing a null into the guard's
    // otherwise-branch would raise instead, and in a stream that is a
    // poison pill: the uncommitted batch replays the same file forever.
    def guardLen(df: DataFrame, s: String, e: String, side: String): DataFrame =
      df.where(col(s).isNotNull && col(e).isNotNull)
        .withColumn(s, when(col(e).cast("long") - col(s).cast("long") <= maxLenMs, col(s))
        .otherwise(raise_error(concat(
          lit(s"$side interval longer than maxLenMs=$maxLenMs: start="),
          col(s).cast("string"), lit(" end="), col(e).cast("string")))))
    val leftCols = left.columns.toSet
    val clashes = right.columns.filter(leftCols).toSet
    val r2 = clashes.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"right_$c"))
    def rn(c: String) = if (clashes(c)) s"right_$c" else c
    val (rS, rE) = (rn(rightStart), rn(rightEnd))
    // keyless: Spark rejects a stream-stream join with no equality
    // predicate, so match on a synthesized constant key (the same
    // device streamingIntervalContains and the keyless streaming as-of
    // use) — the range conditions still bound the state
    val keyless = keys.isEmpty
    val l0 = if (keyless) left.withColumn("__ij_lk", lit(0)) else left
    val r0 = if (keyless) r2.withColumn("__ij_rk", lit(0)) else r2
    val l = guardLen(l0, leftStart, leftEnd, "left")
      .withColumn("__l_time", timestamp_millis(col(leftStart).cast("long")))
      .withWatermark("__l_time", watermark)
    val r = guardLen(r0, rS, rE, "right")
      .withColumn("__r_time", timestamp_millis(col(rS).cast("long")))
      .withWatermark("__r_time", watermark)
    val keyPred =
      if (keyless) l("__ij_lk") === r("__ij_rk")
      else keys.map { case (lk, rk) => l(lk) === r(rn(rk)) }
        .reduce(_ && _)
    val pred = keyPred &&
      // watermark-column bounds — what lets the state store evict:
      // rStart < lEnd <= lStart + maxLen and symmetrically
      col("__r_time") <= col("__l_time") + expr(s"INTERVAL $maxLenMs MILLISECONDS") &&
      col("__l_time") <= col("__r_time") + expr(s"INTERVAL $maxLenMs MILLISECONDS") &&
      // the exact overlap of NONEMPTY half-open intervals
      l(leftStart).cast("long") < r(rE).cast("long") &&
      r(rS).cast("long") < l(leftEnd).cast("long") &&
      l(leftStart).cast("long") < l(leftEnd).cast("long") &&
      r(rS).cast("long") < r(rE).cast("long")
    l.join(r, pred).drop("__l_time", "__r_time", "__ij_lk", "__ij_rk")
  }

  /** Streaming twin of the generic point-in-interval join
    * ([[graft.operators.IntervalJoin.contains]]): a live POINT stream
    * (facts) enriched against a slowly-changing INTERVAL dimension
    * stream (feature windows, campaign intervals) — both sides live,
    * out-of-order-safe, output equal to the batch API on any arrival
    * order within the watermark (spec-pinned on shuffled feeds).
    *
    * Event-time contract: the interval stream is watermarked on its
    * START — writers publish an interval at-or-before it opens (within
    * the watermark delay), the natural shape for campaign/feature
    * windows. That bound is what makes points emittable: once the
    * watermark passes a point's time `t`, any future-admissible
    * interval has `start >= wm > t` and cannot contain it, so the
    * point's match set is complete. Intervals and points both buffer
    * through [[OrderedReplay.drain]] (the single drain machinery) and
    * replay in event-time order, intervals-before-points at equal time
    * (the inclusive `start <= p` bound). Rows behind the watermark at
    * arrival are late data and are dropped — the standard admission
    * contract every twin here shares.
    *
    * Scale shape: per-key state = LIVE intervals only (an interval
    * with `end <= wm` can never contain a future-replayable point and
    * is pruned; the wakeup horizon re-arms at the earliest live end so
    * idle keys drain to zero state) plus the pending buffer bounded by
    * throughput × watermark. Empty intervals (`end <= start`) never
    * enter state. Output is INNER (matched pairs), interval columns
    * then point columns, clashes `right_`-prefixed — the batch API's
    * convention. Endpoints must be integral epoch-MILLISECONDS here
    * (the watermark needs a real timestamp; the batch operator is
    * unit-agnostic, this twin is not).
    */
  def streamingIntervalContains(
      intervals: DataFrame,
      points: DataFrame,
      keys: Seq[(String, String)],
      start: String,
      end: String,
      pointCol: String,
      watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val iSchema = intervals.schema
    val pSchema = points.schema
    graft.operators.IntervalJoin.requireIntegral(intervals, start, "interval start")
    graft.operators.IntervalJoin.requireIntegral(intervals, end, "interval end")
    graft.operators.IntervalJoin.requireIntegral(points, pointCol, "point")
    keys.zipWithIndex.foreach { case ((ik, pk), i) =>
      val it = iSchema(ik).dataType; val pt = pSchema(pk).dataType
      require(it == pt,
        s"key $i type mismatch: interval $ik ${it.simpleString} vs " +
          s"point $pk ${pt.simpleString} — cast one side explicitly")
    }
    val keyless = keys.isEmpty
    val nKeys = if (keyless) 1 else keys.length
    val keySchema = StructType(
      if (keyless) Seq(StructField("k0", IntegerType, nullable = false))
      else keys.zipWithIndex.map { case ((ik, _), i) =>
        StructField(s"k$i", iSchema(ik).dataType, nullable = true)
      })
    val iKeyCols =
      if (keyless) Seq(lit(0).as("_k0"))
      else keys.zipWithIndex.map { case ((ik, _), i) => col(ik).as(s"_k$i") }
    val pKeyCols =
      if (keyless) Seq(lit(0).as("_k0"))
      else keys.zipWithIndex.map { case ((_, pk), i) => col(pk).as(s"_k$i") }
    // union row: key fields, event time (interval -> START, point -> p),
    // side (0 = interval sorts before 1 = point at equal time: the
    // inclusive start <= p bound), normalized (s, e) for intervals, and
    // each side's payload struct. NULL endpoints/points are dropped
    // first — the batch operator discards them, and here they would
    // reach the stateful op's primitive getters as nulls (NPE, which
    // in a stream is a poison pill, not one bad row)
    val intervalsNn = intervals.where(col(start).isNotNull && col(end).isNotNull)
    val pointsNn = points.where(col(pointCol).isNotNull)
    val i2 = intervalsNn.select(iKeyCols ++ Seq(
      col(start).cast(LongType).as("_t"),
      lit(0).as("_side"),
      col(start).cast(LongType).as("_s"),
      col(end).cast(LongType).as("_e"),
      struct(intervals.columns.map(col).toIndexedSeq: _*).as("_i"),
      lit(null).cast(pSchema).as("_p")): _*)
    val p2 = pointsNn.select(pKeyCols ++ Seq(
      col(pointCol).cast(LongType).as("_t"),
      lit(1).as("_side"),
      lit(0L).as("_s"),
      lit(0L).as("_e"),
      lit(null).cast(iSchema).as("_i"),
      struct(points.columns.map(col).toIndexedSeq: _*).as("_p")): _*)
    val unioned = i2.unionByName(p2)
      .withColumn("_et", timestamp_millis(col("_t")))
      .withWatermark("_et", watermark)
    val outSchema = StructType(
      iSchema.fields.toIndexedSeq ++ pSchema.fields.map { f =>
        val name =
          if (iSchema.fieldNames.contains(f.name)) s"right_${f.name}" else f.name
        StructField(name, f.dataType, nullable = true)
      })
    val pendingSchema = StructType(Seq(
      StructField("t", LongType, nullable = false),
      StructField("side", IntegerType, nullable = false),
      StructField("s", LongType, nullable = false),
      StructField("e", LongType, nullable = false),
      StructField("i", iSchema, nullable = true),
      StructField("p", pSchema, nullable = true)))
    val liveSchema = StructType(Seq(
      StructField("s", LongType, nullable = false),
      StructField("e", LongType, nullable = false),
      StructField("i", iSchema, nullable = false)))
    val stateSchema = StructType(Seq(
      StructField("live", ArrayType(liveSchema, containsNull = false),
        nullable = false),
      StructField("buf", ArrayType(pendingSchema, containsNull = false),
        nullable = false)))
    implicit val keyEnc = Encoders.row(keySchema)
    implicit val outEnc = Encoders.row(outSchema)
    val stateEnc = Encoders.row(stateSchema)
    val nI = iSchema.length
    val nP = pSchema.length
    def lt(a: Row, b: Row): Boolean = {
      val ta = a.getLong(0); val tb = b.getLong(0)
      ta < tb || (ta == tb && a.getInt(1) < b.getInt(1))
    }
    unioned
      .groupByKey(r => Row.fromSeq((0 until nKeys).map(r.get)))(keyEnc)
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Row, it: Iterator[Row], state: GroupState[Row]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption
          val priorLive: Option[Seq[Row]] =
            prior.map(_.getSeq[Row](0)).filter(_.nonEmpty)
          val priorBuf = prior.map(_.getSeq[Row](1)).getOrElse(Seq.empty)
          val projected = it.map(r => Row(r.getLong(nKeys),
            r.getInt(nKeys + 1), r.getLong(nKeys + 2), r.getLong(nKeys + 3),
            r.getStruct(nKeys + 4), r.getStruct(nKeys + 5)))
          val d = OrderedReplay.drain[Row, Seq[Row], Row](
            wm, projected, priorBuf, priorLive,
            eventTime = _.getLong(0),
            lt = lt,
            fold = (st, row) => {
              if (row.getInt(1) == 0) {
                val s = row.getLong(2); val e = row.getLong(3)
                // empty intervals contain nothing — never enter state
                if (e <= s) (st, Nil)
                else (Some(Row(s, e, row.getStruct(4)) +: st.getOrElse(Nil)), Nil)
              } else {
                val t = row.getLong(0)
                val p = row.getStruct(5)
                val hits = st.getOrElse(Nil).collect {
                  case el if el.getLong(0) <= t && t < el.getLong(1) =>
                    val iv = el.getStruct(2)
                    Row.fromSeq((0 until nI).map(iv.get) ++ (0 until nP).map(p.get))
                }
                (st, hits)
              }
            },
            // prune dead intervals (end <= wm can't contain any
            // future-replayable point: pending ones all have t >= wm);
            // horizon = earliest live end, so idle keys prune — and
            // eventually remove — their state on their own
            onWatermark = (st, w) => {
              val live = st.getOrElse(Nil).filter(_.getLong(1) > w)
              (if (live.isEmpty) None else Some(live),
                Nil,
                if (live.isEmpty) None else Some(live.map(_.getLong(1)).min))
            })
          d.timeoutAt match {
            case None =>
              if (state.exists) state.remove()
            case Some(ts) =>
              state.update(Row(d.st.getOrElse(Nil), d.rest))
              state.setTimeoutTimestamp(ts)
          }
          d.out.iterator
      }(stateEnc, outEnc).toDF()
  }
}
