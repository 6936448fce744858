package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Materialize

/** Structured Streaming operators over the events stream.
  *
  * Every transform here is written against a plain DataFrame so the SAME
  * code path serves batch and streaming — Spark's unified model. A batch
  * caller passes `spark.read.parquet(...)`; a streaming caller passes
  * `spark.readStream...` and the identical plan runs incrementally with
  * watermark-driven state eviction. The batch-parity queries in the
  * driver contract (events_tumbling_window, events_session_window) verify
  * these exact window semantics against the DuckDB oracle; the streaming
  * tests replay the same data through MemoryStream and assert equality
  * with the batch result.
  *
  * Scale notes: tumbling/session aggregations shuffle once on the group
  * keys; watermarks bound state so a 100 TB/day stream holds only the
  * open windows per key. The stateful per-key transforms use
  * `mapGroupsWithState` with explicit timeouts for the same reason.
  */
object Streams {

  private val streamLog = org.slf4j.LoggerFactory.getLogger("graft.streaming.Streams")

  /** Tumbling-window event rollup: count + value sum per (window, type).
    * In streaming, `watermark` bounds lateness and evicts closed windows.
    * (`withWatermark` is a no-op in batch — same plan both ways.)
    */
  def tumblingAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("tv"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("tv").cast("double").as("total_value"))

  /** Stream-static enrichment: join a (possibly unbounded) event stream
    * against a bounded dimension frame and aggregate per enriched
    * attribute. The static side is re-read per micro-batch (so slowly-
    * changing dims pick up updates) and — dimension-sized — broadcasts:
    * NO stream-side state, no watermark needed, unlike a stream-stream
    * join. The unified API means the identical call is the batch parity
    * query. The canonical lookup shape: events x user/account/device dim.
    */
  def enrichWithStatic(events: DataFrame, dim: DataFrame, key: String,
                       joinType: String = "left"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // Default LEFT: an enrichment lookup must not silently DROP events
    // whose key the (slowly-changing) dim hasn't picked up yet — in
    // streaming a dropped event is gone from the sink permanently, and a
    // later dim update cannot resurrect an already-processed batch.
    // Unmatched keys surface null attributes; pass "inner" to filter.
    events.join(broadcast(dim), Seq(key), joinType)
  }

  /** Gap-based session windows per user: Spark's native `session_window`
    * (state-backed in streaming, plain agg in batch). A session's end is
    * the last event + gap, per session_window semantics.
    */
  def sessionAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"),
        col("sv").cast("double").as("session_value"))

  /** Per-window TOP-K events by value: the custom bounded-heap aggregate
    * ([[graft.functions.TopKByScore]]) under streaming window state —
    * trending/leaderboard semantics with O(k) state per window instead
    * of every event. ONE stateful aggregation (streaming-safe in any
    * mode); the heap's merge is what the state store calls between
    * micro-batches, exercised by the MemoryStream parity spec. Ties
    * break on the smaller event id (heap payload order), so results are
    * deterministic and oracle-checkable. Same plan runs batch (the
    * driver parity row) and streaming.
    */
  def windowedTopK(events: DataFrame, windowLen: String, watermark: String,
                   k: Int): DataFrame =
    events
      // NULL-valued or NULL-id events are excluded from ranking BY
      // CONTRACT (explicitly, so the oracle can mirror it — the heap
      // aggregate would skip them silently and diverge from a SQL
      // row_number that ranks NULLs last).
      .filter(col("value").isNotNull && col("event_id").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(graft.functions.AggFunctions.topK(col("value"),
        lpad(col("event_id").cast("string"), 20, "0"), k).as("tk"))
      .select(col("w.start").as("window_start"),
        posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("window_start"), (col("pos") + 1).cast("int").as("rank"),
        col("e.score").as("value"),
        // Fail-loud decode (the topKPerQuery rule): a negative id breaks
        // zero-padded lexical order, so never NULL it silently.
        when(col("e.value").try_cast("long").isNull,
          raise_error(concat(lit("windowed top-k: unparseable id: "),
            col("e.value"))))
          .otherwise(col("e.value").try_cast("long")).as("event_id"))

  /** Sliding-window rate: events per (sliding window, type); window
    * `windowLen` sliding every `slide`.
    */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
                    watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"))

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via `mapGroupsWithState`.
    * Each micro-batch folds its new events into the user's state and emits
    * the updated running totals. State per key is O(1); a production
    * caller bounding key cardinality would add a timeout policy (note:
    * ProcessingTimeTimeout keeps scheduling timeout batches, so drain-style
    * callers like processAllAvailable never see the query idle).
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserRunning(userId, acc.n_events + 1, acc.total_value + e.value)
          }
          state.update(next)
          next
      }
  }

  final case class SessionIn(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionBuf(startMs: Long, lastMs: Long, n: Long, total: Double)
  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                               session_end: java.sql.Timestamp, n_events: Long,
                               session_value: Double)

  /** Production sessionizer: per-user gap sessions via
    * `flatMapGroupsWithState` with EVENT-TIME state eviction. Unlike
    * [[runningUserTotals]] (NoTimeout — state lives forever), a session
    * here is flushed and its state REMOVED when the watermark passes
    * `last event + gap`, so state is bounded by (active users x one open
    * session) regardless of how long the stream runs — the property a
    * 100 TB/day clickstream needs. A late event arriving after its
    * session was evicted starts a new session (the only behavior an
    * evicting sessionizer can offer; bound lateness with the watermark).
    *
    * Sessions with in-batch gaps are closed inline; the open tail stays
    * in state with its timeout re-armed. Session end is `last + gap`,
    * matching `session_window` semantics ([[sessionAgg]]).
    *
    * STREAMING-ONLY: in batch mode flatMapGroupsWithState never times
    * out, so open sessions would be dropped — batch callers use
    * [[sessionAgg]] (same semantics, verified equal in StreamsSpec).
    */
  def sessionizeWithTimeout(events: Dataset[SessionIn], gapMs: Long,
                            watermark: String): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    def flush(userId: Long, s: SessionBuf): UserSession =
      UserSession(userId, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.lastMs + gapMs), s.n, s.total)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionIn], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val out = flush(userId, state.get)
            state.remove()
            Iterator.single(out)
          } else {
            // Micro-batches are not time-ordered; a per-(key, batch) sort
            // is bounded by one user's events in one batch.
            val evs = batch.toIndexedSeq.sortBy(_.ts.getTime)
            var closed = Vector.empty[UserSession]
            var cur = state.getOption
            for (e <- evs) {
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.lastMs < gapMs =>
                  Some(SessionBuf(s.startMs, math.max(s.lastMs, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed :+= flush(userId, s)
                  Some(SessionBuf(t, t, 1L, e.value))
                case None => Some(SessionBuf(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Evict when the watermark passes last + gap (clamped above
              // the current watermark — required by the API when a
              // just-under-the-watermark event would arm it in the past).
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
      }
  }

  /** Streaming ingestion dedup: drop events whose id was already seen,
    * keeping state only within the watermark horizon. This is THE
    * streaming guard for at-least-once upstreams (replayed Kafka batches,
    * retried uploads): unbounded `dropDuplicates` state would grow
    * forever at 100 TB/day; `dropDuplicatesWithinWatermark` evicts ids
    * once the watermark passes, bounding state to (event rate x
    * watermark). In batch the same call degrades to plain dropDuplicates.
    */
  def dedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                           watermark: String, tsCol: String = "ts"): DataFrame = {
    val withWm = events.withWatermark(tsCol, watermark)
    if (events.isStreaming) withWm.dropDuplicatesWithinWatermark(idCols)
    else withWm.dropDuplicates(idCols)
  }

  /** Stream-stream interval join: pair each left event with right events
    * of the same key within `[left.ts, left.ts + horizon]`. Both sides
    * carry watermarks and the join condition bounds the time range, so
    * Spark can evict buffered state for both inputs — the standard
    * attribution shape (e.g. view -> click within an hour). Works
    * identically in batch (plain range-condition join).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   horizon: String, watermark: String,
                   tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
      .select(col(key).as("l_key"), col(tsCol).as("l_ts"),
        col(idCol).as("l_id"))
    val r = right.withWatermark(tsCol, watermark)
      .select(col(key).as("r_key"), col(tsCol).as("r_ts"),
        col(idCol).as("r_id"))
    l.join(r, col("l_key") === col("r_key") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"))
  }

  /** Streaming output mode for the window aggregations: Append emits each
    * window once, when the watermark passes it — the mode a downstream
    * exactly-once sink (parquet/Delta) wants.
    */
  val windowSinkMode: OutputMode = OutputMode.Append()

  /** Exactly-once-ish parquet sink via foreachBatch: each micro-batch
    * writes to a batchId-named subdirectory with overwrite, so a replayed
    * batch (restart after failure between write and commit) lands in the
    * same place instead of duplicating — idempotent writes + the
    * checkpoint's offset tracking give end-to-end exactly-once for this
    * layout. Readers scan `path` with a recursive glob.
    */
  def startParquetSink(df: DataFrame, path: String, checkpoint: String,
                       mode: OutputMode = OutputMode.Append()) =
    df.writeStream
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .start()

  /** Streaming MERGE sink: each micro-batch upserts
    * ([[graft.ops.Scd.upsert]] semantics — replace on key, append new
    * keys) into a versioned parquet warehouse table.
    *
    * Exactly-once without a table format: version `targetDir/v=<batchId>`
    * is `upsert(previous version, batch)`, written with overwrite. A
    * batch replayed after a crash recomputes from the SAME previous
    * version (later versions cannot exist — the replayed batch is the
    * frontier) and overwrites its own directory: idempotent, so the
    * checkpoint's offset tracking gives end-to-end exactly-once. Readers
    * use [[readUpserted]] (the max committed version); crashed partial
    * writes are ignored because only directories with _SUCCESS count.
    * A committed version beyond the current batchId (checkpoint deleted
    * while targetDir kept state — batchIds restart at 0) fails fast
    * rather than writing versions [[readUpserted]] would never serve.
    *
    * `seqCol`, if set, deterministically keeps the max-seq row per key
    * within a batch (ties broken by preferring the larger tuple is NOT
    * supported — (key, seq) must be unique); without it the batch must
    * already be unique per key.
    *
    * Scale: the merge is the anti-join + union plan — the previous
    * version never shuffles when the batch side broadcasts. Version
    * history grows per batch; compact by retaining only the max version
    * (each version is a full snapshot, not a delta).
    */
  def startUpsertSink(df: DataFrame, targetDir: String, checkpoint: String,
                      keyCols: Seq[String],
                      seqCol: Option[String] = None) =
    df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val updates = seqCol match {
          case Some(sc) =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keyCols.map(col): _*).orderBy(col(sc).desc)
            batch.withColumn("_rn", row_number().over(w))
              .filter(col("_rn") === 1).drop("_rn")
          case None => batch.toDF()
        }
        // Replay can legitimately rewrite v=batchId, but a committed
        // version BEYOND the frontier can only mean the checkpoint was
        // deleted/recreated while targetDir kept old state — writing a
        // low-numbered version then would leave readUpserted silently
        // serving the stale old max. Fail fast instead.
        latestVersion(spark, targetDir, below = None)
          .filter(_ > batchId).foreach { v =>
            throw new IllegalStateException(
              s"upsert sink $targetDir has committed version v=$v beyond " +
                s"current batchId=$batchId: the checkpoint was reset while " +
                "target state was retained; refusing to write state that " +
                "readUpserted would ignore")
          }
        val merged = latestVersion(spark, targetDir, below = Some(batchId)) match {
          case Some(prev) =>
            graft.ops.Scd.upsert(
              spark.read.parquet(s"$targetDir/v=$prev"), updates, keyCols)
          case None => updates
        }
        merged.write.mode("overwrite").parquet(s"$targetDir/v=$batchId")
      }
      .start()

  /** The current state of a [[startUpsertSink]] table: its max committed
    * version.
    */
  def readUpserted(spark: org.apache.spark.sql.SparkSession,
                   targetDir: String): DataFrame =
    latestVersion(spark, targetDir, below = None) match {
      case Some(v) => spark.read.parquet(s"$targetDir/v=$v")
      case None => throw new IllegalStateException(
        s"no committed upsert version under $targetDir")
    }

  /** Max committed (`_SUCCESS`-marked) version id under `dir`, optionally
    * strictly below a bound (the replay case).
    */
  private def latestVersion(spark: org.apache.spark.sql.SparkSession,
                            dir: String, below: Option[Long]): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { p =>
        val name = p.getName
        if (name.startsWith("v=") &&
            fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
          scala.util.Try(name.stripPrefix("v=").toLong).toOption
        else None
      }
      .filter(v => below.forall(v < _))
      .sorted.lastOption
  }

  /** One micro-batch of the streaming INGEST DEDUP GATE: keep only the
    * batch rows whose normalized text is NOT already in the write-time
    * exact-dup index ([[graft.llm.Dedup.writeExactDupIndex]]). The
    * membership check is [[graft.llm.Dedup.probeExactDupIndex]] — a
    * DPP-pruned read of the bucket directories the batch hashes into,
    * md5-verified — then a left-anti join back on the id. The corpus
    * text is never re-read or re-hashed; at 100 TB the gate's cost is
    * the BATCH size, not the corpus size.
    */
  def dedupGateBatch(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String, batch: DataFrame, idCol: String,
                     textCol: String, nBuckets: Int,
                     staticPrune: Boolean = false): DataFrame = {
    val hits = graft.llm.Dedup
      .probeExactDupIndex(spark, indexPath, batch, idCol, textCol, nBuckets,
        staticPrune)
      .select(col("query_id").as(idCol)).distinct()
    batch.join(hits, Seq(idCol), "left_anti")
  }

  /** One micro-batch of the streaming NEAR-dup gate: keep only the
    * batch rows whose 120-bit wide simhash is NOT within `maxHamming`
    * of any corpus member — [[graft.llm.Dedup.probeSimhashWideIndex]]
    * (a DPP-pruned read of the band directories the batch hashes into,
    * two-word bit_count verify) + left-anti on the id. The near-dup
    * twin of [[dedupGateBatch]]: the exact gate rejects only verbatim
    * (normalized) copies, this one also rejects lightly-edited copies
    * — the boilerplate/near-clone flood a real training-corpus ingest
    * actually sees. Same 100 TB property: cost is the BATCH size.
    */
  def nearDupGateBatch(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, batch: DataFrame, idCol: String,
                       textCol: String, maxHamming: Int,
                       nBuckets: Int, staticPrune: Boolean = false): DataFrame = {
    val hits = graft.llm.Dedup
      .probeSimhashWideIndex(spark, indexPath, batch, idCol, textCol,
        maxHamming, nBuckets, staticPrune)
      .select(col("query_id").as(idCol)).distinct()
    batch.join(hits, Seq(idCol), "left_anti")
  }

  /** [[nearDupGateBatch]] with `nBuckets` resolved from the index's
    * params sidecar — the gate against an auto-sized layout
    * ([[graft.llm.Dedup.writeSimhashWideIndexAuto]]).
    */
  def nearDupGateBatch(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, batch: DataFrame, idCol: String,
                       textCol: String, maxHamming: Int): DataFrame =
    nearDupGateBatch(spark, indexPath, batch, idCol, textCol, maxHamming,
      graft.llm.Dedup.simhashWideIndexBuckets(spark, indexPath))

  /** Streaming NEAR-dup ingest gate: [[startDedupGateSink]] with
    * [[nearDupGateBatch]] as the decision and the wide-simhash index as
    * the growing membership state — accepted rows append their band
    * rows, so a document accepted in batch N rejects its near-copies in
    * batch N+1. The replay/exactly-once argument of the exact gate
    * transfers verbatim: a replayed batch's self-matches are
    * `cand_id == query_id` (excluded by the probe), duplicate index
    * rows from a double-append only ever re-confirm the same id-distinct
    * hits, and the output directory is batchId-idempotent.
    *
    * Intra-batch clones (a bursty ingest delivering mutually-near-dup
    * rows in ONE micro-batch, which the corpus probe cannot see) are
    * also gated: after the corpus decision, a banded
    * [[graft.llm.Dedup.simhashWidePairs]] self-check over the
    * corpus-accepted rows rejects every row that near-matches a
    * SMALLER id in the same batch — deterministic keep-lowest-id,
    * batch-sized work, replay-stable (the rule is a pure function of
    * the batch). Chain caveat: in a path a~b~c with a !~ c, both b and
    * c are rejected (c matched b even though b itself was dropped) —
    * strictly more conservative than a sequential arrival, never less.
    *
    * `compactEvery` is the [[maybeCompactIndexes]] cadence.
    */
  def startNearDupGateSink(df: DataFrame, indexPath: String, outPath: String,
                           checkpoint: String, idCol: String, textCol: String,
                           maxHamming: Int, nBuckets: Int,
                           compactEvery: Int = 0) =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // Pin the batch FIRST: the static-prune probe's key collect is
        // a second (column-pruned) pass over the batch plan — against
        // pinned blocks it costs a re-scan, not a source replay.
        val b = Materialize.pin(batch.toDF())
        val corpusOk = nearDupGateBatch(spark, indexPath, b,
          idCol, textCol, maxHamming, nBuckets, staticPrune = true)
        // simhashWidePairs emits id_a < id_b, so id_b is always the
        // larger member: dropping every id_b keeps the lowest id of
        // each intra-batch near-dup group.
        val intraDups = graft.llm.Dedup
          .simhashWidePairs(corpusOk, idCol, textCol, maxHamming)
          .select(col("id_b").as(idCol)).distinct()
        val accepted = corpusOk.join(intraDups, Seq(idCol), "left_anti")
          .transform(Materialize.pin)
        accepted.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        graft.llm.Dedup.appendToSimhashWideIndex(accepted, idCol, textCol,
          maxHamming, nBuckets, indexPath)
        maybeCompactIndexes(spark, Seq(indexPath), batchId, compactEvery)
      }
      .start()

  /** Bounded-small-files maintenance for the growing gate indexes:
    * every `every` micro-batches (after the batch's appends commit),
    * rewrite each index to one file per partition directory via
    * [[graft.llm.Dedup.compactIndex]] ([[graft.llm.BandedIndex
    * .compactLayout]] — row set unchanged, sidecar preserved,
    * rename-aside swap). Without a cadence, a long-running gate stream
    * appends one delta file per (band, bkt) per batch and the probe's
    * per-file open cost grows without bound — the small-files regime
    * the round-10 nBuckets sweep measured. `every <= 0` disables
    * (callers own compaction, e.g. an external nightly job). Replay-
    * safe AND replay-REPAIRING: compaction preserves the row SET while
    * dropping exact-duplicate rows, which only a crash-replayed append
    * (batch committed its appends but not its checkpoint) can create —
    * gate decisions never see them (probes are multiplicity-invariant),
    * and the cadence bounds the silent index growth they cause.
    */
  private def maybeCompactIndexes(spark: org.apache.spark.sql.SparkSession,
                                  indexPaths: Seq[String], batchId: Long,
                                  every: Int): Unit =
    if (every > 0 && (batchId + 1) % every == 0)
      indexPaths.foreach(p => graft.llm.Dedup.compactIndex(spark, p))

  /** [[startNearDupGateSink]] with `nBuckets` resolved once from the
    * index's params sidecar at start — the gate against an auto-sized
    * layout ([[graft.llm.Dedup.writeSimhashWideIndexAuto]]).
    */
  def startNearDupGateSink(df: DataFrame, indexPath: String, outPath: String,
                           checkpoint: String, idCol: String,
                           textCol: String, maxHamming: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startNearDupGateSink(df, indexPath, outPath, checkpoint, idCol, textCol,
      maxHamming,
      graft.llm.Dedup.simhashWideIndexBuckets(df.sparkSession, indexPath))

  /** One micro-batch of the streaming PERCEPTUAL IMAGE gate: keep only
    * the batch rows (`media_id`, `modality`, `payload` — the
    * [[graft.llm.Multimodal.MediaRecord]] shape) whose 110-bit wide
    * image dHash is NOT within `maxHamming` of any corpus member in
    * the write-time wide hamming index
    * ([[graft.llm.Dedup.probeHammingWideIndex]] — a DPP-pruned read of
    * the band directories the batch hashes into, exact two-word
    * bit_count verify) + left-anti on the id. The multimodal member of
    * the gate family: the exact/near/semantic gates cover text, this
    * one catches the re-uploaded / recompressed / brightness-nudged
    * image flood. Cost is the BATCH size (each delta image decoded
    * once), never the corpus — corpus pixels were decoded once at
    * index build time.
    */
  def imageGateBatch(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String, batch: DataFrame, maxHamming: Int,
                     nBuckets: Int): DataFrame =
    perceptualGateBatch(spark, indexPath, batch, imageHashKernel,
      maxHamming, nBuckets)

  /** [[imageGateBatch]]'s AUDIO twin: membership is wide-hamming
    * distance of the 110-bit audio fingerprint
    * ([[graft.llm.Multimodal.decodeAudioHashWide]] — energy-envelope +
    * gain-invariant flux-ratio words) against a
    * [[graft.llm.Dedup.writeHammingWideIndex]] layout over the corpus
    * clips. Catches re-uploaded and lightly-perturbed audio the same
    * way the image gate catches recompressed images.
    */
  def audioGateBatch(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String, batch: DataFrame, maxHamming: Int,
                     nBuckets: Int): DataFrame =
    perceptualGateBatch(spark, indexPath, batch, audioHashKernel,
      maxHamming, nBuckets)

  /** [[imageGateBatch]]'s VIDEO twin — the strided-SET member of the
    * perceptual gate family: each arriving AVI decodes to its k=3
    * strided frame signatures ([[graft.llm.Multimodal
    * .extractVideoFrameHashesStridedWide]] — MULTIPLE rows per
    * media_id), and the video is rejected when ANY of its frames is
    * within `maxHamming` of ANY corpus frame row in the write-time
    * strided index (the `EXISTS` reduction of
    * [[graft.llm.Dedup.probeHammingWideIndexSet]] — the same hits, the
    * per-pair min is simply not needed for a membership decision).
    * Closes the first-frame re-encode evasion on the INGEST path: a
    * re-upload whose opening frame was scrambled still shares its
    * later strided frames with the corpus copy, so the set probe
    * catches what first-frame hashing misses.
    */
  def videoGateBatch(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String, batch: DataFrame, maxHamming: Int,
                     nBuckets: Int): DataFrame =
    perceptualGateBatch(spark, indexPath, batch, videoHashKernel,
      maxHamming, nBuckets)

  /** The wide image-hash kernel as a (batch → two-word signature frame)
    * function — `(media_id, lo, hi)` with the standard column names the
    * shared gate body expects.
    */
  private def imageHashKernel(batch: DataFrame): DataFrame = {
    implicit val sp: org.apache.spark.sql.SparkSession = batch.sparkSession
    graft.llm.Multimodal.extractImageHashesWide(
      graft.llm.Multimodal.asMediaDataset(batch)).toDF()
      .select(col("media_id"), col("dhash").as("sig_lo"),
        col("vhash").as("sig_hi"))
  }

  /** The wide audio-fingerprint kernel in the same shape. */
  private def audioHashKernel(batch: DataFrame): DataFrame = {
    implicit val sp: org.apache.spark.sql.SparkSession = batch.sparkSession
    graft.llm.Multimodal.extractAudioHashesWide(
      graft.llm.Multimodal.asMediaDataset(batch)).toDF()
      .select(col("media_id"), col("ehash").as("sig_lo"),
        col("rhash").as("sig_hi"))
  }

  /** The wide STRIDED video kernel: k=3 evenly-strided frame
    * signatures — deliberately MULTIPLE rows per media_id (the frame
    * SET). The shared gate body is already set-shaped end to end: the
    * probe rejects on any in-budget row, the intra-batch pair scan
    * pairs any two frames of distinct videos, and the append persists
    * every accepted frame row (exactly the
    * [[graft.llm.Dedup.writeHammingWideIndex]] strided-set layout
    * [[graft.queries.LlmQueries.ensureVideoStridedHashWideIndex]]
    * builds).
    */
  private def videoHashKernel(batch: DataFrame): DataFrame = {
    implicit val sp: org.apache.spark.sql.SparkSession = batch.sparkSession
    graft.llm.Multimodal.extractVideoFrameHashesStridedWide(
      graft.llm.Multimodal.asMediaDataset(batch), k = 3).toDF()
      .select(col("media_id"), col("dhash").as("sig_lo"),
        col("vhash").as("sig_hi"))
  }

  /** One micro-batch of a perceptual gate, generic over the signature
    * kernel: decode the batch ONCE, probe the wide index, keep the rows
    * with no corpus member within `maxHamming`. All perceptual layouts
    * share the (56, 54) two-word geometry, so one body serves every
    * modality.
    */
  private def perceptualGateBatch(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String, batch: DataFrame,
                                  kernel: DataFrame => DataFrame,
                                  maxHamming: Int, nBuckets: Int): DataFrame = {
    // Decode-once, the SINK posture (round-19): pin the payload batch
    // (its source may be an expensive generator or a non-replayable
    // frame), pin the signature kernel's narrow output, and probe with
    // staticPrune — a pinned frame defeats DPP's benefit heuristic, so
    // without the static key prune this probe would read the WHOLE
    // index (see BandedIndex.probeJoinStatic). Before the pins this
    // body evaluated the batch payload chain once per consumer (kernel,
    // probe double-pass, final anti-join).
    val b = Materialize.pin(batch)
    val hashes = Materialize.pin(kernel(b))
    val hits = graft.llm.Dedup.probeHammingWideIndex(spark, indexPath,
      hashes, "media_id", "sig_lo", "sig_hi", nLoBits = 56,
      nHiBits = 54, maxHamming, nBuckets, staticPrune = true)
      .select(col("query_id").as("media_id")).distinct()
    b.join(hits, Seq("media_id"), "left_anti")
  }

  /** Streaming PERCEPTUAL IMAGE ingest gate: [[startNearDupGateSink]]'s
    * multimodal twin over the wide image-hash index. Each micro-batch
    * decodes its payloads ONCE (the pinned wide-hash frame feeds the
    * corpus probe, the intra-batch self-check, AND the index append —
    * no re-decode anywhere), rejects rows whose hash is within
    * `maxHamming` of the corpus, then rejects rows near-matching a
    * SMALLER id in the same batch (deterministic keep-lowest-id — the
    * same chain-conservative rule as the text gate), writes survivors
    * batchId-idempotently, and appends their hashes so an image
    * accepted in batch N rejects its near-copies in batch N+1. Replay
    * safety transfers from the text gate verbatim: self-matches are
    * excluded by id, duplicate index rows only re-confirm the same
    * hits, and [[maybeCompactIndexes]] (`compactEvery`) repairs
    * crash-replayed appends.
    */
  def startImageGateSink(df: DataFrame, indexPath: String, outPath: String,
                         checkpoint: String, maxHamming: Int, nBuckets: Int,
                         compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startPerceptualGateSink(df, indexPath, outPath, checkpoint,
      imageHashKernel, maxHamming, nBuckets, compactEvery)

  /** [[startImageGateSink]]'s AUDIO twin — the same decode-once /
    * corpus-probe / intra-batch keep-lowest-id / append lifecycle over
    * the wide audio-fingerprint index. One shared body serves both
    * modalities ([[startPerceptualGateSink]]); only the signature
    * kernel differs.
    */
  def startAudioGateSink(df: DataFrame, indexPath: String, outPath: String,
                         checkpoint: String, maxHamming: Int, nBuckets: Int,
                         compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startPerceptualGateSink(df, indexPath, outPath, checkpoint,
      audioHashKernel, maxHamming, nBuckets, compactEvery)

  /** [[startImageGateSink]]'s VIDEO twin — [[videoGateBatch]] as the
    * corpus decision over the wide STRIDED frame-set index, on the
    * shared perceptual sink body: decode once per micro-batch, probe
    * (any in-budget frame pair rejects), intra-batch keep-lowest-id
    * over the frame sets (two videos sharing ANY near-identical frame
    * are batch-mates), batchId-idempotent write, then append the
    * ACCEPTED videos' full frame sets so a video accepted in batch N
    * rejects its re-uploads — including scrambled-first-frame
    * re-encodes — in batch N+1. Closes the modality matrix: text,
    * image, audio, and video each have hashes, a write-time index,
    * clusters, probes, AND a streaming ingest gate.
    */
  def startVideoGateSink(df: DataFrame, indexPath: String, outPath: String,
                         checkpoint: String, maxHamming: Int, nBuckets: Int,
                         compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startPerceptualGateSink(df, indexPath, outPath, checkpoint,
      videoHashKernel, maxHamming, nBuckets, compactEvery)

  private def startPerceptualGateSink(df: DataFrame, indexPath: String,
                                      outPath: String, checkpoint: String,
                                      kernel: DataFrame => DataFrame,
                                      maxHamming: Int, nBuckets: Int,
                                      compactEvery: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val hashes = Materialize.pin(kernel(batch.toDF()))
        // staticPrune: the pinned hash frame defeats DPP's benefit
        // heuristic (unknown size stats), so without it this probe
        // reads the WHOLE index every micro-batch — see
        // BandedIndex.probeJoinStatic. The pin makes the key-collect's
        // re-scan of the batch ~free.
        val corpusHits = graft.llm.Dedup.probeHammingWideIndex(spark,
          indexPath, hashes, "media_id", "sig_lo", "sig_hi", nLoBits = 56,
          nHiBits = 54, maxHamming, nBuckets, staticPrune = true)
          .select(col("query_id").as("media_id")).distinct()
        val corpusOk = hashes.join(corpusHits, Seq("media_id"), "left_anti")
        // Wide pairs emit id_a < id_b: dropping every id_b keeps the
        // lowest id of each intra-batch near-dup group.
        val intraDups = graft.llm.Dedup.hammingNearDupPairsWide(corpusOk,
          "media_id", "sig_lo", "sig_hi", nLoBits = 56, nHiBits = 54,
          maxHamming)
          .select(col("id_b").as("media_id")).distinct()
        val acceptedHashes = corpusOk
          .join(intraDups, Seq("media_id"), "left_anti")
          .transform(Materialize.pin)
        // distinct: a signature-SET kernel (strided video) carries one
        // hash row per FRAME, and joining the raw id column would write
        // each accepted video once per frame.
        batch.toDF()
          .join(acceptedHashes.select("media_id").distinct(), Seq("media_id"))
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        graft.llm.Dedup.appendToHammingWideIndex(acceptedHashes, "media_id",
          "sig_lo", "sig_hi", nLoBits = 56, nHiBits = 54, maxHamming,
          nBuckets, indexPath)
        maybeCompactIndexes(spark, Seq(indexPath), batchId, compactEvery)
      }
      .start()

  /** One micro-batch of the streaming CROSS-MODAL PAIR gate — the
    * ingest-time form of [[graft.llm.CrossModal.pairContamination]]:
    * an arriving (caption, image) training pair is REJECTED when its
    * image perceptually matches a corpus pair's image (wide-hamming ≤
    * `maxHamming` through the write-time image index) while its
    * caption does NOT near-match that same corpus pair's caption
    * (wide-simhash > `capMaxHamming` through the write-time caption
    * index) — accepting it would plant contradictory supervision
    * against the corpus: two near-identical inputs with disagreeing
    * targets. A CONSISTENT re-upload (image matches, caption also
    * near-matches) passes this gate — it is ordinary duplication, the
    * perceptual/text dedup gates' job, not a pair-integrity defect.
    *
    * Both membership checks are the EXISTING banded index probes
    * (batch-sized DPP/static-pruned reads); this gate adds only the
    * per-(query, cand) anti-join between their hit sets — no new
    * candidate generation, nothing wider than two ids per row. `batch`
    * carries the [[graft.llm.Multimodal.MediaRecord]] columns plus
    * `captionCol`.
    *
    * ID-DOMAIN CONTRACT: the two corpus indexes MUST be built over the
    * SAME pair-id domain — pair i's image row and caption row carry
    * the identical id (the fixture builders key both on the pair's
    * doc id). The per-(query, cand) anti-join aligns hits BY THAT
    * SHARED ID; indexes keyed in different domains (image media_ids vs
    * caption doc_ids) would never align, silently flagging every
    * image match as contamination.
    *
    * `rejectBoilerplate` adds the INVERSE defect direction (the
    * ingest-time form of [[graft.llm.CrossModal.captionBoilerplate]]):
    * a pair whose CAPTION near-matches a corpus pair's caption while
    * its IMAGE does not perceptually match that same pair's image —
    * template alt-text ("stock photo", "image may contain…") repeated
    * over unrelated images, teaching a captioner to emit the template
    * regardless of input. Symmetric semantics: contamination is
    * ∃ corpus pair (image agrees ∧ caption disagrees); boilerplate is
    * ∃ corpus pair (caption agrees ∧ image disagrees). A consistent
    * re-upload (both agree on the SAME pair) passes both directions —
    * ordinary duplication is the dedup gates' job. Both directions
    * reuse the SAME two probe hit sets; the flag only adds the second
    * anti-join, no new index reads.
    */
  def pairGateBatch(spark: org.apache.spark.sql.SparkSession,
                    imageIndexPath: String, captionIndexPath: String,
                    batch: DataFrame, captionCol: String, maxHamming: Int,
                    capMaxHamming: Int, nBuckets: Int, capBuckets: Int,
                    staticPrune: Boolean = true,
                    rejectBoilerplate: Boolean = false): DataFrame = {
    // Decode-once, the SINK posture (round-19): the body consumes the
    // batch once per decision input (image kernel, caption probe —
    // itself a two-pass plan, batch-id domain, final anti-join), so an
    // un-pinned payload batch re-ran its source ~5x and the image
    // decode once per probe pass. `staticPrune` now DEFAULTS true to
    // match: the pinned frames defeat DPP's benefit heuristic, and
    // without the static key prune both index probes read their whole
    // layouts (see BandedIndex.probeJoinStatic). Decisions are
    // plan-independent — same rows either way.
    val b = Materialize.pin(batch)
    pairGateFromHashes(spark, imageIndexPath, captionIndexPath, b,
      Materialize.pin(imageHashKernel(b)), captionCol, maxHamming,
      capMaxHamming, nBuckets, capBuckets, staticPrune, rejectBoilerplate)
  }

  /** [[pairGateBatch]] with the image signatures supplied (the sink's
    * decode-once path): image mates without a caption mate on the SAME
    * corpus pair flag the arrival (plus the inverse direction under
    * `rejectBoilerplate`).
    *
    * Both hit sets are restricted to candidates OUTSIDE the arriving
    * batch's own id domain before the anti-joins (round-19). Corpus
    * probes already exclude `cand_id == query_id` self-matches; the
    * batch-domain exclusion extends that to SIBLING rows of the same
    * batch, which can only appear in an index through a crash-replayed
    * half-append (captions landed, images didn't). With it, the gate
    * decision is a pure function of (corpus state BEFORE the batch,
    * batch) — exactly-once under replay for BOTH defect directions and
    * ANY append order, instead of relying on caption-before-image
    * ordering to keep one direction safe. Intra-batch pair defects are
    * the sink's separate intra check, not the corpus decision's job.
    */
  private def pairGateFromHashes(spark: org.apache.spark.sql.SparkSession,
                                 imageIndexPath: String,
                                 captionIndexPath: String, batch: DataFrame,
                                 hashes: DataFrame, captionCol: String,
                                 maxHamming: Int, capMaxHamming: Int,
                                 nBuckets: Int, capBuckets: Int,
                                 staticPrune: Boolean,
                                 rejectBoilerplate: Boolean = false): DataFrame = {
    val batchIds = batch.select(col("media_id").as("cand_id")).distinct()
    val imgHits = graft.llm.Dedup.probeHammingWideIndex(spark,
      imageIndexPath, hashes, "media_id", "sig_lo", "sig_hi", nLoBits = 56,
      nHiBits = 54, maxHamming, nBuckets, staticPrune = staticPrune)
      .select(col("query_id"), col("cand_id"))
      .join(broadcast(batchIds), Seq("cand_id"), "left_anti")
    val capHits = graft.llm.Dedup.probeSimhashWideIndex(spark,
      captionIndexPath, batch, "media_id", captionCol, capMaxHamming,
      capBuckets, staticPrune = staticPrune)
      .select(col("query_id"), col("cand_id"))
      .join(broadcast(batchIds), Seq("cand_id"), "left_anti")
    val contaminated = imgHits.join(capHits, Seq("query_id", "cand_id"),
      "left_anti")
    val flagged =
      (if (rejectBoilerplate)
         contaminated.unionByName(
           capHits.join(imgHits, Seq("query_id", "cand_id"), "left_anti"))
       else contaminated)
        .select(col("query_id").as("media_id")).distinct()
    batch.join(flagged, Seq("media_id"), "left_anti")
  }

  /** Streaming CROSS-MODAL PAIR ingest gate: [[pairGateBatch]] as the
    * corpus decision, both membership indexes growing with the
    * accepted pairs — a pair accepted in batch N flags a contaminated
    * re-upload of its image (same pixels, different caption) in batch
    * N+1, including through the image's near-dup neighborhood.
    *
    * Per micro-batch: decode the images ONCE (pinned wide-hash frame
    * feeds the corpus probe, the intra-batch check, AND the index
    * append), reject rows whose image matches a corpus pair under a
    * disagreeing caption, then reject rows whose image near-matches a
    * SMALLER id in the same batch under a disagreeing caption
    * (keep-lowest-id — the intra-batch form of the same defect, which
    * no corpus probe can see), write survivors batchId-idempotently,
    * and append their caption band rows THEN their image hashes.
    *
    * Replay safety rests on the BATCH-DOMAIN EXCLUSION in the corpus
    * decision (see [[pairGateFromHashes]]): hits whose candidate is a
    * row of the arriving batch itself — only possible through a
    * crash-replayed half-append — are dropped, so a replayed batch
    * computes exactly the original decisions in both defect
    * directions, under either append order. The caption-before-image
    * order is kept as defense in depth (caption-only partials cannot
    * create an image hit even without the exclusion). Both probes run
    * `staticPrune = true` (pinned batch frames defeat DPP — see
    * [[graft.llm.BandedIndex.probeJoinStatic]]); both bucket widths
    * resolve ONCE per stream from the index sidecars. The two indexes
    * must share one pair-id domain — [[pairGateBatch]]'s contract.
    *
    * `rejectBoilerplate` arms the inverse defect direction
    * ([[pairGateBatch]]'s flag) on the corpus decision AND its
    * intra-batch twin: caption near-dup mates WITHIN the survivors
    * whose images are NOT near-dups reject the larger id — the same
    * keep-lowest-id rule, anti-join reversed.
    */
  def startPairGateSink(df: DataFrame, imageIndexPath: String,
                        captionIndexPath: String, outPath: String,
                        checkpoint: String, captionCol: String,
                        maxHamming: Int, capMaxHamming: Int,
                        compactEvery: Int = 0,
                        rejectBoilerplate: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark0 = df.sparkSession
    val nBuckets = graft.llm.Dedup.hammingWideIndexBuckets(spark0,
      imageIndexPath)
    val capBuckets = graft.llm.Dedup.simhashWideIndexBuckets(spark0,
      captionIndexPath)
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = Materialize.pin(batch.toDF())
        val hashes = Materialize.pin(imageHashKernel(b))
        val corpusOk = pairGateFromHashes(spark, imageIndexPath,
          captionIndexPath, b, hashes, captionCol, maxHamming,
          capMaxHamming, nBuckets, capBuckets, staticPrune = true,
          rejectBoilerplate = rejectBoilerplate)
        // Intra-batch contamination: image near-dup pairs WITHIN the
        // survivors whose captions disagree — image pairs from the
        // pinned hashes, caption pairs from the batch text, the same
        // (id_a, id_b) anti-join as the corpus decision. Keep-lowest-id
        // (wide pairs emit id_a < id_b).
        val okIds = corpusOk.select("media_id")
        val imgPairs = graft.llm.Dedup.hammingNearDupPairsWide(
          hashes.join(okIds, Seq("media_id")), "media_id", "sig_lo",
          "sig_hi", nLoBits = 56, nHiBits = 54, maxHamming)
          .select("id_a", "id_b")
        val capPairs = graft.llm.Dedup.simhashWidePairs(
          corpusOk.select(col("media_id"), col(captionCol)), "media_id",
          captionCol, capMaxHamming)
          .select("id_a", "id_b")
        val contaminatedIntra = imgPairs.join(capPairs, Seq("id_a", "id_b"),
          "left_anti")
        val intraDups =
          (if (rejectBoilerplate)
             contaminatedIntra.unionByName(
               capPairs.join(imgPairs, Seq("id_a", "id_b"), "left_anti"))
           else contaminatedIntra)
            .select(col("id_b").as("media_id")).distinct()
        val accepted = corpusOk.join(intraDups, Seq("media_id"), "left_anti")
          .transform(Materialize.pin)
        accepted.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        // Captions BEFORE images — see the replay argument above.
        graft.llm.Dedup.appendToSimhashWideIndex(
          accepted.select(col("media_id"), col(captionCol)), "media_id",
          captionCol, capMaxHamming, capBuckets, captionIndexPath)
        graft.llm.Dedup.appendToHammingWideIndex(
          hashes.join(accepted.select("media_id"), Seq("media_id")),
          "media_id", "sig_lo", "sig_hi", nLoBits = 56, nHiBits = 54,
          maxHamming, nBuckets, imageIndexPath)
        maybeCompactIndexes(spark, Seq(imageIndexPath, captionIndexPath),
          batchId, compactEvery)
      }
      .start()
  }

  /** One micro-batch of the streaming SEMANTIC ingest gate: keep only
    * the batch rows whose embedding has NO corpus bucket-mate with
    * cosine >= `threshold` in the write-time LSH index
    * ([[graft.llm.Similarity.probeLshThreshold]] — a DPP-pruned read of
    * the hyperplane-bucket directories the batch hashes into, exact
    * cosine verify) + left-anti on the id. The third gate of the
    * family: the exact gate rejects verbatim (normalized) copies, the
    * near-dup gate lightly-edited copies, and this one PARAPHRASES —
    * rewrites whose surface string shares nothing but whose embedding
    * still matches (the SemDeDup signal, applied at ingest time instead
    * of corpus-rebuild time). Same 100 TB property: cost is the BATCH
    * size times probed-bucket width, never the corpus.
    *
    * `probeTables` > 0 selects the MULTI-PROBE posture (round-18, the
    * gate default at the sink level): membership is judged through
    * [[graft.llm.Similarity.probeLshThresholdMultiProbe]] — each
    * arriving vector probes its exact bucket plus every Hamming-1
    * neighbor in the first `min(probeTables, numTables)` tables. The
    * ingest path writes its membership layout at
    * [[graft.llm.Similarity.MultiProbeTables]] tables (index storage
    * ×1 — at 100 TB the index is corpus-sized, so write amplification,
    * not probe width, is the expensive axis) and holds the recall
    * contract by probe expansion instead of table count. 0 = the
    * exact-bucket probe over all `numTables` tables (the compensated-
    * layout posture — right when the layout already paid t(p) tables
    * and probe latency dominates).
    */
  def semanticGateBatch(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, batch: DataFrame, idCol: String,
                        vecCol: String, threshold: Double, numPlanes: Int,
                        numTables: Int, staticPrune: Boolean = false,
                        probeTables: Int = 0): DataFrame = {
    val probe =
      if (probeTables > 0)
        graft.llm.Similarity.probeLshThresholdMultiProbe(spark, indexPath,
          batch, idCol, vecCol, threshold, numPlanes, numTables,
          probeTables = math.min(probeTables, numTables),
          staticPrune = staticPrune)
      else
        graft.llm.Similarity.probeLshThreshold(spark, indexPath, batch,
          idCol, vecCol, threshold, numPlanes, numTables,
          staticPrune = staticPrune)
    val hits = probe.select(col("query_id").as(idCol)).distinct()
    batch.join(hits, Seq(idCol), "left_anti")
  }

  /** Intra-batch semantic clone detection: bucket-mate pairs WITHIN
    * `df` (any shared LSH table bucket, exact cosine >= threshold)
    * yield the LARGER id of each pair — dropping the returned ids
    * keeps the lowest id of each intra-batch semantic-dup group,
    * deterministic and replay-stable (a pure function of the batch).
    * Batch-sized work: candidates form only inside shared buckets,
    * never all-pairs. Shared by [[startSemanticGateSink]] and the
    * composed [[ingestPipelineBatch]].
    *
    * `probeTables` > 0 mirrors the corpus probe's MULTI-PROBE posture
    * on the intra check: one side's buckets expand to their Hamming-1
    * neighbors over the first `min(probeTables, numTables)` tables
    * (bucket distance is symmetric, so expanding one side of an
    * `id_a < id_b` pair sees every pair the two-sided expansion
    * would), holding the same recall math as the corpus decision on a
    * [[graft.llm.Similarity.MultiProbeTables]]-table layout. 0 = the
    * exact-bucket check over all tables.
    */
  def semanticIntraBatchDups(df: DataFrame, idCol: String, vecCol: String,
                             threshold: Double, numPlanes: Int,
                             numTables: Int,
                             probeTables: Int = 0): DataFrame = {
    val nt = if (probeTables > 0) math.min(probeTables, numTables)
      else numTables
    val b = df.select(col(idCol).as("id"),
      posexplode(array((0 until nt).map(t =>
        graft.llm.Similarity.hyperplaneBucket(
          transform(col(vecCol), x => x.cast("double")), numPlanes, t)): _*))
        .as(Seq("tbl", "bucket")))
    val probeSide =
      if (probeTables > 0)
        b.select(col("id"), col("tbl"),
          explode(array(Seq(col("bucket")) ++ (0 until numPlanes).map(j =>
            col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("bucket"))
      else b
    val mates = probeSide
      .select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(b.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = df.select(col(idCol), col(vecCol))
    mates
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b"))
      .filter(graft.llm.Similarity.cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
  }

  /** Streaming SEMANTIC ingest gate: [[startDedupGateSink]] with
    * [[semanticGateBatch]] as the decision and the LSH hyperplane index
    * as the growing membership state — accepted rows append their
    * bucket rows ([[graft.llm.Similarity.appendToLshIndex]]), so a
    * vector accepted in batch N rejects its paraphrase-copies in batch
    * N+1. Replay/exactly-once transfers from the exact gate verbatim
    * (self-matches excluded by id, double-appends only re-confirm the
    * same id-distinct hits, batchId-idempotent output directory).
    *
    * Intra-batch semantic clones are gated like the near-dup sink's:
    * after the corpus decision, bucket-mate pairs WITHIN the accepted
    * set (any shared table bucket, exact cosine >= threshold) reject
    * every row matching a smaller id — deterministic keep-lowest-id,
    * batch-sized, replay-stable. Same chain caveat as there.
    *
    * POSTURE (round-18): the gate defaults to MULTI-PROBE membership
    * (`probeTables` = [[graft.llm.Similarity.MultiProbeTables]],
    * clamped to the layout's table count) — the ingest path should
    * write its LSH layout at [[graft.llm.Similarity.MultiProbeTables]]
    * tables (`writeLshIndexAuto(..., numTables =
    * Similarity.MultiProbeTables)`) and hold the recall contract by
    * Hamming-1 probe expansion instead of t(p) table storage: the
    * membership index GROWS with the corpus (every accepted row
    * appends `numTables` rows), so at 100 TB its storage — not the
    * batch-sized probe width — is the binding cost, and ×1 storage at
    * probe width ×(p+1) beats ×t(p) storage at exact-bucket width
    * (measured: `llm_lsh_multiprobe_recall` 1.0/1.0/0.9955 across
    * three decades, FASTER than the exact-bucket probe at sf1/sf10).
    * Pass `probeTables = 0` for the exact-bucket posture over a
    * compensated t(p)-table layout.
    */
  def startSemanticGateSink(df: DataFrame, indexPath: String, outPath: String,
                            checkpoint: String, idCol: String, vecCol: String,
                            threshold: Double, numPlanes: Int,
                            numTables: Int, compactEvery: Int = 0,
                            probeTables: Int =
                              graft.llm.Similarity.MultiProbeTables) = {
    // POSTURE GUARD (round-19, advisor): membership semantics are a
    // (layout, probe) PAIR. A stream restarting from its checkpoint
    // after a default change must not silently switch decision
    // semantics, so the posture actually in effect is resolved against
    // the layout's sidecar ONCE at sink start and logged; a multi-probe
    // posture over a layout with MORE tables than the multi-probe
    // write posture uses is loud — that layout shape is the
    // compensated-t(p) one, written to be probed exact-bucket over ALL
    // its tables, and prefix-probing it changes accept/reject
    // decisions mid-stream.
    val layoutTables = graft.llm.Similarity.lshIndexTables(df.sparkSession,
      indexPath)
    if (probeTables > 0) {
      streamLog.info(s"semantic gate posture at $indexPath: MULTI-PROBE " +
        s"over ${math.min(probeTables, numTables)} of $layoutTables " +
        "layout tables (Hamming-1 bucket expansion)")
      if (layoutTables > graft.llm.Similarity.MultiProbeTables)
        streamLog.warn(s"semantic gate at $indexPath: multi-probe posture " +
          s"(probeTables=$probeTables) over a $layoutTables-table layout - " +
          "that width is the COMPENSATED layout's, built for the " +
          "exact-bucket posture (probeTables = 0); a prefix probe of it " +
          "holds recall but changes membership decisions vs the posture " +
          "the layout was written for. Pass probeTables = 0 to keep the " +
          "layout's own posture, or rebuild the layout at " +
          s"${graft.llm.Similarity.MultiProbeTables} tables.")
    } else
      streamLog.info(s"semantic gate posture at $indexPath: EXACT-BUCKET " +
        s"over all $layoutTables layout tables")
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // Batch pinned first — see startNearDupGateSink's note.
        val corpusOk = semanticGateBatch(spark, indexPath,
          Materialize.pin(batch.toDF()),
          idCol, vecCol, threshold, numPlanes, numTables, staticPrune = true,
          probeTables = probeTables)
          .transform(Materialize.pin)
        val accepted = corpusOk
          .join(semanticIntraBatchDups(corpusOk, idCol, vecCol, threshold,
            numPlanes, numTables, probeTables = probeTables),
            Seq(idCol), "left_anti")
          .transform(Materialize.pin)
        accepted.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        graft.llm.Similarity.appendToLshIndex(accepted, idCol, vecCol,
          numPlanes, numTables, indexPath)
        maybeCompactIndexes(spark, Seq(indexPath), batchId, compactEvery)
      }
      .start()
  }

  /** Streaming ingest dedup gate: each micro-batch is gated through
    * [[dedupGateBatch]], accepted rows land in a batchId-named parquet
    * subdirectory (the [[startParquetSink]] idempotent layout) AND are
    * appended to the index — so a document accepted in batch N rejects
    * its duplicates in batch N+1 even under different ids. This is the
    * write-path of a training-corpus ingest: the dedup index grows with
    * the corpus and every arriving batch pays only its own hash + a
    * pruned probe.
    *
    * Exactly-once on replay: if the process crashes AFTER the append
    * but before the checkpoint commit, the replayed batch re-probes an
    * index that already contains its own rows — but a row's match with
    * its own appended copy has `cand_id == query_id`, which the probe
    * excludes, so the replay accepts the same rows and overwrites the
    * same directory. The double-append leaves duplicate index rows
    * (same id, same hash); probes stay correct because hits are
    * id-distinct, and a compaction rewrite can drop them any time.
    *
    * Intra-BATCH duplicates (two novel near-identical rows arriving in
    * one micro-batch) are upstream's job — compose with watermark dedup
    * or [[graft.llm.Dedup.exactDedup]] inside the source select; the
    * gate defines membership against the CORPUS, which cannot see
    * either row until the batch commits.
    */
  def startDedupGateSink(df: DataFrame, indexPath: String, outPath: String,
                         checkpoint: String, idCol: String, textCol: String,
                         nBuckets: Int, compactEvery: Int = 0) =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // Pin the gate decision BEFORE the append mutates the index a
        // lazy plan would re-read. staticPrune: a streaming batch frame
        // reports unknown size stats, so DPP's benefit heuristic would
        // reject and the probe would read the whole index (see
        // BandedIndex.probeJoinStatic). The batch itself is pinned too,
        // so the probe's key-collect pass reads pinned blocks.
        val accepted = dedupGateBatch(spark, indexPath,
          Materialize.pin(batch.toDF()),
          idCol, textCol, nBuckets, staticPrune = true)
          .transform(Materialize.pin)
        accepted.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        graft.llm.Dedup.appendToExactDupIndex(accepted, idCol, textCol,
          nBuckets, indexPath)
        maybeCompactIndexes(spark, Seq(indexPath), batchId, compactEvery)
      }
      .start()

  /** Streaming QUALITY ingest gate — the CCNet perplexity filter as the
    * fourth gate: every micro-batch is scored against the FROZEN
    * Kneser–Ney LM artifact ([[graft.llm.TextAnalysis.writeKnLm]]) and
    * only documents that (a) contain no LM-unseen bigram and (b) score
    * at or below the artifact's stored mean-surprisal threshold land in
    * the batchId-named output directory. Unlike the three membership
    * gates, the state here is deliberately STATELESS-per-batch: the
    * reference LM is a versioned artifact and accepted rows must NOT
    * shift the acceptance bar mid-stream (quality drift would otherwise
    * feed back into the filter — the CCNet posture). Replay is
    * therefore trivially exactly-once: the decision is a pure function
    * of (artifact, batch), and the overwrite of the same batch_id
    * directory is idempotent.
    */
  def startQualityGateSink(df: DataFrame, lmPath: String, outPath: String,
                           checkpoint: String, idCol: String,
                           textCol: String) =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.llm.TextAnalysis.knGateBatch(spark, lmPath, batch.toDF(),
          idCol, textCol)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      }
      .start()

  /** Streaming TRAINED-CLASSIFIER ingest gate — the fifth gate: every
    * micro-batch is scored against a FROZEN
    * [[graft.llm.Curation.writeQualityClassifier]] artifact and only
    * documents with a positive logit land in the batchId-named output
    * directory. Same posture as the KN quality gate: the model is a
    * versioned artifact, the decision is stateless per batch (a pure
    * integer-exact function of artifact + batch), and replay is
    * trivially exactly-once via the idempotent per-batch overwrite.
    * The two quality gates are complementary filters: the LM scores
    * fluency against a reference corpus; the classifier scores
    * membership of a LABELED reference class.
    */
  def startClassifierGateSink(df: DataFrame, modelPath: String,
                              outPath: String, checkpoint: String,
                              idCol: String, textCol: String) =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.llm.Curation.clfGateBatch(spark, modelPath, batch.toDF(),
          idCol, textCol)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      }
      .start()

  /** Streaming PII-REDACTION transform — the scrub an ingest pipeline
    * runs BEFORE persisting anything: every micro-batch passes through
    * [[graft.llm.TextAnalysis.redactPii]] (typed placeholder tokens +
    * per-type counts) and the redacted rows land in the batchId-named
    * output directory; raw PII never reaches the sink. Unlike the
    * membership gates this is a pure per-row TRANSFORM: no index, no
    * artifact, no state — the narrowest of the six ingest stages — so
    * replay is trivially exactly-once (the decision is a pure function
    * of the batch, and the per-batch overwrite is idempotent). Composes
    * BEFORE the gates: dedup/quality membership should be judged on the
    * redacted text a leaked row would actually train on.
    */
  def startPiiRedactSink(df: DataFrame, outPath: String, checkpoint: String,
                         idCol: String, textCol: String) =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.llm.TextAnalysis.redactPii(batch.toDF(), idCol, textCol)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      }
      .start()

  /** Streaming DRIFT MONITOR — the observability stage of the ingest
    * pipeline (seventh stage; the six others decide what lands, this
    * one watches WHAT is arriving): every micro-batch's value
    * distribution is scored as per-bin PSI contributions against the
    * FROZEN [[graft.ops.Checks.writeDriftReference]] artifact, and the
    * nBins-row report lands in the batchId-named directory for the
    * alerting consumer (Σ psi_micro ≥ 250000 is the conventional
    * "major shift" alarm). Same posture as the quality gates: the
    * reference is a versioned artifact so drift can never move its own
    * yardstick; the report is a pure function of (artifact, batch), so
    * replay is trivially exactly-once via the idempotent per-batch
    * overwrite. A monitor, not a gate — it never drops rows, so it
    * rides alongside the filtering stages, not in front of them.
    */
  def startDriftMonitorSink(df: DataFrame, refPath: String, outPath: String,
                            checkpoint: String, valueCol: String) =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.ops.Checks.psiAgainstReference(batch.sparkSession, refPath,
            batch.toDF(), valueCol)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      }
      .start()

  /** The artifact/index paths of the COMPOSED ingest pipeline — one
    * value so the batch body, the sink, and the tests name the seven
    * stages' state identically.
    */
  final case class IngestPipelineConfig(
      exactIndexPath: String, nearDupIndexPath: String, semIndexPath: String,
      lmPath: String, clfModelPath: String, driftRefPath: String,
      nBucketsExact: Int, maxHamming: Int, semThreshold: Double,
      numPlanes: Int, numTables: Int,
      // Semantic-stage posture (round-18): > 0 = MULTI-PROBE membership
      // over the first min(semProbeTables, numTables) tables — the
      // default, paired with a Similarity.MultiProbeTables-table layout
      // (see startSemanticGateSink's posture note); 0 = exact-bucket
      // over all numTables tables (the compensated-layout posture).
      semProbeTables: Int = graft.llm.Similarity.MultiProbeTables)

  /** One micro-batch of the FULL ingest pipeline — the six decision
    * stages composed in their contract order over one arriving frame of
    * `(idCol, textCol, vecCol)` rows:
    *
    *   1. PII redaction FIRST ([[graft.llm.TextAnalysis.redactPii]]) —
    *      every later stage judges the redacted text a leaked row would
    *      actually train on, and raw PII never reaches any sink or
    *      index (the [[startPiiRedactSink]] contract).
    *   2. exact-dup gate ([[dedupGateBatch]]) — verbatim (normalized)
    *      corpus membership.
    *   3. near-dup gate ([[nearDupGateBatch]]) — wide-simhash hamming
    *      membership (lightly-edited copies).
    *   4. semantic gate ([[semanticGateBatch]]) — embedding-cosine
    *      membership (paraphrases).
    *   5. quality gate ([[graft.llm.TextAnalysis.knGateBatch]]) — the
    *      frozen KN-LM fluency filter.
    *   6. classifier gate ([[graft.llm.Curation.clfGateBatch]]) — the
    *      frozen trained-quality filter.
    *
    * The order is load-bearing twice: redaction before everything (the
    * contract above), and the membership gates cheapest-first (an exact
    * hash probe rejects for free what the LSH probe would pay buckets
    * for). After each MEMBERSHIP gate, the matching INTRA-batch
    * self-check of the component sink runs — keep-lowest-id exact
    * normalized-hash self-dedup, [[graft.llm.Dedup.simhashWidePairs]],
    * and [[semanticIntraBatchDups]] — so mutually-duplicate rows
    * arriving in ONE micro-batch (which no corpus probe can see) are
    * gated exactly as the component sinks gate them: the composition
    * is decision-equivalent to chaining the six sinks, not weaker.
    * Every stage stays batch-sized at any corpus scale (corpus probes
    * are DPP-pruned index reads keyed by the batch's own hashes;
    * intra-batch candidates form only inside shared buckets/bands).
    *
    * Returns the accepted rows as (idCol, textCol = REDACTED text,
    * vecCol). The drift MONITOR (stage seven) never drops rows and so
    * is not part of this decision body — [[startIngestPipelineSink]]
    * runs it alongside, over the redacted arriving batch.
    */
  def ingestPipelineBatch(spark: org.apache.spark.sql.SparkSession,
                          cfg: IngestPipelineConfig, batch: DataFrame,
                          idCol: String, textCol: String,
                          vecCol: String): DataFrame =
    ingestStages(spark, cfg, idCol, textCol, vecCol,
      resolveNearBuckets(spark, cfg))
      .foldLeft(redactKeepVec(batch, idCol, textCol, vecCol)) {
        case (df, (_, stage)) => stage(df)
      }

  /** The near-dup stage's bucket width, resolved ONCE from the index's
    * params sidecar — callers thread the value into [[ingestStages]]
    * so the per-stage lambdas never re-read the sidecar file (the
    * streaming sink resolves it once per STREAM, not per micro-batch).
    */
  private def resolveNearBuckets(spark: org.apache.spark.sql.SparkSession,
                                 cfg: IngestPipelineConfig): Int =
    graft.llm.Dedup.simhashWideIndexBuckets(spark, cfg.nearDupIndexPath)

  /** Redact `textCol` in place, carrying `vecCol` through — the frame
    * every decision stage of the composed pipeline operates on.
    */
  private def redactKeepVec(batch: DataFrame, idCol: String,
                            textCol: String, vecCol: String): DataFrame =
    graft.llm.TextAnalysis.redactPii(batch, idCol, textCol)
      .select(col(idCol), col("redacted").as(textCol))
      .join(batch.select(col(idCol), col(vecCol)), Seq(idCol))

  /** The named decision stages of the composed ingest pipeline, each a
    * survivors->survivors function over the redacted
    * (idCol, textCol, vecCol) frame — one definition shared by
    * [[ingestPipelineBatch]] (fold to the accepted set) and
    * [[ingestPipelineTrace]] (per-stage rejection audit). Membership
    * gates alternate with their intra-batch self-checks; `kn`/`clf`
    * are stateless per-row and need none.
    */
  private def ingestStages(spark: org.apache.spark.sql.SparkSession,
                           cfg: IngestPipelineConfig, idCol: String,
                           textCol: String, vecCol: String,
                           nearBuckets: Int)
      : Seq[(String, DataFrame => DataFrame)] = Seq(
    // staticPrune on every membership stage: stage inputs are PINNED
    // survivor frames (unknown size stats), which silently disables
    // DPP on the index probes — see BandedIndex.probeJoinStatic.
    "exact" -> ((df: DataFrame) => dedupGateBatch(spark, cfg.exactIndexPath,
      df, idCol, textCol, cfg.nBucketsExact, staticPrune = true)),
    // Keep-lowest-id per normalized text hash WITHIN the batch — the
    // upstream-dedup job startDedupGateSink documents, done here so the
    // composition is self-contained.
    "exact_intra" -> ((df: DataFrame) => df.join(
      df.select(col(idCol),
          md5(graft.llm.TextOps.normalize(col(textCol))).as("__h"))
        .groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
        .select(col(idCol)),
      Seq(idCol), "left_semi")),
    "near" -> ((df: DataFrame) => nearDupGateBatch(spark,
      cfg.nearDupIndexPath, df, idCol, textCol, cfg.maxHamming,
      nBuckets = nearBuckets, staticPrune = true)),
    // simhashWidePairs emits id_a < id_b; dropping every id_b keeps the
    // lowest id of each intra-batch near-dup group.
    "near_intra" -> ((df: DataFrame) => df.join(
      graft.llm.Dedup.simhashWidePairs(df, idCol, textCol, cfg.maxHamming)
        .select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")),
    "semantic" -> ((df: DataFrame) => semanticGateBatch(spark,
      cfg.semIndexPath, df, idCol, vecCol, cfg.semThreshold, cfg.numPlanes,
      cfg.numTables, staticPrune = true,
      probeTables = cfg.semProbeTables)),
    "semantic_intra" -> ((df: DataFrame) => df.join(
      semanticIntraBatchDups(df, idCol, vecCol, cfg.semThreshold,
        cfg.numPlanes, cfg.numTables, probeTables = cfg.semProbeTables),
      Seq(idCol), "left_anti")),
    "kn" -> ((df: DataFrame) => graft.llm.TextAnalysis.knGateBatch(spark,
      cfg.lmPath, df, idCol, textCol)),
    "clf" -> ((df: DataFrame) => df.join(
      graft.llm.Curation.clfGateBatch(spark, cfg.clfModelPath, df,
        idCol, textCol).select(col(idCol)),
      Seq(idCol), "left_semi")))

  /** Per-row audit of the composed pipeline: every arriving row labeled
    * with the FIRST stage that rejected it (`exact`, `exact_intra`,
    * `near`, `near_intra`, `semantic`, `semantic_intra`, `kn`, `clf`)
    * or `accepted`, plus the row's total PII redaction count — the
    * "which gate is eating my data" observability view a production
    * ingest needs, and the full-replay surface the e2e oracle checks.
    * Decision-identical to [[ingestPipelineBatch]] by construction
    * (same [[ingestStages]] fold); each stage's survivor frame is
    * pinned so the audit's anti-joins don't replan the whole chain
    * per stage.
    */
  def ingestPipelineTrace(spark: org.apache.spark.sql.SparkSession,
                          cfg: IngestPipelineConfig, batch: DataFrame,
                          idCol: String, textCol: String,
                          vecCol: String): DataFrame = {
    val red = graft.llm.TextAnalysis.redactPii(batch, idCol, textCol)
    val nPii = red.select(col(idCol),
      graft.llm.TextAnalysis.piiPatterns
        .map { case (n, _, _) => col(s"n_$n") }
        .reduce(_ + _).as("n_pii"))
    var cur = red.select(col(idCol), col("redacted").as(textCol))
      .join(batch.select(col(idCol), col(vecCol)), Seq(idCol))
      .transform(Materialize.pin)
    val rejected = ingestStages(spark, cfg, idCol, textCol, vecCol,
        resolveNearBuckets(spark, cfg))
      .map { case (name, stage) =>
        val next = stage(cur).transform(Materialize.pin)
        val rej = cur.select(col(idCol))
          .join(next.select(col(idCol)), Seq(idCol), "left_anti")
          .select(col(idCol), lit(name).as("rejected_by"))
        cur = next
        rej
      }
    (rejected :+ cur.select(col(idCol), lit("accepted").as("rejected_by")))
      .reduce(_ unionByName _)
      .join(nPii, Seq(idCol))
  }

  /** One stage's per-micro-batch operational metrics — the row shape of
    * the sink's `<monitorPath>_stages/batch_id=N` report: which gate
    * saw how many rows, kept how many, and how long it took. The
    * "which gate is slow / eating my data" view a production 100 TB
    * ingest needs, complementing [[ingestPipelineTrace]]'s per-ROW
    * decision audit.
    */
  final case class IngestStageMetric(stage: String, stage_idx: Int,
                                     rows_in: Long, rows_out: Long,
                                     wall_ms: Long)

  /** The FLAGSHIP streaming ingest sink: one `foreachBatch` DAG running
    * the [[ingestStages]] chain per micro-batch, landing accepted rows
    * in the batchId-named directory, growing all three membership
    * indexes with the accepted rows (a document accepted in batch N
    * rejects its verbatim/edited/paraphrased copies in batch N+1 — the
    * [[startDedupGateSink]] growth contract, now for the whole family),
    * and writing the drift monitor's nBins-row PSI report of the
    * arriving batch's REDACTED text lengths against the frozen
    * [[graft.ops.Checks.writeDriftReference]] artifact.
    *
    * OBSERVABILITY: every stage's survivors are pinned and counted, and
    * a per-batch [[IngestStageMetric]] report (stage, rows in/out, wall)
    * lands beside the PSI monitor at `<monitorPath>_stages/batch_id=N`.
    * Decision-identical to the plain fold by construction (pins are
    * semantics-preserving); the counts read the pinned blocks the next
    * stage consumes anyway, so the report costs one cheap job per stage
    * on batch-sized frames.
    *
    * Exactly-once on replay: the per-stage arguments transfer verbatim
    * — the batch output directory overwrite is idempotent, a replayed
    * batch's index self-matches are `cand_id == query_id` (excluded by
    * every probe), double-appended index rows only re-confirm the same
    * id-distinct hits (and the compaction cadence drops them —
    * [[maybeCompactIndexes]]), and the quality/classifier/drift stages
    * are pure functions of (frozen artifact, batch).
    */
  def startIngestPipelineSink(df: DataFrame, cfg: IngestPipelineConfig,
                              outPath: String, monitorPath: String,
                              checkpoint: String, idCol: String,
                              textCol: String, vecCol: String,
                              compactEvery: Int = 0) = {
    // Resolved ONCE per stream, not per micro-batch: the near stage's
    // bucket width is a build-time layout constant — re-reading the
    // params sidecar from the filesystem every batch bought nothing.
    val nearBuckets = resolveNearBuckets(df.sparkSession, cfg)
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // Redact ONCE and pin: the gate chain and the drift monitor
        // both consume this frame — redaction is the most expensive
        // per-row text transform in the pipeline.
        val t0 = System.nanoTime()
        val redacted = redactKeepVec(batch.toDF(), idCol, textCol, vecCol)
          .transform(Materialize.pin)
        val nArrived = redacted.count()
        val metrics = scala.collection.mutable.ArrayBuffer(
          IngestStageMetric("redact", 0, nArrived, nArrived,
            (System.nanoTime() - t0) / 1000000L))
        // Pin the decisions BEFORE the appends mutate the indexes a
        // lazy plan would re-read — per stage, so each gate's survivor
        // count and wall are observable.
        var cur = redacted
        var nCur = nArrived
        ingestStages(spark, cfg, idCol, textCol, vecCol, nearBuckets)
          .zipWithIndex
          .foreach { case ((name, stage), i) =>
            val t = System.nanoTime()
            val next = stage(cur).transform(Materialize.pin)
            val nNext = next.count()
            metrics += IngestStageMetric(name, i + 1, nCur, nNext,
              (System.nanoTime() - t) / 1000000L)
            cur = next
            nCur = nNext
          }
        val accepted = cur
        accepted.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        graft.llm.Dedup.appendToExactDupIndex(accepted, idCol, textCol,
          cfg.nBucketsExact, cfg.exactIndexPath)
        graft.llm.Dedup.appendToSimhashWideIndex(accepted, idCol, textCol,
          cfg.maxHamming, cfg.nearDupIndexPath)
        graft.llm.Similarity.appendToLshIndex(accepted, idCol, vecCol,
          cfg.numPlanes, cfg.numTables, cfg.semIndexPath)
        maybeCompactIndexes(spark, Seq(cfg.exactIndexPath,
          cfg.nearDupIndexPath, cfg.semIndexPath), batchId, compactEvery)
        // The per-stage ops report, idempotent per batch like the
        // landed output (overwrite of a batchId-named directory).
        import spark.implicits._
        metrics.toSeq.toDF().write.mode("overwrite")
          .parquet(s"${monitorPath}_stages/batch_id=$batchId")
        // Stage seven, the monitor: watches WHAT arrives (post-redact),
        // not what survives — it must see the rows the gates reject.
        graft.ops.Checks.psiAgainstReference(spark, cfg.driftRefPath,
            redacted.select(length(col(textCol)).cast("double").as("__len")),
            "__len")
          .write.mode("overwrite").parquet(s"$monitorPath/batch_id=$batchId")
      }
      .start()
  }
}
