package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Streaming family of the extension registry — genuinely streaming
  * plans (file stream → watermark/window/state → memory sink, run to
  * completion) graded against the SAME oracles as their batch duals
  * (extends [[RegistryEvents]] for that shared oracle SQL). See
  * [[RegistryShared]]. */
private[graft] trait RegistryStreaming extends RegistryEvents {
  // ---------------------------------------------------------------------
  // Streaming (graft.streaming.StreamOps) — a genuinely streaming plan
  // (file stream → watermark+window agg → memory sink, run to
  // completion) plus the stream-capable session_window operator in its
  // batch mode. Both get the SAME oracles as their batch duals: the
  // value-for-value match IS the stream/batch parity proof.
  // ---------------------------------------------------------------------

  /** Once-per-(session, dir) checkpointed run of the
    * transformWithState totals processor, for [[st_state_reader]]:
    * drains the events stream into a noop sink against a real
    * checkpointLocation (RocksDB provider — transformWithState rejects
    * the HDFS-backed one) and returns the checkpoint path. Keyed on
    * the session OBJECT via WeakHashMap (identity hashes can be reused
    * after a stopped session is GC'd — the variantFixture
    * convention). */
  private val totalsCheckpoint =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, String]]()

  protected def ensureTotalsCheckpoint(s: SparkSession,
                                       dir: String): String =
    totalsCheckpoint.synchronized {
      totalsCheckpoint.computeIfAbsent(s,
          _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate(dir, {
          import s.implicits._
          val ckpt = graft.Scratch.dir("graft_totals_ckpt")
          val key = "spark.sql.streaming.stateStore.providerClass"
          val saved = s.conf.getOption(key)
          s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
            "state.RocksDBStateStoreProvider")
          try {
            val src = Tables.loadStream(s, dir, "events")
              .select(col("user_id"), col("event_type"),
                Events.micros(col("value")).as("vm"), col("event_id"))
              .as[graft.streaming.StreamOps.TotalsIn]
            val q = graft.streaming.StreamOps.statefulUserTotals(src)
              .toDF()
              .writeStream.format("noop")
              .option("checkpointLocation", ckpt)
              .outputMode("update")
              .trigger(org.apache.spark.sql.streaming.Trigger
                .AvailableNow())
              .start()
            q.awaitTermination()
          } finally saved match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
          ckpt
        })
    }

  /** Once-per-(session, dir) checkpointed run of the TIMER sessionizer
    * ([[graft.streaming.StreamOps.timerSessionize]]) WITHOUT the
    * sentinel flush, for [[st_state_timers]]: open sessions stay in
    * the store with their registered timers, which is the state kind
    * this fixture exists to expose (the sentinel-flushed
    * st_tws_sessions run would leave the timer column family EMPTY —
    * every timer fires before the drain ends). Same WeakHashMap
    * session-keyed convention as [[ensureTotalsCheckpoint]]; the two
    * fixtures share the map under distinct dir keys. */
  protected def ensureTimerCheckpoint(s: SparkSession,
                                      dir: String): String =
    totalsCheckpoint.synchronized {
      totalsCheckpoint.computeIfAbsent(s,
          _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate("timers:" + dir, {
          import s.implicits._
          val ckpt = graft.Scratch.dir("graft_timers_ckpt")
          val key = "spark.sql.streaming.stateStore.providerClass"
          val saved = s.conf.getOption(key)
          s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
            "state.RocksDBStateStoreProvider")
          try {
            val src = Tables.loadStream(s, dir, "events")
              .select("user_id", "event_id", "ts")
              .as[graft.streaming.StreamOps.Ev]
            val q = graft.streaming.StreamOps
              .timerSessionize(src, SessionGapSeconds).toDF()
              .writeStream.format("noop")
              .option("checkpointLocation", ckpt)
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger
                .AvailableNow())
              .start()
            q.awaitTermination()
          } finally saved match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
          ckpt
        })
    }

  protected val streaming: Map[String, Q] = Map(
    "st_hourly_rollup" -> ((s, dir) =>
      graft.streaming.StreamOps.runToCompletion(
        s, Tables.loadStream(s, dir, "events"),
        graft.streaming.StreamOps.hourlyRollupStream,
        shufflePartitions = StreamStateParts)
        .orderBy("hour", "event_type")),
    // The bounded-state form of the rollup: HLL sketch per (window,
    // type) instead of collect_set — fixed state memory at any stream
    // cardinality. Hash-checked like its batch dual: the drained stream
    // result goes through the same grading wrapper, so the oracle is
    // the exact rollup + TRUE (estimate within the StreamingSpec bar).
    "st_hourly_rollup_approx" -> ((s, dir) =>
      Events.approxRollupEval(
        graft.streaming.StreamOps.runToCompletion(
          s, Tables.loadStream(s, dir, "events"),
          graft.streaming.StreamOps.hourlyRollupApproxStream,
          // StreamStateParts deliberately kept: partitions=cpus was
          // measured 2.4× SLOWER here (4.1 → 9.9 s scoped) — the
          // per-partition state-store machinery outweighs the extra
          // parallelism on the CPU-heavy HLL merge even on this query
          shufflePartitions = StreamStateParts),
        t(s, dir, "events"), HllBoundPpm)
        .orderBy("hour", "event_type")),
    // Streaming dual of ev_partition_prune: the SAME Hive-partitioned
    // fact read as a FILE STREAM with a partition filter — each
    // micro-batch's scan carries the predicate as a PartitionFilter,
    // so only the click directory's files are ever read (LayoutSpec's
    // streaming test pins numFiles == click-partition files). At
    // 100 TB this is the streaming backfill saver: tailing a
    // date/tenant-partitioned fact with a partition predicate must not
    // re-read every directory each batch. Oracle = the same raw-table
    // WHERE rollup as the batch dual.
    "st_partition_prune" -> ((s, dir) => {
      val (factDir, _) = ensurePartitionedEvents(s, dir)
      val src = s.readStream
        .schema(s.read.parquet(factDir).schema)
        .parquet(factDir)
        .where(col("event_type") === "click")
      graft.streaming.StreamOps.runToCompletion(
        s, src, graft.streaming.StreamOps.hourlyRollupStream,
        shufflePartitions = StreamStateParts)
        .orderBy("hour")
    }),
    "st_session_window" -> ((s, dir) =>
      graft.streaming.StreamOps.sessionWindowAgg(
        t(s, dir, "events"), SessionGapSeconds)
        .orderBy("user_id", "start_us")),
    // Spark 4 transformWithState (the arbitrary-state successor API):
    // per-user running totals in a StatefulProcessor with typed
    // ValueState, TimeMode.None, update-mode emission — REQUIRES the
    // RocksDB state store provider (set for this run, restored after),
    // the off-heap store that keeps per-key state viable when keys ×
    // state outgrow executor heap. Order-insensitive accumulators make
    // batch slicing irrelevant; update mode re-emits a user's running
    // row each batch it appears in, and n_events grows strictly per
    // emission, so the per-user struct-max collapses superseded rows
    // (single-file AvailableNow drains in one batch; the struct-max
    // also keeps the query correct under multi-batch sources). Oracle
    // = the plain batch groupBy.
    "st_transform_state" -> ((s, dir) => {
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val saved = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        graft.streaming.StreamOps.runToCompletion(
          s, Tables.loadStream(s, dir, "events"),
          df => graft.streaming.StreamOps.statefulUserTotals(
            df.select(col("user_id"), col("event_type"),
              Events.micros(col("value")).as("vm"), col("event_id"))
              .as[graft.streaming.StreamOps.TotalsIn]).toDF(),
          outputMode = "update", shufflePartitions = StreamStateParts)
          .groupBy("user_id")
          .agg(max(struct(col("n_events"), col("n_clicks"),
            col("value_micros"), col("max_event_id"))).as("m"))
          .select(col("user_id"), col("m.n_events").as("n_events"),
            col("m.n_clicks").as("n_clicks"),
            col("m.value_micros").as("value_micros"),
            col("m.max_event_id").as("max_event_id"))
          .orderBy("user_id")
      } finally saved match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),

    // State Data Source READER (Spark 4 streaming-ops surface): open a
    // finished query's CHECKPOINT offline with
    // `spark.read.format("statestore")` and inspect the state store's
    // contents directly — the production capability for debugging a
    // stuck/suspect stateful query without touching its outputs. The
    // inspected store is the transformWithState totals processor's
    // ValueState ("totals" via `stateVarName`); TimeMode.None never
    // evicts, so after an AvailableNow drain the state holds EXACTLY
    // one row per user equal to the batch aggregate — the same oracle
    // as st_transform_state, but read from RocksDB snapshot files
    // instead of the query's emissions. The checkpointed run is a
    // once-per-(session, dir) fixture (WeakHashMap-keyed on the
    // session OBJECT, the variantFixture convention) so the query
    // times the STATE READ, the operation this surface exists for.
    "st_state_reader" -> ((s, dir) => {
      val ckpt = ensureTotalsCheckpoint(s, dir)
      s.read.format("statestore").option("path", ckpt)
        .option("stateVarName", "totals").load()
        .select(col("value.user_id").as("user_id"),
          col("value.n_events").as("n_events"),
          col("value.n_clicks").as("n_clicks"),
          col("value.value_micros").as("value_micros"),
          col("value.max_event_id").as("max_event_id"))
        .orderBy("user_id")
    }),

    // State Data Source reader over a SECOND state kind: the TIMER
    // column family (st_state_reader reads a ValueState). The
    // un-flushed timer-sessionize checkpoint holds one registered
    // timer per OPEN session (the processor deletes the previous
    // registration each batch, so exactly one per live key), read
    // offline with readRegisteredTimers=true. The oracle is a
    // first-principles open-session computation: a user's trailing
    // session is open iff its expiry (last event ms + gap·1000)
    // exceeds the final watermark (global max event ms, delay 0) —
    // Spark fires timers with expiry ≤ watermark (TimerStateImpl's
    // iterator bound), so exactly the strictly-greater set remains.
    "st_state_timers" -> ((s, dir) => {
      val ckpt = ensureTimerCheckpoint(s, dir)
      s.read.format("statestore").option("path", ckpt)
        .option("readRegisteredTimers", "true").load()
        .select(col("key.value").as("user_id"),
          col("expiration_timestamp_ms").as("expiry_ms"))
        .orderBy("user_id")
    }),

    // CHAINED stateful operators in one streaming query: the events
    // file streamed twice (at-least-once delivery), watermarked exact
    // dedup, then session_window aggregation — two state stores, one
    // watermark. A beyond-horizon sentinel (user −1, past gap + delay)
    // advances the final watermark so every real session closes before
    // the drain; the sentinel's own rows are filtered. Oracle = the
    // batch composition: sessions over the UNIQUE events — the same
    // SQL st_session_window is checked against.
    "st_dedup_sessions" -> ((s, dir) => {
      import graft.streaming.StreamOps
      import s.implicits._
      val batch = t(s, dir, "events")
      val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime +
        (SessionGapSeconds + StreamOps.JoinWatermarkDelaySeconds + 3600) *
          1000L)
      val sentinelDir = graft.Scratch.dir("graft_st_ds_sentinel")
      Seq((-1L, -1L, sentinelTs, 0.0))
        .toDF("user_id", "event_id", "ts", "value")
        .write.mode("overwrite").parquet(sentinelDir)
      def evStream() = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "ts", "value")
      val src = evStream().unionAll(evStream()).unionAll(
        s.readStream.schema(s.read.parquet(sentinelDir).schema)
          .parquet(sentinelDir))
      StreamOps.runToCompletion(s, src,
        StreamOps.dedupThenSessionWindow(_, SessionGapSeconds),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .where(col("user_id") >= 0)
        .orderBy("user_id", "start_us")
    }),

    // Streaming corpus prep: the documents file streamed twice
    // (at-least-once delivery), quality + language predicates as
    // stateless filters on the scan, then watermark-bounded key dedup —
    // the streaming dual of tp_corpus_pipeline's front half. Event time
    // is synthesized deterministically from doc_id (positive epoch —
    // rows at/below the engine's initial watermark would drop as late).
    "st_corpus_prep" -> ((s, dir) => {
      def docStream() = Tables.loadStream(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          timestamp_seconds(col("doc_id") + lit(1000000000L)).as("ts"))
      graft.streaming.StreamOps.runToCompletion(s,
        docStream().unionAll(docStream()),
        graft.streaming.StreamOps.corpusPrepStream(_, PipelineLang),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("doc_id")
    }),

    // Streaming quality-model scoring: the same doubled document
    // stream, watermark-bounded dedup state, then the batch scorer's
    // narrow scoring map — drained output must equal the batch query
    // value-for-value (the shared oracle).
    "st_quality_model" -> ((s, dir) => {
      def docStream() = Tables.loadStream(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          timestamp_seconds(col("doc_id") + lit(1000000000L)).as("ts"))
      graft.streaming.StreamOps.runToCompletion(s,
        docStream().unionAll(docStream()),
        st => operators.TextAnalysis.qualityModelScore(
          st.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark("doc_id"),
          "doc_id", "text", QmWStop, QmWPunct, QmWLen, QmBias),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("doc_id")
    }),

    // Streaming exact dedup: the same file streamed twice (UNION ALL of
    // two identical sources), deduplicated on event_id with watermarked,
    // BOUNDED state (dropDuplicatesWithinWatermark — state evicts once
    // the watermark passes ts + delay) — each event emitted exactly once.
    "st_stream_dedup" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
        .unionAll(Tables.loadStream(s, dir, "events"))
      graft.streaming.StreamOps.runToCompletion(s, src,
        graft.streaming.StreamOps.streamDedup(_),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("event_id")
    }),

    // ARBITRARY-STATE sessionization (flatMapGroupsWithState, event-time
    // timeout) run as a real stream and checked against the SAME oracle
    // as the batch window and the two-level form — the third stream/
    // batch parity proof, this one for custom state. A sentinel event
    // (user −1) past every session's timeout is appended so the final
    // watermark closes each real user's last open session before the
    // stream drains; the sentinel's own session stays open and is
    // filtered out.
    "st_stateful_sessions" -> ((s, dir) => {
      import graft.streaming.StreamOps
      import s.implicits._
      val batch = t(s, dir, "events")
      val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(
        maxTs.getTime + (SessionGapSeconds + 3600) * 1000L)
      val sentinelDir = graft.Scratch.dir("graft_st_sentinel")
      Seq((-1L, -1L, sentinelTs)).toDF("user_id", "event_id", "ts")
        .write.mode("overwrite").parquet(sentinelDir)
      val evStream = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "ts")
      val src = evStream.unionAll(
        s.readStream.schema(s.read.parquet(sentinelDir).schema)
          .parquet(sentinelDir))
      StreamOps.runToCompletion(s, src,
        df => StreamOps.statefulSessionize(
          df.as[StreamOps.Ev], SessionGapSeconds).toDF(),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .where(col("user_id") >= 0)
        .orderBy("user_id", "session_id")
    }),

    // The TIMER half of the transformWithState surface
    // (st_transform_state covers typed ValueState/TimeMode.None):
    // event-time timers via registerTimer/handleExpiredTimer — the new
    // API's replacement for GroupStateTimeout.EventTimeTimeout — close
    // idle sessions when the watermark passes end+gap, no further
    // event from that user needed. Same sentinel flush and the SAME
    // oracle as st_stateful_sessions: the value-for-value match proves
    // the two stateful APIs implement identical session semantics.
    // RocksDB provider required (transformWithState rejects the
    // HDFS-backed store); StreamingSpec's timer test proves the
    // emission crosses micro-batch boundaries.
    "st_tws_sessions" -> ((s, dir) => {
      import graft.streaming.StreamOps
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val saved = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val batch = t(s, dir, "events")
        val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
        val sentinelTs = new java.sql.Timestamp(
          maxTs.getTime + (SessionGapSeconds + 3600) * 1000L)
        val sentinelDir = graft.Scratch.dir("graft_st_tws_sentinel")
        Seq((-1L, -1L, sentinelTs)).toDF("user_id", "event_id", "ts")
          .write.mode("overwrite").parquet(sentinelDir)
        val evStream = Tables.loadStream(s, dir, "events")
          .select("user_id", "event_id", "ts")
        val src = evStream.unionAll(
          s.readStream.schema(s.read.parquet(sentinelDir).schema)
            .parquet(sentinelDir))
        StreamOps.runToCompletion(s, src,
          df => StreamOps.timerSessionize(
            df.as[StreamOps.Ev], SessionGapSeconds).toDF(),
          outputMode = "append", shufflePartitions = StreamStateParts)
          .where(col("user_id") >= 0)
          .orderBy("user_id", "session_id")
      } finally saved match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),

    // Streaming CDC snapshot: one struct-max state row per user,
    // complete-mode emission; drained result == the batch snapshot
    // (shared oracle).
    "st_latest_snapshot" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      graft.streaming.StreamOps.runToCompletion(s, src,
        graft.streaming.StreamOps.latestSnapshotStream,
        outputMode = "complete", shufflePartitions = StreamStateParts)
        .orderBy("user_id")
    }),
    // Changelog-mode CDC snapshot: per batch, only the touched keys'
    // struct-max rows merge into the generation table (order-
    // insensitive max merge), closing complete-mode's full-keyset
    // re-emission gap; drained result == the batch snapshot (shared
    // oracle).
    "st_snapshot_changelog" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      graft.streaming.StreamOps.runSnapshotChangelog(s, src,
        graft.Scratch.dir("graft_st_changelog"))
        .orderBy("user_id")
    }),
    // Streaming SCD2: incremental run compression with state-change
    // emission; the beyond-horizon sentinel flushes open intervals so
    // the drained stream equals the batch scd2 (same oracle).
    // CONSTRAINT (enforced, not assumed): the events source must drain
    // in ONE micro-batch — statefulScd2 orders events only within a
    // batch, and a mid-stream flush would restart versions — so
    // singleBatchSources asserts it from the query progress; a source
    // split across batches fails loudly instead of hash-mismatching.
    "st_scd2" -> ((s, dir) => {
      import graft.streaming.StreamOps
      import s.implicits._
      val batch = t(s, dir, "events")
      val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 7200 * 1000L)
      val sentinelDir = graft.Scratch.dir("graft_st_scd2_sentinel")
      Seq((-1L, -1L, "flush", sentinelTs))
        .toDF("user_id", "event_id", "event_type", "ts")
        .write.mode("overwrite").parquet(sentinelDir)
      val evStream = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      val src = evStream.unionAll(
        s.readStream.schema(s.read.parquet(sentinelDir).schema)
          .parquet(sentinelDir))
      StreamOps.runToCompletion(s, src,
        df => StreamOps.statefulScd2(df.as[StreamOps.TypedEv]).toDF(),
        outputMode = "append", shufflePartitions = StreamStateParts,
        singleBatchSources = Seq(0))
        .where(col("user_id") >= 0)
        .orderBy("user_id", "version")
    }),

    // Stream-stream watermarked interval join (views × clicks of the
    // same user within the attribution window) — a genuinely streaming
    // join with bounded state; one file stream forked into two sides
    // (stream self-joins are supported for inner joins). Oracle = the
    // batch BETWEEN range join in DuckDB.
    "st_stream_join" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
      graft.streaming.StreamOps.runToCompletion(s, src,
        df => graft.streaming.StreamOps.streamIntervalJoin(
          df.where(col("event_type") === "view"),
          df.where(col("event_type") === "click"),
          StreamJoinWindowSeconds),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("view_event_id", "click_event_id")
    }),

    // FULL OUTER stream-stream interval join: matched pairs emit on
    // arrival; unmatched rows emit null-extended only once the
    // watermark proves no partner can arrive. The oracle encodes that
    // watermark cutoff explicitly (final watermark = the slower side's
    // max event time minus the delay) — the honest drained-output
    // contract for outer streaming joins, where rows in the tail
    // window legitimately stay buffered at end of stream.
    "st_outer_join" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
      graft.streaming.StreamOps.runToCompletion(s, src,
        df => graft.streaming.StreamOps.streamFullOuterJoin(
          df.where(col("event_type") === "view"),
          df.where(col("event_type") === "click"),
          StreamJoinWindowSeconds),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("user_id", "view_event_id", "click_event_id")
    }),

    // CHAINED stream-stream join → windowed rollup in one query (the
    // second multi-stateful shape): attribution pairs per (user,
    // click-hour). Beyond-horizon sentinel events on BOTH sides
    // advance the final watermark past every real window (the join
    // shifts the downstream watermark by its interval bound); the
    // sentinel user's rows are filtered. Oracle = the batch
    // composition: range join then hour-bucketed counts.
    "st_join_rollup" -> ((s, dir) => {
      import graft.streaming.StreamOps
      import s.implicits._
      val batch = t(s, dir, "events")
      val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime +
        (StreamOps.JoinWatermarkDelaySeconds + StreamJoinWindowSeconds +
          3 * 3600) * 1000L)
      val sentinelDir = graft.Scratch.dir("graft_st_jr_sentinel")
      Seq((-1L, -101L, "view", sentinelTs), (-1L, -102L, "click", sentinelTs))
        .toDF("user_id", "event_id", "event_type", "ts")
        .write.mode("overwrite").parquet(sentinelDir)
      val ev = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      val src = ev.unionAll(
        s.readStream.schema(s.read.parquet(sentinelDir).schema)
          .parquet(sentinelDir))
      StreamOps.runToCompletion(s, src,
        df => StreamOps.intervalJoinThenHourly(
          df.where(col("event_type") === "view"),
          df.where(col("event_type") === "click"),
          StreamJoinWindowSeconds),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .where(col("user_id") >= 0)
        .orderBy("user_id", "hour_us")
    }),

    // Stream-side AS-OF against a slowly-changing static dimension (the
    // feature-store lookup): the dimension is the batch SCD2 interval
    // table built from the same events; each streamed event picks the
    // version current at its event time. Stateless stream-static join —
    // no watermark, no state store. Oracle = the batch composition
    // (events × SCD2 intervals on the containment predicate).
    "st_asof_enrich" -> ((s, dir) => {
      val dim = Events.scd2(t(s, dir, "events"))
      val src = Tables.loadStream(s, dir, "events")
        .select("event_id", "user_id", "ts")
      graft.streaming.StreamOps.runToCompletion(s, src,
        graft.streaming.StreamOps.streamAsofEnrich(_, dim),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("event_id")
    }),

    // Stream-STATIC enrichment: each streamed event picks up its user's
    // total count from a batch-side dimension (broadcast — stateless,
    // no watermark, no state store). Oracle = the same join in batch.
    "st_static_enrich" -> ((s, dir) => {
      val dim = t(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1)).as("user_events"))
      val src = Tables.loadStream(s, dir, "events")
      graft.streaming.StreamOps.runToCompletion(s, src,
        df => graft.streaming.StreamOps.enrichWithStatic(
          df.select("event_id", "user_id"), dim, "user_id"),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("event_id")
    })
  )

  /** session_window semantics: window = [first event, last event + gap)
    * — shared by the plain session query and the chained dedup→session
    * query (dedup removes delivery retries, so both land on sessions
    * over the unique events). */
  private lazy val sessionWindowOracleSql: String =
    s"""WITH e AS (SELECT user_id, event_id, value,
       |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
       |b AS (SELECT user_id, event_id, us, value,
       |  CASE WHEN lag(us) OVER w IS NULL
       |         OR us - lag(us) OVER w > ${SessionGapSeconds * 1000000L}
       |       THEN 1 ELSE 0 END AS brk
       |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |s AS (SELECT user_id, us, value,
       |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
       |FROM b)
       |SELECT user_id, min(us) AS start_us,
       |  max(us) + ${SessionGapSeconds * 1000000L} AS end_us,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, start_us""".stripMargin

  /** transformWithState running totals: update-mode latest (and the
    * drained state store's contents) == batch groupBy —
    * order-insensitive accumulators, TimeMode.None never evicts. */
  private val totalsOracleSql =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_clicks,
      |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
      |    AS value_micros,
      |  max(event_id) AS max_event_id
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  protected val streamingOracles: Map[String, String] = Map(
    // The partition-pruned streaming rollup must equal the raw-table
    // WHERE rollup — the same oracle the batch dual is checked against.
    "st_partition_prune" -> partitionPruneOracleSql,
    // transformWithState running totals: update-mode latest == batch
    // groupBy (order-insensitive accumulators)
    "st_transform_state" -> totalsOracleSql,
    // The statestore READ of the drained totals checkpoint must hold
    // exactly the batch aggregate (TimeMode.None never evicts): same
    // oracle, but the Spark side is RocksDB snapshot files, not query
    // emissions.
    "st_state_reader" -> totalsOracleSql,
    // Registered-timer read: a user's trailing session is open iff its
    // expiry (last event ms + gap·1000) is strictly above the final
    // watermark (global max event ms, delay 0 — fired timers satisfy
    // expiry ≤ watermark and are removed). The last session's end is
    // the user's max event time, so the open set needs no session
    // reconstruction — a first-principles check of the timer store.
    "st_state_timers" ->
      s"""WITH e AS (SELECT user_id,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |u AS (SELECT user_id, max(us) // 1000 AS end_ms FROM e
         |  GROUP BY user_id),
         |wm AS (SELECT max(us) // 1000 AS wm_ms FROM e)
         |SELECT user_id,
         |  CAST(end_ms + ${SessionGapSeconds * 1000L} AS BIGINT)
         |    AS expiry_ms
         |FROM u, wm WHERE end_ms + ${SessionGapSeconds * 1000L} > wm_ms
         |ORDER BY user_id""".stripMargin,
    // Identical to ev_hourly_rollup: the streaming plan must agree with
    // the batch aggregate bit-for-bit.
    "st_hourly_rollup" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // Graded like its batch dual — exact columns + literal TRUE (see
    // Events.approxRollupEval).
    "st_hourly_rollup_approx" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum,
        |  TRUE AS hll_ok
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // session_window semantics: window = [first event, last event + gap).
    "st_session_window" -> sessionWindowOracleSql,
    // The chained dedup→session query must land on the SAME sessions:
    // duplicates are delivery retries, so the batch composition is just
    // sessions over the unique events.
    "st_dedup_sessions" -> sessionWindowOracleSql,
    "st_stream_dedup" ->
      """SELECT event_id, user_id, event_type
        |FROM events ORDER BY event_id""".stripMargin,
    // Batch dual of the streaming corpus prep: the quality/langid
    // survivors, each exactly once.
    "st_corpus_prep" ->
      s"""WITH ${qualityLangCtesOver("documents", PipelineLang)}
         |SELECT doc_id, n_tokens FROM q ORDER BY doc_id""".stripMargin,
    // Drained streaming scoring == batch scoring, value-for-value.
    "st_quality_model" -> qualityModelOracleSql,
    // Identical to the batch sessionize oracle: custom streaming state
    // must agree with the window formulation bit-for-bit.
    "st_stateful_sessions" -> sessionizeOracleSql,
    // Timer-driven transformWithState sessionizer — the same oracle
    // again: three independent implementations (window SQL, GroupState,
    // event-time timers) must agree bit-for-bit.
    "st_tws_sessions" -> sessionizeOracleSql,
    // The streaming CDC run compression must equal the batch interval
    // build value-for-value once drained (sentinel-flushed).
    "st_scd2" -> scd2OracleSql,
    // The drained streaming snapshot must equal the batch struct-max.
    "st_latest_snapshot" -> latestSnapshotOracleSql,
    "st_snapshot_changelog" -> latestSnapshotOracleSql,
    // Batch dual of the streaming interval join: inclusive BETWEEN on
    // micros; (view_event_id, click_event_id) is a unique pair → total
    // order, inner join → no nulls.
    "st_stream_join" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |v AS (SELECT user_id, event_id AS view_event_id, us AS v_us
         |  FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id AS c_user_id,
         |  event_id AS click_event_id, us AS c_us
         |  FROM e WHERE event_type = 'click')
         |SELECT v.user_id, view_event_id, click_event_id, v_us, c_us
         |FROM v JOIN c ON v.user_id = c_user_id
         |  AND c_us >= v_us
         |  AND c_us <= v_us + ${StreamJoinWindowSeconds * 1000000L}
         |ORDER BY view_event_id, click_event_id""".stripMargin,
    // Batch full outer join FILTERED to what the streaming engine has
    // proven by end of drain: matched pairs always; an unmatched view
    // once the watermark passed its whole match window (v + W < wm);
    // an unmatched click once the watermark passed its time (clicks
    // only match older-or-equal views). wm = min of the two sides'
    // max event times minus the 1-hour delay — the engine's global
    // watermark after the final no-data batch.
    "st_outer_join" -> {
      val wUs = StreamJoinWindowSeconds * 1000000L
      // Shared with streamFullOuterJoin's default watermark delay — one
      // constant, so operator and oracle cannot desynchronize.
      val delayUs =
        graft.streaming.StreamOps.JoinWatermarkDelaySeconds * 1000000L
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |v AS (SELECT user_id, event_id AS view_event_id, us AS v_us
         |  FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id AS c_user_id,
         |  event_id AS click_event_id, us AS c_us
         |  FROM e WHERE event_type = 'click'),
         |wm AS (SELECT least((SELECT max(v_us) FROM v),
         |    (SELECT max(c_us) FROM c)) - $delayUs AS w),
         |j AS (SELECT * FROM v FULL OUTER JOIN c
         |  ON v.user_id = c.c_user_id
         |  AND c_us >= v_us AND c_us <= v_us + $wUs)
         |SELECT coalesce(j.user_id, j.c_user_id) AS user_id,
         |  coalesce(view_event_id, -1) AS view_event_id,
         |  coalesce(click_event_id, -1) AS click_event_id,
         |  coalesce(v_us, -1) AS v_us, coalesce(c_us, -1) AS c_us
         |FROM j, wm
         |WHERE (view_event_id IS NOT NULL AND click_event_id IS NOT NULL)
         |   OR (click_event_id IS NULL AND v_us + $wUs < wm.w)
         |   OR (view_event_id IS NULL AND c_us < wm.w)
         |ORDER BY user_id, view_event_id, click_event_id""".stripMargin
    },
    // Batch dual of the chained join→rollup: the inner range join,
    // then counts per (user, epoch-aligned click hour).
    "st_join_rollup" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |v AS (SELECT user_id, event_id AS view_event_id, us AS v_us
         |  FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id AS c_user_id,
         |  event_id AS click_event_id, us AS c_us
         |  FROM e WHERE event_type = 'click'),
         |j AS (SELECT v.user_id, c_us
         |  FROM v JOIN c ON v.user_id = c_user_id
         |    AND c_us >= v_us
         |    AND c_us <= v_us + ${StreamJoinWindowSeconds * 1000000L})
         |SELECT user_id,
         |  (c_us // 3600000000) * 3600000000 AS hour_us,
         |  count(*) AS n_pairs
         |FROM j GROUP BY 1, 2
         |ORDER BY user_id, hour_us""".stripMargin,
    // Batch dual of the streaming as-of enrichment: the SAME SCD2 CTE
    // chain as scd2OracleSql (re-derived here so the interval table and
    // the lookup live in one query), then events × intervals on the
    // containment predicate. Every event lands inside exactly one of
    // its user's intervals, so the inner join is lossless.
    "st_asof_enrich" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |b AS (SELECT user_id, event_id, event_type, us,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |         OR lag(event_type) OVER w <> event_type
        |       THEN 1 ELSE 0 END AS chg
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |r AS (SELECT user_id, event_type, us,
        |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |FROM b),
        |g AS (SELECT user_id, version, min(event_type) AS state,
        |  min(us) AS valid_from_us FROM r GROUP BY user_id, version),
        |dim AS (SELECT user_id, version, state, valid_from_us,
        |  coalesce(lead(valid_from_us)
        |             OVER (PARTITION BY user_id ORDER BY version),
        |           9223372036854775807) AS valid_to_us
        |FROM g)
        |SELECT ev.event_id, ev.user_id, ev.us, d.state, d.version
        |FROM e ev JOIN dim d ON ev.user_id = d.user_id
        |  AND ev.us >= d.valid_from_us AND ev.us < d.valid_to_us
        |ORDER BY ev.event_id""".stripMargin,
    "st_static_enrich" ->
      """WITH dim AS (SELECT user_id, count(*) AS user_events
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, d.user_events
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |ORDER BY event_id""".stripMargin
  )

}
