package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Events
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Ev

/** Stream/batch parity tests: the streaming plans must produce exactly
  * the rows their batch duals produce on the same data. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(us: Long) = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
  }

  private val H = 3600L * 1000000L
  // Positive base epoch: a ts at/below the engine's initial watermark
  // (epoch 0) would be dropped as late data.
  private val B = 1000000L * 1000000L
  private val rows = Seq(
    (1L, 1L, B, "view", 1.25),
    (2L, 1L, B + 10L * 1000000L, "view", 2.5),
    (3L, 2L, B + H / 2, "click", 0.75),
    (4L, 1L, B + H + 1L, "view", 4.0),
    (5L, 2L, B + 2 * H + 5L, "click", 1.0),
    (6L, 2L, B + 2 * H + 1900L * 1000000L, "view", 3.0))

  test("streaming hourly rollup == batch hourly rollup (MemoryStream)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val batch = eventsDf(rows)
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val q = StreamOps.hourlyRollupStream(streamDf)
      .writeStream.format("memory").queryName("st_spec_rollup")
      .outputMode(OutputMode.Complete).start()
    ms.addData(rows.take(3)); q.processAllAvailable()
    ms.addData(rows.drop(3)); q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_rollup")
      .orderBy("hour", "event_type").collect().toSeq
    val want = Events.hourlyRollup(batch)
      .orderBy("hour", "event_type").collect().toSeq
    assert(got.map(_.toSeq) == want.map(_.toSeq))
  }

  test("streaming approx rollup: exact counts, HLL users within bound") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val q = StreamOps.hourlyRollupApproxStream(streamDf)
      .writeStream.format("memory").queryName("st_spec_rollup_approx")
      .outputMode(OutputMode.Complete).start()
    ms.addData(rows.take(3)); q.processAllAvailable()
    ms.addData(rows.drop(3)); q.processAllAvailable()
    q.stop()
    val approx = spark.table("st_spec_rollup_approx")
      .select("hour", "event_type", "n_events", "n_users_approx",
        "value_micros")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val exact = Events.hourlyRollup(eventsDf(rows))
      .select("hour", "event_type", "n_events", "n_users", "value_micros")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (n, users, vm)) =>
      val (en, eu, evm) = exact(k)
      assert(n == en && vm == evm,
        s"non-distinct aggregates must be exact at $k")
      // same bar as the batch dual's EventsSpec bound (default rsd 5%)
      assert(math.abs(users - eu) <= math.max(1L, (eu * 0.05).toLong),
        s"HLL estimate $users too far from exact $eu at $k")
    }
  }

  test("transformWithState running totals accumulate ACROSS micro-" +
      "batches (ValueState survives the batch boundary; update-mode " +
      "last emission per key == batch groupBy)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[StreamOps.TotalsIn]
      val q = StreamOps.statefulUserTotals(ms.toDS())
        .toDF()
        .writeStream.format("memory").queryName("st_spec_tws")
        .outputMode(OutputMode.Update).start()
      // batch 1: user 1 twice, user 2 once
      ms.addData(
        StreamOps.TotalsIn(1L, "click", 100L, 10L),
        StreamOps.TotalsIn(1L, "view", 50L, 11L),
        StreamOps.TotalsIn(2L, "view", 30L, 12L))
      q.processAllAvailable()
      // batch 2: both users again — totals must CONTINUE, not restart
      ms.addData(
        StreamOps.TotalsIn(1L, "click", 25L, 13L),
        StreamOps.TotalsIn(2L, "click", 70L, 9L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("st_spec_tws")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("n_clicks"),
          col("value_micros"), col("max_event_id"))).as("m"))
        .select(col("user_id"), col("m.*"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(rows(1L) == ((3L, 2L, 175L, 13L)),
        s"user 1 must total across both batches: ${rows(1L)}")
      assert(rows(2L) == ((2L, 1L, 100L, 12L)),
        s"user 2 must total across both batches: ${rows(2L)}")
      // and the update-mode history really shows per-batch emissions
      // (2 for user 1, 2 for user 2 — one per batch it appeared in)
      val emissions = spark.table("st_spec_tws")
        .groupBy("user_id").count()
        .as[(Long, Long)].collect().toMap
      assert(emissions(1L) == 2 && emissions(2L) == 2)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState ListState + MapState: bounded recent-ids " +
      "list and per-type counts survive the batch boundary") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[StreamOps.TotalsIn]
      val q = StreamOpsSpecRecent(ms.toDS())
        .toDF()
        .writeStream.format("memory").queryName("st_spec_tws_lm")
        .outputMode(OutputMode.Update).start()
      ms.addData(
        StreamOps.TotalsIn(1L, "click", 0L, 10L),
        StreamOps.TotalsIn(1L, "view", 0L, 11L))
      q.processAllAvailable()
      ms.addData(
        StreamOps.TotalsIn(1L, "click", 0L, 12L),
        StreamOps.TotalsIn(1L, "view", 0L, 13L))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("st_spec_tws_lm")
        .orderBy(col("n_types_seen").desc, col("recent_ids").desc)
        .as[(Long, Seq[Long], Long, Long)].head()
      // ListState capped at 3 most recent ids, accumulated ACROSS
      // batches (11,12,13 — id 10 evicted); MapState counted 2 clicks
      // + 2 views = 2 distinct types, 4 events total
      assert(last._2 == Seq(11L, 12L, 13L), s"recent ids: ${last._2}")
      assert(last._3 == 2L, "distinct types via MapState")
      assert(last._4 == 4L, "total via MapState sum")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState event-time TIMER closes an idle session in a " +
      "LATER micro-batch (registerTimer/handleExpiredTimer across the " +
      "batch boundary)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val gap = 1800L
      val ms = MemoryStream[Ev]
      val q = StreamOps.timerSessionize(ms.toDS(), gap)
        .toDF()
        .writeStream.format("memory").queryName("st_spec_timer_sessions")
        .outputMode(OutputMode.Append).start()
      // batch 1: two events for user 1 inside the gap — session stays
      // open, timer armed at end+gap; nothing may emit yet
      ms.addData(Ev(1L, 1L, ts(B)), Ev(1L, 2L, ts(B + 10L * 1000000L)))
      q.processAllAvailable()
      assert(spark.table("st_spec_timer_sessions").isEmpty,
        "session emitted before any timer could have fired")
      // batch 2: a DIFFERENT user's event far past user 1's end+gap
      // advances the watermark; user 1's session must close via its
      // TIMER (no further user-1 input), in a later micro-batch —
      // processAllAvailable includes the no-data batch the engine runs
      // when watermark advancement expires timers
      ms.addData(Ev(9L, 3L, ts(B + 3 * H)))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("st_spec_timer_sessions")
        .as[StreamOps.SessionOut].collect().toSeq
      // exactly user 1's closed session; user 9's is still open (the
      // watermark never passed ITS end+gap)
      assert(got == Seq(StreamOps.SessionOut(1L, 1L, 2L, B,
        B + 10L * 1000000L, 10L * 1000000L)), s"got $got")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming corpus prep: filters drop, watermark dedup emits once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = 1000000L // positive epoch seconds: above initial watermark
    val good = "the of and to in is it you that was " * 2 // en, 20 tokens
    val docs = Seq(
      (1L, good),                       // passes, duplicated delivery
      (2L, "le la et les des du " * 4), // wrong language
      (3L, "a b"),                      // too short (< 5 tokens)
      (4L, good + "extra tail tokens")) // passes, single delivery
    val ms = MemoryStream[(Long, String, Long)]
    val streamDf = ms.toDF().toDF("doc_id", "text", "sec")
      .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
    val q = StreamOps.corpusPrepStream(streamDf, "en")
      .writeStream.format("memory").queryName("st_spec_corpus")
      .outputMode(OutputMode.Append).start()
    val rows1 = docs.map { case (id, t) => (id, t, base + id) }
    ms.addData(rows1); q.processAllAvailable()
    // at-least-once redelivery of doc 1 within the watermark window
    ms.addData(Seq((1L, good, base + 1L))); q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_corpus")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 20L), (4L, 23L)))
  }

  test("stateful sessionize == batch sessionize after timeout flush") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val gap = 1800L
    val ms = MemoryStream[Ev]
    val evs = rows.map { case (id, uid, us, _, _) => Ev(uid, id, ts(us)) }
    val out = StreamOps.statefulSessionize(ms.toDS(), gap)
    val q = out.writeStream.format("memory").queryName("st_spec_sessions")
      .outputMode(OutputMode.Append).start()
    ms.addData(evs)
    q.processAllAvailable()
    // A far-future sentinel advances the watermark past every session's
    // timeout so all sessions flush (the sentinel's own session stays
    // open — expected).
    ms.addData(Ev(99L, 999L, ts(B + 100L * H)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_sessions")
      .orderBy("user_id", "session_id")
      .collect().toSeq.map(_.toSeq)
    val want = Events.sessionize(eventsDf(rows), gap)
      .select("user_id", "session_id", "n_events", "start_us", "end_us",
        "duration_us")
      .orderBy("user_id", "session_id").collect().toSeq.map(_.toSeq)
    assert(got == want)
  }

  test("stateful scd2 == batch scd2 after sentinel flush; closed runs " +
       "emit incrementally") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[StreamOps.TypedEv]
    val evs = rows.map { case (id, uid, us, typ, _) =>
      StreamOps.TypedEv(uid, id, typ, ts(us)) }
    val out = StreamOps.statefulScd2(ms.toDS())
    val q = out.writeStream.format("memory").queryName("st_spec_scd2")
      .outputMode(OutputMode.Append).start()
    ms.addData(evs)
    q.processAllAvailable()
    // user 2's click→view change closed a run in-stream: it must be
    // visible BEFORE any flush sentinel arrives (incremental emission).
    val early = spark.table("st_spec_scd2")
      .as[StreamOps.ScdOut].collect()
    assert(early.exists(r => r.user_id == 2L && r.state == "click" &&
      r.valid_to_us != Long.MaxValue))
    // A far-future sentinel advances the watermark past the flush
    // horizon so every open run emits its "current" row.
    ms.addData(StreamOps.TypedEv(99L, 999L, "flush", ts(B + 100L * H)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_scd2")
      .where(col("user_id") =!= 99L)
      .orderBy("user_id", "version")
      .select("user_id", "version", "state", "valid_from_us", "n_events",
        "valid_to_us")
      .collect().toSeq.map(_.toSeq)
    val want = Events.scd2(eventsDf(rows))
      .orderBy("user_id", "version")
      .select("user_id", "version", "state", "valid_from_us", "n_events",
        "valid_to_us")
      .collect().toSeq.map(_.toSeq)
    assert(got == want)
  }

  test("streaming latest snapshot == batch latestSnapshot across " +
       "micro-batches (state folds incrementally)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val q = StreamOps.latestSnapshotStream(streamDf)
      .writeStream.format("memory").queryName("st_spec_latest")
      .outputMode(OutputMode.Complete).start()
    // deliver out of key-order across two batches: the per-key max must
    // fold the SECOND batch's older event away
    ms.addData(rows.take(4)); q.processAllAvailable()
    ms.addData(rows.drop(4)); q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_latest")
      .orderBy("user_id").collect().toSeq.map(_.toSeq)
    val want = Events.latestSnapshot(eventsDf(rows))
      .orderBy("user_id").collect().toSeq.map(_.toSeq)
    assert(got == want)
  }

  test("changelog snapshot sink: multi-batch struct-max merge is " +
       "order-insensitive; final generation == batch latestSnapshot") {
    import spark.implicits._
    val srcDir = graft.Scratch.dir("st_spec_changelog_src")
    val outDir = graft.Scratch.dir("st_spec_changelog_out")
    // two single-file deliveries — one holds the NEWER events, one the
    // older; with maxFilesPerTrigger=1 each is its own micro-batch, so
    // whichever order the file source picks, one batch is "late" and a
    // latest-batch-wins merge would regress a key's snapshot
    eventsDf(rows.filter(_._1 >= 4L)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    eventsDf(rows.filter(_._1 < 4L)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val src = spark.readStream.schema(eventsDf(rows).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .select("user_id", "event_id", "event_type", "ts")
    val got = StreamOps.runSnapshotChangelog(spark, src, outDir)
      .orderBy("user_id").collect().toSeq.map(_.toSeq)
    val gens = new java.io.File(outDir).list().count(_.startsWith("gen_"))
    assert(gens >= 2, s"expected one generation per micro-batch, got $gens")
    val want = Events.latestSnapshot(eventsDf(rows))
      .orderBy("user_id").collect().toSeq.map(_.toSeq)
    assert(got == want)
  }

  test("session_window agg matches gap-derived sessions (batch mode)") {
    val got = StreamOps.sessionWindowAgg(eventsDf(rows), 1800L)
      .orderBy("user_id", "start_us").collect().toSeq
    // user 1: events at B, B+10s (one session), B+H+1 (second session)
    // user 2: B+H/2; B+2H+5us; B+2H+1900s (1900s > gap → own session)
    assert(got.size == 5)
    val u1 = got.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
    assert(u1.head.getAs[Long]("start_us") == B)
    assert(u1.head.getAs[Long]("end_us") ==
      B + 10L * 1000000L + 1800L * 1000000L)
    // streaming run of the same session_window plan agrees
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val q = StreamOps.sessionWindowAgg(streamDf, 1800L)
      .writeStream.format("memory").queryName("st_spec_sw")
      .outputMode(OutputMode.Complete).start()
    ms.addData(rows); q.processAllAvailable(); q.stop()
    val streamed = spark.table("st_spec_sw")
      .orderBy("user_id", "start_us").collect().toSeq
    assert(streamed.map(_.toSeq) == got.map(_.toSeq))
  }

  test("chained dedup → session_window in ONE query: a duplicate " +
      "delivered in a LATER micro-batch is dropped; drained sessions " +
      "equal the batch composition") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val q = StreamOps.dedupThenSessionWindow(streamDf, 1800L)
      .writeStream.format("memory").queryName("st_spec_ds")
      .outputMode(OutputMode.Append).start()
    // batch 1: first three events
    ms.addData(rows.take(3)); q.processAllAvailable()
    // batch 2: the SAME three re-delivered (at-least-once retries, still
    // above the watermark so only dedup state can suppress them), the
    // remaining events, and a beyond-horizon sentinel that closes every
    // real session before the drain
    val sentinel =
      (99L, -1L, B + 3 * H + (1800L + 7200L) * 1000000L, "view", 0.0)
    ms.addData((rows.take(3) ++ rows.drop(3)) :+ sentinel)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_ds").where(col("user_id") >= 0)
      .orderBy("user_id", "start_us").collect().toSeq
    val want = StreamOps.sessionWindowAgg(eventsDf(rows), 1800L)
      .orderBy("user_id", "start_us").collect().toSeq
    assert(got.map(_.toSeq) == want.map(_.toSeq))
  }

  test("chained interval join → hourly rollup in ONE query: pairs " +
      "matched across micro-batches roll up; drained hours equal the " +
      "batch composition") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val q = StreamOps.intervalJoinThenHourly(
        streamDf.where(col("event_type") === "view"),
        streamDf.where(col("event_type") === "click"), 1800L)
      .writeStream.format("memory").queryName("st_spec_jr")
      .outputMode(OutputMode.Append).start()
    // attribution fixture: u1's clicks land 60 s / 120 s after its
    // view (two pairs, one hour bucket); u2's second click falls
    // OUTSIDE the 1800 s window (no pair); u3 clicks in a LATER hour
    // than its view (pair in the click's hour). `rows` has no
    // qualifying pairs at all, so this test builds its own.
    val pairRows = Seq(
      (1L, 1L, B, "view", 1.0),
      (2L, 1L, B + 60L * 1000000L, "click", 1.0),
      (3L, 1L, B + 120L * 1000000L, "click", 1.0),
      (4L, 2L, B + H, "view", 1.0),
      (5L, 2L, B + H + 2000L * 1000000L, "click", 1.0),
      (6L, 3L, B + 2 * H - 300L * 1000000L, "view", 1.0),
      (7L, 3L, B + 2 * H + 600L * 1000000L, "click", 1.0))
    // batch 1: the views; batch 2: the clicks (so every pair matches
    // ACROSS batches through join state) plus both-side sentinels that
    // push the watermark past all real windows
    ms.addData(pairRows.filter(_._4 == "view")); q.processAllAvailable()
    val sEnd = B + 3 * H + (1800L + 7200L) * 1000000L
    ms.addData(pairRows.filter(_._4 == "click") ++
      Seq((90L, -1L, sEnd, "view", 0.0), (91L, -1L, sEnd, "click", 0.0)))
    q.processAllAvailable()
    // a third DATA batch runs under the watermark the sentinels
    // advanced, so the closed windows emit synchronously —
    // processAllAvailable does not wait for Spark's asynchronous
    // no-data micro-batch (the registry query drains via
    // Trigger.AvailableNow, which does)
    ms.addData(Seq((92L, -1L, sEnd + H, "view", 0.0),
      (93L, -1L, sEnd + H, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_jr").where(col("user_id") >= 0)
      .orderBy("user_id", "hour_us").collect().toSeq
    // batch composition on the same rows
    val e = eventsDf(pairRows).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val v = e.where(col("event_type") === "view")
      .select(col("user_id"), col("us").as("v_us"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("us").as("c_us"))
    val want = v.join(c, v("user_id") === c("cu") &&
        col("c_us") >= col("v_us") &&
        col("c_us") <= col("v_us") + 1800L * 1000000L)
      .groupBy(col("user_id"),
        ((col("c_us") / (3600L * 1000000L)).cast("long") *
          (3600L * 1000000L)).as("hour_us"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id", "hour_us").collect().toSeq
    assert(got.nonEmpty && got.map(_.toSeq) == want.map(_.toSeq))
  }

  test("stream dedup suppresses dups, drops late ones, and purges state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val q = StreamOps.streamDedup(streamDf)
      .writeStream.format("memory").queryName("st_spec_dedup")
      .outputMode(OutputMode.Append).start()
    // Batch 1: two events plus an in-batch duplicate of event 1.
    ms.addData(Seq((1L, 1L, B, "view", 1.0), (1L, 1L, B, "view", 1.0),
      (2L, 2L, B + 1000000L, "click", 2.0)))
    q.processAllAvailable()
    // Batch 2: watermark is B+1s−1h (< B), so a replay of event 1 is not
    // late yet — dedup state must suppress it. Event 3, 10 h ahead,
    // advances the watermark for the next batch.
    ms.addData(Seq((1L, 1L, B, "view", 1.0),
      (3L, 3L, B + 10 * H, "view", 3.0)))
    q.processAllAvailable()
    // Batch 3: watermark is now B+9h. Events 1 and 2 (state expires at
    // ts+1h) are evicted; another replay of event 1 is dropped as LATE
    // data (ts < watermark), so eviction cannot cause re-emission.
    ms.addData(Seq((1L, 1L, B, "view", 1.0),
      (4L, 4L, B + 10 * H + 1000000L, "view", 4.0)))
    q.processAllAvailable()
    val stateRows = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators(0).numRowsTotal
    q.stop()
    val got = spark.table("st_spec_dedup").orderBy("event_id")
      .select("event_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L, 4L)) // each id exactly once, no re-emit
    // 4 distinct keys seen; unbounded dropDuplicates would hold 4 state
    // rows forever. WithinWatermark keeps only the 2 unexpired ones.
    assert(stateRows <= 2, s"state not purged: $stateRows rows")
  }

  test("stream-stream interval join: inclusive window, per-user pairing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val W = 60L // seconds
    val joinRows = Seq(
      (10L, 1L, B, "view", 0.0),
      (11L, 1L, B + W * 1000000L, "click", 0.0),        // exactly at bound: IN
      (12L, 1L, B + W * 1000000L + 1L, "click", 0.0),   // 1 us past: OUT
      (13L, 1L, B - 1L, "click", 0.0),                  // before the view: OUT
      (14L, 2L, B + 1000000L, "click", 0.0),            // other user: OUT
      (15L, 2L, B + 1000000L, "view", 0.0))             // pairs with 14
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val q = StreamOps.streamIntervalJoin(
        streamDf.where(col("event_type") === "view"),
        streamDf.where(col("event_type") === "click"), W)
      .writeStream.format("memory").queryName("st_spec_ivjoin")
      .outputMode(OutputMode.Append).start()
    ms.addData(joinRows.take(3)); q.processAllAvailable()
    ms.addData(joinRows.drop(3)); q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_ivjoin")
      .select("view_event_id", "click_event_id")
      .orderBy("view_event_id", "click_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 11L), (15L, 14L)))
  }

  test("file-stream rollup over the fixture == batch oracle shape") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamOps.runToCompletion(spark,
      Tables.loadStream(spark, dir, "events"),
      StreamOps.hourlyRollupStream)
      .orderBy("hour", "event_type").collect().toSeq
    val want = Events.hourlyRollup(Tables.load(spark, dir, "events"))
      .select("hour", "event_type", "n_events", "n_users", "value_micros",
        "value_sum")
      .orderBy("hour", "event_type").collect().toSeq
    assert(got.map(_.toSeq) == want.map(_.toSeq))
  }

  test("streaming keyed upsert: later batches overwrite overlapping keys") {
    import org.apache.spark.sql.DataFrame
    import graft.sources.{PagedJsonSource, PageFetcher}
    class OverlapApi extends PageFetcher {
      override def totalPages(): Int = 3
      override def fetchPage(page: Int): String = page match {
        case 1 => """{"rows": [{"k": "a", "v": 1}, {"k": "b", "v": 1}]}"""
        case 2 => """{"rows": [{"k": "b", "v": 2}, {"k": "c", "v": 2}]}"""
        case _ => """{"rows": [{"k": "a", "v": 3}]}"""
      }
    }
    PagedJsonSource.registerFetcher("overlap_api", new OverlapApi)
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_upsert").toString
    val stream = spark.readStream.format("graft.sources.PagedJsonSource")
      .option("fetcher", "overlap_api").option("maxPagesPerTrigger", 1)
      .load()
    val perBatch: DataFrame => DataFrame = b =>
      spark.read.json(b.select("body")
          .as(org.apache.spark.sql.Encoders.STRING))
        .select(explode(col("rows")).as("r"))
        .select(col("r.k").as("k"), col("r.v").as("v"))
    val fin = StreamOps.runUpsertToCompletion(spark, stream, perBatch,
      "k", out)
    val got = fin.select("k", "v", "src_batch").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a: batch 2 wins over batch 0; b: batch 1 wins; c: only batch 1
    assert(got == Map("a" -> ((3L, 2L)), "b" -> ((2L, 1L)),
      "c" -> ((2L, 1L))))
    // generation history is immutable: gen_0..gen_2 all present
    val gens = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith("gen_")).sorted.toSeq
    assert(gens == Seq("gen_0", "gen_1", "gen_2"))
  }

  test("streaming corpus card == batch card detail rows across " +
      "micro-batches (incremental merge)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Seq(
      ("sa", "en", "one two three four five"),  // keeps
      ("sa", "en", "!!!"),                       // fails the gate
      ("sa", "de", "a b c d e f g"),             // keeps
      ("sb", "en", "x y z w v"))                 // keeps
    val batch = docs.toDF("source", "lang", "text")
    val ms = MemoryStream[(String, String, String)]
    val q = StreamOps.corpusCardStream(
        ms.toDF().toDF("source", "lang", "text"))
      .writeStream.format("memory").queryName("st_spec_card")
      .outputMode(OutputMode.Complete).start()
    ms.addData(docs.take(2)); q.processAllAvailable()
    ms.addData(docs.drop(2)); q.processAllAvailable()
    q.stop()
    val got = spark.table("st_spec_card")
      .orderBy("source", "lang").collect().map(_.toSeq).toSeq
    val want = graft.operators.TrainPrep.corpusCard(batch)
      .where(col("gid") === 0)
      .drop("gid")
      .orderBy("source", "lang").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("checkpoint restart: a second run resumes from the persisted " +
      "offsets AND the restored dedup state suppresses cross-run " +
      "duplicates exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = graft.Scratch.dir("graft_ckpt_src")
    val ckpt = graft.Scratch.dir("graft_ckpt_state")
    val sink = graft.Scratch.dir("graft_ckpt_sink")
    def docs(ids: Range) = ids.map(i =>
        (i.toLong, s"doc $i", new java.sql.Timestamp(1700000000000L + i)))
      .toDF("doc_id", "text", "ts")
    val schema = docs(0 until 1).schema
    // The dedup delay is huge, so the watermark never passes ANY row:
    // a cross-run duplicate can only be dropped by the RESTORED state
    // store, never by late-arrival filtering — state recovery is the
    // thing proven, not offset bookkeeping alone.
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .withWatermark("ts", "100000 hours")
        .dropDuplicatesWithinWatermark("doc_id")
        .select("doc_id", "text")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    docs(0 until 50).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce() // run 1: docs 0..49
    docs(25 until 75).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce() // "restart": docs 25..74 arrive; 25..49 are dups
    val got = spark.read.parquet(sink).select("doc_id")
      .as[Long].collect().sorted
    assert(got.toSeq == (0L until 75L),
      s"each doc exactly once across restart; got ${got.length} rows")
  }

  test("transformWithState RESTART recovery: a timer armed before the " +
      "kill fires after resume, ValueState continues a session across " +
      "the boundary, and nothing double-emits") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val gap = 1800L
      val srcDir = graft.Scratch.dir("graft_tws_restart_src")
      val ckpt = graft.Scratch.dir("graft_tws_restart_ckpt")
      val sink = graft.Scratch.dir("graft_tws_restart_sink")
      def write(evs: Seq[Ev]): Unit =
        evs.toDS().coalesce(1).write.mode("append").parquet(srcDir)
      val schema = Seq.empty[Ev].toDS().schema
      // Each run is a REAL restart: a fresh query instance resuming
      // from the same RocksDB checkpoint, AvailableNow so it drains
      // and terminates (the kill) instead of staying resident.
      def runOnce(): Unit = {
        val q = StreamOps.timerSessionize(
            spark.readStream.schema(schema).parquet(srcDir).as[Ev], gap)
          .toDF()
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", sink)
          .outputMode("append").trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // Run 1: user 1 has two in-gap events (open session, timer armed
      // at end+gap); user 3 has one (open session). Run-1 watermark
      // tops out at B+10s < any end+gap, so NOTHING may emit — both
      // the sessions and the registered timers exist only in the
      // checkpointed state when the query terminates.
      write(Seq(Ev(1L, 1L, ts(B)), Ev(1L, 2L, ts(B + 10L * 1000000L)),
        Ev(3L, 6L, ts(B))))
      runOnce()
      assert(spark.read.parquet(sink).isEmpty,
        "a session emitted before any timer could have fired")
      // Run 2 (the resume): user 3 gets ONE more in-gap event — its
      // restored ValueState must CONTINUE the run-1 session (n=2,
      // start=B), not open a fresh one. User 9's far-future event
      // advances the watermark past both end+gap marks, so the no-data
      // batch must fire user 1's timer — REGISTERED BEFORE THE KILL,
      // with zero user-1 input this run — and user 3's re-armed one.
      write(Seq(Ev(3L, 7L, ts(B + 60L * 1000000L)),
        Ev(9L, 8L, ts(B + 3 * H))))
      runOnce()
      val got = spark.read.parquet(sink).as[StreamOps.SessionOut]
        .collect().sortBy(_.user_id).toSeq
      assert(got == Seq(
        StreamOps.SessionOut(1L, 1L, 2L, B, B + 10L * 1000000L,
          10L * 1000000L),
        StreamOps.SessionOut(3L, 1L, 2L, B, B + 60L * 1000000L,
          60L * 1000000L)),
        s"expected exactly user 1 (timer survived the restart) and " +
          s"user 3 (state survived the restart), once each; got $got")
      // Shared-oracle parity: the drained rows equal the BATCH
      // sessionizer over the union of both runs' events, restricted to
      // the sessions whose end+gap the final watermark passed (user
      // 9's stays open — expected). The restart boundary must be
      // semantically invisible.
      val all = Seq((1L, 1L, B, "view", 1.0),
        (2L, 1L, B + 10L * 1000000L, "view", 1.0),
        (6L, 3L, B, "view", 1.0),
        (7L, 3L, B + 60L * 1000000L, "view", 1.0),
        (8L, 9L, B + 3 * H, "view", 1.0))
      val want = Events.sessionize(eventsDf(all), gap)
        .where(col("user_id") =!= 9L)
        .select("user_id", "session_id", "n_events", "start_us",
          "end_us", "duration_us")
        .orderBy("user_id").collect().toSeq.map(_.toSeq)
      assert(got.map(o => Seq(o.user_id, o.session_id, o.n_events,
        o.start_us, o.end_us, o.duration_us)) == want,
        "drained restart result diverged from the batch sessionize oracle")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("st_state_timers: the timer read holds exactly ONE registered " +
      "timer per open key, equal to the in-Spark open-session " +
      "computation (last event ms + gap*1000 above the final watermark)") {
    val sf = "/root/testdata/sf0.001"
    val got = Registry.queries("st_state_timers")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._1).distinct.size == got.size,
      s"duplicate timers per key: $got")
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000").as("ms"))
    val wm = e.agg(max(col("ms"))).head().getLong(0)
    val gapMs = 1800L * 1000L
    val want = e.groupBy("user_id").agg(max(col("ms")).as("end_ms"))
      .where(col("end_ms") + gapMs > wm)
      .select(col("user_id"), (col("end_ms") + gapMs).as("expiry_ms"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"timer read $got != open-session set $want")
  }
}

/** Spec-only StatefulProcessor exercising the remaining state kinds of
  * the transformWithState handle: a ListState capped at the 3 most
  * recent event ids (get → append → trim → put) and a MapState of
  * per-type counts — per key, across micro-batches. Output per
  * emission: (user_id, recent_ids, n_types_seen, n_total). Top-level
  * class (not a test closure) so task serialization carries no
  * enclosing suite. */
object StreamOpsSpecRecent {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
    StatefulProcessor, TTLConfig, TimeMode, TimerValues}

  final case class Out(user_id: Long, recent_ids: Seq[Long],
                       n_types_seen: Long, n_total: Long)

  class Proc extends StatefulProcessor[Long, StreamOps.TotalsIn, Out] {
    @transient private var recent: ListState[Long] = _
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[Long]("recent",
        Encoders.scalaLong, TTLConfig.NONE)
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long,
        rows: Iterator[StreamOps.TotalsIn],
        timerValues: TimerValues): Iterator[Out] = {
      var ids = recent.get().toVector
      rows.foreach { r =>
        ids = (ids :+ r.event_id).takeRight(3)
        counts.updateValue(r.event_type,
          (if (counts.containsKey(r.event_type))
             counts.getValue(r.event_type) else 0L) + 1L)
      }
      recent.put(ids.toArray)
      val all = counts.iterator().toVector
      Iterator.single(Out(key, ids, all.size.toLong, all.map(_._2).sum))
    }
  }

  def apply(events: Dataset[StreamOps.TotalsIn]): Dataset[Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Update())
  }
}
