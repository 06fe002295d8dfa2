package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Streamish
import graft.streaming.Streaming

/** Streaming ≡ batch: every streaming transform, run to completion over the
  * static fixture, must produce exactly the batch battery's answer. The
  * fixture arrives as one micro-batch, so complete/update-mode memory sinks
  * hold the final state.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  // Stopping a streaming query can interrupt an in-flight (often no-data)
  // micro-batch; the killed tasks then log ERROR stack traces
  // (CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT, aborted v2 writes, broadcast
  // teardown) even though the test passed and the abort is the intended
  // effect of stop(). Suppress exactly those teardown loggers for the
  // duration of the stop so a green run's log carries no ERROR lines, and
  // restore them after — a real mid-run failure still surfaces as a test
  // failure (and as ERROR output, since the suppression brackets only the
  // deliberate stop).
  private val noisyStopLoggers = Seq(
    "org.apache.spark.broadcast.TorrentBroadcast",
    "org.apache.spark.util.Utils",
    "org.apache.spark.TaskContextImpl",
    "org.apache.spark.executor.Executor",
    "org.apache.spark.scheduler.TaskSetManager",
    "org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2Exec",
    "org.apache.spark.sql.execution.datasources.v2.DataWritingSparkTask",
    "org.apache.spark.sql.execution.streaming",
    "org.apache.spark.sql.execution.streaming.state")

  private def quietStop(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val prev = noisyStopLoggers.map(n => n -> LogManager.getLogger(n).getLevel)
    noisyStopLoggers.foreach(n => Configurator.setLevel(n, Level.OFF))
    try {
      q.stop()
      q.awaitTermination()
    } finally prev.foreach { case (n, l) => Configurator.setLevel(n, l) }
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    quietStop(q)
    spark.table(name)
  }

  test("streaming tumbling windows equal the batch ev_tumbling aggregate") {
    val got = runToMemory(
      Streaming.tumblingCounts(Streaming.eventsStream(spark, dir)),
      "t_tumbling", "complete")
      .orderBy("w_start", "event_type").collect().toSeq
    val want = Streamish.tumbling(spark, dir)
      .select("w_start", "event_type", "n", "sum_value")
      .orderBy("w_start", "event_type").collect().toSeq
    assert(got === want)
  }

  test("streaming trending counts + post-rank equal the batch ev_windowed_topk") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.row_number
    val counts = runToMemory(
      Streaming.trendingCounts(Streaming.eventsStream(spark, dir)),
      "t_trending", "complete")
    // the bounded post-pass the operator's contract prescribes: rank each
    // finalized window's ≤ |types| rows
    val rk = W.partitionBy("w_start")
      .orderBy(col("n").desc, col("sum_value").desc, col("event_type").asc)
    val got = counts.withColumn("rnk", row_number().over(rk))
      .filter(col("rnk") <= 2)
      .select("w_start", "rnk", "event_type", "n", "sum_value")
      .orderBy("w_start", "rnk").collect().toSeq
    val want = Streamish.windowedTopK(spark, dir)
      .orderBy("w_start", "rnk").collect().toSeq
    assert(got === want)
  }

  test("streaming session windows equal the batch lag+cumsum sessionization") {
    val got = runToMemory(
      Streaming.sessionCounts(Streaming.eventsStream(spark, dir)),
      "t_sessions", "complete")
      .orderBy("user_id", "session_start").collect().toSeq
    val want = Streamish.sessions(spark, dir)
      .select("user_id", "session_start", "n_events")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(got === want)
  }

  test("streaming chunk windows equal batch txt_chunk_windows (stateless generate)") {
    val got = runToMemory(
      graft.ops.TextOps.chunkWindowsOf(Streaming.documentsStream(spark, dir)),
      "t_chunks", "append")
      .orderBy("doc_id", "chunk_id").collect().toSeq
    val want = graft.ops.TextOps.chunkWindows(spark, dir).collect().toSeq
    assert(got === want)
  }

  test("incremental arrival: many micro-batches converge to the batch answer") {
    // Re-shard events into 4 time-ordered chunks written SEQUENTIALLY (so
    // file mtimes order them) and feed one file per micro-batch — in-order
    // arrival with intra-chunk disorder, the regime watermarks assume.
    // State must merge across batches to the same result one big batch
    // produces. (Feeding chunks out of order correctly DROPS old events:
    // that's the watermark contract, verified manually.)
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    val src = "/tmp/graft-stream-src"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val batchEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val chunked = batchEvents
      .withColumn("chunk", ntile(4).over(W.orderBy("ts")))
    (1 to 4).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100) // distinct mtimes -> deterministic arrival order
    }
    val stream = spark.readStream.schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    val gotTumbling = runToMemory(Streaming.tumblingCounts(stream), "t_inc_tumbling", "complete")
      .orderBy("w_start", "event_type").collect().toSeq
    val wantTumbling = Streamish.tumbling(spark, dir)
      .select("w_start", "event_type", "n", "sum_value")
      .orderBy("w_start", "event_type").collect().toSeq
    assert(gotTumbling === wantTumbling)

    val gotSessions = runToMemory(Streaming.sessionCounts(stream), "t_inc_sessions", "complete")
      .orderBy("user_id", "session_start").collect().toSeq
    val wantSessions = Streamish.sessions(spark, dir)
      .select("user_id", "session_start", "n_events")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(gotSessions === wantSessions) // sessions merged across micro-batches
  }

  test("flatMapGroupsWithState emits exactly the non-final closed sessions") {
    import spark.implicits._
    // Append mode: a user's LAST session never closes (stays in state), so
    // the emitted set must equal the batch sessions minus each user's final
    // one — asserted exactly.
    val got = runToMemory(
      Streaming.sessionsViaState(spark, Streaming.eventsStream(spark, dir)).toDF(),
      "t_closed", "append")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val all = Streamish.sessions(spark, dir)
      .select("user_id", "session_start", "n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect()
    val lastPerUser = all.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = all.filterNot { case (u, st, _) => lastPerUser(u) == st }.toSet
    assert(got === want)
  }

  test("streaming per-user transitions accumulate to the batch ev_markov counts") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    import spark.implicits._
    // 4 time-ordered micro-batches (the incremental-arrival regime): the
    // per-user LastEvent state must stitch transitions across batch
    // boundaries so the accumulated counts equal the batch lead() window's.
    val src = "/tmp/graft-stream-src-markov"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val batchEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val chunked = batchEvents
      .withColumn("chunk", ntile(4).over(W.orderBy("ts", "event_id")))
    (1 to 4).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val got = runToMemory(
      Streaming.transitionsViaState(spark, stream).toDF(), "t_markov", "append")
      .groupBy("cur_type", "next_type").count()
      .as[(String, String, Long)].collect().toSet
    val want = Streamish.markov(spark, dir)
      .select("cur_type", "next_type", "n")
      .as[(String, String, Long)].collect().toSet
    assert(got === want)
  }

  test("streaming CEP state machine accumulates to the batch ev_pattern counts") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    import spark.implicits._
    // The O(1)-state machine replayed over 4 time-ordered micro-batches
    // must count exactly what the batch regex counts — including runs and
    // matches that SPAN a batch boundary (views at the end of batch N,
    // purchase at the start of batch N+1), which is what the carried
    // BingeState is for.
    val src = "/tmp/graft-stream-src-binge"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val batchEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val chunked = batchEvents
      .withColumn("chunk", ntile(4).over(W.orderBy("ts", "event_id")))
    (1 to 4).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val got = runToMemory(
      Streaming.bingeMatchesViaState(spark, stream).toDF(), "t_binge", "append")
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toSet
    val want = Streamish.patternMatch(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture has no binge conversions — vacuous test")
    assert(got === want)
  }

  test("streaming absence timers resolve every view the watermark can judge") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{coalesce, lit, ntile, unix_micros, max => smax}
    import spark.implicits._
    // Emit-on-timeout CEP: chunk-replay the events and compare the per-view
    // verdicts against the batch frame. Views the final watermark leaves
    // unresolved (no purchase ever, deadline not yet passed) stay in state
    // — the open-session precedent — and are excluded from the truth side
    // EXACTLY (next_p_us IS NULL ∧ deadline ≥ watermark).
    val src = "/tmp/graft-stream-src-abandon"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val batchEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val chunked = batchEvents
      .withColumn("chunk", ntile(4).over(W.orderBy("ts", "event_id")))
    (1 to 4).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val got = runToMemory(
      Streaming.abandonViaTimers(spark, stream).toDF(), "t_abandon", "append")
      .as[(Long, Long, Boolean, Long)].collect().toSet
    // final watermark = max event time, ms-truncated (EventTimeStats is ms)
    val wmUs = batchEvents.agg(smax(unix_micros(col("ts"))))
      .as[Long].head() / 1000L * 1000L
    val verdicts = Streamish.abandonVerdictsOf(batchEvents)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("next_p_us"),
        col("conv"), coalesce(col("lag_us"), lit(0L)).as("lag_us"))
      .as[(Long, Long, Long, Option[Long], Boolean, Long)].collect()
    val want = verdicts.filterNot { case (_, _, tsUs, nextP, _, _) =>
      nextP.isEmpty && tsUs + Streamish.AbandonUs >= wmUs
    }.map { case (u, id, _, _, c, lag) => (u, id, c, lag) }.toSet
    assert(want.exists(_._3) && want.exists(!_._3),
      "fixture must contain both conversions and abandonments")
    assert(got === want)
  }

  test("streaming daily HLL sketches union to the batch weekly estimates") {
    import spark.implicits._
    // The sketch-store pattern: the stream maintains per-day register
    // arrays (never raw user ids); the weekly answer is a read-time union
    // over the sink. Register maxima are arrival-order-independent and
    // the union is exact, so the streamed-then-unioned estimate must
    // EQUAL the batch daily->weekly estimate, not just approximate it.
    val sink = runToMemory(
      Streaming.dailySketchesStreaming(spark, Streaming.eventsStream(spark, dir)),
      "t_hll_daily", "complete")
    val got = Streamish.weeklyEstimateOf(sink)
      .select(col("event_type"), col("week").cast("string"), col("n_approx"))
      .as[(String, String, Long)].collect().toSet
    val want = Streamish.weeklyEstimateOf(
        Streamish.dailySketchesOf(Tables.events(spark, dir)))
      .select(col("event_type"), col("week").cast("string"), col("n_approx"))
      .as[(String, String, Long)].collect().toSet
    assert(want.nonEmpty && got === want)
  }

  test("streamed daily user sketches answer the sliding-WAU stickiness at read time") {
    import spark.implicits._
    // The sketch-store pattern extended to SLIDING windows: the stream
    // maintains one fixed-size register row per day; the trailing-7-day
    // union — and therefore the whole ev_dau_stickiness output, tolerance
    // gate included — is computed at read time over the sink and must
    // EQUAL the batch build (register maxima are arrival-order-independent
    // and the union is exact).
    val sink = runToMemory(
      Streamish.dailyUserSketchesOf(Streaming.eventsStream(spark, dir)),
      "t_dau_daily", "complete")
    val got = Streamish.dauStickinessFrom(Tables.events(spark, dir), sink)
      .select(col("day").cast("string"), col("dau"), col("wau"),
        col("stickiness"), col("within_tol"))
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    val want = Streamish.dauStickiness(spark, dir)
      .select(col("day").cast("string"), col("dau"), col("wau"),
        col("stickiness"), col("within_tol"))
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(want.nonEmpty && got === want)
  }

  test("streamed per-user RFM profiles score to the batch segmentation at read time") {
    import spark.implicits._
    // Update-mode profile store: one bounded state row per user (last day,
    // count, integer-cents sum — all arrival-order-independent), quintile
    // cutoffs and scores computed at read time over the sink. Must EQUAL
    // the batch ev_rfm output exactly.
    val sink = runToMemory(
      Streamish.rfmBaseOf(Streaming.eventsStream(spark, dir)),
      "t_rfm_base", "complete")
    val got = Streamish.rfmFromBase(sink)
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    val want = Streamish.rfm(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(want.nonEmpty && got === want)
  }

  test("streamed per-user experiment profiles read out to the batch A/B verdict") {
    import spark.implicits._
    // Live experiment dashboard: update-mode state = one bounded row per
    // user (first-seen µs, first-purchase µs, revenue) — every merge
    // order-independent — with assignment, activation, and the pooled
    // z-test computed at read time over the sink. Must EQUAL the batch
    // ev_ab_test row exactly.
    val sink = runToMemory(
      Streamish.abBaseOf(Streaming.eventsStream(spark, dir)),
      "t_ab_base", "complete")
    val got = Streamish.abFromBase(sink)
      .as[(Long, Long, Long, Long, Double, Double, Double, Option[Double],
        Double, Double, Double, Boolean)].collect().toSeq
    val want = Streamish.abTest(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Double, Option[Double],
        Double, Double, Double, Boolean)].collect().toSeq
    assert(want.nonEmpty && got === want)
    // the SAME profile store serves the power/MDE readout (ev_power_analysis)
    val gotPower = Streamish.powerFromBase(sink)
      .as[(Long, Long, Double, Double, Option[Double], Double, Boolean,
        Option[Long])].collect().toSeq
    val wantPower = Streamish.powerAnalysis(spark, dir)
      .as[(Long, Long, Double, Double, Option[Double], Double, Boolean,
        Option[Long])].collect().toSeq
    assert(wantPower.nonEmpty && gotPower === wantPower)
  }

  test("streamed materialized view equals the batch snapshot∪delta merge, sketch estimate included") {
    import spark.implicits._
    // Live MV maintenance: arriving orders fold into one update-mode state
    // row per (nation, month) — counts/sums/maxes/HLL registers are all
    // order-independent merges, so the one-pass streamed state must EQUAL
    // the batch snapshot∪delta refresh exactly, including the sketch
    // estimate (same registers → same estimate, not merely within_tol).
    val sink = runToMemory(
      Streaming.mvViewStreaming(Streaming.ordersStream(spark, dir),
        Tables.customer(spark, dir), Tables.nation(spark, dir)),
      "t_mv_view", "complete")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("n_name"), col("month").cast("string").as("month"),
        col("n_orders"), col("revenue_cents"), col("max_cents"),
        col("n_cust_approx").cast("long").as("n_cust_approx"))
      .orderBy("n_name", "month")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val got = norm(sink)
    val want = norm(graft.ops.Relational.mvMergedOf(Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir)))
    assert(want.nonEmpty && got === want)
  }

  test("streaming histogram against the batch bucket layout is bit-identical") {
    import spark.implicits._
    // Fixed-layout maintenance: bounds come from a batch ANALYZE snapshot,
    // the stream updates ≤ HistBuckets accumulator rows. With the same
    // (cmin, cmax) the streamed accumulators must EQUAL the batch build —
    // counts, observed extremes, and exact sums.
    val li = Tables.lineitem(spark, dir)
    val (cmin, cmax) = li
      .select(org.apache.spark.sql.functions.expr(
        "cast(round(l_extendedprice * 100, 0) as bigint)").as("c"))
      .agg(org.apache.spark.sql.functions.min("c"),
        org.apache.spark.sql.functions.max("c"))
      .as[(Long, Long)].head()
    val got = runToMemory(
      Streaming.histogramStreaming(Streaming.lineitemStream(spark, dir), cmin, cmax),
      "t_hist", "complete")
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val want = graft.ops.Relational.histogramOf(li)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(want.nonEmpty && got === want)
  }

  test("stateless blocklist serving equals the batch gate") {
    import spark.implicits._
    val got = runToMemory(
      Streaming.blocklistStreaming(Streaming.documentsStream(spark, dir)),
      "t_blocklist", "append")
      .orderBy("doc_id")
      .as[(Long, Int, Long, Double, Boolean)].collect().toSeq
    val want = graft.ops.TextOps.blocklist(spark, dir)
      .as[(Long, Int, Long, Double, Boolean)].collect().toSeq
    assert(want.nonEmpty && got === want)
    assert(want.exists(_._5) && want.exists(!_._5), "gate must split the corpus")
  }

  test("CEP machine step == greedy regex scan on random sequences (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // The pure-machine half of the twin's equivalence claim, checked
    // exhaustively-ish: fold bingeStep over ANY type sequence and the
    // match count must equal the batch regex's non-overlapping scan of
    // the same '>'-framed sequence. (The Spark-replay test above covers
    // the stateful/batch-boundary half on real data.)
    val types = Gen.oneOf("view", "purchase", "click", "signup", "error")
    val seqs = Gen.listOf(types)
    val re = Streamish.PatternRe.r
    val prop = forAll(seqs) { ts: List[String] =>
      val viaMachine = ts.foldLeft((graft.streaming.BingeState(0, 0L), 0)) {
        case ((st, n), t) =>
          val (next, matched) = Streaming.bingeStep(st, t)
          (next, if (matched) n + 1 else n)
      }._2
      val framed = if (ts.isEmpty) ">" else ts.mkString(">", ">", ">")
      viaMachine == re.findAllIn(framed).length
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(r.passed, r.status.toString)
  }

  test("streaming dedup keeps exactly one document per batch dd_exact fingerprint") {
    // Which doc_id survives per fingerprint is arrival-order-dependent (the
    // batch picks min doc_id; the stream picks first-processed), so the pin
    // is on the fingerprint set: one survivor per fp, and the same fp set
    // the batch dedup keeps.
    val got = runToMemory(
      Streaming.dedupByFingerprint(Streaming.documentsStream(spark, dir)),
      "t_dedup", "append")
      .select("fp").collect().map(r => Option(r.getString(0))).toSeq
    assert(got.size === got.distinct.size, "a fingerprint was emitted twice")
    val want = graft.ops.Dedup.exactDedup(spark, dir)
      .select("fp").collect().map(r => Option(r.getString(0))).toSet
    assert(got.toSet === want)
  }

  test("streaming incremental dedup emits exactly the batch dd_incremental 'new' docs") {
    import spark.implicits._
    // Which batch doc survives per fingerprint is arrival-order-dependent,
    // so pin the fingerprint set (incl. the NULL-fp survivor), which must
    // equal the batch operator's status='new' set exactly.
    val got = runToMemory(
      Streaming.incrementalNewDocs(spark, dir, Streaming.documentsStream(spark, dir)),
      "t_dd_incr", "append")
      .select("fp").collect().map(r => Option(r.getString(0))).toSeq
    assert(got.size === got.distinct.size, "a fingerprint was emitted twice")
    val want = graft.ops.Dedup.incrementalDedup(spark, dir)
      .filter(col("status") === "new")
      .select("fp").collect().map(r => Option(r.getString(0))).toSet
    assert(got.toSet === want)
  }

  test("streaming dedup drops duplicates arriving in later micro-batches") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    val src = "/tmp/graft-dedup-src"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // chunked by doc_id so arrival time (synthesized from doc_id) advances
    // monotonically across micro-batches — duplicates landing in a LATER
    // batch must hit existing state and be dropped
    val chunked = docs.withColumn("chunk", ntile(4).over(W.orderBy("doc_id")))
    (1 to 4).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val got = runToMemory(Streaming.dedupByFingerprint(stream), "t_dedup_inc", "append")
      .select("fp").collect().map(r => Option(r.getString(0))).toSeq
    assert(got.size === got.distinct.size, "a cross-batch duplicate survived")
    val want = graft.ops.Dedup.exactDedup(spark, dir)
      .select("fp").collect().map(r => Option(r.getString(0))).toSet
    assert(got.toSet === want)
  }

  test("watermarked stream-stream join equals the batch interval self-join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val got = runToMemory(
      Streaming.clickPurchaseJoin(Streaming.eventsStream(spark, dir)),
      "t_ssjoin", "append")
      .select("purchase_id", "click_id").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length, "a pair was emitted twice")
    val ev = Tables.events(spark, dir)
    val want = ev.filter(col("event_type") === "purchase").as("p")
      .join(ev.filter(col("event_type") === "click").as("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c.ts") <= col("p.ts") &&
          col("c.ts") >= col("p.ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p.event_id"), col("c.event_id"))
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got.toSet === want)
  }

  test("stream-static enrichment join equals the batch dimension join") {
    import spark.implicits._
    val got = runToMemory(
      Streaming.enrichedPurchases(spark, dir, Streaming.eventsStream(spark, dir)),
      "t_enrich", "append")
      .select("event_id", "user_id", "c_mktsegment", "nation")
      .as[(Long, Long, Option[String], Option[String])].collect().toSet
    val dim = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_name").as("nation"))
    val want = Tables.events(spark, dir).filter(col("event_type") === "purchase")
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .select("event_id", "user_id", "c_mktsegment", "nation")
      .as[(Long, Long, Option[String], Option[String])].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
    // the dimension actually enriched something (join keys overlap)
    assert(got.exists(_._3.isDefined))
  }

  test("streaming first-seen (user, type) pairs reproduce the batch ev_lift exactly") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    import spark.implicits._
    // 3 micro-batches: the per-user SeenTypes state must emit each pair
    // exactly once even when a user's repeat types span batch boundaries.
    val src = "/tmp/graft-stream-src-lift"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val batchEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val chunked = batchEvents
      .withColumn("chunk", ntile(3).over(W.orderBy("ts", "event_id")))
    (1 to 3).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val pairs = runToMemory(
      Streaming.firstSeenPairsViaState(spark, stream).toDF(), "t_lift", "append")
    val got = pairs.as[(Long, String)].collect().toSeq
    assert(got.size === got.distinct.size, "a pair was emitted twice")
    val want = Tables.events(spark, dir)
      .select("user_id", "event_type").distinct()
      .as[(Long, String)].collect().toSet
    assert(got.toSet === want)
    // the emitted pair stream drives the SAME lift computation bit-for-bit
    val streamLift = graft.ops.Streamish.liftOf(pairs)
      .collect().map(_.toSeq).toSeq
    val batchLift = graft.ops.Streamish.lift(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamLift === batchLift)
  }

  test("streaming shard assignment accumulates to the batch mm_shard_manifest") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    import spark.implicits._
    // 3 doc_id-ordered micro-batches (the chunked-ingest regime): the
    // per-lane running-byte state must keep filling the shard a previous
    // batch left open
    val src = "/tmp/graft-stream-src-shards"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val docs = Tables.documents(spark, dir)
    val chunked = docs.withColumn("chunk", ntile(3).over(W.orderBy("doc_id")))
    (1 to 3).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val assigns = runToMemory(
      Streaming.shardAssignViaState(spark, stream).toDF(), "t_shards", "append")
    val fn = org.apache.spark.sql.functions
    val got = assigns.groupBy("media_type", "sub", "shard_seq")
      .agg(fn.count(fn.lit(1)).as("n_assets"), fn.sum("n_bytes").as("shard_bytes"),
        fn.min("doc_id").as("first_doc"), fn.max("doc_id").as("last_doc"))
      .orderBy("media_type", "sub", "shard_seq").collect().toSeq
    val want = graft.ops.Multimodal.shardManifest(spark, dir)
      .orderBy("media_type", "sub", "shard_seq").collect().toSeq
    assert(got === want)
    // chunked (doc_id-ordered) ingest satisfies the per-lane ordering
    // contract, so no row may carry the violation flag
    assert(assigns.filter(!col("in_order")).count() === 0)
  }

  test("streaming classifier scoring equals the batch txt_classifier_score margins") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    // train once batch-side (the deployable 1-row scorer artifact), then
    // serve the corpus as 3 micro-batches — the stateless per-row fold must
    // reproduce the batch margins exactly under ANY chunking, including a
    // doc whose text contributes no features (bias-only score)
    val src = "/tmp/graft-stream-src-clf"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val docs = Tables.documents(spark, dir)
    val scorer = graft.ops.TextOps.trainedScorerOf(docs)
    val chunked = docs.withColumn("chunk", ntile(3).over(W.orderBy("doc_id")))
    (1 to 3).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val got = runToMemory(
      Streaming.scoredDocsStreaming(stream, scorer), "t_clf_score", "append")
      .orderBy("doc_id").collect().toSeq
    val batch = graft.ops.TextOps.classifierScoreOf(docs)
    val want = batch.select("doc_id", "score", "pred")
      .orderBy("doc_id").collect().toSeq
    assert(got === want)
    scorer.unpersist(); batch.unpersist()
  }

  test("streaming phash keep-list converges to the batch mm_phash_dedup") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    // 3 micro-batches in doc_id order: the per-signature (min doc, count)
    // state must keep accumulating groups that straddle batch boundaries
    val src = "/tmp/graft-stream-src-phash"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val docs = Tables.documents(spark, dir)
    val chunked = docs.withColumn("chunk", ntile(3).over(W.orderBy("doc_id")))
    (1 to 3).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val keeps = runToMemory(
      Streaming.phashKeepViaState(spark, stream).toDF(), "t_phash_keep", "append")
    val fn = org.apache.spark.sql.functions
    // n_merged is strictly monotone per sig — a group's latest emission is
    // its max-n_merged row; compose the sub-floor singletons back (they
    // never enter state) and the live keep-list must BE the batch terminal
    val latest = keeps.groupBy("sig")
      .agg(fn.max(fn.struct(col("n_merged"), col("doc_id"))).as("m"))
      .select(col("m.doc_id").as("doc_id"), col("m.n_merged").as("n_merged"))
    val singles = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(fn.length(col("payload")) < graft.ops.Multimodal.PhashMinBytes)
      .select(col("doc_id"), fn.lit(1L).as("n_merged"))
    val got = latest.unionByName(singles).orderBy("doc_id").collect().toSeq
    val want = graft.ops.Multimodal.phashDedup(spark, dir).collect().toSeq
    assert(got === want)
  }

  test("stateful streaming survives a restart: checkpointed phash state resumes exactly") {
    import spark.implicits._
    // The durability half of the streaming story: kill the query between
    // micro-batches, restart from the CHECKPOINT, and the per-signature
    // counts must resume from persisted state — not re-derive from zero.
    // Constructed corpus: two signature groups (identical text => identical
    // aHash sig), group membership straddling the restart.
    val src = "/tmp/graft-stream-src-phash-rec"
    val ckpt = "/tmp/graft-stream-ckpt-phash-rec"
    val out = "/tmp/graft-stream-out-phash-rec"
    Seq(src, ckpt, out).foreach(p =>
      new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively())
    val g1 = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val g2 = (1 to 40).map(i => s"beta$i").mkString(" ")
    def chunk(rows: (Long, String)*): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    // the memory sink is NOT fault-tolerant (recovery unsupported) — the
    // durable restart path requires a file sink, which is also what a real
    // pipeline writes
    def start() = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING"))
        .option("maxFilesPerTrigger", 1).parquet(src)
      Streaming.phashKeepViaState(spark, stream).toDF()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def emissions() = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "sig BIGINT, doc_id BIGINT, n_merged BIGINT"))
      .parquet(out).as[(Long, Long, Long)].collect().toSeq
    chunk(1L -> g1, 2L -> g2)
    Thread.sleep(50)
    chunk(3L -> g1)
    val q1 = start()
    q1.processAllAvailable()
    quietStop(q1) // the "crash": state lives only in the checkpoint now
    val before = emissions() // (sig, doc_id, n_merged)
    chunk(5L -> g1, 6L -> g2)
    val q2 = start()
    q2.processAllAvailable()
    quietStop(q2)
    val all = emissions()
    val after = all.diff(before)
    // latest (= max n_merged) emission per sig across BOTH runs = the
    // recovered keep-list: g1 docs 1,3,5 -> canonical 1, count 3; g2 docs
    // 2,6 -> canonical 2, count 2. A restart that lost state would re-emit
    // g1 at n_merged 1.
    val latest = all.groupBy(_._1).values
      .map(_.maxBy(_._3)).map(r => (r._2, r._3)).toSeq.sorted
    assert(latest === Seq((1L, 3L), (2L, 2L)))
    // and the post-restart emissions alone prove the state carried: the
    // chunk-3 group update must COUNT the pre-crash members
    assert(after.filter(_._2 == 1L).map(_._3).max === 3L)
  }

  test("streaming ingest classification equals the batch dd_neardup_ingest") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.ntile
    // snapshot = even docs (static side); the odd docs ARRIVE as a stream in
    // doc_id order across 3 micro-batches — dup_batch rank state must carry
    // across batch boundaries, near/corpus verdicts are stream-static
    val src = "/tmp/graft-stream-src-ingest"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val docs = Tables.documents(spark, dir)
    val batchDocs = docs.filter(col("doc_id") % 2 === 1)
    val chunked = batchDocs.withColumn("chunk", ntile(3).over(W.orderBy("doc_id")))
    (1 to 3).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val got = runToMemory(
      Streaming.ingestClassifyViaBands(spark, stream,
        docs.filter(col("doc_id") % 2 === 0)).toDF(),
      "t_ingest", "append")
      .orderBy("doc_id").collect().toSeq
    val want = graft.ops.Dedup.neardupIngestOf(docs)
      .select("doc_id", "status").orderBy("doc_id").collect().toSeq
    assert(got === want)
  }

  test("shard assignment flags an out-of-order arrival instead of diverging silently") {
    import spark.implicits._
    // pick two docs from the SAME lane, deliver the larger doc_id first and
    // the smaller in a later micro-batch — a contract violation that must
    // surface as in_order=false on the late row (and only there)
    val src = "/tmp/graft-stream-src-shards-ooo"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val lanes = graft.ops.Multimodal.assetLanes(Tables.documents(spark, dir))
      .select("media_type", "sub", "doc_id")
      .as[(String, Long, Long)].collect()
    val (lo, hi) = lanes.groupBy(r => (r._1, r._2)).values
      .find(_.length >= 2)
      .map { g => val ids = g.map(_._3).sorted; (ids.head, ids.last) }
      .getOrElse(fail("fixture has no lane with two assets"))
    val mk = (id: Long) =>
      Tables.documents(spark, dir).filter(col("doc_id") === id)
    mk(hi).coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    mk(lo).coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(Tables.documents(spark, dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val assigns = runToMemory(
      Streaming.shardAssignViaState(spark, stream).toDF(), "t_shards_ooo", "append")
    val flags = assigns.select("doc_id", "in_order")
      .as[(Long, Boolean)].collect().toMap
    assert(flags(hi), "first arrival can never be out of order")
    assert(!flags(lo), "late smaller doc_id in the same lane must be flagged")
  }

  test("streaming upsert audit accumulates to the batch q_upsert actions, exactly-once") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    // the SAME deterministic changes feed as batch q_upsert, delivered in 3
    // doc-ordered micro-batches, then chunk 2 RE-DELIVERED (at-least-once
    // source behavior) — the state gate must keep the audit exactly-once
    val src = "/tmp/graft-stream-src-upsert"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val base = Tables.orders(spark, dir)
    val changes = graft.ops.Relational.upsertChanges(base)
      .withColumn("chunk", ntile(3).over(W.orderBy("c_key")))
    (1 to 3).foreach { i =>
      changes.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    changes.filter(col("chunk") === 2).drop("chunk")
      .coalesce(1).write.mode("append").parquet(src) // duplicate delivery
    val stream = spark.readStream
      .schema(changes.drop("chunk").schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val audit = runToMemory(
      Streaming.upsertAuditViaState(spark, stream, base).toDF(), "t_upsert", "append")
    // exactly-once: every changed key audited once despite the re-delivery
    assert(audit.count() === graft.ops.Relational.upsertChanges(base).count())
    // accumulate the streamed update/insert actions (exact decimal sums)
    // and derive keep as the batch operator's complement over base
    val d4 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 4))
    val streamed = audit.groupBy("action")
      .agg(count(lit(1)).as("n_rows"),
        sum(d4(col("o_totalprice"))).as("tp"), sum(d4(col("prev_price"))).as("pp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2), r.getDecimal(3)))
      .toMap
    val Row2 = base.agg(count(lit(1)), sum(d4(col("o_totalprice")))).head
    val (nBase, tpBase) = (Row2.getLong(0), Row2.getDecimal(1))
    val got = Seq(
      ("insert", streamed("insert")._1, streamed("insert")._2.doubleValue),
      ("keep", nBase - streamed("update")._1,
        tpBase.subtract(streamed("update")._3).doubleValue),
      ("update", streamed("update")._1, streamed("update")._2.doubleValue))
    val want = graft.ops.Relational.upsert(spark, dir)
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got === want)
  }

  test("streaming trigram novelty accumulates to the batch txt_ngram_novelty") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val src = "/tmp/graft-stream-src-novelty"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val docs = Tables.documents(spark, dir)
    val chunked = docs.withColumn("chunk", ntile(3).over(W.orderBy("doc_id")))
    (1 to 3).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val verdicts = runToMemory(
      Streaming.noveltyViaState(spark, stream).toDF(), "t_novelty", "append")
    val got = docs.select("doc_id")
      .join(verdicts.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tri_distinct"),
          sum(when(col("novel"), 1L).otherwise(0L)).as("n_novel")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tri_distinct"), lit(0L)).cast("int").as("n_tri_distinct"),
        coalesce(col("n_novel"), lit(0L)).cast("int").as("n_novel"),
        when(coalesce(col("n_tri_distinct"), lit(0L)) === 0,
          lit(null).cast("double"))
          .otherwise(round(col("n_novel").cast("double") / col("n_tri_distinct"), 6))
          .as("novelty"))
      .orderBy("doc_id").collect().toSeq
    val want = graft.ops.TextOps.ngramNovelty(spark, dir).collect().toSeq
    assert(got === want)
  }

  test("streaming per-source top-k cap accumulates to the batch txt_domain_cap") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 3 doc_id-ordered micro-batches: a doc admitted in an early batch must
    // be EVICTED when a later batch lands a higher-quality one — the final
    // (max-seq) emission per source is the accumulated keep-list and must
    // equal the batch operator exactly.
    val src = "/tmp/graft-stream-src-domaincap"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val docs = Tables.documents(spark, dir)
    val chunked = docs.withColumn("chunk", ntile(3).over(W.orderBy("doc_id")))
    (1 to 3).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val keeps = runToMemory(
      Streaming.domainCapViaState(spark, stream).toDF(), "t_domaincap", "update")
    // rows at each source's max seq are its final keep-list
    val latest = keeps
      .withColumn("max_seq", max("seq").over(W.partitionBy("source")))
      .filter(col("seq") === col("max_seq"))
    val got = latest.select("source", "rnk", "doc_id", "quality")
      .as[(String, Int, Long, Double)].collect().toSeq.sorted
    val want = graft.ops.TextOps.domainCap(spark, dir)
      .as[(String, Int, Long, Double)].collect().toSeq.sorted
    assert(got === want)
    // bounded-state contract: no source ever emits more than cap rows per seq
    val maxPerEmit = keeps.groupBy("source", "seq").count()
      .agg(max("count")).head.getLong(0)
    assert(maxPerEmit <= graft.ops.TextOps.DomainCap)
  }

  test("streaming window-match state + island epilogue accumulates to the batch dd_substring") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 3 micro-batches: matches between docs in DIFFERENT batches must come
    // from state (new x old), and a digest crossing the occurrence cap in a
    // LATE batch must retract matches already emitted in earlier ones. The
    // natural fixture never crosses DfCap, so plant cap+1 docs sharing one
    // 20-token window; hash-ordered chunking spreads them across batches so
    // early batches emit matches of that digest before the cap poisons it.
    val src = "/tmp/graft-stream-src-substring"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val ptext = (0 until graft.ops.Dedup.subWindowK).map(i => s"zzpois$i").mkString(" ")
    val poison = spark.range(graft.ops.Dedup.subDfCap + 1).select(
      (col("id") + 1000000L).as("doc_id"), lit(ptext).as("text"),
      lit("xx").as("lang"), lit("poison").as("source"),
      lit(ptext.length.toLong).as("n_chars"))
    val docs = Tables.documents(spark, dir).unionByName(poison)
    val chunked = docs.withColumn("chunk",
      ntile(3).over(W.orderBy(md5(col("doc_id").cast("string")))))
    (1 to 3).foreach { i =>
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val emitted = runToMemory(
      Streaming.substringMatchesViaState(spark, stream).toDF(),
      "t_substring", "append")
    // Collect locally (small fixture) to apply tombstone retraction without
    // self-joining the memory sink, whose reused attributes conflict.
    val rows = emitted
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    val poisonedWh = rows.filter(_._6).map(_._1).toSet
    assert(poisonedWh.nonEmpty, "fixture must cross the occurrence cap")
    val matches = rows
      .filter(r => !r._6 && !poisonedWh(r._1))
      .map(r => (r._2, r._3, r._4, r._5))
      .toDF("doc_a", "doc_b", "pa", "pb")
    val got = graft.ops.Dedup.substringIslandsOf(matches)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val want = graft.ops.Dedup.substringDedupOf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(want.nonEmpty, "fixture must contain shared runs")
    assert(got === want)
  }

  // ProcessingTimeTimeout makes the engine run no-data micro-batches
  // continuously (the state operator always wants another batch to re-check
  // timeout deadlines), so processAllAvailable never quiesces on a TTL
  // query. The TTL tests therefore poll the memory sink for an expected
  // condition under a deadline instead.
  private def runUntil(df: DataFrame, name: String, mode: String,
      timeoutSec: Int = 120)(done: DataFrame => Boolean): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    try {
      while (!done(spark.table(name)) && System.nanoTime() < deadline)
        Thread.sleep(250)
      assert(done(spark.table(name)),
        s"$name did not reach the expected output within $timeoutSec s")
    } finally quietStop(q)
    spark.table(name)
  }

  test("TTL novelty: wide horizon reproduces the unbounded twin exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // inside the horizon (TTL >> replay duration) the bounded variant must
    // be bit-for-bit the unbounded one — 3 micro-batches with overlapping
    // trigrams across batches
    val src = "/tmp/graft-stream-src-novelty-ttl"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val batches = Seq(
      Seq((1L, "a b c d"), (2L, "a b c")),           // doc 1 first carrier
      Seq((3L, "b c d e"), (4L, "x y z")),           // mixed old/new trigrams
      Seq((5L, "x y z w"), (6L, "a b c d e")))       // all repeats + one new
    batches.foreach { b =>
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val schema = batches.head.toDF("doc_id", "text").schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val want = runToMemory(
      Streaming.noveltyViaState(spark, stream()).toDF(), "t_nov_ttl_ref", "append")
      .as[(Long, Boolean)].collect().toSet
    assert(want.nonEmpty)
    val got = runUntil(
      Streaming.noveltyViaStateTtl(spark, stream(), ttlMs = 10 * 60 * 1000L).toDF(),
      "t_nov_ttl_wide", "append")(t => t.count() >= want.size)
      .as[(Long, Boolean)].collect().toSet
    assert(got === want)
  }

  test("TTL novelty: expired trigrams are forgotten — state bounded, re-arrival novel again") {
    import spark.implicits._
    // Three micro-batches with a 1 ms TTL (batch overhead >> 1 ms, so every
    // key expires between batches): batch 2 carries only an unrelated
    // trigram, whose batch sweeps batch 1's expired key; batch 3
    // re-introduces batch 1's trigram and must be scored novel AGAIN —
    // the documented over-report-past-the-horizon semantics. State after
    // the sweep holds only live keys, not every trigram ever seen.
    val src = "/tmp/graft-stream-src-novelty-exp"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val batches = Seq(
      Seq((1L, "alpha beta gamma")),
      Seq((2L, "delta epsilon zeta")),
      Seq((3L, "alpha beta gamma")))
    batches.foreach { b =>
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val schema = batches.head.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = Streaming.noveltyViaStateTtl(spark, stream, ttlMs = 1L).toDF()
      .writeStream.format("memory").queryName("t_novelty_exp")
      .outputMode("append").start()
    val deadline = System.nanoTime() + 120 * 1000000000L
    def seen3() = spark.table("t_novelty_exp").as[(Long, Boolean)]
      .collect().exists(_._1 == 3L)
    try {
      while (!seen3() && System.nanoTime() < deadline) Thread.sleep(250)
      assert(seen3(), "doc 3 verdict never arrived")
      // the engine sweeps expired keys in its no-data batches; lastProgress
      // may lag the sweep, so poll the state metric under the same deadline
      // instead of trusting a single post-sleep read
      def stateRows() = Option(q.lastProgress)
        .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(Long.MaxValue)
      while (stateRows() > 1 && System.nanoTime() < deadline) Thread.sleep(250)
      assert(stateRows() <= 1,
        s"expired keys must be evicted, state held ${stateRows()} rows")
    } finally quietStop(q)
    val out = spark.table("t_novelty_exp").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "first carrier is novel")
    assert(out(3L), "re-arrival after the TTL horizon must be novel again")
  }

  test("TTL substring state: wide horizon reproduces the unbounded matches") {
    import spark.implicits._
    // two docs sharing a 25-token run, split across micro-batches, plus an
    // unrelated doc — TTL >> replay must emit exactly the unbounded set
    val run = (1 to 25).map(i => s"r$i")
    val doc1 = ((1 to 7).map(i => s"a$i") ++ run).mkString(" ")
    val doc2 = ((1 to 3).map(i => s"b$i") ++ run).mkString(" ")
    val doc3 = (1 to 30).map(i => s"c$i").mkString(" ")
    val src = "/tmp/graft-stream-src-substr-ttl"
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val batches = Seq(Seq((1L, doc1)), Seq((2L, doc2), (3L, doc3)))
    batches.foreach { b =>
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val schema = batches.head.toDF("doc_id", "text").schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val want = runToMemory(
      Streaming.substringMatchesViaState(spark, stream()).toDF(),
      "t_sub_ttl_ref", "append")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(want.nonEmpty, "fixture must contain cross-doc matches")
    val got = runUntil(
      Streaming.substringMatchesViaStateTtl(spark, stream(), ttlMs = 10 * 60 * 1000L).toDF(),
      "t_sub_ttl_wide", "append")(t => t.count() >= want.size)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(got === want)
  }

  // --- event-time TTL variants: the horizon lives in EVENT time, so the
  // same corpus replayed fast (one micro-batch) or slow (file-by-file) must
  // give bit-identical verdicts — the replay-invariant production semantic.

  private def evDocs(s: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    // offset off the epoch: a row at event time 0 sits ON the initial
    // watermark and is discarded as late data before the state op sees it
    s.toDF("doc_id", "text", "secs")
      .withColumn("event_time",
        (col("secs") + 1000000000L).cast("timestamp")).drop("secs")
  }

  private def evSource(path: String, batches: Seq[Seq[(Long, String, Long)]],
      sleepBetween: Boolean = true): Unit = {
    new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    batches.foreach { b =>
      evDocs(b).coalesce(1).write.mode("append").parquet(path)
      if (sleepBetween && batches.size > 1) Thread.sleep(1100)
    }
  }

  private def evStream(path: String, perTrigger: Int): DataFrame = {
    val schema = evDocs(Seq((0L, "", 0L))).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", perTrigger).parquet(path)
  }

  test("event-time TTL novelty: fast and slow replays give identical verdicts") {
    import spark.implicits._
    val ttl = 120 * 1000L // 2 min of EVENT time
    val rows = Seq(
      (1L, "alpha beta gamma", 0L),          // first carrier
      (2L, "alpha beta gamma delta", 60L),   // within horizon: repeat + 1 new
      (3L, "alpha beta gamma", 600L))        // 540 s silent > ttl: novel AGAIN
    val srcSlow = "/tmp/graft-stream-src-nov-ev-slow"
    val srcFast = "/tmp/graft-stream-src-nov-ev-fast"
    evSource(srcSlow, rows.map(Seq(_)))
    evSource(srcFast, Seq(rows))
    val want = Seq((1L, true), (2L, false), (2L, true), (3L, true)).sorted
    val slow = runToMemory(
      Streaming.noveltyViaStateEventTtl(spark, evStream(srcSlow, 1), ttl).toDF(),
      "t_nov_ev_slow", "append").as[(Long, Boolean)].collect().toSeq.sorted
    val fast = runToMemory(
      Streaming.noveltyViaStateEventTtl(spark, evStream(srcFast, 3), ttl).toDF(),
      "t_nov_ev_fast", "append").as[(Long, Boolean)].collect().toSeq.sorted
    assert(slow === want, "slow replay (3 micro-batches)")
    assert(fast === want, "fast replay (1 micro-batch) — same verdicts")
  }

  test("event-time TTL substring: horizon in event time, replay-invariant") {
    import spark.implicits._
    val ttl = 120 * 1000L
    val run = (1 to 25).map(i => s"r$i")
    val rows = Seq(
      (1L, ((1 to 7).map(i => s"a$i") ++ run).mkString(" "), 0L),
      (2L, ((1 to 3).map(i => s"b$i") ++ run).mkString(" "), 60L),   // within
      (3L, ((1 to 5).map(i => s"c$i") ++ run).mkString(" "), 600L))  // beyond
    val srcSlow = "/tmp/graft-stream-src-sub-ev-slow"
    val srcFast = "/tmp/graft-stream-src-sub-ev-fast"
    evSource(srcSlow, rows.map(Seq(_)))
    evSource(srcFast, Seq(rows))
    // 25-token run, k=20 ⇒ 6 shared window digests; doc1's run starts at
    // token 8, doc2's at token 4 ⇒ pairs (pa, pb) = (7+j, 3+j), j=1..6.
    // doc3 shares the run but sits past the horizon: its arrival resets
    // each digest's epoch, so NO match may involve doc 3.
    val want = (1 to 6).map(j => (1L, 2L, 7L + j, 3L + j)).sorted
    def got(name: String, src: String, per: Int) = runToMemory(
      Streaming.substringMatchesViaStateEventTtl(spark, evStream(src, per), ttl).toDF(),
      name, "append")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    val slow = got("t_sub_ev_slow", srcSlow, 1)
    val fast = got("t_sub_ev_fast", srcFast, 3)
    for ((g, lbl) <- Seq((slow, "slow"), (fast, "fast"))) {
      assert(!g.exists(_._6), s"$lbl: no digest may poison in this fixture")
      assert(g.map(m => (m._2, m._3, m._4, m._5)).sorted === want, lbl)
    }
  }

  test("event-time TTL novelty: watermark sweep bounds the state") {
    import spark.implicits._
    val ttl = 120 * 1000L
    val src = "/tmp/graft-stream-src-nov-ev-sweep"
    evSource(src, Seq(
      Seq((1L, "alpha beta gamma", 0L), (2L, "alpha beta gamma delta", 60L)),
      Seq((10L, "p q r", 3600L)),   // watermark pusher: wm -> 60 s this batch
      Seq((11L, "s t u", 7200L))))  // wm -> 3600 s: sweeps the doc-1/2 keys
    val q = Streaming.noveltyViaStateEventTtl(spark, evStream(src, 1), ttl).toDF()
      .writeStream.format("memory").queryName("t_nov_ev_sweep")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // keys "alpha beta gamma" / "beta gamma delta" timed out at 180 s of
      // event time — far behind the 3600 s watermark — so after the final
      // batch (plus its trailing timeout sweep) state holds at most the two
      // pusher trigrams. Poll under a deadline: the sweep may run a no-data
      // batch after processAllAvailable returns.
      val deadline = System.nanoTime() + 60 * 1000000000L
      def stateRows() = Option(q.lastProgress)
        .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(Long.MaxValue)
      while (stateRows() > 2 && System.nanoTime() < deadline) Thread.sleep(250)
      assert(stateRows() <= 2,
        s"expired keys must be swept by the watermark, state held ${stateRows()} rows")
    } finally quietStop(q)
    val out = spark.table("t_nov_ev_sweep").as[(Long, Boolean)].collect()
    assert(out.count(_._1 == 1L) == 1 && out.find(_._1 == 1L).get._2)
  }

  test("mapGroupsWithState running totals equal the batch per-user aggregate") {
    import spark.implicits._
    val got = runToMemory(
      Streaming.runningUserTotals(spark, Streaming.eventsStream(spark, dir)).toDF(),
      "t_running", "update")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val want = Tables.events(spark, dir)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().sortBy(_._1).toMap
    assert(got.map(g => g._1 -> g._2).toMap === want)
    // double accumulation order differs between the state fold and the batch
    // sum — compare values with tolerance, not bit-exactly
    val batchSums = Tables.events(spark, dir)
      .groupBy("user_id").sum("value")
      .as[(Long, Double)].collect().toMap
    got.foreach { case (u, _, sv) =>
      assert(math.abs(sv - batchSums(u)) < 1e-6, s"user $u")
    }
  }

  test("streaming count-min sketch equals the batch sketch and stays d*w-bounded") {
    import spark.implicits._
    import graft.ops.{Relational, TextOps}
    import org.apache.spark.sql.functions.{count, explode, lit}
    val got = runToMemory(
      Streaming.cmsTokensViaAgg(Streaming.documentsStream(spark, dir)),
      "t_cms", "complete")
      .orderBy("r", "b").as[(Int, Long, Long)].collect().toSeq
    // the twin is batch-runnable: same expression over the static table IS
    // the batch sketch (counter addition commutes across micro-batches)
    val want = Streaming.cmsTokensViaAgg(Tables.documents(spark, dir))
      .orderBy("r", "b").as[(Int, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty &&
      got.size <= Relational.CmsRows * Relational.CmsWidth)
    // online heavy-hitter read from the sink: min over the d counters never
    // undercounts the exact truth (the CMS one-sided contract)
    val sketch = got.map { case (r, b, c) => (r, b) -> c }.toMap
    val exact = Tables.documents(spark, dir)
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(5)
      .as[(String, Long)].collect()
    val probes = exact.map(_._1).toSeq.toDF("t")
      .select(col("t"), explode(Relational.cmsBuckets(col("t"))).as("rb"))
      .select(col("t"), col("rb.r"), col("rb.b"))
      .as[(String, Int, Long)].collect()
    val estOf = probes.groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(p => sketch.getOrElse((p._2, p._3), 0L)).min
    }
    exact.foreach { case (t, n) =>
      assert(estOf(t) >= n, s"token '$t' underestimated: ${estOf(t)} < $n")
    }
  }
}
