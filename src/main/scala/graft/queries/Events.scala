package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time windowed analytics over the `events` table (SURVEY.md §2
  * J1–J3, I14). The reference has no streaming surface; these are the
  * batch duals of Structured Streaming's window operators — the exact
  * same `window()`/`session_window()` expressions run unchanged under
  * `readStream` (see streaming.StreamingSpec).
  *
  * Scale notes: every query is a single hash-shuffle on (window, key) —
  * identical cost envelope to a groupBy. Tumbling/sliding windows are
  * computed row-side (a row expands to its window(s) before the shuffle,
  * map-side partial aggregation applies), so the shuffle carries only
  * per-window partial states. Session windows shuffle by user_id and
  * merge in-partition — at 1000 executors each user's events land on one
  * partition, bounded by per-user event counts, not total volume.
  * Monetary sums use exact DECIMAL(18,2): order-independent at any
  * parallelism.
  */
object Events {

  private val valueDec = col("value").cast(DecimalType(18, 2))
  // Exact decimal sum internally (order-independent), DOUBLE in the final
  // projection so the driver's pandas dtype hash matches DuckDB.
  private val sumValue = sum(valueDec).cast(DoubleType).as("sum_value")

  /** J1 tumbling 1-hour window per event type. */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumValue)
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))

  /** J2 sliding 1-hour window, 15-minute slide: each event contributes to
    * exactly 4 windows. */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumValue)
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))

  /** J3 session window: per-user sessions closed by a 30-minute
    * inactivity gap. Spark merges an event into the previous session iff
    * ts < prev_ts + gap, so the oracle's new-session predicate is
    * `diff >= 30 minutes` (gaps-and-islands). Session end = last ts + gap. */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sumValue)
      .select(
        col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** I14 JSON extraction: parse `props` with an explicit schema (native
    * from_json — codegen'd, no UDF), aggregate the extracted field. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).getField("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** As-of join (an operator Spark lacks natively): each click picks up
    * the most recent purchase at-or-before it by the same user. Composed
    * Spark-first — union both sides tagged, one shuffle+sort per user,
    * `last(..., ignoreNulls)` over a running frame — instead of a
    * per-row lookup join. This is the scalable formulation: cost is one
    * window pass over the union, never a range probe per click, and it
    * parallelizes by user exactly like any windowed aggregate. Oracle:
    * DuckDB's native ASOF LEFT JOIN. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).filter(col("event_type").isin("click", "purchase"))
    val tagged = ev.select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"),
      when(col("event_type") === "purchase", col("value")).as("p_value"),
      when(col("event_type") === "purchase", col("ts")).as("p_ts"))
    // At equal ts a purchase must sort BEFORE the click so the running
    // frame sees it — ASOF semantics are p.ts <= c.ts, ties included.
    // "purchase" > "click" lexically, so event_type desc orders purchases
    // first; event_id keeps the order total/deterministic.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_purchase_value", last(col("p_value"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_purchase_ts"), col("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** The SAME as-of semantics through the NATIVE operator
    * (graft.plans.AsOfJoin → AsOfJoinExec via the injected planner
    * strategy): one hash shuffle + sort per side — an equi-join's cost
    * envelope — and a streaming O(1)-state merge, vs the window
    * composition's shuffled union. Shares q_asof_join's DuckDB ASOF
    * LEFT JOIN oracle: two implementations, one native and one
    * composed, held to one external truth. */
  def asofNative(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    graft.plans.AsOf.join(clicks, purchases, "user_id", "p_user", "ts", "p_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("p_ts").as("last_purchase_ts"),
        col("p_value").as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** FORWARD as-of through the same native operator: each click picks
    * the NEXT purchase at-or-after it (smallest p_ts >= ts) — the
    * "time-to-conversion" direction. Same one-shuffle-per-side cost
    * envelope; the forward merge carries no state at all (the candidate
    * is the un-consumed head of the right iterator). Oracle: DuckDB
    * ASOF LEFT JOIN with the inequality flipped to c.ts <= p.ts. */
  def asofForward(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    graft.plans.AsOf.join(clicks, purchases, "user_id", "p_user", "ts", "p_ts",
        direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("p_ts").as("next_purchase_ts"),
        col("p_value").as("next_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** J1 as an ACTUAL Structured Streaming run, not a batch dual: the
    * events parquet plays a file-source stream (Trigger.AvailableNow
    * drains it and terminates), the SAME windowed aggregation as the
    * batch `tumbling` runs over it with a watermark, and the memory sink
    * collects complete-mode results. Deterministic, so it shares the
    * batch query's oracle — proving stream/batch unification, not just
    * claiming it. At scale the only change is the trigger (continuous
    * micro-batches) and a real sink. */
  // cache the physical events schema so each of the 7 judged stream
  // queries (×2 bench runs) doesn't re-read the footer (~100 ms each —
  // pure drain floor). Keyed by (path, size, mtime) from a Hadoop
  // FileStatus (works for URI-form and non-local paths, unlike
  // java.io.File): a REGENERATED events.parquet in the same JVM (the
  // dtype-drift class EventsDtypeSpec guards) invalidates naturally, at
  // the cost of one stat per call instead of a footer read. If the stat
  // itself fails, skip the cache rather than serve under a stale key.
  // Known residual window: a same-length regeneration inside one mtime
  // granule is indistinguishable by stat — acceptable for a cache whose
  // alternative is re-reading the footer every call; the driver
  // regenerates between sessions, never mid-JVM.
  private val eventSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long),
      org.apache.spark.sql.types.StructType]()

  private def eventStream(s: SparkSession, d: String): DataFrame = {
    // same ns/µs dtype branching as the batch reader (Tables.events), but
    // the schema must be declared up-front (streaming file sources never
    // infer), so branch on the batch-loaded physical schema
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def readSchema() = s.read.parquet(s"$d/events.parquet").schema
    val rawSchema =
      try {
        val hp = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
        val st = graft.table.GraftIO.fs(hp).getFileStatus(hp)
        eventSchemaCache.computeIfAbsent(
          (d, st.getLen, st.getModificationTime), _ => readSchema())
      } catch { case scala.util.control.NonFatal(_) => readSchema() }
    // file-source streams take a DIRECTORY; glob-filter to the events file
    val raw = s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** Scope shuffle partitions down around a stream drain and restore the
    * session default only AFTER termination (micro-batch planning reads
    * the conf from a background thread after start()). Why 2: every
    * stateful streaming op materializes one state store PER SHUFFLE
    * PARTITION at query start, and each store's init + per-batch commit
    * is the drain's fixed cost — measured at sf0.1, addBatch goes
    * ~0.9 s → ~0.5 s dropping 8 → 2 while the judged keyspaces are a
    * few hundred groups. At real scale this dial sizes to
    * keys/cores, not to 2 — the judged corpus is the small end. */
  private[queries] def withDrainShufflePartitions[T](s: SparkSession)(body: => T): T = {
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "2")
      body
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  private[queries] def drainToMemory(s: SparkSession, qname: String, outputMode: String)(
      topology: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    try s.catalog.dropTempView(qname) catch { case _: Exception => () }
    withDrainShufflePartitions(s) {
      val q = topology
        .writeStream.format("memory").queryName(qname)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qname)
  }

  def streamTumbling(s: SparkSession, d: String): DataFrame =
    drainToMemory(s, "graft_stream_tumbling", "complete")(
      graft.streaming.EventStreams.tumblingCounts(eventStream(s, d)))
      .orderBy(col("ws"), col("event_type"))

  /** J4 judged: flatMapGroupsWithState sessionization with EVENT-TIME
    * TIMEOUT state (EventStreams.sessionizeStream) — the custom stateful
    * operator running as an actual stream, not its batch dual. Emitted
    * rows are (a) sessions closed by a >= 30-min gap inside the data and
    * (b) each user's final open session IF the end-of-stream watermark
    * passed its timeout (Spark fires those in the no-data micro-batch).
    * The oracle is the batch gap-sessionization filtered by the same
    * closure rule — watermark and timeout clocks are MILLISECOND-floored
    * in Spark, timeouts arm at ceil-ms(last)+gap and fire strictly below
    * the watermark, so the rule is exactly expressible in SQL (pinned
    * empirically by StreamingSpec against both clock conventions). */
  def streamSession(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.EventStreams.Event]
    drainToMemory(s, "graft_stream_session", "append")(
      graft.streaming.EventStreams.sessionizeStream(ev).toDF())
      .orderBy(col("user_id"), col("session_start"))
  }

  /** J5 streaming exact dedup, judged: dropDuplicates over (user_id,
    * event_type, day-window) with a watermark — the bounded-state
    * streaming dedup (EventStreams.dedupDaily). Drained AvailableNow,
    * the append-mode output is exactly the batch DISTINCT, so it shares a
    * plain SQL oracle. */
  def streamDedup(s: SparkSession, d: String): DataFrame =
    drainToMemory(s, "graft_stream_dedup", "append")(
      graft.streaming.EventStreams.dedupDaily(eventStream(s, d)))
      .orderBy(col("user_id"), col("event_type"), col("day"))

  /** Stream-STREAM interval join, judged: clicks and purchases play as
    * two watermarked streams (EventStreams.clickToPurchase — purchases
    * within 30 minutes after a click by the same user), drained
    * AvailableNow. Both watermarks bound the buffered join state at
    * scale; drained to completion the result is exactly the batch
    * interval join, which is the oracle. */
  def streamJoin(s: SparkSession, d: String): DataFrame = {
    val ev = eventStream(s, d)
    drainToMemory(s, "graft_stream_join", "append")(
      graft.streaming.EventStreams.clickToPurchase(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase")))
      .orderBy(col("c_user"), col("click_ts"), col("purchase_ts"))
  }

  /** Streaming sink, judged: the events stream drains (AvailableNow)
    * through EventStreams.sinkToTable into a fresh Graft table — one
    * exactly-once snapshot per micro-batch — and the judged output is
    * the TABLE read back. Oracle = the source rows: the sink must
    * neither lose nor invent data across the stream/table boundary. */
  def streamSink(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val cat = new graft.table.GraftCatalog(graft.Scratch.fresh("graft_sink_wh"))
    cat.createSchema("db")
    val t = cat.createTable("db.sunk", StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType))))
    val stream = eventStream(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    withDrainShufflePartitions(s) {
      val q = graft.streaming.EventStreams.sinkToTable(stream, t)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    t.read(s).orderBy(col("event_id"))
  }

  /** Streaming CDC upsert sink, judged: the events stream drains
    * (AvailableNow) through EventStreams.upsertToTable — each micro-batch
    * merge-on-read upserts per-user latest-event state, resolving by
    * (ts, event_id) argmax against the table's current rows — and the
    * judged output is the final TABLE state. Because the resolve is
    * idempotent/commutative, the final state is the per-user latest
    * event REGARDLESS of how the source was sliced into batches; the
    * oracle states exactly that. */
  def streamUpsert(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val cat = new graft.table.GraftCatalog(graft.Scratch.fresh("graft_upsert_wh"))
    cat.createSchema("db")
    val t = cat.createTable("db.user_state", StructType(Seq(
      StructField("user_id", LongType), StructField("last_ts", TimestampType),
      StructField("last_type", StringType), StructField("last_event_id", LongType))))
    val stream = eventStream(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    withDrainShufflePartitions(s) {
      val q = graft.streaming.EventStreams.upsertToTable(stream, t)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    t.read(s).orderBy(col("user_id"))
  }

  /** STREAMING LATE-DATA ACCOUNTING, judged: a watermark that PROVABLY
    * drops a planted late cohort, with per-window accepted/dropped
    * counts — the reconciliation report a streaming ingest runs against
    * its batch recount. The replay is made batch-split-DETERMINISTIC
    * (the q_stream_countmin requirement, here load-bearing rather than
    * sidestepped by additivity) by planting the micro-batch boundaries
    * themselves: the source dir holds exactly three single-file
    * parquets drained with maxFilesPerTrigger=1 in mtime order —
    *   batch 1 `a`: the full events table (watermark starts at −∞, so
    *     nothing drops; afterwards wm = max(ts) − 1h),
    *   batch 2 `m`: ONE sentinel row at max(ts)+3 days. During this
    *     batch the wm from batch 1 EVICTS every window except the last
    *     day's (emitted, append mode); afterwards wm = sentinel − 1h,
    *     past every real window end. The eviction ordering is the
    *     load-bearing step: a watermark only GUARANTEES dropping rows
    *     whose window state is already gone — while state lives, late
    *     rows "may or may not" be dropped (Spark merges them, measured
    *     here before the sentinel batch was split out),
    *   batch 3 `b`: the earliest DAY's events re-keyed — every ts sits
    *     a full corpus-span below wm and every target window is
    *     evicted → ALL dropped, none re-emitted; the last day's window
    *     flushes in this batch under the sentinel watermark. The
    *     sentinel's own window stays above the watermark and is never
    *     emitted.
    * Accepted counts come from the DRAIN; totals from the same cohort
    * construction in batch; dropped = total − accepted. The builder
    * REQUIREs the late-cohort margin loudly instead of letting a
    * short-span corpus silently turn the test vacuous. Scale shape:
    * state is live-window-count-sized, the drop is an O(1) per-row
    * watermark filter, and the accounting join is window-count-sized. */
  def streamLate(s: SparkSession, d: String): DataFrame = {
    val replayDir = graft.Scratch.materializedOnce("stream_late_replay", d) { pth =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("ts"))
      val Array(row) = ev.agg(max(col("ts")).as("mx"),
        to_date(min(col("ts"))).as("d0")).collect()
      val (mx, d0) = (row.getTimestamp(0), row.getDate(1))
      val late = ev.filter(to_date(col("ts")) === lit(d0))
        .select(col("event_id") + lit(10000000L), col("event_type"), col("ts"))
      val lateMax = late.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      require(lateMax.getTime < mx.getTime - 3600 * 1000L,
        s"streamLate: corpus span too short — late cohort max $lateMax not " +
          s"an hour under the watermark anchor $mx; the planted drop would be vacuous")
      val sentinel = s.range(1).select(lit(-1L).as("event_id"),
        lit("sentinel").as("event_type"),
        lit(mx).cast(TimestampType) + expr("INTERVAL 3 DAYS"))
      def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = pth + "_build_" + name
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"streamLate: no part file in $tmp"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pth))
        val dest = new java.io.File(pth, name + ".parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        require(dest.setLastModified(mtime), s"streamLate: cannot set mtime on $dest")
      }
      // mtimes force the file-source order (it sorts by timestamp): the
      // on-time file MUST be batch 1 and the sentinel MUST precede the
      // late cohort — a watermark only GUARANTEES dropping rows whose
      // window state was already evicted ("may or may not be dropped"
      // while state lives), so the sentinel batch runs first to evict
      // every real window before the late batch arrives
      val t0 = System.currentTimeMillis() - 300000L
      writeOne(ev, "a", t0)
      writeOne(sentinel.toDF("event_id", "event_type", "ts"), "m", t0 + 60000L)
      writeOne(late.toDF("event_id", "event_type", "ts"), "b", t0 + 120000L)
    }
    val src = s.readStream
      .schema(s.read.parquet(replayDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replayDir)
    val accepted = drainToMemory(s, "graft_stream_late", "append")(
      src.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_accepted"))
        .select(col("w.start").as("ws"), col("event_type"), col("n_accepted")))
    // batch recount from the SAME cohort construction (not the replay
    // files — a builder bug then shows up as a loud stream/batch
    // mismatch instead of propagating into both sides)
    val ev = Tables.events(s, d).select(col("event_type"), col("ts"))
    val d0 = to_date(min(col("ts")))
    val firstDay = ev.agg(d0.as("d0"))
    val total = ev
      .unionAll(ev.join(broadcast(firstDay), to_date(col("ts")) === col("d0"))
        .select(col("event_type"), col("ts")))
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_total"))
      .select(col("w.start").as("ws"), col("event_type"), col("n_total"))
    total.join(accepted, Seq("ws", "event_type"))
      .select(col("ws"), col("event_type"), col("n_total"), col("n_accepted"),
        (col("n_total") - col("n_accepted")).as("n_dropped"))
      .orderBy(col("ws"), col("event_type"))
  }

  /** J4 custom stateful operator, judged: flatMapGroupsWithState
    * sessionization (streaming.EventStreams.sessionize) run in batch mode
    * — output must equal the session_window query row for row (same
    * oracle). The operator itself is the streaming one; batch execution
    * feeds each key's full history through the same state function. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.EventStreams.Event]
    graft.streaming.EventStreams.sessionize(ev)
      .toDF()
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Time-series resample with gap fill: a dense per-user daily grid
    * over the corpus span, zero-filled event counts, and LOCF
    * (last-observation-carried-forward) of the daily total — the
    * standard "regularize an irregular series" op. Scale: the grid is
    * users × days — it never materializes the cross product of EVENTS,
    * only of (distinct users) × (a broadcast day spine computed from a
    * 1-row global span); the LOCF window shuffles once on user_id with
    * per-user state bounded by the day count, not event count. */
  def resampleDaily(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val daily = ev
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), sum(valueDec).as("day_dec"))
    val spine = ev
      .agg(date_trunc("DAY", min(col("ts"))).as("lo"), date_trunc("DAY", max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(spine))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_dec"), ignoreNulls = true).over(w).cast(DoubleType).as("locf_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** VARIANT (Spark 4's semi-structured type): parse_json into an open
    * variant — no up-front schema, unlike from_json (q_json_extract) —
    * then typed path extraction and a JSON round-trip. The variant
    * encoding is binary + shredded-path-friendly at the storage layer;
    * here the oracle pins the extraction semantics against DuckDB's
    * JSON engine (both normalize the round-trip to compact JSON). */
  def variantExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.k', 'int')").as("k"),
        expr("to_json(v)").as("round_trip"))
      .orderBy(col("event_id"))

  /** Ordered conversion funnel (view → click → purchase): a user counts
    * at stage k only if stage k's first event follows stage k-1's. Three
    * conditional min-aggregations chained by per-user joins — every stage
    * shuffles on user_id, so the exchanges after the first are reused
    * (co-partitioned); no window over the full event stream, no
    * cross-stage self-join on events. Output is per-user stage
    * timestamps + the summary booleans, fully hash-checkable. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("first_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("first_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(
        col("user_id"), col("first_view"), col("first_click"), col("first_purchase"),
        col("first_click").isNotNull.as("reached_click"),
        col("first_purchase").isNotNull.as("reached_purchase"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention: users grouped by first-seen day, counted on each
    * later active day — THE product-analytics staple. Two shuffles
    * (per-user min, then per-(cohort, offset) distinct), both on small
    * keys; at scale the distinct-user count per cell is the only state. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(
        col("cohort_day").cast(TimestampType).as("cohort_ts"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_ts"), col("day_offset"))
  }

  /** Time-spine gap filling + forward fill: every (user, day) cell gets
    * the last known daily total — the missing-data repair every
    * time-series feature pipeline runs before training. The spine is
    * generated (sequence over the corpus date range — no driver loop),
    * the fill is one window pass with last(ignoreNulls). Daily totals
    * are exact DECIMAL sums (order-independent). */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), valueDec.as("v"))
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(sum(col("v")).cast(DoubleType).as("day_value"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(
        col("user_id"),
        col("day").cast(TimestampType).as("day_ts"),
        col("day_value").isNull.as("was_gap"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy(col("user_id"), col("day_ts"))
  }

  /** Event-type transition matrix (first-order Markov counts): per
    * user, each consecutive event pair increments (from, to) — the
    * sequence-mining primitive behind next-action models and funnel
    * discovery. One user-partitioned window pass (deterministic order:
    * ts + unique event_id tiebreak), then a tiny (from, to) aggregate;
    * transition share is an exact count ratio. */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(broadcast(totals), Seq("prev_type"))
      .select(
        col("prev_type"), col("event_type"), col("n"),
        (col("n").cast(DoubleType) / col("n_from").cast(DoubleType)).as("p"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** Daily-count anomaly detection: z-score of each (event_type, day)
    * count against that type's distribution — computed from EXACT
    * integer component sums (n, Σx, Σx²) via the closed form, so the
    * scores are bit-identical at any parallelism (stddev_samp's running
    * double accumulation is not; same policy as q_regr_agg). */
  def anomalyZscore(s: SparkSession, d: String): DataFrame =
    zscoreReadout(Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))

  /** STREAMING anomaly detection: the per-(type, day) count registry is
    * maintained by a streaming aggregate while events arrive as a file
    * stream; the z-score readout runs on the drained registry. Counts
    * are ADDITIVE, so the registry is deterministic under ANY
    * micro-batch split (the q_stream_countmin argument) and equals the
    * batch daily table exactly — which is what makes a streaming
    * anomaly monitor oracle-checkable: the oracle is q_anomaly_zscore's
    * batch SQL verbatim. State is bounded at types × days — calendar-
    * bounded, never corpus-bounded (100 TB of events is still ~4k
    * days); the readout's closed form from exact (n, Σx, Σx²) keeps
    * every emitted double deterministic. */
  def streamAnomaly(s: SparkSession, d: String): DataFrame =
    // localCheckpoint breaks the memory-sink lineage: the readout
    // self-joins the registry, and Catalyst cannot deduplicate the
    // MemoryPlan leaf's attributes (INTERNAL_ERROR conflicting refs) —
    // a LogicalRDD leaf deduplicates fine; the registry is types×days
    // rows, so materializing it is metadata-sized
    zscoreReadout(drainToMemory(s, "graft_stream_anomaly", "complete")(
      eventStream(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))).localCheckpoint())

  private def zscoreReadout(daily: DataFrame): DataFrame = {
    val stats = daily.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val n = col("n_days").cast(DoubleType)
    val mean = col("sx").cast(DoubleType) / n
    val varS = (col("sxx").cast(DoubleType) * n -
      col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) / (n * (n - lit(1.0)))
    daily.join(broadcast(stats), Seq("event_type"))
      .select(
        col("event_type"),
        col("day").cast(TimestampType).as("day_ts"),
        col("x"),
        // degenerate groups (single day, or zero variance) have no
        // defined z — emit NULL explicitly on BOTH sides rather than
        // ride engine division semantics (Spark 0/0 → NULL, DuckDB
        // double 0/0 → NaN: they'd hash-diverge)
        when(col("n_days") >= 2 && varS > lit(0.0),
          (col("x").cast(DoubleType) - mean) / sqrt(varS)).as("z"))
      .withColumn("anomalous", abs(col("z")) > lit(2.0)) // NULL z -> NULL
      .orderBy(col("event_type"), col("day_ts"))
  }

  /** EWMA smoothing of the daily event count (half-life = 1 day,
    * pandas-style adjust=true): ewma_d = Σ x·2^idx' / Σ 2^idx' over days
    * ≤ d, idx = days since the corpus epoch. The 2^idx weights and both
    * running numerator/denominator are EXACT BIGINTs (idx ≤ ~30 at every
    * sf; x·2^idx < 2^47), so the sums are order-independent at any
    * parallelism and the single final double division is deterministic —
    * no float accumulation anywhere, the same policy as q_anomaly_zscore.
    * (A float-weighted formulation would hash-diverge: Spark's running
    * window folds sequentially while DuckDB may sum via segment tree —
    * different association, different rounding.) */
  def ewma(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val idx = datediff(col("day"), lit("2024-01-01").cast(DateType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    daily
      // exactness guard: outside [0, 62] the 2^idx weight stops being an
      // exact BIGINT (Spark's non-ANSI double->long cast would SILENTLY
      // saturate while DuckDB raises) — fail loudly instead if the
      // corpus ever widens past the epoch window
      .withColumn("p2",
        when(idx.between(0, 62), pow(lit(2.0), idx.cast(DoubleType)).cast(LongType))
          .otherwise(raise_error(concat(
            lit("ewma: day offset outside exact-weight range [0,62]: "),
            col("day").cast(StringType)))))
      .withColumn("s1", sum(col("x") * col("p2")).over(w))
      .withColumn("s2", sum(col("p2")).over(w))
      .select(
        col("event_type"), col("day").cast(TimestampType).as("day_ts"), col("x"),
        (col("s1").cast(DoubleType) / col("s2").cast(DoubleType)).as("ewma"))
      .orderBy(col("event_type"), col("day_ts"))
  }

  /** Log DEBOUNCE dedup: within each (user, event_type) stream, keep
    * only the FIRST event of every burst — a burst being a chain of
    * events each within 60 s of its predecessor (the session_window gap
    * rule). The training-data use: collapse retry storms / double-clicks
    * to one record. A burst's first event is precisely a row whose gap
    * to its predecessor exceeds 60 s (or has no predecessor), so ONE lag
    * window pass + a filter does it — a single shuffle on (user, type),
    * no burst-id materialization, no second window. Deterministic: ties
    * on ts break by unique event_id; gaps compare in exact integer
    * microseconds (unix_micros ↔ DuckDB epoch_us). */
  def debounce(s: SparkSession, d: String): DataFrame = {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byKey)))
      .filter(col("gap_us").isNull || col("gap_us") > 60000000L)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"), col("ts"), col("event_id"))
  }

  /** Chi-square contingency GRID over event_type × day-of-week: observed
    * count, expected count and the per-cell chi² contribution — the
    * association screen behind feature selection and drift detection.
    * Per-cell output instead of the summed statistic BY POLICY: the sum
    * would fold 35 doubles in shuffle order (not engine-reproducible),
    * while each cell's e = row_total·col_total/N and (o−e)²/e are a
    * fixed dag of exact-integer inputs — bit-identical anywhere. */
  def chisqCells(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), dayofweek(col("ts")).as("dow"))
    val cells = ev.groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("o")).as("row_n"))
    val colT = cells.groupBy(col("dow")).agg(sum(col("o")).as("col_n"))
    // grand total N re-aggregates the tiny cells frame (1-row broadcast)
    // — no second scan of events, and the query stays fully lazy
    val grand = cells.agg(sum(col("o")).cast(DoubleType).as("n_total"))
    cells
      .join(broadcast(rowT), Seq("event_type"))
      .join(broadcast(colT), Seq("dow"))
      .crossJoin(broadcast(grand))
      .withColumn("e",
        col("row_n").cast(DoubleType) * col("col_n").cast(DoubleType) / col("n_total"))
      .select(
        col("event_type"), col("dow"), col("o"), col("e"),
        ((col("o").cast(DoubleType) - col("e")) * (col("o").cast(DoubleType) - col("e")) /
          col("e")).as("chi2_cell"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** SEQUENTIAL-PATTERN support ("a followed by b"): for every ordered
    * event-type pair, the number of users with SOME a-event strictly
    * before SOME b-event — the level-2 GSP/PrefixSpan measure behind
    * next-action mining, computed without scanning any sequence twice:
    * "∃ i<j: tᵢ=a ∧ tⱼ=b" ⇔ first(a) < last(b), so one per-(user, type)
    * min/max aggregate (map-side combined) reduces each user to ≤|types|
    * rows, and the pair join is |types|²-bounded per user, never
    * event-count-bounded. "Before" is STRICT on the event timestamp
    * (min/max of ts are exact, so both engines agree bit-for-bit);
    * support is one exact division. */
  def seqMining(s: SparkSession, d: String): DataFrame = {
    val occ = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("first_occ"), max(col("ts")).as("last_occ"))
    val users = Tables.events(s, d).select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val a = occ.select(col("user_id"), col("event_type").as("a"), col("first_occ"))
    val b = occ.select(col("user_id"), col("event_type").as("b"), col("last_occ"))
    a.join(b, Seq("user_id"))
      .filter(col("a") =!= col("b") && col("first_occ") < col("last_occ"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_users_pat"))
      .crossJoin(broadcast(users))
      .select(col("a"), col("b"), col("n_users_pat"),
        (col("n_users_pat").cast(DoubleType) / col("n_users").cast(DoubleType))
          .as("support"))
      .orderBy(col("a"), col("b"))
  }

  /** A/B TEST readout: two-proportion z-test per event type with the
    * deterministic variant split user_id % 2 — the experiment-analysis
    * primitive (conversion = user emitted the type at least once).
    * Counts are exact; the z statistic is a closed-form chain of IEEE
    * div/mul/sqrt — all CORRECTLY-ROUNDED operations, so both engines
    * produce bit-identical doubles (the same reason the determinism
    * policy bans only libm log/exp). Distinct-user reductions are
    * map-side combined; the per-variant totals ride a 2-row broadcast. */
  def abTest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        (col("user_id") % 2).as("variant"))
    val conv = ev.select(col("user_id"), col("event_type"), col("variant"))
      .distinct()
      .groupBy(col("event_type"), col("variant"))
      .agg(count(lit(1)).as("c"))
    val totals = ev.select(col("user_id"), col("variant")).distinct()
      .groupBy(col("variant")).agg(count(lit(1)).as("n"))
    val a = conv.filter(col("variant") === 0)
      .select(col("event_type"), col("c").as("c_a"))
    val b = conv.filter(col("variant") === 1)
      .select(col("event_type"), col("c").as("c_b"))
    val nA = totals.filter(col("variant") === 0).select(col("n").as("n_a"))
    val nB = totals.filter(col("variant") === 1).select(col("n").as("n_b"))
    val pA = col("c_a").cast(DoubleType) / col("n_a").cast(DoubleType)
    val pB = col("c_b").cast(DoubleType) / col("n_b").cast(DoubleType)
    val pPool = (col("c_a") + col("c_b")).cast(DoubleType) /
      (col("n_a") + col("n_b")).cast(DoubleType)
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_a").cast(DoubleType) + lit(1.0) / col("n_b").cast(DoubleType)))
    // FULL OUTER on event_type (ADVICE r8): an event type with zero
    // converting users in one variant must still appear in the readout
    // with a 0 count / 0 rate, not be silently dropped — one-sided
    // lifts are exactly the rows an A/B readout exists to surface
    a.join(b, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .crossJoin(broadcast(nA)).crossJoin(broadcast(nB))
      .select(col("event_type"), col("c_a"), col("c_b"),
        col("n_a"), col("n_b"),
        pA.as("rate_a"), pB.as("rate_b"),
        // degenerate SE (pooled rate 0 or 1) → NULL z on both engines
        when(pPool > 0.0 && pPool < 1.0, (pA - pB) / se).as("z"))
      .withColumn("significant", abs(col("z")) > 1.959963984540054)
      .orderBy(col("event_type"))
  }

  /** DAY-OF-WEEK SEASONALITY decomposition: per (event_type, weekday)
    * mean daily volume plus the peak day — the weekly-profile baseline
    * behind traffic anomaly triage (q_anomaly_* flag days; this names
    * the expected shape they deviate from). Weekday is computed as
    * pmod(days-since-a-known-Sunday, 7) — PORTABLE, because Spark's
    * dayofweek() is 1-based-Sunday while DuckDB's is 0-based: deriving
    * from epoch-day arithmetic sidesteps the dialect trap entirely.
    * Counts are exact; the mean is one IEEE division; the peak is an
    * argmax over the total order (count, day DESC→earliest? no —
    * max(struct(x, day)) picks the LATEST day on count ties, mirrored
    * exactly by the oracle's ORDER BY x DESC, day DESC LIMIT 1). */
  def seasonality(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", expr("pmod(datediff(day, DATE '2024-01-07'), 7)").cast(IntegerType))
    daily.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total"),
        max(struct(col("x"), col("day"))).as("pk"))
      .select(col("event_type"), col("dow"), col("n_days"), col("total"),
        (col("total").cast(DoubleType) /
          col("n_days").cast(DoubleType)).as("mean_per_day"),
        col("pk.x").as("peak_x"),
        // TimestampType for the driver's pandas dtype hash (the day_ts
        // idiom — DuckDB DATE surfaces as datetime64 in pandas)
        col("pk.day").cast(TimestampType).as("peak_day"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** CLICKSTREAM PATH MINING: the top-20 most common per-(user, day)
    * event-type paths — the sequence histogram behind funnel discovery
    * and UX analysis. The path string is built ORDER-DETERMINISTICALLY
    * on both engines: Spark sorts the (ts, event_id, type) struct array
    * inside the per-group aggregate ((ts, event_id) is a total order),
    * DuckDB uses string_agg's ORDER BY — different mechanisms, same
    * string. One aggregate per (user, day) (map-side combinable
    * collect), one count aggregate over path strings, TakeOrdered
    * top-20. Paths are day-bounded, so state per group is bounded. */
  /** BURSTINESS (Fano factor / index of dispersion) of the daily
    * volume per event type: VMR = s²/x̄ = (n·Σx² − (Σx)²) / ((n−1)·Σx).
    * A Poisson-arrival stream sits at 1; >1 is overdispersed (bursty
    * traffic, retry storms, campaign spikes — the prior q_changepoint
    * then localizes), <1 is under-dispersed (rate-limited/scheduled).
    * Numerator and denominator are exact BIGINTs from the same
    * (n, Σx, Σx²) moments q_anomaly_zscore folds; the one float is the
    * final division. Degenerate groups (single day) emit NULL
    * explicitly on both engines (the zscore NULL policy). Overflow
    * guarded LOUDLY at n·Σx² < 2⁶² (the daily grid is calendar-bounded,
    * so this holds to ~10⁹ events/day over 4k days; widen to
    * DECIMAL(38,0) past that). */
  def burstiness(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"), col("sx"),
        when(col("n_days") * col("sxx") < lit(1L << 62), col("sxx"))
          .otherwise(raise_error(lit(
            "burstiness: n*sum(x^2) exceeds 2^62 — move the moments to DECIMAL(38,0)")))
          .as("sxx"))
      .withColumn("num", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .withColumn("den", (col("n_days") - 1L) * col("sx"))
      .withColumn("vmr", when(col("den") > 0L,
        col("num").cast(DoubleType) / col("den").cast(DoubleType)))
      .withColumn("overdispersed", col("vmr") > lit(1.0))
      .orderBy(col("event_type"))

  /** FIRST-TOUCH ATTRIBUTION over (user, day) sessions — the
    * conversion-credit readout next to q_funnel's ordered steps: each
    * session credits its FIRST event type (total order (ts, event_id) —
    * unique, so the argmin is deterministic) and converts iff it
    * contains a purchase. One struct-min aggregate per session instead
    * of a window pass (same shuffle key, no sort-within-partition), one
    * tiny per-type rollup; conversion rate is the single float. Session
    * convention matches q_session_path's (user, day) grouping. */
  def attribution(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"), col("day"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("f"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cv"))
      .groupBy(col("f.event_type").as("first_touch"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("cv")).as("n_converted"))
      .withColumn("conv_rate",
        col("n_converted").cast(DoubleType) / col("n_sessions").cast(DoubleType))
      .orderBy(col("first_touch"))

  def sessionPath(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(collect_list(struct(col("ts"), col("event_id"), col("event_type"))).as("evs"))
      .select(array_join(
        transform(array_sort(col("evs")), e => e.getField("event_type")),
        ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)

  /** ROBUST anomaly detection: median/MAD outlier scores on the daily
    * event counts — the heavy-tail-safe cousin of q_anomaly_zscore
    * (one wild day inflates a mean+stddev gate into missing the next
    * three; the median absolute deviation doesn't move). Both the
    * median and the MAD are EXACT rank statistics (lower median at rank
    * ⌈n/2⌉ via integer div, total order (value, day)), so the only
    * float is the single robust-z division; mad = 0 groups emit NULL
    * explicitly on both engines. Two window passes + two 1-row-per-type
    * broadcast joins — the winsorize shape applied twice. */
  def anomalyMad(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val wMed = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("x"), col("day"))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val med = daily
      .withColumn("rn", row_number().over(wMed))
      .withColumn("n", count(lit(1)).over(wN))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("x"))).as("med"))
    val withDev = daily.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("x") - col("med")))
    val wMad = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("dev"), col("day"))
    val mad = withDev
      .withColumn("rn", row_number().over(wMad))
      .withColumn("n", count(lit(1)).over(wN))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("dev"))).as("mad"))
    withDev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("day").cast(TimestampType).as("day_ts"),
        col("x"), col("med"), col("mad"),
        when(col("mad") > 0,
          (col("x") - col("med")).cast(DoubleType) / col("mad").cast(DoubleType))
          .as("robust_z"))
      .withColumn("anomalous", abs(col("robust_z")) > lit(3.5))
      .orderBy(col("event_type"), col("day_ts"))
  }

  /** CUSUM CHANGEPOINT detection on the per-type daily volume series
    * (Page 1954): C_i = Σ_{j≤i}(x_j − x̄) peaks at the day the mean
    * shifts — reported per event_type as the argmax of |C| (ties →
    * earliest day). All arithmetic is the cross-multiplied exact-integer
    * form the family uses (y_j = N·x_j − T avoids the float mean;
    * C is an exact BIGINT cumulative sum, order-fixed by the unique
    * day sequence), so rows are bit-identical cross-engine; the one
    * IEEE division is the normalized `frac` readout.
    *
    * Scale shape: the corpus reduces to day×type cardinality in the
    * FIRST aggregate (bounded by the calendar, not corpus size — 100 TB
    * of events is still ~4k days), so the per-type cumulative window is
    * a few thousand rows per partition by construction. Overflow
    * envelope: |C| ≤ N·T guarded LOUDLY at 2⁶⁰ (N ≤ 4k days ⇒ holds to
    * ~10¹⁴ events per type; beyond that move C to DECIMAL(38,0)). */
  def changepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cusum = daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("c0", sum(col("n_days") * col("x") - col("total")).over(wCum))
      .withColumn("c", when(abs(col("c0")) < lit(1L << 60), col("c0"))
        .otherwise(raise_error(lit(
          "changepoint: |cusum| exceeds the 2^60 envelope — move C to DECIMAL(38,0)"))))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(abs(col("c")).desc, col("day"))
    cusum.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n_days"), col("total"),
        col("day").cast(TimestampType).as("cp_day"),
        col("x").as("cp_x"), col("c").as("cusum"),
        (col("c").cast(DoubleType) /
          (col("n_days") * col("total")).cast(DoubleType)).as("frac"))
      .orderBy(col("event_type"))
  }

  /** Lag-k AUTOCORRELATION (ACF, lags 1–14) of the total daily event
    * volume — the periodicity detector behind q_seasonality's
    * decomposition (a weekly cycle surfaces as an acf peak at lag 7).
    * r_k = Σ y_i·y_{i+k} / Σ y_i² needs NO square root, so with
    * y_i = N·x_i − T (cross-multiplied exact integers) the numerator
    * and denominator are exact BIGINTs and the only float is the final
    * division. Positions come from row_number over the day order; the
    * lag pairing is an EQUI-join (the lag table replicates the right
    * side shifted by k — never a theta join).
    *
    * Scale shape: day-cardinality everywhere after the first aggregate
    * (the q_changepoint argument); the single-partition window is over
    * ≤~4k calendar days by construction. Overflow: |y| guarded loudly
    * at 2²⁵ so Σy² < 4k·2⁵⁰ < 2⁶² — holds to ~33M total daily
    * deviation·N; beyond, DECIMAL(38,0). */
  def autocorr(s: SparkSession, d: String): DataFrame = {
    val K = 14
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val stats = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("t"))
    val y = daily.withColumn("i", row_number().over(w))
      .crossJoin(broadcast(stats))
      .select(col("i"),
        when(abs(col("n") * col("x") - col("t")) < lit(1L << 25),
          col("n") * col("x") - col("t"))
          .otherwise(raise_error(lit(
            "autocorr: |y| exceeds the 2^25 envelope — move sums to DECIMAL(38,0)")))
          .as("y"))
    val den = y.agg(sum(col("y") * col("y")).as("den"))
    val lags = s.range(1, K + 1).select(col("id").cast(IntegerType).as("lag"))
    val shifted = y.crossJoin(broadcast(lags))
      .select((col("i") - col("lag")).as("i"), col("lag"), col("y").as("y2"))
    y.join(shifted, Seq("i"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("y") * col("y2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"), col("num"), col("den"),
        (col("num").cast(DoubleType) / col("den").cast(DoubleType)).as("acf"))
      .orderBy(col("lag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_changepoint"      -> changepoint,
    "q_autocorr"         -> autocorr,
    "q_anomaly_mad"      -> anomalyMad,
    "q_burstiness"       -> burstiness,
    "q_attribution"      -> attribution,
    "q_session_path"     -> sessionPath,
    "q_seasonality"      -> seasonality,
    "q_ab_test"          -> abTest,
    "q_seq_mining"       -> seqMining,
    "q_debounce"         -> debounce,
    "q_chisq_cells"      -> chisqCells,
    "q_ewma"             -> ewma,
    "q_transitions"      -> transitions,
    "q_anomaly_zscore"   -> anomalyZscore,
    "q_stream_anomaly"   -> streamAnomaly,
    "q_cohort_retention" -> cohortRetention,
    "q_gap_fill"         -> gapFill,
    "q_funnel" -> funnel,
    "q_variant"         -> variantExtract,
    "q_resample"        -> resampleDaily,
    "q_stream_tumbling" -> streamTumbling,
    "q_stream_late"     -> streamLate,
    "q_stream_session"  -> streamSession,
    "q_stream_dedup"    -> streamDedup,
    "q_stream_join"     -> streamJoin,
    "q_stream_sink"     -> streamSink,
    "q_stream_upsert"   -> streamUpsert,
    "q_sessionize"      -> sessionize,
    "q_asof_join"       -> asofJoin,
    "q_asof_native"     -> asofNative,
    "q_asof_forward"    -> asofForward,
    "q_window_tumbling" -> tumbling,
    "q_window_sliding"  -> sliding,
    "q_window_session"  -> sessionWindow,
    "q_json_extract"    -> jsonExtract)

  val oracle: Map[String, String] = Map(
    // Mirrors changepoint exactly: the cross-multiplied deviation
    // y = n_days*x - total keeps the cumulative sum an exact BIGINT in
    // both engines; DuckDB widens SUM(BIGINT) to HUGEINT (→ float64 in
    // pandas), so every aggregate is CAST back to BIGINT.
    "q_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS total
           FROM daily GROUP BY 1),
         cusum AS (
           SELECT d.event_type, d.day, d.x, s.n_days, s.total,
             CAST(sum(s.n_days * d.x - s.total) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
           FROM daily d JOIN stats s USING (event_type)),
         pick AS (
           SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY abs(c) DESC, day) AS rn
           FROM cusum)
         SELECT event_type, n_days, total,
           CAST(day AS TIMESTAMP) AS cp_day, x AS cp_x, c AS cusum,
           CAST(c AS DOUBLE) / CAST(n_days * total AS DOUBLE) AS frac
         FROM pick WHERE rn = 1 ORDER BY event_type""",
    // Same exact-integer policy: y = n*x - t per day, numerator and
    // denominator are exact BIGINT sums, the only float is the final
    // division. Lag pairing replays the equi-join on shifted positions.
    "q_autocorr" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t
           FROM daily),
         y AS (
           SELECT row_number() OVER (ORDER BY d.day) AS i,
             CAST(s.n * d.x - s.t AS BIGINT) AS y
           FROM daily d CROSS JOIN stats s),
         den AS (SELECT CAST(sum(y * y) AS BIGINT) AS den FROM y),
         lags AS (SELECT CAST(range AS INTEGER) AS lag FROM range(1, 15)),
         pairs AS (
           SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.y * b.y) AS BIGINT) AS num
           FROM lags l
           JOIN y a ON TRUE
           JOIN y b ON b.i = a.i + l.lag
           GROUP BY 1)
         SELECT p.lag, p.n_pairs, p.num, d.den,
           CAST(p.num AS DOUBLE) / CAST(d.den AS DOUBLE) AS acf
         FROM pairs p CROSS JOIN den d ORDER BY p.lag""",
    "q_anomaly_mad" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         rk AS (
           SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY x, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM daily),
         med AS (
           SELECT event_type,
             max(CASE WHEN rn = (n + 1) // 2 THEN x END) AS med
           FROM rk GROUP BY 1),
         dev AS (
           SELECT d.event_type, d.day, d.x, m.med, abs(d.x - m.med) AS dev
           FROM daily d JOIN med m USING (event_type)),
         rk2 AS (
           SELECT event_type, day, dev,
             row_number() OVER (PARTITION BY event_type ORDER BY dev, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM dev),
         mad AS (
           SELECT event_type,
             max(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
           FROM rk2 GROUP BY 1)
         SELECT d.event_type, CAST(d.day AS TIMESTAMP) AS day_ts,
           d.x, d.med, m.mad,
           CASE WHEN m.mad > 0
             THEN CAST(d.x - d.med AS DOUBLE) / CAST(m.mad AS DOUBLE) END AS robust_z,
           abs(CASE WHEN m.mad > 0
             THEN CAST(d.x - d.med AS DOUBLE) / CAST(m.mad AS DOUBLE) END) > 3.5
             AS anomalous
         FROM dev d JOIN mad m USING (event_type)
         ORDER BY d.event_type, day_ts""",
    // weekday from epoch-day arithmetic (Spark dayofweek is 1-based
    // Sunday, DuckDB's 0-based — pmod sidesteps the dialect); peak tie
    // breaks to the LATEST day, matching max(struct(x, day)).
    "q_seasonality" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         dowd AS (
           SELECT event_type, day, x,
             CAST(((day - DATE '2024-01-07') % 7 + 7) % 7 AS INTEGER) AS dow
           FROM daily),
         agg AS (
           SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS total
           FROM dowd GROUP BY 1, 2),
         pk AS (
           SELECT event_type, dow, x AS peak_x, day AS peak_day
           FROM (SELECT event_type, dow, x, day,
                   row_number() OVER (PARTITION BY event_type, dow
                     ORDER BY x DESC, day DESC) AS rn
                 FROM dowd) WHERE rn = 1)
         SELECT a.event_type, a.dow, a.n_days, a.total,
           CAST(a.total AS DOUBLE) / CAST(a.n_days AS DOUBLE) AS mean_per_day,
           p.peak_x, p.peak_day
         FROM agg a JOIN pk p USING (event_type, dow)
         ORDER BY a.event_type, a.dow""",
    "q_session_path" ->
      """WITH paths AS (
           SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
           FROM events GROUP BY user_id, CAST(ts AS DATE))
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM paths GROUP BY 1
         ORDER BY n_sessions DESC, path LIMIT 20""",
    "q_ab_test" ->
      """WITH ev AS (
           SELECT DISTINCT user_id, event_type, user_id % 2 AS variant
           FROM events),
         conv AS (
           SELECT event_type, variant, CAST(count(*) AS BIGINT) AS c
           FROM ev GROUP BY 1, 2),
         tot AS (
           SELECT user_id % 2 AS variant,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n
           FROM events GROUP BY 1),
         j AS (
           SELECT COALESCE(a.event_type, b.event_type) AS event_type,
             COALESCE(a.c, 0) AS c_a, COALESCE(b.c, 0) AS c_b,
             na.n AS n_a, nb.n AS n_b
           FROM (SELECT event_type, c FROM conv WHERE variant = 0) a
           FULL OUTER JOIN (SELECT event_type, c FROM conv WHERE variant = 1) b
             ON a.event_type = b.event_type
           CROSS JOIN (SELECT n FROM tot WHERE variant = 0) na
           CROSS JOIN (SELECT n FROM tot WHERE variant = 1) nb)
         SELECT event_type, c_a, c_b, n_a, n_b,
           CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
           CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
           CASE WHEN CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) > 0
                 AND CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) < 1
             THEN (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                   - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             END AS z,
           abs(CASE WHEN CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) > 0
                 AND CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) < 1
             THEN (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                   - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             END) > 1.959963984540054 AS significant
         FROM j ORDER BY event_type""",
    "q_seq_mining" ->
      """WITH occ AS (
           SELECT user_id, event_type,
             min(ts) AS first_occ, max(ts) AS last_occ
           FROM events GROUP BY 1, 2),
         n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
         pat AS (
           SELECT a.event_type AS a, b.event_type AS b,
             CAST(count(*) AS BIGINT) AS n_users_pat
           FROM occ a JOIN occ b ON a.user_id = b.user_id
             AND a.event_type <> b.event_type
             AND a.first_occ < b.last_occ
           GROUP BY 1, 2)
         SELECT a, b, n_users_pat,
           CAST(n_users_pat AS DOUBLE) / CAST(n.n_users AS DOUBLE) AS support
         FROM pat, n ORDER BY a, b""",
    "q_debounce" ->
      """WITH g AS (
           SELECT event_id, ts, user_id, event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap_us
           FROM events)
         SELECT event_id, ts, user_id, event_type
         FROM g WHERE gap_us IS NULL OR gap_us > 60000000
         ORDER BY user_id, event_type, ts, event_id""",
    "q_chisq_cells" ->
      """WITH cells AS (
           SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2),
         rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS row_n FROM cells GROUP BY 1),
         ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS col_n FROM cells GROUP BY 1),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events)
         SELECT c.event_type, c.dow, c.o,
           (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / n.n) AS e,
           ((CAST(c.o AS DOUBLE) - (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / n.n))
             * (CAST(c.o AS DOUBLE) - (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / n.n))
             / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / n.n)) AS chi2_cell
         FROM cells c JOIN rt USING (event_type) JOIN ct USING (dow), n
         ORDER BY c.event_type, c.dow""",
    "q_ewma" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         wtd AS (
           SELECT event_type, day, x,
             CAST(pow(2.0, date_diff('day', DATE '2024-01-01', day)) AS BIGINT) AS p2
           FROM daily),
         run AS (
           SELECT event_type, day, x,
             SUM(x * p2) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS s1,
             SUM(p2) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS s2
           FROM wtd)
         SELECT event_type, CAST(day AS TIMESTAMP) AS day_ts, x,
           CAST(s1 AS DOUBLE) / CAST(s2 AS DOUBLE) AS ewma
         FROM run ORDER BY event_type, day_ts""",
    "q_transitions" ->
      """WITH seq AS (
           SELECT event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events),
         pairs AS (
           SELECT prev_type, event_type, count(*) AS n FROM seq
           WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         totals AS (
           SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_from
           FROM pairs GROUP BY 1)
         SELECT prev_type, event_type, n,
           CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p
         FROM pairs JOIN totals USING (prev_type)
         ORDER BY prev_type, event_type""",
    "q_anomaly_zscore" -> zscoreOracleSql,
    // the streaming registry drains to exactly the batch daily table
    // (additive counts), so the batch z-score SQL is the oracle verbatim
    "q_stream_anomaly" -> zscoreOracleSql,
    "q_burstiness" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
           FROM daily GROUP BY 1)
         SELECT event_type, n_days, sx, sxx,
           n_days * sxx - sx * sx AS num,
           (n_days - 1) * sx AS den,
           CASE WHEN (n_days - 1) * sx > 0 THEN
             CAST(n_days * sxx - sx * sx AS DOUBLE)
               / CAST((n_days - 1) * sx AS DOUBLE) END AS vmr,
           CASE WHEN (n_days - 1) * sx > 0 THEN
             CAST(n_days * sxx - sx * sx AS DOUBLE)
               / CAST((n_days - 1) * sx AS DOUBLE) > 1.0 END AS overdispersed
         FROM m ORDER BY event_type""",
    "q_attribution" ->
      """WITH ev AS (
           SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, event_type
           FROM events),
         fs AS (
           SELECT user_id, day, event_type AS first_touch FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, day
               ORDER BY ts, event_id) AS rn FROM ev)
           WHERE rn = 1),
         cv AS (
           SELECT user_id, day,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS converted
           FROM ev GROUP BY 1, 2)
         SELECT f.first_touch, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(c.converted) AS BIGINT) AS n_converted,
           CAST(sum(c.converted) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS conv_rate
         FROM fs f JOIN cv c USING (user_id, day)
         GROUP BY 1 ORDER BY first_touch""",
    "q_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
         SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_ts,
           CAST(datediff('day', cohort_day, day) AS INT) AS day_offset,
           count(DISTINCT user_id) AS n_users
         FROM ev JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_gap_fill" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(value AS DECIMAL(18,2)) AS v FROM events),
         daily AS (SELECT user_id, day, CAST(sum(v) AS DOUBLE) AS day_value
                   FROM ev GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         spine AS (SELECT u.user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
               CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
           FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN span)
         SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day_ts,
           (daily.day_value IS NULL) AS was_gap,
           last_value(daily.day_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
         FROM spine s LEFT JOIN daily
           ON s.user_id = daily.user_id AND s.day = daily.day
         ORDER BY s.user_id, day_ts""",
    "q_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS first_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         c AS (
           SELECT e.user_id, min(e.ts) AS first_click
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts > v.first_view
           GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, min(e.ts) AS first_purchase
           FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.first_click
           GROUP BY e.user_id)
         SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
           c.user_id IS NOT NULL AS reached_click,
           p.user_id IS NOT NULL AS reached_purchase
         FROM v LEFT JOIN c ON v.user_id = c.user_id
                LEFT JOIN p ON v.user_id = p.user_id
         ORDER BY v.user_id""",
    "q_variant" ->
      """SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract(props, '$') AS VARCHAR) AS round_trip
         FROM events ORDER BY event_id""",
    "q_resample" ->
      """WITH daily AS (
           SELECT user_id, date_trunc('day', ts) AS day,
             count(*) AS n_events,
             sum(CAST(value AS DECIMAL(18,2))) AS day_dec
           FROM events GROUP BY 1, 2),
         spine AS (
           SELECT unnest(generate_series(
             (SELECT date_trunc('day', min(ts)) FROM events),
             (SELECT date_trunc('day', max(ts)) FROM events),
             INTERVAL 1 DAY)) AS day),
         grid AS (
           SELECT u.user_id, s.day
           FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN spine s)
         SELECT g.user_id, g.day,
           coalesce(d.n_events, 0) AS n_events,
           CAST(last_value(d.day_dec IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS locf_value
         FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
         ORDER BY g.user_id, g.day""",
    // The planted two-batch replay is fully determined by the corpus:
    // batch 1 = all events (nothing late), batch 2 = the earliest day
    // re-keyed (ALL late, watermark = max(ts) − 1h) + a sentinel that
    // only flushes windows. So accepted = the plain per-day counts,
    // total = counts over events ∪ earliest-day replay, dropped = diff.
    "q_stream_late" ->
      """WITH ev AS (SELECT event_type, ts FROM events),
         d0 AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM ev),
         rep AS (
           SELECT event_type, ts FROM ev
           UNION ALL
           SELECT event_type, ts FROM ev, d0 WHERE CAST(ts AS DATE) = d0.d0),
         tot AS (
           SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type,
             CAST(count(*) AS BIGINT) AS n_total
           FROM rep GROUP BY 1, 2),
         acc AS (
           SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type,
             CAST(count(*) AS BIGINT) AS n_accepted
           FROM ev GROUP BY 1, 2)
         SELECT ws, event_type, n_total, n_accepted,
           n_total - n_accepted AS n_dropped
         FROM tot JOIN acc USING (ws, event_type)
         ORDER BY ws, event_type""",
    // the streaming run must produce exactly the batch result
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
         count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY ws, event_type ORDER BY ws, event_type""",
    // the drained stream-stream join must equal the batch interval join
    "q_stream_join" ->
      """SELECT c.user_id AS c_user, c.ts AS click_ts,
           p.user_id AS p_user, p.ts AS purchase_ts, p.value AS purchase_value
         FROM events c JOIN events p
           ON c.user_id = p.user_id
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
         WHERE c.event_type = 'click' AND p.event_type = 'purchase'
         ORDER BY c_user, click_ts, purchase_ts""",
    // the sink round-trip must preserve the source exactly
    "q_stream_sink" ->
      """SELECT event_id, ts, user_id, event_type, value
         FROM events ORDER BY event_id""",
    // upsert sink's final table state = per-user latest event,
    // independent of micro-batch slicing (idempotent argmax resolve)
    "q_stream_upsert" ->
      """SELECT user_id, ts AS last_ts, event_type AS last_type,
           event_id AS last_event_id
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    // append-mode streaming dedup must equal the batch DISTINCT
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type,
         time_bucket(INTERVAL '1 day', ts) AS day
         FROM events ORDER BY user_id, event_type, day""",
    // the custom stateful operator must produce exactly session_window's result
    "q_sessionize" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q_asof_native" ->
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
            p AS (SELECT * FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
           p.ts AS last_purchase_ts, p.value AS last_purchase_value
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND p.ts <= c.ts
         ORDER BY c.event_id""",
    "q_asof_forward" ->
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
            p AS (SELECT * FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
           p.ts AS next_purchase_ts, p.value AS next_purchase_value
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND c.ts <= p.ts
         ORDER BY c.event_id""",
    "q_asof_join" ->
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
            p AS (SELECT * FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
           p.ts AS last_purchase_ts, p.value AS last_purchase_value
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND p.ts <= c.ts
         ORDER BY c.event_id""",
    "q_window_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
         count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY ws, event_type ORDER BY ws, event_type""",
    "q_window_sliding" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS ws,
         event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) t(k)
         GROUP BY ws, event_type ORDER BY ws, event_type""",
    // Batch gap-sessionization filtered by the streaming closure rule:
    // every session a data gap closed, plus each user's FINAL session
    // only if its timeout (ceil-ms of last event + 30 min, Spark's
    // ms-floored timeout clock) fell strictly below the end-of-stream
    // watermark (ms-floored max event time, delay 0). The nearest
    // boundary in this corpus is seconds away from the watermark, so
    // floor/strictness conventions cannot flip a row (verified).
    "q_stream_session" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked),
         agg AS (
           SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL '30 minutes' AS session_end,
             max(ts) AS last_ts,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           FROM sess GROUP BY user_id, sid),
         flagged AS (
           SELECT *, row_number() OVER (
             PARTITION BY user_id ORDER BY session_start DESC) AS rn_last
           FROM agg)
         SELECT user_id, session_start, session_end, n_events, sum_value
         FROM flagged
         WHERE rn_last > 1
            OR (epoch_us(last_ts) + 999) // 1000 + 1800000
               < epoch_us((SELECT max(ts) FROM events)) // 1000
         ORDER BY user_id, session_start""",
    "q_window_session" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
         max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""")

  private lazy val zscoreOracleSql: String =
    """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type, count(*) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
           FROM daily GROUP BY 1),
         v AS (
           SELECT event_type, n_days, sx,
             (CAST(sxx AS DOUBLE) * CAST(n_days AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)) AS var_s
           FROM stats),
         scored AS (
           SELECT d.event_type, CAST(d.day AS TIMESTAMP) AS day_ts, d.x,
             CASE WHEN n_days >= 2 AND var_s > 0 THEN
               (CAST(d.x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
                 / sqrt(var_s)
             END AS z
           FROM daily d JOIN v USING (event_type))
         SELECT event_type, day_ts, x, z, abs(z) > 2.0 AS anomalous
         FROM scored ORDER BY event_type, day_ts"""
}
