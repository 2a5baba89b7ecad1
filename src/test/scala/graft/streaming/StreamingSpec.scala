package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics = batch semantics: the streaming tumbling window
  * over a MemoryStream must produce exactly the batch window result, and
  * flatMapGroupsWithState sessionization must equal session_window. */
class StreamingSpec extends SparkTestBase {

  private def eventsDs = {
    import spark.implicits._
    Tables.events(spark, sfDir).as[Event]
  }

  test("streaming tumbling window == batch tumbling window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = eventsDs.collect().toSeq

    val stream = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      stream.addData(data)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("ws", "event_type").collect().toSeq
      val batch = graft.queries.Events.tumbling(spark, sfDir)
        .collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization == session_window") {
    val sessions = EventStreams.sessionize(eventsDs).toDF()
      .orderBy("user_id", "session_start")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().toSeq
    val oracle = graft.queries.Events.sessionWindow(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().toSeq
    assert(sessions === oracle)
  }

  test("sessionizeStream: state carries across micro-batches, event-time timeout closes the tail") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, user: Long, t: String, v: Double = 1.0) =
      Event(id, java.sql.Timestamp.valueOf(t), user, "click", v)

    val stream = MemoryStream[Event]
    val q = EventStreams.sessionizeStream(stream.toDS())
      .toDF()
      .writeStream.format("memory").queryName("sess_stream_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens a session (2 events)
      stream.addData(Seq(ev(1, 1, "2024-01-01 10:00:00"), ev(2, 1, "2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("sess_stream_out").count() === 0) // nothing closed yet
      // batch 2: e3 EXTENDS the open state (cross-batch merge), e4's
      // 100-min gap closes it -> the 3-event session emits
      stream.addData(Seq(ev(3, 1, "2024-01-01 10:20:00"), ev(4, 1, "2024-01-01 12:00:00")))
      q.processAllAvailable()
      val afterGap = spark.table("sess_stream_out")
        .as[EventStreams.Session].collect().toSeq
      assert(afterGap.map(s => (s.user_id, s.n_events, s.session_start.toString,
        s.session_end.toString, s.sum_value)) ===
        Seq((1L, 3L, "2024-01-01 10:00:00.0", "2024-01-01 10:50:00.0", 3.0)))
      // batch 3: another user far in the future pushes the watermark
      // past e4's timeout (12:00 + 30min) -> user 1's tail session
      // closes BY TIMEOUT in the no-data batch; user 2's own session
      // stays open (watermark never passes it) and must NOT emit
      stream.addData(Seq(ev(5, 2, "2024-01-01 20:00:00")))
      q.processAllAvailable()
      val all = spark.table("sess_stream_out")
        .as[EventStreams.Session].collect().toSeq.sortBy(s => (s.user_id, s.session_start.getTime))
      assert(all.map(s => (s.user_id, s.n_events, s.session_end.toString)) ===
        Seq((1L, 3L, "2024-01-01 10:50:00.0"), (1L, 1L, "2024-01-01 12:30:00.0")))
    } finally q.stop()
  }

  test("sessionizeStream drained == batch sessions closed by the end-of-stream watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = eventsDs.collect().toSeq
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionizeStream(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("sess_drain_out")
      .outputMode("append").start()
    try {
      stream.addData(data)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_drain_out").as[EventStreams.Session]
      .collect().toSeq.sortBy(s => (s.user_id, s.session_start.getTime))
    // model: batch gap sessionization, keep every session except each
    // user's last, plus the last iff its ms-clock timeout fell strictly
    // below the end-of-stream watermark (ms-floored max event time)
    def us(t: java.sql.Timestamp): Long = (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    val wmMs = data.map(e => us(e.ts)).max / 1000L
    val expected = data.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      val sessions = EventStreams.splitSessions(u, evs.iterator).toVector
      sessions.dropRight(1) ++ sessions.lastOption.filter { s =>
        // session_end = last event + gap; recover the last event's
        // micros, arm the ms-clock timeout the operator set (ceil-ms of
        // last + gap), and apply the strictly-below-watermark fire rule
        val lastUs = us(s.session_end) - 30L * 60 * 1000000L
        val tmoMs = Math.floorDiv(lastUs + 999L, 1000L) + 30L * 60 * 1000L
        tmoMs < wmMs
      }
    }.sortBy(s => (s.user_id, s.session_start.getTime))
    assert(streamed === expected)
  }

  test("file-source readStream (parquet dir) == batch aggregation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    eventsDs.toDF().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(eventsDs.schema)
      .parquet(dir)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("file_src_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("file_src_out")
        .orderBy("ws", "event_type").collect().toSeq
      val batch = graft.queries.Events.tumbling(spark, sfDir).collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream interval join == batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = eventsDs.collect().toSeq
    val clicks = all.filter(_.event_type == "click")
    val purchases = all.filter(_.event_type == "purchase")

    val cs = MemoryStream[Event]
    val ps = MemoryStream[Event]
    val q = EventStreams.clickToPurchase(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      cs.addData(clicks); ps.addData(purchases)
      q.processAllAvailable()
      // force watermark forward so buffered matches flush
      cs.addData(Event(-1, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1, "click", 0.0))
      ps.addData(Event(-2, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -2, "purchase", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
        .filter(col("c_user") >= 0)
        .orderBy("c_user", "click_ts", "purchase_ts").collect().toSeq
      val batch = EventStreams.clickToPurchase(
          clicks.toDF(), purchases.toDF())
        .orderBy("c_user", "click_ts", "purchase_ts").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      def ev(id: Long, t: String) = Event(id, java.sql.Timestamp.valueOf(t), 1L, "click", 1.0)
      stream.addData(ev(1, "2024-01-01 00:05:00"), ev(2, "2024-01-01 00:50:00"))
      q.processAllAvailable()
      // advance watermark far past the first window
      stream.addData(ev(3, "2024-01-01 03:00:00"))
      q.processAllAvailable()
      // this event is hours behind the watermark — must be dropped
      stream.addData(ev(4, "2024-01-01 00:10:00"))
      q.processAllAvailable()
      stream.addData(ev(5, "2024-01-01 06:00:00"))
      q.processAllAvailable()
      val out = spark.table("late_out").orderBy("ws")
        .select(col("ws").cast("string"), col("n")).collect()
      val first = out.find(_.getString(0).startsWith("2024-01-01 00:00"))
      assert(first.exists(_.getLong(1) === 2L)) // event 4 did NOT land
    } finally q.stop()
  }

  test("q_stream_late: drops land exactly on the planted day; accounting closes") {
    val rows = graft.queries.Events.streamLate(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // accepted + dropped = total on every row, and no window double-emits
    rows.foreach { case (ws, et, total, acc, dropped) =>
      assert(acc + dropped === total, s"($ws, $et) accounting broken")
      assert(dropped >= 0 && acc > 0)
    }
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length,
      "a window emitted twice — late rows re-created evicted state")
    // the planted late cohort is the earliest day's replay: exactly that
    // day shows drops, equal to its accepted count; all other days zero
    val d0 = rows.map(_._1).min
    rows.foreach { case (ws, et, _, acc, dropped) =>
      if (ws == d0) assert(dropped === acc, s"planted day ($ws, $et): dropped != replay size")
      else assert(dropped === 0L, s"un-planted day ($ws, $et) dropped $dropped")
    }
    // the drop is non-vacuous
    assert(rows.filter(_._1 == d0).map(_._5).sum > 0)
  }

  test("streaming sink into a Graft table: content == source, snapshots per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cat = new graft.table.GraftCatalog(
      java.nio.file.Files.createTempDirectory("graft_sink"))
    cat.createSchema("db")
    val t = cat.createTable("db.sunk", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))
    val data = eventsDs.limit(100).collect().toSeq
    val stream = MemoryStream[Event]
    val q = EventStreams.sinkToTable(stream.toDF(), t).start()
    try {
      stream.addData(data.take(50)); q.processAllAvailable()
      stream.addData(data.drop(50)); q.processAllAvailable()
      val got = t.read(spark).orderBy("event_id").collect().toSeq
      // .as[Event].toDF() keeps the source's extra props column — select
      // the sink schema explicitly for the comparison
      val want = eventsDs.limit(100).toDF()
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id").collect().toSeq
      assert(got === want)
      // one snapshot per non-empty micro-batch, each tagged with its key
      val snaps = t.meta.snapshots.filter(_.streamBatch.isDefined)
      assert(snaps.size >= 2)
    } finally q.stop()
  }

  test("crash-replayed micro-batch is a no-op (exactly-once append)") {
    val cat = new graft.table.GraftCatalog(
      java.nio.file.Files.createTempDirectory("graft_replay"))
    cat.createSchema("db")
    val t = cat.createTable("db.replayed", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    val batch = spark.range(10).toDF()
    t.appendStreamBatch(batch, "q1", 0L)
    t.appendStreamBatch(batch, "q1", 0L) // replay: must not double-count
    assert(t.read(spark).count() === 10)
    assert(t.meta.snapshots.count(_.streamBatch.contains("q1#0")) === 1)
    t.appendStreamBatch(batch, "q1", 1L) // next batch appends normally
    assert(t.read(spark).count() === 20)
  }

  test("replay keys survive expire_snapshots (retired into metadata)") {
    val cat = new graft.table.GraftCatalog(
      java.nio.file.Files.createTempDirectory("graft_retire"))
    cat.createSchema("db")
    val t = cat.createTable("db.retired", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    t.appendStreamBatch(spark.range(10).toDF(), "q1", 0L)
    t.appendStreamBatch(spark.range(10, 20).toDF(), "q1", 1L)
    // maintenance drops the snapshot that carried q1#0...
    t.expireSnapshots(olderThanMs = Long.MaxValue, retainLast = 1)
    assert(!t.meta.snapshots.exists(_.streamBatch.contains("q1#0")))
    // ...but a crash-replay of batch 0 must STILL be a no-op
    t.appendStreamBatch(spark.range(10).toDF(), "q1", 0L)
    assert(t.read(spark).count() === 20)
    // the retired watermark records the max expired batchId per query
    assert(t.meta.retiredStreamBatches.exists(_.get("q1").exists(_ >= 0L)))
  }

  test("streaming drift registry drains to exactly the batch pairwise-TV readout") {
    val got = graft.queries.TextOps.streamDrift(spark, sfDir).collect()
    val want = graft.queries.TextOps.sourceDrift(spark, sfDir).collect()
    assert(got.length === want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("streaming anomaly registry drains to exactly the batch z-score readout") {
    val got = graft.queries.Events.streamAnomaly(spark, sfDir).collect()
    val want = graft.queries.Events.anomalyZscore(spark, sfDir).collect()
    assert(got.length === want.length && got.length > 0)
    // bit-identical rows including the closed-form doubles: the drained
    // (type, day) registry equals the batch daily table, and every
    // float downstream is a fixed dag over those exact integers
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    // non-vacuous: at least one defined z and one anomalous day exist
    assert(want.exists(r => !r.isNullAt(3)))
  }
}
