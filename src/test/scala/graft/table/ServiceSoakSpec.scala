package graft.table

import graft.SparkTestBase
import graft.table.GraftIO.RichHPath
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Soak child: one driver JVM in the multi-driver topology.
  *
  *  - mode "meta": metadata-commit hammer, no Spark — N property
  *    commits through the service's exclusive-PUT CAS (the highest
  *    commit rate a driver can generate, so the strongest race
  *    pressure on every other committer).
  *  - mode "spark": a full Spark driver running the mixed daily-life
  *    ops the reference topology serves — tiny appends every op, a
  *    MoR delete of one of its own earlier batches every 7th, a
  *    compaction every 10th, a position-delete fold every 13th. Every
  *    one of those is a snapshot commit racing three other processes
  *    through the one authority. */
object GraftSoakChild {
  def main(args: Array[String]): Unit = {
    val mode = args(0); val tableDir = args(1)
    val n = args(2).toInt; val prefix = args(3)
    mode match {
      case "meta" =>
        val t = new GraftTable(new HPath(tableDir))
        for (i <- 1 to n)
          TableMeta.commitRetry(t.dir, maxAttempts = 100000) { m =>
            m.copy(tableProperties = Some(m.allProperties + (s"$prefix-$i" -> "1")))
          }
      case "spark" =>
        val spark = SparkSession.builder().master("local[2]")
          .config("spark.sql.shuffle.partitions", 2)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .appName(s"graft-soak-$prefix").getOrCreate()
        try {
          import spark.implicits._
          val t = new GraftTable(new HPath(tableDir))
          // predicate-conditioned ops (delete/compact/fold) are single-
          // shot commits by design — they plan against a loaded snapshot
          // and CANNOT blindly retry a moved base, so the CALLER re-runs
          // the whole op on ConcurrentCommitException (Iceberg's
          // CommitFailedException contract). That retry loop is exactly
          // what a real driver in this topology runs.
          def retried(op: => Unit): Unit = {
            var attempts = 0
            var done = false
            while (!done) try { op; done = true } catch {
              case _: ConcurrentCommitException =>
                attempts += 1
                require(attempts < 500, "soak op starved by racing commits")
            }
          }
          for (i <- 1 to n) {
            // append retries internally (commitRetry + jittered backoff),
            // but a 10-loss streak is still contract-legal under this
            // contention — the caller-level retry re-runs the whole
            // append (the first attempt's uncommitted files become
            // remove_orphan_files fodder; no invariant sees them)
            retried(t.append((0L until 20L).map(k => (s"$prefix-$i", k)).toDF("batch", "k")))
            if (i % 7 == 0) retried(t.deleteMoR(spark, col("batch") === s"$prefix-${i - 3}"))
            if (i % 10 == 0) retried(t.rewriteDataFiles(spark, targetFiles = 2))
            if (i % 13 == 0) retried(t.rewritePositionDeletes(spark))
          }
        } finally spark.stop()
    }
  }
}

/** Multi-driver SOAK through one graftsvc authority — the reference
  * topology's daily life (N drivers × mixed appends/deletes/
  * compactions/index-refreshes against one REST-catalog+MinIO
  * analog), not just the 2-JVM commit race GraftFsServiceSpec proves.
  *
  * 5 processes total: this JVM (readers + index feeder + two RACING
  * MaintainedIndex refreshers) + 2 metadata-hammer children + 2 full
  * Spark driver children. Invariants under fire:
  *  - no lost commit: every child's property marker and every
  *    surviving appended batch is present afterwards;
  *  - no torn read: a concurrent reader sees each 20-row batch fully
  *    or not at all, at EVERY poll (append/delete/compact are single
  *    atomic snapshot commits; nothing expires snapshots here, so a
  *    planned snapshot's files always exist — expiry-under-reader is
  *    a separate contract with its own retention lease);
  *  - every reader sees a legal snapshot: current snapshot id is
  *    monotone non-decreasing across polls and no read ever throws;
  *  - MaintainedIndex CAS never double-commits: two refreshers racing
  *    a live feeder must index every batch EXACTLY once
  *    (table/MaintainedIndex.scala:57 — the expectLastBatch CAS). */
class ServiceSoakSpec extends SparkTestBase {

  // LONG-SOAK knob (VERDICT r14 #7): the suite-time run (50/25/30 ops,
  // 5-minute budgets) proves the invariants; the reference topology's
  // daily life is HOURS. Out-of-suite, scale it up:
  //   GRAFT_SOAK_N=500 GRAFT_SOAK_MIN=30 sbt "testOnly *ServiceSoakSpec"
  // N = meta-hammer commits per child (spark children and the feeder
  // run N/2 ops each); MIN = per-phase wait budget in minutes. The
  // invariants asserted are IDENTICAL at every scale.
  private val soakN = sys.env.get("GRAFT_SOAK_N").flatMap(_.toIntOption)
  private val waitMs: Long =
    sys.env.get("GRAFT_SOAK_MIN").flatMap(_.toIntOption).getOrElse(5) * 60000L

  test("5 processes × mixed commits through one service: no lost/torn/duplicate anything") {
    val root = java.nio.file.Files.createTempDirectory("graftfs_soak")
    val srv = GraftFsServer.serve(root)
    val wh = new HPath(s"graftsvc://127.0.0.1:${srv.port}/wh")
    try {
      val cat = new GraftCatalog(wh)
      cat.createSchema("db")
      val schema = StructType(Seq(
        StructField("batch", StringType), StructField("k", LongType)))
      val mixed = cat.createTable("db.mixed", schema)
      val feed = cat.createTable("db.feed", schema)
      val idx = cat.createTable("db.feed_idx", StructType(Seq(
        StructField("batch", StringType), StructField("n", LongType))))

      val javaBin = java.nio.file.Paths.get(
        System.getProperty("java.home"), "bin", "java").toString
      def launch(mode: String, n: Int, prefix: String): (Process, java.nio.file.Path) = {
        val pb = new ProcessBuilder(javaBin, "-Xmx2g",
          "-cp", System.getProperty("java.class.path"),
          "graft.table.GraftSoakChild", mode, mixed.dir.toString, n.toString, prefix)
        pb.redirectErrorStream(true)
        val log = java.nio.file.Files.createTempFile(s"soak_$prefix", ".log")
        pb.redirectOutput(ProcessBuilder.Redirect.to(log.toFile))
        (pb.start(), log)
      }
      val metaN = soakN.getOrElse(50); val sparkN = soakN.map(_ / 2).getOrElse(25)
      val children = Seq(
        launch("meta", metaN, "m1"), launch("meta", metaN, "m2"),
        launch("spark", sparkN, "s1"), launch("spark", sparkN, "s2"))

      // ---- parent workload 1: concurrent READERS on the mixed table
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      @volatile var childrenDone = false
      var lastSnap = 0L
      var polls = 0
      val reader = new Thread(() => try {
        while (!childrenDone && failure.get() == null) {
          val m = mixed.meta
          val snap = m.currentSnapshotId.getOrElse(0L)
          assert(snap >= lastSnap,
            s"snapshot id went BACKWARDS: $lastSnap -> $snap")
          lastSnap = snap
          if (snap > 0) {
            val counts = mixed.read(spark).groupBy("batch").count().collect()
            counts.foreach { r =>
              assert(r.getLong(1) == 20L,
                s"TORN READ: batch ${r.getString(0)} has ${r.getLong(1)} rows")
            }
          }
          polls += 1
        }
      } catch { case e: Throwable => failure.compareAndSet(null, e) }, "soak-reader")
      reader.start()

      // ---- parent workload 2: append-only feeder + two RACING index
      // refreshers (MaintainedIndex CAS under live watermark movement)
      val feedBatches = soakN.map(_ / 2).getOrElse(30)
      val feeder = new Thread(() => try {
        import spark.implicits._
        for (i <- 1 to feedBatches)
          feed.append((0L until 20L).map(k => (s"f-$i", k)).toDF("batch", "k"))
      } catch { case e: Throwable => failure.compareAndSet(null, e) }, "soak-feeder")
      @volatile var feederDone = false
      def refresher(name: String) = new Thread(() => try {
        while (!feederDone && failure.get() == null)
          MaintainedIndex.refresh(spark, feed, idx)(
            _.groupBy("batch").agg(count(lit(1)).as("n")))
      } catch { case e: Throwable => failure.compareAndSet(null, e) }, name)
      val r1 = refresher("soak-refresh-1"); val r2 = refresher("soak-refresh-2")
      feeder.start(); r1.start(); r2.start()
      feeder.join(waitMs); feederDone = true
      r1.join(waitMs); r2.join(waitMs)

      children.foreach { case (p, log) =>
        assert(p.waitFor(waitMs / 1000, java.util.concurrent.TimeUnit.SECONDS),
          s"child did not finish; log tail: ${tail(log)}")
        assert(p.exitValue() == 0, s"child failed; log tail: ${tail(log)}")
      }
      childrenDone = true
      reader.join(waitMs)
      if (failure.get() != null) throw failure.get()
      assert(polls > 3, s"reader barely ran ($polls polls) — soak proved nothing")

      // ---- no lost commit: every metadata marker survived the race
      val props = mixed.meta.allProperties
      val missingProps = (1 to metaN).flatMap(i =>
        Seq(s"m1-$i", s"m2-$i").filterNot(props.contains))
      assert(missingProps.isEmpty, s"lost property commits: $missingProps")

      // ---- no lost/zombie batch: exact survivor set (each spark child
      // deleted its own batch i-3 on every 7th op)
      val deleted = (1 to sparkN).filter(_ % 7 == 0).map(_ - 3).toSet
      val expected = (for {
        c <- Seq("s1", "s2"); i <- 1 to sparkN if !deleted(i)
      } yield s"$c-$i").toSet
      val got = mixed.read(spark).groupBy("batch").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.keySet == expected,
        s"batch set wrong: missing=${expected -- got.keySet} zombie=${got.keySet -- expected}")
      assert(got.values.forall(_ == 20L), s"incomplete batch: $got")

      // ---- index: one final catch-up refresh, then EXACTLY-ONCE check
      MaintainedIndex.refresh(spark, feed, idx)(
        _.groupBy("batch").agg(count(lit(1)).as("n")))
      val idxRows = idx.read(spark).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val dupes = idxRows.groupBy(_._1).filter(_._2.length > 1).keys.toSeq
      assert(dupes.isEmpty, s"CAS double-committed batches: $dupes")
      assert(idxRows.toMap == (1 to feedBatches).map(i => s"f-$i" -> 20L).toMap,
        "index content diverged from the feed")
    } finally srv.stop()
  }

  private def tail(log: java.nio.file.Path): String =
    try java.nio.file.Files.readString(log).takeRight(800)
    catch { case _: Throwable => "<no log>" }
}
