package graft.table

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import graft.table.GraftIO.RichHPath
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-writer crash-safety: concurrent append / MoR equality-delete /
  * expire / rewrite_manifests while an injected fault kills some
  * committers in the window BETWEEN staging their files and publishing
  * their version document — the hard-kill window of the commit protocol.
  * Invariants, under both the local `file` scheme and the non-local
  * scheme HadoopFsSpec drives (the object-store code path):
  *
  *  1. no committed snapshot is lost: table content equals the fold of
  *     exactly the operations whose commit succeeded;
  *  2. no surviving manifest references a missing file;
  *  3. the version-document chain is contiguous (a crashed committer
  *     never burns a version number);
  *  4. remove_orphan_files sweeps the crashed committers' staged debris
  *     and sweeps NOTHING that is referenced — content identical after.
  */
class CrashSafetySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def batch(from: Long, n: Long): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    (from until from + n).foreach(i =>
      rows.add(Row(i, if (i % 2 == 0) "even" else "odd", i * 1.5)))
    spark.createDataFrame(rows, schema)
  }

  private def localWarehouse(): HPath =
    new HPath(Files.createTempDirectory("graft_crash_local").toUri)

  private def graftfsWarehouse(): HPath = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val c = spark.sessionState.newHadoopConf()
    c.set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    GraftIO.setConf(c)
    new HPath("graftfs:" + Files.createTempDirectory("graft_crash_fs").toAbsolutePath)
  }

  private def scenario(wh: HPath): Unit = {
    val cat = new GraftCatalog(wh)
    cat.createSchema("db")
    val t0 = cat.createTable("db.crash", schema)
    t0.append(batch(0, 100)) // committed base, before any fault is armed

    // fault plan: the 2nd, 5th and 9th publish ATTEMPTS in the concurrent
    // phase die after staging (deterministic op-counter, not wall clock)
    val attempt = new AtomicInteger(0)
    val crashAt = Set(2, 5, 9)
    GraftIO.beforePublish = p =>
      if (p.getName.matches("v\\d+\\.json")
          && crashAt.contains(attempt.incrementAndGet()))
        throw new java.io.IOException("injected crash between stage and publish")

    val appended = new AtomicInteger(0) // successfully committed rows
    val eqDeleted = new AtomicInteger(0)
    try {
      val appenders = (0 until 4).map { k =>
        new Thread(() => {
          (0 until 3).foreach { j =>
            val t = cat.load("db.crash")
            try {
              t.append(batch(1000L + k * 100 + j * 10, 10))
              appended.addAndGet(10)
            } catch { case _: Exception => () } // crashed committer
          }
        })
      }
      val eqDeleter = new Thread(() => {
        import spark.implicits._
        val t = cat.load("db.crash")
        try {
          t.deleteMoREquality(spark, (0L until 10L).toDF("id"))
          eqDeleted.set(10)
        } catch { case _: Exception => () }
      })
      val maintenance = new Thread(() => {
        val t = cat.load("db.crash")
        (0 until 2).foreach { _ =>
          try {
            t.rewriteManifests()
            t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 60000,
              retainLast = 2)
          } catch { case _: Exception => () }
        }
      })
      val threads = appenders :+ eqDeleter :+ maintenance
      threads.foreach(_.start())
      threads.foreach(_.join())
    } finally GraftIO.beforePublish = null

    assert(attempt.get() >= 9, s"fault plan underran: ${attempt.get()} attempts")

    val t = cat.load("db.crash")
    // 1. content == fold of the committed ops only
    val expected = 100 - eqDeleted.get() + appended.get()
    assert(t.read(spark).count() === expected,
      s"content diverged from committed ops (appended=${appended.get()}, " +
        s"eqDeleted=${eqDeleted.get()})")

    // 2. no surviving manifest references a missing file
    val m = t.meta
    val referenced = m.snapshots.flatMap(s =>
      s.manifest.map(_.path) ++ s.allDeleteFiles.map(_.path) ++
        s.allEqDeleteFiles.map(_.path)).toSet
    referenced.foreach(p =>
      assert(GraftIO.exists(t.dir.resolve(p)), s"dangling manifest ref: $p"))

    // 3. contiguous version chain (crashed committers must not burn
    // version numbers: the document is only created on success)
    val versions = GraftIO.list(t.dir.resolve("meta"))
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.json") => n.drop(1).dropRight(5).toInt }
      .sorted
    assert(versions.toList === (1 to versions.max).toList, s"version gap: $versions")

    // 4. orphan sweep removes staged debris, keeps every referenced file,
    // and never changes content
    val swept = t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 60000)
    referenced.foreach(p =>
      assert(GraftIO.exists(t.dir.resolve(p)), s"sweep deleted referenced $p"))
    assert(t.read(spark).count() === expected, "sweep changed content")
    // after the sweep every remaining data file is referenced
    val leftover = GraftIO.listFilesRecursive(t.dir.resolve("data"))
      .map(st => GraftIO.relativize(t.dir, st.getPath))
      .filterNot(referenced)
    assert(leftover.isEmpty, s"unreferenced files survived the sweep: $leftover " +
      s"(swept: $swept)")
  }

  test("load() rides out a torn in-flight version document (non-local publish window)") {
    // Non-local publishExclusive is create+write+close: a concurrent
    // reader's forward probe sees v2.json between create() and close()
    // and must retry the parse, not crash. Simulate the window
    // deterministically: leave a truncated v2 on disk, complete it from
    // another thread mid-load.
    val wh = graftfsWarehouse()
    val cat = new GraftCatalog(wh)
    cat.createSchema("db")
    val t = cat.createTable("db.torn", schema)
    t.append(batch(0, 10))
    val v2 = t.dir.resolve("meta").resolve("v2.json")
    val full = GraftIO.readAllBytes(v2)
    GraftIO.write(v2, full.take(full.length / 2)) // in-flight: half the bytes
    val finisher = new Thread(() => {
      Thread.sleep(150)
      GraftIO.write(v2, full) // writer's close lands
    })
    finisher.start()
    val (v, m) = TableMeta.load(t.dir)
    finisher.join()
    assert(v === 2)
    assert(m.currentSnapshot.isDefined)
  }

  test("crashed committers between stage and publish: file scheme") {
    scenario(localWarehouse())
  }

  test("crashed committers between stage and publish: non-local scheme") {
    scenario(graftfsWarehouse())
  }
}
