package graft.table

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

/** Per-file Bloom sidecar data skipping: point lookups prune files whose
  * key ranges overlap (where min/max stats are powerless), pruning is
  * never wrong, and unindexed tables are unaffected. */
class BloomSkipSpec extends SparkTestBase {

  /** Two appends with INTERLEAVED key ranges (even keys / odd keys):
    * both files span [0, N], so stats pruning keeps both for any point
    * lookup — only the bloom can tell them apart. */
  private def interleavedTable(): GraftTable = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft_wh"))
    cat.createSchema("db")
    val src = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val t = cat.createTable("db.orders", src.schema,
      properties = Map("write.bloom-filter-columns" -> "o_orderkey,o_orderstatus"))
    t.append(src.filter(col("o_orderkey") % 2 === 0).coalesce(1))
    t.append(src.filter(col("o_orderkey") % 2 === 1).coalesce(1))
    t
  }

  test("point lookup probes blooms: only the containing file survives") {
    val t = interleavedTable()
    val m = t.meta
    val all = m.currentSnapshot.get.manifest
    assert(all.size === 2)
    assert(all.forall(_.bloom.isDefined))

    val evenKey = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 2 === 0)
      .agg(min("o_orderkey")).head().getLong(0)
    val kept = t.planFilters(m, Seq(EqualTo("o_orderkey", evenKey)))
    assert(kept.size === 1, s"bloom should drop the odd-keys file, kept ${kept.size}")

    // pruned read + residual filter == full filter (pruning never wrong)
    val viaPruned = t.readPruned(spark, Seq(EqualTo("o_orderkey", evenKey)))
      .filter(col("o_orderkey") === evenKey).collect()
    val viaFull = t.read(spark)
      .filter(col("o_orderkey") === evenKey).collect()
    assert(viaPruned === viaFull)
    assert(viaPruned.length === 1)
  }

  test("absent key prunes every file; string columns probe too") {
    val t = interleavedTable()
    val m = t.meta
    assert(t.planFilters(m, Seq(EqualTo("o_orderkey", -12345L))).isEmpty)
    assert(t.readPruned(spark, Seq(EqualTo("o_orderkey", -12345L)))
      .filter(col("o_orderkey") === -12345L).count() === 0)
    // string probe: a status value that exists keeps ≥1 file, a bogus
    // one keeps none
    assert(t.planFilters(m, Seq(EqualTo("o_orderstatus", "F"))).nonEmpty)
    assert(t.planFilters(m, Seq(EqualTo("o_orderstatus", "ZZZ"))).isEmpty)
  }

  test("sidecars survive compaction-free maintenance and orphan sweep") {
    val t = interleavedTable()
    val removed = t.removeOrphanFiles(System.currentTimeMillis() + 60000)
    // the sweep clears write junk (_SUCCESS, .crc) but must keep every
    // referenced sidecar
    assert(!removed.exists(_.endsWith(".bloom")),
      s"live sidecars must not be orphans: $removed")
    // sidecar files really exist next to the data
    t.meta.currentSnapshot.get.manifest.flatMap(_.bloom).foreach { ref =>
      assert(Files.exists(t.localDir.resolve(ref)))
    }
  }

  test("partitioned write: one task, many partition dirs → per-file blooms stay distinct") {
    // a single-task write emits the SAME part-00000 basename into every
    // partition dir — blooms must key by full path or they'd merge and
    // stop pruning (regression for the basename-keyed first version)
    val cat = new GraftCatalog(Files.createTempDirectory("graft_wh"))
    cat.createSchema("db")
    val src = graft.Tables.events(spark, sfDir)
      .filter(col("event_id") < 400).coalesce(1)
    val t = cat.createTable("db.ev",
      org.apache.spark.sql.types.StructType(src.schema.fields.map(f =>
        f.copy(dataType = f.dataType))),
      partitionDays = Some("ts"),
      properties = Map("write.bloom-filter-columns" -> "event_id"))
    t.append(src)
    val m = t.meta
    val files = m.currentSnapshot.get.manifest
    assert(files.size > 1, "need multiple partition-dir files")
    assert(files.forall(_.bloom.isDefined))
    // an id from ONE file must bloom-prune the files that don't hold it:
    // stats ranges per day file may overlap arbitrary ids, but each
    // file's bloom was built from its own rows only
    val someId = spark.read.parquet(t.localDir.resolve(files.head.path).toString)
      .select(min(col("event_id"))).head().getLong(0)
    val kept = t.planFilters(m, Seq(EqualTo("event_id", someId)))
    assert(kept.map(_.path) === Seq(files.head.path),
      s"expected only the owning file, got ${kept.map(_.path)}")
  }

  test("no property → no sidecars, planning unchanged") {
    val cat = new GraftCatalog(Files.createTempDirectory("graft_wh"))
    cat.createSchema("db")
    val src = graft.Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val t = cat.createTable("db.plain", src.schema)
    t.append(src)
    assert(t.meta.currentSnapshot.get.manifest.forall(_.bloom.isEmpty))
  }
}
