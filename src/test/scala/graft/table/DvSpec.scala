package graft.table

import graft.SparkTestBase
import graft.table.GraftIO.RichHPath
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deletion vectors (Iceberg v3 direction): codec round-trip, the
  * one-vector-per-file supersede rule, equivalence with the other delete
  * mechanisms, compaction fold, CDC delta exactness, time travel, GC
  * retention, and clone carry. */
class DvSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def mkCat() = {
    val cat = new GraftCatalog(graft.Scratch.fresh("dv_spec_wh"))
    cat.createSchema("db")
    cat
  }

  private def rows(range: Range, tag: String) = {
    import spark.implicits._
    range.map(i => (i.toLong, tag)).toDF("k", "v")
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("k").collect().map(_.getLong(0)).toSeq.sorted

  private def dvsOf(t: GraftTable): Seq[DeleteVector] =
    t.meta.currentSnapshot.map(_.allDeleteVectors).getOrElse(Nil)

  test("codec round-trips sparse, dense and multi-container sets canonically") {
    // sparse array container, dense bitmap container (> 4096 in one
    // 64k block), and positions straddling container boundaries
    val sparse = Array(0L, 1L, 65535L, 65536L, 1000000L)
    val dense = (0L until 5000L).map(_ * 2).toArray // 5000 > ArrayMax in block 0
    val straddle = (65000L until 66000L).toArray
    for (s <- Seq(sparse, dense, straddle, Array.empty[Long])) {
      assert(Dv.deserialize(Dv.serialize(s)).toSeq === s.distinct.sorted.toSeq)
    }
    // canonical: same set in any order => same bytes
    assert(Dv.serialize(sparse.reverse).toSeq === Dv.serialize(sparse).toSeq)
    // a single deleted row in a huge file costs ~bytes, not rows/8
    assert(Dv.serialize(Array(9999999L)).length < 64)
  }

  test("DV delete equals CoW and MoR-positional deletes on the same predicate") {
    val cat = mkCat()
    val dv = cat.createTable("db.t_dv", schema)
    val cow = cat.createTable("db.t_cow", schema)
    val mor = cat.createTable("db.t_mor", schema)
    Seq(dv, cow, mor).foreach { t =>
      t.append(rows(0 until 200, "a")); t.append(rows(200 until 400, "b"))
    }
    dv.deleteMoRDv(spark, col("k") % 7 === 0)
    cow.delete(spark, col("k") % 7 === 0)
    mor.deleteMoR(spark, col("k") % 7 === 0)
    val expect = (0L until 400L).filter(_ % 7 != 0)
    assert(keys(dv.read(spark)) === expect)
    assert(keys(dv.read(spark)) === keys(cow.read(spark)))
    assert(keys(dv.read(spark)) === keys(mor.read(spark)))
    // MoR property: no data file rewritten — manifest unchanged
    val m = dv.meta
    assert(m.currentSnapshot.get.manifest.map(_.path).toSet ===
      m.snapshot(m.currentSnapshot.get.parentId.get).manifest.map(_.path).toSet)
  }

  test("second delete SUPERSEDES: one merged vector per file, old vector GC-able") {
    val cat = mkCat()
    val t = cat.createTable("db.t_sup", schema)
    t.append(rows(0 until 100, "a"))
    t.deleteMoRDv(spark, col("k") < 10)
    val firstDvs = dvsOf(t)
    assert(firstDvs.nonEmpty)
    t.deleteMoRDv(spark, col("k") >= 90)
    val dvs = dvsOf(t)
    // v3 invariant: at most one vector per data file
    assert(dvs.groupBy(_.dataPath).forall(_._2.size == 1))
    // the replacement merged the superseded positions
    val touched = dvs.filter(d => firstDvs.exists(_.dataPath == d.dataPath))
    assert(touched.nonEmpty)
    assert(keys(t.read(spark)) === (10L until 90L))
    // cardinality sums to the true delete count
    assert(dvs.map(_.cardinality).sum === 20L)
    // delete on already-dead rows is a no-op commit (nothing matched)
    val verBefore = t.meta.currentSnapshotId
    t.deleteMoRDv(spark, col("k") < 5)
    assert(t.meta.currentSnapshotId === verBefore)
  }

  test("compaction folds vectors in and clears them; time travel still sees them") {
    val cat = mkCat()
    val t = cat.createTable("db.t_fold", schema)
    t.append(rows(0 until 100, "a"))
    t.deleteMoRDv(spark, col("k") % 3 === 0)
    val snapWithDv = t.meta.currentSnapshotId.get
    t.rewriteDataFiles(spark, targetFiles = 1)
    val cur = t.meta.currentSnapshot.get
    assert(cur.allDeleteVectors.isEmpty, "replace must clear folded vectors")
    assert(keys(t.read(spark)) === (0L until 100L).filter(_ % 3 != 0))
    // the pre-compaction snapshot still reads through its vector
    assert(keys(t.readVersion(spark, snapWithDv)) ===
      (0L until 100L).filter(_ % 3 != 0))
  }

  test("CDC delta is exactly the rows a DV commit killed") {
    val cat = mkCat()
    val t = cat.createTable("db.t_cdc", schema)
    t.append(rows(0 until 50, "a"))
    t.deleteMoRDv(spark, col("k") < 5)   // kills 0..4
    t.deleteMoRDv(spark, col("k") >= 45) // kills 45..49 (supersede-merge)
    val n = t.meta.snapshots.size
    val ch = t.readChanges(spark, 0, n)
    val dels = ch.filter(col("_change_type") === "delete")
    assert(keys(dels) === ((0L until 5L) ++ (45L until 50L)))
    // the SECOND commit's delta is only 45..49, not the merged 0..4 again
    val lastDels = ch.filter(col("_change_type") === "delete" &&
      col("_commit_snapshot_id") === t.meta.currentSnapshotId.get)
    assert(keys(lastDels) === (45L until 50L))
  }

  test("expire + orphan GC keep live vectors, drop superseded ones") {
    val cat = mkCat()
    val t = cat.createTable("db.t_gc", schema)
    t.append(rows(0 until 100, "a"))
    t.deleteMoRDv(spark, col("k") < 10)
    val superseded = dvsOf(t).map(_.path).toSet
    t.deleteMoRDv(spark, col("k") >= 90)
    val live = dvsOf(t).map(_.path).toSet
    t.expireSnapshots(olderThanMs = Long.MaxValue, retainLast = 1)
    val removed = t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 60000L)
    live.foreach { p =>
      assert(GraftIO.exists(t.dir.resolve(p)), s"live vector $p must survive GC")
    }
    // the superseded vector is referenced by no retained snapshot
    (superseded -- live).foreach { p =>
      assert(!GraftIO.exists(t.dir.resolve(p)), s"superseded vector $p must be GC'd")
    }
    assert(keys(t.read(spark)) === (10L until 90L))
  }

  test("shallow and deep clones carry deletion vectors") {
    val cat = mkCat()
    val src = cat.createTable("db.t_cl", schema)
    src.append(rows(0 until 60, "a"))
    src.deleteMoRDv(spark, col("k") % 2 === 1)
    val shallow = src.cloneTo(cat, "db.t_cl_s")
    assert(keys(shallow.read(spark)) === (0L until 60L).filter(_ % 2 == 0))
    val deep = src.deepCloneTo(cat, "db.t_cl_d")
    assert(keys(deep.read(spark)) === (0L until 60L).filter(_ % 2 == 0))
    // deep clone is independent: source compaction+expire can't break it
    src.rewriteDataFiles(spark, targetFiles = 1)
    src.expireSnapshots(olderThanMs = Long.MaxValue, retainLast = 1)
    src.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 60000L)
    assert(keys(deep.read(spark)) === (0L until 60L).filter(_ % 2 == 0))
  }

  test("DVs disable the manifest aggregate fast path; SQL count/min/max stay exact") {
    val cat = mkCat()
    val t = cat.createTable("db.t_agg", schema)
    t.append(rows(0 until 100, "a"))
    assert(t.metaAggregate(Seq("k")).isDefined)
    t.deleteMoRDv(spark, col("k") >= 95) // kills the max extremum
    // manifest counts now overcount and max names a deleted row — the
    // fast path must refuse (fall back to a real scan), like the
    // positional/equality delete guards
    assert(t.metaAggregate(Seq("k")).isEmpty,
      "DV-carrying snapshot must not answer from manifest stats")
    // and through the SQL catalog (DSv2 COMPLETE aggregate pushdown):
    val cname = "dv_agg_cat"
    spark.conf.set(s"spark.sql.catalog.$cname",
      classOf[graft.spark.GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$cname.warehouse", cat.warehouse.toString)
    val r = spark.sql(
      s"SELECT count(*) AS c, min(k) AS mn, max(k) AS mx FROM $cname.db.t_agg").head()
    assert(r.getLong(0) === 95L)
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === 94L)
  }

  test(".files metadata table lists vectors; delete-suffix guard fires") {
    val cat = mkCat()
    val t = cat.createTable("db.t_meta", schema)
    t.append(rows(0 until 30, "a"))
    t.deleteMoRDv(spark, col("k") < 3)
    val files = t.metaTable(spark, "files")
    assert(files.filter(col("content") === "deletion_vector").count() >= 1)
  }
}
