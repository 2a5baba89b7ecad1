package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** MaintainedIndex.refresh commits ONCE per call no matter how far the
  * index fell behind, and the expectLastBatch compare-and-swap keeps
  * racing refreshes from double-committing overlapping ranges. */
class BatchedRefreshSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def rows(range: Range, tag: String) = {
    import spark.implicits._
    range.map(i => (i.toLong, tag)).toDF("k", "v").coalesce(1)
  }

  test("an index 100 snapshots behind refreshes with exactly ONE commit") {
    val cat = new GraftCatalog(graft.Scratch.fresh("batch_src_wh"))
    cat.createSchema("db")
    val src = cat.createTable("db.src", schema)
    (0 until 100).foreach(i => src.append(rows(i * 10 until (i + 1) * 10, s"b$i")))
    assert(src.meta.snapshots.size === 100)

    val icat = new GraftCatalog(graft.Scratch.fresh("batch_idx_wh"))
    icat.createSchema("ix")
    val idx = icat.createTable("ix.idx", schema)
    val wm = MaintainedIndex.refresh(spark, src, idx)(identity)
    assert(wm === src.meta.currentSnapshotId.get)
    assert(idx.meta.snapshots.size === 1,
      "the whole 100-snapshot backlog must land in ONE index commit")
    // same rows as the per-snapshot path would produce: all of them, once
    val got = idx.read(spark).select("k").collect().map(_.getLong(0)).sorted
    assert(got === (0L until 1000L).toArray)

    // replayed refresh commits nothing
    assert(MaintainedIndex.refresh(spark, src, idx)(identity) === wm)
    assert(idx.meta.snapshots.size === 1)

    // two MORE source snapshots → one additional commit covering both
    src.append(rows(1000 until 1010, "c0"))
    src.append(rows(1010 until 1020, "c1"))
    val wm2 = MaintainedIndex.refresh(spark, src, idx)(identity)
    assert(wm2 === src.meta.currentSnapshotId.get)
    assert(idx.meta.snapshots.size === 2)
    assert(idx.read(spark).count() === 1020L)
  }

  test("expectLastBatch CAS: a stale planning point aborts instead of double-committing") {
    val cat = new GraftCatalog(graft.Scratch.fresh("cas_wh"))
    cat.createSchema("db")
    val t = cat.createTable("db.t", schema)
    // first committer at watermark 0 lands
    assert(t.appendStreamBatch(rows(0 until 5, "a"), "q", 1L,
      expectLastBatch = Some(0L)))
    // a racer that ALSO planned at watermark 0 (its payload would overlap
    // the rows batch 1 already committed) must abort...
    assert(!t.appendStreamBatch(rows(0 until 8, "a+b"), "q", 2L,
      expectLastBatch = Some(0L)))
    assert(t.meta.snapshots.size === 1)
    assert(t.read(spark).count() === 5L)
    // ...and a replan from the advanced watermark lands cleanly
    assert(t.appendStreamBatch(rows(5 until 8, "b"), "q", 2L,
      expectLastBatch = Some(1L)))
    assert(t.read(spark).count() === 8L)
    // without expectLastBatch the plain streaming-sink contract holds:
    // exact-key replay refused, fresh key accepted
    assert(!t.appendStreamBatch(rows(5 until 8, "b"), "q", 2L))
    assert(t.appendStreamBatch(rows(8 until 9, "c"), "q", 3L))
  }
}
