package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** readChanges (CDC changelog) semantics per snapshot operation. */
class ChangelogSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def mkTable(name: String) = {
    val cat = new GraftCatalog(graft.Scratch.fresh("cdc_spec_wh"))
    cat.createSchema("db")
    cat.createTable(s"db.$name", schema)
  }

  private def rows(range: Range, tag: String) = {
    import spark.implicits._
    range.map(i => (i.toLong, tag)).toDF("k", "v")
  }

  private def changes(t: GraftTable, from: Int, to: Int): Seq[(Long, String, String, Long)] =
    t.readChanges(spark, from, to)
      .select(col("k"), col("v"), col("_change_type"), col("_commit_snapshot_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("appends emit only inserts, attributed to their snapshot") {
    val t = mkTable("app")
    t.append(rows(0 until 5, "a")) // snap 1
    t.append(rows(5 until 8, "b")) // snap 2
    val all = changes(t, 0, 2)
    assert(all.forall(_._3 == "insert"))
    assert(all.filter(_._4 == 1L).map(_._1).sorted == (0L until 5L))
    assert(all.filter(_._4 == 2L).map(_._1).sorted == (5L until 8L))
    // subrange: only the second snapshot's changes
    assert(changes(t, 1, 2).map(_._1).sorted == (5L until 8L))
  }

  test("MoR delete emits exactly the deleted rows as deletes") {
    val t = mkTable("mor")
    t.append(rows(0 until 10, "a"))
    t.deleteMoR(spark, col("k") >= 7)
    val ch = changes(t, 1, 2) // just the delete snapshot
    assert(ch.forall(_._3 == "delete"))
    assert(ch.map(_._1).sorted == (7L until 10L), ch.toString)
  }

  test("CoW delete emits file-level diff whose NET effect is the deleted rows") {
    val t = mkTable("cow")
    t.append(rows(0 until 10, "a"))
    t.delete(spark, col("k") >= 7) // CoW: rewrites the file
    val ch = changes(t, 1, 2)
    val dels = ch.filter(_._3 == "delete").map(_._1).toSet
    val ins = ch.filter(_._3 == "insert").map(_._1).toSet
    // rewritten-but-kept rows appear as delete+insert; net = truly deleted
    assert(dels -- ins == (7L until 10L).toSet, ch.toString)
    assert(ins.subsetOf(dels))
  }

  test("full-range changelog of append+MoR-delete replays to the live table") {
    val t = mkTable("replay")
    t.append(rows(0 until 10, "a"))
    t.deleteMoR(spark, col("k") % 3 === 0)
    t.append(rows(10 until 12, "b"))
    val ch = changes(t, 0, 3)
    val net = ch.groupBy(x => (x._1, x._2)).view.mapValues { evs =>
      evs.map(_._3).toSet
    }.toMap
    val replayed = net.collect { case ((k, _), types) if types == Set("insert") => k }.toSeq
    val live = t.read(spark).select("k").collect().map(_.getLong(0)).toSeq
    assert(replayed.sorted == live.sorted)
  }
}
