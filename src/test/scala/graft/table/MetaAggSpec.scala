package graft.table

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** GraftTable.metaAggregate: exact manifest-only aggregates, the
  * zero-IO property, and the delete-file soundness guard. */
class MetaAggSpec extends SparkTestBase {

  private def freshTable(): GraftTable = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft_wh"))
    cat.createSchema("db")
    val t = cat.createTable("db.li", graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag").schema)
    t
  }

  test("count/min/max match a real scan across multiple appends") {
    val t = freshTable()
    val src = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    t.append(src.filter(col("l_orderkey") % 2 === 0))
    t.append(src.filter(col("l_orderkey") % 2 === 1))

    val agg = t.metaAggregate(Seq("l_orderkey", "l_quantity", "l_returnflag")).get
    val real = t.read(spark).agg(
      count(lit(1)), min("l_orderkey"), max("l_orderkey"),
      min("l_quantity"), max("l_quantity")).head()

    assert(agg.rows === real.getLong(0))
    assert(agg.minMax("l_orderkey").min.toLong === real.getLong(1))
    assert(agg.minMax("l_orderkey").max.toLong === real.getLong(2))
    assert(BigDecimal(agg.minMax("l_quantity").min).toDouble === real.getDouble(3))
    assert(BigDecimal(agg.minMax("l_quantity").max).toDouble === real.getDouble(4))
    // string columns are ineligible (writer-truncated stats unsafe for
    // exact answers) — must be absent, not wrong
    assert(!agg.minMax.contains("l_returnflag"))
  }

  test("zero data-file IO: answers survive deleting every data file") {
    val t = freshTable()
    t.append(graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag").limit(1000))
    val before = t.metaAggregate(Seq("l_orderkey")).get

    // vaporize the data, keep the metadata
    Files.walk(t.localDir).iterator().forEachRemaining { p =>
      if (p.toString.endsWith(".parquet")) Files.delete(p)
    }
    val after = t.metaAggregate(Seq("l_orderkey")).get
    assert(after === before)
    assert(after.rows === 1000L)
  }

  test("soundness guard: any delete file disables the fast path") {
    val t = freshTable()
    t.append(graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag"))
    assert(t.metaAggregate(Seq("l_orderkey")).isDefined)
    t.deleteMoR(spark, col("l_returnflag") === "R")
    assert(t.metaAggregate(Seq("l_orderkey")).isEmpty)
  }
}
