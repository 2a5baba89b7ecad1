package graft.table

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, IsNotNull, IsNull}

/** IS [NOT] NULL pruning from footer null counts: all-null files are
  * skipped by IS NOT NULL, null-free files by IS NULL, and pruning
  * never changes results. */
class NullPruneSpec extends SparkTestBase {

  /** append 1: F-status rows with priority NULLed (all-null file);
    * append 2: the rest with priority intact (null-free file). */
  private def sparseTable(): GraftTable = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft_wh"))
    cat.createSchema("db")
    val src = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    val t = cat.createTable("db.orders", src.schema)
    t.append(src.filter(col("o_orderstatus") === "F")
      .withColumn("o_orderpriority", lit(null).cast("string")).coalesce(1))
    t.append(src.filter(col("o_orderstatus") =!= "F").coalesce(1))
    t
  }

  test("IS NOT NULL skips the all-null file; IS NULL skips the null-free file") {
    val t = sparseTable()
    val m = t.meta
    val all = m.currentSnapshot.get.manifest
    assert(all.size === 2)
    assert(all.forall(_.nulls.exists(_.contains("o_orderpriority"))))

    val keptNotNull = t.planFilters(m, Seq(IsNotNull("o_orderpriority")))
    assert(keptNotNull.size === 1)
    assert(keptNotNull.head.nulls.get("o_orderpriority") === 0L)

    val keptNull = t.planFilters(m, Seq(IsNull("o_orderpriority")))
    assert(keptNull.size === 1)
    assert(keptNull.head.nulls.get("o_orderpriority") === keptNull.head.rows)
  }

  test("pruned read + residual == full filter, both polarities") {
    val t = sparseTable()
    val notNull = t.readPruned(spark, Seq(IsNotNull("o_orderpriority")))
      .filter(col("o_orderpriority").isNotNull).count()
    assert(notNull === t.read(spark).filter(col("o_orderpriority").isNotNull).count())
    val isNull = t.readPruned(spark, Seq(IsNull("o_orderpriority")))
      .filter(col("o_orderpriority").isNull).count()
    assert(isNull === t.read(spark).filter(col("o_orderpriority").isNull).count())
    assert(notNull > 0 && isNull > 0)
  }

  test("nullness composes with bounds; conflicting claims are ignored") {
    val t = sparseTable()
    val m = t.meta
    // IsNotNull + equality on the same scan: both prunes apply
    val kept = t.planFilters(m,
      Seq(IsNotNull("o_orderpriority"), EqualTo("o_orderstatus", "O")))
    assert(kept.size <= 1)
    // IS NULL AND IS NOT NULL on one column: unsatisfiable, but the
    // pruner must not guess — no file is dropped on that column's account
    val conflicted = t.planFilters(m,
      Seq(IsNull("o_orderpriority"), IsNotNull("o_orderpriority")))
    assert(conflicted.size === 2)
  }
}
