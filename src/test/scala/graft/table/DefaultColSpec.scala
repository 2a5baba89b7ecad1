package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ADD COLUMN ... DEFAULT (Iceberg v3 default values): initial-default
  * for pre-existing rows, write-default materialization, explicit NULL
  * preservation, rename/widen safety via column ids, SQL DDL path. */
class DefaultColSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def mkTable(name: String) = {
    val cat = new GraftCatalog(graft.Scratch.fresh("default_spec_wh"))
    cat.createSchema("db")
    (cat, cat.createTable(s"db.$name", schema))
  }

  private def rows(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, s"v$i")).toDF("k", "v")
  }

  test("old rows read the frozen default; omitted column materializes; explicit null survives") {
    val (_, t) = mkTable("t1")
    t.append(rows(0 until 10)) // epoch 1: column absent
    t.addColumn("score", IntegerType, default = Some("7"))
    t.append(rows(10 until 20)) // write-default fills
    import spark.implicits._
    t.append((20 until 30).map(i => (i.toLong, s"v$i", null.asInstanceOf[Integer]))
      .toDF("k", "v", "score")) // explicit NULL stays NULL
    val got = t.read(spark).select("k", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    (0 until 20).foreach(i => assert(got(i.toLong) === Some(7), s"row $i"))
    (20 until 30).foreach(i => assert(got(i.toLong) === None, s"row $i"))
    // the materialization is PHYSICAL: read the epoch-2 files raw
    val epoch2 = t.meta.currentSnapshot.get.manifest
      .filter(_.schemaId == t.meta.currentSchemaId)
    assert(epoch2.nonEmpty)
  }

  test("rename and widen carry the default (id-resolved)") {
    val (_, t) = mkTable("t2")
    t.append(rows(0 until 5))
    t.addColumn("score", IntegerType, default = Some("7"))
    t.renameColumn("score", "rating")
    t.widenColumn("rating", LongType)
    val got = t.read(spark).select("k", "rating").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach(i => assert(got(i.toLong) === 7L))
  }

  test("a bad default literal fails the DDL, not a later read") {
    val (_, t) = mkTable("t3")
    t.append(rows(0 until 3))
    intercept[IllegalArgumentException] {
      t.addColumn("n", IntegerType, default = Some("not-a-number"))
    }
  }

  test("SQL ALTER TABLE ADD COLUMN DEFAULT flows through the v2 catalog") {
    val (cat, t) = mkTable("t4")
    t.append(rows(0 until 6))
    val cname = "graft_default_spec"
    spark.conf.set(s"spark.sql.catalog.$cname",
      classOf[graft.spark.GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$cname.warehouse",
      cat.warehouse.toString)
    spark.sql(s"ALTER TABLE $cname.db.t4 ADD COLUMN region STRING DEFAULT 'emea'")
    val vals = t.read(spark).select("region").distinct().collect().map(_.getString(0))
    assert(vals.toSeq === Seq("emea"))
    // DEFAULT NULL is the same as no default
    spark.sql(s"ALTER TABLE $cname.db.t4 ADD COLUMN extra INT DEFAULT NULL")
    assert(t.read(spark).filter(col("extra").isNotNull).count() === 0)
  }
}
