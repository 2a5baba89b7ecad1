package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Write-audit-publish (branch staging) semantics. */
class WapSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def mkTable(name: String) = {
    val cat = new GraftCatalog(graft.Scratch.fresh("wap_spec_wh"))
    cat.createSchema("db")
    cat.createTable(s"db.$name", schema)
  }

  private def rows(range: Range, tag: String) = {
    import spark.implicits._
    range.map(i => (i.toLong, tag)).toDF("k", "v")
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("k").collect().map(_.getLong(0)).toSeq.sorted

  test("staged rows are invisible on main, visible on the branch, then published") {
    val t = mkTable("wap")
    t.append(rows(0 until 5, "main"))
    val staged = t.appendToBranch("audit", rows(5 until 9, "staged"))
    assert(keys(t.read(spark)) == (0L until 5L), "stage must not touch main")
    assert(keys(t.readRef(spark, "audit")) == (0L until 9L), "branch sees main + staged")
    assert(keys(t.readVersion(spark, staged)) == (0L until 9L))
    t.publishBranch("audit")
    assert(keys(t.read(spark)) == (0L until 9L), "publish fast-forwards main")
  }

  test("publish refuses when main advanced past the stage point (lost-commit guard)") {
    val t = mkTable("guard")
    t.append(rows(0 until 3, "main"))
    t.appendToBranch("audit", rows(3 until 5, "staged"))
    t.append(rows(5 until 7, "late")) // lands on main AFTER the stage
    val ex = intercept[IllegalArgumentException] { t.publishBranch("audit") }
    assert(ex.getMessage.contains("fast-forward"), ex.getMessage)
    assert(keys(t.read(spark)) == ((0L until 3L) ++ (5L until 7L)), "main intact")
  }

  test("streaming tail stalls at a staged snapshot and resumes after publish") {
    val t = mkTable("tail")
    t.append(rows(0 until 4, "main"))
    t.appendToBranch("audit", rows(4 until 6, "staged"))

    def drainKeys(ckpt: String): Seq[Long] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("graft").load(t.dir.toString)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized { buf ++= df.collect().map(_.getLong(0)) }: Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      buf.toSeq.sorted
    }

    val ckpt = graft.Scratch.fresh("wap_tail_ckpt").toString
    assert(drainKeys(ckpt) == (0L until 4L), "unpublished stage must not leak")
    t.publishBranch("audit")
    assert(drainKeys(ckpt) == (4L until 6L), "after publish the tail resumes in order")
  }
}
