package graft.table

import java.sql.Timestamp

import graft.SparkTestBase
import graft.table.GraftIO.RichHPath
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The maintenance-procedure invariants (expire_snapshots,
  * rewrite_data_files, rewrite_position_deletes, remove_orphan_files)
  * PARAMETERIZED over the warehouse scheme. TableSpec proves them on
  * file:// with java.nio checks; this battery re-proves them with
  * scheme-agnostic GraftIO checks so the SAME suite runs against a
  * live graftsvc:// service — the recursive-delete and rename
  * semantics of the HTTP filesystem (GraftFsServer DELETE ?recursive,
  * /rename) carry real GC responsibility there and deserve identical
  * invariants, not just the commit-path coverage GraftFsServiceSpec
  * gives them. */
abstract class MaintenanceParitySpec extends SparkTestBase {

  /** Scheme label for test names. */
  def scheme: String
  /** Fresh warehouse root under the scheme + a closer. */
  def makeWarehouse(): (HPath, () => Unit)

  private val schemaDef = StructType(Seq(
    StructField("id", StringType), StructField("grp", StringType),
    StructField("v", LongType)))

  private def df(tag: String, n: Int = 8): DataFrame = {
    val rows = (0 until n).map(i => Row(s"$tag-$i", if (i % 2 == 0) "a" else "b", i.toLong))
    val l = new java.util.ArrayList[Row](); rows.foreach(l.add)
    spark.createDataFrame(l, schemaDef)
  }

  private def contentHash(d: DataFrame): java.math.BigDecimal =
    d.selectExpr("CAST(xxhash64(to_json(struct(*))) AS DECIMAL(38,0)) AS h")
      .agg(coalesce(sum("h"), lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)

  private def dataFiles(t: GraftTable): Seq[HPath] =
    GraftIO.listFilesRecursive(t.dir.resolve("data"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))

  private def withTable(name: String)(body: (GraftCatalog, GraftTable) => Unit): Unit = {
    val (wh, close) = makeWarehouse()
    try {
      val cat = new GraftCatalog(wh)
      cat.createSchema("db")
      body(cat, cat.createTable(s"db.$name", schemaDef))
    } finally close()
  }

  test(s"[$scheme] expire_snapshots GCs expired files through the scheme; current intact") {
    withTable("exp") { (_, t) =>
      t.append(df("x")); t.append(df("y"))
      t.delete(spark, col("grp") === "a") // CoW rewrite: snapshot 3
      val before = contentHash(t.read(spark))
      t.rewriteDataFiles(spark, targetFiles = 1)
      assert(t.meta.currentSnapshot.get.manifest.size == 1)
      assert(contentHash(t.read(spark)) == before)
      val onDisk = dataFiles(t).size
      t.expireSnapshots(olderThanMs = Long.MaxValue, retainLast = 1)
      assert(t.meta.snapshots.size == 1)
      assert(dataFiles(t).size < onDisk,
        "expire must physically delete unreferenced files through the scheme")
      assert(contentHash(t.read(spark)) == before)
      intercept[IllegalArgumentException](t.readVersion(spark, 1))
    }
  }

  test(s"[$scheme] compaction folds MoR deletes; expire GCs the orphaned delete file") {
    withTable("mor") { (_, t) =>
      t.append(df("x"))
      t.deleteMoR(spark, col("grp") === "a")
      val delFile = t.dir.resolve(t.meta.currentSnapshot.get.allDeleteFiles.head.path)
      assert(GraftIO.exists(delFile))
      assert(t.read(spark).count() == 4)
      t.rewriteDataFiles(spark, targetFiles = 1)
      assert(t.meta.currentSnapshot.get.allDeleteFiles.isEmpty,
        "compaction must fold MoR deletes in")
      t.expireSnapshots(olderThanMs = Long.MaxValue, retainLast = 1)
      assert(!GraftIO.exists(delFile), "orphaned delete file must be GC'd")
      assert(t.read(spark).count() == 4)
      assert(t.read(spark).filter(col("grp") === "a").count() == 0)
    }
  }

  test(s"[$scheme] rewrite_position_deletes folds DVs to ≤1 per file; data untouched") {
    withTable("dv") { (_, t) =>
      t.append(df("x", 12))
      t.deleteMoRDv(spark, col("v") === 1L)
      t.deleteMoRDv(spark, col("v") === 3L)
      val before = contentHash(t.read(spark))
      val dataBefore = dataFiles(t).map(_.toString).toSet
      val (inFiles, outFiles) = t.rewritePositionDeletes(spark)
      assert(inFiles >= outFiles)
      val snap = t.meta.currentSnapshot.get
      val perFile = snap.deleteVectors.getOrElse(Nil).groupBy(_.dataPath)
      assert(perFile.values.forall(_.size <= 1), "fold must leave ≤1 DV per data file")
      assert(dataFiles(t).map(_.toString).toSet == dataBefore,
        "fold must not rewrite data files")
      assert(contentHash(t.read(spark)) == before)
    }
  }

  test(s"[$scheme] remove_orphan_files deletes debris, never live files") {
    withTable("orph") { (_, t) =>
      t.append(df("x"))
      val before = contentHash(t.read(spark))
      val debris = t.dir.resolve("data").resolve("debris-0000.parquet")
      GraftIO.write(debris, Array.fill(64)(7.toByte))
      assert(GraftIO.exists(debris))
      val removed = t.removeOrphanFiles(olderThanMs = Long.MaxValue)
      assert(removed.exists(_.contains("debris-0000.parquet")),
        s"debris not collected (removed: $removed)")
      assert(!GraftIO.exists(debris))
      assert(contentHash(t.read(spark)) == before, "orphan GC touched live data")
      assert(t.removeOrphanFiles(olderThanMs = Long.MaxValue).isEmpty)
    }
  }
}

class LocalMaintenanceParitySpec extends MaintenanceParitySpec {
  override def scheme: String = "file"
  override def makeWarehouse(): (HPath, () => Unit) =
    (GraftIO.fromNio(java.nio.file.Files.createTempDirectory("graft_mx_local")),
      () => ())
}

class ServiceMaintenanceParitySpec extends MaintenanceParitySpec {
  override def scheme: String = "graftsvc"
  override def makeWarehouse(): (HPath, () => Unit) = {
    val root = java.nio.file.Files.createTempDirectory("graft_mx_svc")
    val srv = GraftFsServer.serve(root)
    (new HPath(s"graftsvc://127.0.0.1:${srv.port}/wh"), () => srv.stop())
  }
}
