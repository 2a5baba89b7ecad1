package graft.table

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types.StructType

import GraftIO.RichHPath

/** Filesystem catalog: `warehouse/<schema>/<table>/` (SURVEY.md §2 A1/B1).
  * Replaces the reference's REST catalog + MinIO object store
  * (README.md:59-81) with direct metadata-file access — resolution cost is
  * one directory path, no HTTP hop. All IO goes through Hadoop
  * `FileSystem` (GraftIO), so the warehouse root may be any supported
  * URI: a local dir in tests, `hdfs://` or `s3a://` at cluster scale.
  */
final class GraftCatalog(val warehouse: HPath) {

  /** Local-path convenience (tests, tools). */
  def this(warehouse: java.nio.file.Path) = this(GraftIO.fromNio(warehouse))

  /** B1 `CREATE SCHEMA IF NOT EXISTS` (README.md:159) — idempotent. */
  def createSchema(name: String): Unit =
    GraftIO.mkdirs(warehouse.resolve(name))

  /** B2 `CREATE TABLE ... USING iceberg TBLPROPERTIES('format-version'='2')`
    * (README.md:167-177): assign stable column ids (the indirection that
    * makes rename metadata-only), write metadata v1 with no snapshot. */
  def createTable(
      qualified: String,
      schema: StructType,
      partitionDays: Option[String] = None,
      partitionSpec: Seq[(String, String)] = Nil,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val dir = tableDir(qualified)
    if (GraftIO.exists(dir.resolve("meta")))
      throw new IllegalStateException(s"table $qualified already exists")
    GraftIO.mkdirs(dir.resolve("meta"))
    GraftIO.mkdirs(dir.resolve("data"))
    // "_graft_" names are reserved for physical helper columns (row
    // lineage materialization, scan position) — a user column with that
    // prefix would collide with them inside rewritten parquet
    schema.fields.foreach(f => require(!f.name.startsWith("_graft_"),
      s"column name ${f.name} uses the reserved _graft_ prefix"))
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      ColumnDef(i + 1, f.name, f.dataType.json)
    }.toSeq
    // partitionDays is the historical days()-only parameter; partitionSpec
    // is (sourceCol -> transform) for the full family, e.g.
    // ("o_custkey", "bucket[8]") — see Transforms.
    val specs = partitionDays.map(_ -> "days").toSeq ++ partitionSpec
    val pf = specs.map { case (colName, transform) =>
      val src = cols.find(_.name == colName).getOrElse(
        throw new IllegalArgumentException(s"no column $colName to partition by"))
      Transforms.validate(transform, src.sparkType)
      PartitionField(src.id, transform, Transforms.fieldName(transform, colName))
    }
    // write.sort-order at CREATE routes to the declared order exactly
    // like the ALTER SET TBLPROPERTIES path (GraftTable.setProperties) —
    // the two SQL paths must not diverge
    val sortIds = properties.get("write.sort-order").map { v =>
      v.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map(c =>
        cols.find(_.name == c).getOrElse(throw new IllegalArgumentException(
          s"write.sort-order names unknown column $c")).id)
    }.filter(_.nonEmpty)
    val meta = TableMeta(
      formatVersion = 2, name = qualified,
      schemas = Map("1" -> cols), currentSchemaId = 1,
      lastColumnId = cols.size,
      partitionFields = pf, snapshots = Nil, currentSnapshotId = None,
      // TBLPROPERTIES land in the SAME v1 commit as the table itself —
      // a crash between "create" and "set properties" must not leave a
      // policy-less table behind
      tableProperties = if (properties.isEmpty) None else Some(properties),
      sortOrderIds = sortIds)
    TableMeta.write(meta, dir.resolve("meta").resolve("v1.json"))
    GraftIO.write(dir.resolve("meta").resolve("version-hint.text"), "1".getBytes)
    new GraftTable(dir)
  }

  def load(qualified: String): GraftTable = new GraftTable(tableDir(qualified))

  /** `DROP TABLE` — removes data + metadata (the filesystem catalog's
    * purge; there is no shared object store to orphan into). Returns
    * whether the table existed. */
  def dropTable(qualified: String): Boolean = {
    val dir = tableDir(qualified)
    if (!GraftIO.exists(dir.resolve("meta").resolve("version-hint.text"))) false
    else {
      GraftIO.deleteRecursive(dir)
      true
    }
  }

  /** `ALTER TABLE ... RENAME TO` — a directory move plus a metadata
    * commit recording the new qualified name. The move is atomic on a
    * single filesystem (same warehouse root by construction); on object
    * stores Hadoop's rename is a copy+delete — still safe here because
    * the destination-must-not-exist guard serializes racing renames at
    * the final metadata commit. */
  def renameTable(from: String, to: String): Unit = {
    val src = tableDir(from)
    val dst = tableDir(to)
    require(GraftIO.exists(src.resolve("meta").resolve("version-hint.text")), s"no table $from")
    require(!GraftIO.exists(dst), s"table $to already exists")
    // the target NAMESPACE must already exist — fabricating it here would
    // move the table into a schema nobody created. Throw the analysis
    // exception Spark's rename path translates into SCHEMA_NOT_FOUND
    // (a bare require would surface as an internal-looking stack trace)
    if (!GraftIO.isDirectory(dst.getParent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        Seq(dst.getParent.getName))
    GraftIO.rename(src, dst)
    TableMeta.commitRetry(dst)(m => m.copy(name = to))
  }

  def tableExists(qualified: String): Boolean =
    qualified.split('.').length == 2 && // e.g. db.t.partitions is a metadata table, not a table
      GraftIO.exists(tableDir(qualified).resolve("meta").resolve("version-hint.text"))

  // ------------------------------------------------------------- views

  /** CREATE [OR REPLACE] VIEW — persists the SQL text + resolution
    * context as versioned warehouse metadata (GraftViews). Refuses to
    * shadow a table; createTable's existing meta/ guard refuses the
    * reverse direction. */
  def createView(
      qualified: String,
      sql: String,
      defaultCatalog: String,
      defaultNamespace: Seq[String],
      schemaJson: String,
      comment: Option[String] = None,
      properties: Map[String, String] = Map.empty,
      replace: Boolean = false): GraftViewDef = {
    require(tableExists(qualified) == false,
      s"cannot create view $qualified: a TABLE with that name exists")
    val dir = tableDir(qualified)
    if (!GraftIO.isDirectory(dir.getParent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        Seq(dir.getParent.getName))
    GraftViews.publish(dir, GraftViewDef(
      name = qualified, sql = sql,
      defaultCatalog = defaultCatalog, defaultNamespace = defaultNamespace,
      schemaJson = schemaJson, comment = comment,
      properties = if (properties.isEmpty) None else Some(properties)),
      replace = replace)
  }

  def viewExists(qualified: String): Boolean =
    qualified.split('.').length == 2 && GraftViews.exists(tableDir(qualified))

  def loadView(qualified: String): Option[GraftViewDef] =
    if (qualified.split('.').length != 2) None
    else GraftViews.load(tableDir(qualified))

  /** DROP VIEW — removes the definition directory. Returns whether the
    * view existed. Never touches tables (guarded on the view marker). */
  def dropView(qualified: String): Boolean = {
    val dir = tableDir(qualified)
    if (!GraftViews.exists(dir)) false
    else { GraftIO.deleteRecursive(dir); true }
  }

  /** ALTER VIEW ... RENAME TO — directory move, same contract as
    * renameTable (destination must not exist, namespace must exist). */
  def renameView(from: String, to: String): Unit = {
    val src = tableDir(from)
    val dst = tableDir(to)
    require(GraftViews.exists(src), s"no view $from")
    require(!GraftIO.exists(dst), s"table or view $to already exists")
    if (!GraftIO.isDirectory(dst.getParent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        Seq(dst.getParent.getName))
    GraftIO.rename(src, dst)
    // re-stamp the stored name so loadView reports the new identity
    val d = GraftViews.load(dst).get
    GraftViews.publish(dst, d.copy(name = to), replace = true)
  }

  def listViews(schema: String): Seq[String] = {
    val ns = warehouse.resolve(schema)
    if (!GraftIO.isDirectory(ns)) Nil
    else GraftIO.list(ns).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => GraftViews.exists(ns.resolve(n))).sorted
  }

  private def tableDir(qualified: String): HPath = {
    val parts = qualified.split('.')
    require(parts.length == 2, s"expected schema.table, got $qualified")
    warehouse.resolve(parts(0)).resolve(parts(1))
  }
}
