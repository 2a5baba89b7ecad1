package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Versioned table metadata for the Graft table format (SURVEY.md §2 B/C/D/H
  * — the Iceberg-capability layer re-expressed natively over Parquet;
  * reference semantics at /root/reference/README.md:167-328).
  *
  * One JSON document per metadata version at `meta/v<N>.json`; the current
  * version is the integer in `meta/version-hint.text`, swapped by atomic
  * rename — a reader always sees a complete, immutable version. Snapshots
  * are never mutated: every commit writes a NEW manifest list, so old
  * snapshots keep their file lists forever (time travel) until expired.
  *
  * Scale notes: metadata size is O(files·snapshots-retained); compaction
  * (rewriteDataFiles) and expireSnapshots exist precisely to bound both
  * factors. Planning reads one JSON file — no data-proportional work.
  */
final case class ColumnDef(id: Int, name: String, dataType: String) {
  def sparkType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DataType.fromJson(dataType)
}

/** Hidden-partitioning spec field: `transform(sourceId)` materialized at
  * write under `name`, invisible in the logical schema (README.md:304-307). */
final case class PartitionField(sourceId: Int, transform: String, name: String)

/** Per-file, per-column [min, max] (stringified; compared typed by the
  * planner). */
final case class ColRange(min: String, max: String)

/** One immutable parquet data file. `schemaId` pins the schema the file was
  * written under — the read path maps its columns to the current schema by
  * column id (rename-safe, README.md:282-292). `partitionValues` and
  * `stats` drive file pruning before Spark ever sees a path; `stats` is
  * Optional so metadata written before the field existed still parses. */
final case class DataFile(
    path: String,
    rows: Long,
    schemaId: Int,
    partitionValues: Map[String, String],
    stats: Option[Map[String, ColRange]] = None)

final case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | delete | replace
    manifest: Seq[DataFile])

final case class TableMeta(
    formatVersion: Int,
    name: String,
    schemas: Map[String, Seq[ColumnDef]], // schemaId (as string for JSON) -> columns
    currentSchemaId: Int,
    lastColumnId: Int,
    partitionFields: Seq[PartitionField],
    snapshots: Seq[Snapshot],
    currentSnapshotId: Option[Long]) {

  def currentSchema: Seq[ColumnDef] = schemas(currentSchemaId.toString)
  def schemaAt(id: Int): Seq[ColumnDef] = schemas(id.toString)

  def snapshot(id: Long): Snapshot =
    snapshots.find(_.snapshotId == id)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $id in table $name"))

  def currentSnapshot: Option[Snapshot] = currentSnapshotId.map(snapshot)

  def sparkSchema(schemaId: Int): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      schemaAt(schemaId).map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.sparkType, nullable = true)))
}

object TableMeta {
  implicit val formats: Formats = DefaultFormats

  def write(meta: TableMeta, path: Path): Unit =
    Files.write(path, Serialization.writePretty(meta).getBytes(StandardCharsets.UTF_8))

  def read(path: Path): TableMeta =
    Serialization.read[TableMeta](
      new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  /** Current metadata version of a table dir, via the version hint. */
  def currentVersion(tableDir: Path): Int =
    new String(Files.readAllBytes(tableDir.resolve("meta").resolve("version-hint.text")),
      StandardCharsets.UTF_8).trim.toInt

  def load(tableDir: Path): (Int, TableMeta) = {
    val v = currentVersion(tableDir)
    (v, read(tableDir.resolve("meta").resolve(s"v$v.json")))
  }

  /** Atomic commit: v<N+1>.json must not exist (optimistic single-writer
    * check), then the hint pointer is swapped by atomic rename. */
  def commit(tableDir: Path, expectedVersion: Int, meta: TableMeta): Int = {
    val metaDir = tableDir.resolve("meta")
    val next = expectedVersion + 1
    val target = metaDir.resolve(s"v$next.json")
    if (Files.exists(target))
      throw new IllegalStateException(
        s"concurrent commit detected: $target already exists")
    write(meta, target)
    val tmp = Files.createTempFile(metaDir, "hint", ".tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaDir.resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    next
  }
}
