package graft.table

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.time.LocalDate

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import GraftIO.RichHPath

/** Export failed because the snapshot state has no data-only Iceberg
  * image (merge-on-read deletes pending) or uses a type/transform the
  * exporter does not cover — the message says which and what to run. */
final class IcebergExportUnsupported(msg: String) extends RuntimeException(msg)

/** FORMAT half of Iceberg interop (VERDICT r14 #3): write a Graft
  * table's snapshot history as spec-compliant **Iceberg v2** metadata —
  * TableMetadata JSON + Avro manifest lists + Avro manifests — under
  * `<table>/metadata/` (the HadoopCatalog layout: `v<N>.metadata.json`
  * + `version-hint.text`, N = the Graft metadata version, so exports
  * are per-version idempotent). Everything here is from the PUBLIC
  * Iceberg table spec (field ids 100–517, manifest/manifest-list
  * schemas, single-value partition representations); Avro ships in
  * /opt/spark/jars — no Iceberg jar involved.
  *
  * What is exported, exactly:
  *  - every schema version with its COLUMN IDS (rename/evolution
  *    history stays id-resolved, like the Graft originals);
  *  - the current partition spec (spec-id 0, field-ids from 1000) with
  *    typed partition values per data file (day → date ordinal,
  *    month/year/hour → offsets from epoch, bucket → int, identity/
  *    truncate → source-typed) re-derived from Graft's stringified
  *    partition values;
  *  - the current-snapshot ancestor chain, oldest first, with
  *    sequence numbers assigned in chain order; per snapshot one
  *    manifest (ADDED/EXISTING entry statuses derived against the
  *    previous exported snapshot) and one manifest list; snapshot log
  *    and refs (`main` + tags/branches that point into the chain).
  *
  * Deliberate caveats, each LOUD:
  *  - merge-on-read state (positional/equality deletes, DVs) has no
  *    data-only image: export REFUSES while the current snapshot
  *    carries any (run `CALL system.rewrite_position_deletes` +
  *    `rewrite_data_files` first); MoR ancestors are skipped from the
  *    exported history (their time travel is not representable).
  *  - nested column types and non-primitive partition sources are
  *    rejected (Graft assigns ids to top-level columns only).
  *  - per-file column stats (bounds/null counts) are not exported —
  *    manifests carry the required fields (content/path/format/
  *    partition/record_count/file_size); readers fall back to footers.
  *  - file URIs inside manifests are warehouse-anchored (the table
  *    dir's own scheme/paths), the HadoopCatalog convention: a reader
  *    on another host needs the warehouse mounted (or a path-mapping
  *    FileIO), exactly as with a file:// Iceberg warehouse.
  *
  * No external Iceberg reader exists in this sandbox, so conformance
  * is proven by IcebergExportSpec: golden-shape assertions on the JSON
  * plus an INDEPENDENT minimal Avro re-read of every manifest list and
  * manifest (field ids, statuses, paths, record counts, partition
  * values). */
object IcebergExport {

  private implicit val fmts: Formats = DefaultFormats

  /** Export table `t`'s current metadata version; returns the metadata
    * JSON path and the number of snapshots exported. Idempotent per
    * version: an existing `v<N>.metadata.json` is returned as-is. */
  def export(t: GraftTable): (HPath, Int) = {
    val dir = t.dir
    val (v, m) = TableMeta.load(dir)
    val metaDir = dir.resolve("metadata")
    val out = metaDir.resolve(s"v$v.metadata.json")

    def mor(s: Snapshot): Boolean =
      s.allDeleteFiles.nonEmpty || s.allEqDeleteFiles.nonEmpty ||
        s.allDeleteVectors.nonEmpty
    m.currentSnapshot.foreach { cur =>
      if (mor(cur)) throw new IcebergExportUnsupported(
        s"table ${m.name} current snapshot ${cur.snapshotId} carries merge-on-read " +
          "state (position/equality deletes or deletion vectors) — Iceberg export " +
          "writes data manifests only; run CALL system.rewrite_position_deletes " +
          "and system.rewrite_data_files first")
    }
    // oldest-first current-ancestor chain, MoR snapshots skipped
    val chainIds = m.currentSnapshotId.map { cur =>
      var ids = List.empty[Long]
      var c: Option[Long] = Some(cur)
      while (c.isDefined) { ids = c.get :: ids; c = m.snapshot(c.get).parentId }
      ids
    }.getOrElse(Nil)
    val chain = chainIds.map(m.snapshot).filterNot(mor)

    if (GraftIO.exists(out)) return (out, chain.size)
    GraftIO.mkdirs(metaDir)

    // fail BEFORE writing anything if a type/transform is out of scope
    m.schemas.values.flatten.foreach(c => icebergType(c.sparkType))
    val pfs = m.partitionFields
    val pfSources: Seq[(PartitionField, DataType)] = pfs.map { pf =>
      val src = m.currentSchema.find(_.id == pf.sourceId).getOrElse(
        throw new IcebergExportUnsupported(
          s"partition field ${pf.name}: source column id ${pf.sourceId} " +
            "is not in the current schema"))
      pf -> src.sparkType
    }
    pfSources.foreach { case (pf, st) => partitionAvroType(pf, st) } // validate

    val specFieldsJson = JArray(pfs.zipWithIndex.map { case (pf, i) =>
      JObject("name" -> JString(pf.name),
        "transform" -> JString(icebergTransform(pf.transform)),
        "source-id" -> JInt(pf.sourceId), "field-id" -> JInt(1000 + i))
    }.toList)
    val currentSchemaJson = schemaJson(m.currentSchemaId, m.currentSchema)
    val partitionRecordSchema = new Schema.Parser().parse(
      partitionRecordJson(pfSources))
    val entrySchema = new Schema.Parser().parse(
      manifestEntryJson(partitionRecordJson(pfSources)))
    val listSchema = new Schema.Parser().parse(ManifestListJson)

    // sequence numbers in chain order; per-file first-seen tracking
    val seqOf: Map[Long, Long] =
      chain.zipWithIndex.map { case (s, i) => s.snapshotId -> (i + 1L) }.toMap
    val firstSeen = scala.collection.mutable.Map.empty[String, (Long, Long)]
    var prevPaths = Set.empty[String]
    val snapshotJsons = scala.collection.mutable.ListBuffer.empty[JObject]
    chain.foreach { s =>
      val seq = seqOf(s.snapshotId)
      // one manifest per snapshot: its full live file set, ADDED when
      // first seen on the exported chain, EXISTING (at its original
      // sequence number + adding snapshot) after
      val entries = s.manifest.map { f =>
        val (addedSnap, addedSeq) =
          firstSeen.getOrElseUpdate(f.path, (s.snapshotId, seq))
        val status = if (addedSeq == seq && !prevPaths.contains(f.path)) 1 else 0
        (f, status, addedSnap, addedSeq)
      }
      prevPaths = s.manifest.map(_.path).toSet
      val manifestBytes = writeAvro(entrySchema, Map(
        "schema" -> JsonMethods.compact(JsonMethods.render(currentSchemaJson)),
        "schema-id" -> m.currentSchemaId.toString,
        "partition-spec" -> JsonMethods.compact(JsonMethods.render(specFieldsJson)),
        "partition-spec-id" -> "0",
        "format-version" -> "2",
        "content" -> "data"),
        entries.map { case (f, status, addedSnap, addedSeq) =>
          val r = new GenericData.Record(entrySchema)
          r.put("status", status)
          r.put("snapshot_id", java.lang.Long.valueOf(addedSnap))
          r.put("sequence_number", java.lang.Long.valueOf(addedSeq))
          r.put("file_sequence_number", java.lang.Long.valueOf(addedSeq))
          val df = new GenericData.Record(entrySchema.getField("data_file").schema())
          df.put("content", 0)
          df.put("file_path", dir.resolve(f.path).toString)
          df.put("file_format", "PARQUET")
          val part = new GenericData.Record(partitionRecordSchema)
          pfSources.foreach { case (pf, st) =>
            part.put(pf.name, partitionAvroValue(pf, st,
              f.partitionValues.get(pf.name)))
          }
          df.put("partition", part)
          df.put("record_count", f.rows)
          df.put("file_size_in_bytes", f.sizeBytes.getOrElse(0L))
          r.put("data_file", df)
          r
        })
      val manifestPath = metaDir.resolve(s"snap-${s.snapshotId}-m0.avro")
      GraftIO.write(manifestPath, manifestBytes)

      val added = entries.filter(_._2 == 1)
      val existing = entries.filter(_._2 == 0)
      val listRec = new GenericData.Record(listSchema)
      listRec.put("manifest_path", manifestPath.toString)
      listRec.put("manifest_length", manifestBytes.length.toLong)
      listRec.put("partition_spec_id", 0)
      listRec.put("content", 0)
      listRec.put("sequence_number", seq)
      listRec.put("min_sequence_number",
        entries.map(_._4).minOption.getOrElse(seq))
      listRec.put("added_snapshot_id", s.snapshotId)
      listRec.put("added_data_files_count", added.size)
      listRec.put("existing_data_files_count", existing.size)
      listRec.put("deleted_data_files_count", 0)
      listRec.put("added_rows_count", added.map(_._1.rows).sum)
      listRec.put("existing_rows_count", existing.map(_._1.rows).sum)
      listRec.put("deleted_rows_count", 0L)
      val listBytes = writeAvro(listSchema, Map(
        "format-version" -> "2",
        "snapshot-id" -> s.snapshotId.toString,
        "parent-snapshot-id" -> s.parentId.map(_.toString).getOrElse("null"),
        "sequence-number" -> seq.toString), Seq(listRec))
      val listName = s"snap-${s.snapshotId}-1-" +
        java.util.UUID.nameUUIDFromBytes(
          s"${m.name}:${s.snapshotId}".getBytes(StandardCharsets.UTF_8)) + ".avro"
      val listPath = metaDir.resolve(listName)
      GraftIO.write(listPath, listBytes)

      snapshotJsons += JObject(List[JField](
        "snapshot-id" -> JLong(s.snapshotId),
        "timestamp-ms" -> JLong(s.timestampMs),
        "sequence-number" -> JLong(seq),
        "summary" -> JObject("operation" -> JString(icebergOperation(s.operation))),
        "manifest-list" -> JString(listPath.toString),
        "schema-id" -> JInt(m.currentSchemaId)) ++
        s.parentId.filter(seqOf.contains)
          .map(p => ("parent-snapshot-id", JLong(p): JValue)).toList)
    }

    val sortOrders =
      if (m.sortOrder.isEmpty)
        (0, JArray(List(JObject("order-id" -> JInt(0), "fields" -> JArray(Nil)))))
      else (1, JArray(List(JObject("order-id" -> JInt(1), "fields" -> JArray(
        m.sortOrder.map(id => JObject(
          "transform" -> JString("identity"), "source-id" -> JInt(id),
          "direction" -> JString("asc"), "null-order" -> JString("nulls-first")))
          .toList)))))
    val exportedIds = chain.map(_.snapshotId).toSet
    val refs = JObject(
      m.currentSnapshotId.map(cur => ("main", JObject(
        "snapshot-id" -> JLong(cur), "type" -> JString("branch")): JValue)).toList ++
        m.allRefs.toList.collect { case (n, r) if exportedIds(r.snapshotId) && n != "main" =>
          (n, JObject("snapshot-id" -> JLong(r.snapshotId),
            "type" -> JString(if (r.branch) "branch" else "tag")): JValue)
        })
    val metadata = JObject(
      "format-version" -> JInt(2),
      "table-uuid" -> JString(java.util.UUID.nameUUIDFromBytes(
        s"graft:${m.name}:${dir.toString}".getBytes(StandardCharsets.UTF_8)).toString),
      "location" -> JString(dir.toString),
      "last-sequence-number" -> JLong(chain.size.toLong),
      "last-updated-ms" -> JLong(chain.lastOption.map(_.timestampMs).getOrElse(0L)),
      "last-column-id" -> JInt(m.lastColumnId),
      "current-schema-id" -> JInt(m.currentSchemaId),
      "schemas" -> JArray(m.schemas.toList.map { case (sid, cols) =>
        schemaJson(sid.toInt, cols) }.sortBy(j => (j \ "schema-id").extract[Int])),
      "default-spec-id" -> JInt(0),
      "partition-specs" -> JArray(List(JObject(
        "spec-id" -> JInt(0), "fields" -> specFieldsJson))),
      "last-partition-id" -> JInt(999 + pfs.size),
      "default-sort-order-id" -> JInt(sortOrders._1),
      "sort-orders" -> sortOrders._2,
      "properties" -> JObject(m.allProperties.toList.sortBy(_._1)
        .map { case (k, vv) => k -> (JString(vv): JValue) }),
      "current-snapshot-id" -> m.currentSnapshotId
        .map(id => JLong(id): JValue).getOrElse(JLong(-1L)),
      "refs" -> refs,
      "snapshots" -> JArray(snapshotJsons.toList),
      "snapshot-log" -> JArray(chain.map(s => JObject(
        "timestamp-ms" -> JLong(s.timestampMs),
        "snapshot-id" -> JLong(s.snapshotId)): JValue).toList),
      "metadata-log" -> JArray(Nil))
    GraftIO.write(out, JsonMethods.pretty(JsonMethods.render(metadata))
      .getBytes(StandardCharsets.UTF_8))
    GraftIO.writeAtomicReplace(metaDir.resolve("version-hint.text"),
      v.toString.getBytes(StandardCharsets.UTF_8))
    (out, chain.size)
  }

  // ------------------------------------------------------------ pieces

  private[table] def icebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IcebergExportUnsupported(
      s"column type ${other.sql} has no Iceberg v2 primitive mapping " +
        "(nested types are out of the export subset)")
  }

  private def schemaJson(sid: Int, cols: Seq[ColumnDef]): JObject =
    JObject("type" -> JString("struct"), "schema-id" -> JInt(sid),
      "fields" -> JArray(cols.map(c => JObject(
        "id" -> JInt(c.id), "name" -> JString(c.name),
        "required" -> JBool(false),
        "type" -> JString(icebergType(c.sparkType))): JValue).toList))

  private[table] def icebergTransform(spec: String): String = {
    val (name, param) = Transforms.parse(spec)
    (name, param) match {
      case ("days", _) => "day"
      case ("months", _) => "month"
      case ("years", _) => "year"
      case ("hours", _) => "hour"
      case ("identity", _) => "identity"
      case ("bucket", Some(n)) => s"bucket[$n]"
      case ("truncate", Some(w)) => s"truncate[$w]"
      case other => throw new IcebergExportUnsupported(s"transform $other")
    }
  }

  /** Avro type JSON for one partition field (the spec's partition-result
    * types: day → date, month/year/hour/bucket → int, identity/truncate
    * → the source type). */
  private def partitionAvroType(pf: PartitionField, srcType: DataType): String = {
    def sourceTyped: String = srcType match {
      case ByteType | ShortType | IntegerType => "\"int\""
      case LongType => "\"long\""
      case StringType => "\"string\""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case other => throw new IcebergExportUnsupported(
        s"partition field ${pf.name}: identity/truncate over ${other.sql} " +
          "is out of the export subset")
    }
    Transforms.parse(pf.transform)._1 match {
      case "days" => """{"type":"int","logicalType":"date"}"""
      case "months" | "years" | "hours" | "bucket" => "\"int\""
      case "identity" | "truncate" => sourceTyped
      case other => throw new IcebergExportUnsupported(s"transform $other")
    }
  }

  /** Typed partition value from Graft's stringified directory value. */
  private def partitionAvroValue(pf: PartitionField, srcType: DataType,
      pv: Option[String]): AnyRef = pv match {
    case None => null
    case Some("__HIVE_DEFAULT_PARTITION__") => null
    case Some(s) =>
      def intV(i: Int): AnyRef = java.lang.Integer.valueOf(i)
      Transforms.parse(pf.transform)._1 match {
        case "days" => intV(LocalDate.parse(s).toEpochDay.toInt)
        case "months" =>
          val Array(y, mo) = s.split('-'); intV((y.toInt - 1970) * 12 + mo.toInt - 1)
        case "years" => intV(s.toInt - 1970)
        case "hours" =>
          val d = LocalDate.parse(s.substring(0, 10))
          intV((d.toEpochDay * 24 + s.substring(11, 13).toInt).toInt)
        case "bucket" => intV(s.toInt)
        case "identity" | "truncate" => srcType match {
          case ByteType | ShortType | IntegerType => intV(s.toInt)
          case LongType => java.lang.Long.valueOf(s.toLong)
          case StringType => s
          case DateType => intV(LocalDate.parse(s).toEpochDay.toInt)
          case other => throw new IcebergExportUnsupported(
            s"partition value over ${other.sql}")
        }
        case other => throw new IcebergExportUnsupported(s"transform $other")
      }
  }

  private def icebergOperation(op: String): String = op match {
    case "append" => "append"
    case "delete" => "delete"
    case "replace" => "replace"
    case _ => "overwrite" // update / merge / overwrite / dyn-overwrite
  }

  private def partitionRecordJson(pfSources: Seq[(PartitionField, DataType)]): String =
    pfSources.zipWithIndex.map { case ((pf, st), i) =>
      s"""{"name":"${pf.name}","type":["null",${partitionAvroType(pf, st)}],""" +
        s""""default":null,"field-id":${1000 + i}}"""
    }.mkString("""{"type":"record","name":"r102","fields":[""", ",", "]}")

  /** Iceberg v2 manifest_entry Avro schema (spec field ids). */
  private def manifestEntryJson(partitionJson: String): String =
    s"""{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","field-id":102,"type":$partitionJson},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104}
      ]}}]}"""

  /** Iceberg v2 manifest_file (manifest list entry) Avro schema. */
  private val ManifestListJson =
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_data_files_count","type":"int","field-id":504},
      {"name":"existing_data_files_count","type":"int","field-id":505},
      {"name":"deleted_data_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514}
    ]}"""

  private def writeAvro(schema: Schema, meta: Map[String, String],
      records: Seq[GenericData.Record]): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericData.Record](
      new GenericDatumWriter[GenericData.Record](schema))
    meta.toSeq.sortBy(_._1).foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, baos)
    records.foreach(w.append)
    w.close()
    baos.toByteArray
  }
}
