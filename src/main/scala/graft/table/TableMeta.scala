package graft.table

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{Path => HPath}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import GraftIO.RichHPath

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
/** `default` is the Iceberg v3 initial-default: the value rows written
  * BEFORE the column existed read (instead of NULL) — metadata-only, no
  * file rewrite. Stored as a plain string the read path casts to the
  * column type (`lit(default).cast(type)`); frozen at ADD COLUMN time
  * and carried by the ColumnDef through renames/widenings (id-resolved,
  * so both are safe). New appends that omit the column materialize the
  * value physically (the write-default half). */
final case class ColumnDef(id: Int, name: String, dataType: String,
    default: Option[String] = None) {
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
    stats: Option[Map[String, ColRange]] = None,
    // Data sequence: the snapshot id whose commit first added this file
    // (stamped in appendSnapshot). Equality deletes apply only to files
    // with seq < the delete's seq — Iceberg v2's sequence-number rule
    // that keeps later appends of a deleted key alive. None (legacy
    // metadata) reads as 0: older than any equality delete.
    seq: Option[Long] = None,
    // On-disk bytes (None in legacy metadata): drives size-based
    // compaction planning without touching the filesystem.
    sizeBytes: Option[Long] = None,
    // Relative path of the per-file Bloom sidecar (BloomSidecar):
    // equality-predicate data skipping. None = not indexed.
    bloom: Option[String] = None,
    // Per-column null counts from the footers (only columns where every
    // row group reported numNulls): IS [NOT] NULL pruning — a file
    // that's all-null (or null-free) for the column is skipped outright.
    nulls: Option[Map[String, Long]] = None,
    // v3 ROW LINEAGE: the first row id of this file — row N of the file
    // has durable id firstRowId + N. Assigned at commit from the table's
    // nextRowId counter (Iceberg v3's first-row-id mechanism). None on
    // legacy entries AND on rewritten files that carry MATERIALIZED
    // per-row ids instead (see materializedLineage).
    firstRowId: Option[Long] = None,
    // True when the file physically contains the reserved _graft_row_id /
    // _graft_last_seq columns (written by lineage-preserving rewrites:
    // compaction, CoW delete/update) — readers take those over the
    // firstRowId+position derivation.
    materializedLineage: Option[Boolean] = None)

/** Iceberg v2 EQUALITY delete file: parquet of key tuples; any row in a
  * data file with seq < this delete's `seq` whose key tuple matches is
  * deleted. Written without reading the table (O(keys) cost — the
  * CDC-upsert workhorse where positional deletes need a scan).
  * `columns` are the names AS WRITTEN in the key parquet; `columnIds`
  * are the schema ids those names had at delete time — reads resolve
  * ids to CURRENT names, so a later column rename can't break (or
  * silently un-apply) a pending delete. Iceberg records field ids for
  * the same reason. */
final case class EqDeleteFile(
    path: String, rows: Long, columns: Seq[String], seq: Long,
    columnIds: Option[Seq[Int]] = None)

/** Iceberg v3-style DELETION VECTOR: one compact position bitmap (Dv
  * codec) per data file. `dataPath` is the manifest path of the file the
  * vector applies to; the v3 invariant — at most ONE vector per data
  * file per snapshot — is maintained by the writer (deleteMoRDv merges
  * the superseded vector's positions before committing), so reads never
  * stack vectors and a file's delete state is a single O(deletes/8)-byte
  * artifact no matter how many delete commits touched it. */
final case class DeleteVector(dataPath: String, path: String, cardinality: Long)

/** `deleteFiles` (Iceberg v2 merge-on-read): parquet files of
  * (file_path, pos) rows marking deleted positions in data files; the
  * read path anti-joins them away. Option so metadata written before the
  * field existed still parses; entries pointing at data files that were
  * later rewritten are inert (the anti-join simply never matches) and are
  * cleared entirely by compaction. */
final case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | delete | update | merge | replace | overwrite
    manifest: Seq[DataFile],
    deleteFiles: Option[Seq[DataFile]] = None,
    // streaming-sink provenance "queryId#batchId": makes micro-batch
    // appends idempotent across retries (GraftTable.appendStreamBatch)
    streamBatch: Option[String] = None,
    // equality delete files (see EqDeleteFile); Option for old metadata
    eqDeleteFiles: Option[Seq[EqDeleteFile]] = None,
    // Structural sharing: the manifest lives in immutable chunk files
    // under meta/ (`man-*.json`), referenced here in concatenation
    // order; an append reuses its parent's chunks and adds one delta
    // chunk, so the metadata DOCUMENT stays O(1) per append instead of
    // O(files) — the Iceberg manifest-list move. In memory `manifest`
    // is always hydrated (TableMeta.read resolves refs); on disk the
    // document stores refs and an empty manifest. Legacy inline
    // manifests (refs absent) still load.
    manifestRefs: Option[Seq[String]] = None,
    // v3-style deletion vectors (see DeleteVector); Option for old metadata
    deleteVectors: Option[Seq[DeleteVector]] = None) {
  def allDeleteFiles: Seq[DataFile] = deleteFiles.getOrElse(Nil)
  def allEqDeleteFiles: Seq[EqDeleteFile] = eqDeleteFiles.getOrElse(Nil)
  def allDeleteVectors: Seq[DeleteVector] = deleteVectors.getOrElse(Nil)
}

/** Iceberg-style named ref: a TAG (immutable bookmark) or BRANCH
  * (movable pointer). Refs pin their snapshot against expireSnapshots. */
final case class SnapshotRef(snapshotId: Long, branch: Boolean)

final case class TableMeta(
    formatVersion: Int,
    name: String,
    schemas: Map[String, Seq[ColumnDef]], // schemaId (as string for JSON) -> columns
    currentSchemaId: Int,
    lastColumnId: Int,
    partitionFields: Seq[PartitionField],
    snapshots: Seq[Snapshot],
    currentSnapshotId: Option[Long],
    // Max EXPIRED streaming batchId per queryId: exactly-once replay
    // detection must survive expire_snapshots dropping the snapshot that
    // carried the key (GraftTable.appendStreamBatch / expireSnapshots).
    // BatchIds are monotonic per query, so one watermark per queryId
    // gives the same detection in O(queries) space — a key list would
    // grow with every batch ever committed and be re-serialized on every
    // commit (unbounded metadata bloat on a long-running sink).
    retiredStreamBatches: Option[Map[String, Long]] = None,
    // named refs (tags/branches); Option so pre-refs metadata still parses
    refs: Option[Map[String, SnapshotRef]] = None,
    // Declared write sort order (Iceberg `WRITE ORDERED BY`): column ids
    // every append range-clusters and sorts by — per-file min/max stats
    // stay disjoint WITHOUT waiting for a sorted compaction, so stats
    // pruning works from the first append. Ids, not names: rename-safe.
    sortOrderIds: Option[Seq[Int]] = None,
    // User table properties (TBLPROPERTIES) — free-form; well-known keys
    // (write.target-file-size-bytes) steer maintenance defaults.
    tableProperties: Option[Map[String, String]] = None,
    // v3 row lineage: the next unassigned row id (monotone across the
    // table's whole history — commits stamp new files' firstRowId from
    // it and advance it by their row counts). None = 0 (legacy).
    nextRowId: Option[Long] = None) {

  def sortOrder: Seq[Int] = sortOrderIds.getOrElse(Nil)
  def allProperties: Map[String, String] = tableProperties.getOrElse(Map.empty)

  /** Max committed streaming batch id for `queryId` (0 = none): live
    * snapshot provenance keys ("<queryId>#<batchId>", exact query-id
    * match on the LAST '#') plus the retired watermark expire folds
    * dropped keys into. THE single definition — the exactly-once replay
    * check (GraftTable.appendStreamBatch), its expectLastBatch CAS, and
    * MaintainedIndex.watermark must all agree on this number. */
  def maxStreamBatch(queryId: String): Long = {
    val live = snapshots.flatMap(_.streamBatch).flatMap { k =>
      val i = k.lastIndexOf('#')
      if (i > 0 && k.substring(0, i) == queryId) k.substring(i + 1).toLongOption
      else None
    }
    val retired = retiredStreamBatches.flatMap(_.get(queryId))
    (live ++ retired).maxOption.getOrElse(0L)
  }

  def allRefs: Map[String, SnapshotRef] = refs.getOrElse(Map.empty)

  def currentSchema: Seq[ColumnDef] = schemas(currentSchemaId.toString)
  def schemaAt(id: Int): Seq[ColumnDef] = schemas(id.toString)

  def snapshot(id: Long): Snapshot =
    snapshots.find(_.snapshotId == id)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $id in table $name"))

  def currentSnapshot: Option[Snapshot] = currentSnapshotId.map(snapshot)

  /** Snapshot ids on the parent chain from `fromId` (inclusive). */
  def ancestorIds(fromId: Long): Set[Long] = {
    var seen = Set.empty[Long]
    var cur: Option[Long] = Some(fromId)
    while (cur.isDefined && !seen.contains(cur.get)) {
      seen += cur.get
      cur = snapshots.find(_.snapshotId == cur.get).flatMap(_.parentId)
    }
    seen
  }

  /** Length of the snapshot-list prefix safe for a streaming tail to
    * consume: stops at the first BRANCH-STAGED, NOT-YET-PUBLISHED
    * snapshot (reachable from a branch ref but not an ancestor of
    * current) — emitting it would leak unpublished WAP data into the
    * stream. Once the branch publishes (or is dropped+expired) the
    * prefix advances and the tail resumes in order. Rollback orphans
    * (no ref) do NOT block: they are past history, not pending data. */
  def publishedPrefix: Int = {
    val published = currentSnapshotId.map(ancestorIds).getOrElse(Set.empty)
    val staged = allRefs.values.filter(_.branch).map(_.snapshotId)
      .flatMap(ancestorIds).toSet -- published
    val idx = snapshots.indexWhere(s => staged.contains(s.snapshotId))
    if (idx < 0) snapshots.size else idx
  }

  def sparkSchema(schemaId: Int): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      schemaAt(schemaId).map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.sparkType, nullable = true)))
}

/** A racing writer won the version we tried to create. Retryable for
  * reapplicable updates (see TableMeta.commitRetry). */
final class ConcurrentCommitException(msg: String, cause: Throwable)
  extends RuntimeException(msg, cause)

object TableMeta {
  implicit val formats: Formats = DefaultFormats

  // Manifest chunk files are immutable once written (UUID-named, never
  // rewritten), so a process-wide cache keyed by absolute path is always
  // coherent; crudely bounded — correctness never depends on a hit.
  private val chunkCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFile]]()

  private def readChunk(metaDir: HPath, ref: String): Seq[DataFile] = {
    val key = metaDir.resolve(ref).toString
    val hit = chunkCache.get(key)
    if (hit != null) hit
    else {
      val v: Seq[DataFile] = Serialization.read[List[DataFile]](
        new String(GraftIO.readAllBytes(metaDir.resolve(ref)), StandardCharsets.UTF_8))
      if (chunkCache.size > 4096) chunkCache.clear()
      chunkCache.put(key, v)
      v
    }
  }

  private[table] def writeChunk(metaDir: HPath, files: Seq[DataFile]): String = {
    val ref = s"man-${java.util.UUID.randomUUID().toString.take(16)}.json"
    GraftIO.write(metaDir.resolve(ref),
      Serialization.write(files).getBytes(StandardCharsets.UTF_8))
    chunkCache.put(metaDir.resolve(ref).toString, files)
    ref
  }

  /** Resolve chunk refs into in-memory manifests (after parse). */
  private def hydrate(meta: TableMeta, metaDir: HPath): TableMeta =
    meta.copy(snapshots = meta.snapshots.map { s =>
      s.manifestRefs match {
        case Some(refs) if s.manifest.isEmpty && refs.nonEmpty =>
          s.copy(manifest = refs.flatMap(readChunk(metaDir, _)).toVector)
        case _ => s
      }
    })

  /** Export manifests as shared chunk files and strip them from the
    * document. A snapshot whose manifest extends its parent's (appends,
    * metadata-only commits) reuses the parent's chunks plus one delta
    * chunk; anything else (CoW rewrite, compaction, overwrite) writes a
    * fresh full chunk. Snapshots already carrying refs (loaded from
    * disk) are reused verbatim — chunks are immutable. */
  private def dehydrate(meta: TableMeta, metaDir: HPath): TableMeta = {
    val done = scala.collection.mutable.Map.empty[Long, (Seq[String], Seq[DataFile])]
    val outSnaps = meta.snapshots.map { s =>
      val refs: Seq[String] = s.manifestRefs match {
        case Some(r) => r // already on disk from a prior version
        case None =>
          s.parentId.flatMap(done.get) match {
            case Some((prefs, pman)) if pman.size <= s.manifest.size &&
                s.manifest.take(pman.size) == pman =>
              val delta = s.manifest.drop(pman.size)
              if (delta.isEmpty) prefs else prefs :+ writeChunk(metaDir, delta)
            case _ => Seq(writeChunk(metaDir, s.manifest))
          }
      }
      done(s.snapshotId) = (refs, s.manifest)
      s.copy(manifest = Nil, manifestRefs = Some(refs))
    }
    meta.copy(snapshots = outSnaps)
  }

  def write(meta: TableMeta, path: HPath): Unit =
    GraftIO.write(path, Serialization.writePretty(dehydrate(meta, path.getParent))
      .getBytes(StandardCharsets.UTF_8))

  def read(path: HPath): TableMeta =
    hydrate(
      Serialization.read[TableMeta](
        new String(GraftIO.readAllBytes(path), StandardCharsets.UTF_8)),
      path.getParent)

  /** Chunk refs of a version document WITHOUT hydrating — old documents
    * may reference chunks an expire already GC'd (those documents are
    * unreadable history, same as their data files), but their refs must
    * still count as "mentioned" for orphan-chunk liveness. */
  private[table] def readRefsOnly(path: HPath): Seq[String] =
    Serialization.read[TableMeta](
      new String(GraftIO.readAllBytes(path), StandardCharsets.UTF_8))
      .snapshots.flatMap(_.manifestRefs.getOrElse(Nil))

  /** Current metadata version of a table dir. The hint file is exactly
    * that — a HINT: a concurrent committer may have landed v<N+1> before
    * its hint swap, so we probe forward from the hint until the newest
    * existing version file. This guarantees retry progress under races
    * (a stale hint can never make two committers fight over the same
    * version number forever). A missing or torn hint (possible on object
    * stores, where the hint swap is an overwrite PUT rather than an
    * atomic rename) falls back to listing `meta/` for the max version —
    * the hint is an optimization, never the source of truth. */
  def currentVersion(tableDir: HPath): Int = {
    val metaDir = tableDir.resolve("meta")
    val hinted: Option[Int] =
      try new String(GraftIO.readAllBytes(metaDir.resolve("version-hint.text")),
        StandardCharsets.UTF_8).trim.toIntOption
      catch { case scala.util.control.NonFatal(_) => None }
    var v = hinted.getOrElse {
      val vs = GraftIO.list(metaDir).flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("v") && n.endsWith(".json"))
          n.stripPrefix("v").stripSuffix(".json").toIntOption
        else None
      }
      if (vs.isEmpty)
        throw new IllegalStateException(s"no table at $tableDir (no version files)")
      vs.max
    }
    while (GraftIO.exists(metaDir.resolve(s"v${v + 1}.json"))) v += 1
    v
  }

  def load(tableDir: HPath): (Int, TableMeta) = {
    // Hydration can race expire_snapshots: we read version N, expire
    // commits N+1 and physically deletes chunks only N referenced, and
    // our chunk read hits NoSuchFile. The NEWER document never references
    // those chunks, so re-resolving the version and re-reading always
    // converges — same forward-probing spirit as currentVersion.
    // independent budgets: a burst of one failure mode must not consume
    // the other's retries (e.g. several torn-read parse retries followed
    // by a recoverable expire-GC'd-chunk FileNotFound)
    var fnfAttempt = 0
    var parseAttempt = 0
    while (true) {
      val v = currentVersion(tableDir)
      try return (v, read(tableDir.resolve("meta").resolve(s"v$v.json")))
      catch {
        // Hadoop filesystems surface a missing file as FileNotFound;
        // nio (via LocalFileSystem shims) as NoSuchFileException.
        case e @ (_: java.io.FileNotFoundException |
                  _: java.nio.file.NoSuchFileException) =>
          fnfAttempt += 1
          if (fnfAttempt >= 5) throw e
        // Torn read of an IN-FLIGHT version document: on non-local
        // schemes publishExclusive is create+write+close, and the
        // forward probe sees the file the moment create() opens it —
        // possibly before (all) bytes land — so the parse fails. The
        // writer's close is imminent; brief bounded backoff, then the
        // re-read converges. (The local scheme can't hit this — its
        // publish materializes complete bytes by hard link.) Only
        // PARSE-layer failures retry — IO errors (permissions, bad
        // mounts) are not transient and fail immediately. A document
        // still unparseable after the retries is genuine corruption —
        // e.g. a committer hard-killed mid-write on an object store
        // without conditional PUTs — and fails loudly.
        case e @ (_: org.json4s.MappingException |
                  _: com.fasterxml.jackson.core.JsonProcessingException) =>
          parseAttempt += 1
          if (parseAttempt >= 8) throw e
          Thread.sleep(25L * parseAttempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Atomic commit. Publication must be atomic AND exclusive: readers
    * probe forward past the hint (`currentVersion`), so an in-flight
    * v<N+1>.json is VISIBLE — writing it in place would expose partial
    * JSON, and a committer crash would leave a truncated newest file that
    * permanently breaks load(). `GraftIO.publishExclusive` provides both
    * properties: on local filesystems the document is staged to a temp
    * file and materialized via hard link — a single atomic metadata op
    * that fails iff the target exists, which *is* the conflict check
    * (exactly one committer can land each version; an exists-then-write
    * sequence would have a TOCTOU window). On remote schemes it is an
    * exclusive create (see GraftIO's per-scheme notes). The hint pointer
    * then swaps atomically where the scheme allows; readers that see a
    * stale or torn hint recover in `currentVersion`. */
  def commit(tableDir: HPath, expectedVersion: Int, meta: TableMeta): Int = {
    val metaDir = tableDir.resolve("meta")
    val next = expectedVersion + 1
    val target = metaDir.resolve(s"v$next.json")
    val bytes = Serialization.writePretty(dehydrate(meta, metaDir))
      .getBytes(StandardCharsets.UTF_8)
    if (!GraftIO.publishExclusive(target, bytes))
      throw new ConcurrentCommitException(
        s"concurrent commit detected: $target already exists", null)
    GraftIO.writeAtomicReplace(metaDir.resolve("version-hint.text"),
      next.toString.getBytes(StandardCharsets.UTF_8))
    next
  }

  /** Optimistic retry commit (the reference's REST catalog behavior,
    * README.md:59-61: losers reload and reapply): load fresh metadata,
    * apply `update`, attempt the atomic commit; on conflict, reload and
    * reapply. `update` must be safe to reapply on fresh metadata — true
    * for appends (manifest merge) and metadata-only DDL; operations that
    * validated against a specific base state (delete/replace) should use
    * single-shot `commit` and surface the conflict instead. */
  def commitRetry(tableDir: HPath, maxAttempts: Int = 10)(update: TableMeta => TableMeta): Int = {
    var attempt = 1
    while (true) {
      val (v, m) = load(tableDir)
      val updated = update(m)
      // no-op signal: `update` returning its input (reference-equal) means
      // "nothing to change against this base" — skip the publish instead of
      // committing a byte-identical version document (pure metadata churn,
      // and maintenance ops racing real writers would burn their retries on
      // it)
      if (updated eq m) return v
      try return commit(tableDir, v, updated)
      catch {
        case e: ConcurrentCommitException =>
          if (attempt >= maxAttempts) throw e
          // jittered exponential backoff (Iceberg's commit.retry shape):
          // without it N contending committers reload and republish in
          // lockstep and can re-collide every round — the 5-process
          // soak reproduced a 10-loss streak. Full jitter (0..cap)
          // decorrelates the herd; cap 1.6 s keeps worst-case total
          // wait bounded while the winning path stays sleep-free.
          val cap = math.min(1600L, 25L << math.min(attempt, 6))
          // an interrupted committer stops retrying NOW (flag restored,
          // conflict surfaced) — continuing with the flag set would make
          // every later backoff throw instantly and the loop spin through
          // its attempts with no backoff at all (ADVICE r14)
          try Thread.sleep(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(cap + 1))
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              e.addSuppressed(ie)
              throw e
          }
          attempt += 1
      }
    }
    -1 // unreachable
  }
}
