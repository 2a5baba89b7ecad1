package graft.table

import java.io.ByteArrayInputStream
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}

/** Table-layer filesystem access, routed through Hadoop `FileSystem` so a
  * Graft warehouse works on ANY Hadoop-supported store — `file://` in
  * tests, HDFS or `s3a://` object stores on a cluster (the reference's
  * warehouse is MinIO/S3, README.md:62-65, 76-81). Spark reads/writes the
  * actual data through the same abstraction, so table paths are plain
  * URI strings end to end.
  *
  * Commit-protocol primitives keep their atomicity guarantees per scheme:
  *
  *  - `publishExclusive` (the version-CAS): on local filesystems the
  *    document is staged to a temp file and materialized by HARD LINK —
  *    one atomic metadata op that fails iff the target exists, so exactly
  *    one committer can land each version and a reader can never observe
  *    partial JSON. On HDFS `create(overwrite=false)` is an atomic
  *    namespace insert (readers of an in-flight file are handled by the
  *    load() retry). On S3-like stores the create is check-then-put —
  *    the documented object-store caveat (Iceberg's: use a catalog CAS
  *    or S3 conditional writes for multi-writer safety); the PUT itself
  *    is all-or-nothing at close, so partial content is never visible.
  *  - `writeAtomicReplace` (the hint swap): atomic rename on local
  *    filesystems; a single overwrite PUT elsewhere. The hint is ONLY a
  *    hint — `TableMeta.currentVersion` falls back to listing the meta
  *    dir when the hint is missing or unreadable, so a torn hint can
  *    never lose a committed version.
  */
object GraftIO {

  /** Hadoop conf: captured from the active SparkSession once (so
    * session-configured credentials/endpoints apply to table IO), else
    * library defaults. Overridable for embedding. */
  @volatile private var cachedConf: Configuration = _

  def conf: Configuration = {
    var c = cachedConf
    if (c == null) {
      c = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration())
      cachedConf = c
    }
    c
  }

  def setConf(c: Configuration): Unit = cachedConf = c

  /** FileSystem for a path (Hadoop caches instances per scheme+authority). */
  def fs(p: HPath): FileSystem = p.getFileSystem(conf)

  /** `resolve`/`relativize` ergonomics on Hadoop paths. `resolve` of an
    * ABSOLUTE or scheme-qualified child returns the child (the nio
    * behavior manifests rely on: add_files registers absolute paths). */
  implicit final class RichHPath(private val p: HPath) extends AnyVal {
    def resolve(child: String): HPath = new HPath(p, child)
  }

  def fromNio(p: java.nio.file.Path): HPath = new HPath(p.toUri)

  private def isLocal(p: HPath): Boolean = {
    val s = p.toUri.getScheme
    s == null || s == "file"
  }

  /** Local-filesystem view of a `file://` path (tests and local tools
    * that assert physical layout). */
  def toNio(p: HPath): java.nio.file.Path = {
    val u = p.toUri
    require(isLocal(p), s"$p is not on the local filesystem")
    if (u.getScheme == null) Paths.get(u.getPath) else Paths.get(u)
  }

  /** Relative path of `p` under `base` (both on the same filesystem). */
  def relativize(base: HPath, p: HPath): String = {
    val b = base.toUri.getPath.stripSuffix("/") + "/"
    val s = p.toUri.getPath
    require(s.startsWith(b), s"$p is not under $base")
    s.substring(b.length)
  }

  def exists(p: HPath): Boolean = fs(p).exists(p)

  def isDirectory(p: HPath): Boolean = {
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  def size(p: HPath): Long = fs(p).getFileStatus(p).getLen

  def mtimeMs(p: HPath): Long = fs(p).getFileStatus(p).getModificationTime

  def mkdirs(p: HPath): Unit = { fs(p).mkdirs(p); () }

  /** Byte-copy one file (overwrites an existing destination; creates
    * parent dirs). Driver-side — callers that copy a whole manifest at
    * scale fan the file list out as a job instead (deepCloneTo docs). */
  def copyFile(src: HPath, dst: HPath): Unit = {
    org.apache.hadoop.fs.FileUtil.copy(
      fs(src), src, fs(dst), dst, /* deleteSource = */ false,
      /* overwrite = */ true, conf)
    ()
  }

  /** Delete one path (no error if absent). Local paths short-circuit to
    * nio (same rationale as `write`: ChecksumFileSystem adds a `.crc`
    * sidecar probe + delete per call) — but any `.crc` sidecar a
    * checksummed writer DID leave (Spark's own parquet writes go through
    * LocalFileSystem) is removed alongside, since ChecksumFileSystem
    * hides sidecars from listings and an orphaned one would be
    * unreclaimable debris. */
  def delete(p: HPath): Unit =
    if (isLocal(p)) {
      val t = toNio(p)
      Files.deleteIfExists(t)
      val parent = t.getParent
      if (parent != null)
        Files.deleteIfExists(parent.resolve("." + t.getFileName.toString + ".crc"))
      ()
    }
    else { fs(p).delete(p, false); () }

  def deleteRecursive(p: HPath): Unit = { fs(p).delete(p, true); () }

  /** Rename; fails if the destination exists (Hadoop semantics). */
  def rename(src: HPath, dst: HPath): Boolean = fs(src).rename(src, dst)

  /** Immediate children (empty if the path doesn't exist). */
  def list(p: HPath): Seq[FileStatus] = {
    val f = fs(p)
    if (!f.exists(p)) Nil else f.listStatus(p).toSeq
  }

  /** All FILES under `p`, recursively (empty if absent). */
  def listFilesRecursive(p: HPath): Seq[FileStatus] = {
    val f = fs(p)
    if (!f.exists(p)) Nil
    else {
      val it = f.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
      while (it.hasNext) buf += it.next()
      buf.toSeq
    }
  }

  def readAllBytes(p: HPath): Array[Byte] = {
    val in = fs(p).open(p)
    try in.readAllBytes()
    finally in.close()
  }

  /** Plain overwrite write (non-atomic on HDFS mid-write; single PUT on
    * object stores). For commit-protocol files use the primitives below.
    * Local paths write via nio: Hadoop's ChecksumFileSystem would leave
    * `.crc` sidecars next to every metadata file (debris the atomic-
    * publish spec asserts against), and the raw local stream buys
    * nothing over the platform call. */
  def write(p: HPath, bytes: Array[Byte]): Unit =
    if (isLocal(p)) { java.nio.file.Files.write(toNio(p), bytes); () }
    else {
      val out = fs(p).create(p, true)
      try out.write(bytes)
      finally out.close()
    }

  /** Test-only fault injection: invoked (when set) before each
    * publishExclusive attempt, AFTER any staging the caller already did —
    * throwing from here simulates a committer that crashed between
    * staging its files and landing the version document (the window the
    * crash-safety invariants must survive). Never set in production. */
  @volatile private[graft] var beforePublish: HPath => Unit = null

  /** Exclusive-create publish: write `bytes` at `target` iff no file
    * exists there. Returns false (leaving any existing file untouched)
    * when the target already exists — the version-conflict signal.
    * Atomicity per scheme: see the object doc. */
  def publishExclusive(target: HPath, bytes: Array[Byte]): Boolean = {
    val hook = beforePublish
    if (hook != null) hook(target)
    publishExclusiveImpl(target, bytes)
  }

  private def publishExclusiveImpl(target: HPath, bytes: Array[Byte]): Boolean =
    if (isLocal(target)) {
      val t = toNio(target)
      val staged = Files.createTempFile(t.getParent, t.getFileName.toString + "-", ".tmp")
      try {
        Files.write(staged, bytes)
        try { Files.createLink(t, staged); true }
        catch { case _: FileAlreadyExistsException => false }
      } finally Files.deleteIfExists(staged)
    } else {
      try {
        val out = fs(target).create(target, false)
        try out.write(bytes)
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: FileAlreadyExistsException => false
      }
    }

  /** Replace `target`'s content; atomic rename locally, overwrite PUT
    * elsewhere. Callers must tolerate a torn read on non-local schemes
    * (the version hint does: currentVersion falls back to a listing). */
  def writeAtomicReplace(target: HPath, bytes: Array[Byte]): Unit =
    if (isLocal(target)) {
      val t = toNio(target)
      val tmp = Files.createTempFile(t.getParent, t.getFileName.toString, ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, t, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    } else write(target, bytes)

  /** Copy local bytes → path (test/tool helper). */
  def writeStream(p: HPath, in: java.io.InputStream): Unit = {
    val out = fs(p).create(p, true)
    try in.transferTo(out)
    finally out.close()
  }

  def open(p: HPath): java.io.InputStream = fs(p).open(p)

  private[table] def bytesOf(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private[table] def utf8(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  private[graft] def inputStream(bytes: Array[Byte]): java.io.InputStream =
    new ByteArrayInputStream(bytes)
}
