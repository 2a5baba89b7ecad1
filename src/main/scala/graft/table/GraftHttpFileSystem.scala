package graft.table

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URL, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Hadoop `FileSystem` client for a GraftFsServer — mount the shared
  * catalog service as `graftsvc://host:port/…`. Registration:
  *
  *   META-INF/services/org.apache.hadoop.fs.FileSystem (ServiceLoader —
  *   zero configuration; or fs.graftsvc.impl in any Hadoop conf)
  *
  * after which the ENTIRE stack — GraftCatalog metadata commits
  * (publishExclusive's create(overwrite=false) becomes the server-side
  * atomic CAS), table data IO, Spark's parquet reader/writer and its
  * output committer — works over the wire with no Graft-specific
  * client logic. This is the reference's rest-catalog + MinIO shape
  * (README.md:59-94): one authority process, N driver JVMs.
  *
  * Semantics notes (the two places HTTP differs from POSIX, both safe
  * for the commit protocol):
  *  - create(overwrite=false) defers the existence check to close(),
  *    where the server links the staged body atomically — exclusivity
  *    is decided by ONE authority at publish time and partial content
  *    is never visible (stronger than check-then-create).
  *  - writes buffer client-side and PUT on close — all-or-nothing, the
  *    object-store model Spark's committers already handle. */
class GraftHttpFileSystem extends FileSystem {

  private var uri0: URI = _
  private var base: String = _ // http://host:port
  private var workDir: Path = _
  private var token: Option[String] = None

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri0 = URI.create(s"graftsvc://${name.getAuthority}")
    base = s"http://${name.getAuthority}"
    workDir = new Path(uri0.toString + "/")
    // shared secret for a token-protected service (GraftFsServer auth);
    // spark conf spells it spark.hadoop.fs.graftsvc.token
    token = Option(conf.get("fs.graftsvc.token")).filter(_.nonEmpty)
  }

  override def getScheme: String = "graftsvc"
  override def getUri: URI = uri0

  private def rel(f: Path): String = {
    val p = f.toUri.getPath
    p.split('/').filter(_.nonEmpty)
      .map(URLEncoder.encode(_, "UTF-8").replace("+", "%20")).mkString("/")
  }

  private def conn(method: String, url: String): HttpURLConnection = {
    val c = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(10000)
    c.setReadTimeout(120000)
    token.foreach(c.setRequestProperty("X-Graft-Token", _))
    c
  }

  private def qualifyChild(parent: Path, name: String): Path =
    new Path(parent, name)

  /** Transient-failure retry for idempotent requests (reads, stats):
    * a connection reset / refused-accept burst under concurrent load
    * must not surface as a task failure — local-mode Spark runs with
    * task retries = 1, so one blip fails the whole query. The same
    * role S3A's built-in retry policy plays; writes are NOT wrapped
    * (the exclusive-PUT CAS must never silently double-send). */
  private def retrying[A](what: String)(op: => A): A = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: IOException if attempt < 3 &&
            !e.isInstanceOf[FileNotFoundException] =>
          attempt += 1
          // An interrupt (killed/cancelled Spark task) ABORTS the retry
          // loop: with the flag restored-but-swallowed every later sleep
          // would throw immediately, burning the retries with no backoff
          // while the task can't die promptly (ADVICE r14).
          try Thread.sleep(50L * attempt)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              val iioe = new java.io.InterruptedIOException(
                s"interrupted while retrying $what")
              iioe.initCause(e)
              iioe.addSuppressed(ie)
              throw iioe
          }
      }
    }
    throw new IllegalStateException(s"unreachable: $what")
  }

  private case class Stat(isDir: Boolean, len: Long, mtime: Long)

  private def statOf(f: Path): Option[Stat] = retrying(s"stat $f") {
    val c = conn("HEAD", s"$base/fs/${rel(f)}")
    try c.getResponseCode match {
      case 200 => Some(Stat(
        c.getHeaderField("X-Is-Dir") == "true",
        Option(c.getHeaderField("X-Len")).map(_.toLong).getOrElse(0L),
        Option(c.getHeaderField("X-Mtime")).map(_.toLong).getOrElse(0L)))
      case _ => None
    } finally c.disconnect()
  }

  override def getFileStatus(f: Path): FileStatus =
    statOf(f) match {
      case Some(s) => new FileStatus(s.len, s.isDir, 1, 1L << 25, s.mtime,
        makeQualified(f))
      case None => throw new FileNotFoundException(f.toString)
    }

  override def listStatus(f: Path): Array[FileStatus] = retrying(s"ls $f") {
    val c = conn("GET", s"$base/ls/${rel(f)}")
    try c.getResponseCode match {
      case 200 =>
        val body = new String(c.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        body.split('\n').filter(_.nonEmpty).map { line =>
          // name field is percent-encoded by the server so '|'/'\n' in a
          // file name can't tear the line protocol
          val Array(name, isDir, len, mtime) = line.split('|')
          new FileStatus(len.toLong, isDir.toBoolean, 1, 1L << 25, mtime.toLong,
            makeQualified(qualifyChild(f,
              java.net.URLDecoder.decode(name, "UTF-8"))))
        }
      case 404 =>
        // Hadoop contract: listStatus of a FILE returns that file's status
        statOf(f) match {
          case Some(s) if !s.isDir => Array(getFileStatus(f))
          case _ => throw new FileNotFoundException(f.toString)
        }
      case other => throw new IOException(s"ls ${f}: HTTP $other")
    } finally c.disconnect()
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val st = statOf(f).getOrElse(throw new FileNotFoundException(f.toString))
    if (st.isDir) throw new FileNotFoundException(s"$f is a directory")
    new FSDataInputStream(new HttpSeekableStream(s"$base/fs/${rel(f)}", st.len))
  }

  /** Ranged-GET random access — parquet footer seeks become small Range
    * requests; sequential scans read ahead in 4 MB chunks. */
  private final class HttpSeekableStream(url: String, size: Long)
      extends InputStream with Seekable with PositionedReadable {
    private var pos = 0L
    private var buf: Array[Byte] = Array.empty
    private var bufStart = 0L
    private val CHUNK = 4 << 20

    private def fetch(lo: Long, len: Int): Array[Byte] = {
      if (len <= 0 || lo >= size) return Array.empty
      val hi = math.min(lo + len - 1, size - 1)
      retrying(s"read $url [$lo-$hi]") { fetchOnce(lo, hi) }
    }

    private def fetchOnce(lo: Long, hi: Long): Array[Byte] = {
      val c = conn("GET", url)
      c.setRequestProperty("Range", s"bytes=$lo-$hi")
      try c.getResponseCode match {
        case 206 => c.getInputStream.readAllBytes()
        case 200 =>
          // a server/proxy that ignores Range replies 200 with the WHOLE
          // file — treating that body as starting at `lo` would silently
          // corrupt reads. Slice the requested span out; anything else
          // (a partial body with a 200) is a protocol error.
          val whole = c.getInputStream.readAllBytes()
          if (whole.length.toLong == size)
            java.util.Arrays.copyOfRange(whole, lo.toInt, (hi + 1).toInt)
          else throw new IOException(
            s"GET $url [$lo-$hi]: HTTP 200 with ${whole.length} bytes (file is $size)")
        case 416 => Array.empty
        case other => throw new IOException(s"GET $url [$lo-$hi]: HTTP $other")
      } finally c.disconnect()
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n <= 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= size) return -1
      if (pos < bufStart || pos >= bufStart + buf.length) {
        bufStart = pos
        buf = fetch(pos, math.max(len, CHUNK))
        if (buf.isEmpty) return -1
      }
      val avail = (bufStart + buf.length - pos).toInt
      val n = math.min(len, avail)
      System.arraycopy(buf, (pos - bufStart).toInt, b, off, n)
      pos += n
      n
    }

    override def seek(p: Long): Unit = {
      if (p < 0 || p > size) throw new IOException(s"seek($p) outside [0,$size]")
      pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(position: Long, b: Array[Byte], off: Int, len: Int): Int = {
      if (position >= size) return -1
      val got = fetch(position, len)
      if (got.isEmpty) return -1
      val n = math.min(len, got.length)
      System.arraycopy(got, 0, b, off, n)
      n
    }
    override def readFully(position: Long, b: Array[Byte], off: Int, len: Int): Unit = {
      var done = 0
      while (done < len) {
        val n = read(position + done, b, off + done, len - done)
        if (n < 0) throw new java.io.EOFException(s"$url at ${position + done}")
        done += n
      }
    }
    override def readFully(position: Long, b: Array[Byte]): Unit =
      readFully(position, b, 0, b.length)
  }

  /** Buffer to LOCAL DISK, PUT all-or-nothing on close — the S3A
    * disk-buffer model: a 512 MB parquet part must never live on the
    * writer's heap (N concurrent write tasks × file size would be the
    * executor's whole memory). exclusive=true maps create(overwrite=
    * false) onto the server's atomic CAS. */
  private final class PutOnClose(url: String, exclusive: Boolean)
      extends java.io.OutputStream {
    private val spill = java.nio.file.Files.createTempFile("graftsvc-put", ".buf")
    private val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(spill), 1 << 16)
    private var closed = false
    override def write(b: Int): Unit = out.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
    override def close(): Unit = {
      if (closed) return
      closed = true
      try {
        out.close()
        val c = conn("PUT", url + (if (exclusive) "?exclusive=true" else ""))
        c.setDoOutput(true)
        c.setFixedLengthStreamingMode(java.nio.file.Files.size(spill))
        val os = c.getOutputStream
        java.nio.file.Files.copy(spill, os); os.close()
        val code = c.getResponseCode
        c.disconnect()
        if (code == 409)
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(url)
        if (code != 201 && code != 200) throw new IOException(s"PUT $url: HTTP $code")
      } finally java.nio.file.Files.deleteIfExists(spill)
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && statOf(f).isDefined)
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    new FSDataOutputStream(new PutOnClose(s"$base/fs/${rel(f)}", !overwrite), statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("graftsvc: append not supported")

  override def rename(src: Path, dst: Path): Boolean = {
    // rel() is already percent-encoded; re-encoding would double-escape
    // (the server decodes once) — partition dirs like day=2024-01-05
    // would silently fail to rename at committer time
    val c = conn("POST", s"$base/rename?src=/${rel(src)}&dst=/${rel(dst)}")
    try c.getResponseCode == 200 finally c.disconnect()
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val c = conn("DELETE", s"$base/fs/${rel(f)}" + (if (recursive) "?recursive=true" else ""))
    try c.getResponseCode == 200 finally c.disconnect()
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val c = conn("POST", s"$base/mkdirs/${rel(f)}")
    try c.getResponseCode == 200 finally c.disconnect()
  }

  override def setWorkingDirectory(dir: Path): Unit = workDir = dir
  override def getWorkingDirectory: Path = workDir
}
