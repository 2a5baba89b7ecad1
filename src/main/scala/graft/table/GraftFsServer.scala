package graft.table

import java.io.{IOException, InputStream, OutputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The shared catalog SERVICE the reference runs as its rest-catalog +
  * MinIO containers (README.md:59-94): one process owns the warehouse
  * and arbitrates every metadata commit; any number of driver JVMs —
  * on any host that can reach the port — mount it as a filesystem
  * scheme (`graftsvc://host:port/…`, GraftHttpFileSystem) and get the
  * full catalog/table/view stack over the wire, data IO included.
  *
  * Protocol (deliberately primitive-shaped: it mirrors the exact
  * Hadoop FileSystem surface GraftIO + Spark's parquet IO consume, so
  * the CLIENT needs no protocol-specific commit logic — the same
  * publishExclusive CAS that works on file:// works here):
  *
  *   GET    /fs/<path>            bytes (Range supported — parquet
  *                                footer seeks become ranged reads)
  *   HEAD   /fs/<path>            404 | headers X-Is-Dir, X-Len, X-Mtime
  *   PUT    /fs/<path>            write body; ?exclusive=true = atomic
  *                                CREATE_NEW, 409 if the target exists —
  *                                THE commit CAS, enforced server-side
  *                                by the one authority (the property S3
  *                                needs conditional PUTs for)
  *   DELETE /fs/<path>[?recursive=true]
  *   GET    /ls/<path>            one "name|isDir|len|mtime" line per child
  *   POST   /mkdirs/<path>
  *   POST   /rename?src=<p>&dst=<p>   409 if dst exists (rename-safe)
  *
  * Bodies are all-or-nothing: PUT stages to a temp file and publishes
  * by atomic link/move, so a racing reader can never observe partial
  * content — the same discipline GraftIO keeps locally.
  *
  * Auth: when `token` is set, every request must carry it in
  * `X-Graft-Token` (or `Authorization: Bearer <t>`) or gets 401 — the
  * service grants arbitrary warehouse read/write/delete, so a non-
  * loopback bind without a shared secret would hand the warehouse to
  * any network peer (the reference's rest-catalog + MinIO at least run
  * with credentials). */
final class GraftFsServer(root: Path, port0: Int = 0,
    bindHost: String = "127.0.0.1", token: Option[String] = None) {

  // embedded default binds loopback (tests, fixtures); the standalone
  // service binds 0.0.0.0 so drivers on OTHER hosts can mount it — the
  // multi-host topology is the point of the service
  // explicit accept backlog: the default (system-chosen) queue can
  // refuse connection bursts when N driver JVMs' executors all open
  // sockets at once — and local-mode Spark runs with task retries = 1,
  // so one refused connect fails a whole query (soak-reproduced)
  private val server = HttpServer.create(new InetSocketAddress(bindHost, port0), 256)
  // daemon workers: the SERVICE must never pin a client/test JVM open —
  // a standalone service process pins itself via main's join instead.
  // 32 workers: ranged parquet reads are short, but a full driver
  // session issues dozens concurrently and 8 workers queued enough
  // under soak load to trip client read timeouts
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(32,
    (r: Runnable) => { val t = new Thread(r, "graftsvc-worker"); t.setDaemon(true); t })
  @volatile private var started = false
  private val renameLock = new Object
  private lazy val rest = new GraftRestCatalog(root)

  def port: Int = server.getAddress.getPort

  def start(): GraftFsServer = synchronized {
    if (!started) {
      Files.createDirectories(root)
      server.createContext("/", handler _)
      server.setExecutor(pool)
      // HttpServer spawns its dispatcher as a PLAIN thread that inherits
      // the caller's daemon flag — start from a daemon thread so an
      // embedded service can never pin a client JVM open (the standalone
      // service process pins itself via main's join instead)
      val starter = new Thread(() => server.start(), "graftsvc-starter")
      starter.setDaemon(true)
      starter.start()
      starter.join()
      started = true
    }
    this
  }

  def stop(): Unit = synchronized {
    if (started) { server.stop(0); pool.shutdown(); started = false }
  }

  /** Resolve a request path under root, refusing escapes. */
  private def local(rel: String): Path = {
    val clean = rel.split('/').filter(s => s.nonEmpty && s != ".")
    require(!clean.contains(".."), s"path escape: $rel")
    clean.foldLeft(root)(_.resolve(_))
  }

  private def respond(x: HttpExchange, code: Int, body: Array[Byte] = Array.empty): Unit = {
    x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) { val os = x.getResponseBody; os.write(body); os.close() }
    x.close()
  }

  private def query(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getRawQuery).map(_.split('&').flatMap { kv =>
      val i = kv.indexOf('=')
      if (i < 0) None else Some(
        java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8"))
    }.toMap).getOrElse(Map.empty)

  /** Constant-time compare — a secret check must not leak length/prefix
    * timing to a probing peer. */
  private def tokenOk(x: HttpExchange): Boolean = token.forall { t =>
    val presented =
      Option(x.getRequestHeaders.getFirst("X-Graft-Token")).orElse(
        Option(x.getRequestHeaders.getFirst("Authorization"))
          .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer ")))
    presented.exists(p => java.security.MessageDigest.isEqual(
      p.getBytes(StandardCharsets.UTF_8), t.getBytes(StandardCharsets.UTF_8)))
  }

  private def handler(x: HttpExchange): Unit = try {
    if (!tokenOk(x)) { respond(x, 401); return }
    val raw = x.getRequestURI.getRawPath
    val method = x.getRequestMethod
    def pathAfter(prefix: String): String =
      java.net.URLDecoder.decode(raw.stripPrefix(prefix), "UTF-8")
    (method, raw) match {
      case ("GET", p) if p.startsWith("/ls/") =>
        val dir = local(pathAfter("/ls/"))
        if (!Files.isDirectory(dir)) respond(x, 404)
        else {
          // close the DirectoryStream (a long-lived service leaks one FD
          // per listing otherwise — EMFILE under normal metadata polling)
          val listing = Files.list(dir)
          val sb = new StringBuilder
          // the line protocol delimits with '|' and '\n' — URL-encode the
          // name field so a file whose name contains either can't tear the
          // listing (the PUT path accepts such names; the client decodes)
          try listing.iterator().forEachRemaining { c =>
            sb.append(java.net.URLEncoder.encode(c.getFileName.toString, "UTF-8")
                .replace("+", "%20")).append('|')
              .append(Files.isDirectory(c)).append('|')
              .append(if (Files.isDirectory(c)) 0L else Files.size(c)).append('|')
              .append(Files.getLastModifiedTime(c).toMillis).append('\n')
          } finally listing.close()
          respond(x, 200, sb.toString.getBytes(StandardCharsets.UTF_8))
        }
      case ("HEAD", p) if p.startsWith("/fs/") =>
        val f = local(pathAfter("/fs/"))
        if (!Files.exists(f)) respond(x, 404)
        else {
          x.getResponseHeaders.set("X-Is-Dir", Files.isDirectory(f).toString)
          x.getResponseHeaders.set("X-Len",
            (if (Files.isDirectory(f)) 0L else Files.size(f)).toString)
          x.getResponseHeaders.set("X-Mtime", Files.getLastModifiedTime(f).toMillis.toString)
          respond(x, 200)
        }
      case ("GET", p) if p.startsWith("/fs/") =>
        val f = local(pathAfter("/fs/"))
        if (!Files.isRegularFile(f)) respond(x, 404)
        else {
          val size = Files.size(f)
          // ranges STREAM to the response (never one allocation for the
          // whole span — a >2 GB range must not OOM or int-overflow);
          // RFC 7233 forms: bytes=lo-hi, bytes=lo-, bytes=-suffixLen
          def stream(code: Int, lo: Long, hi: Long): Unit = {
            val len = hi - lo + 1
            x.sendResponseHeaders(code, len)
            val ch = java.nio.channels.FileChannel.open(f)
            val os = x.getResponseBody
            try {
              val buf = java.nio.ByteBuffer.allocate(math.min(len, 1L << 22).toInt)
              ch.position(lo)
              var left = len
              while (left > 0) {
                buf.clear()
                if (left < buf.capacity()) buf.limit(left.toInt)
                val n = ch.read(buf)
                if (n < 0) left = 0
                else { os.write(buf.array(), 0, n); left -= n }
              }
            } finally { os.close(); ch.close(); x.close() }
          }
          Option(x.getRequestHeaders.getFirst("Range")) match {
            case Some(r) if r.startsWith("bytes=") =>
              val spec = r.stripPrefix("bytes=").split("-", -1)
              val parsed =
                if (spec(0).isEmpty && spec.length > 1 && spec(1).nonEmpty)
                  spec(1).toLongOption.map(n => (math.max(0L, size - n), size - 1))
                else spec(0).toLongOption.map { lo =>
                  (lo, if (spec.length > 1 && spec(1).nonEmpty)
                    math.min(spec(1).toLong, size - 1) else size - 1)
                }
              parsed match {
                case Some((lo, hi)) if lo < size && lo <= hi => stream(206, lo, hi)
                case _ => respond(x, 416)
              }
            case _ =>
              if (size == 0) respond(x, 200) else stream(200, 0L, size - 1)
          }
        }
      case ("PUT", p) if p.startsWith("/fs/") =>
        val f = local(pathAfter("/fs/"))
        val exclusive = query(x).get("exclusive").contains("true")
        Files.createDirectories(f.getParent)
        val tmp = Files.createTempFile(f.getParent, f.getFileName.toString + "-", ".tmp")
        try {
          val in = x.getRequestBody
          Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
          in.close()
          if (exclusive) {
            // atomic CREATE_NEW by hard link — the version CAS
            try { Files.createLink(f, tmp); respond(x, 201) }
            catch { case _: FileAlreadyExistsException => respond(x, 409) }
          } else {
            Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
            respond(x, 201)
          }
        } finally Files.deleteIfExists(tmp)
      case ("DELETE", p) if p.startsWith("/fs/") =>
        val f = local(pathAfter("/fs/"))
        val recursive = query(x).get("recursive").contains("true")
        if (!Files.exists(f)) respond(x, 404)
        else {
          if (recursive && Files.isDirectory(f)) {
            // close the walk stream — a long-lived service leaks one FD per
            // recursive delete otherwise (same class as the /ls listing)
            val walk = Files.walk(f)
            try walk.sorted(java.util.Comparator.reverseOrder[Path]())
              .iterator().forEachRemaining(Files.deleteIfExists(_))
            finally walk.close()
            respond(x, 200)
          } else {
            try { Files.delete(f); respond(x, 200) }
            catch { case _: java.nio.file.DirectoryNotEmptyException => respond(x, 409) }
          }
        }
      case (m, p) if p.startsWith("/v1/") =>
        // Iceberg REST-catalog protocol surface (GraftRestCatalog doc) —
        // the same process is FS authority AND catalog endpoint, the
        // reference's rest-catalog+MinIO collapsed into one
        val segs = p.stripPrefix("/v1/").split('/')
          .filter(_.nonEmpty).map(java.net.URLDecoder.decode(_, "UTF-8")).toList
        rest.handle(x, m, segs)
      case ("POST", p) if p.startsWith("/mkdirs/") =>
        Files.createDirectories(local(pathAfter("/mkdirs/")))
        respond(x, 200)
      case ("POST", p) if p.startsWith("/rename") =>
        val q = query(x)
        val src = local(q("src")); val dst = local(q("dst"))
        // dst-exists + move must be ONE decision: POSIX rename() silently
        // REPLACES an existing target, so an unsynchronized check-then-move
        // lets two racing renames to the same dst both report 200 (one
        // clobbered). Renames are rare (committer publishes), so a server-
        // wide lock costs nothing and makes the 409 authoritative.
        renameLock.synchronized {
          if (!Files.exists(src)) respond(x, 404)
          else if (Files.exists(dst)) respond(x, 409)
          else {
            Files.createDirectories(dst.getParent)
            Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
            respond(x, 200)
          }
        }
      case _ => respond(x, 400)
    }
  } catch {
    case e: Throwable =>
      try respond(x, 500, String.valueOf(e.getMessage).getBytes(StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
  }
}

object GraftFsServer {
  /** Start a server over `root` on an ephemeral port; returns it started. */
  def serve(root: Path): GraftFsServer = new GraftFsServer(root).start()

  /** Standalone entry point:
    * `runMain graft.table.GraftFsServer <root> <port> [<bindHost>]` —
    * the catalog-service process other driver JVMs mount.
    *
    * Binds LOOPBACK by default. The service grants arbitrary warehouse
    * read/write/delete/commit, so exposing it (`0.0.0.0` or a specific
    * interface as arg 3) requires a shared secret in $GRAFT_SVC_TOKEN —
    * drivers present it via `fs.graftsvc.token` (GraftHttpFileSystem) —
    * or, for a trusted/firewalled network only, the explicit
    * $GRAFT_SVC_INSECURE=true opt-out. */
  def main(args: Array[String]): Unit = {
    val root = Paths.get(args.headOption.getOrElse("target/graftfs"))
    val port = args.drop(1).headOption.map(_.toInt).getOrElse(19181)
    val host = args.drop(2).headOption.getOrElse("127.0.0.1")
    val token = sys.env.get("GRAFT_SVC_TOKEN").filter(_.nonEmpty)
    if (host != "127.0.0.1" && host != "localhost" && token.isEmpty)
      require(sys.env.get("GRAFT_SVC_INSECURE").contains("true"),
        s"refusing to bind $host without auth: set GRAFT_SVC_TOKEN " +
          "(clients set fs.graftsvc.token), or GRAFT_SVC_INSECURE=true " +
          "on a firewalled network you trust")
    new GraftFsServer(root, port, host, token).start()
    println(s"[graftsvc] serving $root on $host:$port" +
      (if (token.isDefined) " (token auth)" else ""))
    Thread.currentThread().join()
  }
}
