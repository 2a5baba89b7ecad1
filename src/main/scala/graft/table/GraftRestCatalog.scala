package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.Path

import com.sun.net.httpserver.HttpExchange
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types._

import graft.table.GraftIO.RichHPath

/** Iceberg REST-catalog PROTOCOL endpoints over a Graft warehouse —
  * the reference's `rest-catalog` container speaks exactly this
  * JSON-over-HTTP surface (README.md:69–83, `tabulario/iceberg-rest`),
  * and the endpoint shapes are public (the Iceberg REST OpenAPI spec);
  * no Iceberg jar is needed server-side. An external client can drive
  * /v1/config, namespace CRUD, table CRUD, rename, and the
  * requirement-gated commit against this server, and — since r15 — the
  * `metadata` payload inside LoadTableResult is REAL Iceberg v2
  * TableMetadata JSON whose manifest lists/manifests are spec Avro on
  * this warehouse (table/IcebergExport.scala). Remaining caveats are
  * the export's, all loud there: merge-on-read snapshots must be
  * compacted before they have an Iceberg image; per-file column stats
  * are not exported.
  *
  * Deliberate subset, every omission loud (400 with a message):
  *  - single-level namespaces (Graft's catalog is `schema.table`);
  *  - create-table accepts primitive Iceberg schema types only, no
  *    staged creates, no partition specs through this surface;
  *  - commit requirements: `assert-create` is rejected (staged create),
  *    `assert-ref-snapshot-id` on `main` is enforced against the
  *    current snapshot id — the CAS the spec exists for;
  *  - commit updates: `set-properties` / `remove-properties` (the
  *    metadata-only actions Graft can apply without an engine attached;
  *    data-bearing updates arrive through real drivers mounting
  *    graftsvc:// — GraftFsServiceSpec / ServiceSoakSpec).
  *
  * Commit path shares the SAME optimistic CAS as every other committer
  * (TableMeta.commit at the loaded version → the exclusive-create
  * publish), so a REST commit races graftsvc-mounted Spark drivers
  * correctly; a lost race surfaces as the spec's 409
  * CommitFailedException. */
final class GraftRestCatalog(root: Path) {

  private implicit val fmts: Formats = DefaultFormats
  private val wh: HPath = GraftIO.fromNio(root)
  private def cat = new GraftCatalog(wh)

  // namespaces in paths use the spec's %1F multi-level separator; Graft
  // namespaces are single-level, so its presence is a loud 400
  private val MultiLevelSep = '\u001F'

  def handle(x: HttpExchange, method: String, segs: List[String]): Unit = try {
    // Every decoded path segment resolves under the warehouse root, so
    // traversal tokens must die HERE, before any wh.resolve — the same
    // guard GraftFsServer.local() applies to /fs paths (ADVICE r14: a
    // DELETE /v1/namespaces/..%2Fx used to escape the warehouse scope,
    // and GET/HEAD on such a path was a directory-existence oracle).
    if (!segs.forall(safeSeg)) {
      error(x, 400, "BadRequestException",
        s"illegal path segment in /v1/${segs.mkString("/")}")
      return
    }
    (method, segs) match {
      case ("GET", List("config")) =>
        json(x, 200, JObject("defaults" -> JObject(), "overrides" -> JObject()))

      case ("GET", List("namespaces")) =>
        val nss = GraftIO.list(wh).filter(_.isDirectory).map(_.getPath.getName).sorted
        json(x, 200, JObject("namespaces" -> JArray(
          nss.map(n => JArray(List(JString(n)))).toList)))

      case ("POST", List("namespaces")) =>
        val b = body(x)
        nsOf(b \ "namespace") match {
          case Left(e) => error(x, 400, "BadRequestException", e)
          case Right(ns) =>
            if (GraftIO.isDirectory(wh.resolve(ns)))
              error(x, 409, "AlreadyExistsException", s"namespace $ns exists")
            else {
              cat.createSchema(ns)
              json(x, 200, JObject("namespace" -> JArray(List(JString(ns))),
                "properties" -> JObject()))
            }
        }

      case (("GET" | "HEAD"), List("namespaces", ns0)) =>
        withNs(x, ns0) { ns =>
          if (method == "HEAD") respond(x, 204)
          else json(x, 200, JObject("namespace" -> JArray(List(JString(ns))),
            "properties" -> JObject()))
        }

      case ("DELETE", List("namespaces", ns0)) =>
        withNs(x, ns0) { ns =>
          if (GraftIO.list(wh.resolve(ns)).nonEmpty)
            error(x, 409, "NamespaceNotEmptyException", s"namespace $ns is not empty")
          else { GraftIO.deleteRecursive(wh.resolve(ns)); respond(x, 204) }
        }

      case ("GET", List("namespaces", ns0, "tables")) =>
        withNs(x, ns0) { ns =>
          val ts = GraftIO.list(wh.resolve(ns)).filter(_.isDirectory)
            .map(_.getPath.getName).filter(t => cat.tableExists(s"$ns.$t")).sorted
          json(x, 200, JObject("identifiers" -> JArray(ts.map(t => JObject(
            "namespace" -> JArray(List(JString(ns))), "name" -> JString(t))).toList)))
        }

      case ("POST", List("namespaces", ns0, "tables")) =>
        withNs(x, ns0) { ns =>
          val b = body(x)
          val name = (b \ "name").extractOpt[String].getOrElse("")
          if (!safeSeg(name))
            error(x, 400, "BadRequestException", "missing or illegal table name")
          else if ((b \ "stage-create").extractOpt[Boolean].contains(true))
            error(x, 400, "BadRequestException", "staged create is not supported")
          else if ((b \ "partition-spec" \ "fields") match {
            case JArray(f) if f.nonEmpty => true; case _ => false })
            error(x, 400, "BadRequestException",
              "partition specs are not supported through the REST surface")
          else if (cat.tableExists(s"$ns.$name"))
            error(x, 409, "AlreadyExistsException", s"table $ns.$name exists")
          else schemaOf(b \ "schema") match {
            case Left(e) => error(x, 400, "BadRequestException", e)
            case Right(schema) =>
              val props = (b \ "properties") match {
                case JObject(kv) => kv.collect { case (k, JString(v)) => k -> v }.toMap
                case _ => Map.empty[String, String]
              }
              cat.createTable(s"$ns.$name", schema, properties = props)
              loadResult(x, ns, name)
          }
        }

      case (("GET" | "HEAD"), List("namespaces", ns0, "tables", t)) =>
        withNs(x, ns0) { ns =>
          if (!cat.tableExists(s"$ns.$t"))
            if (method == "HEAD") respond(x, 404)
            else error(x, 404, "NoSuchTableException", s"no table $ns.$t")
          else if (method == "HEAD") respond(x, 204)
          else loadResult(x, ns, t)
        }

      case ("DELETE", List("namespaces", ns0, "tables", t)) =>
        withNs(x, ns0) { ns =>
          if (cat.dropTable(s"$ns.$t")) respond(x, 204)
          else error(x, 404, "NoSuchTableException", s"no table $ns.$t")
        }

      case ("POST", List("namespaces", ns0, "tables", t)) =>
        withNs(x, ns0) { ns => commit(x, ns, t, body(x)) }

      case ("POST", List("tables", "rename")) =>
        val b = body(x)
        (identOf(b \ "source"), identOf(b \ "destination")) match {
          case (Right((sns, sn)), Right((dns, dn))) =>
            if (!cat.tableExists(s"$sns.$sn"))
              error(x, 404, "NoSuchTableException", s"no table $sns.$sn")
            else if (cat.tableExists(s"$dns.$dn"))
              error(x, 409, "AlreadyExistsException", s"table $dns.$dn exists")
            else { cat.renameTable(s"$sns.$sn", s"$dns.$dn"); respond(x, 204) }
          case (Left(e), _) => error(x, 400, "BadRequestException", e)
          case (_, Left(e)) => error(x, 400, "BadRequestException", e)
        }

      case _ => error(x, 400, "BadRequestException",
        s"unsupported route: $method /v1/${segs.mkString("/")}")
    }
  } catch {
    case e: org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException =>
      error(x, 404, "NoSuchNamespaceException", String.valueOf(e.getMessage))
    case e: Throwable =>
      error(x, 500, "InternalServerError", String.valueOf(e.getMessage))
  }

  /** The requirement-gated commit — the endpoint the REST spec exists
    * for. Load at a version, check requirements against THAT loaded
    * state, apply updates, publish at version+1; a racer surfaces as
    * the spec's 409. */
  private def commit(x: HttpExchange, ns: String, t: String, b: JValue): Unit = {
    if (!cat.tableExists(s"$ns.$t")) {
      error(x, 404, "NoSuchTableException", s"no table $ns.$t"); return
    }
    val dir = wh.resolve(ns).resolve(t)
    val (v, m) = TableMeta.load(dir)
    val reqs = (b \ "requirements") match { case JArray(r) => r; case _ => Nil }
    val reqErr: Option[(Int, String, String)] = reqs.view.map { r =>
      (r \ "type").extractOpt[String].getOrElse("") match {
        case "assert-ref-snapshot-id" =>
          val ref = (r \ "ref").extractOpt[String].getOrElse("main")
          if (ref != "main")
            Some((400, "BadRequestException", s"only ref 'main' is supported, got $ref"))
          else {
            val want = (r \ "snapshot-id") match {
              case JInt(n) => Some(n.toLong); case JLong(n) => Some(n); case _ => None
            }
            val cur = m.currentSnapshotId
            if (cur == want) None
            else Some((409, "CommitFailedException",
              s"requirement failed: ref main is at ${cur.getOrElse("null")}, expected ${want.getOrElse("null")}"))
          }
        case "assert-create" =>
          Some((400, "BadRequestException",
            "assert-create implies a staged create, which is not supported"))
        case other =>
          Some((400, "BadRequestException", s"unsupported requirement: $other"))
      }
    }.collectFirst { case Some(e) => e }
    if (reqErr.isDefined) {
      val (c, tp, msg) = reqErr.get; error(x, c, tp, msg); return
    }
    val updates = (b \ "updates") match { case JArray(u) => u; case _ => Nil }
    var props = m.allProperties
    val updErr: Option[String] = updates.view.map { u =>
      (u \ "action").extractOpt[String].getOrElse("") match {
        case "set-properties" =>
          (u \ "updates") match {
            case JObject(kv) =>
              props = props ++ kv.collect { case (k, JString(vv)) => k -> vv }; None
            case _ => Some("set-properties needs an object under 'updates'")
          }
        case "remove-properties" =>
          (u \ "removals") match {
            case JArray(ks) =>
              props = props -- ks.collect { case JString(k) => k }; None
            case _ => Some("remove-properties needs an array under 'removals'")
          }
        case other => Some(s"unsupported update action: $other " +
          "(data-bearing commits come through engine drivers on graftsvc://)")
      }
    }.collectFirst { case Some(e) => e }
    if (updErr.isDefined) {
      error(x, 400, "BadRequestException", updErr.get); return
    }
    try {
      TableMeta.commit(dir, v,
        m.copy(tableProperties = if (props.isEmpty) None else Some(props)))
      loadResult(x, ns, t)
    } catch {
      case _: ConcurrentCommitException =>
        error(x, 409, "CommitFailedException",
          s"concurrent commit on $ns.$t: version $v is no longer current")
    }
  }

  // ------------------------------------------------------------ helpers

  /** True iff `s` is safe to resolve as ONE child name under the
    * warehouse root: no separators (decoded %2F included), no '.'/'..'
    * traversal tokens. Applied to every decoded path segment AND every
    * body-supplied table name before any resolve. */
  private def safeSeg(s: String): Boolean =
    s.nonEmpty && s != "." && s != ".." &&
      !s.contains('/') && !s.contains('\\')

  private def withNs(x: HttpExchange, ns0: String)(f: String => Unit): Unit =
    if (ns0.indexOf(MultiLevelSep) >= 0)
      error(x, 400, "BadRequestException",
        "multi-level namespaces are not supported (Graft catalogs are schema.table)")
    else if (!GraftIO.isDirectory(wh.resolve(ns0)))
      error(x, 404, "NoSuchNamespaceException", s"no namespace $ns0")
    else f(ns0)

  private def nsOf(j: JValue): Either[String, String] = j match {
    case JArray(List(JString(ns))) if safeSeg(ns) && !ns.contains('.') => Right(ns)
    case JArray(l) if l.length > 1 => Left("multi-level namespaces are not supported")
    case _ => Left("namespace must be a one-element string array")
  }

  private def identOf(j: JValue): Either[String, (String, String)] =
    (nsOf(j \ "namespace"), (j \ "name").extractOpt[String]) match {
      case (Right(ns), Some(n)) if safeSeg(n) => Right((ns, n))
      case (Left(e), _) => Left(e)
      case _ => Left("identifier needs namespace + a legal name")
    }

  /** Primitive Iceberg schema JSON → Spark StructType; anything nested
    * or unknown is a loud Left. */
  private def schemaOf(j: JValue): Either[String, StructType] = j match {
    case JObject(_) if (j \ "type").extractOpt[String].contains("struct") =>
      val fields = (j \ "fields") match { case JArray(f) => f; case _ => Nil }
      val converted = fields.map { f =>
        val name = (f \ "name").extractOpt[String].getOrElse("")
        val required = (f \ "required").extractOpt[Boolean].getOrElse(false)
        (f \ "type").extractOpt[String] match {
          case None => Left(s"field $name: nested types are not supported")
          case Some(t) => primitive(t) match {
            case Some(dt) => Right(StructField(name, dt, nullable = !required))
            case None => Left(s"field $name: unsupported type $t")
          }
        }
      }
      converted.collectFirst { case Left(e) => e } match {
        case Some(e) => Left(e)
        case None if converted.isEmpty => Left("schema has no fields")
        case None => Right(StructType(converted.collect { case Right(f) => f }))
      }
    case _ => Left("schema must be an Iceberg struct schema")
  }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private def primitive(t: String): Option[DataType] = t match {
    case "boolean" => Some(BooleanType)
    case "int" => Some(IntegerType)
    case "long" => Some(LongType)
    case "float" => Some(FloatType)
    case "double" => Some(DoubleType)
    case "string" => Some(StringType)
    case "binary" => Some(BinaryType)
    case "date" => Some(DateType)
    case "timestamp" => Some(TimestampNTZType)
    case "timestamptz" => Some(TimestampType)
    case DecimalRe(p, s) => Some(DecimalType(p.toInt, s.toInt))
    case _ => None
  }

  /** LoadTableResult: `metadata` is REAL Iceberg v2 TableMetadata JSON,
    * produced (and per-version cached) by IcebergExport — the format
    * half of interop, closed in r15; manifests referenced by it are
    * spec Avro on the same warehouse, so a client can follow
    * metadata-location (the Host header names how THEY reached us) and
    * walk snapshots → manifest lists → data files. The ONE remaining
    * fallback, loud in the scaladoc: a table whose current snapshot
    * carries merge-on-read state has no data-only Iceberg image — for
    * those the pre-export Graft metadata document is served (compact
    * first to get the Iceberg view). */
  private def loadResult(x: HttpExchange, ns: String, t: String): Unit = {
    val dir = wh.resolve(ns).resolve(t)
    val (v, _) = TableMeta.load(dir)
    val host = Option(x.getRequestHeaders.getFirst("Host")).getOrElse("127.0.0.1")
    val (metaJson, loc) =
      try {
        val (p, _) = IcebergExport.export(new GraftTable(dir))
        (JsonMethods.parse(new String(GraftIO.readAllBytes(p), StandardCharsets.UTF_8)),
          s"graftsvc://$host/$ns/$t/metadata/v$v.metadata.json")
      } catch {
        case _: IcebergExportUnsupported =>
          (JsonMethods.parse(new String(
            GraftIO.readAllBytes(dir.resolve("meta").resolve(s"v$v.json")),
            StandardCharsets.UTF_8)),
            s"graftsvc://$host/$ns/$t/meta/v$v.json")
      }
    json(x, 200, JObject(
      "metadata-location" -> JString(loc),
      "metadata" -> metaJson,
      "config" -> JObject()))
  }

  private def body(x: HttpExchange): JValue = {
    val bytes = x.getRequestBody.readAllBytes()
    if (bytes.isEmpty) JObject()
    else JsonMethods.parse(new String(bytes, StandardCharsets.UTF_8))
  }

  private def json(x: HttpExchange, code: Int, j: JValue): Unit = {
    val out = JsonMethods.compact(JsonMethods.render(j)).getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    respond(x, code, out)
  }

  private def error(x: HttpExchange, code: Int, tpe: String, msg: String): Unit =
    json(x, code, JObject("error" -> JObject(
      "message" -> JString(msg), "type" -> JString(tpe), "code" -> JInt(code))))

  private def respond(x: HttpExchange, code: Int, bodyB: Array[Byte] = Array.empty): Unit = {
    x.sendResponseHeaders(code, if (bodyB.isEmpty) -1 else bodyB.length.toLong)
    if (bodyB.nonEmpty) { val os = x.getResponseBody; os.write(bodyB); os.close() }
    x.close()
  }
}
