package graft.table

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

import graft.SparkTestBase
import org.apache.hadoop.fs.{Path => HPath}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Drives the Iceberg REST-catalog protocol endpoints (GraftRestCatalog)
  * with hand-rolled JSON fixtures — the documented endpoint shapes of
  * the reference's rest-catalog container (README.md:69–83), checked
  * against this server's Graft-metadata-backed implementation. */
class GraftRestCatalogSpec extends SparkTestBase {

  private implicit val fmts: Formats = DefaultFormats

  private def mkService(): (GraftFsServer, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_rest")
    val srv = GraftFsServer.serve(root)
    (srv, s"http://127.0.0.1:${srv.port}")
  }

  private def http(method: String, url: String, body: String = null): (Int, JValue) = {
    val c = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    if (body != null) {
      c.setDoOutput(true)
      c.setRequestProperty("Content-Type", "application/json")
      val os = c.getOutputStream
      os.write(body.getBytes(StandardCharsets.UTF_8)); os.close()
    }
    try {
      val code = c.getResponseCode
      val in = if (code >= 400) c.getErrorStream else c.getInputStream
      val text = if (in == null) "" else new String(in.readAllBytes(), StandardCharsets.UTF_8)
      (code, if (text.isEmpty) JNothing else JsonMethods.parse(text))
    } finally c.disconnect()
  }

  private val pedidosSchema =
    """{"type":"struct","fields":[
      {"id":1,"name":"id_pedido","required":true,"type":"string"},
      {"id":2,"name":"valor","required":false,"type":"decimal(10, 2)"},
      {"id":3,"name":"quantidade","required":false,"type":"int"},
      {"id":4,"name":"data_criacao","required":false,"type":"timestamptz"}]}"""

  test("config + namespace CRUD follow the spec shapes") {
    val (srv, base) = mkService()
    try {
      val (cc, cfg) = http("GET", s"$base/v1/config")
      assert(cc == 200 && (cfg \ "defaults") == JObject() && (cfg \ "overrides") == JObject())
      val (nc, nsr) = http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      assert(nc == 200 && (nsr \ "namespace") == JArray(List(JString("db"))))
      // duplicate → the spec's 409 AlreadyExists
      val (dupC, dupB) = http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      assert(dupC == 409 && (dupB \ "error" \ "type").extract[String] == "AlreadyExistsException")
      // multi-level → loud 400, not silent flattening
      val (mlC, mlB) = http("POST", s"$base/v1/namespaces", """{"namespace":["a","b"]}""")
      assert(mlC == 400 && (mlB \ "error" \ "message").extract[String].contains("multi-level"))
      val (lc, lb) = http("GET", s"$base/v1/namespaces")
      assert(lc == 200 && (lb \ "namespaces") == JArray(List(JArray(List(JString("db"))))))
      assert(http("HEAD", s"$base/v1/namespaces/db")._1 == 204)
      assert(http("HEAD", s"$base/v1/namespaces/nope")._1 == 404)
      val (gc, gb) = http("GET", s"$base/v1/namespaces/db")
      assert(gc == 200 && (gb \ "namespace") == JArray(List(JString("db"))))
      assert(http("DELETE", s"$base/v1/namespaces/db")._1 == 204)
      assert(http("GET", s"$base/v1/namespaces/db")._1 == 404)
    } finally srv.stop()
  }

  test("table CRUD: create from an Iceberg schema, load, list, drop") {
    val (srv, base) = mkService()
    try {
      http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      val (cc, cb) = http("POST", s"$base/v1/namespaces/db/tables",
        s"""{"name":"pedidos","schema":$pedidosSchema,"properties":{"owner":"rest"}}""")
      assert(cc == 200, s"create failed: $cb")
      val loc = (cb \ "metadata-location").extract[String]
      assert(loc.startsWith("graftsvc://") &&
        loc.endsWith("/db/pedidos/metadata/v1.metadata.json"))
      assert((cb \ "metadata" \ "format-version").extract[Int] == 2)
      assert((cb \ "metadata" \ "properties" \ "owner") == JString("rest"))
      // the declared columns landed, with Graft's column-id discipline
      val cols = (cb \ "metadata" \ "schemas")
      assert(JsonMethods.compact(JsonMethods.render(cols)).contains("id_pedido"))
      // duplicate create → 409
      assert(http("POST", s"$base/v1/namespaces/db/tables",
        s"""{"name":"pedidos","schema":$pedidosSchema}""")._1 == 409)
      // load + head + list
      val (lc, lb) = http("GET", s"$base/v1/namespaces/db/tables/pedidos")
      assert(lc == 200 && (lb \ "metadata-location").extract[String] == loc)
      assert(http("HEAD", s"$base/v1/namespaces/db/tables/pedidos")._1 == 204)
      assert(http("HEAD", s"$base/v1/namespaces/db/tables/nope")._1 == 404)
      val (_, ids) = http("GET", s"$base/v1/namespaces/db/tables")
      assert((ids \ "identifiers") == JArray(List(JObject(
        "namespace" -> JArray(List(JString("db"))), "name" -> JString("pedidos")))))
      // unsupported shapes are LOUD
      val (nc, nb) = http("POST", s"$base/v1/namespaces/db/tables",
        """{"name":"nested","schema":{"type":"struct","fields":[
          {"id":1,"name":"m","required":false,
           "type":{"type":"map","key":"string","value":"long"}}]}}""")
      assert(nc == 400 && (nb \ "error" \ "message").extract[String].contains("nested"))
      assert(http("POST", s"$base/v1/namespaces/db/tables",
        s"""{"name":"parted","schema":$pedidosSchema,
            "partition-spec":{"spec-id":0,"fields":[{"source-id":4,"field-id":1000,
            "name":"day","transform":"day"}]}}""")._1 == 400)
      // rename, then drop
      assert(http("POST", s"$base/v1/tables/rename",
        """{"source":{"namespace":["db"],"name":"pedidos"},
           "destination":{"namespace":["db"],"name":"orders"}}""")._1 == 204)
      assert(http("HEAD", s"$base/v1/namespaces/db/tables/pedidos")._1 == 404)
      assert(http("DELETE", s"$base/v1/namespaces/db/tables/orders")._1 == 204)
      assert(http("DELETE", s"$base/v1/namespaces/db/tables/orders")._1 == 404)
    } finally srv.stop()
  }

  test("requirement-gated commit: assert-ref-snapshot-id is a real CAS") {
    val (srv, base) = mkService()
    try {
      http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      http("POST", s"$base/v1/namespaces/db/tables",
        s"""{"name":"t","schema":$pedidosSchema}""")
      // empty table: ref main is at null — a null expectation passes
      val (c1, b1) = http("POST", s"$base/v1/namespaces/db/tables/t",
        """{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":null}],
           "updates":[{"action":"set-properties","updates":{"k1":"v1","k2":"v2"}}]}""")
      assert(c1 == 200, s"commit failed: $b1")
      // a STALE expectation (snapshot 999) → the spec's 409 CommitFailed
      val (c2, b2) = http("POST", s"$base/v1/namespaces/db/tables/t",
        """{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":999}],
           "updates":[{"action":"set-properties","updates":{"k1":"nope"}}]}""")
      assert(c2 == 409 && (b2 \ "error" \ "type").extract[String] == "CommitFailedException")
      // remove-properties; verify through a LoadTableResult round-trip
      assert(http("POST", s"$base/v1/namespaces/db/tables/t",
        """{"updates":[{"action":"remove-properties","removals":["k2"]}]}""")._1 == 200)
      val (_, lb) = http("GET", s"$base/v1/namespaces/db/tables/t")
      val props = (lb \ "metadata" \ "properties") // Iceberg TableMetadata
      assert((props \ "k1") == JString("v1") && (props \ "k2") == JNothing)
      // unsupported update action → loud 400
      val (c4, b4) = http("POST", s"$base/v1/namespaces/db/tables/t",
        """{"updates":[{"action":"add-snapshot","snapshot":{}}]}""")
      assert(c4 == 400 && (b4 \ "error" \ "message").extract[String].contains("add-snapshot"))
    } finally srv.stop()
  }

  test("cross-surface: a REST-created table is a first-class graftsvc table") {
    val (srv, base) = mkService()
    try {
      http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      http("POST", s"$base/v1/namespaces/db/tables",
        """{"name":"ev","schema":{"type":"struct","fields":[
          {"id":1,"name":"id","required":false,"type":"long"},
          {"id":2,"name":"tag","required":false,"type":"string"}]}}""")
      // a Spark driver mounts the SAME authority as a filesystem and
      // appends — the reference topology's split brain test
      import spark.implicits._
      val t = new GraftTable(new HPath(s"graftsvc://127.0.0.1:${srv.port}/db/ev"))
      t.append((1L to 5L).map(i => (i, s"r$i")).toDF("id", "tag"))
      assert(t.read(spark).count() == 5)
      val snapId = t.meta.currentSnapshotId.get
      // REST sees the append: the CAS expectation must now be snapId
      assert(http("POST", s"$base/v1/namespaces/db/tables/ev",
        """{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":null}],
           "updates":[{"action":"set-properties","updates":{"x":"1"}}]}""")._1 == 409)
      val (cc, cb) = http("POST", s"$base/v1/namespaces/db/tables/ev",
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$snapId}],
            "updates":[{"action":"set-properties","updates":{"x":"1"}}]}""")
      assert(cc == 200, s"commit at the true snapshot failed: $cb")
      // and the driver sees the REST commit
      assert(t.meta.allProperties.get("x").contains("1"))
    } finally srv.stop()
  }

  test("LoadTableResult serves real Iceberg v2 metadata (r15 format interop)") {
    val (srv, base) = mkService()
    try {
      http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      http("POST", s"$base/v1/namespaces/db/tables",
        s"""{"name":"pedidos","schema":$pedidosSchema}""")
      // fresh table: Iceberg TableMetadata with no current snapshot
      val (c0, b0) = http("GET", s"$base/v1/namespaces/db/tables/pedidos")
      assert(c0 == 200)
      assert((b0 \ "metadata" \ "format-version").extract[Int] == 2, b0)
      assert((b0 \ "metadata" \ "current-snapshot-id").extract[Long] == -1L)
      assert((b0 \ "metadata-location").extract[String].endsWith(".metadata.json"))
      // column ids from the Iceberg create schema survive into the payload
      val f = ((b0 \ "metadata" \ "schemas")(0) \ "fields").extract[List[JValue]]
      assert(f.map(x => (x \ "name").extract[String]).contains("id_pedido"))
      // after a driver-side append through graftsvc, the payload carries
      // the snapshot + a manifest list that EXISTS on the warehouse
      val wh = new HPath(s"graftsvc://127.0.0.1:${srv.port}")
      val t = new GraftCatalog(wh).load("db.pedidos")
      import spark.implicits._
      t.append(Seq(("a", BigDecimal("1.00"), 1), ("b", BigDecimal("2.50"), 2))
        .toDF("id_pedido", "valor", "quantidade")
        .withColumn("data_criacao", org.apache.spark.sql.functions.current_timestamp()))
      val (c1, b1) = http("GET", s"$base/v1/namespaces/db/tables/pedidos")
      assert(c1 == 200)
      val snaps = (b1 \ "metadata" \ "snapshots").extract[List[JValue]]
      assert(snaps.size == 1, b1 \ "metadata" \ "snapshots")
      assert((b1 \ "metadata" \ "current-snapshot-id").extract[Long] ==
        (snaps.head \ "snapshot-id").extract[Long])
      val ml = (snaps.head \ "manifest-list").extract[String]
      assert(GraftIO.exists(new HPath(ml)), s"manifest list missing: $ml")
    } finally srv.stop()
  }

  test("error bodies follow the spec's error model on every failure class") {
    val (srv, base) = mkService()
    try {
      // {"error":{"message","type","code"}} — the documented ErrorModel
      // an external client's error handling dispatches on
      def assertError(code: Int, tpe: String, rc: Int, b: JValue): Unit = {
        assert(rc == code, s"expected $code, got $rc: $b")
        assert((b \ "error" \ "type").extract[String] == tpe, s"bad type in $b")
        assert((b \ "error" \ "code").extract[Int] == code, s"bad code in $b")
        assert((b \ "error" \ "message").extract[String].nonEmpty, s"empty message in $b")
      }
      val (c1, b1) = http("GET", s"$base/v1/namespaces/nope")
      assertError(404, "NoSuchNamespaceException", c1, b1)
      http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      val (c2, b2) = http("GET", s"$base/v1/namespaces/db/tables/nope")
      assertError(404, "NoSuchTableException", c2, b2)
      val (c3, b3) = http("DELETE", s"$base/v1/namespaces/db/tables/nope")
      assertError(404, "NoSuchTableException", c3, b3)
      val (c4, b4) = http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      assertError(409, "AlreadyExistsException", c4, b4)
      val (c5, b5) = http("GET", s"$base/v1/bogus/route")
      assertError(400, "BadRequestException", c5, b5)
      val (c6, b6) = http("POST", s"$base/v1/tables/rename",
        """{"source":{"namespace":["db"],"name":"a"},"destination":{"namespace":["db"],"name":"b"}}""")
      assertError(404, "NoSuchTableException", c6, b6)
    } finally srv.stop()
  }

  test("decoded traversal segments are rejected before any resolve") {
    val (srv, base) = mkService()
    try {
      val outside = java.nio.file.Files.createTempDirectory("graft_outside")
      val marker = outside.resolve("marker.txt")
      java.nio.file.Files.writeString(marker, "do not delete")
      // %2E%2E = '..' — decoded server-side; every route must 400 it
      // (GET/HEAD used to be a directory-existence oracle, DELETE could
      // remove a directory OUTSIDE the warehouse root)
      val (gc, gb) = http("GET", s"$base/v1/namespaces/%2E%2E")
      assert(gc == 400, s"traversal GET not rejected: $gc $gb")
      assert((gb \ "error" \ "type").extract[String] == "BadRequestException")
      assert(http("HEAD", s"$base/v1/namespaces/%2E%2E")._1 == 400)
      assert(http("DELETE", s"$base/v1/namespaces/%2E%2E")._1 == 400)
      // '..%2Fx' decodes to one segment containing a separator
      assert(http("GET", s"$base/v1/namespaces/..%2Fx")._1 == 400)
      assert(http("DELETE", s"$base/v1/namespaces/..%2F${outside.getFileName}")._1 == 400)
      // body-supplied names get the same guard
      http("POST", s"$base/v1/namespaces", """{"namespace":["db"]}""")
      val (tc, tb) = http("POST", s"$base/v1/namespaces/db/tables",
        s"""{"name":"../esc","schema":$pedidosSchema}""")
      assert(tc == 400, s"traversal table name not rejected: $tc $tb")
      val (rc2, _) = http("POST", s"$base/v1/tables/rename",
        """{"source":{"namespace":["db"],"name":".."},"destination":{"namespace":["db"],"name":"b"}}""")
      assert(rc2 == 400)
      assert(java.nio.file.Files.exists(marker), "traversal escaped the warehouse root")
    } finally srv.stop()
  }
}
