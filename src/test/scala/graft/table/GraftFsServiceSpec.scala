package graft.table

import graft.SparkTestBase
import graft.table.GraftIO.RichHPath
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Child-JVM committer against the SERVICE (not the filesystem): the
  * warehouse URL is graftsvc://, so every metadata CAS goes through the
  * server's exclusive-PUT — the only coordination between this process
  * and the parent is the one catalog authority, exactly the multi-
  * driver topology the reference's REST catalog serves. ServiceLoader
  * discovery (META-INF/services) wires the scheme with zero conf. */
object GraftFsCommitChild {
  def main(args: Array[String]): Unit = {
    val t = new GraftTable(new HPath(args(0)))
    val n = args(1).toInt
    val prefix = args(2)
    for (i <- 1 to n)
      TableMeta.commitRetry(t.dir, maxAttempts = 10000) { m =>
        m.copy(tableProperties = Some(m.allProperties + (s"$prefix-$i" -> "1")))
      }
  }
}

/** The shared catalog SERVICE (GraftFsServer + GraftHttpFileSystem) —
  * the reference's rest-catalog/MinIO analog, previously a documented
  * non-goal. One process owns the warehouse; N driver JVMs mount
  * `graftsvc://host:port/` and run the full stack over the wire. */
class GraftFsServiceSpec extends SparkTestBase {

  private def mkService(): (GraftFsServer, HPath) = {
    val root = java.nio.file.Files.createTempDirectory("graftfs_spec")
    val srv = GraftFsServer.serve(root)
    (srv, new HPath(s"graftsvc://127.0.0.1:${srv.port}/wh"))
  }

  test("full table lifecycle over the service matches the local-warehouse run") {
    val (srv, wh) = mkService()
    try {
      val cat = new GraftCatalog(wh)
      cat.createSchema("db")
      val src = graft.Tables.orders(spark, sfDir)
      val t = cat.createTable("db.orders", src.schema, partitionDays = None)
      t.append(src)
      val preDelete = t.meta.currentSnapshotId.get
      t.delete(spark, col("o_orderstatus") === "F")
      // same operations on a plain local warehouse = the reference result
      val lcat = new GraftCatalog(graft.Scratch.fresh("graftfs_local_ref"))
      lcat.createSchema("db")
      val lt = lcat.createTable("db.orders", src.schema)
      lt.append(src); lt.delete(spark, col("o_orderstatus") === "F")
      def keys(t0: GraftTable) =
        t0.read(spark).select("o_orderkey").collect().map(_.getLong(0)).sorted
      assert(keys(t) === keys(lt))
      // time travel through the service
      assert(t.readVersion(spark, preDelete).count() === src.count())
      // compaction (a Spark parquet write THROUGH the scheme) + read-back
      t.rewriteDataFiles(spark, targetFiles = 1)
      assert(keys(t) === keys(lt))
      // SQL catalog plugin + a persisted VIEW over the service
      spark.conf.set("spark.sql.catalog.gfs_spec",
        classOf[graft.spark.GraftCatalogPlugin].getName)
      spark.conf.set("spark.sql.catalog.gfs_spec.warehouse", wh.toString)
      spark.sql("CREATE VIEW gfs_spec.db.v AS SELECT count(*) AS n FROM gfs_spec.db.orders")
      assert(spark.sql("SELECT n FROM gfs_spec.db.v").head().getLong(0) === keys(lt).length.toLong)
    } finally srv.stop()
  }

  test("the service's exclusive PUT is the commit CAS: exactly one writer wins a version") {
    val (srv, wh) = mkService()
    try {
      GraftIO.mkdirs(wh)
      val target = wh.resolve("v9.json")
      assert(GraftIO.publishExclusive(target, "a".getBytes))
      assert(!GraftIO.publishExclusive(target, "b".getBytes),
        "second exclusive PUT must lose")
      assert(new String(GraftIO.readAllBytes(target)) === "a")
    } finally srv.stop()
  }

  test("two JVMs committing through ONE service lose no commits") {
    val (srv, wh) = mkService()
    try {
      val cat = new GraftCatalog(wh)
      cat.createSchema("db")
      val t = cat.createTable("db.t", StructType(Seq(StructField("id", LongType))))
      val n = 60
      val javaBin = java.nio.file.Paths.get(
        System.getProperty("java.home"), "bin", "java").toString
      val pb = new ProcessBuilder(javaBin,
        "-cp", System.getProperty("java.class.path"),
        "graft.table.GraftFsCommitChild",
        t.dir.toString, n.toString, "child")
      pb.redirectErrorStream(true)
      val log = java.nio.file.Files.createTempFile("graftfs_child", ".log")
      pb.redirectOutput(ProcessBuilder.Redirect.to(log.toFile))
      val proc = pb.start()
      for (i <- 1 to n)
        TableMeta.commitRetry(t.dir, maxAttempts = 10000) { m =>
          m.copy(tableProperties = Some(m.allProperties + (s"parent-$i" -> "1")))
        }
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(proc.exitValue() === 0,
        s"child failed; log tail: ${java.nio.file.Files.readString(log).takeRight(600)}")
      val props = t.meta.allProperties
      val missing = (1 to n).flatMap(i =>
        Seq(s"parent-$i", s"child-$i").filterNot(props.contains))
      assert(missing.isEmpty, s"lost commits through the service: $missing")
    } finally srv.stop()
  }

  test("hidden-partitioned writes commit through the service (committer renames day= dirs)") {
    val (srv, wh) = mkService()
    try {
      val cat = new GraftCatalog(wh)
      cat.createSchema("db")
      val src = graft.Tables.events(spark, sfDir)
      // days() partitioning makes the Spark write nest day=YYYY-MM-DD
      // dirs under the task staging dir — the '=' in every path is what
      // a double-encoding rename bug silently breaks at commit time
      val t = cat.createTable("db.events", src.schema, partitionDays = Some("ts"))
      t.append(src)
      assert(t.read(spark).count() === src.count())
      val m = t.meta
      assert(m.currentSnapshot.get.manifest.forall(_.partitionValues.nonEmpty),
        "per-file partition values must be harvested through the scheme")
      // pruned read through the service still works
      val firstDay = t.read(spark).selectExpr("CAST(ts AS DATE)").head().getDate(0)
      assert(t.read(spark).filter(col("ts").cast("date") === firstDay).count() > 0)
    } finally srv.stop()
  }

  test("ranged reads: parquet written through the scheme reads back positionally") {
    val (srv, wh) = mkService()
    try {
      import spark.implicits._
      val df = (0L until 10000L).map(i => (i, s"v$i")).toDF("k", "v")
      val out = s"graftsvc://127.0.0.1:${srv.port}/data/p"
      df.repartition(4).write.parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() === 10000L)
      // column pruning + predicate → footer/page seeks over HTTP Range
      assert(back.filter(col("k") === 9999L).select("v").head().getString(0) === "v9999")
      assert(back.agg(sum("k")).head().getLong(0) === (0L until 10000L).sum)
    } finally srv.stop()
  }

  test("token auth: every verb 401s without the secret; the conf-carried token opens it") {
    val root = java.nio.file.Files.createTempDirectory("graftfs_auth")
    val srv = new GraftFsServer(root, token = Some("s3cret")).start()
    try {
      def code(method: String, path: String, tok: Option[String]): Int = {
        val c = new java.net.URL(s"http://127.0.0.1:${srv.port}$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod(method)
        tok.foreach(c.setRequestProperty("X-Graft-Token", _))
        try c.getResponseCode finally c.disconnect()
      }
      for (m <- Seq("GET", "HEAD", "DELETE")) {
        assert(code(m, "/fs/x", None) === 401, s"$m without token")
        assert(code(m, "/fs/x", Some("wrong")) === 401, s"$m with wrong token")
      }
      assert(code("POST", "/mkdirs/d", None) === 401)
      assert(code("POST", "/mkdirs/d", Some("s3cret")) === 200)
      // Bearer spelling is equivalent
      val c = new java.net.URL(s"http://127.0.0.1:${srv.port}/ls/d")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.setRequestProperty("Authorization", "Bearer s3cret")
      try assert(c.getResponseCode === 200) finally c.disconnect()
      // the Hadoop client carries fs.graftsvc.token from its conf —
      // newInstance dodges the FileSystem cache (same authority, new conf)
      val conf = new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration)
      conf.set("fs.graftsvc.token", "s3cret")
      val uri = java.net.URI.create(s"graftsvc://127.0.0.1:${srv.port}/")
      val fs = org.apache.hadoop.fs.FileSystem.newInstance(uri, conf)
      try {
        val p = new HPath(s"graftsvc://127.0.0.1:${srv.port}/d/hello.txt")
        val os = fs.create(p, true); os.write("hi".getBytes); os.close()
        val in = fs.open(p); val got = new String(in.readAllBytes()); in.close()
        assert(got === "hi")
      } finally fs.close()
    } finally srv.stop()
  }

  test("/ls survives hostile file names: '|' and newline round-trip the line protocol") {
    val (srv, wh) = mkService()
    try {
      GraftIO.mkdirs(wh.resolve("weird"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val weird = Seq("a|b.txt", "c\nd.txt", "plain.txt")
      // write through the client (rel() percent-encodes request paths) —
      // the PUT path accepts these names, so /ls must survive them too
      for (n <- weird) {
        val os = fs.create(new HPath(wh.resolve("weird"), n), true)
        os.write(n.getBytes); os.close()
      }
      val listed = fs.listStatus(wh.resolve("weird"))
        .map(_.getPath.getName).sorted
      assert(listed === weird.sorted.toArray,
        s"listing tore on delimiter bytes: ${listed.mkString(",")}")
      // and each listed entry opens to its own content (no cross-wiring)
      for (n <- weird) {
        val in = fs.open(new HPath(wh.resolve("weird"), n))
        try assert(new String(in.readAllBytes()) === n) finally in.close()
      }
    } finally srv.stop()
  }
}
