package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.table.GraftCatalog

/** Child-JVM drainer for CrossProcessStreamResumeSpec: its OWN
  * SparkSession, its own GraftStreamSource instance, no shared JVM
  * state with the parent — the only continuity is the on-disk
  * checkpoint + the table's snapshot log. Drains the table stream
  * AvailableNow through the given checkpoint and appends every row it
  * saw to `outFile` as `k,v` lines. */
object StreamResumeChild {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, checkpoint, outFile) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-xproc-stream-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val buf = new java.lang.StringBuilder
    val q = spark.readStream.format("graft").load(tableDir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          buf.append(r.getLong(0)).append(',').append(r.getString(1)).append('\n'))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), buf.toString)
    spark.stop()
  }
}

/** GraftStreamSourceSpec proves restart-reads-only-new WITHIN one JVM,
  * where the source instance (and any in-memory offset state) survives
  * between drains. The production claim is stronger: a streaming job
  * that dies and is resubmitted — a NEW driver process — must resume
  * from the CHECKPOINT alone and read only snapshots committed since.
  * This spec runs each drain in a separate child JVM (mirroring
  * CrossProcessCommitSpec's discipline for the commit CAS): JVM A
  * drains two snapshots, the parent appends a third, JVM B resumes
  * from the same checkpoint and must see ONLY the third. */
class CrossProcessStreamResumeSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  // the child builds a SparkSession outside spark-submit: it needs the
  // same JDK17 --add-opens set build.sbt gives forked test JVMs
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runChild(tableDir: String, checkpoint: String, outFile: String): Unit = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.streaming.StreamResumeChild",
      tableDir, checkpoint, outFile)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val log = java.nio.file.Files.createTempFile("xproc_stream", ".log")
    pb.redirectOutput(ProcessBuilder.Redirect.to(log.toFile))
    val proc = pb.start()
    assert(proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "child JVM did not finish")
    assert(proc.exitValue() === 0,
      s"child drain failed; tail of log: ${
        java.nio.file.Files.readString(log).takeRight(800)}")
  }

  private def readOut(outFile: String): Seq[(Long, String)] =
    java.nio.file.Files.readString(java.nio.file.Paths.get(outFile))
      .split('\n').toSeq.filter(_.nonEmpty).map { l =>
        val Array(k, v) = l.split(','); (k.toLong, v)
      }.sortBy(_._1)

  test("a NEW process resumes from the checkpoint and reads only new snapshots") {
    val spark = graft.SparkTestBase.session // parent session: appends only
    val cat = new GraftCatalog(graft.Scratch.fresh("xproc_stream_wh"))
    cat.createSchema("db")
    val t = cat.createTable("db.t", schema)
    import spark.implicits._
    def batch(range: Range, tag: String) =
      range.map(i => (i.toLong, tag)).toDF("k", "v")
    t.append(batch(0 until 10, "a"))
    t.append(batch(10 until 20, "b"))
    val checkpoint = graft.Scratch.fresh("xproc_ckpt").toString
    val out1 = graft.Scratch.fresh("xproc_out").resolve("one.txt").toString
    val out2 = graft.Scratch.fresh("xproc_out").resolve("two.txt").toString
    runChild(t.localDir.toString, checkpoint, out1)
    assert(readOut(out1).map(_._1) === (0L until 20L),
      "JVM A must drain both initial snapshots")
    // the table moves on while no stream is running
    t.append(batch(20 until 30, "c"))
    runChild(t.localDir.toString, checkpoint, out2)
    val resumed = readOut(out2)
    assert(resumed.map(_._1) === (20L until 30L),
      "JVM B must resume from the checkpoint: ONLY the new snapshot, no replay")
    assert(resumed.forall(_._2 == "c"))
  }
}
