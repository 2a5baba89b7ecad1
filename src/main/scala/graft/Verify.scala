package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional extra args: run only these query names (local iteration;
    // the driver always calls with exactly two args → full run)
    val only = args.drop(2).toSet
    // fail LOUDLY on typo'd names: a silently-dropped unknown name would
    // make a zero-query run look like a green subset run
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // reducers scale with bytes via AQE (see Bench.scala: the sf10
      // ladder rung killed fixed-32-reducer wedge joins with spill OOM)
      // corpus-size-derived pre-coalesce width — same session as Bench
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        SessionTuning.initialParts(sfDir, cpus.toInt).toString)
      // Shuffle WRITER selection (r15, measured): with reduce counts at
      // or under spark.shuffle.sort.bypassMergeThreshold (default 200),
      // Spark picks BypassMergeSortShuffleWriter, which opens one file +
      // compression stream PER REDUCE PARTITION per map task — measured
      // here at ~8x the map-stage cpu of the sort-based writer on the
      // many small per-pass shuffles of the iterative graph loops
      // (q_label_prop map stages 1.3 s -> 10.2 s of task time when the
      // derived reducer width dropped under the threshold). Keep the
      // sort-based (Unsafe) writer for everything but trivially narrow
      // shuffles; at cluster scale reduce counts exceed 200 anyway, so
      // this only governs the small-R regime it was measured in.
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
