package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Iteration helper: like Verify but dumps only the named queries
  * (plus oracle_sql.json), so a changed query can be re-checked without
  * re-running the whole battery. Usage:
  *   runMain graft.VerifySome <sfDir> <outDir> <query> [<query> ...]
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
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
    SparkEntry.queries.filter(kv => names.contains(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[verify-some] dumped $name")
    }
    // q_ann_ivf/q_ann_pq oracles exist only after their seeded index has
    // been trained in this JVM (Vectors.oracle splices the centroids);
    // run them untimed when not among the dumped names, otherwise this
    // partial dump would overwrite a full run's oracle_sql.json with
    // those two entries silently MISSING and downgrade them to
    // rows-only at the driver.
    Seq("q_ann_ivf", "q_ann_pq").filterNot(names).foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
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
