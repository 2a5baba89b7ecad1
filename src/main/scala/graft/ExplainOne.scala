package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper for the optimization rounds: writes
  * `.explain("formatted")` for named queries to files, so plan claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  * Usage: runMain graft.ExplainOne <sfDir> <outDir> <suffix> <q> [<q> ...]
  * Writes <outDir>/<q>_<suffix>.txt per query. Same session shape as
  * Bench (extensions, AQE initialPartitionNum, UTC) so the dumped plan
  * is the one the bench actually runs. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
        println(s"[explain-one] wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[explain-one] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
