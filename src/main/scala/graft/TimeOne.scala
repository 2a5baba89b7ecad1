package graft

import org.apache.spark.sql.SparkSession

/** Iteration helper: time named queries (min of N, like Bench) on a
  * given corpus without running the whole battery.
  * Usage: runMain graft.TimeOne <sfDir> <query> [<query> ...]
  *
  * Carries the SAME attribution instruments as the Bench battery
  * (VERDICT r14 #4: a solo re-time without a window normalizer cannot
  * be compared to a battery `corrected` value, which is exactly how
  * the q_graph_cc / q_butterfly disputes stayed unresolvable):
  *  - the fixed CPU probe (range→hash→sum, the Bench noise index)
  *    BRACKETS every query, so a spot-check self-reports its window —
  *    compare the bracket to the quiet floor in BASELINE.md before
  *    comparing walls;
  *  - three-way wall/cpu/gc per run (see BASELINE.md "fourth read");
  *  - GRAFT_TIMEONE_RUNS (default 2) for warmth studies: every run's
  *    wall/cpu prints, so JIT convergence across repeats is visible
  *    (the battery runs 304 queries before the disputed ones — a
  *    2-run solo session measures a colder JVM by construction). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val nRuns = sys.env.get("GRAFT_TIMEONE_RUNS").flatMap(_.toIntOption).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // reducers scale with bytes via AQE (see Bench.scala: the sf10
      // ladder rung killed fixed-32-reducer wedge joins with spill OOM)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same three-way read as Bench (wall/cpu/gc) so a solo re-time
    // carries its own attribution — see BASELINE.md "fourth read"
    val osBean: Option[com.sun.management.OperatingSystemMXBean] =
      try Some(java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean])
      catch { case _: Throwable => None }
    def cpuNow(): Long =
      try osBean.map(_.getProcessCpuTime).getOrElse(-1L)
      catch { case _: Throwable => -1L }
    import scala.jdk.CollectionConverters._
    def gcMsNow(): Long =
      try java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
      catch { case _: Throwable => -1L }
    // the EXACT probe Bench interleaves (fixed plan, input-independent)
    // so a TimeOne bracket is directly comparable to BENCH noise floors
    def probeOnce(): Double =
      try {
        val t0 = System.nanoTime()
        spark.range(1L << 24).selectExpr("sum(cast(hash(id) as bigint))").collect()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    probeOnce() // JIT/codegen warm; untimed
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val pBefore = probeOnce()
      val runs = (1 to nRuns).map { _ =>
        val c0 = cpuNow(); val g0 = gcMsNow(); val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, (cpuNow() - c0) / 1e9, (gcMsNow() - g0) / 1e3)
      }
      val pAfter = probeOnce()
      val best = runs.minBy(_._1)
      println(f"[time-one] $n min=${best._1}%.2f cpu=${best._2}%.2f gc=${best._3}%.2f " +
        f"probes=[${pBefore}%.3f,${pAfter}%.3f] " +
        "runs=" + runs.map(r => f"${r._1}%.2f/${r._2}%.2f").mkString(","))
    }
    spark.stop()
  }
}
