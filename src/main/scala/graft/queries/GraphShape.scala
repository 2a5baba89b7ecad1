package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: the volume terms that decide which physical shape the
  * triangle / jaccard family can afford at a given corpus — V, E,
  * max degree, and Σ deg² (= the cells a per-edge adjacency carry
  * shuffles, and the sort-spill volume an SMJ over array-carrying
  * rows writes). Usage: runMain graft.queries.GraphShape <sfDir>. */
object GraphShape {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val und = Graphs.copurchaseEdgesForDiag(spark, sfDir)
      .filter(col("src") < col("dst"))
    val deg = und.select(col("src").as("n")).unionAll(und.select(col("dst").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val row = deg.agg(
      count(lit(1)).as("v"), sum("d").as("sumd"), max("d").as("maxd"),
      sum(expr("CAST(d AS DECIMAL(38,0)) * d")).as("sumd2")).head()
    println(s"[graph-shape] $sfDir V=${row.getLong(0)} 2E=${row.getLong(1)} " +
      s"maxdeg=${row.getLong(2)} sumdeg2=${row.getDecimal(3)} " +
      s"(array-carry cells ≈ sumdeg2; x8 bytes = ${row.getDecimal(3).longValue() * 8L / (1L << 20)} MB)")
    // degree-ORIENTED wedge count: Σ C(outdeg',2) after directing each
    // edge low-rank → high-rank (rank = (deg, node)) — the row count a
    // no-arrays wedge-enumeration triangle join shuffles
    val ranked = deg.select(col("n"), col("d"))
    val e2 = und.join(ranked.select(col("n").as("src"), col("d").as("ds")), Seq("src"))
      .join(ranked.select(col("n").as("dst"), col("d").as("dd")), Seq("dst"))
      .select(when(col("ds") < col("dd") ||
          (col("ds") === col("dd") && col("src") < col("dst")), col("src"))
        .otherwise(col("dst")).as("a"))
    val w = e2.groupBy("a").agg(count(lit(1)).as("od"))
      .agg(sum(expr("od * (od - 1) / 2")).as("wedges"), max("od").as("maxout")).head()
    println(s"[graph-shape] oriented wedges=${w.get(0)} maxoutdeg=${w.get(1)}")
    spark.stop()
  }
}
