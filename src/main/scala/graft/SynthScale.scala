package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** sf1 synthesis for the SCALING.md audit (r11 verdict ask #1):
  * documented local replication of the driver's sf0.1 corpus at 10×,
  * preserving the workload's distributional shape so measured runtime
  * ratios mean something:
  *
  *  - FACT tables replicate REPL times with key striding (id + k·stride)
  *    so join fan-outs, group cardinalities and per-key degrees stay
  *    EXACTLY the original's — aggregate/join work scales linearly by
  *    construction, which is what a 10× organic corpus does.
  *  - DIMENSIONS region/nation stay fixed (the TPC-H rule); customer/
  *    supplier/part scale with their fact keys.
  *  - documents: replica k > 0 deterministically salts ~half the tokens
  *    (token ⊕ replica id), so cross-replica Jaccard ≈ 1/3 — far below
  *    every dedup operating point — while WITHIN-replica Jaccard is
  *    bit-identical to the source corpus (same-token → same salt):
  *    near-dup structure per unit corpus is preserved instead of
  *    inflating every dup group 10×.
  *  - embeddings: replica k > 0 shifts dimension (k−1) mod 64 by +4.0
  *    (≫ the DBSCAN ε ≈ 1.2 and any cosine operating point), placing
  *    replicas in well-separated regions: ε-ball populations and
  *    per-cluster densities stay the original's, mimicking an organic
  *    corpus spreading into new regions rather than densifying one.
  *  - events: ids stride; ts shifts by k seconds (window populations
  *    per user stay identical).
  *
  * Usage: runMain graft.SynthScale [outDir] [replicas]
  * (defaults: target/testdata/sf1, 10; source is always sf0.1). */
object SynthScale {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/testdata/sf1")
    val repl = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L
    // replicate df REPL times, remapping every (column -> stride) key
    def replicate(df: DataFrame, keys: Map[String, Long]): DataFrame =
      df.crossJoin(spark.range(repl).toDF("_k"))
        .select(df.columns.map { c =>
          keys.get(c) match {
            case Some(st) => (col(c) + col("_k") * st).as(c)
            case None     => col(c)
          }
        }: _*)
    // single FILE per table named <name>.parquet — the driver's exact
    // layout (the streaming file source globs `events.parquet` as a
    // FILENAME; a directory of part files would silently stream zero
    // rows, which voided the first sf1 measurement)
    def write(df: DataFrame, name: String): Unit = {
      import java.nio.file.{Files => JF, Paths => JP}
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = JF.list(JP.get(tmp)).filter(p =>
        p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      JF.createDirectories(JP.get(out))
      JF.move(part, JP.get(s"$out/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val walk = JF.walk(JP.get(tmp))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { JF.deleteIfExists(p); () })
      finally walk.close()
      println(s"[synth] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // dims fixed
    write(t("region"), "region")
    write(t("nation"), "nation")

    val cust = t("customer"); val custStride = stride(cust, "c_custkey")
    write(replicate(cust, Map("c_custkey" -> custStride)), "customer")
    val supp = t("supplier"); val suppStride = stride(supp, "s_suppkey")
    write(replicate(supp, Map("s_suppkey" -> suppStride)), "supplier")
    val part = t("part"); val partStride = stride(part, "p_partkey")
    write(replicate(part, Map("p_partkey" -> partStride)), "part")
    val orders = t("orders"); val orderStride = stride(orders, "o_orderkey")
    write(replicate(orders,
      Map("o_orderkey" -> orderStride, "o_custkey" -> custStride)), "orders")
    write(replicate(t("lineitem"), Map(
      "l_orderkey" -> orderStride,
      "l_partkey" -> partStride,
      "l_suppkey" -> suppStride)), "lineitem")

    val ev = t("events")
    write(ev.crossJoin(spark.range(repl).toDF("_k"))
      .select(
        (col("event_id") + col("_k") * stride(ev, "event_id")).as("event_id"),
        expr("timestampadd(SECOND, _k, ts)").as("ts"),
        (col("user_id") + col("_k") * stride(ev, "user_id")).as("user_id"),
        col("event_type"), col("value"), col("props")), "events")

    val docs = t("documents")
    val docStride = stride(docs, "doc_id")
    write(docs.crossJoin(spark.range(repl).toDF("_k"))
      .select(
        (col("doc_id") + col("_k") * docStride).as("doc_id"),
        when(col("_k") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "), tok =>
            when(pmod(hash(tok), lit(2)) === 0,
                concat(tok, lit("x"), col("_k").cast(StringType)))
              .otherwise(tok)), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast(LongType)), "documents")

    val emb = t("embeddings")
    val vecStride = stride(emb, "vec_id")
    write(emb.crossJoin(spark.range(repl).toDF("_k"))
      .select(
        (col("vec_id") + col("_k") * vecStride).as("vec_id"),
        when(col("_k") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            when(i === pmod(col("_k") - 1, lit(64)).cast(IntegerType),
              x + lit(4.0f)).otherwise(x))).as("embedding"),
        col("label")), "embeddings")

    spark.stop()
  }
}
