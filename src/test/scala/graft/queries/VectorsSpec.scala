package graft.queries

import graft.SparkTestBase
import graft.functions.DotProductF
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class VectorsSpec extends SparkTestBase {

  test("native DotProductF == zip_with/aggregate composition, bit-exact") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val composed = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val diff = e.select(
      (DotProductF.dot(col("embedding"), col("embedding")) - composed).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("DotProductF participates in whole-stage codegen") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val plan = e.select(DotProductF.dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // `*(n)` marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [dotproductf"), plan)
  }

  test("graft_dot is callable from SQL after registration") {
    DotProductF.register(spark)
    graft.Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    val n = spark.sql(
      "SELECT vec_id FROM emb WHERE graft_dot(embedding, embedding) > 0.5").count()
    assert(n > 0)
  }

  test("ANN recall@10 (LSH multi-probe and IVF) against the exact baseline") {
    val exact = Vectors.cosineTopK(spark, sfDir).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lsh = Vectors.annLsh(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Vectors.annIvf(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lshRecall = exact.intersect(lsh).size / 10.0
    val ivfRecall = exact.intersect(ivf).size / 10.0
    // near-orthogonal corpus (max cosine 0.51) is ANN's worst case;
    // modest-but-real thresholds
    assert(lshRecall >= 0.3, s"lsh recall=$lshRecall")
    assert(ivfRecall >= 0.2, s"ivf recall=$ivfRecall")
  }

  test("PQ+ADC recall@10 beats the coarse methods (100-candidate exact rerank)") {
    val exact = Vectors.cosineTopK(spark, sfDir).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = Vectors.annPq(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(pq).size / 10.0
    // ADC ranks ALL vectors (no bucketing loss) before the exact rerank,
    // so recall should be comfortably higher than LSH/IVF's floor
    assert(recall >= 0.5, s"pq recall=$recall")
  }
}
