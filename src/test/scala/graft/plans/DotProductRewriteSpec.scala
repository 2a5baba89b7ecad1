package graft.plans

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class DotProductRewriteSpec extends SparkTestBase {

  private def composed = {
    val a = col("embedding")
    aggregate(
      zip_with(a, a, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x).as("d")
  }

  test("rule rewrites aggregate(zip_with(*)) into the native DotProductF") {
    DotProductRewrite.install(spark)
    try {
      val df = Tables.embeddings(spark, sfDir).select(composed)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dotproductf"), optimized)
      // numerics identical to the unoptimized composition
      val viaRule = df.collect().map(_.getDouble(0))
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
      val plain = Tables.embeddings(spark, sfDir).select(composed)
        .collect().map(_.getDouble(0))
      assert(viaRule.toSeq === plain.toSeq)
    } finally {
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("rule leaves non-dot-product aggregates untouched") {
    DotProductRewrite.install(spark)
    try {
      // sum of elements (no zip_with multiply) must NOT be rewritten
      val df = Tables.embeddings(spark, sfDir).select(
        aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast(DoubleType)).as("s"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("dotproductf"), optimized)
      assert(df.count() > 0)
    } finally {
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }
}
