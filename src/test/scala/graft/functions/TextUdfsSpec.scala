package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextUdfsSpec extends SparkTestBase {

  test("charEntropy: 0 for uniform strings, ~log2(k) for k equal-frequency chars") {
    import spark.implicits._
    val out = Seq("aaaa", "abab", "abcd", "").toDF("s")
      .select(TextUdfs.charEntropy(col("s")).as("h")).collect().map(_.getDouble(0))
    assert(out(0) === 0.0)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) - 2.0) < 1e-12)
    assert(out(3) === 0.0)
  }

  test("explode(udf) generator: trigram rows match the shingle count") {
    val docs = graft.Tables.documents(spark, sfDir)
    val nRows = docs.select(TextUdfs.explodeNgrams(col("text"), 3).as("g")).count()
    val expected = docs.selectExpr("sum(greatest(size(split(text, ' ')) - 2, 0))")
      .head().getLong(0)
    assert(nRows === expected)
  }
}
