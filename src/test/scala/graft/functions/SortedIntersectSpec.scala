package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SortedIntersectSpec extends SparkTestBase {

  test("sorted-merge intersect size == size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("w"))
    val pairs = docs.select(col("doc_id").as("ia"), col("w").as("wa"))
      .crossJoin(docs.select(col("doc_id").as("ib"), col("w").as("wb")))
      .filter(col("ia") < col("ib")).limit(2000)
    val diff = pairs.select(
        SortedIntersectSizeF.sortedIntersectSize(col("wa"), col("wb")).as("merge"),
        size(array_intersect(col("wa"), col("wb"))).as("ref"))
      .filter(col("merge") =!= col("ref"))
    assert(diff.count() === 0)
    // degenerate shapes: empty vs non-empty, identical, disjoint
    val cases = Seq(
      (Seq.empty[String], Seq("a", "b"), 0),
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3),
      (Seq("a", "c"), Seq("b", "d"), 0),
      (Seq("a", "b", "d"), Seq("b", "c", "d"), 2))
    cases.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(SortedIntersectSizeF.sortedIntersectSize(col("a"), col("b")))
        .head().getInt(0)
      assert(got === want, s"$a ∩ $b")
    }
  }

  test("unsorted input silently undercounts; the test-only contract flag catches it") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // HAZARD ON RECORD: feeding unsorted/duplicated arrays does not
    // error — it undercounts (the merge walks past out-of-order
    // elements). The producer owns the sorted-distinct contract
    // (jaccardPrefix writes its shingle table sorted); this test pins
    // both the failure mode and the diagnostic switch.
    def arr(xs: String*) = Literal.create(xs.toArray, ArrayType(StringType))
    val expr = SortedIntersectSizeF(arr("b", "a", "c"), arr("a", "b", "c")) // left NOT sorted
    val silent = expr.eval(null) // interpreted path, flag off
    assert(silent == 2, s"expected the documented undercount (2 of 3), got $silent")
    System.setProperty("graft.sortedIntersect.checkContract", "true")
    try {
      val e = intercept[IllegalArgumentException](expr.eval(null))
      assert(e.getMessage.contains("sorted-distinct contract"))
      // sorted inputs still pass with the check on
      assert(SortedIntersectSizeF(arr("a", "b", "c"), arr("a", "b", "c")).eval(null) == 3)
    } finally System.clearProperty("graft.sortedIntersect.checkContract")
  }

  test("participates in whole-stage codegen") {
    val df = graft.Tables.documents(spark, sfDir)
      .select(array_sort(array_distinct(split(col("text"), " "))).as("w"))
      .select(SortedIntersectSizeF.sortedIntersectSize(col("w"), col("w")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the *(n) marker on the containing Project is WholeStageCodegen
    assert("""\*\(\d+\) Project \[sortedintersectsizef""".r.findFirstIn(plan).isDefined, plan)
    assert(df.filter(col("n") > 0).count() > 0)
  }
}
