package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class AggSpec extends SparkTestBase {

  test("approx_count_distinct output: exact counts match, HLL error flags all true") {
    val rows = Relational.approxDistinct(spark, sfDir).collect()
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      val (eo, ep) = exact(r.getString(0))
      assert(r.getLong(1) === eo && r.getLong(2) === ep) // exact columns ARE exact
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"${r.getString(0)}: HLL outside its 5% contract") // sketch error bound held
    }
  }

  test("approx_percentile GK rank-error flags all true") {
    val rows = Relational.approxPercentiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2),
        s"${r.getString(0)}: approx_percentile outside the exact [q-0.01, q+0.01] rank window")
    }
  }

  test("decimal money sums are order-independent (repartition invariance)") {
    val base = Tables.lineitem(spark, sfDir)
    def total(parts: Int) = base.repartition(parts)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(total(1) === total(13))
  }
}
