package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class AggSpec extends SparkTestBase {

  test("approx_count_distinct (HLL, rsd=0.01) stays within 5% of the exact count") {
    val approx = Relational.approxDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (ao, ap)) =>
      val (eo, ep) = exact(k)
      assert(math.abs(ao - eo).toDouble / eo <= 0.05, s"$k orders: $ao vs $eo")
      assert(math.abs(ap - ep).toDouble / ep <= 0.05, s"$k parts: $ap vs $ep")
    }
  }

  test("approx_percentile stays within 2% of the exact percentile") {
    val approx = Relational.approxPercentiles(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Relational.percentiles(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(1))).toMap // p50, p25 (p75 unused)
    approx.foreach { case (k, (a50, _)) =>
      val e50 = exact(k)._1
      assert(math.abs(a50 - e50) / e50 <= 0.02, s"$k p50: $a50 vs $e50")
    }
  }

  test("decimal money sums are order-independent (repartition invariance)") {
    val base = Tables.lineitem(spark, sfDir)
    def total(parts: Int) = base.repartition(parts)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(total(1) === total(13))
  }
}
