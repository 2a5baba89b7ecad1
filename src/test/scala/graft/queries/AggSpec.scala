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

  test("decimal money sums are order-independent (repartition invariance)") {
    val base = Tables.lineitem(spark, sfDir)
    def total(parts: Int) = base.repartition(parts)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(total(1) === total(13))
  }
}
