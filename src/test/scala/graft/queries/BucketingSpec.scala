package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the 100 TB pattern for repeated
  * fact⋈fact joins on a stable key: pay the clustering once at write
  * time, then every join on the bucket key runs WITHOUT a shuffle.
  * Demonstrated against the session catalog's bucketed tables. */
class BucketingSpec extends SparkTestBase {

  test("join on the bucket key plans with zero shuffle exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle-avoidance is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.orders(spark, sfDir).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("graft_bkt_orders")
      Tables.customer(spark, sfDir).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("graft_bkt_customer")

      val joined = spark.table("graft_bkt_orders")
        .join(spark.table("graft_bkt_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val qe = joined.queryExecution
      val rows = joined.collect()
      assert(rows.nonEmpty)
      // AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
      // only the final section is what actually ran
      val full = qe.executedPlan.toString
      val plan = full.split("== Initial Plan ==")(0)
      // the join itself must not shuffle either side: the only exchange
      // allowed is the one for the final groupBy re-partitioning
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toList
      assert(exchanges.size <= 1, s"expected <=1 exchange (for the agg), got ${exchanges.size}:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // cross-check result against the plain (non-bucketed) join
      val expected = Joins.innerJoin(spark, sfDir)
        .select(col("c_mktsegment"), col("n")).collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows.map(r => (r.getString(0), r.getLong(1))).toMap === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_customer")
    }
  }
}
