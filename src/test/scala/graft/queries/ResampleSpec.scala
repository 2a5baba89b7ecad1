package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkTestBase {

  test("resample grid is dense: exactly users x days rows, no gaps") {
    val out = Events.resampleDaily(spark, sfDir).cache()
    try {
      val users = graft.Tables.events(spark, sfDir).select("user_id").distinct().count()
      val days = out.select("day").distinct().count()
      assert(out.count() == users * days, s"grid ${out.count()} != $users users x $days days")
      // every user covers the identical day spine
      val perUser = out.groupBy("user_id").count().select("count").distinct().collect()
      assert(perUser.length == 1 && perUser.head.getLong(0) == days)
    } finally out.unpersist()
  }

  test("gap days have n_events=0 and carry the last observed value forward") {
    val out = Events.resampleDaily(spark, sfDir)
    val gaps = out.filter(col("n_events") === 0)
    assert(gaps.count() > 0, "fixture has no gap days — spec is vacuous")
    // a gap day's locf equals the previous day's locf (carried forward)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val bad = out
      .withColumn("prev", lag(col("locf_value"), 1).over(w))
      .filter(col("n_events") === 0 && col("prev").isNotNull &&
        !(col("locf_value") <=> col("prev")))
      .count()
    assert(bad == 0, s"$bad gap rows broke LOCF")
  }
}
