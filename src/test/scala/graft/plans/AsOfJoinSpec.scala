package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native as-of join: planner wiring, plan shape (one shuffle per side,
  * like a sort-merge join), agreement with the window-composed
  * formulation, and the outer/null edges. */
class AsOfJoinSpec extends SparkTestBase {

  test("AsOfJoinExec is planned via the injected strategy; one exchange per side") {
    val df = graft.queries.Events.asofNative(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in the rendered tree
    assert(plan.contains("AsOfJoin"), plan.take(800))
    // the final orderBy adds a range-exchange; the join itself must cost
    // exactly two hash exchanges (one per side)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 2, s"expected 2 hash exchanges, plan:\n$plan")
  }

  test("native operator == window-composed as-of join, row for row") {
    val native = graft.queries.Events.asofNative(spark, sfDir).collect()
    val composed = graft.queries.Events.asofJoin(spark, sfDir).collect()
    assert(native.length === composed.length)
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("outer semantics: clicks before any purchase get nulls") {
    import spark.implicits._
    val clicks = Seq(
      (1L, 10L, 100L), (2L, 10L, 300L), (3L, 20L, 50L), (4L, 30L, 500L))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, 200L, 9.99), (10L, 250L, 19.99), (20L, 60L, 5.0))
      .toDF("p_user", "p_ts", "p_value")
    val out = AsOf.join(clicks, purchases, "user_id", "p_user", "ts", "p_ts")
      .orderBy("event_id").collect()
    // click@100 before first purchase@200 → null
    assert(out(0).isNullAt(3) && out(0).isNullAt(4))
    // click@300 picks the LATEST at-or-before (250, 19.99)
    assert(out(1).getLong(4) === 250L && out(1).getDouble(5) === 19.99)
    // user 20: purchase at 60 > click at 50 → null
    assert(out(2).isNullAt(3))
    // user 30 has no purchases at all → null
    assert(out(3).isNullAt(3))
  }

  test("nulls: null keys/left-ts match nothing; null right-ts is never a match") {
    import spark.implicits._
    val L = (x: Long) => java.lang.Long.valueOf(x)
    val clicks = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (L(1), L(10), L(100)),   // normal: must match through the null-ts right row
      (L(2), null, L(200)),    // null key → no match
      (L(3), L(10), null))     // null left ts → no match
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (L(10), null, 1.0),      // null right ts: sorted NULLS FIRST, must be skipped
      (L(10), L(50), 2.0))
      .toDF("p_user", "p_ts", "p_value")
    val out = AsOf.join(clicks, purchases, "user_id", "p_user", "ts", "p_ts")
      .orderBy("event_id").collect()
    assert(out(0).getLong(4) === 50L && out(0).getDouble(5) === 2.0,
      s"null-ts right row stalled the merge: ${out(0)}")
    assert(out(1).isNullAt(3) && out(1).isNullAt(4))
    assert(out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("mismatched key types are rejected at plan time") {
    import spark.implicits._
    val l = Seq((1, 100L)).toDF("k_int", "ts")
    val r = Seq((1L, 50L)).toDF("k_long", "p_ts")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k_int", "k_long", "ts", "p_ts")
    }
    assert(e.getMessage.contains("key types differ"))
  }

  test("tie at equal timestamps matches (rts <= lts inclusive)") {
    import spark.implicits._
    val clicks = Seq((1L, 7L, 100L)).toDF("event_id", "user_id", "ts")
    val purchases = Seq((7L, 100L, 42.0)).toDF("p_user", "p_ts", "p_value")
    val out = AsOf.join(clicks, purchases, "user_id", "p_user", "ts", "p_ts").collect()
    assert(out.length === 1)
    assert(out(0).getDouble(5) === 42.0)
  }
}
