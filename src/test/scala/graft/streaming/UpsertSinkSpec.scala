package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.table.GraftCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The upsert sink's correctness claims (EventStreams.applyUpsertBatch):
  * the (ts, event_id)-argmax resolve makes the final table state
  * independent of batch order AND of replays — the properties that make
  * a foreachBatch CDC apply safe under retries and out-of-order
  * delivery. */
class UpsertSinkSpec extends SparkTestBase {

  private def freshTable() = {
    val cat = new GraftCatalog(graft.Scratch.fresh("graft_upsert_spec_wh"))
    cat.createSchema("db")
    cat.createTable("db.user_state", StructType(Seq(
      StructField("user_id", LongType), StructField("last_ts", TimestampType),
      StructField("last_type", StringType), StructField("last_event_id", LongType))))
  }

  private def events: DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))

  private def stateOf(t: graft.table.GraftTable): Seq[String] =
    t.read(spark).orderBy(col("user_id")).collect()
      .map(_.mkString("|")).toSeq

  private def expected: Seq[String] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("event_id").as("last_event_id"))
      .orderBy(col("user_id")).collect().map(_.mkString("|")).toSeq
  }

  test("batch order does not change the final state (out-of-order convergence)") {
    val slices = (0 to 2).map(i => events.filter(col("event_id") % 3 === i))
    val fwd = freshTable()
    slices.foreach(b => EventStreams.applyUpsertBatch(b, fwd))
    val rev = freshTable()
    slices.reverse.foreach(b => EventStreams.applyUpsertBatch(b, rev))
    val want = expected
    assert(stateOf(fwd) == want)
    assert(stateOf(rev) == want)
  }

  test("replaying a batch is a fixed point (idempotent apply)") {
    val t = freshTable()
    val b0 = events.filter(col("event_id") % 3 === 0)
    EventStreams.applyUpsertBatch(b0, t)
    val once = stateOf(t)
    EventStreams.applyUpsertBatch(b0, t) // replay
    assert(stateOf(t) == once)
  }
}
