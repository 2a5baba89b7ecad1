package graft.queries

import java.nio.file.Files

import graft.Tables
import graft.table.{GraftCatalog, GraftTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-judged queries exercising the Graft table layer end-to-end
  * (SURVEY.md §2 B–D, H): each builds a fresh fixture table in a temp
  * warehouse from the driver parquet, runs the table-format operation
  * under test, and returns a deterministic projection whose oracle is
  * plain SQL over the source table — proving the format layer neither
  * loses nor invents rows.
  *
  * Time travel / history / maintenance are the non-SQL-expressible ops
  * (SURVEY.md §2 C3/C4): their queries verify by CONTENT equivalence to a
  * SQL-expressible state (e.g. v1 == full source), which is exactly what
  * makes them oracle-checkable after all.
  */
object TableQueries {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DecimalType(12, 2)), // reference-style DECIMAL money (README.md:170)
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** create → append(orders) → delete(status='F'): shared base fixture. */
  private def ordersFixture(s: SparkSession, d: String): GraftTable = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft_wh"))
    cat.createSchema("db")
    val t = cat.createTable("db.orders", ordersSchema)
    t.append(Tables.orders(s, d))
    t.delete(s, col("o_orderstatus") === "F")
    t
  }

  private def ordered(df: DataFrame): DataFrame = df.orderBy(col("o_orderkey"))

  /** B2+D1+D2+C2: current read after append + row-level delete. */
  def tableRead(s: SparkSession, d: String): DataFrame =
    ordered(ordersFixture(s, d).read(s))

  /** C3 time travel: snapshot 1 still holds the deleted rows — reading it
    * must reproduce the FULL source table (the README.md:258 "magic"). */
  def tableTimeTravel(s: SparkSession, d: String): DataFrame =
    ordered(ordersFixture(s, d).readVersion(s, 1))

  /** B3+B5 schema evolution: add column (old rows read NULL) + rename
    * (metadata-only, id-resolved) — then read across BOTH schema epochs:
    * pre-evolution files and a post-evolution append coexist. */
  def tableEvolution(s: SparkSession, d: String): DataFrame = {
    val t = ordersFixture(s, d)
    t.addColumn("status", StringType)
    t.renameColumn("o_orderpriority", "priority")
    val evolved = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F") // re-add the deleted rows under the new schema
      .withColumnRenamed("o_orderpriority", "priority")
      .withColumn("status", lit("RESTORED"))
    t.append(evolved)
    ordered(t.read(s))
  }

  /** B6+C2 hidden partitioning on days(ts): clustered write, file-pruned
    * read; result must equal a plain filter (pruning is an optimization,
    * never a semantic change). */
  def tablePartitionPrune(s: SparkSession, d: String): DataFrame = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft_wh"))
    cat.createSchema("db")
    val t = cat.createTable("db.events", eventsSchema, partitionDays = Some("ts"))
    t.append(Tables.events(s, d))
    t.readDayRange(s, "ts", "2024-01-05", "2024-01-09")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** H2 compaction: rewrite_data_files must not change logical content. */
  def tableCompact(s: SparkSession, d: String): DataFrame = {
    val t = ordersFixture(s, d)
    t.rewriteDataFiles(s, targetFiles = 1)
    ordered(t.read(s))
  }

  /** H1+C4: full lifecycle then history — deterministic columns only
    * (snapshot ids, operations, row counts; timestamps excluded). After
    * expire(retain_last=2) exactly the delete+replace snapshots remain. */
  def tableHistory(s: SparkSession, d: String): DataFrame = {
    val t = ordersFixture(s, d)
    t.rewriteDataFiles(s, targetFiles = 1)
    t.expireSnapshots(olderThanMs = Long.MaxValue, retainLast = 2)
    t.history(s)
      .select(col("snapshot_id"), col("operation"), col("n_rows"), col("is_current"))
      .orderBy(col("snapshot_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_read"            -> tableRead,
    "q_table_time_travel"     -> tableTimeTravel,
    "q_table_evolution"       -> tableEvolution,
    "q_table_partition_prune" -> tablePartitionPrune,
    "q_table_compact"         -> tableCompact,
    "q_table_history"         -> tableHistory)

  private val orderedOrdersSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
       o_orderdate, o_orderpriority
       FROM orders %s ORDER BY o_orderkey"""

  val oracle: Map[String, String] = Map(
    "q_table_read" -> orderedOrdersSql.format("WHERE o_orderstatus <> 'F'"),
    "q_table_time_travel" -> orderedOrdersSql.format(""),
    "q_table_evolution" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
         o_orderdate, o_orderpriority AS priority,
         CASE WHEN o_orderstatus = 'F' THEN 'RESTORED' END AS status
         FROM orders ORDER BY o_orderkey""",
    "q_table_partition_prune" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
         WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-09'
         ORDER BY event_id""",
    "q_table_compact" -> orderedOrdersSql.format("WHERE o_orderstatus <> 'F'"))
}
