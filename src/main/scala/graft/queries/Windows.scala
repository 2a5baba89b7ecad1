package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function family (SURVEY.md §2 I8–I11). Not in the reference;
  * part of the complete-engine inventory.
  *
  * Scale notes: a window partitioned by a key plans as one hash-shuffle on
  * that key followed by an in-partition sort — same cost envelope as a
  * groupBy. Per-customer partitions are tiny, so no single partition can
  * exceed executor memory even at 1000× data. Frames are deterministic:
  * every ORDER BY includes a unique tiebreak column.
  */
object Windows {

  private def byCustomerPrice =
    Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private def byCustomerDate =
    Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))

  /** I8+I11 ranking trio + top-k per group. row_number/rank/dense_rank are
    * INT in Spark; the oracle casts DuckDB's BIGINT to match. */
  def rankTopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(byCustomerPrice).as("rn"),
        rank().over(byCustomerPrice).as("rk"),
        dense_rank().over(byCustomerPrice).as("drk"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))

  /** I9 analytic functions: lag/lead/first_value over event-time order. */
  def lagLead(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(byCustomerDate).as("prev_price"),
        lead(col("o_totalprice"), 1).over(byCustomerDate).as("next_price"),
        first(col("o_totalprice")).over(byCustomerDate).as("first_price"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))

  /** I10 frame specs: running sum (rows unbounded-preceding), sliding
    * 3-row average, and a numeric RANGE frame. */
  def frames(s: SparkSession, d: String): DataFrame = {
    val running = byCustomerDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliding = byCustomerDate.rowsBetween(-2, Window.currentRow)
    // Double-typed RANGE bounds aren't expressible via the Scala
    // rangeBetween(Long, Long) API — use the SQL window form instead.
    val priceRange = expr(
      """count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
         RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)""")
    // Exact decimal sums: order-independent at any parallelism, and no
    // rounding boundary where engines could disagree. avg = exact sum ÷
    // count in double (bit-identical IEEE division in both engines).
    val priceDec = col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        // exact decimal sum internally, DOUBLE in the final projection
        // (driver hashes pandas dtypes; Decimal objects ≠ DuckDB float64)
        sum(priceDec).over(running)
          .cast(org.apache.spark.sql.types.DoubleType).as("running_spend"),
        (sum(priceDec).over(sliding).cast(org.apache.spark.sql.types.DoubleType) /
          count(lit(1)).over(sliding)).as("avg3"),
        priceRange.as("n_similar"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** I8 ntile bucketing (deterministic: full tiebreak in the order). */
  def ntileBuckets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(byCustomerPrice).as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))

  /** I8 distribution functions: percent_rank = (rank−1)/(n−1) and
    * cume_dist = peers/n — both exact small-integer divisions, so the
    * doubles are bit-identical across engines; ties get identical values
    * by definition (deterministic without a full tiebreak). */
  def distWindows(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    Tables.customer(s, d)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_custkey"))
  }

  /** Unpivot (melt): wide per-line metrics to (metric, value) rows —
    * Spark's unpivot plans as a single Expand, one pass, no join. */
  def unpivotMetrics(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  /** SCD Type 2 build: collapse each customer's order-status history
    * into validity intervals (valid_from, valid_to, is_current) — the
    * warehouse dimension-maintenance staple. Islands via the classic
    * rn − rn_per_status difference (two window passes over ONE shuffle
    * partitioning: both windows and the final group share the custkey
    * hash), then lead() closes each interval. Deterministic: ordering
    * tiebreaks on the unique order key. */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val wAll = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wSt = Window.partitionBy(col("o_custkey"), col("o_orderstatus"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val islands = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("island",
        row_number().over(wAll) - row_number().over(wSt))
      .groupBy(col("o_custkey"), col("o_orderstatus"), col("island"))
      .agg(min(col("o_orderdate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
    // tiebreak (status, island): several islands can share a start date
    // when one day carries a whole status flip-flop sequence
    val wIv = Window.partitionBy(col("o_custkey"))
      .orderBy(col("valid_from"), col("o_orderstatus"), col("island"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wIv))
      .select(
        col("o_custkey"), col("o_orderstatus"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("n_orders"))
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderstatus"))
  }

  /** Cumulative DISTINCT count over a window — SQL forbids
    * COUNT(DISTINCT) OVER, so the scalable formulation is the first-seen
    * trick: mark each (user, event_type)'s first row (row_number == 1 in
    * the per-type ordering), then a running SUM of markers in event
    * order. Both windows and the output share ONE user_id hash
    * partitioning — a single shuffle; per-row state is O(1), vs the
    * naive set-in-a-frame which buffers every preceding row. The running
    * "distinct event types seen so far" is the engagement-breadth metric
    * feature pipelines derive per interaction. */
  def cumDistinct(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val running = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("first_seen",
        (row_number().over(firstSeen) === 1).cast("int"))
      .withColumn("n_types_so_far", sum(col("first_seen")).over(running))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("n_types_so_far"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2"          -> scd2,
    "q_window_cum_distinct" -> cumDistinct,
    "q_window_rank"   -> rankTopK,
    "q_window_lag"    -> lagLead,
    "q_window_frames" -> frames,
    "q_window_ntile"  -> ntileBuckets,
    "q_window_dist"   -> distWindows,
    "q_unpivot"       -> unpivotMetrics)

  val oracle: Map[String, String] = Map(
    "q_scd2" ->
      """WITH numbered AS (
           SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey)
             - row_number() OVER (PARTITION BY o_custkey, o_orderstatus
               ORDER BY o_orderdate, o_orderkey) AS island
           FROM orders),
         islands AS (
           SELECT o_custkey, o_orderstatus, island,
             min(o_orderdate) AS valid_from,
             count(*) AS n_orders
           FROM numbered GROUP BY 1, 2, 3),
         iv AS (
           SELECT o_custkey, o_orderstatus, valid_from, n_orders,
             lead(valid_from, 1) OVER (PARTITION BY o_custkey
               ORDER BY valid_from, o_orderstatus, island) AS valid_to
           FROM islands)
         SELECT o_custkey, o_orderstatus, valid_from, valid_to,
           valid_to IS NULL AS is_current, n_orders
         FROM iv ORDER BY o_custkey, valid_from, o_orderstatus""",
    "q_window_cum_distinct" ->
      """SELECT event_id, user_id, ts, event_type,
           CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types_so_far
         FROM (SELECT event_id, user_id, ts, event_type,
                 CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
               FROM events)
         ORDER BY event_id""",
    "q_window_dist" ->
      """SELECT c_custkey, c_mktsegment,
         percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pr,
         cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd
         FROM customer ORDER BY c_custkey""",
    "q_unpivot" ->
      """WITH m AS (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
         SELECT * FROM m ORDER BY l_orderkey, l_linenumber, metric""",
    "q_window_ntile" ->
      """SELECT o_custkey, o_orderkey,
         CAST(ntile(4) OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS quartile
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM
         (SELECT o_custkey, o_orderkey, o_totalprice,
            CAST(row_number() OVER w AS INT) AS rn,
            CAST(rank() OVER w AS INT) AS rk,
            CAST(dense_rank() OVER w AS INT) AS drk
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey))
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price,
         first_value(o_totalprice) OVER w AS first_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderdate, o_orderkey""",
    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / count(*) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3,
         count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_similar
         FROM orders ORDER BY o_custkey, o_orderkey""")
}
