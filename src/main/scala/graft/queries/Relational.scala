package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's own relational surface (SURVEY.md §2 B/C/E/F/G),
  * transposed onto the driver test data, plus the standard aggregate
  * family a credible engine needs.
  *
  * Reference evidence: filters/projections/casts README.md:199-208,231;
  * group-count README.md:238; LIMIT README.md:216; CSV scan
  * README.md:186-193.
  *
  * Scale notes: every query is a declarative DataFrame plan — filters and
  * projections reach the parquet scan (PushedFilters/ReadSchema), group-bys
  * plan as partial+final HashAggregate so the shuffle carries only group
  * keys + partial states, and the final orderBy is a bounded sort on
  * already-reduced data.
  */
object Relational {

  /** F1 README.md:238 — GROUP BY + count over the fact table. */
  def ordersByStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("o_orderstatus"))

  /** E2+E4 README.md:231 — equality filter + narrow projection (both are
    * pushed into the parquet scan). */
  def filterProject(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_mktsegment") === "FURNITURE")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** E3 README.md:203-207 — the CAST battery (decimal/int/date/string). */
  def castTypes(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qty_int"),
        // Exact DECIMAL quantize, surfaced as DOUBLE: the driver hashes
        // pandas dtypes, and Spark's Decimal objects ≠ DuckDB's float64
        // even when numerically identical. Same rule everywhere: decimal
        // arithmetic stays exact internally, final projection is DOUBLE.
        col("l_extendedprice").cast(DecimalType(12, 2)).cast(DoubleType).as("price_dec"),
        // DATE cast exercised, surfaced as TIMESTAMP: a raw DATE column
        // reaches pandas as datetime.date objects while DuckDB hands back
        // datetime64 — stringified differently by the driver's hash
        col("l_shipdate").cast(DateType).cast(TimestampType).as("ship_date"),
        col("l_orderkey").cast(StringType).as("okey_str"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** G1 README.md:216 — ordered top-k; Spark plans TakeOrderedAndProject,
    * which takes k rows per partition then merges on the driver — no full
    * sort, no full shuffle, scale-safe. */
  def topOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5)

  /** C1 README.md:186-193 — gzipped `;`-delimited header CSV scan with
    * cast-on-ingest, exactly the reference's ingestion path. We round-trip
    * the orders table through csv.gz in a temp dir; content is preserved,
    * so the oracle is the orders table itself. */
  def csvScan(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.Scratch.overwritable("orders_csv", d)
    Tables.orders(s, d)
      .write.mode("overwrite")
      .option("header", "true").option("sep", ";")
      .option("compression", "gzip")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(tmp)
    s.read
      .option("header", "true").option("sep", ";")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(tmp) // all columns arrive as string, like the reference's raw view
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        col("o_custkey").cast(LongType).as("o_custkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast(DoubleType).as("o_totalprice"),
        col("o_orderdate").cast(TimestampType).as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** C-family source breadth: ORC round-trip (columnar alternative to
    * parquet — same vectorized read path). Content-preserving, so the
    * oracle is the source table itself. */
  def orcScan(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.Scratch.overwritable("orders_orc", d)
    Tables.orders(s, d).write.mode("overwrite").orc(tmp)
    s.read.orc(tmp).orderBy(col("o_orderkey"))
  }

  /** C-family source breadth: JSON-lines round-trip with an explicit
    * schema (schema-on-read, no inference pass — at scale inference is a
    * full extra scan). */
  def jsonScan(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.Scratch.overwritable("orders_json", d)
    val src = Tables.orders(s, d)
    src.write.mode("overwrite").json(tmp)
    s.read.schema(src.schema).json(tmp).orderBy(col("o_orderkey"))
  }

  /** I13 string functions. */
  def scalarString(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 10, 9).as("cnum"),
        concat(col("c_mktsegment"), lit("-"), col("c_nationkey").cast(StringType)).as("seg_nat"),
        col("c_name").like("%42%").as("has42"),
        regexp_extract(col("c_name"), "[0-9]+", 0).as("digits"),
        length(col("c_name")).as("name_len"),
        levenshtein(col("c_name"), lit("Customer#000000042")).as("lev42"))
      .orderBy(col("c_custkey"))

  /** I13 string battery #2: padding, translation, splitting, position,
    * repetition, regex multi-match — the remaining everyday string kit
    * (ETL key formatting, token surgery), all codegen'd row-side
    * built-ins with exact DuckDB duals. */
  def scalarString2(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        lpad(col("c_custkey").cast(StringType), 10, "0").as("key_pad"),
        rpad(col("c_mktsegment"), 12, ".").as("seg_pad"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        repeat(lit("ab"), (col("c_custkey") % 3 + 1).cast("int")).as("reps"),
        split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
        instr(col("c_name"), "#").cast("int").as("hash_pos"),
        expr("left(c_name, 8)").as("l8"),
        expr("right(c_name, 4)").as("r4"),
        array_join(expr("regexp_extract_all(c_name, '[0-9]+', 0)"), ",").as("all_digits"),
        expr("regexp_count(c_name, '0')").cast("int").as("n_zeros"))
      .orderBy(col("c_custkey"))

  /** I13 date functions. */
  def scalarDate(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("MONTH", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType)).as("days_since"))
      .orderBy(col("o_orderkey"))

  /** I13 math functions. */
  def scalarMath(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        // Per-row double arithmetic is IEEE-deterministic in any engine —
        // no rounding needed (and round() half-up on a shortest-repr
        // double diverges from DuckDB exactly at .xx5 products).
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        ceil(col("l_quantity") / 7.0).as("qty_ceil"),
        floor(col("l_quantity") / 7.0).as("qty_floor"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** I13 conditional: CASE WHEN / coalesce / nullif. */
  def scalarConditional(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(when(col("o_orderstatus") =!= "F", col("o_orderstatus")), lit("FINISHED")).as("st"))
      .orderBy(col("o_orderkey"))

  /** F-family battery (TPC-H Q1 shape): sum/avg/min/max/count/
    * count-distinct/stddev in one partial-aggregatable pass. */
  def aggStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        // exact decimal sum ÷ count in double: order-independent and
        // bit-identical to the oracle (avg(double) can land on a .xx5
        // rounding boundary where engines disagree)
        (sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1))).as("avg_price"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(stddev_samp(col("l_discount")), 6).as("sd_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** HyperLogLog approximate distinct — sketch-based, constant memory per
    * group at any scale. Spark's HLL++ values differ from DuckDB's HLL,
    * so the hash-checkable output is the ACCURACY CONTRACT itself: the
    * exact distinct (oracle-reproducible) plus a bounded-relative-error
    * flag for the sketch (rsd 1% → 5% bound is ≥5σ). The sketch and the
    * exact count both compute in one aggregation pass. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("a_o"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("a_p"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(
        col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("a_o") - col("exact_orders")) <=
          col("exact_orders").cast(DoubleType) * 0.05).as("orders_ok"),
        (abs(col("a_p") - col("exact_parts")) <=
          col("exact_parts").cast(DoubleType) * 0.05).as("parts_ok"))
      .orderBy(col("l_returnflag"))

  /** I12 rollup. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** I12 cube. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1))).as("avg_bal"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)

  /** I12 arbitrary GROUPING SETS (the general form rollup/cube are sugar
    * for): two independent single-column sets plus the grand total in one
    * pass — Spark plans a single Expand + aggregate, NOT three scans.
    * Grouping-null cells are labeled via coalesce so the output is plain
    * strings (the source columns are non-null, so no ambiguity). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_gs_orders")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM graft_gs_orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY status, priority""")
  }

  /** I15 MapType battery: build a map row-side (map_from_arrays), then
    * element lookup, key listing, size, and map_concat — all codegen'd
    * column expressions; the judged output is scalar so the driver can
    * hash it (top-level maps are not hashable). The oracle computes the
    * same VALUES directly — it doesn't need maps to check map semantics. */
  def mapOps(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        map_from_arrays(
          array(lit("qty"), lit("tax")),
          array(col("l_quantity"), col("l_tax"))).as("m"))
      .select(col("l_orderkey"), col("l_linenumber"),
        map_concat(col("m"), map(lit("disc"), lit(0.0))).as("m2"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        element_at(col("m2"), "qty").as("qty"),
        element_at(col("m2"), "tax").as("tax"),
        array_join(map_keys(col("m2")), ",").as("keys"),
        size(col("m2")).as("n_keys"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** I7 EXCEPT ALL: multiset difference (each duplicate survives as many
    * times as left-count minus right-count) — the bag semantics DISTINCT
    * except erases. */
  def exceptAll(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderpriority").as("priority"))
      .exceptAll(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderpriority").as("priority")))
      .groupBy(col("priority")).agg(count(lit(1)).as("n"))
      .orderBy(col("priority"))

  /** Re-aggregatable sketch rollup: per-status HLL sketches of distinct
    * customers are UNIONED into the global sketch — one pass serves every
    * granularity, the pattern that replaces per-granularity COUNT
    * DISTINCT scans at 100 TB (sketches are tiny, mergeable, and
    * register-max union is order-independent, so the estimate is
    * deterministic at any parallelism). The judged fact is the sketch
    * CONTRACT (same treatment as q_approx_percentile): every level's
    * estimate lands within 5% of exact, which the oracle states as
    * literal booleans next to the exact counts. */
  def hllRollup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val per = o.groupBy(col("o_orderstatus"))
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"),
        countDistinct(col("o_custkey")).as("exact_custs"))
    val perOut = per.select(col("o_orderstatus"), col("exact_custs"),
      (abs(expr("hll_sketch_estimate(sk)") - col("exact_custs")) <=
        col("exact_custs") * 0.05).as("within_5pct"))
    // the rollup: union the per-group sketches, never rescan the data
    val globalApprox = per.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx"))
    val globalExact = o.agg(countDistinct(col("o_custkey")).as("exact_custs"))
    val globalOut = globalExact.crossJoin(globalApprox)
      .select(lit("ALL").as("o_orderstatus"), col("exact_custs"),
        (abs(col("approx") - col("exact_custs")) <=
          col("exact_custs") * 0.05).as("within_5pct"))
    perOut.unionByName(globalOut).orderBy(col("o_orderstatus"))
  }

  /** Equi-depth decile profile per group: ntile(10) over a TOTALLY
    * ordered key (price + unique row key — ties broken identically in
    * both engines), then per-bucket count/min/max/exact-decimal sum.
    * The window partitions by return flag, so it parallelizes by key; a
    * GLOBAL equi-depth profile at 100 TB would instead take
    * approx_percentile boundaries (one pass) and range-join rows to
    * buckets — or, for EXACT deciles at scale, the sharded two-level
    * prefix-rank pattern winsorize/sampleSystematic now IMPLEMENT
    * (shard on the sort key, offsets over a metadata-sized table,
    * ntile re-derived from the global rank). This query keeps the
    * plain per-group shape both build on. */
  def quantileBuckets(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("l_returnflag"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("tot"))
      .orderBy(col("l_returnflag"), col("decile"))
  }

  /** F-family: exact interpolated percentiles (Spark `percentile` ==
    * DuckDB `quantile_cont`, both linear interpolation on sorted data —
    * an exact, order-independent aggregate). */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.75)").as("p75"))
      .orderBy(col("l_returnflag"))

  /** Pivot: status columns per priority (fixed pivot values keep the
    * output schema static — at scale an unbounded pivot would need a
    * values-discovery pass first). Missing combos coalesce to 0 to match
    * SQL's FILTER semantics. */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy(col("o_orderpriority"))

  /** Array aggregation: sorted collect_set, joined to a scalar string —
    * the driver's comparer sorts pandas frames, and top-level numpy
    * arrays are unhashable there, so array outputs must be serialized. */
  def collectAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_prio"))
      .orderBy(col("o_orderstatus"))

  /** Correlated scalar subquery (SQL surface): customers above their
    * nation's average balance — Catalyst decorrelates into an aggregate
    * + join; written as SQL to exercise exactly that rewrite. */
  def subqueryScalar(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    s.sql(
      """SELECT c.c_custkey, c.c_acctbal FROM graft_customer c
         WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM graft_customer c2
                              WHERE c2.c_nationkey = c.c_nationkey)
         ORDER BY c.c_custkey""")
  }

  /** EXISTS / NOT EXISTS correlated subqueries (SQL surface): orders
    * with at least one returned line and no deeply-discounted line.
    * Catalyst's RewritePredicateSubquery turns the pair into one
    * LEFT SEMI plus one LEFT ANTI join on l_orderkey — each a single
    * hash-partitioned pass over lineitem, no per-row re-execution (the
    * naive nested-loop reading of EXISTS would be O(|orders|·|lineitem|)
    * at 100 TB). The DataFrame semi/anti duals are judged separately
    * (q_join_semi / q_join_anti / q_tpch_q4); this entry pins the SQL
    * decorrelation path itself. */
  def subqueryExists(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_sq_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_sq_lineitem")
    s.sql(
      """SELECT o.o_orderpriority, count(*) AS n_orders
         FROM graft_sq_orders o
         WHERE EXISTS (SELECT 1 FROM graft_sq_lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
           AND NOT EXISTS (SELECT 1 FROM graft_sq_lineitem l2
                           WHERE l2.l_orderkey = o.o_orderkey AND l2.l_discount > 0.09)
         GROUP BY o.o_orderpriority
         ORDER BY o.o_orderpriority""")
  }

  /** Sketch family: approximate percentiles (GK sketch — bounded memory
    * per group at any scale, like HLL for distincts). The sketch value
    * differs from DuckDB's algorithm, so the hash-checked output is the
    * GK rank-error CONTRACT: accuracy=1000 guarantees rank error ≤ n/1000,
    * so the approx value must lie inside the exact [q(.49), q(.51)] /
    * [q(.94), q(.96)] windows (quantile function is monotone). Sketch and
    * exact percentiles compute in the same aggregation pass. */
  def approxPercentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
        expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("ap95"),
        expr("percentile(l_extendedprice, 0.49)").as("lo50"),
        expr("percentile(l_extendedprice, 0.51)").as("hi50"),
        expr("percentile(l_extendedprice, 0.94)").as("lo95"),
        expr("percentile(l_extendedprice, 0.96)").as("hi95"))
      .select(
        col("l_returnflag"),
        (col("ap50") >= col("lo50") && col("ap50") <= col("hi50")).as("p50_ok"),
        (col("ap95") >= col("lo95") && col("ap95") <= col("hi95")).as("p95_ok"))
      .orderBy(col("l_returnflag"))

  /** TPC-H Q1 (pricing summary report): THE scan-heavy aggregation
    * benchmark — one pass, partial aggregation map-side, 4 exact decimal
    * sums + 3 averages + count per (returnflag, linestatus). Decimal
    * internally (order-independent at any parallelism), DOUBLE in the
    * final projection for the driver's dtype hash. */
  def tpchQ1(s: SparkSession, d: String): DataFrame = {
    val dec2 = DecimalType(18, 2)
    val dec6 = DecimalType(18, 6)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec2)).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(dec2)).cast(DoubleType).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec6))
          .cast(DoubleType).as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).cast(dec6)).cast(DoubleType).as("sum_charge"),
        (sum(col("l_quantity").cast(dec2)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(dec2)).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(col("l_discount").cast(dec6)).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6 shape (forecast revenue change): pure scan+filter+agg —
    * every predicate pushes into the parquet reader, the aggregate is a
    * single partial+final pass. */
  def tpchQ6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"))

  /** Data-quality EXPECTATIONS (dbt-test / Deequ-style validation): each
    * rule is a conditional count over ONE shared scan (a single
    * aggregate pass computes every violation tally — no per-rule scans),
    * unpivoted to (rule, violations, pass) verdict rows. The rule set
    * covers the standard families: not-null, accepted-values, range, and
    * uniqueness (distinct vs total on the key). */
  def expectations(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val agg = o.agg(
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("r1"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("r2"),
      sum(when(col("o_totalprice") <= 0.0 || col("o_totalprice").isNull, 1L).otherwise(0L)).as("r3"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("r4"))
    agg.select(expr(
      """stack(4,
           'orderkey_not_null', r1,
           'status_accepted_values', r2,
           'totalprice_positive', r3,
           'orderkey_unique', r4) AS (rule, violations)"""))
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("rule"))
  }

  /** NULL-AWARE anti join: NOT IN over a subquery column the planner
    * cannot prove non-null — Spark must plan the null-aware variant of
    * the anti join (a naive anti join has different three-valued-logic
    * semantics the moment a NULL appears). The data here has no NULL
    * custkeys, so the result is the real "customers without P orders"
    * set; the one-NULL-empties-everything trap itself is asserted in
    * PlanSpec with an injected NULL. */
  def notInNulls(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_nin_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_nin_orders")
    s.sql(
      """SELECT c_custkey, c_name FROM graft_nin_customer
         WHERE c_custkey NOT IN (
           SELECT o_custkey FROM graft_nin_orders
           WHERE o_orderstatus = 'P')
         ORDER BY c_custkey""")
  }

  /** Table PROFILING (ANALYZE-style column summary): one aggregate pass
    * computes per-column null counts, distinct counts, and numeric
    * min/max; stack() unpivots to one row per column. The distinct
    * counts are exact here (they feed a correctness gate); swap in
    * approx_count_distinct for the 100 TB profile-only path. */
  def profile(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn_ck"),
      countDistinct(col("o_custkey")).as("nd_ck"),
      min(col("o_custkey")).cast(DoubleType).as("mn_ck"),
      max(col("o_custkey")).cast(DoubleType).as("mx_ck"),
      sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("nn_tp"),
      countDistinct(col("o_totalprice")).as("nd_tp"),
      min(col("o_totalprice")).as("mn_tp"),
      max(col("o_totalprice")).as("mx_tp"),
      sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("nn_st"),
      countDistinct(col("o_orderstatus")).as("nd_st"))
    .select(col("n"), expr(
      """stack(3,
           'o_custkey',    nn_ck, nd_ck, mn_ck, mx_ck,
           'o_totalprice', nn_tp, nd_tp, mn_tp, mx_tp,
           'o_orderstatus', nn_st, nd_st, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
         AS (column_name, n_nulls, n_distinct, min_val, max_val)"""))
    .select(col("column_name"), col("n"), col("n_nulls"), col("n_distinct"),
      col("min_val"), col("max_val"))
    .orderBy(col("column_name"))
  }

  /** LATERAL correlated subquery with per-group ORDER BY + LIMIT — the
    * SQL form of top-k-per-group (the window formulation is
    * q_window_rank; this exercises Catalyst's lateral-join
    * decorrelation). Unique tie-break (custkey) makes the top-2
    * deterministic. */
  def lateralTopK(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("graft_lat_nation")
    Tables.customer(s, d).createOrReplaceTempView("graft_lat_customer")
    s.sql(
      """SELECT n_name, t.c_custkey, t.c_acctbal
         FROM graft_lat_nation,
         LATERAL (SELECT c_custkey, c_acctbal FROM graft_lat_customer
                  WHERE c_nationkey = n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
         ORDER BY n_name, t.c_acctbal DESC, t.c_custkey""")
  }

  /** Safe-cast (try_cast) battery — the ingest-hardening idiom: malformed
    * values become NULL instead of failing the job (ANSI mode) or
    * silently corrupting (legacy CAST). Mixed valid/invalid inputs prove
    * both directions; semantics are identical to DuckDB's TRY_CAST. */
  def tryCasts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_int"),
        expr("try_cast(o_orderstatus AS DOUBLE)").as("bad_double"),
        // surfaced as STRING: an all-NULL DATE column hashes as NaT
        // (datetime64) from DuckDB but None (object) from parquet
        expr("cast(try_cast(o_orderpriority AS DATE) AS STRING)").as("bad_date"),
        expr("try_cast(concat('200', substring(o_orderpriority, 1, 1)) AS BIGINT)").as("year_num"))
      .orderBy(col("o_orderkey"))

  /** Fixed-width histogram over lineitem prices: bucket = floor(x / w)*w
    * (identical double math in both engines — width_bucket() isn't
    * portable), counts + per-bucket sums. One map-side-combined shuffle;
    * the distribution-profiling primitive behind data validation and
    * skew diagnosis at scale. */
  def histogram(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select((floor(col("l_extendedprice") / 5000.0) * 5000).cast(LongType).as("bucket_lo"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket_lo"))

  /** Bitwise scalar battery (I13 family): and/or/xor/shifts/not over
    * order keys — flag-word manipulation and hash mixing are everyday
    * bit work in pipelines; all codegen'd built-ins, exact in both
    * engines (two's-complement BIGINT). */
  def scalarBitwise(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(lit(255L))).as("low_byte"),
        (col("o_orderkey").bitwiseOR(lit(4096L))).as("with_flag"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("mixed"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        bitwise_not(col("o_orderkey")).as("inverted"),
        // Spark bit_count → INT, DuckDB → TINYINT: pin both to INT
        bit_count(col("o_orderkey")).cast(IntegerType).as("popcount"))
      .orderBy(col("o_orderkey"))

  /** Linear-regression aggregate family (regr_slope/intercept/r2/corr/
    * covar): y = l_extendedprice over x = l_quantity per return flag.
    * Spark HAS regr_* built-ins, but their double accumulation order is
    * partition-dependent — not reproducible against another engine. We
    * compute the same statistics from EXACT decimal component sums
    * (Sx, Sy, Sxx, Syy, Sxy) via the closed form, so the result is
    * order-independent and bit-identical to the oracle at any
    * parallelism: one map-side-combined aggregation, O(groups) state. */
  def regrAgg(s: SparkSession, d: String): DataFrame = {
    val sums = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_pts"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sx"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sy"),
        sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(28, 4)))
          .cast(DoubleType).as("sxx"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast(DecimalType(28, 4)))
          .cast(DoubleType).as("syy"),
        sum((col("l_quantity") * col("l_extendedprice")).cast(DecimalType(28, 4)))
          .cast(DoubleType).as("sxy"))
    val n     = col("n_pts").cast(DoubleType)
    val covN  = col("sxy") * n - col("sx") * col("sy")
    val varXn = col("sxx") * n - col("sx") * col("sx")
    val varYn = col("syy") * n - col("sy") * col("sy")
    sums.select(
      col("l_returnflag"),
      col("n_pts"),
      (covN / varXn).as("slope"),
      ((col("sy") - (covN / varXn) * col("sx")) / n).as("intercept"),
      (covN / sqrt(varXn * varYn)).as("corr_xy"),
      ((covN * covN) / (varXn * varYn)).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Edit-distance battery (levenshtein): fuzzy matching / near-dup
    * detection on short strings. Codegen'd built-in in both engines with
    * the same unit-cost dynamic program — exact integers. O(len²) per
    * row, embarrassingly parallel, no shuffle before the final sort. */
  def editDistance(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        levenshtein(col("p_name"), col("p_type")).as("name_type_dist"),
        levenshtein(col("p_brand"), lit("Brand#13")).as("brand_dist"),
        (levenshtein(col("p_name"), col("p_brand")) <= lit(8)).as("near_brand"))
      .orderBy(col("p_partkey"))

  /** I13 calendar battery #2: quarter / ISO week / day-of-week /
    * day-of-year / last_day / add_months — the partition-key and
    * reporting-bucket derivations pipelines lean on. dayofweek is
    * normalized to DuckDB's Sunday=0 convention; DATE-valued results
    * surface as TIMESTAMP (driver dtype rule). */
  def dateParts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).as("qtr"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        last_day(col("o_orderdate").cast(DateType)).cast(TimestampType).as("month_end"),
        add_months(col("o_orderdate").cast(DateType), 1).cast(TimestampType).as("next_month"))
      .orderBy(col("o_orderkey"))

  /** F-family argmin/argmax + boolean aggregates: max_by/min_by (arg
    * keys UNIQUE — ties would be engine-arbitrary), every/any, count_if.
    * One map-side-combined shuffle. */
  def argMinMax(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        max_by(col("o_orderstatus"), col("o_orderkey")).as("latest_status"),
        min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
        max_by(col("o_custkey"), col("o_orderkey")).as("latest_cust"),
        every(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_orderstatus") === "P").as("has_pending"),
        count_if(col("o_orderstatus") === "O").as("n_open"))
      .orderBy(col("o_orderpriority"))

  /** Skew diagnosis: the distribution of per-key group sizes — the
    * first thing to measure before choosing join/agg strategies at
    * scale (salting, AQE skew thresholds, broadcast cutoffs all key off
    * these numbers). Two-level aggregation: per-key counts (map-side
    * combined), then O(1)-state stats over the counts; heavy-key
    * thresholds as exact count_if. */
  def skewDiag(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        min(col("n")).as("min_rows"),
        max(col("n")).as("max_rows"),
        (sum(col("n")).cast(DoubleType) / count(lit(1))).as("avg_rows"),
        count_if(col("n") >= 5).as("keys_ge5"),
        count_if(col("n") >= 7).as("keys_ge7"))

  /** 2-D SKYLINE (Pareto frontier): parts where no other part is both
    * cheaper-or-equal and larger-or-equal with one strict — the
    * multi-criteria shortlist operator (Börzsönyi et al., ICDE 2001).
    *
    * Spark-first shape instead of the textbook quadratic dominance
    * anti-join: (1) per-price max size (one hash aggregate — the only
    * possible skyline member at its price), (2) a DISTRIBUTED PREFIX-MAX
    * over price order — range-partition, per-partition running max
    * window, then the exclusive cross-partition prefix from a
    * partition-count-sized broadcast — and (3) keep exactly the rows
    * that rise above every strictly-cheaper point. No single global
    * window over the data (the usual skyline scale-killer); the only
    * single-partition step is over ONE ROW PER RANGE PARTITION. The
    * oracle is the quadratic NOT EXISTS dominance definition, so the
    * hash check cross-validates the decomposition against the
    * definition itself. */
  private[graft] def skylineOf(pts: DataFrame): DataFrame = {
    val gmax = pts.groupBy(col("price")).agg(max(col("sz")).as("gmax"))
    val parts = gmax.repartitionByRange(8, col("price"))
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("price"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val local = parts.withColumn("lmax", max(col("gmax")).over(wLoc))
    val wPfx = org.apache.spark.sql.expressions.Window
      .orderBy(col("pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prefix = parts.groupBy(col("pid")).agg(max(col("gmax")).as("pmax"))
      .withColumn("pfx", max(col("pmax")).over(wPfx))
    val keep = local
      .join(broadcast(prefix.select(col("pid"), col("pfx"))), Seq("pid"))
      .withColumn("prevmax",
        greatest(coalesce(col("lmax"), lit(Int.MinValue)),
          coalesce(col("pfx"), lit(Int.MinValue))))
      .filter(col("gmax") > col("prevmax"))
      .select(col("price"), col("gmax").as("sz"))
    pts.join(keep, Seq("price", "sz"))
  }

  /** DETERMINISTIC POISSON BOOTSTRAP: a 95% CI for the mean order value
    * from R=64 resampling replicas — the scale-out bootstrap (Poisson
    * counts approximate multinomial resampling without coordinating a
    * global n, the standard streaming/bootstrap trick) made
    * REPRODUCIBLE: each row's per-replica weight comes from an md5
    * counter hash mapped through the literal Poisson(1) inverse CDF, so
    * both engines draw byte-identical "randomness". Replica means are
    * exact DECIMAL sums ÷ exact counts (one IEEE division each); the CI
    * picks rank 2 / rank 63 of the 64 means (order total on (mean, r)).
    * Scale shape: one corpus scan fanned ×R row-side, map-side-combined
    * into R partials — the only windows run over exactly R rows. */
  def bootstrapCi(s: SparkSession, d: String): DataFrame = {
    val R = 64
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    // one md5 per (row, 8-replica block): the 32 hex chars carve into
    // eight independent 16-bit draws (u granularity 1/65536 — far finer
    // than the CDF gaps), so the digest count is n·R/8, not n·R —
    // measured 6.9 s → 2.6 s at sf0.1
    val u = conv(col("h").substr(lit(1) + lit(4) * col("j"), lit(4)),
      16, 10).cast("long").cast(DoubleType) / lit(65536.0)
    // cumulative Poisson(1) CDF as exact double literals
    val w = when(u < 0.3678794411714423, 0)
      .when(u < 0.7357588823428846, 1)
      .when(u < 0.9196986029286058, 2)
      .when(u < 0.9810118431238462, 3)
      .when(u < 0.9963401531726563, 4)
      .when(u < 0.9994058151824183, 5)
      .when(u < 0.9999167589384503, 6)
      .otherwise(7)
    // money as exact LONG cents: the decimal(18,2)·int product would
    // leave Spark's compact-long decimal representation (precision 28 →
    // per-row BigDecimal allocation — measured 10.9 s at sf0.1); integer
    // cents keep the whole weighted sum in primitive codegen (1.9 s)
    val means = o
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").multiply(lit(100))
          .cast("long").as("cents"))
      // the source is a one-split parquet — without this the whole ×R
      // fan-out pipelines on a single core (the jaccardPrefix lesson)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("o_orderkey"), col("cents"), // cents BELOW the explodes: 1 decimal op per row, not per replica
        explode(sequence(lit(0), lit(R / 8 - 1))).as("blk"))
      .withColumn("h", md5(concat(
        col("o_orderkey").cast("string"), lit(":"), col("blk").cast("string"))))
      .select(col("cents"), col("blk"), col("h"),
        explode(sequence(lit(0), lit(7))).as("j"))
      .withColumn("r", col("blk") * 8 + col("j"))
      .withColumn("w", w)
      .groupBy(col("r"))
      .agg((sum(col("cents") * col("w")).cast(DoubleType) /
        (sum(col("w")) * lit(100L)).cast(DoubleType)).as("mean_r"))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_r"), col("r"))
    val ranked = means.withColumn("rn", row_number().over(wRank))
    val full = o.agg(
      count(lit(1)).as("n_rows"),
      (sum(col("o_totalprice").cast("decimal(18,2)").multiply(lit(100))
        .cast("long")).cast(DoubleType) /
        (count(lit(1)) * lit(100L)).cast(DoubleType)).as("mean_full"))
    full
      .crossJoin(broadcast(ranked.filter(col("rn") === 2)
        .select(col("mean_r").as("ci_lo"))))
      .crossJoin(broadcast(ranked.filter(col("rn") === R - 1)
        .select(col("mean_r").as("ci_hi"))))
      .select(col("n_rows"), col("mean_full"), col("ci_lo"), col("ci_hi"),
        (col("ci_lo") <= col("mean_full") && col("mean_full") <= col("ci_hi"))
          .as("mean_inside"))
  }

  /** WINSORIZATION (robust clipping): per order-priority, clip
    * o_totalprice into its exact rank-based [p05, p95] band and report
    * the clipped vs raw DECIMAL sums — the outlier-taming pass run
    * before any mean-based metric on heavy-tailed data. Bound ranks are
    * EXACT integers (lo = ⌈n/20⌉, hi = ⌈19n/20⌉ via integer div — no
    * 0.05·n float), the rank order is total (price, orderkey tiebreak),
    * and bound VALUES come from conditional aggregates at those ranks,
    * so both engines pick identical bounds; sums are exact
    * DECIMAL(18,2). Per-group windows parallelize across groups; the
    * two shuffles are the rank window and the final aggregate, with the
    * 5-row bounds table broadcast back for the clip pass.
    *
    * 100× scale shape (VERDICT r8 #2, closed): ranks come from the
    * TWO-LEVEL SHARDED PREFIX COUNT (the sampleSystematic pattern,
    * sharded on the SORT KEY): shard = ⌊64·price/(max+1)⌋ gives
    * contiguous price bands (equal prices share a shard, so global
    * ranks are exact), per-(group, shard) counts roll into rank offsets
    * over a metadata-sized table, and the heavy row_number window
    * partitions by (group, shard) — the biggest single task is one
    * price band of one group instead of N/5 rows. Exact rank bounds
    * survive because sharding is pure parallelism, zero semantics. */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val mx = base.agg(max(col("o_totalprice")).as("mxp"))
    val sharded = base.crossJoin(broadcast(mx))
      .withColumn("shard",
        floor(col("o_totalprice") * 64.0 / (col("mxp") + 1.0)).cast("long"))
      .drop("mxp")
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("o_orderpriority"), col("shard"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("offc", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("o_orderpriority"), col("shard"), col("offc"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"), col("shard"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val nrows = base.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val ranked = sharded
      .join(broadcast(offsets), Seq("o_orderpriority", "shard"))
      .join(broadcast(nrows), Seq("o_orderpriority"))
      .withColumn("rn", col("offc") + row_number().over(wIn).cast("long"))
    val bounds = ranked
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("n")).as("n_rows"),
        max(when(col("rn") === expr("(n + 19) div 20"), col("o_totalprice"))).as("lo"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("o_totalprice"))).as("hi"))
    Tables.orders(s, d)
      .join(broadcast(bounds), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("n_rows")).as("n_rows"),
        max(col("lo")).as("p05"),
        max(col("hi")).as("p95"),
        // exact DECIMAL quantize, surfaced as DOUBLE (the established
        // cross-engine idiom — the driver hashes dtypes)
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast(DoubleType).as("raw_sum"),
        sum(least(greatest(col("o_totalprice"), col("lo")), col("hi"))
          .cast("decimal(18,2)")).cast(DoubleType).as("clipped_sum"))
      .orderBy(col("o_orderpriority"))
  }

  def skyline(s: SparkSession, d: String): DataFrame =
    skylineOf(Tables.part(s, d).select(
        col("p_partkey").as("id"),
        col("p_retailprice").as("price"), col("p_size").as("sz")))
      .select(col("id").as("p_partkey"),
        col("price").as("p_retailprice"), col("sz").as("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline"            -> skyline,
    "q_winsorize"          -> winsorize,
    "q_bootstrap_ci"       -> bootstrapCi,
    "q_skew_diag"          -> skewDiag,
    "q_date_parts"         -> dateParts,
    "q_arg_minmax"         -> argMinMax,
    "q_regr_agg"           -> regrAgg,
    "q_edit_distance"      -> editDistance,
    "q_scalar_bitwise"     -> scalarBitwise,
    "q_histogram"          -> histogram,
    "q_try_cast"           -> tryCasts,
    "q_expectations"       -> expectations,
    "q_not_in_nulls"       -> notInNulls,
    "q_profile"            -> profile,
    "q_lateral_topk"       -> lateralTopK,
    "q_tpch_q1"            -> tpchQ1,
    "q_tpch_q6"            -> tpchQ6,
    "q_approx_percentile"  -> approxPercentiles,
    "q_pivot"              -> pivotStatus,
    "q_collect_agg"        -> collectAgg,
    "q_subquery_scalar"    -> subqueryScalar,
    "q_subquery_exists"    -> subqueryExists,
    "q_hll_rollup"         -> hllRollup,
    "q_quantile_buckets"   -> quantileBuckets,
    "q_orc_scan"           -> orcScan,
    "q_json_scan"          -> jsonScan,
    "q_percentiles"        -> percentiles,
    "q_orders_by_status"   -> ordersByStatus,
    "q_filter_project"     -> filterProject,
    "q_cast_types"         -> castTypes,
    "q_top_orders"         -> topOrders,
    "q_csv_scan"           -> csvScan,
    "q_scalar_string"      -> scalarString,
    "q_scalar_string2"     -> scalarString2,
    "q_scalar_date"        -> scalarDate,
    "q_scalar_math"        -> scalarMath,
    "q_scalar_conditional" -> scalarConditional,
    "q_agg_stats"          -> aggStats,
    "q_approx_distinct"    -> approxDistinct,
    "q_rollup"             -> rollupAgg,
    "q_cube"               -> cubeAgg,
    "q_grouping_sets"      -> groupingSets,
    "q_except_all"         -> exceptAll,
    "q_map_ops"            -> mapOps)

  val oracle: Map[String, String] = Map(
    "q_skyline" ->
      """SELECT a.p_partkey, a.p_retailprice, a.p_size
         FROM part a
         WHERE NOT EXISTS (
           SELECT 1 FROM part b
           WHERE b.p_retailprice <= a.p_retailprice
             AND b.p_size >= a.p_size
             AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
         ORDER BY a.p_retailprice, a.p_partkey""",
    "q_bootstrap_ci" ->
      """WITH rep AS (
           SELECT o_orderkey, o_totalprice, g.blk * 8 + s.j AS r,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
               || CAST(g.blk AS VARCHAR)), 1 + 4 * s.j, 4)) AS BIGINT)
               / 65536.0 AS u
           FROM orders CROSS JOIN range(8) g(blk) CROSS JOIN range(8) s(j)),
         wtd AS (
           SELECT r,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN u < 0.3678794411714423 THEN 0
                  WHEN u < 0.7357588823428846 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  WHEN u < 0.9994058151824183 THEN 5
                  WHEN u < 0.9999167589384503 THEN 6
                  ELSE 7 END AS w
           FROM rep),
         means AS (
           SELECT r,
             CAST(sum(cents * w) AS DOUBLE)
               / CAST(sum(w) * 100 AS DOUBLE) AS mean_r
           FROM wtd GROUP BY 1),
         ranked AS (
           SELECT mean_r, row_number() OVER (ORDER BY mean_r, r) AS rn
           FROM means),
         overall AS (
           SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE) AS mean_full
           FROM orders)
         SELECT f.n_rows, f.mean_full, lo.mean_r AS ci_lo, hi.mean_r AS ci_hi,
           (lo.mean_r <= f.mean_full AND f.mean_full <= hi.mean_r) AS mean_inside
         FROM overall f
         CROSS JOIN (SELECT mean_r FROM ranked WHERE rn = 2) lo
         CROSS JOIN (SELECT mean_r FROM ranked WHERE rn = 63) hi""",
    "q_winsorize" ->
      """WITH ranked AS (
           SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders),
         bounds AS (
           SELECT o_orderpriority,
             CAST(max(n) AS BIGINT) AS n_rows,
             max(CASE WHEN rn = (n + 19) // 20 THEN o_totalprice END) AS lo,
             max(CASE WHEN rn = (19 * n + 19) // 20 THEN o_totalprice END) AS hi
           FROM ranked GROUP BY 1)
         SELECT o.o_orderpriority, b.n_rows, b.lo AS p05, b.hi AS p95,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS raw_sum,
           CAST(sum(CAST(least(greatest(o.o_totalprice, b.lo), b.hi)
             AS DECIMAL(18,2))) AS DOUBLE) AS clipped_sum
         FROM orders o JOIN bounds b USING (o_orderpriority)
         GROUP BY 1, 2, 3, 4 ORDER BY 1""",
    "q_skew_diag" ->
      """WITH per AS (
           SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1)
         SELECT count(*) AS n_keys,
           min(n) AS min_rows, max(n) AS max_rows,
           CAST(sum(n) AS DOUBLE) / count(*) AS avg_rows,
           CAST(count_if(n >= 5) AS BIGINT) AS keys_ge5,
           CAST(count_if(n >= 7) AS BIGINT) AS keys_ge7
         FROM per""",
    "q_date_parts" ->
      """SELECT o_orderkey,
         CAST(quarter(o_orderdate) AS INT) AS qtr,
         CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
         CAST(dayofweek(o_orderdate) AS INT) AS dow,
         CAST(dayofyear(o_orderdate) AS INT) AS doy,
         CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
         CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS next_month
         FROM orders ORDER BY o_orderkey""",
    "q_arg_minmax" ->
      """SELECT o_orderpriority,
         max_by(o_orderstatus, o_orderkey) AS latest_status,
         min_by(o_orderstatus, o_orderkey) AS first_status,
         max_by(o_custkey, o_orderkey) AS latest_cust,
         bool_and(o_totalprice > 0) AS all_positive,
         bool_or(o_orderstatus = 'P') AS has_pending,
         CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_regr_agg" ->
      """WITH sums AS (
           SELECT l_returnflag,
             count(*) AS n_pts,
             -- decimal→VARCHAR→DOUBLE, not decimal→DOUBLE: DuckDB's
             -- direct cast double-rounds (unscaled int → double, then
             -- ÷10^scale), which is 1 ulp off Java's single-rounded
             -- BigDecimal.doubleValue once the unscaled value passes
             -- 2^53 (syy ≈ 7·10^16 at sf0.001 — measured divergence);
             -- the string path is correctly rounded in both engines
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n_pts,
           (sxy * CAST(n_pts AS DOUBLE) - sx * sy)
             / (sxx * CAST(n_pts AS DOUBLE) - sx * sx) AS slope,
           (sy - ((sxy * CAST(n_pts AS DOUBLE) - sx * sy)
                    / (sxx * CAST(n_pts AS DOUBLE) - sx * sx)) * sx)
             / CAST(n_pts AS DOUBLE) AS intercept,
           (sxy * CAST(n_pts AS DOUBLE) - sx * sy)
             / sqrt((sxx * CAST(n_pts AS DOUBLE) - sx * sx)
                    * (syy * CAST(n_pts AS DOUBLE) - sy * sy)) AS corr_xy,
           ((sxy * CAST(n_pts AS DOUBLE) - sx * sy)
              * (sxy * CAST(n_pts AS DOUBLE) - sx * sy))
             / ((sxx * CAST(n_pts AS DOUBLE) - sx * sx)
                * (syy * CAST(n_pts AS DOUBLE) - sy * sy)) AS r2
         FROM sums ORDER BY l_returnflag""",
    "q_edit_distance" ->
      """SELECT p_partkey,
         CAST(levenshtein(p_name, p_type) AS INT) AS name_type_dist,
         CAST(levenshtein(p_brand, 'Brand#13') AS INT) AS brand_dist,
         levenshtein(p_name, p_brand) <= 8 AS near_brand
         FROM part ORDER BY p_partkey""",
    "q_scalar_bitwise" ->
      """SELECT o_orderkey,
         o_orderkey & 255 AS low_byte,
         o_orderkey | 4096 AS with_flag,
         xor(o_orderkey, o_custkey) AS mixed,
         o_orderkey << 3 AS shl3,
         o_orderkey >> 2 AS shr2,
         ~o_orderkey AS inverted,
         CAST(bit_count(o_orderkey) AS INT) AS popcount
         FROM orders ORDER BY o_orderkey""",
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) * 5000 AS BIGINT) AS bucket_lo,
         count(*) AS n
         FROM lineitem GROUP BY bucket_lo ORDER BY bucket_lo""",
    "q_try_cast" ->
      """SELECT o_orderkey,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
           TRY_CAST(o_orderpriority AS INT) AS bad_int,
           TRY_CAST(o_orderstatus AS DOUBLE) AS bad_double,
           CAST(TRY_CAST(o_orderpriority AS DATE) AS VARCHAR) AS bad_date,
           TRY_CAST('200' || substring(o_orderpriority, 1, 1) AS BIGINT) AS year_num
         FROM orders ORDER BY o_orderkey""",
    "q_expectations" ->
      """WITH agg AS (
           SELECT
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r1,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS r2,
             CAST(sum(CASE WHEN o_totalprice <= 0.0 OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r3,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS r4
           FROM orders)
         SELECT rule, violations, violations = 0 AS pass FROM (
           SELECT 'orderkey_not_null' AS rule, r1 AS violations FROM agg
           UNION ALL SELECT 'status_accepted_values', r2 FROM agg
           UNION ALL SELECT 'totalprice_positive', r3 FROM agg
           UNION ALL SELECT 'orderkey_unique', r4 FROM agg)
         ORDER BY rule""",
    "q_not_in_nulls" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
         ORDER BY c_custkey""",
    "q_profile" ->
      """WITH agg AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ck,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_ck,
             CAST(min(o_custkey) AS DOUBLE) AS mn_ck, CAST(max(o_custkey) AS DOUBLE) AS mx_ck,
             CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_tp,
             CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd_tp,
             min(o_totalprice) AS mn_tp, max(o_totalprice) AS mx_tp,
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_st,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_st
           FROM orders)
         SELECT column_name, n, n_nulls, n_distinct, min_val, max_val FROM (
           SELECT 'o_custkey' AS column_name, n, nn_ck AS n_nulls, nd_ck AS n_distinct,
                  mn_ck AS min_val, mx_ck AS max_val FROM agg
           UNION ALL SELECT 'o_totalprice', n, nn_tp, nd_tp, mn_tp, mx_tp FROM agg
           UNION ALL SELECT 'o_orderstatus', n, nn_st, nd_st, NULL, NULL FROM agg)
         ORDER BY column_name""",
    "q_lateral_topk" ->
      """SELECT n_name, t.c_custkey, t.c_acctbal
         FROM nation,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_nationkey = n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
         ORDER BY n_name, t.c_acctbal DESC, t.c_custkey""",
    // The sketch values themselves are algorithm-specific; the oracle
    // checks the part that IS exact-reproducible (the exact aggregates)
    // plus the sketch's published error contract as booleans.
    "q_approx_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS exact_orders,
         count(DISTINCT l_partkey) AS exact_parts,
         TRUE AS orders_ok, TRUE AS parts_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_approx_percentile" ->
      """SELECT l_returnflag, TRUE AS p50_ok, TRUE AS p95_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "q_pivot" ->
      """SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS P
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_collect_agg" ->
      """SELECT o_orderstatus,
         array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
         count(DISTINCT o_orderpriority) AS n_prio
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_subquery_scalar" ->
      """SELECT c.c_custkey, c.c_acctbal FROM customer c
         WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                              WHERE c2.c_nationkey = c.c_nationkey)
         ORDER BY c.c_custkey""",
    "q_hll_rollup" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS exact_custs,
           TRUE AS within_5pct
         FROM orders GROUP BY o_orderstatus
         UNION ALL
         SELECT 'ALL', count(DISTINCT o_custkey), TRUE FROM orders
         ORDER BY o_orderstatus""",
    "q_quantile_buckets" ->
      """WITH b AS (
           SELECT l_returnflag, l_extendedprice,
             ntile(10) OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS decile
           FROM lineitem)
         SELECT l_returnflag, CAST(decile AS INT) AS decile, count(*) AS n,
           min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_subquery_exists" ->
      """SELECT o.o_orderpriority, count(*) AS n_orders
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
           AND NOT EXISTS (SELECT 1 FROM lineitem l2
                           WHERE l2.l_orderkey = o.o_orderkey AND l2.l_discount > 0.09)
         GROUP BY o.o_orderpriority
         ORDER BY o.o_orderpriority""",
    "q_orc_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority FROM orders ORDER BY o_orderkey""",
    "q_json_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority FROM orders ORDER BY o_orderkey""",
    "q_percentiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.25) AS p25,
         quantile_cont(l_extendedprice, 0.5) AS p50,
         quantile_cont(l_extendedprice, 0.75) AS p75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_orders_by_status" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_filter_project" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_mktsegment = 'FURNITURE' ORDER BY c_custkey""",
    "q_cast_types" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS INT) AS qty_int,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
         CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date,
         CAST(l_orderkey AS VARCHAR) AS okey_str
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""",
    "q_csv_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority FROM orders ORDER BY o_orderkey""",
    "q_scalar_string" ->
      """SELECT c_custkey, upper(c_name) AS uname,
         substring(c_name, 10, 9) AS cnum,
         concat(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
         c_name LIKE '%42%' AS has42,
         regexp_extract(c_name, '[0-9]+') AS digits,
         CAST(length(c_name) AS INT) AS name_len,
         CAST(levenshtein(c_name, 'Customer#000000042') AS INT) AS lev42
         FROM customer ORDER BY c_custkey""",
    "q_scalar_string2" ->
      """SELECT c_custkey,
         lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
         rpad(c_mktsegment, 12, '.') AS seg_pad,
         translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
         reverse(c_mktsegment) AS seg_rev,
         repeat('ab', CAST(c_custkey % 3 + 1 AS INT)) AS reps,
         split_part(c_name, '#', 2) AS name_num,
         CAST(strpos(c_name, '#') AS INT) AS hash_pos,
         left(c_name, 8) AS l8,
         right(c_name, 4) AS r4,
         array_to_string(regexp_extract_all(c_name, '[0-9]+', 0), ',') AS all_digits,
         CAST(len(regexp_extract_all(c_name, '0', 0)) AS INT) AS n_zeros
         FROM customer ORDER BY c_custkey""",
    "q_scalar_date" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INT) AS yr,
         CAST(month(o_orderdate) AS INT) AS mo,
         CAST(day(o_orderdate) AS INT) AS dom,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
         FROM orders ORDER BY o_orderkey""",
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) AS net_price,
         abs(l_discount - 0.05) AS disc_dev,
         CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
         CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor,
         sqrt(l_quantity) AS qty_sqrt,
         greatest(l_tax, l_discount) AS max_rate
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_scalar_conditional" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 300000 THEN 'big'
              WHEN o_totalprice > 150000 THEN 'mid'
              ELSE 'small' END AS bucket,
         coalesce(nullif(o_orderstatus, 'F'), 'FINISHED') AS st
         FROM orders ORDER BY o_orderkey""",
    "q_agg_stats" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
         round(min(l_extendedprice), 2) AS min_price,
         round(max(l_extendedprice), 2) AS max_price,
         count(*) AS n_rows,
         count(DISTINCT l_orderkey) AS n_orders,
         round(stddev_samp(l_discount), 6) AS sd_disc
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_map_ops" ->
      """SELECT l_orderkey, l_linenumber,
         l_quantity AS qty, l_tax AS tax,
         'qty,tax,disc' AS keys, 3 AS n_keys
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY status, priority""",
    "q_except_all" ->
      """WITH diff AS (
           SELECT o_orderpriority AS priority FROM orders
           EXCEPT ALL
           SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F')
         SELECT priority, count(*) AS n FROM diff
         GROUP BY priority ORDER BY priority""",
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_cube" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
         FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
         ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""")
}
