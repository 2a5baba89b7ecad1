package graft

import org.apache.spark.sql.types._

/** Canary against driver-side test-data regeneration changing parquet
  * physical types underneath us (round 5: events.ts flipped ns→us and every
  * events consumer died at analysis time). Reads only parquet footers (cheap)
  * and asserts the dtypes the `Tables` loaders are expected to absorb, plus
  * that the absorbing loaders actually produce the canonical session types.
  * Fails loudly — with the offending column named — on any drift, so a
  * future regeneration breaks ONE spec with a readable message instead of 35
  * suites with an analysis exception.
  */
class SchemaDriftSpec extends SparkTestBase {

  private def rawSchema(name: String) = {
    // the ns-era branch is only observable with nanosAsLong set (without
    // it Spark rejects INT64(TIMESTAMP_NANOS) at footer-read time with
    // its own error) — set it here so this canary is deterministic
    // regardless of which suite touched the shared session first
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet").schema
  }

  test("events.ts physical type is one this repo's loader absorbs") {
    val dt = rawSchema("events")("ts").dataType
    val absorbed = dt match {
      case LongType | TimestampType | TimestampNTZType => true
      case _                                           => false
    }
    assert(absorbed, s"events.ts regenerated as unhandled dtype $dt — " +
      "teach Tables.events the new branch before trusting any local gate run")
  }

  test("Tables.events canonicalizes ts to session-tz TIMESTAMP") {
    val ds = Tables.events(spark, sfDir)
    assert(ds.schema("ts").dataType == TimestampType,
      s"Tables.events must yield TimestampType ts (got ${ds.schema("ts").dataType}) " +
        "to keep judged output schemas stable across data generations")
    // Analysis-time smoke over the exact shape that died in round 5: a
    // time-windowed aggregate must at least survive analyzer + optimizer.
    import org.apache.spark.sql.functions._
    ds.groupBy(window(col("ts"), "1 hour")).count().queryExecution.optimizedPlan
  }

  test("core table columns keep the dtypes the query layer assumes") {
    val expected = Map(
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_shipdate" -> TimestampNTZType, "l_returnflag" -> StringType),
      "orders" -> Map("o_orderkey" -> LongType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampNTZType, "o_orderstatus" -> StringType),
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true), "label" -> IntegerType),
      "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
        "s_acctbal" -> DoubleType),
      "part" -> Map("p_partkey" -> LongType, "p_brand" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    )
    val drifted = for {
      (table, cols) <- expected.toSeq
      schema = rawSchema(table)
      (col, want) <- cols.toSeq
      got = schema(col).dataType
      if got != want
    } yield s"$table.$col: expected $want, found $got"
    assert(drifted.isEmpty, "test-data schema drift:\n" + drifted.mkString("\n"))
  }
}
