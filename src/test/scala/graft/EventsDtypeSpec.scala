package graft

import org.apache.spark.sql.types.TimestampType

/** The events table's `ts` column has shipped under THREE parquet
  * encodings across driver test-data regenerations: timestamp[ns]
  * (loads as BIGINT under nanosAsLong), timestamp[us] NTZ (loads as
  * TIMESTAMP_NTZ), and tz'd timestamp[us] (loads as session TIMESTAMP).
  * The ns→us drift killed 32 queries in round 5; SchemaDriftSpec pins
  * whatever encoding the CURRENT testdata carries, and this spec pins
  * the canonicalization itself against purpose-built fixtures of all
  * three encodings — so the next regeneration is a no-op no matter
  * which encoding it picks. Fixtures live in
  * src/test/resources/events_dtypes/{ns,us,tz}/events.parquet with
  * identical logical values (one with sub-microsecond precision that
  * must truncate, one on a day boundary). */
class EventsDtypeSpec extends SparkTestBase {

  private val base = "src/test/resources/events_dtypes"

  test("all three historical ts encodings canonicalize to identical TIMESTAMP values") {
    val frames = Seq("ns", "us", "tz").map { enc =>
      enc -> Tables.events(spark, s"$base/$enc")
    }
    for ((enc, df) <- frames) {
      assert(df.schema("ts").dataType === TimestampType, s"$enc: wrong canonical type")
    }
    val collected = frames.map { case (enc, df) =>
      enc -> df.orderBy("event_id")
        .select("event_id", "ts", "etype")
        .collect().map(_.toSeq).toSeq
    }
    val (refEnc, ref) = collected.head
    for ((enc, rows) <- collected.tail)
      assert(rows === ref, s"$enc decoded differently from $refEnc")
    // the ns fixture carries ...999999999 ns: truncation (not rounding)
    // to micros must yield ...999999 — the DuckDB-client behavior the
    // oracle compare relies on
    val ts2 = collected.head._2(1)(1).asInstanceOf[java.sql.Timestamp]
    assert(ts2.getNanos === 999999000, s"expected truncation to micros, got ${ts2.getNanos}")
  }
}
