package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry reads its inputs through here so the
  * scan path is uniform: plain parquet, letting Catalyst push filters and
  * prune columns into the vectorized reader. At cluster scale the same
  * call works unchanged against an object-store URI.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts is parquet timestamp[ns], which Spark's vectorized reader
    * rejects. Read nanos as long (legacy conf), then truncate to micros —
    * the same truncation DuckDB applies when handing ns timestamps to
    * clients, so oracles agree.
    *
    * The conf is deliberately NOT save/restored here: the returned frame
    * is lazy, so the flag must still be set when the scan executes.
    * Session-wide effect: ns-timestamp parquet columns read as BIGINT
    * instead of erroring — benign for every other table (none carry ns
    * timestamps). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
