package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (see TESTDATA.md).
  *
  * The reference engine reads a CSV and a REST-JSON payload eagerly with
  * pandas (reference dags/create-data-lake.py:69,95-97); here every scan is a
  * lazy Spark parquet source, so Catalyst pushes predicates and prunes
  * columns into the scan — the property that matters at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and floor-convert to
    * microsecond TimestampType — integer `div`, not double division, because
    * epoch-nanos (~1.7e18) exceeds a double's 2^53 exact-integer range.
    *
    * The nanosAsLong conf is read-path DDL, not a per-read option, so it must
    * be set on the session BEFORE schema resolution — the session factories
    * (GraftSession / Verify / Bench / the test base) all set it at build
    * time. It is NOT mutated here: a loader that flips session-wide conf as
    * a side effect would silently change how every later parquet read in the
    * same session interprets nano timestamps. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet has TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession.build does)")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
