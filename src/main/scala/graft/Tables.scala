package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Access to the driver-provided read-only parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md). Every gate query receives the
  * scale-factor directory as a runtime parameter, so plans are built fresh
  * per scale factor and Catalyst sees real file statistics for AQE.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader only accepts as a raw long behind
    * `spark.sql.legacy.parquet.nanosAsLong`. The driver data has no
    * sub-microsecond component, so `timestamp_micros(ns div 1000)` is a
    * lossless conversion and matches DuckDB's TIMESTAMP_NS semantics.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
