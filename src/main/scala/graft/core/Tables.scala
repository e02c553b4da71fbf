package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The `events` table is written with parquet TIMESTAMP(NANOS), which Spark
  * rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos as a long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and derive a µs-precision
  * TimestampType column — the same ns→µs truncation DuckDB applies when it
  * reads the file, so oracle comparisons line up exactly.
  */
object Tables {

  /** Read a raw table by name from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with `ts` (µs timestamp), `ts_us` (epoch micros, BIGINT). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    // nanosAsLong => ts arrives as BIGINT nanoseconds. Integer division is
    // mandatory: epoch-ns (~1.7e18) exceeds double's 2^53 integer range, so
    // `/ 1000` through double would lose microseconds.
    raw
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
