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

  /** events with `ts` (µs timestamp), `ts_us` (epoch micros, BIGINT).
    *
    * The driver has shipped `events.parquet` with two physical `ts`
    * encodings across rounds — TIMESTAMP(NANOS) (arrives as BIGINT nanos
    * under `nanosAsLong`) and TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ
    * or TIMESTAMP depending on `inferTimestampNTZ`) — so the loader
    * branches on the arrived type instead of assuming one. All µs-epoch
    * math is integer-exact: epoch-ns (~1.7e18) exceeds double's 2^53
    * integer range, so nothing routes through double. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // oracle comparisons are defined in UTC; pin it so NTZ→LTZ is identity
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, sfDir, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsUs = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case TimestampType    => unix_micros(col("ts"))
      case other => throw new IllegalStateException(
        s"unexpected events.ts type: $other")
    }
    raw
      .withColumn("ts_us", tsUs)
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
