package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Tables.events must accept EVERY physical `ts` encoding the driver has
  * shipped: TIMESTAMP(NANOS) (arriving as BIGINT nanos under
  * `nanosAsLong`), native TIMESTAMP(MICROS) adjusted-to-UTC
  * (TimestampType), and MICROS wall-time (TIMESTAMP_NTZ). The round-11
  * testdata regen silently flipped ns→µs and every events-based query
  * failed analysis until the loader branched on the arrived type
  * (round 12) — this spec keeps all three paths alive. */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val US = 1600000000123456L // epoch µs, survives ns round-trip

  private def writeEvents(ts: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evts").toFile.getPath
    Seq((1L, 7L, "click", 1.5, "p"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", ts)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def check(dir: String): Unit = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val row = df.select("ts_us", "event_id").head
    assert(row.getLong(0) == US, s"ts_us=${row.getLong(0)}")
  }

  test("events loader: BIGINT-nanos encoding (nanosAsLong path)") {
    check(writeEvents(lit(US * 1000L))) // column named ts, LongType nanos
  }

  test("events loader: native TIMESTAMP (µs, adjusted to UTC)") {
    check(writeEvents(timestamp_micros(lit(US))))
  }

  test("events loader: TIMESTAMP_NTZ (µs wall time)") {
    check(writeEvents(timestamp_micros(lit(US)).cast(TimestampNTZType)))
  }
}
