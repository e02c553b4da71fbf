package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.streaming.StreamingSqa

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("streaming sliding-window quality counts match the batch plan") {
    // ns-timestamp parquet must be rewritten at us precision for the
    // streaming reader's explicit schema
    val tmp = Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(tmp)

    val streamed = StreamingSqa.runBatchViaStream(spark, tmp)
      .select("window", "user_id", "n_events", "n_valid", "n_error", "sum_value")
    val batch = StreamingSqa.qualityCounts(spark.read.parquet(tmp))
      .select("window", "user_id", "n_events", "n_valid", "n_error", "sum_value")

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
