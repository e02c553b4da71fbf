package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming variant of the sliding-window SQA aggregation
  * (SURVEY §2.8 — the reference is pure batch; this is the engine's
  * incremental extension, same window expressions + a watermark).
  *
  * The batch reference computes per-window beat/artifact counts over a
  * sample-clock window (A4); the streaming form computes the identical
  * aggregate over event-time windows with late-data tolerance, so a
  * dashboard can follow a live device feed. `readStream` over a parquet
  * directory is also the natural backfill path: the same plan runs over
  * historical data by swapping in `read`.
  */
object StreamingSqa {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Sliding per-user quality counts over event-time windows. */
  def qualityCounts(events: DataFrame, windowDur: String = "1 hour",
      slideDur: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") =!= "error", 1)).as("n_valid"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        sum(col("value").cast("decimal(24,4)")).cast("double").as("sum_value"))

  /** Streaming exact dedup (the streaming analog of
    * [[graft.llm.Dedup.exactGroups]]): keep the FIRST occurrence of each
    * content hash from an unbounded document feed. State is keyed by the
    * 16-byte md5 and evicted once the event-time watermark passes
    * (`dropDuplicatesWithinWatermark`), so memory stays bounded no matter
    * how long the feed runs — the property a plain `dropDuplicates` lacks.
    * Emit is append-mode: first sighting flows through immediately. */
  def streamingExactDedup(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Run the streaming plan over a static parquet directory through the
    * memory sink until exhausted; returns the materialized result. Used by
    * tests and as the backfill demonstration. */
  def runBatchViaStream(spark: SparkSession, parquetDir: String): DataFrame = {
    val stream = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(parquetDir)
    val q = qualityCounts(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("sqa_stream").start()
    q.processAllAvailable()
    q.stop()
    spark.table("sqa_stream")
  }
}
