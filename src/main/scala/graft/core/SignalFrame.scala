package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's canonical annotated-signal frame (SURVEY §1.1):
  *
  * {{{ signal(subject, idx BIGINT, ts_us BIGINT, value DOUBLE,
  *            beat TINYINT?, artifact TINYINT?) }}}
  *
  * `idx` is the materialized sample clock (the reference's implicit
  * positional index — Spark has no row order, so it is always explicit).
  * Sampling rate `fs` travels as a query parameter, mirroring the
  * reference's constructor-attribute convention (pipeline/ECG.py:22-41).
  *
  * [[fromEvents]] derives a deterministic signal view from the driver's
  * `events` table so every SQA operator is exercised against oracle-checked
  * shared data: one recording per user, sample clock = arrival order,
  * beats = non-error events, artifacts = beats with value > 150.
  */
object SignalFrame {

  val BEAT_TYPES = Seq("click", "purchase", "signup", "view")

  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(
        col("user_id").as("subject"),
        (row_number().over(w) - 1).cast("long").as("idx"),
        col("ts_us"),
        col("value"),
        when(col("event_type").isin(BEAT_TYPES: _*), 1).as("beat"),
        when(col("event_type").isin(BEAT_TYPES: _*) && col("value") > 150, 1).as("artifact"))
  }

  /** Matching DuckDB CTE body for the oracle queries. */
  val fromEventsSql: String =
    """SELECT user_id AS subject,
      |  (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) - 1 AS idx,
      |  epoch_us(ts) AS ts_us, value,
      |  CASE WHEN event_type IN ('click','purchase','signup','view') THEN 1 END AS beat,
      |  CASE WHEN event_type IN ('click','purchase','signup','view') AND value > 150 THEN 1 END AS artifact
      |FROM events""".stripMargin

  /** 1-based segment id from the sample clock (reference SQA.py:541). */
  def segment(idx: Column, fs: Int, segSize: Int): Column =
    (idx / (fs.toLong * segSize)).cast("long") + 1
}
