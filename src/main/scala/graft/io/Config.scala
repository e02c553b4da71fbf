package graft.io

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** S11: JSON parameter-configuration round-trip (reference
  * `_create_configs` / `_load_config`, dashboard/utils.py:327-372). The
  * reference serializes a flat dict of SQA parameters per session; the
  * engine mirrors it as a typed case class persisted via Spark's JSON
  * source, so a config travels with the data it parameterized.
  */
case class EngineConfig(
    source: String,
    dataType: String,
    samplingRate: Int,
    segmentSize: Int,
    filters: Boolean,
    scrDetection: Boolean,
    scrAmplitude: Double,
    artifactMethod: String,
    artifactTolerance: Double,
    useTemperature: Boolean,
    temperatureVariable: Option[String],
    minEda: Option[Double],
    maxEda: Option[Double],
    headers: Option[Map[String, String]])

object EngineConfig {

  def save(spark: SparkSession, cfg: EngineConfig, path: String): Unit = {
    import spark.implicits._
    Seq(cfg).toDS().coalesce(1).write.mode("overwrite").json(path)
  }

  def load(spark: SparkSession, path: String): EngineConfig = {
    val enc = Encoders.product[EngineConfig]
    spark.read.schema(enc.schema).json(path).as[EngineConfig](enc).head()
  }

  /** One-row frame view of a config (scalar fields; the optional headers
    * map is a separate surface) — the oracle-comparable shape. */
  def toFrame(spark: SparkSession, cfg: EngineConfig): DataFrame = {
    import spark.implicits._
    Seq(cfg).toDS().toDF().drop("headers")
  }
}
