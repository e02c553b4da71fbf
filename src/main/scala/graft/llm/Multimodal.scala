package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batched feature extraction via the typed
  * mapPartitions contract (the Scala analog of `mapInPandas`).
  *
  * The decode step is STUBBED — codec libraries are not available in this
  * environment — behind [[decodeStub]], a deterministic fake that derives
  * a feature vector from the payload bytes. The Spark-side plumbing
  * (schema, per-partition batching, output shape, partition-count
  * preservation) is real and tested; swapping a real decoder in changes
  * only the function body.
  */
object Multimodal {

  case class MediaRow(id: Long, payload: Array[Byte], width: Int, height: Int)
  case class FeatureRow(id: Long, dim: Int, features: Array[Float], checksum: Long)

  val FEATURE_DIM = 8

  /** Deterministic fake decoder: folds payload bytes into FEATURE_DIM
    * buckets. Replace with a real image/audio decode when codecs exist. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FEATURE_DIM)
    var i = 0
    while (i < payload.length) {
      acc(i % FEATURE_DIM) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Attach a typed media struct to documents: payload = utf-8 bytes of
    * the text standing in for image bytes; metadata derived
    * deterministically. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("payload"),
      (length(col(textCol)) % 64 + 1).cast("int").as("width"),
      (length(col(textCol)) % 48 + 1).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Batched feature extraction: one decode call per row, executed
    * partition-at-a-time so a real decoder can amortize codec/session
    * setup per batch (the mapInPandas batch shape). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map { r =>
        val f = decodeStub(r.payload)
        val checksum = f.foldLeft(17L)((a, v) => a * 31 + math.round(v * 1000).toLong)
        FeatureRow(r.id, FEATURE_DIM, f, checksum)
      }
    }
  }
}
