package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *  - bruteForceTopK: exact baseline — queries × candidates join with an
  *    expression-only cosine; correct at any k, quadratic in candidates.
  *    Broadcast the (small) query side so the big side never shuffles.
  *  - lshTopK: the scale path — sign-bit LSH buckets make the candidate
  *    join an equi-join on the bucket key; per-bucket cosine + top-k.
  *    Recall is tunable via number of hyperplanes / multi-probe; at 100 TB
  *    the bucket key is also the natural partitioning key.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row.
    * Scores rounded to 6 dp before ranking; ties break on candidate id
    * (deterministic across engines). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .withColumn("q_n2", VectorOps.normSq(col("q_emb")))
    val c = candidates.select(col(idCol).as("cand_id"), col(embCol).as("c_emb"))
      .withColumn("c_n2", VectorOps.normSq(col("c_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    broadcast(q).join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(
        VectorOps.cosine(VectorOps.dot(col("q_emb"), col("c_emb")),
          col("q_n2"), col("c_n2")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "cand_id", "cos", "rnk")
  }

  /** Embedding-cosine near-duplicate pairs (the fifth dedup strategy):
    * candidate pairs confined to shared sign-bit LSH buckets — an
    * equi-join, never a cross join — then exact cosine >= threshold.
    * Output (id_a < id_b, cos). */
  def embeddingDupPairs(docs: DataFrame, idCol: String, embCol: String,
      threshold: Double,
      dims: Seq[Int] = Seq(0, 8, 16, 24, 32, 40, 48, 56)): DataFrame = {
    val n = docs.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("n2", VectorOps.normSq(col("emb")))
      .withColumn("bucket", VectorOps.signBucket(col("emb"), dims))
    val a = n.select(col("id").as("id_a"), col("emb").as("ea"),
      col("n2").as("na"), col("bucket"))
    val b = n.select(col("id").as("id_b"), col("emb").as("eb"),
      col("n2").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(
        VectorOps.cosine(VectorOps.dot(col("ea"), col("eb")),
          col("na"), col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Bucketed ANN: candidates restricted to the query's LSH bucket. */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, embCol: String, k: Int,
      dims: Seq[Int] = Seq(0, 8, 16, 24, 32, 40, 48, 56)): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .withColumn("q_n2", VectorOps.normSq(col("q_emb")))
      .withColumn("bucket", VectorOps.signBucket(col("q_emb"), dims))
    val c = candidates.select(col(idCol).as("cand_id"), col(embCol).as("c_emb"))
      .withColumn("c_n2", VectorOps.normSq(col("c_emb")))
      .withColumn("bucket", VectorOps.signBucket(col("c_emb"), dims))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(
        VectorOps.cosine(VectorOps.dot(col("q_emb"), col("c_emb")),
          col("q_n2"), col("c_n2")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "bucket", "cand_id", "cos", "rnk")
  }
}
