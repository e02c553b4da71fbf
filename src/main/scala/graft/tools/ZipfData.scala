package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded Zipf-keyed synthetic data — the skew rehearsal the sf0.1
  * tables cannot provide (their keys are near-uniform, so every AQE
  * audit trivially reports "zero skew splits"; that proves the plans
  * did not NEED splitting, not that the engine survives a hot key).
  *
  * Keys draw from a truncated power law P(k) ∝ k^(−s) over [1, vocab]
  * by continuous inverse CDF on u = xxhash64(id, seed)/2^40:
  *  - s = 1: key = ⌊(vocab+1)^u⌋ (log-uniform; head key carries
  *    ln 2 / ln(vocab+1) of all rows — ~10% at vocab 1023),
  *  - s ≠ 1: key = ⌊(1 + u·((vocab+1)^(1−s) − 1))^(1/(1−s))⌋
  *    (at s = 2, vocab 1023 the head key carries ~50% of all rows —
  *    the hub-node / boilerplate-text profile).
  *
  * Fully distributed and deterministic: one codegen'd expression over
  * spark.range, no RNG state, no driver materialization — the same
  * generator runs at any scale. */
object ZipfData {

  private def zipfKeyExpr(vocab: Int, s: Double, seed: Long): Column = {
    val u = pmod(xxhash64(col("id"), lit(seed)), lit(1L << 40))
      .cast("double") / (1L << 40).toDouble
    val v1 = (vocab + 1).toDouble
    val x =
      if (s == 1.0) pow(lit(v1), u)
      else pow(lit(1.0) + u * (math.pow(v1, 1.0 - s) - 1.0),
        lit(1.0 / (1.0 - s)))
    least(floor(x).cast("long"), lit(vocab.toLong)).as("key")
  }

  /** (id, key) rows with Zipf(s)-distributed `key` over [1, vocab]. */
  def zipfKeys(spark: SparkSession, n: Long, vocab: Int, s: Double = 1.0,
      seed: Long = 17L): DataFrame = {
    require(vocab >= 2, "vocab must be at least 2")
    spark.range(n).select(col("id"), zipfKeyExpr(vocab, s, seed))
  }

  /** A Zipf-duplicated corpus: `key` picks the TEXT (8 key-derived
    * words, so each doc is exactly one 8-gram window), and docs sharing
    * a key share the text VERBATIM — the head text duplicates across
    * the head key's share of all docs. Gram df = exact-dup cluster
    * size = the key's population: one corpus exercises the exact-dedup
    * hot group, the dup-gram census hot key, and the df-guarded pair
    * join's Σdf² bound at once. */
  def zipfDocs(spark: SparkSession, n: Long, vocab: Int, s: Double = 1.0,
      seed: Long = 17L): DataFrame =
    zipfKeys(spark, n, vocab, s, seed).select(
      col("id").as("doc_id"),
      concat_ws(" ", ('a' to 'h').map(c =>
        concat(lit(c.toString), col("key"))): _*).as("text"),
      concat(lit("src"), pmod(col("id"), lit(4L))).as("source"))

  /** A Zipf-in-degree edge list: dst draws Zipf(s) — one hub node takes
    * the head share of all in-edges — while src cycles uniformly; the
    * PageRank / HITS contribution-aggregate shape. Self-loops removed. */
  def zipfEdges(spark: SparkSession, n: Long, vocab: Int, s: Double = 1.0,
      seed: Long = 17L): DataFrame =
    zipfKeys(spark, n, vocab, s, seed).select(
      pmod(col("id"), lit(vocab.toLong)).as("src"),
      col("key").as("dst"))
      .filter(col("src") =!= col("dst"))
}
