package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operators over `array<float>` columns.
  *
  * Dot products fold left-to-right with a double accumulator — the same
  * sequence DuckDB's `list_reduce` uses — so cosine scores are
  * bit-identical across engines and reduction-order independent. The fold
  * is a native codegen Catalyst expression
  * ([[graft.functions.DotProductF]]): the higher-order `aggregate` form it
  * replaced evaluates interpreted, which dominated the similarity joins.
  * The scale path buckets by sign-bit LSH so the candidate join is an
  * equi-join on the bucket key instead of a cross join.
  */
object VectorOps {

  /** Sequential double fold of element products over two equal-length
    * float arrays (codegen expression; the caller's session must have
    * called [[graft.functions.VectorExpressions.register]]). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotf(a, b)

  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity given precomputed squared norms. */
  def cosine(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    dotAb / sqrt(normSqA * normSqB)

  /** Sign-bit LSH bucket over `dims.size` axis-aligned hyperplanes:
    * bit k set iff embedding[dims(k)] > 0. Cheap, deterministic, and
    * mirrors 1:1 into the DuckDB oracle. The library also accepts seeded
    * random hyperplanes at scale — any fixed projection list works. */
  def signBucket(emb: Column, dims: Seq[Int]): Column =
    dims.zipWithIndex.map { case (d, k) =>
      when(element_at(emb, d + 1) > 0f, 1 << k).otherwise(0)
    }.reduce(_ + _)

  /** OR-amplified banded LSH dimension layout: `numBands` disjoint bands of
    * `bitsPerBand` hyperplanes striding the full `dim`-dimensional space.
    * Candidate recall for per-bit agreement probability p is
    * 1 - (1 - p^bitsPerBand)^numBands — e.g. p=0.9, 8 bits, 4 bands:
    * 0.89 vs 0.43 for a single 8-bit table (the round-2 shape). */
  def bandDims(numBands: Int, bitsPerBand: Int, dim: Int): Seq[Seq[Int]] = {
    val stride = math.max(1, dim / (numBands * bitsPerBand))
    (0 until numBands).map(j =>
      (0 until bitsPerBand).map(k => (j * bitsPerBand + k) * stride))
  }
}
