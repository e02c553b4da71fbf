package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, EmbeddingOps, Pipeline}

/** Planted-data invariants for the round-13 additions: int8 quantization,
  * the covariance Gramian + power-iteration top PC, priority sampling,
  * and blocked edit-distance pairs. (Cross-engine value parity is the
  * oracle gate's job — q188–q191; these pin the algebra.) */
class EmbeddingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("covarianceCells recovers a planted rank-1 covariance") {
    // y = 2x exactly: cov = [[4, 8], [8, 16]] for x in {1,3,5}
    val emb = Seq((0L, Seq(1f, 2f)), (1L, Seq(3f, 6f)), (2L, Seq(5f, 10f)))
      .toDF("vec_id", "embedding")
    val cells = EmbeddingOps.covarianceCells(emb, "vec_id", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val want = Map((0, 0) -> 4.0, (0, 1) -> 8.0, (1, 0) -> 8.0, (1, 1) -> 16.0)
    want.foreach { case (k, v) =>
      assert(math.abs(cells(k) - v) < 1e-5, s"cell $k: ${cells(k)} vs $v")
    }
  }

  test("topPrincipalComponent finds the planted dominant direction") {
    val emb = Seq((0L, Seq(1f, 2f)), (1L, Seq(3f, 6f)), (2L, Seq(5f, 10f)))
      .toDF("vec_id", "embedding")
    val pc = EmbeddingOps.topPrincipalComponent(emb, "vec_id", "embedding",
      dim = 2).collect().sortBy(_.getInt(0))
    // top eigenvector ∝ (1, 2) → L∞-normalized (0.5, 1); rank-1 matrix:
    // eigenvalue = trace = 20, explained_frac = 1
    assert(math.abs(pc(0).getDouble(1) - 0.5) < 1e-6)
    assert(math.abs(pc(1).getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(pc(0).getDouble(2) - 20.0) < 1e-4)
    assert(math.abs(pc(0).getDouble(3) - 1.0) < 1e-9)
  }

  test("all-but-the-top: rank-1 data leaves ~zero residual, coefs center") {
    // all variance lies along (1,2): removing the top PC removes it all
    val emb = Seq((0L, Seq(1f, 2f)), (1L, Seq(3f, 6f)), (2L, Seq(5f, 10f)))
      .toDF("vec_id", "embedding")
    val rows = graft.llm.EmbeddingOps
      .allButTop(emb, "vec_id", "embedding", dim = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    rows.foreach { case (_, _, resid) => assert(math.abs(resid) < 1e-4) }
    // coefficients are the centered projections onto unit (1,2)/√5:
    // x−μ = ±(2,4) or 0 → ±2√5 ≈ ±4.4721, 0
    val want = Seq(-2 * math.sqrt(5), 0.0, 2 * math.sqrt(5))
    rows.map(_._2).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-4, s"coef $g vs $w") }
  }

  test("int8 audit: codes reconstruct within half a step, degenerate dim is free") {
    val emb = Seq((0L, Seq(0f, 7f)), (1L, Seq(1f, 7f)), (2L, Seq(2f, 7f)))
      .toDF("vec_id", "embedding")
    val rows = EmbeddingOps.int8QuantAudit(emb, "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r)).toMap
    val d0 = rows(0)
    assert(d0.getDouble(1) == 0.0 && d0.getDouble(2) == 2.0)
    assert(math.abs(d0.getDouble(3) - 2.0 / 255) < 1e-12)
    // affine min/max quantization: |err| <= scale/2
    assert(d0.getDouble(4) <= 2.0 / 255 / 2 + 1e-12)
    // constant dimension: scale 0, zero error
    val d1 = rows(1)
    assert(d1.getDouble(3) == 0.0 && d1.getDouble(4) == 0.0
      && d1.getDouble(5) == 0.0)
  }

  test("k-center greedy picks one exemplar per planted direction") {
    // three well-separated directions, several near-copies of each; the
    // greedy must cover all three directions within k=3 (farthest-point
    // never picks a near-copy of an existing center while an uncovered
    // direction remains)
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.99f, 0.01f, 0f)),
      (2L, Seq(0f, 1f, 0f)), (3L, Seq(0.01f, 0.99f, 0f)),
      (4L, Seq(0f, 0f, 1f)), (5L, Seq(0f, 0.01f, 0.99f)))
      .toDF("vec_id", "embedding")
    val picked = graft.llm.EmbeddingOps
      .kCenterCoreset(emb, "vec_id", "embedding", k = 3)
      .collect().sortBy(_.getLong(0))
    assert(picked.head.getLong(1) == 0L) // lowest-id seed
    assert(picked.head.isNullAt(2))
    val dirs = picked.map(_.getLong(1) / 2).toSet // ids 0-1/2-3/4-5 per dir
    assert(dirs == Set(0L, 1L, 2L), s"picked ${picked.map(_.getLong(1)).toSeq}")
    // the radius curve is non-decreasing in max_cos
    val mcs = picked.tail.map(_.getDouble(2))
    assert(mcs.sorted.sameElements(mcs))
  }

  test("priority sampling: k-bounded, deterministic, weight-sensitive") {
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      (col("id") % 4).cast("string").as("src"),
      // ids 0..99 carry 100x the weight of the rest
      when(col("id") < 100, 1000L).otherwise(10L).as("w"))
    val s1 = Pipeline.prioritySample(docs, "doc_id", "src", "w", k = 25)
    val got = s1.collect()
    assert(got.length == 100) // 4 strata × 25
    assert(got.forall(r => r.getLong(4) >= 1 && r.getLong(4) <= 25))
    // determinism: second invocation identical
    assert(s1.exceptAll(Pipeline.prioritySample(docs, "doc_id", "src", "w",
      k = 25)).count() == 0)
    // weight sensitivity: the 5% heavy ids (100x weight) should dominate
    // the sample far beyond their population share
    val heavy = got.count(_.getLong(1) < 100)
    assert(heavy > 40, s"only $heavy/100 sampled rows are heavy-weight")
  }

  test("edit-distance pairs find planted near-identical prefixes") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta etaX", "en"),
      (2L, "alpha beta gamma delta epsilon zeta etaY", "en"), // dist 1 to #1
      (3L, "alpha beta gamma delta DIFFERENT TAIL xx", "en"), // dist > 1
      (4L, "completely unrelated text that stands alone", "en"))
      .toDF("doc_id", "text", "lang")
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(pairs.contains((1L, 2L, 1)))
    // 1-3 and 2-3 share the block (same 10-char prefix) but differ by more
    assert(pairs.forall { case (a, b, d) => a < b && d <= 15 })
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
