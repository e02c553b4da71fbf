package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** q313/q314 — IVF cell-split remediation: the operator that ACTS on
  * q305's needs_split flags. Geometry is chosen so the split decision,
  * the Lloyd round, the empty-child edge, and the recall ratchet are
  * each forced deterministically. */
class IvfSplitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** Two seed cells at [1,0] (vid 0) and [0,1] (vid 1); 8 followers
    * clumped around two directions that BOTH land in cell 0, so cell 0
    * holds 9 of 12 vectors and breaches the 6/5 load rule while cell 1
    * (3 vectors) does not. */
  private def skewedCorpus(secondSeed: Seq[Double]) = {
    val s = spark
    import s.implicits._
    val rows = Seq(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
      2L -> secondSeed, // lowest-vid non-centroid member of cell 0
      3L -> Seq(0.99, 0.05), 4L -> Seq(0.98, 0.08),
      5L -> Seq(0.82, 0.58), 6L -> Seq(0.80, 0.61),
      7L -> Seq(0.97, 0.02), 8L -> Seq(0.81, 0.59),
      9L -> Seq(0.05, 0.99), 10L -> Seq(0.02, 0.97),
      11L -> Seq(0.83, 0.57))
    rows.map { case (id, e) => (id, e.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
  }

  test("split flags the overloaded cell and the Lloyd round separates " +
      "the two clumps") {
    val corpus = skewedCorpus(Seq(0.8, 0.6))
    val old = corpus.filter(col("vec_id") <= 1) // cents = vids 0, 1
    val nw = corpus.filter(col("vec_id") > 1)
    val out = Similarity.ivfCellSplit(old, nw, "vec_id", "embedding",
      nList = 2, thrNum = 6, thrDen = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4))).sortBy(t => (t._1, t._2))
    // cell 0 split (9·2·5 = 90 > 12·6 = 72); cell 1 untouched (30 < 72)
    assert(out.map(t => (t._1, t._2, t._4)).toSeq ==
      Seq((0L, 0L, true), (0L, 1L, true), (1L, 0L, false)))
    // seeds are vids 0 ([1,0]) and 2 ([.8,.6]): the x-axis clump
    // (0,3,4,7) joins child 0, the diagonal clump (2,5,6,8,11) child 1
    val Seq(c0, c1, u) = out.toSeq
    assert(c0._3 == 4L && c1._3 == 5L && u._3 == 3L)
    // populations always partition the corpus
    assert(out.map(_._3).sum == 12L)
    // the rebalance worked: every child is smaller than the flagged
    // cell was, and the corpus-wide max population dropped (9 → 5)
    assert(out.filter(_._4).forall(_._3 < 9L))
    assert(out.map(_._3).max < 9L)
    // load factors are population ÷ (N / L') with L' = 3
    assert(math.abs(c0._5 - 4.0 * 3 / 12) < 1e-12)
    assert(math.abs(u._5 - 3.0 * 3 / 12) < 1e-12)
  }

  test("identical seeds tie every member to child 0 and the drained " +
      "child is reported honestly as n_vecs = 0") {
    // vid 2 duplicates vid 0 exactly: both 2-means seeds of cell 0 are
    // the same point, every member cosine ties, and the >= tie-break
    // sends ALL mass to child 0 — child 1 must still appear, empty.
    val corpus = skewedCorpus(Seq(1.0, 0.0))
    val old = corpus.filter(col("vec_id") <= 1)
    val nw = corpus.filter(col("vec_id") > 1)
    val out = Similarity.ivfCellSplit(old, nw, "vec_id", "embedding",
      nList = 2, thrNum = 6, thrDen = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq((0L, 0L, 9L, true), (0L, 1L, 0L, true),
      (1L, 0L, 3L, false)))
  }

  test("no cell over threshold means no splits: output degenerates to " +
      "the per-cell population table") {
    val corpus = skewedCorpus(Seq(0.8, 0.6))
    val old = corpus.filter(col("vec_id") <= 1)
    val nw = corpus.filter(col("vec_id") > 1)
    val out = Similarity.ivfCellSplit(old, nw, "vec_id", "embedding",
      nList = 2, thrNum = 1000, thrDen = 1).collect()
    assert(out.length == 2 && out.forall(!_.getBoolean(3)))
    assert(out.map(_.getLong(2)).sum == 12L)
  }

  test("scaled-probe split recall matches or beats the fixed-budget " +
      "unsplit index on the sf0.001 corpus") {
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 20)
    val old = emb.filter(pmod(col("vec_id"), lit(2L)) === 0L)
    val nw = emb.filter(pmod(col("vec_id"), lit(2L)) === 1L)
    def meanRecall(topk: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallVsExact(q, emb, "vec_id", "embedding", 5, topk)
        .agg(avg(col("recall"))).head.getDouble(0)
    // unsplit index (threshold never fires), pre-split probe budget
    val unsplit = meanRecall(Similarity.ivfSplitTopK(q, old, nw,
      "vec_id", "embedding", k = 5, nProbe = 4,
      thrNum = 1000000, thrDen = 1))
    // split index with the budget scaled by list growth (16 → 18 ⇒ 5)
    val split = meanRecall(Similarity.ivfSplitTopK(q, old, nw,
      "vec_id", "embedding", k = 5, nProbe = 5, thrNum = 6, thrDen = 5))
    assert(split >= unsplit,
      s"split recall $split regressed below unsplit $unsplit")
  }

  test("persisted split index reproduces the live build's search " +
      "row-for-row (q319's write -> read -> search round trip)") {
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 20)
    val old = emb.filter(pmod(col("vec_id"), lit(2L)) === 0L)
    val nw = emb.filter(pmod(col("vec_id"), lit(2L)) === 1L)
    val st = Similarity.ivfSplitState(old, nw, "vec_id", "embedding",
      thrNum = 6, thrDen = 5)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_split_persist").toString
    Similarity.ivfSplitWriteIndex(st, dir)
    val re = Similarity.ivfSplitReadIndex(spark, dir)
    assert(re.lists == st.lists)
    val live = Similarity.ivfSplitTopKFrom(q, emb, st,
      "vec_id", "embedding", k = 5, nProbe = 5)
    val persisted = Similarity.ivfSplitTopKFrom(q, emb, re,
      "vec_id", "embedding", k = 5, nProbe = 5)
    assert(persisted.count() == live.count() && live.count() > 0)
    assert(persisted.exceptAll(live).count() == 0)
    assert(live.exceptAll(persisted).count() == 0)
  }

  test("arrival write-back: read the persisted index, append a batch, " +
      "re-split off the merged state — identical, table for table, to " +
      "the from-scratch build over corpus + arrivals (q324)") {
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val even = emb.filter(pmod(col("vec_id"), lit(2L)) === 0L)
    val oddPre = emb.filter(pmod(col("vec_id"), lit(4L)) === 1L)
    val arrivals = emb.filter(pmod(col("vec_id"), lit(4L)) === 3L)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_split_update").toString
    Similarity.ivfSplitWriteIndex(Similarity.ivfSplitState(even, oddPre,
      "vec_id", "embedding", thrNum = 6, thrDen = 5), dir)
    val updated = Similarity.ivfSplitUpdateIndex(even.unionByName(oddPre),
      arrivals, "vec_id", "embedding", dir, thrNum = 6, thrDen = 5)
    val scratch = Similarity.ivfSplitState(even,
      emb.filter(pmod(col("vec_id"), lit(2L)) === 1L),
      "vec_id", "embedding", thrNum = 6, thrDen = 5)
    // the parity claim is only meaningful if the merged state actually
    // splits something
    assert(scratch.flagged.count() > 0, "no cell flagged — geometry changed?")
    assert(updated.lists == scratch.lists)
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      assert(a.count() == b.count(), s"$what row count diverged")
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what content diverged")
    }
    same(updated.assign, scratch.assign, "assign")
    same(updated.cells, scratch.cells, "cells")
    same(updated.flagged, scratch.flagged, "flagged")
    same(updated.children, scratch.children, "children")
    same(updated.cents, scratch.cents, "cents")
  }
}
