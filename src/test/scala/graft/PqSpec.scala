package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Semantic sanity for product quantization: the q112/q113 oracles prove
  * the Spark plan and the SQL mirror compute the SAME thing; this spec
  * proves that thing is a correct quantizer — codebooks recover planted
  * subspace patterns, reconstruction error collapses on them, and ADC
  * ranks an exact twin first. */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** 64 vectors of dim 64; every 8-dim subvector of doc i is pattern
    * (i % 4) — docs 0..3 (the k=4 seeds) cover all four patterns. */
  private def plantedDocs = {
    val s = spark
    import s.implicits._
    def pattern(p: Int): Seq[Float] =
      (0 until 8).map(j => (p * 10 + j).toFloat / 16)
    (0 until 64).map { i =>
      (i.toLong, Seq.fill(8)(pattern(i % 4)).flatten)
    }.toDF("vec_id", "embedding")
  }

  test("codebook recovers planted patterns: reconstruction error ~ 0") {
    val codes = Similarity.productQuantize(plantedDocs, "vec_id",
      "embedding", m = 8, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(codes.length == 64 * 8)
    // every subvector is bit-equal to a cluster of identical points, so
    // d2 is bounded by the 2^-20 centroid quantization alone
    assert(codes.forall(_._4 < 1e-9),
      s"max d2 = ${codes.map(_._4).max}")
    // same planted pattern -> same code, different pattern -> different
    (0 until 8).foreach { sub =>
      val bySub = codes.filter(_._2 == sub)
      val groups = bySub.groupBy(_._1 % 4).view.mapValues(_.map(_._3).distinct)
      assert(groups.values.forall(_.length == 1), s"sub $sub: split pattern")
      assert(groups.values.flatten.toSeq.distinct.length == 4,
        s"sub $sub: merged patterns")
    }
  }

  test("ADC ranks an exact twin first with ~zero distance") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3L)
    val twinVec = Seq.fill(64)(9.0f)
    // twin id 5 sits inside the first-8-by-id seed set, so the pair (far
    // from all noise) keeps its own centroid and reconstructs ~exactly
    val all = ((0 until 40).map { i =>
      val id = if (i == 5) 101L else i.toLong
      val v = if (i == 5) twinVec else Seq.fill(64)(rnd.nextFloat() * 4 - 2)
      (id, v)
    } :+ (5L, twinVec)).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(
      all.filter($"vec_id" === 5L), all, "vec_id", "embedding",
      k = 3, m = 8, codebookK = 8, iters = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    assert(top.head._1 == 101L, s"twin not ranked first: ${top.toSeq}")
    // the twins own their centroid, so the query's ADC to its twin is
    // pure 2^-20 quantization noise — orders below any noise vector
    assert(top.head._2 < 1e-6 && top.head._2 < top(1)._2 / 1000,
      s"twin not separated: ${top.toSeq}")
  }

  test("IVF-PQ: residual ADC finds an exact twin through the coarse cells") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    // two well-separated blobs around +8 and -8 so the coarse quantizer
    // has real cells to route through; the twin pair lives in blob A
    val twinVec = Seq.fill(64)(8.5f)
    val all = ((0 until 40).map { i =>
      val center = if (i % 2 == 0) 8.0f else -8.0f
      val id = if (i == 6) 201L else i.toLong
      val v = if (i == 6) twinVec
        else Seq.fill(64)(center + rnd.nextFloat() - 0.5f)
      (id, v)
    } :+ (6L, twinVec)).toDF("vec_id", "embedding")
    val top = Similarity.ivfPqTopK(
      all.filter($"vec_id" === 6L), all, "vec_id", "embedding",
      k = 3, nList = 4, nProbe = 2, m = 8, codebookK = 8, iters = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    assert(top.nonEmpty, "IVF-PQ returned nothing")
    assert(top.head._1 == 201L, s"twin not ranked first: ${top.toSeq}")
    // ADC to the twin is residual-quantization noise only
    assert(top.head._2 < top(1)._2,
      s"twin not separated: ${top.toSeq}")
    // candidates come only from probed cells: every returned id is in the
    // query's blob or a probed neighbor — never more than the corpus
    assert(top.length <= 3)
  }

  test("IVFADC+R: exact re-rank never loses recall vs the raw ADC ranking") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11L)
    // one blob so every vector shares a cell and ADC ordering is pure
    // code-quantization noise — exactly the regime re-ranking repairs
    val all = (0 until 48).map { i =>
      (i.toLong, Seq.fill(64)(2.0f + rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
    val q = all.filter($"vec_id" < 8)

    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val hits = Similarity.recallVsExact(q, all, "vec_id", "embedding",
        k = 3, approx).collect()
      hits.map(_.getAs[Double]("recall")).sum / hits.length
    }
    val plain = recallOf(Similarity.ivfPqTopK(q, all, "vec_id", "embedding",
      k = 3, nList = 2, nProbe = 2, m = 8, codebookK = 8, iters = 2))
    val rer = recallOf(Similarity.ivfPqRerank(q, all, "vec_id", "embedding",
      k = 3, shortlist = 20, nList = 2, nProbe = 2, m = 8, codebookK = 8,
      iters = 2))
    // the re-ranked top-3 is the exact-cosine best of a 20-deep shortlist
    // that contains the ADC top-3, so per-query recall can only go up
    assert(rer >= plain, s"rerank recall $rer < plain $plain")
    // and in the noise regime it should actually help, not just tie
    assert(rer > 0.5, s"rerank recall $rer suspiciously low")
  }
}
