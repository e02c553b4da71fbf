package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan contracts for the whole query surface: structural properties any
  * 100 TB-safe plan must keep, asserted over every SparkEntry query at
  * sf0.001. These catch the regression CLASS the round-8 plan audit
  * found (a multi-branch consumer replanning a subtree multiplicatively
  * — q63 once carried 16 scans of the events table) and the one a
  * mis-joined dedup/ANN query would introduce (an unconditioned cross
  * product over a corpus table).
  */
class PlanContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  // Queries where a BroadcastNestedLoopJoin is the DELIBERATE shape: a
  // broadcast of a scalar aggregate or a <=nList centroid/query table
  // (corpus side never nested-loops against corpus side).
  private val scalarBroadcastOk = Set(
    "q30_cosine_topk", "q31_ann_lsh", "q61_embed_dup", "q72_ann_ivf",
    "q83_semdedup", "q87_kmeans", "q88_cluster_sample", "q89_ann_recall",
    "q86_source_drift", "q75_tfidf", "q76_bm25", "q82_mixture",
    "q85_bigram_lm", "q71_corpus_select", "q70_embed_clusters",
    "q73_vocab")

  test("every query plan: no cartesian product; bounded scan fan-out") {
    val failures = collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = try fn(spark, dir).queryExecution.executedPlan.toString
      catch { case e: Throwable => failures += s"$name: plan build failed: ${e.getMessage}"; "" }
      if (plan.nonEmpty) {
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct in plan"
        if (!scalarBroadcastOk(name) && plan.contains("BroadcastNestedLoopJoin"))
          failures += s"$name: unexpected BroadcastNestedLoopJoin"
        val scans = "\\(\\d+\\) Scan parquet|Scan parquet ".r
          .findAllIn(plan).size
        if (scans > 10)
          failures += s"$name: $scans parquet scans (subtree replanning?)"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
