package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Scale rehearsal for the centroid-assignment shape (VERDICT r10 #3): the
  * argmax/argmin pick over a broadcast centroid table must reach the
  * exchange as ONE row per vector, not as the exploded N×k crossJoin
  * fan-out. At the FAISS ⌈√N⌉ sizing rule the difference is shuffle volume
  * N vs N^1.5 — ~3×10¹³ rows at a billion vectors, the difference between
  * an index build that runs and one that does not.
  *
  * The witness is the executed plan's own shuffle-write metrics (AQE off so
  * the exchanges sit flat in the tree): total records written across every
  * exchange of the assignment job, asserted at O(N) against the N×k
  * explosion the windowed row_number form used to shuffle.
  */
class AssignmentShuffleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "false") // flat plan tree for metrics
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val N = 20000
  private val K = 64
  private val DIM = 8

  /** Deterministic synthetic corpus: N vectors of DIM doubles. The
    * round-robin repartition deliberately discards Range's id-clustered
    * output partitioning — a parquet-scanned embedding table reports
    * UnknownPartitioning, and the rehearsal must measure THAT shape (with
    * the Range partitioning kept, the aggregate needs no exchange at all
    * and the witness would assert on an empty shuffle). */
  private def vectors: DataFrame =
    spark.range(N).repartition(7).select(col("id"),
      array((0 until DIM).map(j =>
        round(sin(col("id") * (j + 1)) + lit(j * 0.25), 6)): _*).as("emb"))

  /** Sum of shuffle records written across every exchange in the tree. */
  private def shuffleRecords(plan: SparkPlan): Long =
    plan.collect { case s: ShuffleExchangeLike =>
      s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }.sum

  test("kMeans assignment shuffles O(N) rows, not the N×k fan-out") {
    val assigned = Similarity.kMeans(vectors, "id", "emb", k = K, iters = 1)
    // collect() executes THIS queryExecution's plan (count() would build a
    // separate aggregate plan and leave these metrics untouched)
    assert(assigned.collect().length == N)
    val written = shuffleRecords(assigned.queryExecution.executedPlan)
    // Two exchanges carry rows: the deliberate round-robin repartition
    // (N rows) and the aggregation exchange, where partial aggregation
    // emits one row per id per input partition (ids are unique, so N).
    // The windowed form shuffled the full N×K = 1.28M exploded rows.
    assert(written < 3L * N,
      s"assignment shuffled $written records — expected O(N)=$N, " +
        s"the exploded fan-out would be ${N.toLong * K}")
    assert(written >= N, s"suspiciously few shuffle records: $written")
  }

  test("assignment plan carries a partial min_by/max_by before the exchange") {
    val plan = Similarity.kMeans(vectors, "id", "emb", k = K, iters = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min_by"),
      "expected a map-side partial min_by aggregate in:\n" + plan)
    assert(!plan.contains("row_number"),
      "assignment must not route through a window row_number")
  }

  test("ivfTopK corpus-side cell pick is aggregate-shaped, query side stays windowed") {
    val queries = vectors.filter(col("id") < 20)
    val out = Similarity.ivfTopK(queries, vectors, "id", "emb",
      k = 5, nList = 100, nProbe = 2)
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by"),
      "expected a map-side partial max_by for the corpus cell assignment")
    // the only row_number windows left are the query-side probe ranking
    // and the per-query top-k — both bounded by the query batch
    // (WindowGroupLimit pre-filter nodes are not Window operators)
    val windows = "Window \\[row_number".r.findAllIn(plan).size
    assert(windows <= 2, s"unexpected window fan-out ($windows) in:\n" + plan)
  }
}
