package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Scale rehearsal for the linear-sizing lever (VERDICT r12 #3): at the
  * ⌈√N⌉ default the IVF-style ops do Σ|cell|² ≈ N^1.5 in-cell pair work;
  * with `targetCellSize = C` fixed, nList = ⌈N/C⌉ must pin the cell
  * population — and therefore the per-task pair count — at a constant as
  * the corpus grows, so the total pair work scales LINEARLY.
  *
  * The witness compares a corpus and its 10× version under the same C:
  * max cell population stays in the same band (per-task boundedness) and
  * the summed pair work grows ~10×, nowhere near the 31.6× the √N rule
  * would produce.
  */
class CellCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val DIM = 8
  private val C = 100 // target cell population

  /** Deterministic synthetic corpus, same family as AssignmentShuffleSpec:
    * round-robin repartitioned so the quantizer sees the parquet-like
    * UnknownPartitioning shape. */
  private def vectors(n: Int): DataFrame =
    spark.range(n).repartition(7).select(col("id"),
      array((0 until DIM).map(j =>
        round(sin(col("id") * (j + 1)) + lit(j * 0.25), 6)): _*).as("emb"))

  /** (max cell population, Σ pop², distinct cells) of the semDedup cell
    * assignment — semDedup exposes the shared quantizer's cell column. */
  private def cellStats(n: Int): (Long, Long, Long) = {
    val pops = Similarity.semDedup(vectors(n), "id", "emb",
      threshold = 0.99, targetCellSize = C)
      .groupBy("cell").agg(count(lit(1)).as("pop"))
    val r = pops.agg(max(col("pop")), sum(col("pop") * col("pop")),
      count(lit(1))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("fixed targetCellSize bounds per-cell population across a 10× corpus") {
    val n1 = 6000
    val (max1, work1, cells1) = cellStats(n1)
    val (max10, work10, cells10) = cellStats(10 * n1)
    // nList tracks N/C: 10× the corpus ⇒ ~10× the cells
    assert(cells1 >= n1 / C / 2 && cells10 >= 10L * n1 / C / 2,
      s"cell counts $cells1/$cells10 — nList must scale with N/C")
    assert(cells10 > 5 * cells1, s"cells grew $cells1 → $cells10, expected ~10×")
    // per-task boundedness: the hottest cell must NOT grow with the corpus
    // (the √N rule's hottest cell grows ~√10 ≈ 3.2× here). The synthetic
    // assignment is skewed (not uniform), so the band is vs the SMALL
    // corpus's own max, not vs C.
    assert(max10 <= 3 * max1,
      s"hottest cell grew $max1 → $max10 under fixed targetCellSize=$C")
    // total pair work linear in N: ~10× (√N sizing would give ~31.6×)
    assert(work10 <= 20L * work1,
      s"pair work grew ${work1} → ${work10} (${work10.toDouble / work1}×) — " +
        "expected ~10× under linear sizing")
    assert(work10 >= 3L * work1, s"suspicious sublinear growth: $work1 → $work10")
  }

  test("knnGraph under targetCellSize stays correct and k-bounded") {
    val g = Similarity.knnGraph(vectors(3000), "id", "emb", k = 3,
      targetCellSize = C)
    val byId = g.groupBy("id").agg(count(lit(1)).as("n"),
      max(col("nbr_rank")).as("mr")).agg(
      max(col("n")), max(col("mr")), count(lit(1))).head()
    assert(byId.getLong(0) <= 3 && byId.getLong(1) <= 3)
    assert(byId.getLong(2) > 2000, "most vectors should emit neighbors")
    // self-edges never appear
    assert(g.filter(col("id") === col("nbr_id")).count() == 0)
  }

  test("explicit nList still wins over targetCellSize") {
    assert(Similarity.resolveNList(7, 100, sys.error("must not count")) == 7)
    assert(Similarity.resolveNList(0, 100, 10000L) == 100)
    assert(Similarity.resolveNList(0, 0, 10000L) == 100) // √N fallback
  }
}
