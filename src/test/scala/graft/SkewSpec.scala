package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Hot-key rehearsal for the cross-document n-gram stack (VERDICT r8 #3):
  * a corpus where ONE shingle appears in half of all documents — the
  * stopword-shingle profile of a real web corpus, and the shape that
  * breaks any per-shingle sort/window operator at 100 TB (one group =
  * half the corpus in a single task).
  *
  * dupNgramFraction is skew-immune by algebra (n_dup = n_shingles -
  * n_unique, unique shingles carry their sole doc id out of the same
  * aggregate), so the hot shingle only ever exists as map-side partial
  * counts — <= one row per input partition reaches the shuffle. The spec
  * pins both the answers on a hot corpus and the plan shape that makes
  * them scale.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** 2000 docs; even ids open with the SAME five words (one 5-gram in 50%
    * of the corpus) then five doc-unique words; odd ids are ten unique
    * words. Even: 6 shingles, exactly 1 duplicated. Odd: 6 unique. */
  private def hotCorpus = {
    import spark.implicits._
    (0 until 2000).map { i =>
      val uniq = (0 until 10).map(k => s"u${i}x$k")
      val words =
        if (i % 2 == 0) Seq("the", "quick", "brown", "fox", "jumps") ++ uniq.take(5)
        else uniq
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("dupNgramFraction: correct on a corpus with a 50%-hot shingle") {
    val out = Dedup.dupNgramFraction(hotCorpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out.size == 2000)
    (0 until 2000).foreach { i =>
      val (n, dup, frac) = out(i.toLong)
      assert(n == 6L, s"doc $i n_shingles")
      if (i % 2 == 0) {
        assert(dup == 1L, s"doc $i n_dup_shingles")
        assert(math.abs(frac - 1.0 / 6) < 1e-6, s"doc $i dup_frac")
      } else assert(dup == 0L && frac == 0.0, s"doc $i dup_frac")
    }
  }

  test("dupNgramFraction plan: partial aggregation, no per-shingle window") {
    val df = Dedup.dupNgramFraction(hotCorpus, "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    // The hot shingle must be collapsed map-side: a partial count on the
    // shingle key; no window PARTITIONED BY shingle (that would sort the
    // hot shingle's half-corpus group in one task — the doc-id window
    // inside shingleRows is bounded by document length and fine); no
    // join keyed on the skewed shingle column.
    assert(plan.contains("partial_count"), "map-side partial aggregation missing")
    val skewedWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.matches(".*\\], \\[shingle#.*"))
    assert(skewedWindows.isEmpty, "window partitioned by the (skewed) shingle")
    assert(!plan.contains("CartesianProduct"))
    val shingleJoins = ("SortMergeJoin \\[shingle".r.findAllIn(plan).size +
      "ShuffledHashJoin \\[shingle".r.findAllIn(plan).size)
    assert(shingleJoins == 0, "join keyed on the (skewed) shingle column")
    // The two consumers of the shingle set share the canonically-equal
    // up-front repartition exchange — after execution the adaptive plan
    // must show the reuse (one corpus read, not two).
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") ||
      finalPlan.contains("ReusedQueryStage") ||
      finalPlan.contains("ShuffleQueryStage") && {
        "ShuffleQueryStage \\d+".r.findAllIn(finalPlan).toSeq.distinct.size <
          "ShuffleQueryStage \\d+".r.findAllIn(finalPlan).size
      }, s"shared shingle exchange not reused:\n$finalPlan")
  }

  test("hot shingle collapses map-side: partial rows ~ distinct shingles") {
    // Runtime witness, read off the executed plan's metrics: the corpus
    // has 12000 shingle rows (2000 docs x 6) of which the hot shingle
    // contributes 1000; after map-side partial aggregation the shuffle
    // carries at most one row per (input partition, shingle) — the hot
    // key enters the exchange as <= numPartitions rows, not 1000.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    val sh = Dedup.shingleRows(hotCorpus, "doc_id", "text", 5)
    val counts = sh.groupBy(col("shingle")).agg(count(lit(1)).as("c"))
    counts.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => other
    }
    def collectAll(p: SparkPlan): Seq[SparkPlan] = {
      val u = unwrap(p)
      u +: u.children.flatMap(collectAll)
    }
    val partialOut = collectAll(counts.queryExecution.executedPlan).collectFirst {
      case h: BaseAggregateExec
          if h.aggregateExpressions.exists(_.mode == Partial) &&
            h.groupingExpressions.exists(_.name == "shingle") =>
        h.metrics("numOutputRows").value
    }.getOrElse(fail("no partial aggregate on shingle in the executed plan"))
    val distinctShingles = 11001L // 11000 doc-unique + 1 hot
    val maps = sh.rdd.getNumPartitions
    assert(partialOut >= distinctShingles, s"partial rows $partialOut")
    assert(partialOut <= distinctShingles + maps - 1,
      s"hot shingle not collapsed map-side: $partialOut partial rows " +
        s"from 12000 inputs across $maps partitions")
  }
}
