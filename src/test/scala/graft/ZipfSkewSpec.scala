package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup
import graft.tools.ZipfData

/** Skew-resilience on ACTUALLY-skewed data (round-16 verdict #2): the
  * sf0.1 AQE audit reads "zero skew splits" because the synthetic keys
  * are near-uniform — that proves the plans did not NEED splitting
  * there, not that the engine survives a hot key at 100×. This spec
  * generates seeded Zipf-keyed inputs ([[graft.tools.ZipfData]]) and
  * proves BOTH halves of the story:
  *
  *  - AQE skew splits FIRE where they should: a sort-merge equi-join on
  *    a Zipf(2) key (the banded-candidate-join shape) finalizes with
  *    `skew=true` partitions under production-shaped thresholds, and
  *    the split join's result is EXACTLY the unsplit cross-count.
  *  - The operators' own skew defenses hold where AQE never sees a
  *    join: exact-dedup and PageRank-style contribution aggregates
  *    collapse the hot group MAP-SIDE (partial-agg row metric ≈
  *    distinct keys, not input rows), and the df-guarded pair join's
  *    Σdf² bound confines the hot gram to ZERO pair fan-out.
  */
class ZipfSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("AQE splits the Zipf-hot equi-join and preserves the exact result") {
    // Own session: skew thresholds scaled down to spec-sized data the
    // same way a 100 TB deployment scales them up to executor memory.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    // Zipf(2): the head key carries ~50% of the LEFT side — one shuffle
    // partition holds half of it, the skew the banded minhash candidate
    // join sees when one band key is boilerplate-hot. The right side is
    // uniform (s = 0: ~10 rows/key) so the OUTPUT stays ~4M rows while
    // the input partition skew is ~8× median.
    val a = ZipfData.zipfKeys(s2, 400000L, vocab = 1023, s = 2.0, seed = 17L)
      .withColumnRenamed("id", "id_a")
    val b = ZipfData.zipfKeys(s2, 10000L, vocab = 1023, s = 0.0, seed = 23L)
      .withColumnRenamed("id", "id_b")
    val joined = a.join(b, Seq("key"))
    // materialize THIS DataFrame's own adaptive execution (count()
    // would plan a separate query and leave this one un-finalized)
    val got = joined.queryExecution.toRdd.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert("skew=true".r.findAllIn(plan).nonEmpty,
      s"no AQE skew split fired on the Zipf-hot join:\n$plan")
    // exact correctness under the split: Σ_k count_a(k)·count_b(k)
    val ca = a.groupBy("key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cb = b.groupBy("key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ca.iterator.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    assert(got == want, s"skew-split join returned $got, want $want")
    // and the hot key really was the head: ~50% of the left side
    assert(ca(1L) > 150000L, s"head key share too small: ${ca(1L)}")
  }

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.catalyst.expressions.aggregate.Partial

  /** numOutputRows of the partial aggregate grouping on `groupKey`. */
  private def partialRows(df: org.apache.spark.sql.DataFrame,
      groupKey: String): Long = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => other
    }
    def collectAll(p: SparkPlan): Seq[SparkPlan] = {
      val u = unwrap(p)
      u +: u.children.flatMap(collectAll)
    }
    collectAll(df.queryExecution.executedPlan).collectFirst {
      case h: BaseAggregateExec
          if h.aggregateExpressions.exists(_.mode == Partial) &&
            h.groupingExpressions.exists(g => g.name.startsWith(groupKey) ||
              // a grouping EXPRESSION (e.g. md5(text)) is pre-projected
              // under a generated name at the partial stage
              g.name.startsWith("_groupingexpression")) =>
        h.metrics("numOutputRows").value
    }.getOrElse(fail(s"no partial aggregate on $groupKey in the plan"))
  }

  test("exact-dedup on a Zipf-duplicated corpus: the hot cluster " +
      "collapses map-side and the cluster census is exact") {
    // Zipf(2), vocab 255: the head TEXT duplicates across ~50% of docs.
    val docs = ZipfData.zipfDocs(spark, 20000L, vocab = 255, s = 2.0)
      .localCheckpoint() // pin: the assertion recomputes the key census
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    groups.collect()
    // map-side collapse: the exchange carries ≤ one row per (input
    // partition, text), never the hot cluster's ~10k member rows
    val distinctTexts = docs.select("text").distinct().count()
    val maps = docs.rdd.getNumPartitions
    val partial = partialRows(groups, "text_hash")
    assert(partial <= distinctTexts * maps,
      s"hot cluster not collapsed map-side: $partial partial rows")
    // census exactness: cluster sizes == key populations, keep = min id
    val keyCounts = docs.groupBy("text").agg(
      count(lit(1)).as("n"), min(col("doc_id")).as("keep")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = groups.join(docs.select(col("text"),
        md5(col("text").cast("binary")).as("text_hash")).distinct(),
        Seq("text_hash"))
      .collect().map(r => r.getAs[String]("text") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("keep_id")))).toMap
    assert(got == keyCounts)
    assert(keyCounts.values.map(_._1).max > 8000L, "head cluster too small")
  }

  test("df-guarded substring pair join on a Zipf corpus: the hot gram " +
      "contributes ZERO pairs and the fan-out is exactly Σ C(df,2) " +
      "over rare grams") {
    // Zipf(1), vocab 1023, 2000 docs: head key ~200 docs (gram df ~200,
    // guarded out); tail keys have df in [2, 8] (pair-eligible).
    val docs = ZipfData.zipfDocs(spark, 2000L, vocab = 1023, s = 1.0)
      .localCheckpoint()
    val pairs = Dedup.substrDocPairs(docs, "doc_id", "text",
      gramN = 8, dfMax = 8, minShared = 1).collect()
    // every doc is exactly one 8-gram window whose df = its key's
    // population, so the expected pair count is exact and tiny
    val dfCensus = docs.groupBy("text").count().collect().map(_.getLong(1))
    val want = dfCensus.filter(c => c >= 2 && c <= 8)
      .map(c => c * (c - 1) / 2).sum
    assert(pairs.length.toLong == want,
      s"pair fan-out ${pairs.length}, want $want")
    assert(dfCensus.max > 100L, "head gram not hot — generator broken?")
    // paired docs always share their key text, and that text's df is
    // within the guard — the hot gram never reaches the pair join
    val textOf = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dfOf = textOf.values.groupBy(identity).view.mapValues(_.size).toMap
    pairs.foreach { r =>
      val (ta, tb) = (textOf(r.getLong(0)), textOf(r.getLong(1)))
      assert(ta == tb)
      assert(dfOf(ta) <= 8, s"pair from a gram with df ${dfOf(ta)}")
    }
  }

  test("PageRank-style contribution aggregate on Zipf in-degrees: the " +
      "hub collapses map-side") {
    // Zipf(2), vocab 63: the hub node receives ~50% of all edges.
    val edges = ZipfData.zipfEdges(spark, 100000L, vocab = 63, s = 2.0)
      .localCheckpoint()
    val contrib = edges.withColumn("c", lit(1.0) / 63)
      .groupBy("dst").agg(sum(col("c")).as("rank_contrib"))
    contrib.collect()
    val partial = partialRows(contrib, "dst")
    val maps = edges.rdd.getNumPartitions
    assert(partial <= 63L * maps,
      s"hub in-edges not combined map-side: $partial partial rows " +
        s"from 100k edges")
    // the hub is really hot
    val hub = edges.groupBy("dst").count().orderBy(desc("count"))
      .head.getLong(1)
    assert(hub > 40000L, s"hub share too small: $hub")
  }
}
