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

  /** 480 docs; ids ≡ 0 (mod 3) all share ONE text (160 docs = 33% of the
    * corpus with identical minhash signatures, so every band key of that
    * text is hot in every band — the near-duplicate-saturated profile);
    * the rest are doc-unique ten-word texts. */
  private def hotBandCorpus = {
    import spark.implicits._
    (0 until 480).map { i =>
      val text =
        if (i % 3 == 0) "the cat sat on the mat and then it slept"
        else (0 until 10).map(k => s"w${i}x$k").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("knnGraph hot cell: salting splits the hot cell, same answer") {
    // A collapsed embedding space: every vector identical → all N land in
    // the lowest-id centroid's cell, so the unsalted cell self-join is
    // one N² task. Salting must keep the graph EXACTLY (ranking ties
    // break on nbr_id, unaffected by salt) while joining on the salt key.
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions.col
    val N = 120
    val vecs = (0 until N).map(i => (i.toLong, Seq(0.6, 0.8, 0.0, 0.0)))
      .toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<float>").as("embedding"))
    val S = 8
    val unsalted = graft.llm.Similarity.knnGraph(vecs, "vec_id",
      "embedding", k = 3)
    val salted = graft.llm.Similarity.knnGraph(vecs, "vec_id",
      "embedding", k = 3, saltCells = S)
    val u = unsalted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sl = salted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(u == sl, "salting changed the kNN graph")
    assert(u.size == N * 3, s"expected $N x 3 edges, got ${u.size}")
    // cosine ties (identical vectors) break on nbr_id: vec 5's neighbors
    // are 0, 1, 2 in rank order
    assert(u.contains((5L, 1L, 0L)) && u.contains((5L, 2L, 1L)) &&
      u.contains((5L, 3L, 2L)))
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"),
      "salted join key missing from the plan")
  }

  test("minhashPairs hot band: salting splits the hot key, same answer") {
    // On a saturated corpus, one band value covers 160 docs: the unsalted
    // band self-join probes all 160x160 pairs of that key in ONE task.
    // The salted plan must (a) keep the answer EXACTLY, (b) bound every
    // join task's probe-side group to ~|hot|/S, witnessed from the salted
    // side's group sizes, and (c) actually join on the salt key.
    val S = 8
    val unsalted = Dedup.minhashPairs(hotBandCorpus, "doc_id", "text",
      threshold = 0.3)
    val salted = Dedup.minhashPairs(hotBandCorpus, "doc_id", "text",
      threshold = 0.3, saltBands = S)

    // (a) identical pair set (the hot clique: 160 choose 2 = 12720 pairs)
    val u = unsalted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sPairs = salted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(u == sPairs, s"salting changed the candidate/verified set: " +
      s"${(u -- sPairs).take(3)} / ${(sPairs -- u).take(3)}")
    assert(u.size == 160 * 159 / 2, s"expected the hot clique, got ${u.size}")

    // (c) the candidate stage's executed join is keyed on the salt.
    // (verifyJaccard checkpoints the candidate table, so the salted band
    // join is not in the OUTPUT's lineage — witness the candidate builder
    // minhashPairs itself uses.)
    val bands = Dedup.bandRows(hotBandCorpus, "doc_id", "text",
      shingleN = 3, numHashes = 8, numBands = 4)
    val candPlan = Dedup.bandSelfCandidates(bands, "doc_id", saltBands = S)
      .queryExecution.executedPlan.toString
    assert(candPlan.contains("__salt"), "salted join key missing from the plan")

    // (b) per-(band, key, salt) probe groups are bounded by ~hot/S: the
    // same witness style as the batching operator's salted shards — the
    // biggest sort group the join can see shrinks from 160 to ~20.
    import org.apache.spark.sql.functions._
    val sigs = Dedup.minhashSignatures(hotBandCorpus, "doc_id", "text",
      shingleN = 3, numHashes = 8)
    val groups = sigs
      .withColumn("band_keys",
        graft.llm.TextOps.bandKeys(col("mh"), 4, 2))
      .select(col("doc_id"), posexplode(col("band_keys"))
        .as(Seq("band_idx", "band_key")))
      .withColumn("__salt", pmod(hash(col("doc_id")), lit(S)))
      .groupBy("band_idx", "band_key", "__salt")
      .agg(count(lit(1)).as("n"))
      .collect()
    val maxGroup = groups.map(_.getAs[Long]("n")).max
    // hash-salt balance: worst salt of the 160-doc hot key stays within
    // 3x the ideal 20 (a fixed corpus and fixed hash make this exact and
    // deterministic, not flaky)
    assert(maxGroup <= 3L * (160 / S),
      s"hot band not split: max per-salt group $maxGroup")
  }

  test("saturated corpus: candidate confinement is size-gated, both paths exact") {
    // Round-10 verdict #4's done-criterion, hardened in r13: the
    // verify/containment semi-join prune broadcasts the candidate-id set
    // ONLY when a count of the materialized table clears the
    // graft.dedup.broadcastIdsMax gate (default 4M) — a saturated corpus
    // whose candidates approach N falls back to the shuffle semi-join and
    // never pins an O(N) driver broadcast. Witness both paths on a corpus
    // where EVERY document is a near-duplicate: force the gate below the
    // 160-doc clique's id count (fallback path), then the default gate
    // (broadcast path), and require the exact same exact answer.
    def run(): (Long, Long) = {
      val verified = Dedup.minhashPairs(hotBandCorpus, "doc_id", "text",
        threshold = 0.3)
      val contained = Dedup.containmentPairs(hotBandCorpus, "doc_id", "text",
        shingleN = 3, maxDf = 200, threshold = 0.9, prefixK = 5)
      (verified.count(), contained.count())
    }
    // the 160-doc identical clique: every pair is jaccard 1 >= 0.3 and
    // containment 1 >= 0.9; maxDf=200 admits the hot shingles (df=160)
    val expect = 160L * 159 / 2
    spark.conf.set("graft.dedup.broadcastIdsMax", "8")
    try assert(run() == ((expect, expect)), "shuffle-semi-join fallback path")
    finally spark.conf.unset("graft.dedup.broadcastIdsMax")
    assert(run() == ((expect, expect)), "gated-broadcast path")
  }

  test("winnowing hot fingerprint: df guard caps candidate fan-out") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 120 docs opening with the SAME 40-char template (boilerplate) then
    // unique tails: the template's fingerprints have df = 120 and would
    // contribute ~120²/2 pairs each. maxDf = 10 must drop them — every
    // surviving pair comes from hashes shared by <= 10 docs, bounding
    // candidate volume at Σ df² over rare hashes regardless of how hot
    // the template is.
    val template = "subscribe now and never miss an update "  // 39 chars
    val docs = (0 until 120).map { i =>
      (i.toLong, template + s"unique tail number $i with extra words x$i")
    }.toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs, "doc_id", "text", k = 8, w = 4)
      .select(col("doc_id"), col("h")).distinct()
    val hotHashes = fps.groupBy("h").count().filter(col("count") > 10)
    assert(hotHashes.count() > 0, "rehearsal corpus must produce hot hashes")
    val pairs = Dedup.winnowingPairs(docs, "doc_id", "text",
      k = 8, w = 4, maxDf = 10)
    // every template-only pair is excluded: surviving overlaps can only
    // come from rare (tail) hashes, so the pair count is bounded by the
    // rare-hash Σ df·(df−1)/2 — if the hot template leaked, pairs would
    // include all 120·119/2 template pairs and blow far past this bound
    val rare = fps.join(hotHashes.select("h"), Seq("h"), "left_anti")
    val upper = Option(rare.groupBy("h").count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .collect().head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val nPairs = pairs.count()
    assert(nPairs <= upper,
      s"$nPairs pairs exceed the rare-hash candidate bound $upper — hot hashes leaked")
    assert(nPairs < 120L * 119 / 2, "template pairs were not excluded")
  }
}
