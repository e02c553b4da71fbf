package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Pipeline

/** Training-pipeline operators: TF-IDF, BM25, sequence packing, stratified
  * sampling, repetition stats, deterministic sharding. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def docs(rows: (Long, String, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("chunkDocuments: stride windows, flush tail, short-doc passthrough") {
    def ws(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, ws(3), "en", "a"),   // shorter than one chunk -> one whole chunk
      (2L, ws(4), "en", "a"),   // exactly chunkWords -> one chunk
      (3L, ws(9), "en", "a"),   // strided + tail flush with the end
      (4L, ws(8), "en", "a"),   // tail start (n-size=4) on the stride grid
      (5L, "", "en", "a"))      // empty -> no rows
    val got = Pipeline.chunkDocuments(d, "doc_id", "text",
      chunkWords = 4, strideWords = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 3L, "w1 w2 w3"),
      (2L, 0L, 4L, "w1 w2 w3 w4"),
      (3L, 0L, 4L, "w1 w2 w3 w4"), (3L, 2L, 4L, "w3 w4 w5 w6"),
      (3L, 4L, 4L, "w5 w6 w7 w8"), (3L, 5L, 4L, "w6 w7 w8 w9"),
      (4L, 0L, 4L, "w1 w2 w3 w4"), (4L, 2L, 4L, "w3 w4 w5 w6"),
      (4L, 4L, 4L, "w5 w6 w7 w8")))
    // every word of every doc is covered by at least one chunk
    assert(got.filter(_._1 == 3L).flatMap(t => t._2 until (t._2 + t._3))
      .toSet == (0L until 9L).toSet)
  }

  test("lengthBucketedBatches: pow2 buckets, capacity batches, exact padding") {
    def ws(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // capacity 64: bucket 16 holds 4 rows/batch, bucket 32 holds 2
    val d = docs((1L to 7L).map(i => (i, ws(if (i <= 5) 10 else 20), "en", "a")): _*)
    val got = Pipeline.lengthBucketedBatches(d, "doc_id", "text", "source",
      capacity = 64, shards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(5),
        r.getDouble(6))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 16L, 0L, 0.375), (2L, 16L, 0L, 0.375), (3L, 16L, 0L, 0.375),
      (4L, 16L, 0L, 0.375), (5L, 16L, 1L, 0.375), // 5th 16-row -> batch 1
      (6L, 32L, 0L, 0.375), (7L, 32L, 0L, 0.375)))
    // with sharding on, batches never mix shards and never exceed capacity
    val many = docs((1L to 200L).map(i => (i, ws(10), "en", "a")): _*)
    val sharded = Pipeline.lengthBucketedBatches(many, "doc_id", "text",
      "source", capacity = 64, shards = 4)
      .collect().map(r => (r.getLong(4), r.getLong(3), r.getLong(5)))
    assert(sharded.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    sharded.groupBy(identity).foreach { case ((_, bucket, _), rows) =>
      assert(rows.length <= 64 / bucket, "batch over capacity")
    }
  }

  test("tfIdfTopK ranks rare terms above common ones and breaks ties by word") {
    // 'rare' appears in 1 of 3 docs, 'the' in all 3: idf(rare) > idf(the).
    val d = docs(
      (1L, "the rare rare term", "en", "s"),
      (2L, "the common words here", "en", "s"),
      (3L, "the other words", "en", "s"))
    val out = Pipeline.tfIdfTopK(d, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rnk").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.head.getString(1) == "rare") // tf=2, highest idf
    assert(d1.map(_.getInt(4)).toSeq == Seq(1, 2))
    // Within doc 3, 'other' and 'words' both have tf=1 and df=2 -> equal
    // weight; tie resolves alphabetically.
    val d3 = out.filter(_.getLong(0) == 3L).map(_.getString(1)).toSeq
    assert(d3 == Seq("other", "words"))
  }

  test("bm25 scores docs containing query terms and drops zero-score docs") {
    val d = docs(
      (1L, "spark join spark", "en", "s"),
      (2L, "join vector", "en", "s"),
      (3L, "nothing relevant here", "en", "s"))
    val out = Pipeline.bm25(d, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("score"))).toMap
    assert(out.keySet == Set(1L, 2L))
    // Doc 1 hits both terms (spark twice); doc 2 only 'join' -> lower score.
    assert(out(1L) > out(2L))
  }

  test("packSequences lays docs end-to-end per stream and marks boundary spans") {
    // Stream s: 1000 + 1000 + 100 tokens with ctx 2048: doc 3 starts at
    // 2000, ends at 2099 -> spans the 2048 boundary.
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val d = docs(
      (1L, words(1000), "en", "s"),
      (2L, words(1000), "en", "s"),
      (3L, words(100), "en", "s"),
      (4L, words(10), "en", "t"))
    val out = Pipeline.packSequences(d, "doc_id", "text", "source", ctxLen = 2048L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("start_off")).toSeq == Seq(0L, 1000L, 2000L, 0L))
    assert(out.map(_.getAs[Long]("pack_id")).toSeq == Seq(0L, 0L, 0L, 0L))
    assert(out.map(_.getAs[Boolean]("spans_boundary")).toSeq ==
      Seq(false, false, true, false))
    assert(out(2).getAs[Long]("pack_off") == 2000L)
  }

  test("stratifiedSample is deterministic and honors per-stratum rates") {
    val d = docs((0L until 400L).map(i =>
      (i, "x", if (i % 2 == 0) "en" else "zz", "s")): _*)
    val sampled = Pipeline.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 500), defaultPermille = 0)
    val rows = sampled.collect()
    // Rate 0 strata vanish entirely; en docs keep only bucket < 500.
    assert(rows.forall(_.getString(1) == "en"))
    assert(rows.forall(_.getLong(2) < 500))
    // Partitioning must not change membership (pure hash filter).
    val again = Pipeline.stratifiedSample(d.repartition(7), "doc_id", "lang",
      Map("en" -> 500), defaultPermille = 0).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == again.map(_.getLong(0)).sorted.toSeq)
  }

  test("repetitionStats flags looped text and passes diverse text") {
    val d = docs(
      (1L, Seq.fill(30)("buy now").mkString(" "), "en", "s"), // one bigram dominates
      (2L, (1 to 40).map(i => s"w$i").mkString(" "), "en", "s"), // all distinct
      (3L, "single", "en", "s")) // no bigrams at all
    val out = Pipeline.repetitionStats(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("flagged"))
    assert(!out(2L).getAs[Boolean]("flagged"))
    assert(out(2L).getAs[Double]("dup_word_frac") == 0.0)
    assert(out(3L).getAs[Long]("n_bigrams") == 0L)
    assert(out(3L).getAs[Double]("top_bigram_frac") == 0.0)
  }

  test("decontaminate finds test docs sharing n-grams with the train split") {
    // Force the split with trainPermille boundaries: with permille 1000
    // everything is train -> no test rows; with 0 everything is test -> no
    // train rows. Either way the overlap join is empty.
    val base = docs(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s"),
      (2L, "alpha beta gamma delta epsilon eta", "en", "s"),
      (3L, "one two three four five six", "en", "s"))
    assert(Pipeline.decontaminate(base, "doc_id", "text", shingleN = 5,
      trainPermille = 1000).count() == 0)
    assert(Pipeline.decontaminate(base, "doc_id", "text", shingleN = 5,
      trainPermille = 0).count() == 0)
    // Deterministic split at 500: whichever side each doc lands on, docs
    // 1 and 2 share exactly one 5-gram ("alpha beta gamma delta epsilon")
    // and doc 3 shares none, so a contamination row exists iff 1 and 2
    // land on opposite sides, and it reports exactly one shared shingle.
    val out = Pipeline.decontaminate(base, "doc_id", "text", shingleN = 5,
      trainPermille = 500).collect()
    assert(out.length <= 1)
    out.foreach { r =>
      assert(Set(1L, 2L).contains(r.getLong(0)))
      assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    }
  }

  test("decontaminateBloom: pre-filtered result equals the plain join exactly") {
    // 40 docs with planted cross-split 5-gram overlaps plus unique tails
    val base = docs((0 until 40).map { i =>
      val shared = if (i % 3 == 0) "alpha beta gamma delta epsilon " else ""
      (i.toLong, s"${shared}w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f",
        "en", "s")
    }: _*)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val plain = canon(Pipeline.decontaminate(base, "doc_id", "text",
      shingleN = 5, trainPermille = 700))
    val bloom = Pipeline.decontaminateBloom(base, "doc_id", "text",
      shingleN = 5, trainPermille = 700)
    // the probe is actually in the plan (map-side, not optimized away)
    assert(bloom.queryExecution.executedPlan.toString
      .contains("graft_bloom_might_contain"))
    assert(canon(bloom) == plain)
    // false positives cannot leak rows: even a sieve-grade filter (50%
    // fpp) yields the identical result because the exact join re-checks
    val sieve = canon(Pipeline.decontaminateBloom(base, "doc_id", "text",
      shingleN = 5, trainPermille = 700, fpp = 0.5))
    assert(sieve == plain)
  }

  test("dedupBlocks keeps the first occurrence and rewrites clean text") {
    import graft.llm.Dedup
    // doc 1 and doc 2 share their FIRST 3-word block; doc 2 also repeats
    // doc 1's second block; doc 3 is unique. blockWords=3.
    val base = docs(
      (1L, "a b c d e f", "en", "s"),
      (2L, "a b c x y z", "en", "s"),
      (3L, "p q r", "en", "s"))
    val out = Dedup.dedupBlocks(base, "doc_id", "text", blockWords = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 0L, "a b c d e f")), s"doc1: ${out(1L)}")
    // doc 2 loses "a b c" (doc 1 owns it) but keeps its unique tail
    assert(out(2L) == ((2L, 1L, "x y z")), s"doc2: ${out(2L)}")
    assert(out(3L) == ((1L, 0L, "p q r")), s"doc3: ${out(3L)}")
  }

  test("bloom probe prunes disjoint keys at ~fpp while keeping every member") {
    import spark.implicits._
    graft.functions.BloomExpressions.register(spark)
    val members = (0 until 500).map(i => s"member $i")
    val filter = org.apache.spark.util.sketch.BloomFilter.create(500, 0.01)
    members.foreach(m => filter.putBinary(m.getBytes("UTF-8")))
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    val probe = (c: org.apache.spark.sql.Column) =>
      graft.functions.BloomExpressions.mightContain(c, lit(bos.toByteArray))
    // every put key probes true — no false negatives, ever
    assert(members.toDF("s").filter(probe(col("s"))).count() == 500)
    // disjoint keys survive at roughly the configured fpp (1% of 20k,
    // generous 5x headroom against hash unluck)
    val strangers = (0 until 20000).map(i => s"stranger $i").toDF("s")
    val leaked = strangers.filter(probe(col("s"))).count()
    assert(leaked < 1000, s"bloom leaked $leaked of 20000 disjoint keys")
  }

  test("heavyHitters: CMS prune + exact count equals the plain count") {
    import graft.llm.TextAnalysis
    // long-tail corpus: 2 planted heavy words (>= 30 each) over a tail
    // of 2000 words appearing exactly once
    val base = docs((0 until 100).map { i =>
      val tail = (0 until 20).map(j => s"tail${i}x$j").mkString(" ")
      val heavy = if (i < 40) "hot cold" else if (i < 70) "hot" else ""
      (i.toLong, s"$heavy $tail", "en", "s")
    }: _*)
    val out = TextAnalysis.heavyHitters(base, "text", minCount = 30L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("hot" -> 70L, "cold" -> 40L), s"got $out")
    // plain-count cross-check with a different threshold that excludes
    // 'cold' — the exact re-count applies the threshold, not the sketch
    val strict = TextAnalysis.heavyHitters(base, "text", minCount = 41L)
      .collect().map(_.getString(0)).toSet
    assert(strict == Set("hot"))
  }

  test("mixtureExpansion repeats sources toward target token weights") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    // Source a: 100 tokens total, weight 0.8 of a 1000-token budget ->
    // factor 8.0 exactly; source b: 100 tokens, weight 0.2 -> factor 2.0;
    // source c unlisted -> factor 0.
    val d = docs(
      (1L, words(60), "en", "a"), (2L, words(40), "en", "a"),
      (3L, words(100), "en", "b"), (4L, words(50), "en", "c"))
    val out = Pipeline.mixtureExpansion(d, "doc_id", "text", "source",
      Map("a" -> 0.8, "b" -> 0.2), tokenBudget = 1000L)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(r.fieldIndex("factor")), r.getLong(r.fieldIndex("n_copies")))).toMap
    // Integral factors have zero fractional part -> copies are exact.
    assert(out(1L) == (8.0, 8L) && out(2L) == (8.0, 8L))
    assert(out(3L) == (2.0, 2L))
    assert(out(4L) == (0.0, 0L))
    // Fractional factor: copies differ by at most 1 around the factor and
    // are deterministic under repartitioning.
    val frac = Pipeline.mixtureExpansion(d, "doc_id", "text", "source",
      Map("a" -> 0.25), tokenBudget = 1000L) // factor 2.5 on source a
    val c1 = frac.collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(Seq(1L, 2L).forall(id => c1(id) == 2L || c1(id) == 3L))
    val c2 = Pipeline.mixtureExpansion(d.repartition(5), "doc_id", "text",
      "source", Map("a" -> 0.25), 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(c1 == c2)
  }

  test("shardAssign gives every doc one shard and dense 1..n positions") {
    val d = docs((0L until 257L).map(i => (i, "x", "en", "s")): _*)
    val out = Pipeline.shardAssign(d, "doc_id", numShards = 16).collect()
    assert(out.length == 257)
    assert(out.map(_.getLong(1)).forall(s => s >= 0 && s < 16))
    out.groupBy(_.getLong(1)).values.foreach { shard =>
      assert(shard.map(_.getInt(2)).sorted.toSeq == (1 to shard.length).toSeq)
    }
    // Deterministic under re-partitioning.
    val again = Pipeline.shardAssign(d.repartition(5), "doc_id", 16).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq)
  }
}
