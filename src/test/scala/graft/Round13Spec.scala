package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Similarity}

/** Round-13 operators: cell-confined kNN graph + label-vote classify and
  * the soft-dedup (1/cluster_size) weighting policy. */
class Round13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** Vectors as array<float> with explicit ids and labels. */
  private def emb(rows: (Long, Seq[Double], Int)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "e", "label")
      .select(col("vec_id"), col("e").cast("array<float>").as("embedding"),
        col("label"))
  }

  test("knnGraph: single cell ranks exact cosine neighbors with id tie-break") {
    // One cell (nList=1) makes the graph exact. Unit-ish vectors on known
    // directions: 1↔2 nearly parallel, 3 orthogonal-ish, 4 opposite.
    val d = emb(
      (1L, Seq(1.0, 0.0), 0),
      (2L, Seq(0.9, 0.1), 0),
      (3L, Seq(0.0, 1.0), 1),
      (4L, Seq(-1.0, 0.05), 1))
    val got = Similarity.knnGraph(d, "vec_id", "embedding", k = 2, nList = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // vec 1: nearest 2 (cos~0.994), then 3 (0.0) beats 4 (-1.0)? cos(1,3)=0
    // > cos(1,4)<0 — so ranks are (2,3).
    assert(got.contains((1L, 1L, 2L)) && got.contains((1L, 2L, 3L)))
    // vec 3: cos(3,2)~0.110 > cos(3,4)~0.05 > cos(3,1)=0
    assert(got.contains((3L, 1L, 2L)) && got.contains((3L, 2L, 4L)))
    // every vector emits exactly k rows here (3 cell-mates >= k)
    assert(got.size == 8)
  }

  test("knnGraph: neighbors never cross cell boundaries") {
    // nList=2 → seeds are ids 1 and 2 on orthogonal axes; x-ish vectors
    // land in cell 1, y-ish in cell 2, and no pair crosses.
    val d = emb(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.0, 1.0), 0),
      (3L, Seq(0.9, 0.1), 0), (4L, Seq(0.8, 0.2), 0),
      (5L, Seq(0.1, 0.9), 1), (6L, Seq(0.2, 0.8), 1))
    val g = Similarity.knnGraph(d, "vec_id", "embedding", k = 5, nList = 2)
    val cellOf = Map(1L -> 1, 3L -> 1, 4L -> 1, 2L -> 2, 5L -> 2, 6L -> 2)
    g.collect().foreach { r =>
      assert(cellOf(r.getLong(0)) == cellOf(r.getLong(2)),
        s"cross-cell edge ${r.getLong(0)} -> ${r.getLong(2)}")
    }
  }

  test("knnClassify: majority vote, ties to the lower label") {
    // One cell; vec 1's two neighbors carry labels 7 and 3 with one vote
    // each → tie breaks to 3.
    val d = emb(
      (1L, Seq(1.0, 0.0), 9),
      (2L, Seq(0.9, 0.1), 7),
      (3L, Seq(0.8, 0.2), 3))
    val got = Similarity.knnClassify(d, "vec_id", "embedding", "label",
      k = 2, nList = 1).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4))).toMap
    assert(got(1L) == ((9, 3, 1L, false)))
    // vec 2's neighbors are 1 (label 9) and 3 (label 3) → tie → 3, agree=false
    assert(got(2L) == ((7, 3, 1L, false)))
    // vec 3's neighbors are 2 (7) and 1 (9) → tie → 7
    assert(got(3L) == ((3, 7, 1L, false)))
  }

  test("tokenBudget: epochs = budget*weight/tokens, cap flag at 4 epochs") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "a b c d", "big"), (2L, "e f g h", "big"), // 8 tokens
      (3L, "x y", "tiny"), // 2 tokens
      (4L, "p q r", "unweighted")) // weight 0
      .toDF("doc_id", "text", "source")
    val got = graft.llm.Pipeline.tokenBudget(d, "source", "text",
      budgetTokens = 100L, weights = Map("big" -> 0.5, "tiny" -> 0.5))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4), r.getBoolean(5))).toMap
    assert(got("big") == ((8L, 0.5, 6.25, true)))
    assert(got("tiny") == ((2L, 0.5, 25.0, true)))
    assert(got("unweighted") == ((3L, 0.0, 0.0, false)))
  }

  test("matryoshkaRecall: prefix cosine can disagree with full cosine") {
    // Query q=(1,0,0,0). Candidate 2 matches on the prefix dims but is
    // pulled away by the tail; candidate 3 is a weaker prefix match with
    // no tail mass. With subDim=2: top1_sub=2; full cosine ranks 3 first.
    val d = emb(
      (1L, Seq(1.0, 0.0, 0.0, 0.0), 0),
      (2L, Seq(1.0, 0.0, 8.0, 0.0), 0),
      (3L, Seq(0.9, 0.2, 0.0, 0.0), 0))
    val got = Similarity.matryoshkaRecall(d.filter(col("vec_id") === 1), d,
      "vec_id", "embedding", subDim = 2).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L && !r.getBoolean(3))
  }

  test("rrfFuse: reciprocal ranks fuse, absent list contributes zero") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0)).toDF("id", "sa")
    val b = Seq((2L, 5.0), (4L, 4.0)).toDF("id", "sb")
    val got = graft.llm.Pipeline.rrfFuse(a, b, "id", "sa", "sb",
      topN = 2, kRrf = 60)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // topN=2 cuts id 3 from list a entirely
    assert(!got.contains(3L))
    assert(got(1L) == ((1L, 0L, math.rint(1e6 / 61.0) / 1e6)))
    val both = math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6
    assert(got(2L) == ((2L, 1L, both)))
    assert(got(4L) == ((0L, 2L, math.rint(1e6 / 62.0) / 1e6)))
  }

  test("lshAudit: candidate and verified counts with exact precision") {
    val s = spark
    import s.implicits._
    // 1 and 2 are exact dups (jaccard 1); 3 shares enough shingles to be
    // a candidate in some band but fails the 0.9 threshold.
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta other words entirely"))
      .toDF("doc_id", "text")
    val r = graft.llm.Dedup.lshAudit(d, "doc_id", "text", threshold = 0.9)
      .collect().head
    val (nc, nv, p) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nc >= 1 && nv >= 1 && nv <= nc)
    assert(p == math.rint(nv.toDouble / nc * 1e6) / 1e6)
    // the exact-dup pair must verify at any threshold <= 1
    assert(nv >= 1)
  }

  test("Bpe: learnMerges ranks (count desc, pair asc); encode folds greedily") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "aaab aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val merges = graft.llm.Bpe.learnMerges(d, "text", numMerges = 5)
    // word 'aaab' x3: (a,a)=6 wins rank 1; then (a,b)=3 ties (aa,a)=3 and
    // the lower LEFT symbol wins; then (aa,ab)=3; then no pairs remain.
    assert(merges.map(m => (m.left, m.right, m.pairCnt)) ==
      Seq(("a", "a", 6L), ("a", "b", 3L), ("aa", "ab", 3L)))
    val enc = graft.llm.Bpe.encode(d, "doc_id", "text",
      merges.map(m => (m.left, m.right)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(enc(1L) == ((2L, 2L, "aaab|aaab")))
    assert(enc(2L) == ((1L, 1L, "aaab")))
  }

  test("round-13 ops return empty results on empty inputs (no crash)") {
    val s = spark
    import s.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noEmb = emb()
    assert(graft.llm.Dedup.softDedupWeights(noDocs, "doc_id", "text").count() == 0)
    assert(graft.llm.Dedup.lshAudit(noDocs, "doc_id", "text").count() == 1) // one all-zero row
    assert(Similarity.knnGraph(noEmb, "vec_id", "embedding", k = 3, nList = 1).count() == 0)
    assert(Similarity.matryoshkaRecall(noEmb, noEmb, "vec_id", "embedding", 2).count() == 0)
    assert(graft.llm.Bpe.learnMerges(noDocs, "text", numMerges = 3).isEmpty)
    assert(graft.llm.Bpe.encode(noDocs, "doc_id", "text", Seq("a" -> "b")).count() == 0)
    assert(graft.llm.Pipeline.tokenBudget(noDocs, "text", "text", 100L,
      Map.empty).count() == 0)
    val noScores = Seq.empty[(Long, Double)].toDF("id", "sc")
    assert(graft.llm.Pipeline.rrfFuse(noScores, noScores, "id", "sc", "sc").count() == 0)
  }

  test("epochShuffle: each epoch is a full permutation, positions contiguous") {
    val s = spark
    import s.implicits._
    val docs = (0 until 40).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val out = graft.llm.Pipeline.epochShuffle(docs, "doc_id",
      epochs = 2, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc appears exactly once per epoch
    (0L to 1L).foreach { e =>
      val rows = out.filter(_._2 == e)
      assert(rows.map(_._1).sorted.sameElements(0L until 40L))
      // positions are 1..n contiguous within each (epoch, shard)
      rows.groupBy(_._3).foreach { case (_, g) =>
        assert(g.map(_._4).sorted.sameElements(1L to g.length))
      }
    }
    // epochs produce different orders (overwhelmingly likely with md5)
    val o0 = out.filter(_._2 == 0).sortBy(r => (r._3, r._4)).map(_._1).toSeq
    val o1 = out.filter(_._2 == 1).sortBy(r => (r._3, r._4)).map(_._1).toSeq
    assert(o0 != o1, "epoch orders identical — salt not applied")
  }

  test("softDedupWeights: 1/cluster_size, singletons keep weight 1") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((1L, 2L, 0.5)))
    assert(got(2L) == ((1L, 2L, 0.5)))
    assert(got(3L) == ((3L, 1L, 1.0)))
  }

  test("corpusDiff: statuses, side-aware sources, char volumes") {
    val s = spark
    import s.implicits._
    val old = Seq(
      (1L, "srcA", "kept the same"),      // unchanged
      (2L, "srcA", "will be edited"),     // changed
      (3L, "srcB", "will be dropped"))    // removed
      .toDF("doc_id", "source", "text")
    val neu = Seq(
      (1L, "srcA", "kept the same"),
      (2L, "srcA", "was edited here"),
      (4L, "srcB", "newly crawled"))      // added
      .toDF("doc_id", "source", "text")
    val got = graft.llm.Pipeline
      .corpusDiff(old, neu, "doc_id", "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("srcA", "unchanged")) == ((1L, 13L, 13L)))
    assert(got(("srcA", "changed")) == ((1L, 14L, 15L)))
    // removed: chars only on the old side; added: only on the new side
    assert(got(("srcB", "removed")) == ((1L, 15L, 0L)))
    assert(got(("srcB", "added")) == ((1L, 0L, 13L)))
    assert(got.size == 4)
  }

  test("Profile: one row per column; nulls/cardinality/range/mean; 1 scan") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, Some(2.0), Some("a")),
      (2L, None, Some("c")),
      (3L, Some(4.0), None),
      (3L, Some(6.0), Some("a")))
      .toDF("k", "v", "s")
    val df = graft.ops.Profile.profile(d)
    val got = df.collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == 3)
    val k = got("k")
    assert(k.getString(1) == "int" && k.getLong(2) == 4L &&
      k.getLong(3) == 0L && k.getLong(4) == 3L)
    assert(k.getDouble(5) == 1.0 && k.getDouble(6) == 3.0 &&
      k.getDouble(7) == 2.25)
    val v = got("v")
    assert(v.getString(1) == "double" && v.getLong(3) == 1L &&
      v.getLong(4) == 3L && v.getDouble(7) == 4.0) // mean over non-nulls
    val st = got("s")
    assert(st.getString(1) == "string" && st.getLong(3) == 1L &&
      st.getLong(4) == 2L && st.getString(8) == "a" && st.getString(9) == "c")
    assert(st.isNullAt(5) && st.isNullAt(7))
    // the whole profile is ONE pass: a single scan feeds one aggregate
    // (AQE's toString appends the initial plan — inspect the final only)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Scan ExistingRDD|LocalTableScan".r.findAllIn(plan).size <= 1,
      "profiler must not re-scan per column")
  }

  test("q206 seq patterns: regex semantics on session strings (rlike = find)") {
    // q206's session/ordering machinery is q141's (oracle-verified);
    // what needs pinning here is the pattern semantics on the '>'-joined
    // strings — including the token-boundary cases ("review" must not
    // match "view", "purchase>view" must not match view-then-purchase).
    val cases = Seq(
      ("(^|>)view>(.*>)?purchase(>|$)", "view>click>purchase", true),
      ("(^|>)view>(.*>)?purchase(>|$)", "view>purchase", true),
      ("(^|>)view>(.*>)?purchase(>|$)", "click>view>purchase>error", true),
      ("(^|>)view>(.*>)?purchase(>|$)", "purchase>view", false),
      ("(^|>)view>(.*>)?purchase(>|$)", "review>purchase", false),
      ("(^|>)view>(.*>)?purchase(>|$)", "view>error", false),
      ("(^|>)error$", "view>error", true),
      ("(^|>)error$", "error", true),
      ("(^|>)error$", "error>view", false),
      ("^signup(>|$)", "signup>view", true),
      ("^signup(>|$)", "signup", true),
      ("^signup(>|$)", "view>signup", false))
    cases.foreach { case (re, str, want) =>
      val got = java.util.regex.Pattern.compile(re).matcher(str).find()
      assert(got == want, s"'$str' vs '$re': got $got")
    }
  }

  test("labelSeparation: tight orthogonal classes -> diag 1, off-diag 0") {
    val d = emb(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(1.0, 0.0), 0),
      (3L, Seq(0.0, 1.0), 1), (4L, Seq(0.0, 1.0), 1))
    val got = graft.llm.EmbeddingOps
      .labelSeparation(d, "vec_id", "embedding", "label", dim = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(got.size == 4)
    val diag0 = got((0L, 0L))
    assert(diag0.getDouble(2) == 1.0 && diag0.getLong(3) == 2L &&
      diag0.getDouble(4) == 1.0) // identical members: intra cos 1
    assert(got((0L, 1L)).getDouble(2) == 0.0) // orthogonal centroids
    assert(got((0L, 1L)).isNullAt(3) && got((0L, 1L)).isNullAt(4))
  }

  test("boilerplateGrams: top template prefix/suffix with shares") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "sA", "SUBSCRIBE NOW!! article one body ends here ok"),
      (2L, "sA", "subscribe now!! article two body closes thus x"),
      (3L, "sA", "an organic piece without any template at all."),
      (4L, "sB", "short but long enough text entirely unique z"))
      .toDF("doc_id", "source", "text")
    val got = graft.llm.TextAnalysis
      .boilerplateGrams(d, "doc_id", "text", "source", gramLen = 16, topK = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getString(3), r.getLong(4), r.getDouble(5))).toMap
    // the lowercased shared 16-char prefix dominates sA: 2 of 3 docs
    assert(got(("sA", "prefix", 1L)) == (("subscribe now!! ", 2L, 0.666667)))
    // suffixes all differ -> every sA suffix has count 1
    assert(got(("sA", "suffix", 1L))._2 == 1L)
    // singleton source: its one prefix has share 1.0
    assert(got(("sB", "prefix", 1L))._2 == 1L &&
      got(("sB", "prefix", 1L))._3 == 1.0)
  }

  test("winnowing: shared >=k+w-1 substring guarantees a match; rightmost ties") {
    val s = spark
    import s.implicits._
    // k=8, w=4 -> any shared substring of length >= 11 must produce at
    // least one shared fingerprint (the winnowing guarantee).
    val common = "the quick brown fox jumps over it"
    val d = Seq(
      (1L, s"PREFIX ONE ... $common ... SUFFIX ALPHA"),
      (2L, s"totally other beginning $common different end"),
      (3L, "no overlap with anything else at all here"))
      .toDF("doc_id", "text")
    val pairs = graft.llm.Dedup
      .winnowingPairs(d, "doc_id", "text", k = 8, w = 4, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 1L,
      "guaranteed shared fingerprint missing")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // All-equal gram hashes ("aaaa...") -> every window's min is its
    // RIGHTMOST gram; selected positions are exactly w-1 .. m-1.
    val mono = Seq((9L, "a" * 15)).toDF("doc_id", "text") // m = 8 grams
    val fps = graft.llm.Dedup
      .winnowingFingerprints(mono, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => r.getLong(2))
    assert(fps.sorted.sameElements(3L to 7L), s"got ${fps.toSeq.sorted}")
  }

  test("heapsFit: totals exact; beta ~1 for linear growth, low for flat vocab") {
    val s = spark
    import s.implicits._
    // 16 docs, 4 tokens each, every word globally unique -> V(n) = n,
    // so the log-log slope is exactly 1 wherever >=2 curve points exist.
    val lin = (0L until 16L)
      .map(i => (i, (0 until 4).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val lf = graft.llm.TextAnalysis.heapsFit(lin, "doc_id", "text",
      numBuckets = 8).collect().head
    assert(lf.getLong(1) == 64L && lf.getLong(2) == 64L) // tokens, types
    assert(math.abs(lf.getDouble(3) - 1.0) < 1e-6, s"beta=${lf.getDouble(3)}")
    // Same shape but a single shared 4-word vocabulary -> types flat at 4
    // after the first epoch: beta must collapse toward 0.
    val flat = (0L until 16L)
      .map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val ff = graft.llm.TextAnalysis.heapsFit(flat, "doc_id", "text",
      numBuckets = 8).collect().head
    assert(ff.getLong(1) == 64L && ff.getLong(2) == 4L)
    assert(ff.getDouble(3) < 0.05, s"beta=${ff.getDouble(3)}")
  }
}
