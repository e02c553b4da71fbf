package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Dedup, EmbeddingOps, Multimodal, Pipeline, Similarity, TextAnalysis, TextOps, VectorOps}

/** Training-data-pipeline operator suite over `documents` / `embeddings`:
  * dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search
  * (brute-force + LSH-bucketed ANN), and text analysis (lang-ID, quality,
  * tokens, fingerprints). Every query has a value-exact DuckDB oracle.
  */
object LlmQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")),

    "q21_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text",
          shingleN = 3, numHashes = 8)
        .select(col("doc_id"), concat_ws(",", col("mh")).as("sig"))),

    "q22_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.0)),

    // Incremental dedup: the upper-id half of the corpus arrives as the
    // "new batch" and dedups against the lower-id half as the persisted
    // index — band join is new x index, never a corpus self-join.
    "q119_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val k = docs.count() / 2
      Dedup.minhashPairsIncremental(
        docs.filter(col("doc_id") >= k), docs.filter(col("doc_id") < k),
        "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4)
    }),

    // Chunk-level keep-first dedup with cleaned-text rewrite: disjoint
    // 10-word blocks, first occurrence corpus-wide survives.
    "q120_block_dedup" -> ((s, dir) =>
      Dedup.dedupBlocks(Tables.documents(s, dir), "doc_id", "text",
        blockWords = 10)),

    "q23_simhash" -> ((s, dir) =>
      Dedup.simhashFingerprints(Tables.documents(s, dir), "doc_id", "text")),

    "q24_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        numBands = 4, maxHamming = 10)),

    "q25_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        blockCol = "source", n = 2, threshold = 0.05)),

    "q26_langid" -> ((s, dir) =>
      TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text")),

    "q27_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.documents(s, dir), "doc_id", "text")),

    "q28_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.documents(s, dir), "doc_id", "text")),

    "q29_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")),

    "q30_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 5)
    }),

    "q31_ann_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 3)
    }),

    "q61_embed_dup" -> ((s, dir) =>
      Similarity.embeddingDupPairs(
        Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.3)),

    // Label-noise detection by neighbor agreement (the Cleanlab-style
    // corpus-QA signal): the near-dup pair set joined to labels on both
    // sides, rolled up into a neighbor-label co-occurrence matrix. An
    // off-diagonal cell with high mass = two labels whose examples are
    // near-duplicates of each other — mislabeled or leaky classes.
    // sum_cos routes through the exact DECIMAL cast (core.Det rule) so
    // the aggregate is reduction-order independent.
    "q106_label_agreement" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pairs = Similarity.embeddingDupPairs(
        emb, "vec_id", "embedding", threshold = 0.3)
      val lab = emb.select(col("vec_id"), col("label"))
      pairs
        .join(lab.select(col("vec_id").as("id_a"), col("label").as("label_a")), "id_a")
        .join(lab.select(col("vec_id").as("id_b"), col("label").as("label_b")), "id_b")
        .groupBy(
          least(col("label_a"), col("label_b")).as("label_lo"),
          greatest(col("label_a"), col("label_b")).as("label_hi"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("cos").cast("decimal(24,6)")).cast("double").as("sum_cos"))
    }),

    "q69_dedup_clusters" -> ((s, dir) =>
      Dedup.dedupClusters(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)),

    // Same transitive-closure clustering, but in embedding space: the
    // semantic-dedup decision table ("these vectors collapse to one
    // training example").
    "q70_embed_clusters" -> ((s, dir) =>
      Dedup.clustersFromPairs(
        Similarity.embeddingDupPairs(
          Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.3),
        "vec_id")),

    "q73_vocab" -> ((s, dir) =>
      TextAnalysis.vocabulary(Tables.documents(s, dir), "doc_id", "text",
        minDf = 25)),

    // Multimodal batched extraction over documents-as-media: every text
    // payload takes the byte-fold path (no WAV/PPM magic), whose lanes
    // and integer checksum the oracle recomputes from hex(payload).
    "q74_media_features" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      Multimodal.extractFeatures(
        Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text"))
        .select(col("id"), col("kind"), col("dim"), col("checksum"))
    }),

    // Multimodal frame sampling: documents' bytes as a raw 96-byte-frame
    // video stream (the codec stub), every max(1, n/4)-th frame sampled;
    // per-frame mean byte + modular fold checksum. The oracle recomputes
    // the identical arithmetic from the same bytes in SQL.
    "q105_frame_sample" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      Multimodal.frameSample(
        Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text"))
        .toDF()
    }),

    // IVF ANN: disjoint inverted-file cells from a deterministic
    // sample-seeded coarse quantizer; queries probe nProbe nearest cells.
    "q72_ann_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        k = 3, nProbe = 2) // nList auto-derived as ceil(sqrt(N))
    }),

    // The canonical training-data selection: English, above the quality
    // bar, sane length, and one representative per near-dup cluster —
    // every upstream operator composed into one plan.
    "q71_corpus_select" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val lang = TextAnalysis.langId(docs, "doc_id", "text")
        .select("doc_id", "pred_lang")
      val qual = TextAnalysis.quality(docs, "doc_id", "text")
        .select("doc_id", "quality_score", "n_words")
      val clusters = Dedup.dedupClusters(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)
        .select("doc_id", "cluster_id")
      docs.select("doc_id", "source")
        .join(lang, Seq("doc_id"))
        .join(qual, Seq("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .filter(col("pred_lang") === "en" &&
          col("quality_score") >= 0.72 &&
          col("n_words").between(10, 500) &&
          (col("cluster_id").isNull || col("cluster_id") === col("doc_id")))
        .select("doc_id", "source", "pred_lang", "quality_score", "n_words")
    }),

    "q75_tfidf" -> ((s, dir) =>
      Pipeline.tfIdfTopK(Tables.documents(s, dir), "doc_id", "text", k = 5)),

    "q76_bm25" -> ((s, dir) =>
      Pipeline.bm25(Tables.documents(s, dir), "doc_id", "text",
        terms = Bm25Terms)),

    "q77_seq_pack" -> ((s, dir) =>
      Pipeline.packSequences(Tables.documents(s, dir), "doc_id", "text",
        streamCol = "source", ctxLen = 2048L)),

    "q78_strat_sample" -> ((s, dir) =>
      Pipeline.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
        ratesPermille = SampleRates, defaultPermille = 50)),

    "q79_repetition" -> ((s, dir) =>
      Pipeline.repetitionStats(Tables.documents(s, dir), "doc_id", "text")),

    "q80_shards" -> ((s, dir) =>
      Pipeline.shardAssign(Tables.documents(s, dir), "doc_id", numShards = 16)),

    "q81_decontam" -> ((s, dir) =>
      Pipeline.decontaminate(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 5, trainPermille = 900)),

    // Bloom-pre-filtered decontamination: same result set as q81 (the
    // probe admits every true match; the exact join discards the fpp
    // trickle), but the train-side shuffle carries only probable matches
    // — the 100 TB shape. Shares q81's oracle SQL verbatim.
    "q118_decontam_bloom" -> ((s, dir) =>
      Pipeline.decontaminateBloom(Tables.documents(s, dir), "doc_id",
        "text", shingleN = 5, trainPermille = 900)),

    "q82_mixture" -> ((s, dir) =>
      Pipeline.mixtureExpansion(Tables.documents(s, dir), "doc_id", "text",
        sourceCol = "source", weights = MixWeights, tokenBudget = 100000L)),

    "q83_semdedup" -> ((s, dir) =>
      Similarity.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.3)), // nList auto-derived as ceil(sqrt(N))

    "q84_rep_spans" -> ((s, dir) =>
      Dedup.repeatedSpans(Tables.documents(s, dir), "doc_id", "text", k = 10)),

    // Lee et al. 2021 cross-doc duplicate 5-gram fraction — the corpus-
    // level dedup-pressure metric complementing q84's within-doc spans.
    "q103_dup_ngrams" -> ((s, dir) =>
      Dedup.dupNgramFraction(Tables.documents(s, dir), "doc_id", "text")),

    // BPE tokenizer-training seed (Sennrich 2016): corpus-wide adjacent
    // symbol-pair counts at iteration 0, computed over the distinct-word
    // table weighted by frequency (vocabulary << corpus at scale).
    "q107_bpe_pairs" -> ((s, dir) =>
      TextAnalysis.bpePairCounts(Tables.documents(s, dir), "text")),

    // Fixed-window document chunking with stride + flush tail — the
    // context-window prep for layouts where documents must not cross
    // example boundaries (vs q77's concatenated packing).
    "q109_doc_chunks" -> ((s, dir) =>
      Pipeline.chunkDocuments(Tables.documents(s, dir), "doc_id", "text",
        chunkWords = 24, strideWords = 16)),

    // Length-bucketed batching: smallest power-of-two bucket per doc,
    // fixed-capacity batches filled per (source, shard, bucket) in id
    // order (the shard key bounds window sort groups at corpus scale);
    // padding waste is exact binary arithmetic.
    "q110_length_buckets" -> ((s, dir) =>
      Pipeline.lengthBucketedBatches(Tables.documents(s, dir), "doc_id",
        "text", "source", capacity = 256, shards = 4)),

    "q85_bigram_lm" -> ((s, dir) =>
      Pipeline.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")),

    "q86_source_drift" -> ((s, dir) =>
      TextAnalysis.sourceDrift(Tables.documents(s, dir), "doc_id", "text",
        "source")),

    // LM quality filtering on top of the q85 bigram model: per-doc NLL,
    // integer histogram bucket, keep flag at the cutoff — the
    // CCNet/Gopher perplexity-filter stage.
    "q125_perplexity_filter" -> ((s, dir) =>
      Pipeline.perplexityFilter(Tables.documents(s, dir), "doc_id", "text",
        cutoff = 6.0)),

    // Asymmetric containment dedup (Broder): rare-shingle-blocked
    // candidates, exact |A∩B|/|A| and /|B| confined to candidates — the
    // doc-embedded-in-doc dup class MinHash-LSH misses.
    "q127_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, maxDf = 5, threshold = 0.3, prefixK = 5)),

    // DSIR importance weights (Xie 2023): hashed-bigram bucket histograms
    // for target (lang='en') vs raw, per-doc log-likelihood ratio.
    "q128_dsir" -> ((s, dir) =>
      Pipeline.dsirWeights(Tables.documents(s, dir), "doc_id", "text",
        col("lang") === "en", numBuckets = 4096, cutoff = 0.0)),

    // fastText-style hashed linear quality classifier: map-only scan,
    // deterministic hash weights, logistic link.
    "q129_hash_classifier" -> ((s, dir) =>
      TextAnalysis.hashClassifier(Tables.documents(s, dir), "doc_id",
        "text", threshold = 0.5)),

    // Johnson-Lindenstrauss sparse random projection 64 -> 16: plan-time
    // literal Achlioptas matrix, pure map over the embedding scan
    // (exploded to (vec_id, dim, val) rows for the scalar-cell oracle
    // compare; the operator itself returns the array column).
    "q130_rand_projection" -> ((s, dir) =>
      Similarity.randomProjection(Tables.embeddings(s, dir), "vec_id",
        "embedding", inDim = 64, outDim = 16)
        .select(col("vec_id"),
          posexplode(col("proj")).as(Seq("dim", "val")))
        .withColumn("dim", col("dim").cast("long"))),

    // Zipf power-law fit over the top-1000 word frequencies — corpus
    // distributional-health statistic (slope ~ -1 for natural text).
    "q131_zipf" -> ((s, dir) =>
      TextAnalysis.zipfFit(Tables.documents(s, dir), "text", topR = 1000)),

    // Gopher heuristic rule filter (Rae 2021): map-only scan, ratios +
    // keep flag. minWords=10 fits the synthetic corpus length range.
    "q133_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(Tables.documents(s, dir), "doc_id", "text",
        minWords = 10)),

    // Per-source dataset report card: one map-only scan into one
    // hash-aggregate on the source key.
    "q132_source_report" -> ((s, dir) =>
      TextAnalysis.sourceReport(Tables.documents(s, dir), "doc_id", "text",
        "source", lowCutoff = 0.5)),

    // Temperature-scaled source sampling (UniMax family, alpha = 1/2):
    // per-source sqrt-token shares -> deterministic per-doc keep decision.
    "q135_temperature_mix" -> ((s, dir) =>
      Pipeline.temperatureMixture(Tables.documents(s, dir), "doc_id",
        "text", sourceCol = "source", tokenBudget = 20000L)),

    // Continuation-boundary duplicates: A's last 3 words == B's first 3
    // words (the split-document class invisible to Jaccard/MinHash).
    "q136_stitch_pairs" -> ((s, dir) =>
      Dedup.stitchPairs(Tables.documents(s, dir), "doc_id", "text",
        k = 3, maxDf = 10)),

    // Keep-best-of-cluster canonical selection: q69's clusters + q27's
    // quality score -> one argmax document per near-dup cluster.
    "q137_canonical_docs" -> ((s, dir) =>
      Dedup.canonicalDocs(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.3)),

    // Cross-source duplication report: verified near-dup pairs attributed
    // to their unordered source pair (the crawl-overlap signal).
    "q138_cross_source" -> ((s, dir) =>
      Dedup.crossSourceDups(Tables.documents(s, dir), "doc_id", "text",
        "source", threshold = 0.3)),

    // HyperLogLog per-source distinct-word estimate (sketch trio with CMS
    // q121 and Bloom q118); exact distinct alongside for accuracy.
    "q139_hll_distinct" -> ((s, dir) =>
      TextAnalysis.hllDistinctWords(Tables.documents(s, dir), "text",
        "source")),

    // Persisted-index ANN: build the IVF-PQ index, WRITE its four parquet
    // artifacts, re-READ them, and search from the persisted copy — the
    // build-once/search-many production loop. Same parameters and oracle
    // as q114, so a green row certifies the artifacts are complete and
    // bit-faithful on disk.
    "q140_ivfpq_persist" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = Similarity.ivfPqBuild(emb, "vec_id", "embedding")
      val path = s"${IoQueries.sinkDir}/q140_ivfpq_index"
      Similarity.ivfPqWriteIndex(idx, path)
      Similarity.ivfPqSearch(Similarity.ivfPqReadIndex(s, path),
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nProbe = 4)
    }),

    "q87_kmeans" -> ((s, dir) =>
      Similarity.kMeans(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iters = 2)),

    // Product quantization (Jegou 2011): per-subspace k-means codes +
    // reconstruction error — the billion-vector ANN compression layout.
    "q112_pq_codes" -> ((s, dir) =>
      Similarity.productQuantize(Tables.embeddings(s, dir), "vec_id",
        "embedding", m = 8, k = 16, iters = 2)),

    // PQ asymmetric-distance search (ADC): per-query LUT against the
    // trained codebook, candidates scored from their codes alone — the
    // search half of the PQ story (the corpus scan never touches the
    // embeddings).
    "q113_pq_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqTopK(emb.filter(col("vec_id") < 20), emb, "vec_id",
        "embedding", k = 5)
    }),

    "q88_cluster_sample" -> ((s, dir) =>
      Pipeline.clusterBalancedSample(
        Similarity.kMeans(Tables.embeddings(s, dir), "vec_id", "embedding",
          k = 8, iters = 2),
        "id", "cluster", perCluster = 20)),

    "q89_ann_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.annRecall(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        k = 5, nProbe = 4) // nList auto-derived as ceil(sqrt(N))
    }),

    // IVF-PQ (IVFADC): coarse cells + shared residual codebook + ADC
    // search confined to nProbe cells — q72's IVF and q112's PQ composed
    // into the actual billion-vector layout.
    "q114_ivfpq_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(emb.filter(col("vec_id") < 20), emb, "vec_id",
        "embedding", k = 5, nProbe = 4)
    }),

    // Recall@5 of the IVF-PQ search against exact cosine — the harness
    // row that tells you what the compressed layout costs in recall.
    "q115_ivfpq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 20)
      Similarity.recallVsExact(q, emb, "vec_id", "embedding", k = 5,
        Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", k = 5,
          nProbe = 4))
    }),

    // IVFADC+R: exact-cosine re-rank of a 10-deep ADC shortlist down to
    // top-5 — the refinement stage that recovers recall lost to code
    // compression while still touching full embeddings for only |Q|*10
    // rows.
    "q117_ivfpq_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqRerank(emb.filter(col("vec_id") < 20), emb, "vec_id",
        "embedding", k = 5, shortlist = 10, nProbe = 4)
    }),

    // CMS-pruned exact heavy hitters: the sketch pre-filter is a
    // superset (CMS never under-estimates), the exact count re-applies
    // the threshold, so output is exact — oracle is the plain SQL count.
    "q121_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(Tables.documents(s, dir), "text",
        minCount = 900L)),

    "q90_pii" -> ((s, dir) =>
      TextAnalysis.piiScan(Tables.documents(s, dir), "doc_id", "text")),

    // Deterministic 80/10/10 holdout by md5 bucket of the doc id, with
    // the per-(source, split) report card.
    "q144_split_assign" -> ((s, dir) =>
      Pipeline.splitAssign(Tables.documents(s, dir), "doc_id", "source",
        "n_chars")),

    // Exact-substring duplicate spans (Lee et al. 2021): per-doc fraction
    // of tokens inside the union of corpus-duplicated 8-word windows.
    "q145_dup_spans" -> ((s, dir) =>
      Dedup.dupSpans(Tables.documents(s, dir), "doc_id", "text", k = 8)),

    // Exact train→eval contamination spans (Lee et al. 2021 applied to
    // benchmark decontamination): longest verbatim-shared word run per
    // train doc against the eval split — the exact counterpart of q118's
    // Bloom screen and the cross-SET form of q145.
    "q215_contamination_span" -> ((s, dir) =>
      Dedup.contaminationSpans(Tables.documents(s, dir), "doc_id", "text",
        k = 8, evalMod = 97)),

    // Dedup-aware split assignment: the FIX for what q169 audits — the
    // md5 split bucket is keyed on the near-dup CLUSTER root, not the doc
    // id, so a duplicate family can never straddle train/val/test.
    // Singletons root at their own id; cluster members inherit the root's
    // split wholesale.
    "q216_cluster_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val clusters = Dedup.dedupClusters(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)
      val bucket =
        conv(substr(md5(col("root").cast("string")), lit(1), lit(8)), 16, 10)
          .cast("long") % 100
      docs.select(col("doc_id"), col("source"))
        .join(clusters.select(col("doc_id"), col("cluster_id")),
          Seq("doc_id"), "left")
        .withColumn("root", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test"))
        .select("doc_id", "source", "root", "split")
    }),

    // Margin-based bitext mining over the parity-split embedding space:
    // even ids play the source language, odd the target; a 20-query batch
    // scores forward neighbors by the Artetxe-Schwenk ratio margin.
    "q217_margin_mining" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val src = emb.filter(col("vec_id") % 2 === 0)
      val tgt = emb.filter(col("vec_id") % 2 === 1)
      Similarity.marginMining(src.filter(col("vec_id") < 40), src, tgt,
        "vec_id", "embedding", k = 4)
    }),

    // CCNet-style head/middle/tail perplexity bucketing (Wenzek 2020):
    // per-LANGUAGE tertile thresholds of the q85 bigram-LM NLL (broadcast
    // threshold table), docs bucket map-side — the standard "keep the
    // head, maybe the middle" LM-quality partition of a crawl.
    "q219_ccnet_buckets" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // One row per doc; localCheckpoint so the threshold pass and the
      // bucketing pass share ONE materialization of the LM subtree
      // instead of replanning its scans twice (the two-pass shape is
      // inherent to exact quantile thresholds).
      val scored = Pipeline.bigramLmScore(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .filter(col("avg_nll").isNotNull)
        .localCheckpoint()
      val th = scored.groupBy("lang")
        .agg(graft.ops.Quantiles.pcts(s, col("avg_nll"),
          Seq(1.0 / 3, 2.0 / 3)).as("__t"))
      scored.join(broadcast(th), Seq("lang"))
        .withColumn("bucket",
          when(col("avg_nll") <= col("__t")(0), "head")
            .when(col("avg_nll") <= col("__t")(1), "middle")
            .otherwise("tail"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          round(min("avg_nll"), 6).as("min_nll"),
          round(max("avg_nll"), 6).as("max_nll"))
    }),

    // Cross-source overlap matrix from MERGED MinHash signatures
    // (Broder's union property — one mergeable signature per source, the
    // pairwise comparison is a groups²-sized table, never a corpus join).
    "q220_source_overlap" -> ((s, dir) => {
      val sigs = Dedup.mergedMinhash(Tables.documents(s, dir), "doc_id",
        "text", "source", shingleN = 3, numHashes = 8)
      val a = sigs.select(col("source").as("src_a"), col("mh").as("__ma"))
      val b = sigs.select(col("source").as("src_b"), col("mh").as("__mb"))
      // Explicit hint: the merged-sig table is |sources| rows, so the
      // inequality join must stay a BNLJ under ANY session conf — without
      // the hint, autoBroadcastJoinThreshold=-1 degrades it to a
      // CartesianProduct (the r13 plan-contract incident).
      a.join(broadcast(b), col("src_a") < col("src_b"))
        .withColumn("n_eq", expr(
          "size(filter(zip_with(__ma, __mb, (x, y) -> x = y), v -> v))")
          .cast("long"))
        .withColumn("est_jaccard", round(col("n_eq").cast("double") / 8, 6))
        .select("src_a", "src_b", "n_eq", "est_jaccard")
    }),

    // Shard-sketch persist + re-merge round trip — the workflow a 100 TB
    // incremental crawl actually runs (r13 verdict #5): per-shard
    // mergeable sketches (4 deterministic id-mod shards) go to parquet,
    // are read back, and re-merge by elementwise min into the per-source
    // corpus signature + KMV cardinality — verified position-for-position
    // against the corpus-at-once mergedMinhash (n_eq_sig must be the full
    // signature width). The text is scanned once, by the shard pass; the
    // merge touches only |shards|x|sources| sketch rows.
    "q231_sketch_shard_merge" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${IoQueries.sinkDir}/q231_shard_sketches"
      Dedup.shardSketches(docs, "doc_id", "text", "source",
        numShards = 4, shingleN = 3, numHashes = 8)
        .write.mode("overwrite").parquet(path)
      val merged = Dedup.mergeShardSketches(s.read.parquet(path), "source",
        numHashes = 8)
      val direct = Dedup.mergedMinhash(docs, "doc_id", "text", "source",
        shingleN = 3, numHashes = 8)
        .select(col("source"), col("mh").as("__direct"))
      merged.join(broadcast(direct), Seq("source"))
        .withColumn("n_eq_sig", expr(
          "size(filter(zip_with(mh, __direct, (x, y) -> x = y), v -> v))")
          .cast("long"))
        .select(col("source"), col("n_shards"), col("n_eq_sig"),
          col("est_kmv"), (col("n_eq_sig") === 8).as("merge_exact"))
    }),

    // Mergeable bottom-k uniform sample (Cohen & Kaplan 2007) — the
    // SAMPLING member of q231's mergeable-sketch family: per source, the
    // 64 docs with the smallest salted-md5 hash rank are a uniform sample
    // that re-merges across shards by union-then-bottom-k. Spark executes
    // exactly that merge shape — WindowGroupLimit pushes the rank filter
    // into per-partition partial top-k before the exchange. The
    // sample-estimated length quantiles are audited against the exact
    // percentiles in the same row.
    "q232_bottomk_sample" -> ((s, dir) => {
      // localCheckpoint: the exact side and the sample side otherwise
      // each re-scan the text column for its length — the narrow
      // (source, id, len, hash) projection is what both consume.
      val base = Tables.documents(s, dir).select(col("source"), col("doc_id"),
        length(col("text")).cast("double").as("len"),
        md5(concat(lit("bk1"), col("doc_id").cast("string"))).as("__h"))
        .localCheckpoint()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("__h"), col("doc_id"))
      val samp = base.withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") <= 64)
        .groupBy("source")
        .agg(count(lit(1)).as("n_sample"),
          graft.ops.Quantiles.pcts(s, col("len"), Seq(0.5, 0.9)).as("__e"))
      val exact = base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          graft.ops.Quantiles.pcts(s, col("len"), Seq(0.5, 0.9)).as("__x"))
      exact.join(samp, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_sample"),
          round(col("__x")(0), 4).as("exact_p50"),
          round(col("__e")(0), 4).as("est_p50"),
          round(col("__x")(1), 4).as("exact_p90"),
          round(col("__e")(1), 4).as("est_p90"),
          round(abs(col("__e")(0) - col("__x")(0)) / col("__x")(0), 4)
            .as("err_p50"),
          round(abs(col("__e")(1) - col("__x")(1)) / col("__x")(1), 4)
            .as("err_p90"))
    }),

    // Hill tail-index estimator (Hill 1975) over per-source doc lengths —
    // the heavy-tail diagnostic that decides whether a source's length
    // distribution has finite moments (alpha <= 1 means infinite mean:
    // token-budget and packing math silently breaks). k = 64 upper order
    // statistics per source; the rank filter is WindowGroupLimit-pruned
    // like q232's sample, so the sort never materializes beyond the top
    // slice per partition; each log term pins to 6 dp before the exact
    // decimal sum (q201's idiom). Sources with <= k docs drop — the
    // estimator is undefined there. k = 16: the gate corpus carries 25
    // docs per source; production would run k ~ sqrt(docs-per-source).
    "q235_hill_tail" -> ((s, dir) => {
      val k = 16
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("len").desc, col("doc_id"))
      val ranked = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          length(col("text")).cast("double").as("len"))
        .withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") <= k + 1)
        .localCheckpoint() // the threshold row and the top-k share it
      val thr = ranked.filter(col("__rnk") === k + 1)
        .select(col("source"), col("len").as("__xk"))
      ranked.filter(col("__rnk") <= k)
        .join(broadcast(thr), Seq("source"))
        .withColumn("__t", round(log(col("len") / col("__xk")), 6))
        .groupBy("source")
        .agg(count(lit(1)).as("n_top"), max(col("__xk")).as("x_k"),
          round(graft.core.Det.sumDet(col("__t"), 6) / k, 6)
            .as("mean_log_excess"))
        .withColumn("hill_alpha",
          when(col("mean_log_excess") > 0,
            round(lit(1.0) / col("mean_log_excess"), 6)))
    }),

    // Gini concentration of token mass over the vocabulary, per source —
    // "how much of this source is a few types": template/boilerplate
    // floods push G toward 1, healthy prose sits far lower. Closed form
    // over the ASC-sorted vocab table, G = (2·Σi·c_i − (n+1)·Σc)/(n·Σc)
    // — ALL partials are exact integer sums (order-free), the only
    // double op is the final division. The per-source rank runs over the
    // bounded vocab table (q131's Zipf class), never token rows. At
    // corpus scale where Σi·c_i nears 2^53, route the partials through
    // the split-long idiom (q191) — the division stays one op.
    "q236_token_gini" -> ((s, dir) => {
      val freq = Tables.documents(s, dir)
        .select(col("source"), explode(TextOps.words(col("text"))).as("word"))
        .groupBy("source", "word").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("c"), col("word"))
      freq.withColumn("__i", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_types"), sum(col("c")).as("total_tokens"),
          sum(col("__i") * col("c")).as("__ic"))
        .withColumn("gini", round(
          (lit(2L) * col("__ic") - (col("n_types") + lit(1L)) *
            col("total_tokens")).cast("double") /
            (col("n_types") * col("total_tokens")).cast("double"), 6))
        .select("source", "n_types", "total_tokens", "gini")
    }),

    // Encoding-corruption (mojibake) audit — the ingest-health check a
    // multi-crawl corpus runs before mixing sources: count the classic
    // UTF-8-decoded-as-Latin-1 digraphs (Ã¡, Ã©) and U+FFFD replacement
    // chars per document, roll up corruption incidence per source. The
    // synthetic corpus is clean by construction, so a deterministic
    // carve injects the defect (doc_id%13 docs get 'a' → 'Ã¡') — q200's
    // generation idiom. Detection is replace-length algebra (codegen'd
    // string ops, no regex): one corpus scan, one bounded rollup.
    "q234_mojibake" -> ((s, dir) => {
      val markers = Seq(("Ã¡", 2), ("Ã©", 2),
        ("�", 1))
      val carved = Tables.documents(s, dir).withColumn("__t",
        when(col("doc_id") % 13 === 0,
          expr("replace(text, 'a', 'Ã¡')"))
          .otherwise(col("text")))
      val bad = markers.map { case (m, l) =>
        ((length(col("__t")) - length(expr(s"replace(__t, '$m', '')")))
          / l).cast("long")
      }.reduce(_ + _)
      carved.withColumn("__bad", bad)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__bad") > 0, 1L).otherwise(0L)).as("n_flagged"),
          sum(col("__bad")).as("total_markers"))
        .withColumn("flag_rate",
          round(col("n_flagged").cast("double") / col("n_docs"), 6))
    }),

    // Count-min sketch (Cormode & Muthukrishnan 2005): 4 rows x 256
    // buckets of exact counter mass, estimates = min over rows — the
    // bounded-memory frequency table whose one-sided error the query
    // audits against the exact counts for the 20 highest-df words. The
    // sketch builds from the VOCAB count table (one hash aggregate over
    // 4x|vocab| bucket rows, mergeable across shards by +), never from
    // token rows; the probe side is 20 words broadcast against 1024
    // sketch cells.
    "q233_countmin" -> ((s, dir) => {
      val W = 256
      val freq = Tables.documents(s, dir)
        .select(explode(TextOps.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n_exact"))
        .localCheckpoint() // sketch build + top-20 probe share one scan
      val base =
        conv(substr(md5(col("word")), lit(1), lit(8)), 16, 10).cast("long")
      def bucketOf(j: Int) =
        ((lit(Dedup.HASH_A(j)) * base + lit(Dedup.HASH_B(j))) %
          Dedup.MINHASH_P % W).cast("int")
      val sketch = freq
        .select(col("n_exact"), posexplode(
          array((0 until 4).map(bucketOf): _*)).as(Seq("j", "bucket")))
        .groupBy("j", "bucket").agg(sum("n_exact").as("__c"))
      val top = freq
        .orderBy(col("n_exact").desc, col("word")).limit(20)
        .select(col("word"), col("n_exact"), posexplode(
          array((0 until 4).map(bucketOf): _*)).as(Seq("j", "bucket")))
      broadcast(top).join(sketch, Seq("j", "bucket"))
        .groupBy("word")
        .agg(max("n_exact").as("n_exact"), min("__c").as("n_est"))
        .withColumn("overcount", col("n_est") - col("n_exact"))
    }),

    // Moments sketch (Gan et al., VLDB 2018): per-source power sums of
    // ln(doc length) — a constant-size, merge-by-+ aggregate — with
    // Cornish-Fisher quantile recovery from (mean, sd, skew, excess
    // kurtosis), audited against the exact percentiles. THE mergeable
    // quantile primitive at 100 TB: shards ship five numbers per group,
    // the re-merge is addition, the estimate is driver-cheap algebra —
    // and unlike KLL/t-digest the sketch is deterministic, so the audit
    // is hash-exact. Each power term pins to 8 dp before the exact
    // decimal sum (q201's idiom) so shard order can never move a digit;
    // the CF coefficients are precomputed Scala doubles interpolated
    // verbatim into the oracle so both engines run identical IEEE ops.
    "q237_moments_quantile" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .select(col("source"),
          round(log(length(col("text")).cast("double")), 8).as("__t"))
        .withColumn("__t2", round(col("__t") * col("__t"), 8))
        .withColumn("__t3", round(col("__t2") * col("__t"), 8))
        .withColumn("__t4", round(col("__t3") * col("__t"), 8))
      val g = base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        graft.core.Det.sumDet(col("__t"), 8).as("__s1"),
        graft.core.Det.sumDet(col("__t2"), 8).as("__s2"),
        graft.core.Det.sumDet(col("__t3"), 8).as("__s3"),
        graft.core.Det.sumDet(col("__t4"), 8).as("__s4"),
        graft.ops.Quantiles.pcts(s, col("__t"), Seq(0.5, 0.9)).as("__q"))
        .withColumn("__n", col("n_docs").cast("double"))
        .withColumn("__mu", col("__s1") / col("__n"))
        .withColumn("__m2",
          col("__s2") / col("__n") - col("__mu") * col("__mu"))
        .withColumn("__sd", sqrt(col("__m2")))
        .withColumn("__sk",
          (col("__s3") / col("__n") - lit(3.0) * col("__mu") * col("__m2")
            - col("__mu") * col("__mu") * col("__mu")) /
            (col("__m2") * col("__sd")))
        .withColumn("__ku",
          (col("__s4") / col("__n")
            - lit(4.0) * col("__mu") * (col("__s3") / col("__n"))
            + lit(6.0) * col("__mu") * col("__mu") *
              (col("__s2") / col("__n"))
            - lit(3.0) * col("__mu") * col("__mu") * col("__mu") *
              col("__mu")) / (col("__m2") * col("__m2")) - lit(3.0))
      def cf(z: Double): org.apache.spark.sql.Column =
        col("__mu") + col("__sd") * lit(z) +
          col("__sd") * col("__sk") * lit(CfK1(z)) +
          col("__sd") * col("__ku") * lit(CfK2(z)) +
          col("__sd") * col("__sk") * col("__sk") * lit(CfK3(z))
      g.select(col("source"), col("n_docs"),
        round(col("__mu"), 6).as("mean_ln"),
        round(col("__sd"), 6).as("sd_ln"),
        round(col("__sk"), 6).as("skew"),
        round(col("__ku"), 6).as("ex_kurt"),
        round(cf(0.0), 6).as("est_p50"),
        round(col("__q")(0), 6).as("exact_p50"),
        round(abs(cf(0.0) - col("__q")(0)), 6).as("err_p50"),
        round(cf(Z90), 6).as("est_p90"),
        round(col("__q")(1), 6).as("exact_p90"),
        round(abs(cf(Z90) - col("__q")(1)), 6).as("err_p90"))
    }),

    // UniMax mixture allocation (Chung et al. 2023): given token budget
    // B = 2x corpus and epoch cap E = 4, allocate uniformly across
    // sources subject to alloc_i <= E*n_i — the waterfilling closed
    // form. The corpus reduces to ONE hash aggregate (per-source token
    // counts); everything after runs on the |sources|-row table:
    // ascending-cap prefix sums decide which sources saturate, the
    // survivors split the remainder evenly. The saturation decision is
    // exact integer algebra; doubles appear only in the emitted
    // allocation, so the plan is hash-exact at any scale.
    "q238_unimax" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, dir)
        .select(col("source"),
          size(TextOps.words(col("text"))).cast("long").as("__w"))
        .groupBy("source").agg(sum(col("__w")).as("n_tokens"))
        .withColumn("cap_tokens", col("n_tokens") * lit(4L))
      val tot = tok.agg((sum(col("n_tokens")) * lit(2L)).as("__B"),
        count(lit(1)).as("__k"))
      val w = W.orderBy(col("cap_tokens"), col("source"))
      val ranked = tok.crossJoin(broadcast(tot))
        .withColumn("__i", row_number().over(w).cast("long"))
        .withColumn("__pref", sum(col("cap_tokens")).over(
          w.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("__sat",
          col("cap_tokens") * (col("__k") - col("__i") + lit(1L)) <=
            col("__B") - (col("__pref") - col("cap_tokens")))
        .localCheckpoint() // bounded |sources| rows; two consumers
      val mrow = ranked.agg(
        max(when(col("__sat"), col("__i")).otherwise(0L)).as("__m"),
        max(when(col("__sat"), col("__pref")).otherwise(0L)).as("__pm"))
      val alloc =
        when(col("__i") <= col("__m"), col("cap_tokens").cast("double"))
          .otherwise((col("__B") - col("__pm")).cast("double") /
            (col("__k") - col("__m")).cast("double"))
      ranked.crossJoin(broadcast(mrow))
        .select(col("source"), col("n_tokens"), col("cap_tokens"),
          round(alloc, 4).as("alloc_tokens"),
          round(alloc / col("n_tokens").cast("double"), 6).as("epochs"),
          (col("__i") <= col("__m")).cast("int").as("saturated"))
    }),

    // Temporal n-gram novelty (memorization-risk / staleness signal):
    // treating doc_id as crawl order, a doc's novelty is the fraction
    // of its distinct 3-shingles it introduces to the corpus. Gram rows
    // ~ corpus tokens; first-seen is a window min over the gram key —
    // ONE scan and ONE gram-scale shuffle (the groupBy-then-join-back
    // alternative scans the corpus and shuffles gram rows twice; most
    // grams are unique, so partial aggregation buys nothing there).
    // Low-novelty docs are the boilerplate/near-dup suspects that
    // survive exact dedup.
    "q239_ngram_novelty" -> ((s, dir) => {
      // Pinned-count repartition BEFORE the CPU-bound shingle+md5 work:
      // the corpus is tiny in bytes, so the scan (and AQE) would run the
      // whole gram build in one task — q203's measured 10x trap.
      val grams = Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("source"), col("doc_id"),
          explode(TextOps.shingles(TextOps.words(col("text")), 3)).as("g"))
        .select(col("source"), col("doc_id"),
          substring(md5(col("g")), 1, 16).as("__gk"))
      val wf = org.apache.spark.sql.expressions.Window.partitionBy("__gk")
      grams.withColumn("__first", min(col("doc_id")).over(wf))
        .groupBy("source", "doc_id")
        .agg(count(lit(1)).as("__n"),
          sum(when(col("__first") === col("doc_id"), 1L).otherwise(0L))
            .as("__nov"))
        .withColumn("__r",
          round(col("__nov").cast("double") / col("__n"), 6))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__n")).as("n_grams"),
          round(graft.core.Det.avgDet(col("__r"), 6), 6).as("avg_novelty"),
          sum(when(col("__r") < 0.5, 1L).otherwise(0L)).as("n_low_novelty"))
    }),

    // HyperBall neighborhood function N(t) on the near-dup pair graph
    // (Boldi & Vigna 2013): per-node HLL ball counters iterated as
    // register-max message passing, audited per node against the exact
    // ball sizes — N(t) still growing at t=2 means transitive template
    // chains that pairwise dedup won't collapse. Register layout,
    // estimator, and the 100 TB contract live in ops/HyperBall.scala.
    "q240_hyperball" -> ((s, dir) =>
      graft.ops.HyperBall.neighborhoodFunction(s,
        Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)
          .select(col("id_a"), col("id_b")), iters = 2)),

    // Theta-sketch set DIFFERENCE (DataSketches a-not-b; Dasgupta et
    // al. 2016): |shingles(A) \ shingles(B)| for every ordered source
    // pair, from per-source bottom-k KMV sketches — the one set
    // operation the merged-MinHash overlap family (q219/q220) can't
    // express. theta = min(kth_a, kth_b); the estimate counts A's
    // retained values below theta that B's retained set lacks, scaled
    // by 1/theta. The corpus is touched ONCE (distinct-shingle scan +
    // per-source bottom-k via WindowGroupLimit); everything pairwise
    // runs on the sources x k retained table, broadcast-hinted so the
    // non-equi pair join can never degrade (q220's lesson). Audited
    // against the exact difference from a shingle equi-self-join.
    "q241_theta_diff" -> ((s, dir) => {
      val k = 64
      // Pinned-count repartition before the gram build (q203's trap —
      // see q239); the byte-tiny scan would otherwise hash in one task.
      val sh = Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("source"),
          explode(TextOps.shingles(TextOps.words(col("text")), 3)).as("g"))
        .select(col("source"), substring(md5(col("g")), 1, 16).as("gk"))
        .distinct()
        .withColumn("__h", TextOps.wordHash60(col("gk")))
        .localCheckpoint() // sketch side and exact side share one scan
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("__h"), col("gk"))
      val ret = sh.withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") <= k)
        .localCheckpoint() // bounded sources x k rows; three consumers
      val kth = ret.filter(col("__rnk") === k)
        .select(col("source"), col("__h").as("__kth"))
      val pairsSrc = broadcast(kth.select(col("source").as("src_a"),
          col("__kth").as("__ka")))
        .join(broadcast(kth.select(col("source").as("src_b"),
          col("__kth").as("__kb"))), col("src_a") =!= col("src_b"))
        .withColumn("__theta", least(col("__ka"), col("__kb")))
      val below = pairsSrc
        .join(broadcast(ret.select(col("source").as("src_a"),
          col("gk"), col("__h"))), Seq("src_a"))
        .filter(col("__h") < col("__theta"))
      val r = below.join(
          broadcast(ret.select(col("source").as("src_b"), col("gk"))),
          Seq("src_b", "gk"), "left_anti")
        .groupBy("src_a", "src_b", "__theta")
        .agg(count(lit(1)).as("__r"))
      val est = pairsSrc.select(col("src_a"), col("src_b"), col("__theta"))
        .join(r, Seq("src_a", "src_b", "__theta"), "left")
        .na.fill(0L, Seq("__r"))
        .withColumn("est_diff", round(col("__r").cast("double") *
          lit(1152921504606846976L).cast("double") /
          col("__theta").cast("double"), 4))
      val nA = sh.groupBy(col("source").as("src_a"))
        .agg(count(lit(1)).as("n_a"))
      val inter = sh.select(col("source").as("src_a"), col("gk"))
        .join(sh.select(col("source").as("src_b"), col("gk")), Seq("gk"))
        .filter(col("src_a") =!= col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("__i"))
      est.join(broadcast(nA), Seq("src_a"))
        .join(inter, Seq("src_a", "src_b"), "left")
        .na.fill(0L, Seq("__i"))
        .withColumn("exact_diff", col("n_a") - col("__i"))
        .withColumn("rel_err",
          round(abs(col("est_diff") - col("exact_diff").cast("double")) /
            col("exact_diff").cast("double"), 6))
        .select("src_a", "src_b", "n_a", "est_diff", "exact_diff",
          "rel_err")
    }),

    // Sorted-neighborhood dedup (Hernandez & Stolfo 1995): sort each
    // source's docs by a normalized prefix key and compare only rows
    // within a w=2 window of the sort order — the classic blocking
    // alternative to LSH, O(n log n + n*w) instead of candidate
    // hashing. Spark-first: the sort is a per-source window (range
    // exchange distributes; no global single-partition order), the
    // window pairs are lead() columns, and the verifier is a
    // prefix-capped levenshtein (q189's guard) — no join ever
    // materializes beyond the lead width.
    "q242_snm_dedup" -> ((s, dir) => {
      val key = substring(lower(col("text")), 1, 40)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("__key"), col("doc_id"))
      val sorted = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), key.as("__key"))
        .withColumn("__id1", lead(col("doc_id"), 1).over(w))
        .withColumn("__k1", lead(col("__key"), 1).over(w))
        .withColumn("__id2", lead(col("doc_id"), 2).over(w))
        .withColumn("__k2", lead(col("__key"), 2).over(w))
      val cand = sorted.select(col("source"), col("doc_id").as("id_a"),
          col("__key").as("ka"), col("__id1").as("id_b"),
          col("__k1").as("kb"))
        .unionByName(sorted.select(col("source"),
          col("doc_id").as("id_a"), col("__key").as("ka"),
          col("__id2").as("id_b"), col("__k2").as("kb")))
        .filter(col("id_b").isNotNull)
      cand.withColumn("dist", levenshtein(col("ka"), col("kb")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("dist") <= 8, 1L).otherwise(0L)).as("n_matches"),
          round(graft.core.Det.avgDet(col("dist").cast("double"), 1), 4)
            .as("avg_dist"))
    }),

    // AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996):
    // F2 = sum c_w^2 per source — the repetition-mass scalar — from 16
    // independent +/-1 sign-hash estimators Y_j = sum s_j(w)*c_w. Each
    // Y_j is an exact integer sum over the VOCAB table (mergeable by +
    // across shards: the sketch row is (source, j, Y_j)); the estimate
    // is mean(Y_j^2), exact integers until the final division. Audited
    // against the exact F2 off the same vocab scan.
    "q243_ams_f2" -> ((s, dir) => {
      val nEst = 16
      val freq = Tables.documents(s, dir)
        .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .localCheckpoint() // sketch and exact sides share the vocab scan
      val signs = freq.select(col("source"), col("c"), posexplode(
        array((0 until nEst).map { j =>
          (lit(1L) - lit(2L) * TextOps.wordHash60(
            concat(lit(s"ams$j:"), col("w"))).bitwiseAND(lit(1L)))
        }: _*)).as(Seq("j", "s")))
      val sk = signs.groupBy("source", "j")
        .agg(sum(col("s") * col("c")).as("y"))
      val est = sk.groupBy("source")
        .agg((sum(col("y") * col("y")).cast("double") /
          lit(nEst.toDouble)).as("__est"))
      val exact = freq.groupBy("source")
        .agg(count(lit(1)).as("n_types"), sum(col("c") * col("c")).as("f2_exact"))
      exact.join(est, Seq("source"))
        .withColumn("f2_est", round(col("__est"), 4))
        .withColumn("rel_err",
          round(abs(col("__est") - col("f2_exact").cast("double")) /
            col("f2_exact").cast("double"), 6))
        .select("source", "n_types", "f2_exact", "f2_est", "rel_err")
    }),

    // Simple Good–Turing frequency smoothing audit (Good 1953; Gale &
    // Sampson 1995): freq-of-freq table, Turing estimates, unseen mass.
    // All computed on the count-of-counts table — metadata-sized.
    "q244_good_turing" -> ((s, dir) =>
      TextAnalysis.goodTuring(Tables.documents(s, dir), "text", "source")),

    // Moore–Lewis contrastive selection (ACL 2010): in-domain (lang=en)
    // vs general bigram cross-entropy difference per doc.
    "q245_moore_lewis" -> ((s, dir) =>
      Pipeline.mooreLewisScore(Tables.documents(s, dir), "doc_id", "text",
        col("lang") === "en")),

    // Unbiased linear-kernel MMD between label groups (Gretton 2012):
    // the two-sample domain-distance test from per-group moment vectors.
    "q246_mmd" -> ((s, dir) =>
      graft.llm.EmbeddingOps.linearMmd(Tables.embeddings(s, dir),
        "vec_id", "embedding", "label")),

    // Simplified silhouette over q87's trained k-means centroids
    // (Hruschka 2004): the O(N·k) cluster-quality diagnostic.
    "q247_silhouette" -> ((s, dir) =>
      Similarity.simplifiedSilhouette(Tables.embeddings(s, dir),
        "vec_id", "embedding", k = 8, iters = 2)),

    // Language-ID confusion matrix: q26's stopword heuristic scored
    // against the labeled lang column — per-class precision/recall/F1.
    "q250_langid_confusion" -> ((s, dir) =>
      TextAnalysis.langIdConfusion(Tables.documents(s, dir), "doc_id",
        "text", "lang")),

    // Competence-based curriculum pacing (Platanios et al., NAACL 2019):
    // difficulty = corpus length CDF, competence c(t) = sqrt(t/T), so a
    // doc unlocks at step t = ceil(T·cdf²) — the data-ordering schedule
    // for curriculum training, closed-form (no per-step scan). The
    // global rank is NOT a global-sort window (single partition at
    // corpus scale): ranks = per-length local row_number (distributed
    // by length) + a prefix-sum offset over the BOUNDED distinct-length
    // table, broadcast back. T=1000. Ratios of exact integers squared
    // in double are engine-identical; ceil on them likewise.
    "q251_curriculum" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(TextOps.words(col("text"))).cast("long").as("n_words"))
      val cnt = docs.groupBy("n_words").agg(count(lit(1)).as("__c"))
      val pre = cnt.withColumn("__before",
          coalesce(sum(col("__c")).over(W.orderBy("n_words")
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
        .select(col("n_words"), col("__before"))
      val tot = docs.agg(count(lit(1)).as("__n"))
      val wd = W.partitionBy("n_words").orderBy("doc_id")
      docs.join(broadcast(pre), Seq("n_words"))
        .withColumn("__rn", col("__before") + row_number().over(wd))
        .crossJoin(broadcast(tot))
        .withColumn("cdf",
          round(col("__rn").cast("double") / col("__n"), 6))
        .withColumn("unlock_step", ceil(lit(1000.0) *
          (col("__rn").cast("double") / col("__n")) *
          (col("__rn").cast("double") / col("__n"))).cast("long"))
        .select("doc_id", "source", "n_words", "cdf", "unlock_step")
    }),

    // Bias-corrected Chao1 vocabulary richness (Chao 1984) per source.
    "q252_chao1" -> ((s, dir) =>
      TextAnalysis.chao1(Tables.documents(s, dir), "text", "source")),

    // AMS-sketch shard workflow (the q231 pattern on q243's F2 sketch):
    // per-shard (source, j, Y) sign-sum sketches persist to parquet,
    // re-merge by plain SUM, and must equal the direct corpus sketch
    // EXACTLY (integer linearity of Y_j = Σ s_j(w)·c_w) — the
    // incremental-crawl form: each crawl ships sketch rows, never
    // re-scans history. The f2 estimate off the MERGED sketch is the
    // cross-engine-checked value.
    "q253_ams_shard_merge" -> ((s, dir) => {
      val nEst = 16
      def signs(wcol: org.apache.spark.sql.Column) =
        array((0 until nEst).map { j =>
          (lit(1L) - lit(2L) * TextOps.wordHash60(
            concat(lit(s"ams$j:"), wcol)).bitwiseAND(lit(1L)))
        }: _*)
      val docs = Tables.documents(s, dir)
      val path = s"${IoQueries.sinkDir}/q253_ams_shards"
      // count word types per (source, shard) FIRST so the 16 sign
      // hashes run once per TYPE, not per token occurrence (Σ_occ sg =
      // sg·c exactly) — ~100× fewer md5 evaluations at sf0.1
      docs.select(col("source"), (col("doc_id") % 4).as("shard"),
          explode(TextOps.words(col("text"))).as("w"))
        .groupBy("source", "shard", "w").agg(count(lit(1)).as("__c"))
        .select(col("source"), col("shard"), col("__c"),
          posexplode(signs(col("w"))).as(Seq("j", "sg")))
        .groupBy("source", "shard", "j")
        .agg(sum(col("sg") * col("__c")).as("y"))
        .write.mode("overwrite").parquet(path)
      val merged = s.read.parquet(path)
        .groupBy("source", "j")
        .agg(sum(col("y")).as("y_m"),
          countDistinct(col("shard")).as("__ns"))
      val direct = docs.select(col("source"),
          explode(TextOps.words(col("text"))).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .select(col("source"), col("c"),
          posexplode(signs(col("w"))).as(Seq("j", "sg")))
        .groupBy("source", "j").agg(sum(col("sg") * col("c")).as("y_d"))
      merged.join(direct, Seq("source", "j"))
        .groupBy("source")
        .agg(max(col("__ns")).as("n_shards"),
          sum(when(col("y_m") === col("y_d"), 1L).otherwise(0L))
            .as("n_eq"),
          (sum(col("y_m") * col("y_m")).cast("double") /
            lit(nEst.toDouble)).as("__est"))
        .select(col("source"), col("n_shards"), col("n_eq"),
          round(col("__est"), 4).as("f2_est"),
          (col("n_eq") === nEst).as("merge_exact"))
    }),

    // LM persist/reload workflow (the q140/q253 family on the KN LM):
    // the vocab²-bounded Kneser–Ney model table writes to parquet,
    // reloads, re-scores the corpus, and must equal the direct scores
    // doc-for-doc (parquet round-trips longs and the scalar column
    // exactly) — train-once / score-many-crawls is how an LM filter
    // actually deploys at 100 TB.
    "q256_lm_persist" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${IoQueries.sinkDir}/q256_kn_model"
      Pipeline.kneserNeyModel(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(path)
      val direct = Pipeline.kneserNeyLmScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("avg_nll_kn").as("__direct"))
      Pipeline.kneserNeyScore(docs, "doc_id", "text", s.read.parquet(path))
        .join(direct, Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("avg_nll_kn").isNotNull, 1L).otherwise(0L))
            .as("n_scored"),
          sum(when(col("avg_nll_kn") <=> col("__direct"), 1L)
            .otherwise(0L)).as("n_eq"))
        .withColumn("persist_exact", col("n_eq") === col("n_docs"))
    }),

    // Rendezvous (highest-random-weight) hashing shard assignment
    // (Thaler & Ravishankar 1998) + the consistent-remap audit: argmax
    // over per-(doc, shard) hashes for 4 shards, again for 5 — HRW
    // guarantees every reassigned doc moves TO the new shard (never
    // between old ones) and ~1/5 of each shard moves, which the query
    // verifies (n_moved_elsewhere must be 0). Pure map-side expression
    // work + one doc-keyed aggregate pair — the shard-topology-change
    // operator a 100 TB store runs on every capacity change.
    "q257_rendezvous" -> ((s, dir) => {
      val hs = Tables.documents(s, dir).select(col("doc_id"),
          posexplode(array((0 until 5).map { sh =>
            TextOps.wordHash60(concat(lit(s"hrw$sh:"),
              col("doc_id").cast("string")))
          }: _*)).as(Seq("s", "h")))
      def arg(df: org.apache.spark.sql.DataFrame, name: String) =
        df.groupBy("doc_id")
          .agg(max_by(col("s"), struct(col("h"), col("s"))).as(name))
      arg(hs.filter(col("s") < 4), "shard4")
        .join(arg(hs, "shard5"), Seq("doc_id"))
        .groupBy(col("shard4").as("shard"))
        .agg(count(lit(1)).as("n_before"),
          sum(when(col("shard5") =!= col("shard4"), 1L).otherwise(0L))
            .as("n_moved"),
          sum(when(col("shard5") =!= col("shard4") &&
            col("shard5") =!= 4, 1L).otherwise(0L))
            .as("n_moved_elsewhere"))
        .withColumn("moved_frac",
          round(col("n_moved").cast("double") / col("n_before"), 6))
    }),

    // Feature-hashing collision curve (Weinberger et al., ICML 2009):
    // for bucket counts 2^8/2^10/2^12, the type- and token-mass
    // collision rates of the hashing trick over the corpus vocabulary —
    // the audit that sizes q128/q129's hashed feature spaces. One vocab
    // aggregate fanned out ×3; everything downstream is bucket-bounded.
    "q258_hash_collisions" -> ((s, dir) => {
      val vocab = Tables.documents(s, dir)
        .select(explode(TextOps.words(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      vocab.select(col("w"), col("c"),
          explode(array(Seq(8, 10, 12).map(lit): _*)).as("k"))
        .withColumn("bucket", TextOps.wordHash60(col("w")) %
          when(col("k") === 8, 256L).when(col("k") === 10, 1024L)
            .otherwise(4096L))
        .groupBy("k", "bucket")
        .agg(count(lit(1)).as("__t"), sum(col("c")).as("__m"))
        .groupBy("k")
        .agg(sum(col("__t")).as("n_types"),
          count(lit(1)).as("n_buckets_used"),
          sum(when(col("__t") > 1, col("__t")).otherwise(0L))
            .as("__coll_t"),
          sum(col("__m")).as("__mass"),
          sum(when(col("__t") > 1, col("__m")).otherwise(0L))
            .as("__coll_m"))
        .select(col("k"), col("n_types"), col("n_buckets_used"),
          round(col("__coll_t").cast("double") / col("n_types"), 6)
            .as("type_collision_rate"),
          round(col("__coll_m").cast("double") / col("__mass"), 6)
            .as("mass_collision_rate"))
    }),

    // Exact KNN-Shapley data valuation (Jia et al., VLDB 2019): per
    // train vector, the mean exact Shapley value of a 5-NN utility over
    // the 20-query eval batch — the "which examples help/hurt this eval
    // set" curation signal. The closed recursion telescopes into a
    // suffix sum, so the plan is one broadcast query fan-out + two
    // windows + one aggregate; increments quantize onto the 2^30 binary
    // grid so every sum is integer-exact (see Similarity.knnShapley).
    "q259_knn_shapley" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnShapley(emb.filter(col("vec_id") < 20),
        emb.filter(col("vec_id") >= 20), "vec_id", "embedding", "label",
        k = 5)
    }),

    // LSH (bands, rowsPerBand) S-curve audit over the corpus's OBSERVED
    // verified-pair Jaccard distribution: expected recall on true pairs
    // and expected false-candidate rate per layout — the audit that
    // sizes a signature store before committing it (Dedup.lshParamCurve).
    "q260_lsh_params" -> ((s, dir) =>
      Dedup.lshParamCurve(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("bands")),

    // Synchronous label-propagation communities (Raghavan 2007) on the
    // near-dup pair graph, 4 deterministic rounds with min-label
    // tie-break — the finer-than-connected-components "template family"
    // view (Dedup.labelPropagation).
    "q261_label_prop" -> ((s, dir) =>
      Dedup.labelPropagation(
        Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3),
        iters = 4)),

    // Fleiss' kappa across three deterministic binary keep raters (the
    // hard Gopher rules as independent judges) — multi-rater
    // chance-corrected filter agreement, integer sums throughout.
    "q262_fleiss_kappa" -> ((s, dir) =>
      TextAnalysis.fleissKappa(Tables.documents(s, dir), "doc_id", "text")),

    // Per-source tie-corrected Spearman rank correlation between the
    // classifier margin and mean word length — do the two filters RANK
    // documents the same way? Integer average-ranks in DECIMAL(38,0),
    // string-routed to double once.
    "q263_spearman_filters" -> ((s, dir) =>
      TextAnalysis.spearmanScores(Tables.documents(s, dir), "doc_id",
        "text", "source")),

    // Misra-Gries heavy hitters as a mergeable summary (Agarwal 2012
    // merge rule): 8 shard summaries re-merge and every surviving word
    // must satisfy est <= true <= est + N/(k+1) against exact counts.
    "q264_misra_gries" -> ((s, dir) =>
      TextAnalysis.misraGries(Tables.documents(s, dir), "doc_id", "text",
        k = 20, numShards = 8)),

    // Split-conformal coverage audit (Vovk/Lei): calibration-split
    // margin quantile as the keep threshold, coverage on the held-out
    // split — the finite-sample-guaranteed way to threshold a filter.
    "q266_conformal" -> ((s, dir) =>
      TextAnalysis.conformalCoverage(Tables.documents(s, dir), "doc_id",
        "text", alpha = 0.1)),

    // TextRank keywords (Mihalcea & Tarau 2004): PageRank on the
    // adjacent-word co-occurrence graph over the >= 25-count vocabulary,
    // scaled-integer loop shared with q153 — exact cross-engine.
    "q267_textrank" -> ((s, dir) =>
      TextAnalysis.textRank(Tables.documents(s, dir), "doc_id", "text",
        minCount = 25, iters = 5)),

    // Greedy maximum-coverage seed-set selection (Nemhauser 1978's
    // 1-1/e greedy): 5 adaptive rounds, each one anti-join + count
    // aggregate + single-row argmax — the vocabulary-spanning
    // curation primitive.
    "q269_max_coverage" -> ((s, dir) =>
      Pipeline.maxCoverage(Tables.documents(s, dir), "doc_id", "text",
        k = 5)),

    // Word burstiness (Church & Gale 1995): E[tf | present] and the
    // tf variance-to-mean ratio per >= 25-df word — content words clump,
    // function words spread; integer sums, pinned division order.
    "q270_burstiness" -> ((s, dir) =>
      TextAnalysis.burstiness(Tables.documents(s, dir), "doc_id", "text",
        minDf = 25)),

    // HITS hubs & authorities (Kleinberg 1999) on the customer→supplier
    // purchase graph — mutual-reinforcement link analysis in all-integer
    // L1-normalized arithmetic, the alternating-update companion to
    // q153's PageRank.
    "q290_hits" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      graft.ops.PageRank.hits(edges, iters = 5)
    }),

    // Dedup-method Venn audit: the MinHash-LSH pair set vs the
    // SimHash-band pair set on the same corpus — |both|, each-only, and
    // the pair-set Jaccard; the governance check before swapping one
    // near-dup detector for another at 100 TB (both pair tables are the
    // bounded candidate sets; the full outer join is pair-keyed).
    "q291_dedup_venn" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val mh = Dedup.minhashPairs(docs, "doc_id", "text", shingleN = 3,
        numHashes = 8, numBands = 4, threshold = 0.3)
        .select(col("id_a"), col("id_b"), lit(1).as("__m"))
      val sh = Dedup.simhashPairs(docs, "doc_id", "text", numBands = 4,
        maxHamming = 10)
        .select(col("id_a"), col("id_b"), lit(1).as("__s"))
      mh.join(sh, Seq("id_a", "id_b"), "full")
        .agg(
          sum(when(col("__m") === 1 && col("__s") === 1, 1L).otherwise(0L))
            .as("n_both"),
          sum(when(col("__m") === 1 && col("__s").isNull, 1L).otherwise(0L))
            .as("n_minhash_only"),
          sum(when(col("__m").isNull && col("__s") === 1, 1L).otherwise(0L))
            .as("n_simhash_only"))
        .withColumn("pair_jaccard", round(col("n_both").cast("double") /
          (col("n_both") + col("n_minhash_only") + col("n_simhash_only")),
          6))
    }),

    // Fightin' Words (Monroe/Colaresi/Quinn 2008): Dirichlet-smoothed
    // z-scored log-odds of each word per source vs the rest — the
    // statistically honest "characteristic vocabulary" ranking.
    "q292_fightin_words" -> ((s, dir) =>
      TextAnalysis.fightinWords(Tables.documents(s, dir), "doc_id",
        "text", "source", alphaW = 0.01, minCount = 25)),

    // Markov entropy rate (Shannon 1948): per source, conditional
    // bigram entropy vs unigram entropy — how much one word of context
    // predicts the next; real prose vs shuffled-word spam at equal
    // unigram stats.
    "q293_entropy_rate" -> ((s, dir) =>
      TextAnalysis.entropyRate(Tables.documents(s, dir), "doc_id",
        "text", "source")),

    // Local Outlier Factor (Breunig 2000) over the 3-NN cell graph —
    // density-relative embedding outliers a global z-score cannot see.
    "q287_lof" -> ((s, dir) =>
      Similarity.lof(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 3)),

    // nDCG@5 of the IVF ANN ranking against the exact brute-force
    // ranking per query (Järvelin & Kekäläinen 2002) — the graded
    // ranking-quality audit that recall@k (q89) flattens; discounts are
    // Scala-computed literals shared with the oracle.
    "q288_ann_ndcg" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
        k = 5).select(col("query_id"), col("cand_id"),
        (lit(6) - col("rnk")).cast("long").as("__rel"))
      val ann = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 5,
        nProbe = 2)
      val disc = (1 to 5).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
      val idcg = (1 to 5).map(i => (6 - i) * disc(i - 1)).sum
      val dchain = (2 to 5).foldLeft(
        when(col("rnk") === 1, lit(disc(0)))) { (acc, i) =>
        acc.when(col("rnk") === i, lit(disc(i - 1)))
      }.otherwise(0.0)
      ann.join(exact, Seq("query_id", "cand_id"), "left")
        .na.fill(0L, Seq("__rel"))
        .withColumn("__g", round(col("__rel").cast("double") * dchain, 8))
        .groupBy("query_id")
        .agg(sum(when(col("__rel") > 0, 1L).otherwise(0L)).as("n_hits"),
          graft.core.Det.sumDet(col("__g"), 8).as("__dcg"))
        .select(col("query_id"), col("n_hits"),
          round(col("__dcg"), 6).as("dcg"),
          round(col("__dcg") / idcg, 6).as("ndcg"))
    }),

    // Query-likelihood retrieval with Dirichlet smoothing (Ponte &
    // Croft / Zhai & Lafferty) on the q76 terms — the third classic
    // lexical scorer, one word-row scan.
    "q289_query_likelihood" -> ((s, dir) =>
      Pipeline.queryLikelihood(Tables.documents(s, dir), "doc_id", "text",
        terms = Bm25Terms, mu = 10.0)),

    // Participation-ratio dimensionality: (Σλ)²/Σλ² of the covariance
    // spectrum WITHOUT eigendecomposition (tr and Frobenius only) —
    // the embedding-collapse diagnostic, riding q191's exact Gramian.
    "q285_participation_ratio" -> ((s, dir) =>
      graft.llm.EmbeddingOps.participationRatio(
        Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64)),

    // TwoNN intrinsic dimension (Facco 2017): Pareto MLE over 2nd/1st
    // neighbor cosine-distance ratios from the cell-confined 2-NN graph.
    "q286_twonn" -> ((s, dir) =>
      Similarity.twoNN(Tables.embeddings(s, dir), "vec_id", "embedding")),

    // Chinchilla-optimal token-budget audit (Hoffmann et al. 2022,
    // "Training Compute-Optimal Large Language Models" — the ~20
    // tokens/parameter rule): for a model-size grid, whether this
    // corpus's token mass — total, and exact-dedup effective (tokens of
    // keeper docs only) — covers the compute-optimal budget, and how
    // many epochs of the deduped corpus the budget implies. One corpus
    // scan + a 16-byte-key dedup aggregate; the grid is a 6-row literal.
    "q278_chinchilla_budget" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val docs = Tables.documents(s, dir)
      val toks = docs
        .withColumn("__n", size(TextOps.words(col("text"))).cast("long"))
        .withColumn("__h", md5(col("text").cast("binary")))
        .join(Dedup.exactGroups(docs, "doc_id", "text")
          .select(col("text_hash").as("__h"), col("keep_id")), Seq("__h"))
        .agg(sum(col("__n")).as("corpus_tokens"),
          sum(when(col("doc_id") === col("keep_id"), col("__n"))
            .otherwise(0L)).as("effective_tokens"))
      Seq(("125M", 125000000L), ("350M", 350000000L),
        ("1.3B", 1300000000L), ("2.7B", 2700000000L),
        ("6.7B", 6700000000L), ("13B", 13000000000L))
        .toDF("model", "params")
        .crossJoin(broadcast(toks))
        .select(col("model"), col("params"),
          (col("params") * 20).as("need_tokens"),
          col("corpus_tokens"), col("effective_tokens"),
          round(col("corpus_tokens").cast("double") /
            (col("params") * 20), 8).as("coverage"),
          round((col("params") * 20).cast("double") /
            col("effective_tokens"), 2).as("epochs_needed"))
    }),

    // Disparate-impact audit (Feldman 2015 / EEOC 80% rule) of the
    // quality classifier across languages — keep-rate ratios vs the
    // best-treated group; the governance check that "quality" is not
    // just majority-language fluency.
    "q279_disparate_impact" -> ((s, dir) =>
      TextAnalysis.disparateImpact(Tables.documents(s, dir), "doc_id",
        "text", "lang", threshold = 0.5)),

    // Brier-score decomposition (Murphy 1973): reliability, resolution,
    // uncertainty per source over the q226 bins — says whether a
    // miscalibrated filter score is worth recalibrating (resolution)
    // or carries no signal.
    "q281_brier_decomposition" -> ((s, dir) =>
      TextAnalysis.brierDecomposition(Tables.documents(s, dir), "doc_id",
        "text", col("lang") === "en", "source", nBins = 10)),

    // Positional exact-phrase search for the corpus's top bigram —
    // inverted-index-with-positions retrieval, end-to-end (argmax
    // phrase -> adjacency match -> per-doc stats).
    "q272_phrase_search" -> ((s, dir) =>
      Pipeline.phraseSearch(Tables.documents(s, dir), "doc_id", "text")),

    // Per-node local clustering coefficient (Watts-Strogatz) on the
    // near-dup graph — which docs sit in clique-like dup cores vs
    // chain joints (q170's global transitivity, localized).
    "q273_clustering_coeff" -> ((s, dir) =>
      Dedup.clusteringCoefficient(Tables.documents(s, dir), "doc_id",
        "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.3)),

    // Degree assortativity (Newman 2002) of the near-dup graph —
    // hub-hub vs hub-leaf mixing; exact integer sums over the bounded
    // edge table.
    "q274_assortativity" -> ((s, dir) =>
      Dedup.degreeAssortativity(Tables.documents(s, dir), "doc_id",
        "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.3)),

    // Distinct-1/distinct-2 diversity per source (Li et al. 2016) —
    // the degenerate-repetition metric.
    "q275_distinct_n" -> ((s, dir) =>
      TextAnalysis.distinctN(Tables.documents(s, dir), "doc_id", "text",
        "source")),

    // k-ary randomized response (Warner 1965) with debiased collection —
    // the local-DP frequency channel, seeded per occurrence so the whole
    // mechanism is deterministic and oracle-checkable.
    "q277_randomized_response" -> ((s, dir) =>
      TextAnalysis.randomizedResponse(Tables.documents(s, dir), "doc_id",
        "text", p = 0.75)),

    // Vocabulary coverage / OOV-rate curve: corpus token mass covered by
    // the top-V words at candidate vocab sizes — the tokenizer-budget
    // audit. The global rank runs over the VOCAB count table (bounded;
    // q131's Zipf class), never over token rows.
    "q221_vocab_coverage" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val freq = docs.select(explode(TextOps.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("__c"))
      val tot = freq.agg(sum(col("__c")).as("__tot"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__c").desc, col("word"))
      freq.withColumn("__rank", row_number().over(w))
        .withColumn("vocab_size",
          explode(array(Seq(100, 1000, 10000, 100000).map(lit): _*)))
        .filter(col("__rank") <= col("vocab_size"))
        .groupBy(col("vocab_size").cast("long").as("vocab_size"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("__c")).as("covered_tokens"))
        .crossJoin(broadcast(tot))
        .withColumn("coverage",
          round(col("covered_tokens").cast("double") / col("__tot"), 6))
        .withColumn("oov_rate",
          round((col("__tot") - col("covered_tokens")).cast("double") /
            col("__tot"), 6))
        .select("vocab_size", "n_types", "covered_tokens", "coverage",
          "oov_rate")
    }),

    // Pairwise Jensen-Shannon divergence between sources in embedding
    // space over 4-bit SRP sign-cells — the semantic companion to q223's
    // value-space PSI. One projection map + one (source, cell) aggregate;
    // everything after is bounded by sources x 16.
    "q225_embedding_divergence" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id").as("vec_id"), col("source"))
      Similarity.signCellJsDivergence(
        Tables.embeddings(s, dir).join(docs, Seq("vec_id")),
        "source", "embedding", inDim = 64, bits = 4)
    }),

    // Reliability diagram + ECE of the q129 hash classifier against the
    // lang='en' weak truth, per source: is the quality score calibrated
    // enough to threshold at face value?
    "q226_calibration_ece" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.calibrationEce(docs, "doc_id", "text",
        col("lang") === "en", "source", nBins = 10)
    }),

    // DoReMi-lite domain mixture weights: per-source excess NLL (bigram
    // proxy minus unigram reference LM) softmaxed into sampling weights.
    "q227_doremi_weights" -> ((s, dir) =>
      Pipeline.doremiWeights(Tables.documents(s, dir), "doc_id", "text",
        "source")),

    // Distinct-shingle cardinality per source from the k-min-value sketch
    // the dedup signatures already carry, audited against the exact
    // distinct count in the same aggregation pass.
    "q228_kmv_cardinality" -> ((s, dir) =>
      Dedup.kmvCardinality(Tables.documents(s, dir), "doc_id", "text",
        "source", shingleN = 3, numHashes = 8)),

    // Confident-learning label-noise matrix over kNN vote fractions:
    // per-class mean-self-confidence thresholds, confident-joint counts.
    "q229_confident_joint" -> ((s, dir) =>
      Similarity.confidentJoint(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label", k = 5)),

    // Interpolated Kneser-Ney bigram LM per-doc scoring — the production
    // n-gram smoothing next to q85's add-one baseline.
    "q230_kneser_ney" -> ((s, dir) =>
      Pipeline.kneserNeyLmScore(Tables.documents(s, dir), "doc_id",
        "text")),

    // External cluster-quality check on the k-means assignment: size,
    // majority label, purity per cluster.
    "q146_cluster_purity" -> ((s, dir) =>
      Similarity.clusterPurity(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label", k = 8, iters = 2)),

    // Contrastive hard negatives: top-5 nearest different-label vectors
    // per query (first 20 ids as queries).
    "q147_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", "label", k = 5)
    }),

    // Incremental SemDeDup: vec_id % 10 == 0 plays the nightly batch,
    // the rest the persisted index — quantizer and cells from the index
    // side only, verification cell-confined.
    "q148_semdedup_incr" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.semDedupIncremental(
        emb.filter(col("vec_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", threshold = 0.7)
    }),

    // Inverted-index conjunctive retrieval: posting-list intersection
    // counts for every pair of the 8 highest-df terms.
    "q149_inverted_search" -> ((s, dir) =>
      Pipeline.invertedSearch(Tables.documents(s, dir), "doc_id", "text",
        topK = 8)),

    // Closed-vocabulary OOV masking: words with document frequency < 30
    // become `<unk>`; per doc the masked text and mask counts.
    "q152_unk_mask" -> ((s, dir) =>
      TextAnalysis.unkMask(Tables.documents(s, dir), "doc_id", "text",
        minDf = 30L)),

    // Cell-confined kNN graph: top-3 cosine neighbors per vector among
    // IVF cell-mates (same ceil(sqrt(N)) quantizer as q83).
    "q154_knn_graph" -> ((s, dir) =>
      Similarity.knnGraph(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 3)),

    // Soft dedup: 1/cluster_size sampling weight per document on top of
    // the q69 near-dup clustering (singletons keep weight 1).
    "q155_soft_dedup" -> ((s, dir) =>
      Dedup.softDedupWeights(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)),

    // kNN label vote over the cell-confined graph: predicted label =
    // majority of the top-5 neighbors, vs the vector's own label — the
    // pseudo-labeling / label-error audit.
    "q159_knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label", k = 5)),

    // Token-budget epoch planning under the q82 target mixture: 1M-token
    // budget, sources repeating past 4 epochs flagged.
    "q160_token_budget" -> ((s, dir) =>
      Pipeline.tokenBudget(Tables.documents(s, dir), "source", "text",
        budgetTokens = 1000000L, weights = MixWeights)),

    // Matryoshka prefix-truncation audit: does the renormalized 16-dim
    // prefix retrieve the same top-1 neighbor as the full 64 dims, per
    // query (vec_id < 20)?
    "q161_matryoshka" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.matryoshkaRecall(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", subDim = 16)
    }),

    // Hybrid retrieval: reciprocal-rank fusion of the q76 BM25 list with
    // the dense cosine list against query vector 0 (ids align by
    // position across documents/embeddings).
    "q163_rrf_fusion" -> ((s, dir) => {
      graft.functions.VectorExpressions.register(s)
      val bm = Pipeline.bm25(Tables.documents(s, dir), "doc_id", "text",
        Bm25Terms).select(col("doc_id"), col("score"))
      val emb = Tables.embeddings(s, dir)
      val q0 = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      val cos = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q0))
        .select(col("vec_id").as("doc_id"),
          VectorOps.cosine(VectorOps.dot(col("embedding"), col("q_emb")),
            VectorOps.normSq(col("embedding")),
            VectorOps.normSq(col("q_emb"))).as("cos"))
      Pipeline.rrfFuse(bm, cos, "doc_id", "score", "cos")
    }),

    // LSH banding audit: candidate precision of the (8 hash, 4 band)
    // MinHash layer vs exact Jaccard at 0.3.
    "q164_lsh_audit" -> ((s, dir) =>
      Dedup.lshAudit(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)),

    // Split-leakage audit: which holdout (test-split) documents have a
    // near-duplicate in the train split — the QA step that catches
    // contaminated eval sets AFTER hash splitting (random splits leak
    // near-dup clusters across the boundary by construction). Composes
    // the q144 md5-bucket split with the q119 incremental band join
    // (train = index side, test = new batch); per-source leak rates.
    "q169_split_leakage" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bucket = conv(substr(md5(col("doc_id").cast("string")),
        lit(1), lit(8)), 16, 10).cast("long") % 100
      val withB = docs.withColumn("__b", bucket)
      val leaked = Dedup.minhashPairsIncremental(
        withB.filter(col("__b") >= 90), withB.filter(col("__b") < 80),
        "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.3)
        .select(col("id_b").as("doc_id")).distinct()
        .withColumn("__leaked", lit(1L))
      withB.filter(col("__b") >= 90).select(col("doc_id"), col("source"))
        .join(leaked, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_test"),
          sum(coalesce(col("__leaked"), lit(0L))).as("n_leaked"),
          round(sum(coalesce(col("__leaked"), lit(0L))).cast("double") /
            count(lit(1)), 6).as("leak_rate"))
    }),

    // PMI collocations: pointwise mutual information of adjacent word
    // pairs with count >= 30.
    "q178_pmi_pairs" -> ((s, dir) =>
      TextAnalysis.pmiPairs(Tables.documents(s, dir), "doc_id", "text",
        minCount = 30L)),

    // Per-source-pair vocabulary Jaccard overlap.
    "q179_vocab_overlap" -> ((s, dir) =>
      TextAnalysis.vocabOverlap(Tables.documents(s, dir), "doc_id", "text",
        "source")),

    // Deterministic per-epoch shuffle order: 3 epochs, 8 hash shards,
    // md5-ranked position within (epoch, shard).
    "q173_epoch_shuffle" -> ((s, dir) =>
      Pipeline.epochShuffle(Tables.documents(s, dir), "doc_id",
        epochs = 3, numShards = 8)),

    // Packed-example boundary segments (ctx 256): per (pack, doc) the
    // in-pack offset/length + doc start/end flags — the block-diagonal
    // attention/loss-mask metadata for q77-style packing.
    "q174_pack_boundaries" -> ((s, dir) =>
      Pipeline.packBoundaries(Tables.documents(s, dir), "doc_id", "text",
        streamCol = "source", ctxLen = 256L)),

    // Soft-dedup sampling realized: deterministic weighted Bernoulli
    // keep-decision from the q155 1/cluster_size weights.
    "q171_weighted_sample" -> ((s, dir) =>
      Dedup.weightedSample(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)),

    // Dup-graph shape QA: wedge/triangle census + transitivity of the
    // verified near-dup pair graph (clique-like clusters are safe to
    // collapse; chain-like ones signal transitive drift).
    "q170_dup_graph_stats" -> ((s, dir) =>
      Dedup.dupGraphStats(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)),

    // BPE end-to-end: train 8 merges on the corpus (bounded-vocab loop,
    // driver syncs one top-1 pair per rank), encode every document with
    // the greedy fold. Golden oracle: tools/golden_bpe.py, an independent
    // pure-Python implementation of the published algorithm.
    "q166_bpe_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.llm.Bpe.encode(docs, "doc_id", "text",
        graft.llm.Bpe.learnMerges(docs, "text", numMerges = 8)
          .map(m => (m.left, m.right)))
    }),

    // Weight-sensitive fixed-size sampling per source (Duffield-Lund-
    // Thorup priority sampling): inclusion probability ∝ n_chars, one
    // map pass + a WindowGroupLimit-pruned per-stratum top-k. The
    // cross-engine-safe cousin of E-S reservoir sampling (single IEEE
    // division, no pow/log).
    "q188_priority_sample" -> ((s, dir) =>
      Pipeline.prioritySample(Tables.documents(s, dir), "doc_id", "source",
        "n_chars", k = 20)),

    // Record-linkage pairs: (lang × 10-char prefix) blocking, Levenshtein
    // verification over 40-char prefixes — catches the near-identical-
    // prefix duplicates shingle methods under-score.
    "q189_edit_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir), "doc_id", "text",
        "lang")),

    // INT8 affine quantization audit: per-dimension [min,max] → 0..255
    // codes with worst/mean dequantization error — the storage-layout QA
    // before an SQ8 index build. Error means go through exact integer
    // sums (floor-quantized 1e-9), never order-dependent double adds.
    "q190_int8_quant" -> ((s, dir) =>
      graft.llm.EmbeddingOps.int8QuantAudit(
        Tables.embeddings(s, dir), "vec_id", "embedding")),

    // Spectral corpus diagnostic: exact fixed-point covariance Gramian
    // (one pass, dim² map-side partials) + 9 power iterations on the
    // collected 64×64 cell table — top principal loading, eigenvalue,
    // and explained-variance fraction, bit-mirrored by a list_reduce
    // CTE chain in the oracle.
    "q191_top_pc" -> ((s, dir) =>
      graft.llm.EmbeddingOps.topPrincipalComponent(
        Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64)),

    // All-but-the-Top anisotropy correction (Mu & Viswanath 2018): per
    // vector, the coefficient along the unit top principal direction and
    // the residual squared norm — map-only against plan-time literal
    // μ/u vectors (the centered dot distributes), zero rounding,
    // bit-exact against the oracle's list_reduce chain.
    "q192_abtt" -> ((s, dir) =>
      graft.llm.EmbeddingOps.allButTop(
        Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64)),

    // Per-document lexical diversity: TTR, hapax fraction, unigram
    // entropy — document-granularity template/spam signals (q86 is the
    // per-source panel). One exchange end-to-end.
    "q194_lexical_diversity" -> ((s, dir) =>
      TextAnalysis.lexicalDiversity(Tables.documents(s, dir), "doc_id",
        "text")),

    // Staged dedup verdict: exact keep-first, then near-dup clustering
    // over the survivors — the per-document decision table (verdict +
    // provenance) a corpus build materializes. The LLM-layer composed
    // lifecycle, q134's analog.
    "q196_dedup_verdict" -> ((s, dir) =>
      Dedup.dedupVerdict(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)),

    // Greedy k-center coreset (Gonzalez 1985): 8 diversity-maximizing
    // exemplars — k−1 map-only scoring passes against plan-time literal
    // centers + one global min_by each; the k-center radius curve comes
    // out as max_cos per rank.
    "q195_kcenter" -> ((s, dir) =>
      graft.llm.EmbeddingOps.kCenterCoreset(
        Tables.embeddings(s, dir), "vec_id", "embedding", k = 8)),

    // Cross-signal curation diagnostic: per (source, within-source
    // quality decile), how much of the corpus is near-duplicated — the
    // "is our low-quality content also the duplicated content" question
    // that decides whether one filter subsumes the other. Deciles
    // partition by source (bounded window groups, the q172 argument),
    // dup flags ride the bounded cluster table.
    "q199_quality_dup_matrix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val qual = TextAnalysis.quality(docs, "doc_id", "text",
        extraCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("quality_score"))
      val dup = Dedup.dedupClusters(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)
        .select(col("doc_id"), lit(1).as("__dup"))
      qual.join(dup, Seq("doc_id"), "left")
        .withColumn("decile", ntile(10).over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")
            .orderBy(col("quality_score"), col("doc_id"))).cast("long"))
        .groupBy("source", "decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("__dup"), lit(0))).as("n_dup"),
          round(sum(coalesce(col("__dup"), lit(0))).cast("double")
            / count(lit(1)), 6).as("dup_rate"))
    }),

    // Multi-probe LSH recall audit (Lv et al. 2007): per query, how many
    // exact top-5 neighbors the plain band match reaches vs the 1-bit
    // perturbation probes — recall-per-memory evidence for probing over
    // more hash tables.
    "q198_multiprobe" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.multiProbeRecall(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 5)
    }),

    // b-bit minwise hashing audit (Li & König 2010): per candidate pair,
    // exact Jaccard vs the full-signature estimate vs the 4-bit-slot
    // estimate with the 2^-b collision-floor correction — sizes the 16×
    // signature-store compression before a corpus-scale build.
    "q197_bbit_minhash" -> ((s, dir) =>
      Dedup.bbitMinhashEstimate(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, b = 4)),

    // Corpus snapshot diff: two deterministic "crawl generations" carved
    // from the documents table (old drops doc_id%11==0, new drops
    // doc_id%13==0 and revises doc_id%7==0), then the per-source
    // add/remove/change/unchanged audit. Content collapses to md5
    // digests before the one full-outer id join — text never shuffles.
    "q200_corpus_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val old = docs.filter(col("doc_id") % 11 =!= 0)
      val neu = docs.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      Pipeline.corpusDiff(old, neu, "doc_id", "text", "source")
    }),

    // Heaps'-law vocabulary-growth fit over 64 id-ordered corpus epochs —
    // Zipf's (q131) companion distributional-health diagnostic; β far
    // from ~0.5 flags template floods or vocabulary collapse.
    "q201_heaps_fit" -> ((s, dir) =>
      TextAnalysis.heapsFit(Tables.documents(s, dir), "doc_id", "text")),

    // Winnowing (MOSS) fingerprint overlap: windowed-min char-gram
    // selection guarantees any shared substring of >= k+w-1 chars yields
    // a shared fingerprint — the local-match detector that catches
    // partial plagiarism/boilerplate the whole-doc hash (q84) and
    // bag-of-shingles MinHash both miss.
    "q203_winnowing" -> ((s, dir) =>
      Dedup.winnowingPairs(Tables.documents(s, dir), "doc_id", "text",
        k = 8, w = 4, maxDf = 10)),

    // Tokenizer fertility per language: learned-subword tokens per word
    // and chars per token from the q166 BPE encode, aggregated over the
    // lang tag — the per-language cost table that decides sampling
    // weights when one tokenizer serves a multilingual corpus. Integer
    // sums + one rounded division; golden oracle extends
    // tools/golden_bpe.py's independent implementation.
    "q204_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val enc = graft.llm.Bpe.encode(docs, "doc_id", "text",
        graft.llm.Bpe.learnMerges(docs, "text", numMerges = 8)
          .map(m => (m.left, m.right)))
      docs.select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("__chars"))
        .join(enc.select(col("doc_id"), col("n_words"), col("n_tokens")),
          Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("total_words"),
          sum("n_tokens").as("total_tokens"),
          sum("__chars").as("total_chars"),
          round(sum("n_tokens").cast("double") / sum("n_words"), 6)
            .as("fertility"),
          round(sum("__chars").cast("double") / sum("n_tokens"), 6)
            .as("chars_per_token"))
    }),

    // Per-source boilerplate panel: top-3 16-char document prefixes and
    // suffixes with corpus shares — crawl templates concentrate there;
    // a high top-1 share means "strip before dedup/training".
    "q205_boilerplate" -> ((s, dir) =>
      TextAnalysis.boilerplateGrams(Tables.documents(s, dir), "doc_id",
        "text", "source", gramLen = 16, topK = 3)),

    // Label-separation audit: the L x L centroid-cosine confusability
    // matrix with per-label tightness on the diagonal — the space-health
    // check before kNN classify (q159) / hard-negative mining (q147).
    "q207_label_separation" -> ((s, dir) =>
      graft.llm.EmbeddingOps.labelSeparation(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label", dim = 64)),

    // Per-source quantile normalization of the quality score: raw
    // scores map to within-source percentile ranks, so one global
    // threshold selects fairly across sources whose scorers calibrate
    // differently — the normalization step upstream of every
    // "keep the global top X%" decision.
    "q209_quantile_norm" -> ((s, dir) => {
      val q = TextAnalysis.quality(Tables.documents(s, dir), "doc_id",
        "text", extraCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("quality_score"))
      TextAnalysis.quantileNormalize(q, "doc_id", "quality_score", "source")
    }),

    // Shard-rebalance audit: fraction of docs that move when shards grow
    // 8 -> 9, mod-hash vs rendezvous — the measured case for HRW
    // placement before committing a 100 TB corpus to a shard scheme.
    "q212_rebalance" -> ((s, dir) =>
      Pipeline.rebalanceAudit(Tables.documents(s, dir), "doc_id",
        fromShards = 8)),

    // Dedup-adjusted effective token mass per source: raw token counts
    // vs the soft-weight (1/cluster_size) discounted mass, plus the
    // inflation ratio — the "how much of this source is really new
    // signal" number that token budgets (q150) should consume instead
    // of raw counts. Rides the q155 cluster weights + one token scan.
    "q211_effective_tokens" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = Dedup.softDedupWeights(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)
      docs.select(col("doc_id"), col("source"),
          size(TextOps.words(col("text"))).cast("long").as("toks"))
        .join(w.select(col("doc_id"), col("weight")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("raw_tokens"),
          round(graft.core.Det.sumDet(col("toks") * col("weight"), 6), 6)
            .as("effective_tokens"))
        .withColumn("inflation",
          when(col("effective_tokens") > 0.0,
            round(col("raw_tokens") / col("effective_tokens"), 6)))
    }),

    // Neyman minimum-variance sampling allocation: a 100-doc labeling
    // budget split across sources proportional to N_h * S_h — the
    // classical optimum for estimating the corpus mean quality, and the
    // principled replacement for proportional quotas (q77) when strata
    // differ in score spread.
    "q210_neyman_alloc" -> ((s, dir) => {
      val q = TextAnalysis.quality(Tables.documents(s, dir), "doc_id",
        "text", extraCols = Seq("source"))
        .select(col("source"), col("quality_score"))
      Pipeline.neymanAllocation(q, "source", "quality_score", budget = 100L)
    }),

    // Filter-agreement matrix: Cohen's kappa between the three main keep
    // decisions (quality score, Gopher rules, perplexity cutoff) — the
    // "are these filters redundant or complementary" question that
    // decides a pipeline's filter stack (q199 asks it for quality vs
    // dup). Three keep columns join on the doc id; all nine counts fold
    // into ONE conditional aggregate; per-pair rows explode from the
    // single aggregate row with the kappa arithmetic op-for-op identical
    // to the oracle's.
    "q208_filter_kappa" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val fa = TextAnalysis.quality(docs, "doc_id", "text")
        .select(col("doc_id"),
          coalesce(col("quality_score") >= 0.73, lit(false)).as("fa"))
      val fb = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 10)
        .select(col("doc_id"), col("keep").as("fb"))
      val fc = Pipeline.perplexityFilter(docs, "doc_id", "text", cutoff = 3.39)
        .select(col("doc_id"), col("kept").as("fc"))
      val j = fa.join(fb, Seq("doc_id")).join(fc, Seq("doc_id"))
      val pairs = Seq(("quality", "gopher", "fa", "fb"),
        ("quality", "perplexity", "fa", "fc"),
        ("gopher", "perplexity", "fb", "fc"))
      val aggExprs = count(lit(1)).as("__n") +:
        pairs.zipWithIndex.flatMap { case ((_, _, x, y), i) =>
          Seq(sum(when(col(x), 1L).otherwise(0L)).as(s"__ka$i"),
            sum(when(col(y), 1L).otherwise(0L)).as(s"__kb$i"),
            sum(when(col(x) && col(y), 1L).otherwise(0L)).as(s"__kab$i"))
        }
      val g = j.agg(aggExprs.head, aggExprs.tail: _*)
      g.select(explode(array(pairs.zipWithIndex.map { case ((na, nb, _, _), i) =>
          struct(lit(na).as("filter_a"), lit(nb).as("filter_b"),
            col("__n").as("n_docs"), col(s"__ka$i").as("n_keep_a"),
            col(s"__kb$i").as("n_keep_b"), col(s"__kab$i").as("n_keep_both"))
        }: _*)).as("p"))
        .select(col("p.*"))
        .withColumn("__pa", col("n_keep_a").cast("double") / col("n_docs"))
        .withColumn("__pb", col("n_keep_b").cast("double") / col("n_docs"))
        .withColumn("__po", (col("n_keep_both") * 2 + col("n_docs")
          - col("n_keep_a") - col("n_keep_b")).cast("double") / col("n_docs"))
        .withColumn("__pe", col("__pa") * col("__pb")
          + (lit(1.0) - col("__pa")) * (lit(1.0) - col("__pb")))
        .select(col("filter_a"), col("filter_b"), col("n_docs"),
          col("n_keep_a"), col("n_keep_b"), col("n_keep_both"),
          round(col("__po"), 6).as("po"), round(col("__pe"), 6).as("pe"),
          // degenerate pair (a filter keeps all or none on both sides):
          // pe = 1 makes kappa 0/0 — NULL on both engines, not an ANSI
          // divide-by-zero
          when(col("__pe") =!= 1.0,
            round((col("__po") - col("__pe")) / (lit(1.0) - col("__pe")), 6))
            .as("kappa"))
    }),

    // Theta/KMV-sketch shard persist → re-merge (q241's sketch under
    // q231's incremental-crawl workflow): per (source, doc-shard)
    // bottom-k sketches write to parquet, reload, re-merge by
    // union-then-bottom-k, and must reproduce the corpus-at-once
    // bottom-k POSITION-FOR-POSITION (each corpus bottom-k element is
    // retained by its own shard, so the union is a superset — the KMV
    // mergeability invariant). est_distinct = (k−1)·2⁶⁰/kth.
    "q294_theta_persist" -> ((s, dir) => {
      val k = 64
      val path = s"${IoQueries.sinkDir}/q294_theta_shards"
      val sh = Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("shard", pmod(col("doc_id"), lit(4L)))
        .select(col("shard"), col("source"),
          explode(TextOps.shingles(TextOps.words(col("text")), 3)).as("g"))
        .select(col("shard"), col("source"),
          substring(md5(col("g")), 1, 16).as("gk"))
        .distinct()
        .withColumn("__h", TextOps.wordHash60(col("gk")))
        .localCheckpoint() // shard sketches + direct side share one scan
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy("shard", "source").orderBy(col("__h"), col("gk"))
      sh.withColumn("__rnk", row_number().over(ws))
        .filter(col("__rnk") <= k)
        .select("shard", "source", "gk", "__h")
        .write.mode("overwrite").parquet(path)
      val shards = s.read.parquet(path).localCheckpoint()
      val wm = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("__h"), col("gk"))
      def bottomK(df: DataFrame) = df.select("source", "gk", "__h")
        .distinct().withColumn("__rnk", row_number().over(wm))
        .filter(col("__rnk") <= k)
      val merged = bottomK(shards)
      val direct = bottomK(sh)
      merged.select(col("source"), col("__rnk"),
          col("gk").as("__gm"), col("__h").as("__hm"))
        .join(direct.select(col("source"), col("__rnk"),
          col("gk").as("__gd"), col("__h").as("__hd")),
          Seq("source", "__rnk"), "full")
        .groupBy("source")
        .agg(count(lit(1)).as("n_retained"),
          sum(when(col("__gm") <=> col("__gd") &&
            col("__hm") <=> col("__hd"), 1L).otherwise(0L)).as("n_eq"),
          max(when(col("__rnk") === k, col("__hm"))).as("__kth"))
        .join(broadcast(shards.groupBy("source")
          .agg(countDistinct(col("shard")).as("n_shards"))), Seq("source"))
        .select(col("source"), col("n_shards"), col("n_retained"),
          col("n_eq"), (col("n_eq") === col("n_retained")).as("merge_exact"),
          round(lit((k - 1).toDouble) *
            lit(1152921504606846976L).cast("double") /
            col("__kth").cast("double"), 4).as("est_distinct"))
    }),

    // Moments-sketch shard persist → re-merge (q237 under the q231
    // workflow): per (source, doc-shard) power sums of ln(len) persist
    // as EXACT DECIMALS (persisting the double cast would re-round the
    // re-merge), reload, merge by +, and the Cornish-Fisher quantile
    // estimates must equal the corpus-at-once sketch value-for-value —
    // decimal addition is exact and associative, so they do.
    "q295_moments_persist" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val path = s"${IoQueries.sinkDir}/q295_moment_shards"
      val base = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          round(log(length(col("text")).cast("double")), 8).as("__t"))
        .withColumn("__t2", round(col("__t") * col("__t"), 8))
        .withColumn("__t3", round(col("__t2") * col("__t"), 8))
        .withColumn("__t4", round(col("__t3") * col("__t"), 8))
        .localCheckpoint() // shard side + direct side share one scan
      def dsum8(c: org.apache.spark.sql.Column) =
        sum(c.cast(DecimalType(24, 8)))
      base.withColumn("shard", pmod(col("doc_id"), lit(4L)))
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n"), dsum8(col("__t")).as("s1"),
          dsum8(col("__t2")).as("s2"), dsum8(col("__t3")).as("s3"),
          dsum8(col("__t4")).as("s4"))
        .write.mode("overwrite").parquet(path)
      val merged = s.read.parquet(path).groupBy("source")
        .agg(countDistinct(col("shard")).as("n_shards"),
          sum(col("n")).as("n_docs"),
          sum(col("s1")).cast("double").as("__s1"),
          sum(col("s2")).cast("double").as("__s2"),
          sum(col("s3")).cast("double").as("__s3"),
          sum(col("s4")).cast("double").as("__s4"))
      val direct = base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          dsum8(col("__t")).cast("double").as("__s1"),
          dsum8(col("__t2")).cast("double").as("__s2"),
          dsum8(col("__t3")).cast("double").as("__s3"),
          dsum8(col("__t4")).cast("double").as("__s4"))
      def cfCols(df: DataFrame): DataFrame = df
        .withColumn("__n", col("n_docs").cast("double"))
        .withColumn("__mu", col("__s1") / col("__n"))
        .withColumn("__m2",
          col("__s2") / col("__n") - col("__mu") * col("__mu"))
        .withColumn("__sd", sqrt(col("__m2")))
        .withColumn("__sk",
          (col("__s3") / col("__n") - lit(3.0) * col("__mu") * col("__m2")
            - col("__mu") * col("__mu") * col("__mu")) /
            (col("__m2") * col("__sd")))
        .withColumn("__ku",
          (col("__s4") / col("__n")
            - lit(4.0) * col("__mu") * (col("__s3") / col("__n"))
            + lit(6.0) * col("__mu") * col("__mu") *
              (col("__s2") / col("__n"))
            - lit(3.0) * col("__mu") * col("__mu") * col("__mu") *
              col("__mu")) / (col("__m2") * col("__m2")) - lit(3.0))
      def cf(z: Double): org.apache.spark.sql.Column =
        col("__mu") + col("__sd") * lit(z) +
          col("__sd") * col("__sk") * lit(CfK1(z)) +
          col("__sd") * col("__ku") * lit(CfK2(z)) +
          col("__sd") * col("__sk") * col("__sk") * lit(CfK3(z))
      val m = cfCols(merged).select(col("source"), col("n_shards"),
        col("n_docs"), round(cf(0.0), 6).as("est_p50"),
        round(cf(Z90), 6).as("est_p90"))
      val d = cfCols(direct).select(col("source"),
        round(cf(0.0), 6).as("__d50"), round(cf(Z90), 6).as("__d90"))
      m.join(d, Seq("source"))
        .select(col("source"), col("n_shards"), col("n_docs"),
          col("est_p50"), col("est_p90"),
          (col("est_p50") <=> col("__d50") &&
            col("est_p90") <=> col("__d90")).as("persist_exact"))
    }),

    // HyperBall register persist across an incremental edge batch
    // (q240 under the q231 workflow) — the real incremental-crawl
    // ball-growth audit: batch-1 t=1 registers checkpoint to parquet,
    // batch 2 max-merges in, one more round runs on the union graph,
    // and the state must equal a from-scratch t=2 run register-for-
    // register. Contract and math in ops/HyperBall.scala.
    "q296_hyperball_persist" -> ((s, dir) =>
      graft.ops.HyperBall.incrementalRegisterAudit(s,
        Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.3)
          .select(col("id_a"), col("id_b")),
        s"${IoQueries.sinkDir}/q296_hyperball_regs")),

    // Fixed-round k-core peeling (Seidman 1983) on the near-dup graph —
    // the dense template-family backbone that per-pair degree
    // underestimates; n_removed = 0 on the last row means converged.
    "q297_kcore" -> ((s, dir) =>
      Dedup.kCorePeel(Tables.documents(s, dir), "doc_id", "text",
        k = 2, rounds = 3, shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.3)),

    // TextTiling lexical cohesion (Hearst 1997): adjacent fixed-size
    // token blocks compared by exact-integer cosine — low cohesion +
    // many boundaries flags concatenation artifacts that doc-level
    // quality scores miss.
    "q298_texttiling" -> ((s, dir) =>
      TextAnalysis.textTiling(Tables.documents(s, dir), "doc_id", "text",
        blockTokens = 20, boundaryBelow = 0.15)),

    // Exact duplicated-substring profile (Lee et al. 2022, ExactSubstr):
    // per source, the docs carrying ≥1 verbatim 8-token span that occurs
    // elsewhere in the corpus and the token mass inside such spans — the
    // partial-overlap memorization signal doc-level dedup cannot see.
    "q299_substring_dup" -> ((s, dir) =>
      Dedup.exactSubstringDupProfile(Tables.documents(s, dir), "doc_id",
        "text", "source", gramN = 8)),

    // ExactSubstr dup-key census persist → re-merge (q299's census under
    // the q294/q295 incremental-crawl workflow): per-shard gram-count
    // tables persist to parquet, reload, re-merge by one sum per key,
    // and must reproduce the corpus-at-once census key-for-key — the
    // memorization-risk audit run the way a real crawl would run it.
    "q300_substr_census_persist" -> ((s, dir) =>
      Dedup.exactSubstringCensusRoundTrip(Tables.documents(s, dir),
        "doc_id", "text", s"${IoQueries.sinkDir}/q300_substr_census",
        gramN = 8, numShards = 4)),

    // Within-doc duplicated 5-gram token mass (Rae et al. 2021, the
    // Gopher dup-n-gram repetition filters): the INTRA-doc complement
    // of q299 — a globally unique doc can still be internally
    // degenerate (loops, template stutter), a quality signal doc-level
    // and cross-doc dedup both miss. Flag threshold 1/5 compares as an
    // integer cross-multiply, never a double boundary.
    "q301_intradoc_dupgrams" -> ((s, dir) =>
      Dedup.intraDocDupGramProfile(Tables.documents(s, dir), "doc_id",
        "text", "source", gramN = 5, flagNum = 1, flagDen = 5)),

    // SQ8 retrieval-degradation audit: recall@5 of brute cosine over
    // per-dim uint8 dequantized vectors vs exact float — what the 4x
    // storage compression costs in RANKING (q190 prices reconstruction
    // error; errors do not compose linearly into rank flips).
    "q302_sq8_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.recallVsExact(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", k = 5,
        Similarity.sq8TopK(emb.filter(col("vec_id") < 20), emb,
          "vec_id", "embedding", k = 5))
    }),

    // Cross-source verbatim leakage matrix: distinct 8-token windows
    // shared by each source pair, with containment + Jaccard — the
    // sub-document decontamination grain doc-level overlap (q138/q220)
    // cannot see.
    "q303_source_gram_leakage" -> ((s, dir) =>
      Dedup.sourceGramLeakage(Tables.documents(s, dir), "doc_id",
        "text", "source", gramN = 8)),

    // IVF cell-drift audit after an incremental crawl batch: the frozen
    // coarse quantizer (trained on the even-id half) absorbs the odd-id
    // half; per cell, old/new/total populations, post-batch load factor,
    // and a needs_split verdict at load > 2x mean (integer
    // cross-multiply) - the ANN-index maintenance signal.
    "q305_ivf_cell_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfCellDriftAudit(
        emb.filter(pmod(col("vec_id"), lit(2L)) === 0L),
        emb.filter(pmod(col("vec_id"), lit(2L)) === 1L),
        "vec_id", "embedding")
    }),

    // Per-label centroid drift between crawl batches (first-moment
    // companion to q225's sign-cell JS): cosine of old/new batch
    // centroids from exact fixed-point sums - the 1/n factors cancel,
    // so the whole statistic is integer-exact up to one final double
    // expression.
    "q306_centroid_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      EmbeddingOps.centroidDrift(
        emb.filter(pmod(col("vec_id"), lit(2L)) === 0L),
        emb.filter(pmod(col("vec_id"), lit(2L)) === 1L),
        "label", "embedding")
    }),

    // Verbatim-window doc-pair evidence: doc pairs sharing >= 2 rare
    // (df <= 8) 8-token windows - the pair-grain copying proof between
    // q299's corpus profile and q303's source matrix, df-guarded so the
    // fan-out is Sigma df^2 bounded, never all-pairs.
    "q307_substr_pairs" -> ((s, dir) =>
      Dedup.substrDocPairs(Tables.documents(s, dir), "doc_id", "text",
        gramN = 8, dfMax = 8, minShared = 2)),

    // Per-source crawl churn from MERGED MinHash signatures (Broder's
    // union property, the q220 machinery turned inward): each source's
    // old-batch signature vs its new-batch signature estimates the
    // shingle-set Jaccard across crawl generations - high churn flags a
    // source whose content rotates (news) vs accumulates (reference).
    // Sketch-sized state per source; the text scans once per batch.
    // The batch split is a SALTED md5 hash, not id parity: the synthetic
    // ids are round-robin by source, so parity correlates perfectly with
    // source and every source would land in exactly one half.
    "q308_source_churn" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def half(r: Long) = Dedup.mergedMinhash(
        docs.filter(conv(substring(md5(concat(lit("churn1"),
          col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 2 === r), "doc_id",
        "text", "source", shingleN = 3, numHashes = 8)
      half(0L).select(col("source"), col("mh").as("__ma"))
        .join(half(1L).select(col("source"), col("mh").as("__mb")),
          Seq("source"))
        .withColumn("n_eq", expr(
          "size(filter(zip_with(__ma, __mb, (x, y) -> x = y), v -> v))")
          .cast("long"))
        .withColumn("est_jaccard", round(col("n_eq").cast("double") / 8, 6))
        .withColumn("est_churn",
          round(lit(1.0) - col("n_eq").cast("double") / 8, 6))
        .select("source", "n_eq", "est_jaccard", "est_churn")
    }),

    // Cross-batch LM drift: a Kneser-Ney model trained on the old crawl
    // half scores the new half, rolled up per source - rising unseen
    // fraction / NLL flags sources whose language shifts between
    // generations (the temporal register of q245's in/out-domain
    // Moore-Lewis). Same salted hash split as q308; the left-join
    // scoring surfaces unseen bigrams instead of dropping them.
    "q309_lm_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def half(r: Long) = docs.filter(conv(substring(md5(concat(
        lit("churn1"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 2 === r)
      val model = Pipeline.kneserNeyModel(half(0L), "doc_id", "text")
      Pipeline.kneserNeyScore(half(1L), "doc_id", "text", model)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("n_bigrams"),
          sum(col("n_unseen")).as("n_unseen"),
          count(col("avg_nll_kn")).as("__ns"),
          graft.core.Det.sumDet(col("avg_nll_kn"), scale = 6).as("__sum"))
        .select(col("source"), col("n_docs"), col("n_bigrams"),
          col("n_unseen"),
          when(col("n_bigrams") > 0, col("n_unseen").cast("double") /
            col("n_bigrams").cast("double")).as("unseen_frac"),
          when(col("__ns") > 0, round(col("__sum") / col("__ns"), 6))
            .as("mean_doc_nll"))
    }),

    // Local-match method Venn at the DOC level (q291's register, turned
    // on the two sub-document detectors): winnowing char-gram
    // fingerprints vs ExactSubstr token windows - docs only one method
    // flags show each detector's blind spot (char-grams catch
    // whitespace/tokenization-robust overlap; token windows catch exact
    // verbatim runs). Both doc sets derive from BOUNDED df-guarded pair
    // tables, never corpus joins.
    "q310_local_dup_venn" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def docsOf(p: org.apache.spark.sql.DataFrame) =
        p.select(col("id_a").as("doc_id"))
          .unionAll(p.select(col("id_b").as("doc_id"))).distinct()
      val win = docsOf(Dedup.winnowingPairs(docs, "doc_id", "text",
        k = 8, w = 4, maxDf = 10)).withColumn("__w", lit(1L))
      val sub = docsOf(Dedup.substrDocPairs(docs, "doc_id", "text",
        gramN = 8, dfMax = 8, minShared = 2)).withColumn("__s", lit(1L))
      docs.select(col("doc_id"), col("source"))
        .join(win, Seq("doc_id"), "left")
        .join(sub, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__w").isNotNull && col("__s").isNotNull, 1L)
            .otherwise(0L)).as("n_both"),
          sum(when(col("__w").isNotNull && col("__s").isNull, 1L)
            .otherwise(0L)).as("n_win_only"),
          sum(when(col("__w").isNull && col("__s").isNotNull, 1L)
            .otherwise(0L)).as("n_substr_only"),
          sum(when(col("__w").isNull && col("__s").isNull, 1L)
            .otherwise(0L)).as("n_neither"))
    }),

    // Hubness audit (Radovanovic, Nanopoulos & Ivanovic 2010, "Hubs in
    // Space"): the k-occurrence distribution of the cell-confined kNN
    // graph - N_k in-degree per vector, antihubs (never anyone's
    // neighbor), hubs (N_k > 2k), and the distribution's skewness from
    // EXACT integer moment sums (one double expression at the end) -
    // high skew means a few hub vectors dominate retrieval results and
    // ANN recall degrades asymmetrically.
    "q311_hubness" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3)
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      def d2d(c: org.apache.spark.sql.Column) =
        c.cast("string").cast("double")
      def dsum(c: org.apache.spark.sql.Column) =
        sum(c).cast("decimal(38,0)")
      val kc = emb.select(col("vec_id"))
        .join(g.groupBy(col("nbr_id").as("vec_id"))
          .agg(count(lit(1)).as("kc")), Seq("vec_id"), "left")
        .na.fill(0L, Seq("kc"))
      val nd = col("n_nodes").cast("double")
      kc.agg(count(lit(1)).as("n_nodes"),
          sum(when(col("kc") === 0, 1L).otherwise(0L)).as("n_antihubs"),
          sum(when(col("kc") > 6, 1L).otherwise(0L)).as("n_hubs"),
          max(col("kc")).as("max_kocc"),
          dsum(dec(col("kc"))).as("__s1"),
          dsum(dec(col("kc")) * dec(col("kc"))).as("__s2"),
          dsum(dec(col("kc")) * dec(col("kc")) * dec(col("kc"))).as("__s3"))
        .withColumn("__v2",
          dec(col("n_nodes")) * col("__s2") - col("__s1") * col("__s1"))
        .withColumn("__v3",
          dec(col("n_nodes")) * dec(col("n_nodes")) * col("__s3")
            - lit(3) * dec(col("n_nodes")) * col("__s1") * col("__s2")
            + lit(2) * col("__s1") * col("__s1") * col("__s1"))
        .select(col("n_nodes"), col("n_antihubs"), col("n_hubs"),
          col("max_kocc"),
          (d2d(col("__s1")) / nd).as("mean_kocc"),
          when(col("__v2") > 0,
            (d2d(col("__v3")) / (nd * nd * nd)) /
              ((d2d(col("__v2")) / (nd * nd)) *
                sqrt(d2d(col("__v2")) / (nd * nd)))).as("skew_kocc"))
    }),

    // IVF assignment-margin audit: per cell, the mass of vectors whose
    // top-2 cell cosines differ by < 0.05 - boundary vectors churn
    // cells on any retrain, so high boundary fraction = unstable cell
    // regardless of size. Top-2 from ONE per-row fold over the
    // broadcast centroid array (no shuffle; a windowed top-2 over
    // row x cell rows is the round-10 anti-pattern).
    "q312_ivf_boundary" -> ((s, dir) =>
      Similarity.ivfBoundaryAudit(Tables.embeddings(s, dir), "vec_id",
        "embedding", eps = 0.05)),

    // IVF cell-split remediation: the operator that ACTS on q305's
    // flags - local 2-means (lowest-vid seeds + one distributed Lloyd
    // round in exact fixed-point sums) on each overloaded cell, then
    // the post-split load table. Threshold 6/5 (vs the audit's policy
    // 2x) so the split path exercises on the near-uniform synthetic
    // embeddings - the rational-threshold rule stays an integer
    // cross-multiply. Same frozen even/odd quantizer as q305.
    "q313_ivf_cell_split" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfCellSplit(
        emb.filter(pmod(col("vec_id"), lit(2L)) === 0L),
        emb.filter(pmod(col("vec_id"), lit(2L)) === 1L),
        "vec_id", "embedding", thrNum = 6, thrDen = 5)
    }),

    // Recall@5 of the POST-SPLIT index vs exact cosine (the q115
    // harness on q313's output): proves the rebalance did not cost
    // retrieval quality. Probes rank in the split's own fixed-point
    // arithmetic; the final rerank is the q89 shape. nProbe = 5 is the
    // pre-split budget of 4 scaled with the list growth
    // (ceil(4*L'/L) = 5 at every test SF: 18/16, 18/16, 34/32) - the
    // FAISS practice; a FIXED budget over more, smaller cells measurably
    // dilutes coverage (0.68 -> 0.66 at sf0.01), while the scaled budget
    // holds it (0.69 >= 0.68, asserted by IvfSplitSpec).
    "q314_ivf_split_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 20)
      Similarity.recallVsExact(q, emb, "vec_id", "embedding", k = 5,
        Similarity.ivfSplitTopK(q,
          emb.filter(pmod(col("vec_id"), lit(2L)) === 0L),
          emb.filter(pmod(col("vec_id"), lit(2L)) === 1L),
          "vec_id", "embedding", k = 5, nProbe = 5,
          thrNum = 6, thrDen = 5))
    }),

    // Variable-length duplicated-span statistics (the true ExactSubstr
    // grain): per (source, log2-length bucket), the span-length
    // histogram of maximal cross-doc duplicated runs plus the count of
    // docs whose LONGEST span lands in the bucket - "one 400-token
    // verbatim block" vs "fifty scattered 8-token spans" at equal mass,
    // the distinction q299's token-mass rollup cannot see.
    "q315_dup_span_hist" -> ((s, dir) =>
      Dedup.dupSpanHistogram(Tables.documents(s, dir), "doc_id",
        "text", "source", gramN = 8))
  )

  /** q82 target mixture weights (sources outside the map get weight 0). */
  val MixWeights: Map[String, Double] =
    Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)

  /** Fixed BM25 query-term set (must stay in sync with the q76 oracle). */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "vector")

  /** q78 per-language sampling rates, permille. */
  val SampleRates: Map[String, Int] =
    Map("en" -> 500, "fr" -> 250, "es" -> 250, "de" -> 125)

  /** q237 Cornish-Fisher machinery: Phi^-1(0.9) and the per-z expansion
    * coefficients, precomputed once as Scala doubles so the Spark plan
    * (via `lit`) and the DuckDB oracle (via string interpolation) run
    * identical IEEE arithmetic — Scala's shortest-round-trip double
    * printing reparses to the same bits on both engines. */
  private val Z90 = 1.2815515655446004
  private def CfK1(z: Double): Double = (z * z - 1.0) / 6.0
  private def CfK2(z: Double): Double = (z * z * z - 3.0 * z) / 24.0
  private def CfK3(z: Double): Double = -(2.0 * z * z * z - 5.0 * z) / 36.0

  /** Shared SQL fragments for the oracle. */
  private val WORDS =
    "list_filter(string_split(lower(text), ' '), w -> w <> '')"

  /** q85's add-one-smoothed bigram-LM scoring SQL, shared by the q125
    * perplexity-filter oracle (which wraps it with bucket/keep columns). */
  private def bigramLmSql: String =
    s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
       |b2 AS (
       |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
       |  FROM (SELECT doc_id, unnest(list_transform(
       |          range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
       |        FROM wr WHERE len(w) >= 2)),
       |counts AS (SELECT w1, w2, COUNT(*) AS c12 FROM b2 GROUP BY 1, 2),
       |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM counts GROUP BY 1),
       |v AS (SELECT COUNT(DISTINCT word) AS v
       |      FROM (SELECT unnest($WORDS) AS word FROM documents)),
       |terms AS (
       |  SELECT doc_id, ROUND(-ln((c12 + 1.0) / CAST(c1 + v AS DOUBLE)), 6) AS nll
       |  FROM b2 JOIN counts USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
       |pd AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams,
       |    ROUND(${graft.core.Det.sumDetSql("nll", 6)} / COUNT(*), 6) AS avg_nll
       |  FROM terms GROUP BY 1)
       |SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams, avg_nll
       |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin

  private def shinglesSql(n: Int): String = {
    val parts = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""list_distinct(CASE WHEN len(w) >= $n
       | THEN list_transform(range(1, len(w) - ${n - 2}), i -> $parts)
       | ELSE [] END)""".stripMargin
  }

  /** MinHash j (0-based, inside a `range(0, k)` lambda over `shingles`):
    * universal hash of the 32-bit md5-derived base — mirrors
    * [[graft.llm.Dedup.signaturesFromRows]] exactly. */
  private val MINHASH_SQL = {
    val a = Dedup.HASH_A.mkString("[", ", ", "]")
    val b = Dedup.HASH_B.mkString("[", ", ", "]")
    s"""list_aggregate(list_transform(shingles, s ->
       | ((${a})[j+1] * ('0x' || substr(md5(s), 1, 8))::BIGINT + (${b})[j+1])
       |   % ${Dedup.MINHASH_P}), 'min')""".stripMargin.replace("\n", "")
  }

  private val DOT =
    "list_reduce(list_transform(range(1, 65), i -> (A[i])::DOUBLE * (B[i])::DOUBLE), (x, y) -> x + y)"

  private def dot(a: String, b: String): String =
    DOT.replace("A[", a + "[").replace("B[", b + "[")

  /** Shared CTE chain for the q313/q314 oracles — the exact mirror of
    * [[graft.llm.Similarity.ivfSplitState]]: q305's frozen even-half
    * quantizer assigns the full corpus; cells breaching the rational
    * load threshold split by local 2-means (two lowest-vid member
    * seeds, one Lloyd round). Every sub-assignment cosine is built from
    * EXACT integer sums (BIGINT/HUGEINT here, long/decimal in Spark) so
    * DuckDB's unordered SUM and Spark's array folds cannot diverge;
    * HUGEINT→DOUBLE goes through VARCHAR (the q306 casting rule). */
  private def ivfSplitCtes(thrNum: Int, thrDen: Int): String = {
    def fp(v: String) =
      s"CAST(FLOOR(CAST($v AS DOUBLE) * 16777216 + 0.5) AS BIGINT)"
    def dotL(a: String, b: String) =
      s"list_reduce(list_transform(range(1, 65), i -> $a[i] * $b[i]), " +
        "(x, y) -> x + y)"
    s"""n AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
       |  FROM embeddings),
       |o AS (SELECT * FROM n WHERE vec_id % 2 = 0),
       |cents AS (
       |  SELECT cent_id, c_emb, c_n2 FROM (
       |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
       |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
       |      COUNT(*) OVER () AS ccnt
       |    FROM o)
       |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
       |lst AS (SELECT COUNT(*) AS l FROM cents),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT n.vec_id, cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |        ${dot("n.embedding", "cents.c_emb")} / sqrt(n.n2 * cents.c_n2)
       |          DESC, cent_id) AS rn
       |    FROM n CROSS JOIN cents)
       |  WHERE rn = 1),
       |byc AS (
       |  SELECT cents.cent_id AS cell, COUNT(asg.vec_id) AS n_total
       |  FROM cents LEFT JOIN asg ON asg.cell = cents.cent_id GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_total) AS BIGINT) AS nn FROM byc),
       |flag AS (
       |  SELECT cell, n_total FROM byc, tot, lst
       |  WHERE CAST(n_total AS HUGEINT) * l * $thrDen
       |      > CAST(nn AS HUGEINT) * $thrNum),
       |nf AS (SELECT COUNT(*) AS nsplit FROM flag),
       |mem AS (
       |  SELECT a.vec_id, a.cell,
       |    list_transform(range(1, 65), i -> ${fp("e.embedding[i]")}) AS mx
       |  FROM asg a JOIN flag USING (cell)
       |    JOIN embeddings e ON e.vec_id = a.vec_id),
       |mem2 AS (
       |  SELECT vec_id, cell, mx, ${dotL("mx", "mx")} AS mn2 FROM mem),
       |sr AS (
       |  SELECT cell, vec_id, mx, mn2,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS j
       |  FROM mem2),
       |s0 AS (SELECT cell, mx AS smx0, mn2 AS sn20 FROM sr WHERE j = 0),
       |s1 AS (SELECT cell, mx AS smx1, mn2 AS sn21 FROM sr WHERE j = 1),
       |sub1 AS (
       |  SELECT m.vec_id, m.cell, m.mx, m.mn2,
       |    CASE WHEN
       |      (${dotL("m.mx", "smx0")})::DOUBLE
       |        / sqrt(m.mn2::DOUBLE * sn20::DOUBLE)
       |      >= (${dotL("m.mx", "smx1")})::DOUBLE
       |        / sqrt(m.mn2::DOUBLE * sn21::DOUBLE)
       |    THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS j
       |  FROM mem2 m JOIN s0 USING (cell) JOIN s1 USING (cell)),
       |csum AS (
       |  SELECT cell, j, i.i AS d, CAST(SUM(mx[i.i]) AS HUGEINT) AS sv
       |  FROM sub1, unnest(range(1, 65)) AS i(i) GROUP BY 1, 2, 3),
       |cn2t AS (SELECT cell, j, SUM(sv * sv) AS cn2 FROM csum GROUP BY 1, 2),
       |red AS (
       |  SELECT s.vec_id, s.cell, s.mn2, c.j,
       |    SUM(CAST(s.mx[c.d] AS HUGEINT) * c.sv) AS dt
       |  FROM sub1 s JOIN csum c ON c.cell = s.cell GROUP BY 1, 2, 3, 4),
       |re AS (
       |  SELECT vec_id, cell,
       |    CASE WHEN COALESCE(c0e, -1e300) >= COALESCE(c1e, -1e300)
       |    THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS sub
       |  FROM (
       |    SELECT r.vec_id, r.cell,
       |      MAX(CASE WHEN r.j = 0 THEN CAST(CAST(r.dt AS VARCHAR) AS DOUBLE)
       |        / sqrt(r.mn2::DOUBLE * CAST(CAST(t.cn2 AS VARCHAR) AS DOUBLE))
       |        END) AS c0e,
       |      MAX(CASE WHEN r.j = 1 THEN CAST(CAST(r.dt AS VARCHAR) AS DOUBLE)
       |        / sqrt(r.mn2::DOUBLE * CAST(CAST(t.cn2 AS VARCHAR) AS DOUBLE))
       |        END) AS c1e
       |    FROM red r JOIN cn2t t ON t.cell = r.cell AND t.j = r.j
       |    GROUP BY 1, 2)),
       |asg2 AS (
       |  SELECT a.vec_id, a.cell, COALESCE(re.sub, CAST(0 AS BIGINT)) AS sub
       |  FROM asg a LEFT JOIN re ON re.vec_id = a.vec_id
       |    AND re.cell = a.cell)""".stripMargin
  }

  /** Shared CTE chain for the q154/q159 kNN-graph oracles: q83's
    * deterministic ceil(sqrt(N)) cell assignment, then within-cell
    * neighbor ranking on the raw IEEE cosine with nbr_id tie-break —
    * mirrors [[graft.llm.Similarity.knnGraph]]. */
  private lazy val knnGraphCtes: String =
    s"""n AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
       |  FROM embeddings),
       |cents AS (
       |  SELECT cent_id, c_emb, c_n2 FROM (
       |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
       |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
       |      COUNT(*) OVER () AS ccnt
       |    FROM n)
       |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
       |ranked AS (
       |  SELECT n.vec_id, cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${dot("n.embedding", "cents.c_emb")} / sqrt(n.n2 * cents.c_n2) DESC,
       |               cent_id) AS rn
       |  FROM n CROSS JOIN cents),
       |cells AS (SELECT vec_id AS id, cent_id AS cell FROM ranked WHERE rn = 1),
       |prs AS (
       |  SELECT ca.id, cb.id AS nbr_id,
       |    ${dot("a.embedding", "b.embedding")} / sqrt(a.n2 * b.n2) AS c
       |  FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.id <> cb.id
       |  JOIN n a ON a.vec_id = ca.id
       |  JOIN n b ON b.vec_id = cb.id),
       |rk AS (
       |  SELECT id, nbr_id, c,
       |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, nbr_id) AS nbr_rank
       |  FROM prs)""".stripMargin

  /** q26's full SELECT (doc_id, pred_lang, per-language stopword scores) —
    * also the `lang` CTE of q71. */
  private lazy val langSelectSql: String = {
    val langs = TextAnalysis.stopwords
    val scores = langs.map { case (l, ws) =>
      s"len(list_filter(w, x -> x IN (${ws.map(x => s"'$x'").mkString(", ")}))) AS s_$l"
    }.mkString(",\n  ")
    val caseArms = langs.map(_._1).map { l =>
      val geq = langs.map(_._1).filterNot(_ == l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN s_$l > 0 AND $geq THEN '$l'"
    }.mkString("\n  ")
    s"""SELECT doc_id, CASE $caseArms ELSE 'und' END AS pred_lang,
       |  s_en, s_fr, s_es, s_de
       |FROM (SELECT doc_id, $scores
       |      FROM (SELECT doc_id, $WORDS AS w FROM documents))""".stripMargin
  }

  /** q27's full SELECT — also the `qual` CTE of q71. */
  /** q133's full Gopher-rule SELECT (per-doc ratios + keep), shared with
    * the q208 filter-agreement oracle. */
  private lazy val gopherSelectSql: String = {
    val en = TextAnalysis.stopwords.head._2.map(x => s"'$x'").mkString(", ")
    s"""SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
       |  ellipsis_ratio, alpha_ratio, n_stop_distinct,
       |  COALESCE(n_words BETWEEN 10 AND 100000
       |    AND mean_word_len BETWEEN 3.0 AND 10.0
       |    AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
       |    AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
       |    AND n_stop_distinct >= 2, false) AS keep
       |FROM (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
       |    CASE WHEN len(w) > 0 THEN ROUND(
       |      CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
       |        / len(w), 6) END AS mean_word_len,
       |    CASE WHEN len(w) > 0 THEN ROUND(
       |      ((length(text) - length(replace(text, '#', '')))
       |        + (length(text) - length(replace(text, '...', ''))) / 3)
       |        / len(w), 6) END AS symbol_ratio,
       |    CASE WHEN len(lines) > 0 THEN ROUND(
       |      len(list_filter(lines, l -> starts_with(l, '- ')
       |        OR starts_with(l, '* ') OR starts_with(l, '•')))::DOUBLE
       |        / len(lines), 6) END AS bullet_ratio,
       |    CASE WHEN len(lines) > 0 THEN ROUND(
       |      len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE
       |        / len(lines), 6) END AS ellipsis_ratio,
       |    CASE WHEN len(w) > 0 THEN ROUND(
       |      len(list_filter(w, x -> regexp_matches(x, '[a-z]')))::DOUBLE
       |        / len(w), 6) END AS alpha_ratio,
       |    CAST(len(list_intersect(list_distinct(w), [$en])) AS BIGINT)
       |      AS n_stop_distinct
       |  FROM (SELECT doc_id, text, $WORDS AS w,
       |    list_filter(string_split(text, chr(10)), l -> l <> '') AS lines
       |    FROM documents))""".stripMargin
  }

  private lazy val qualitySelectSql: String = {
    val en = TextAnalysis.stopwords.head._2.map(x => s"'$x'").mkString(", ")
    s"""SELECT doc_id, n_words, n_unique,
       |  ROUND(n_unique::DOUBLE / n_words, 6) AS uniq_ratio,
       |  ROUND(sum_len::DOUBLE / n_words, 6) AS avg_word_len,
       |  ROUND(n_stop::DOUBLE / n_words, 6) AS stop_ratio,
       |  ROUND(0.4 * ROUND(n_unique::DOUBLE / n_words, 6)
       |      + 0.3 * LEAST(n_words::DOUBLE / 50.0, 1.0)
       |      + 0.3 * (1.0 - ROUND(n_stop::DOUBLE / n_words, 6)), 6) AS quality_score
       |FROM (
       |  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_unique,
       |    CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len,
       |    len(list_filter(w, x -> x IN ($en))) AS n_stop
       |  FROM (SELECT doc_id, $WORDS AS w FROM documents))""".stripMargin
  }

  /** Shared CTE chain (shingles → minhash → LSH candidates → verified
    * pairs at threshold 0.3 → symmetric edges → recursive transitive
    * closure → `comp(doc_id, cluster_id)`), used by q69 and q71. Must sit
    * under a WITH RECURSIVE header. */
  /** q76's full BM25 SELECT (doc_id, dl, per-term tfs, score > 0) —
    * also the lexical leg of the q163 fusion oracle. */
  private lazy val bm25Sql: String = {
    val ts = Bm25Terms
    val tfCols = ts.indices.map(i =>
      s"CAST(SUM(CASE WHEN word = '${ts(i)}' THEN 1 ELSE 0 END) AS BIGINT) AS tf$i")
      .mkString(",\n  ")
    val dfCols = ts.indices.map(i =>
      s"COUNT(DISTINCT CASE WHEN word = '${ts(i)}' THEN doc_id END) AS df$i")
      .mkString(", ")
    val contribs = ts.indices.map(i =>
      s"""ROUND(ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)), 6)
         | * (tf$i::DOUBLE * (1.2 + 1.0))
         | / (tf$i::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl::DOUBLE / avgdl))"""
        .stripMargin.replace("\n", ""))
      .mkString(" + ")
    val outTfs = ts.indices.map(i => s"tf$i AS tf_${ts(i)}").mkString(", ")
    s"""WITH wr AS (SELECT doc_id, unnest($WORDS) AS word FROM documents),
       |pd AS (SELECT doc_id, COUNT(*) AS dl,
       |  $tfCols
       |  FROM wr GROUP BY 1),
       |ts AS (SELECT $dfCols FROM wr),
       |c AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM pd)
       |SELECT doc_id, dl, $outTfs, score FROM (
       |  SELECT doc_id, dl, ${ts.indices.map(i => s"tf$i").mkString(", ")},
       |    ROUND($contribs, 6) AS score
       |  FROM pd CROSS JOIN ts CROSS JOIN c
       |       CROSS JOIN (SELECT sum_dl::DOUBLE / n AS avgdl FROM c) a)
       |WHERE score > 0""".stripMargin
  }

  /** The candidate prefix of [[textClusterCtes]] (shingles → minhash →
    * LSH band self-join candidates), shared with the q164 audit. */
  private lazy val lshCandCtes: String =
    s"""sh AS (
       |  SELECT doc_id, ${shinglesSql(3)} AS shingles
       |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
       |sig AS (
       |  SELECT doc_id, shingles,
       |    list_transform(range(0, 8), j -> $MINHASH_SQL) AS mh
       |  FROM sh WHERE len(shingles) > 0),
       |bands AS (
       |  SELECT doc_id, b AS band_idx,
       |    mh[2*b+1] * 2147483648 + mh[2*b+2] AS band_key
       |  FROM sig, unnest(range(0, 4)) AS t(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id)""".stripMargin

  private lazy val textClusterCtes: String =
    s"""$lshCandCtes,
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
       |    / len(list_distinct(sa.shingles || sb.shingles)), 6) >= 0.3),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |comp AS (
       |  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
       |  FROM reach GROUP BY u)""".stripMargin

  /** Shared CTE chain mirroring Similarity.kMeans(k=8, iters=2): seed
    * centroids = 8 lowest ids (cluster = seed rank), assignment by
    * unrounded squared Euclidean distance (same IEEE op order as the
    * Spark plan: (n2 + c_n2) - (2 * fold-dot)), centroid update = mean of
    * 6-digit-quantized coordinates through exact DECIMAL(24,6). Used by
    * q87 and q88. */
  private lazy val kmeansCtes: String = {
    def assignCte(name: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, cluster, d2 FROM (
         |    SELECT n.vec_id, c.cluster,
         |      n.n2 + c.c_n2 - 2.0 * ${dot("n.embedding", "c.c_emb")} AS d2,
         |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |        n.n2 + c.c_n2 - 2.0 * ${dot("n.embedding", "c.c_emb")},
         |        c.cluster) AS rn
         |    FROM n CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    s"""n AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
       |  FROM embeddings),
       |cents0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster,
       |    list_transform(embedding, x -> x::DOUBLE) AS c_emb, n2 AS c_n2
       |  FROM n ORDER BY vec_id LIMIT 8),
       |${assignCte("a1", "cents0")},
       |m1 AS (
       |  SELECT cluster, pos,
       |    ROUND(CAST(SUM(CAST(ROUND(embedding[pos]::DOUBLE, 6)
       |      AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*), 6) AS m
       |  FROM a1 JOIN n USING (vec_id), unnest(range(1, 65)) AS t(pos)
       |  GROUP BY 1, 2),
       |cents1 AS (
       |  SELECT cluster, list(m ORDER BY pos) AS c_emb,
       |    list_reduce(list_transform(list(m ORDER BY pos), x -> x * x),
       |      (x, y) -> x + y) AS c_n2
       |  FROM m1 GROUP BY cluster),
       |${assignCte("a2", "cents1")}""".stripMargin
  }

  /** CTE chain mirroring Similarity.productQuantize(m=8, k=16, iters=2):
    * the kMeans conventions applied per subspace — subvector view with
    * its own n2 fold, per-sub first-16-by-id seeds, two assignments with
    * a BINARY-quantized (floor(x*2^20)/2^20) centroid mean between them:
    * the double sum of 2^-20 multiples is exact in any order, so the
    * centroids — and therefore every d2 — are bit-identical across
    * engines with no rounding anywhere in the query. */
  /** d-element left-to-right dot fold (the sub-dimensional [[DOT]]). */
  private def dotSub(a: String, b: String, d: Int = 8) =
    s"list_reduce(list_transform(range(1, ${d + 1}), " +
      s"i -> ($a[i])::DOUBLE * ($b[i])::DOUBLE), (x, y) -> x + y)"

  /** PQ training tail (cents0 → a1 → m1 → cents1 → a2): expects a CTE
    * `subn(vec_id, sub, e, n2)` of per-subspace double vectors upstream —
    * shared verbatim by the flat-PQ chain (q112/q113, subvectors of the
    * raw embeddings) and the IVF-PQ chain (q114/q115, subvectors of the
    * coarse-cell residuals). */
  private def pqTrainTail(d: Int = 8, k: Int = 16): String = {
    def assignCte(name: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, sub, cluster, d2 FROM (
         |    SELECT n.vec_id, n.sub, c.cluster,
         |      n.n2 + c.c_n2 - 2.0 * ${dotSub("n.e", "c.c_emb")} AS d2,
         |      ROW_NUMBER() OVER (PARTITION BY n.vec_id, n.sub ORDER BY
         |        n.n2 + c.c_n2 - 2.0 * ${dotSub("n.e", "c.c_emb")},
         |        c.cluster) AS rn
         |    FROM subn n JOIN $cents c USING (sub)) WHERE rn = 1)""".stripMargin
    s"""cents0 AS (
       |  SELECT sub, cluster, e AS c_emb, n2 AS c_n2 FROM (
       |    SELECT sub, ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) - 1
       |      AS cluster, e, n2
       |    FROM subn) WHERE cluster < $k),
       |${assignCte("a1", "cents0")},
       |m1 AS (
       |  SELECT a1.sub, cluster, pos,
       |    SUM(floor(e[pos] * 1048576.0) / 1048576.0) / COUNT(*) AS mn
       |  FROM a1 JOIN subn n ON a1.vec_id = n.vec_id AND a1.sub = n.sub,
       |       unnest(range(1, ${d + 1})) AS t(pos)
       |  GROUP BY 1, 2, 3),
       |cents1 AS (
       |  SELECT sub, cluster, list(mn ORDER BY pos) AS c_emb,
       |    list_reduce(list_transform(list(mn ORDER BY pos), x -> x * x),
       |      (x, y) -> x + y) AS c_n2
       |  FROM m1 GROUP BY sub, cluster),
       |${assignCte("a2", "cents1")}""".stripMargin
  }

  private lazy val pqCtes: String = {
    val m = 8; val d = 8
    s"""sub AS (
       |  SELECT vec_id, s.sub,
       |    list_transform(embedding[s.sub * $d + 1 : s.sub * $d + $d],
       |      x -> x::DOUBLE) AS e
       |  FROM embeddings, (SELECT unnest(range(0, $m)) AS sub) s),
       |subn AS (SELECT vec_id, sub, e, ${dotSub("e", "e")} AS n2 FROM sub),
       |${pqTrainTail()}""".stripMargin
  }

  /** IVF-PQ chain: q89's coarse quantizer (n/cents/ranked/cellsr), full-
    * vector residuals vs the assigned cell centroid, then [[pqTrainTail]]
    * over residual subvectors. Residuals subtract in DOUBLE (floats widen
    * exactly), mirroring the engine's zip_with. */
  /** Shared by q81 (plain) and q118 (Bloom-pre-filtered): the pre-filter
    * is result-invariant, so both queries verify against one SQL. */
  private lazy val decontamSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5('split1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       |      % 1000 < 900 AS is_train,
       |    unnest(${shinglesSql(5)}) AS shingle
       |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
       |tr AS (SELECT shingle, doc_id AS tid FROM sh WHERE is_train),
       |te AS (SELECT doc_id, shingle FROM sh WHERE NOT is_train)
       |SELECT doc_id, COUNT(DISTINCT shingle) AS n_shared_shingles,
       |  COUNT(DISTINCT tid) AS n_train_docs
       |FROM te JOIN tr USING (shingle)
       |GROUP BY 1""".stripMargin

  private def ivfPqCtes(cut: Int = 5): String = {
    val m = 8; val d = 8
    s"""n AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
       |  FROM embeddings),
       |cents AS (
       |  SELECT cent_id, c_emb, c_n2 FROM (
       |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
       |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
       |      COUNT(*) OVER () AS ccnt
       |    FROM n)
       |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
       |ranked AS (
       |  SELECT n.vec_id, cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${dot("n.embedding", "cents.c_emb")} / sqrt(n.n2 * cents.c_n2) DESC,
       |               cent_id) AS rn
       |  FROM n CROSS JOIN cents),
       |cellsr AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE rn = 1),
       |resid AS (
       |  SELECT n.vec_id, cl.cell,
       |    list_transform(range(1, ${m * d + 1}),
       |      i -> (n.embedding[i])::DOUBLE - (c.c_emb[i])::DOUBLE) AS r
       |  FROM n JOIN cellsr cl ON n.vec_id = cl.vec_id
       |       JOIN cents c ON cl.cell = c.cent_id),
       |sub AS (
       |  SELECT vec_id, s.sub, r[s.sub * $d + 1 : s.sub * $d + $d] AS e
       |  FROM resid, (SELECT unnest(range(0, $m)) AS sub) s),
       |subn AS (SELECT vec_id, sub, e, ${dotSub("e", "e")} AS n2 FROM sub),
       |${pqTrainTail()},
       |probes AS (
       |  SELECT vec_id AS query_id, cent_id AS cell
       |  FROM ranked WHERE rn <= 4 AND vec_id < 20),
       |qresid AS (
       |  SELECT p.query_id, p.cell,
       |    list_transform(range(1, ${m * d + 1}),
       |      i -> (n.embedding[i])::DOUBLE - (c.c_emb[i])::DOUBLE) AS qr
       |  FROM probes p JOIN n ON p.query_id = n.vec_id
       |       JOIN cents c ON p.cell = c.cent_id),
       |qsubn AS (
       |  SELECT query_id, cell, sub, qe, ${dotSub("qe", "qe")} AS qn2 FROM (
       |    SELECT query_id, cell, s.sub,
       |      qr[s.sub * $d + 1 : s.sub * $d + $d] AS qe
       |    FROM qresid, (SELECT unnest(range(0, $m)) AS sub) s)),
       |lut AS (
       |  SELECT query_id, cell, q.sub, c.cluster AS code,
       |    floor((qn2 + c.c_n2 - 2.0 * ${dotSub("q.qe", "c.c_emb")})
       |      * 1048576.0) / 1048576.0 AS term
       |  FROM qsubn q JOIN cents1 c USING (sub)),
       |scores AS (
       |  SELECT l.query_id, a.vec_id AS cand_id, SUM(term) AS adc
       |  FROM a2 a JOIN cellsr cl ON a.vec_id = cl.vec_id
       |       JOIN lut l ON cl.cell = l.cell AND a.sub = l.sub
       |            AND a.cluster = l.code
       |  WHERE l.query_id <> a.vec_id
       |  GROUP BY 1, 2),
       |ivfpq AS (
       |  SELECT query_id, cand_id, adc, rnk FROM (
       |    SELECT query_id, cand_id, adc,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, cand_id)
       |        AS rnk
       |    FROM scores) WHERE rnk <= $cut)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q112_pq_codes" ->
      s"""WITH $pqCtes
         |SELECT vec_id AS id, sub, cluster AS code, d2
         |FROM a2""".stripMargin,

    // ADC over the q112 chain: binary-quantized LUT terms make the
    // m-addend sum exact in any order — adc hashes raw, unrounded.
    "q113_pq_ann" ->
      s"""WITH $pqCtes,
         |qsub AS (
         |  SELECT vec_id AS query_id, s.sub,
         |    list_transform(embedding[s.sub * 8 + 1 : s.sub * 8 + 8],
         |      x -> x::DOUBLE) AS qe
         |  FROM embeddings, (SELECT unnest(range(0, 8)) AS sub) s
         |  WHERE vec_id < 20),
         |qsubn AS (SELECT query_id, sub, qe, ${dotSub("qe", "qe")} AS qn2
         |  FROM qsub),
         |lut AS (
         |  SELECT query_id, q.sub, c.cluster AS code,
         |    floor((qn2 + c.c_n2 - 2.0 * ${dotSub("q.qe", "c.c_emb")})
         |      * 1048576.0) / 1048576.0 AS term
         |  FROM qsubn q JOIN cents1 c USING (sub)),
         |scores AS (
         |  SELECT l.query_id, a.vec_id AS cand_id, SUM(term) AS adc
         |  FROM a2 a JOIN lut l ON a.sub = l.sub AND a.cluster = l.code
         |  WHERE l.query_id <> a.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, cand_id, adc, rnk FROM (
         |  SELECT query_id, cand_id, adc,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, cand_id)
         |      AS rnk
         |  FROM scores) WHERE rnk <= 5""".stripMargin,

    "q114_ivfpq_ann" ->
      s"""WITH ${ivfPqCtes()}
         |SELECT query_id, cand_id, adc, rnk FROM ivfpq""".stripMargin,

    // Persisted-index round trip: value-identical to a live q114 build,
    // so it shares q114's oracle verbatim — a hash match certifies the
    // on-disk artifacts reproduce the live search exactly.
    "q140_ivfpq_persist" ->
      s"""WITH ${ivfPqCtes()}
         |SELECT query_id, cand_id, adc, rnk FROM ivfpq""".stripMargin,

    // IVFADC+R: the q114 chain cut at a 10-deep shortlist, re-ranked by
    // exact cosine (same 6-dp round + cand-id tie-break as the q30/q89
    // exact route).
    "q117_ivfpq_rerank" ->
      s"""WITH ${ivfPqCtes(10)},
         |rer AS (
         |  SELECT i.query_id, i.cand_id,
         |    ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6)
         |      AS cos
         |  FROM ivfpq i JOIN n q ON i.query_id = q.vec_id
         |       JOIN n c ON i.cand_id = c.vec_id)
         |SELECT query_id, cand_id, cos, rnk FROM (
         |  SELECT query_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC,
         |      cand_id) AS rnk
         |  FROM rer) WHERE rnk <= 5""".stripMargin,

    // Recall@5 of IVF-PQ vs exact cosine (the q89 harness over the q114
    // approximate set).
    "q115_ivfpq_recall" ->
      s"""WITH ${ivfPqCtes()},
         |exact AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |        c.vec_id) AS rnk
         |    FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
         |  WHERE rnk <= 5)
         |SELECT e.query_id, COUNT(*) AS n_exact,
         |  CAST(SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  ROUND(CAST(SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
         |    / COUNT(*), 6) AS recall
         |FROM exact e LEFT JOIN ivfpq a
         |  ON e.query_id = a.query_id AND e.cand_id = a.cand_id
         |GROUP BY 1""".stripMargin,

    "q87_kmeans" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id AS id, cluster, ROUND(d2, 6) AS d2 FROM a2""".stripMargin,

    "q88_cluster_sample" ->
      s"""WITH $kmeansCtes
         |SELECT id, cluster, cluster_size, sample_rank FROM (
         |  SELECT vec_id AS id, cluster,
         |    COUNT(*) OVER (PARTITION BY cluster) AS cluster_size,
         |    ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY
         |      ('0x' || substr(md5('cbs1' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
         |      vec_id) AS sample_rank
         |  FROM a2)
         |WHERE sample_rank <= 20""".stripMargin,

    // Exact top-5 (q30 shape, k=5) vs IVF top-5 (q72 shape, nProbe=4):
    // recall@5 per query. Both sides rank the 6-digit-rounded cosine with
    // the candidate-id tie-break, so the sets are deterministic.
    "q89_ann_recall" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |exact AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |        c.vec_id) AS rnk
         |    FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
         |  WHERE rnk <= 5),
         |cents AS ( -- nList = ceil(sqrt(N)), the FAISS sizing rule
         |  SELECT cent_id, c_emb, c_n2 FROM (
         |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
         |      COUNT(*) OVER () AS ccnt
         |    FROM n)
         |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
         |ranked AS (
         |  SELECT n.vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |      ORDER BY ${dot("n.embedding", "cents.c_emb")} / sqrt(n.n2 * cents.c_n2) DESC,
         |               cent_id) AS rn
         |  FROM n CROSS JOIN cents),
         |cells AS (SELECT vec_id AS cand_id, cent_id AS cell FROM ranked WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, cent_id AS cell
         |  FROM ranked WHERE rn <= 4 AND vec_id < 20),
         |cand AS (
         |  SELECT DISTINCT query_id, cand_id
         |  FROM probes JOIN cells USING (cell)
         |  WHERE cand_id <> query_id),
         |approx AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id,
         |      ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |                 cand_id) AS rnk
         |    FROM cand JOIN n q ON cand.query_id = q.vec_id
         |              JOIN n c ON cand.cand_id = c.vec_id)
         |  WHERE rnk <= 5)
         |SELECT e.query_id, COUNT(*) AS n_exact,
         |  CAST(SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  ROUND(CAST(SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
         |    / COUNT(*), 6) AS recall
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.cand_id = a.cand_id
         |GROUP BY 1""".stripMargin,

    "q90_pii" -> {
      val pats = TextAnalysis.PiiPatterns
      val counts = pats.map { case (name, pat, _) =>
        s"len(regexp_extract_all(text, '$pat')) AS n_$name"
      }.mkString(",\n  ")
      val redacted = pats.foldLeft("text") {
        case (c, (_, pat, tok)) => s"regexp_replace($c, '$pat', '$tok', 'g')"
      }
      s"""SELECT doc_id, $counts,
         |  $redacted AS redacted
         |FROM documents""".stripMargin
    },

    "q20_dedup_exact" ->
      """SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,

    "q21_minhash_sig" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(3)} AS shingles
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents))
         |SELECT doc_id, array_to_string(
         |  list_transform(range(0, 8), j -> $MINHASH_SQL), ',') AS sig
         |FROM sh WHERE len(shingles) > 0""".stripMargin,

    "q22_minhash_pairs" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(3)} AS shingles
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |sig AS (
         |  SELECT doc_id, shingles,
         |    list_transform(range(0, 8), j -> $MINHASH_SQL) AS mh
         |  FROM sh WHERE len(shingles) > 0),
         |bands AS (
         |  SELECT doc_id, shingles, b AS band_idx,
         |    mh[2*b+1] * 2147483648 + mh[2*b+2] AS band_key
         |  FROM sig, unnest(range(0, 4)) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |  WHERE a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
         |    / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard
         |FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b""".stripMargin,

    // q22's chain plus per-pair slot-match counts: the full-signature and
    // b=4-bit estimates against the exact verified jaccard. The b-bit
    // correction ((m/k − 2^-b)/(1 − 2^-b)) uses exact-binary constants
    // (0.0625 / 0.9375) in the Spark expression's parenthesization.
    "q197_bbit_minhash" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(3)} AS shingles
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |sig AS (
         |  SELECT doc_id, shingles,
         |    list_transform(range(0, 8), j -> $MINHASH_SQL) AS mh
         |  FROM sh WHERE len(shingles) > 0),
         |bands AS (
         |  SELECT doc_id, b AS band_idx,
         |    mh[2*b+1] * 2147483648 + mh[2*b+2] AS band_key
         |  FROM sig, unnest(range(0, 4)) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |  WHERE a.doc_id < b.doc_id),
         |m AS (
         |  SELECT id_a, id_b,
         |    ROUND(len(list_intersect(ga.shingles, gb.shingles))::DOUBLE
         |      / len(list_distinct(ga.shingles || gb.shingles)), 6) AS jaccard,
         |    list_reduce(list_transform(range(1, 9),
         |      i -> CASE WHEN ga.mh[i] = gb.mh[i] THEN 1 ELSE 0 END),
         |      (a, e) -> a + e) AS mm,
         |    list_reduce(list_transform(range(1, 9),
         |      i -> CASE WHEN (ga.mh[i] % 16) = (gb.mh[i] % 16)
         |        THEN 1 ELSE 0 END), (a, e) -> a + e) AS mb
         |  FROM cand JOIN sig ga ON ga.doc_id = id_a
         |            JOIN sig gb ON gb.doc_id = id_b)
         |SELECT id_a, id_b, jaccard,
         |  ROUND(mm::DOUBLE / 8.0, 6) AS est_full,
         |  ROUND(((mb::DOUBLE / 8.0) - 0.0625) / 0.9375, 6) AS est_bbit
         |FROM m""".stripMargin,

    // q22's chain restricted to index(lower half) x new(upper half)
    // candidates — the incremental form; same signature and verification
    // arithmetic, so the shared-prefix CTEs match q22's verbatim.
    "q119_incremental_dedup" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(3)} AS shingles
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |sig AS (
         |  SELECT doc_id, shingles,
         |    list_transform(range(0, 8), j -> $MINHASH_SQL) AS mh
         |  FROM sh WHERE len(shingles) > 0),
         |bands AS (
         |  SELECT doc_id, shingles, b AS band_idx,
         |    mh[2*b+1] * 2147483648 + mh[2*b+2] AS band_key
         |  FROM sig, unnest(range(0, 4)) AS t(b)),
         |k AS (SELECT COUNT(*) // 2 AS k FROM documents),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key, k
         |  WHERE a.doc_id < k.k AND b.doc_id >= k.k)
         |SELECT id_a, id_b,
         |  ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
         |    / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard
         |FROM cand JOIN sh sa ON sa.doc_id = id_a
         |  JOIN sh sb ON sb.doc_id = id_b""".stripMargin,

    // The sketch stage is result-invariant (superset prune + exact
    // re-count), so the oracle is the exact count alone.
    "q121_heavy_hitters" ->
      s"""SELECT word, COUNT(*) AS cnt
         |FROM (SELECT unnest($WORDS) AS word FROM documents)
         |GROUP BY 1 HAVING COUNT(*) >= 900""".stripMargin,

    // Disjoint 10-word blocks; rn=1 in (doc_id, start) order marks the
    // corpus-wide first occurrence; clean_text re-joins survivors in
    // offset order (COALESCE for the all-blocks-dropped doc, which the
    // Spark side renders as '').
    "q120_block_dedup" ->
      s"""WITH w AS (SELECT doc_id, $WORDS AS w FROM documents),
         |b AS (
         |  SELECT doc_id, s.start,
         |    array_to_string(w[s.start + 1 : s.start + 10], ' ') AS block
         |  FROM w, unnest(range(0, len(w), 10)) AS s(start)
         |  WHERE len(w) > 0),
         |f AS (
         |  SELECT doc_id, start, block,
         |    ROW_NUMBER() OVER (PARTITION BY block ORDER BY doc_id, start)
         |      AS rn
         |  FROM b)
         |SELECT doc_id, COUNT(*) AS n_blocks,
         |  COUNT(*) FILTER (WHERE rn > 1) AS n_dropped,
         |  COALESCE(string_agg(CASE WHEN rn = 1 THEN block END, ' '
         |    ORDER BY start), '') AS clean_text
         |FROM f GROUP BY 1""".stripMargin,

    "q23_simhash" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform($WORDS, w2 -> ('0x' || substr(md5(w2), 1, 15))::BIGINT) AS hs
         |  FROM documents WHERE len($WORDS) > 0)
         |SELECT doc_id, CAST(list_reduce(list_transform(range(0, 60), j ->
         |  CASE WHEN CAST(list_sum(list_transform(hs, x ->
         |      CASE WHEN ((x >> j) & 1) = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
         |    THEN (1::BIGINT << j) ELSE 0::BIGINT END), (a, b) -> a + b) AS BIGINT) AS simhash
         |FROM h""".stripMargin,

    "q24_simhash_pairs" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform($WORDS, w2 -> ('0x' || substr(md5(w2), 1, 15))::BIGINT) AS hs
         |  FROM documents WHERE len($WORDS) > 0),
         |fp AS (
         |  SELECT doc_id, CAST(list_reduce(list_transform(range(0, 60), j ->
         |    CASE WHEN CAST(list_sum(list_transform(hs, x ->
         |        CASE WHEN ((x >> j) & 1) = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
         |      THEN (1::BIGINT << j) ELSE 0::BIGINT END), (a, b) -> a + b) AS BIGINT) AS simhash
         |  FROM h),
         |bands AS (
         |  SELECT doc_id, simhash, b AS band_idx, (simhash >> (b * 15)) & 32767 AS band_val
         |  FROM fp, unnest(range(0, 4)) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS fp_a, b.doc_id AS id_b, b.simhash AS fp_b
         |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |  WHERE a.doc_id < b.doc_id)
         |SELECT id_a, id_b, bit_count(xor(fp_a, fp_b)) AS hamming
         |FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 10""".stripMargin,

    "q25_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT source, doc_id, ${shinglesSql(2)} AS s
         |  FROM (SELECT source, doc_id, $WORDS AS w FROM documents))
         |SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
         |  ROUND(len(list_intersect(a.s, b.s))::DOUBLE
         |    / len(list_distinct(a.s || b.s)), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE len(a.s) > 0 AND len(b.s) > 0
         |  AND ROUND(len(list_intersect(a.s, b.s))::DOUBLE
         |    / len(list_distinct(a.s || b.s)), 6) >= 0.05""".stripMargin,

    "q26_langid" -> langSelectSql,

    "q27_quality" -> qualitySelectSql,

    "q28_tokens" ->
      s"""SELECT doc_id,
         |  len($WORDS) AS ws_tokens,
         |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens,
         |  len(list_distinct($WORDS)) AS distinct_tokens,
         |  length(text) AS n_chars_computed
         |FROM documents""".stripMargin,

    "q29_fingerprint" ->
      s"""SELECT doc_id, COALESCE(list_reduce(
         |  list_transform($WORDS, w2 -> ('0x' || substr(md5(w2), 1, 8))::BIGINT % 1000000007),
         |  (a, b) -> (a * 31 + b) % 1000000007), 0) AS fingerprint
         |FROM documents""".stripMargin,

    "q30_cosine_topk" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings)
         |SELECT query_id, cand_id, cos, rnk FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |               c.vec_id) AS rnk
         |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20)
         |WHERE rnk <= 5""".stripMargin,

    "q31_ann_lsh" -> {
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |bands AS ($bandKeysSql),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
         |  FROM bands q JOIN bands c
         |    ON q.bi = c.bi AND q.bk = c.bk AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20)
         |SELECT query_id, cand_id, cos, rnk FROM (
         |  SELECT query_id, cand_id,
         |    ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |               cand_id) AS rnk
         |  FROM cand JOIN n q ON cand.query_id = q.vec_id
         |            JOIN n c ON cand.cand_id = c.vec_id)
         |WHERE rnk <= 3""".stripMargin
    },

    // Transitive closure of the verified minhash pairs (threshold 0.3) via
    // a recursive CTE; cluster id = component minimum — value-identical to
    // the engine's min-label-propagation fixpoint.
    "q69_dedup_clusters" ->
      s"""WITH RECURSIVE $textClusterCtes
         |SELECT doc_id, cluster_id,
         |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM comp""".stripMargin,

    // Training-data selection composing lang-ID + quality + dedup
    // clustering: English, quality bar, length band, and only the
    // cluster-minimum representative of each near-dup component.
    "q71_corpus_select" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |lang AS ($langSelectSql),
         |qual AS ($qualitySelectSql)
         |SELECT d.doc_id, d.source, l.pred_lang, q.quality_score, q.n_words
         |FROM documents d
         |JOIN lang l USING (doc_id)
         |JOIN qual q USING (doc_id)
         |LEFT JOIN comp c USING (doc_id)
         |WHERE l.pred_lang = 'en' AND q.quality_score >= 0.72
         |  AND q.n_words BETWEEN 10 AND 500
         |  AND (c.cluster_id IS NULL OR c.cluster_id = d.doc_id)""".stripMargin,

    "q70_embed_clusters" ->
      s"""WITH RECURSIVE n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |bands AS ($bandKeysSql),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.bi = b.bi AND a.bk = b.bk AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT id_a, id_b
         |  FROM cand JOIN n a ON cand.id_a = a.vec_id
         |            JOIN n b ON cand.id_b = b.vec_id
         |  WHERE ROUND(${dot("a.embedding", "b.embedding")} / sqrt(a.n2 * b.n2), 6) >= 0.3),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |comp AS (
         |  SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster_id
         |  FROM reach GROUP BY u)
         |SELECT vec_id, cluster_id,
         |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM comp""".stripMargin,

    // Byte-exact replay of the byte-fold feature path from hex(payload):
    // per-lane ascending double sums, one float32 rounding per lane, then
    // the integer checksum fold — mirrors Multimodal.byteFoldFeatures and
    // the extractFeatures checksum exactly.
    "q74_media_features" ->
      s"""WITH b AS (
         |  SELECT doc_id, list_transform(range(0, octet_length(encode(text))), i ->
         |    ('0x' || substr(hex(encode(text)), (2*i+1)::INT, 2))::INT / 255.0) AS vals
         |  FROM documents),
         |lanes AS (
         |  SELECT doc_id, list_transform(range(0, 8), j ->
         |    CAST(CAST(CASE WHEN len(list_filter(vals, (x, i) -> (i-1) % 8 = j)) = 0
         |      THEN 0.0
         |      ELSE list_reduce(list_filter(vals, (x, i) -> (i-1) % 8 = j),
         |        (a, c) -> a + c) END AS FLOAT) AS DOUBLE)) AS f
         |  FROM b)
         |SELECT doc_id AS id, 'opaque' AS kind, 8 AS dim,
         |  CAST(list_reduce(list_prepend(17.0::DOUBLE, f),
         |    (a, c) -> a * 31 + round(c * 1000)) AS BIGINT) AS checksum
         |FROM lanes""".stripMargin,

    "q105_frame_sample" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx,
         |    octet_length(encode(text)) // 96 AS n_frames
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, n_frames, hx,
         |    unnest(range(0, n_frames, greatest(1, n_frames // 4))) AS frame_idx
         |  FROM b WHERE n_frames > 0),
         |fb AS (
         |  SELECT doc_id, frame_idx, n_frames,
         |    list_transform(range(0, 96), i ->
         |      ('0x' || substr(hx, (2 * (frame_idx * 96 + i) + 1)::INT, 2))::BIGINT) AS bytes
         |  FROM f)
         |SELECT doc_id AS id, frame_idx, n_frames,
         |  list_reduce(bytes, (a, c) -> a + c) / 96.0 AS mean_byte,
         |  list_reduce(list_prepend(17::BIGINT, bytes),
         |    (a, c) -> (a * 31 + c) % 1000000007) AS checksum
         |FROM fb""".stripMargin,

    "q73_vocab" ->
      s"""SELECT word, df, tf,
         |  ROUND(ln((n_docs + 1.0) / (df + 1.0)), 6) AS idf
         |FROM (
         |  SELECT word, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest($WORDS) AS word FROM documents)
         |  GROUP BY word)
         |CROSS JOIN (SELECT COUNT(*) AS n_docs FROM documents)
         |WHERE df >= 25""".stripMargin,

    "q72_ann_ivf" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |cents AS ( -- nList = ceil(sqrt(N)), the FAISS sizing rule
         |  SELECT cent_id, c_emb, c_n2 FROM (
         |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
         |      COUNT(*) OVER () AS ccnt
         |    FROM n)
         |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
         |ranked AS (
         |  SELECT n.vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |      ORDER BY ${dot("n.embedding", "cents.c_emb")} / sqrt(n.n2 * cents.c_n2) DESC,
         |               cent_id) AS rn
         |  FROM n CROSS JOIN cents),
         |cells AS (SELECT vec_id AS cand_id, cent_id AS cell FROM ranked WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, cent_id AS cell
         |  FROM ranked WHERE rn <= 2 AND vec_id < 20),
         |cand AS (
         |  SELECT DISTINCT query_id, cand_id
         |  FROM probes JOIN cells USING (cell)
         |  WHERE cand_id <> query_id)
         |SELECT query_id, cand_id, cos, rnk FROM (
         |  SELECT query_id, cand_id,
         |    ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |               cand_id) AS rnk
         |  FROM cand JOIN n q ON cand.query_id = q.vec_id
         |            JOIN n c ON cand.cand_id = c.vec_id)
         |WHERE rnk <= 3""".stripMargin,

    "q75_tfidf" ->
      s"""WITH wr AS (SELECT doc_id, unnest($WORDS) AS word FROM documents),
         |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM wr GROUP BY 1, 2),
         |dfx AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM wr GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT doc_id, word, tf, tfidf, rnk FROM (
         |  SELECT doc_id, word, tf,
         |    ROUND(tf * ROUND(ln((n_docs + 1.0) / (df + 1.0)), 6), 6) AS tfidf,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY ROUND(tf * ROUND(ln((n_docs + 1.0) / (df + 1.0)), 6), 6) DESC,
         |               word) AS rnk
         |  FROM tf JOIN dfx USING (word) CROSS JOIN n)
         |WHERE rnk <= 5""".stripMargin,

    // Mirrors Pipeline.bm25 term by term: every double op is written in
    // the same association order, so only ln needs the 6-digit pin.
    "q76_bm25" -> bm25Sql,

    "q77_seq_pack" ->
      """SELECT source, doc_id, n_tok, start_off,
        |  start_off // 2048 AS pack_id,
        |  start_off % 2048 AS pack_off,
        |  ((start_off + n_tok - 1) // 2048 > start_off // 2048)
        |    AND n_tok > 0 AS spans_boundary
        |FROM (
        |  SELECT source, doc_id, n_tok,
        |    COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_off
        |  FROM (SELECT source, doc_id,
        |          len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_tok
        |        FROM documents))""".stripMargin,

    "q78_strat_sample" -> {
      val arms = SampleRates.toSeq
        .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
      s"""SELECT doc_id, lang, bucket, rate_permille FROM (
         |  SELECT doc_id, lang,
         |    ('0x' || substr(md5('smp1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |      % 1000 AS bucket,
         |    CASE $arms ELSE 50 END AS rate_permille
         |  FROM documents)
         |WHERE bucket < rate_permille""".stripMargin
    },

    "q79_repetition" ->
      s"""WITH w AS (SELECT doc_id, $WORDS AS w FROM documents),
         |ws AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
         |       FROM w WHERE len(w) > 0),
         |bg AS (SELECT doc_id,
         |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
         |       FROM w),
         |bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         |bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         |         MAX(c) AS max_bigram_n FROM bc GROUP BY 1)
         |SELECT doc_id, n_words, n_distinct,
         |  COALESCE(n_bigrams, 0) AS n_bigrams,
         |  COALESCE(max_bigram_n, 0) AS max_bigram_n,
         |  ROUND(1.0 - n_distinct::DOUBLE / n_words, 6) AS dup_word_frac,
         |  CASE WHEN COALESCE(n_bigrams, 0) > 0
         |    THEN ROUND(COALESCE(max_bigram_n, 0)::DOUBLE / n_bigrams, 6)
         |    ELSE 0.0 END AS top_bigram_frac,
         |  (CASE WHEN COALESCE(n_bigrams, 0) > 0
         |    THEN ROUND(COALESCE(max_bigram_n, 0)::DOUBLE / n_bigrams, 6)
         |    ELSE 0.0 END > 0.06)
         |  OR (ROUND(1.0 - n_distinct::DOUBLE / n_words, 6) > 0.55) AS flagged
         |FROM ws LEFT JOIN bs USING (doc_id)""".stripMargin,

    // Mirrors Pipeline.temperatureMixture: sqrt is correctly rounded in
    // IEEE arithmetic on both engines; shares/rates pinned at 6 digits on
    // both sides BEFORE the keep comparison; the source-share sum routes
    // through exact decimal (order-free).
    "q135_temperature_mix" ->
      s"""WITH st AS (
         |  SELECT source, CAST(SUM(len($WORDS)) AS BIGINT) AS src_tokens
         |  FROM documents GROUP BY 1),
         |ss AS (SELECT source, src_tokens,
         |  ROUND(sqrt(src_tokens::DOUBLE), 6) AS s FROM st),
         |tot AS (SELECT CAST(SUM(CAST(s AS DECIMAL(24,6))) AS DOUBLE)
         |  AS stot FROM ss),
         |d AS (SELECT doc_id, source, CAST(len($WORDS) AS BIGINT) AS n_tok,
         |  ('0x' || substr(md5('temp1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |    % 1000 AS bucket
         |  FROM documents)
         |SELECT doc_id, source, n_tok, share, keep_rate,
         |  bucket::DOUBLE / 1000.0 < keep_rate AS kept
         |FROM (
         |  SELECT d.doc_id, d.source, d.n_tok, d.bucket,
         |    ROUND(s / stot, 6) AS share,
         |    LEAST(CAST(1.0 AS DOUBLE),
         |      ROUND(20000 * ROUND(s / stot, 6) / src_tokens, 6)) AS keep_rate
         |  FROM d JOIN ss USING (source) CROSS JOIN tot)""".stripMargin,

    // q69's recursive cluster CTEs + q27's quality SELECT, argmax per
    // cluster with the same (score DESC, doc_id) tie order as max_by's
    // ordering struct.
    "q137_canonical_docs" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |q AS (SELECT doc_id, quality_score FROM ($qualitySelectSql)),
         |ranked AS (
         |  SELECT comp.cluster_id,
         |    COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |    comp.doc_id AS kept_doc, q.quality_score AS kept_quality,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY quality_score DESC, comp.doc_id) AS rn
         |  FROM comp JOIN q USING (doc_id))
         |SELECT cluster_id, cluster_size, kept_doc, kept_quality
         |FROM ranked WHERE rn = 1""".stripMargin,

    // Mirrors TextAnalysis.hllDistinctWords: bin()-length integer ranks,
    // exact-integer register sums (HUGEINT ≙ Spark's DECIMAL(38,0)), the
    // double ops in identical order, estimate pinned to 4 digits.
    "q139_hll_distinct" ->
      s"""WITH w AS (
         |  SELECT source, unnest($WORDS) AS word FROM documents),
         |h AS (
         |  SELECT source, word,
         |    ('0x' || substr(md5(word), 1, 15))::BIGINT AS hv
         |  FROM w),
         |r AS (
         |  SELECT source, hv & 63 AS bucket,
         |    MAX(CASE WHEN (hv >> 6) = 0 THEN 55
         |        ELSE 55 - length(bin(hv >> 6)) END) AS m
         |  FROM h GROUP BY 1, 2),
         |agg AS (
         |  SELECT source, COUNT(*) AS n_present,
         |    SUM((1::BIGINT << (60 - m))::HUGEINT) AS psum
         |  FROM r GROUP BY 1),
         |ex AS (SELECT source, COUNT(DISTINCT word) AS n_distinct_exact
         |       FROM w GROUP BY 1)
         |SELECT source, n_distinct_exact, zeros,
         |  CASE WHEN raw <= 160.0 AND zeros > 0
         |    THEN ROUND(64 * ln(CAST(64.0 AS DOUBLE) / zeros), 4)
         |    ELSE ROUND(raw, 4) END AS est_distinct
         |FROM (
         |  SELECT agg.source, ex.n_distinct_exact,
         |    64 - n_present AS zeros,
         |    CAST(2904.064 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
         |      / CAST(psum + (64 - n_present)::HUGEINT
         |          * 1152921504606846976::HUGEINT AS DOUBLE) AS raw
         |  FROM agg JOIN ex USING (source))""".stripMargin,

    // Reuses the shared pairs CTE (threshold 0.3); the unused recursive
    // closure CTEs behind it are pruned by the optimizer.
    "q138_cross_source" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |s AS (SELECT doc_id, source FROM documents)
         |SELECT LEAST(sa.source, sb.source) AS source_lo,
         |  GREATEST(sa.source, sb.source) AS source_hi,
         |  COUNT(*) AS n_pairs
         |FROM pairs
         |JOIN s sa ON sa.doc_id = id_a
         |JOIN s sb ON sb.doc_id = id_b
         |GROUP BY 1, 2""".stripMargin,

    "q136_stitch_pairs" ->
      s"""WITH b AS (
         |  SELECT doc_id, $WORDS AS w FROM documents),
         |bb AS (SELECT doc_id, w FROM b WHERE len(w) >= 3),
         |t AS (SELECT doc_id AS id_a, array_to_string(w[-3:], ' ') AS gram
         |      FROM bb),
         |h AS (SELECT doc_id AS id_b, array_to_string(w[1:3], ' ') AS gram
         |      FROM bb),
         |td AS (SELECT gram, COUNT(*) AS dft FROM t GROUP BY 1),
         |hd AS (SELECT gram, COUNT(*) AS dfh FROM h GROUP BY 1)
         |SELECT id_a, id_b, gram
         |FROM t JOIN td USING (gram) JOIN h USING (gram) JOIN hd USING (gram)
         |WHERE dft <= 10 AND dfh <= 10 AND id_a <> id_b""".stripMargin,

    "q82_mixture" -> {
      val arms = MixWeights.toSeq
        .map { case (s, v) => s"WHEN source = '$s' THEN $v" }.mkString(" ")
      s"""WITH st AS (SELECT source, CAST(SUM(len($WORDS)) AS BIGINT) AS src_tokens
         |  FROM documents GROUP BY 1),
         |d AS (SELECT doc_id, source, len($WORDS) AS n_tok,
         |  ('0x' || substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |    % 1000 AS bucket
         |  FROM documents)
         |SELECT doc_id, source, n_tok, ROUND(factor, 6) AS factor,
         |  CAST(FLOOR(factor) AS BIGINT) +
         |    CASE WHEN bucket::DOUBLE / 1000.0 < factor - FLOOR(factor)
         |      THEN 1 ELSE 0 END AS n_copies
         |FROM (
         |  SELECT doc_id, source, n_tok, bucket,
         |    100000 * CASE $arms ELSE 0.0 END / st.src_tokens::DOUBLE AS factor
         |  FROM d JOIN st USING (source))""".stripMargin
    },

    // Mirrors Similarity.semDedup: q72's deterministic quantizer (16
    // lowest-id seeds), within-cell lower-id max cosine, keep when below
    // threshold. Assignment ranks UNROUNDED cosines (bit-identical dots),
    // the verify cosine rounds to 6 like every similarity surface.
    "q83_semdedup" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |cents AS ( -- nList = ceil(sqrt(N)), the FAISS sizing rule
         |  SELECT cent_id, c_emb, c_n2 FROM (
         |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
         |      COUNT(*) OVER () AS ccnt
         |    FROM n)
         |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
         |ranked AS (
         |  SELECT n.vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |      ORDER BY ${dot("n.embedding", "cents.c_emb")} / sqrt(n.n2 * cents.c_n2) DESC,
         |               cent_id) AS rn
         |  FROM n CROSS JOIN cents),
         |cells AS (SELECT vec_id AS id, cent_id AS cell FROM ranked WHERE rn = 1),
         |sims AS (
         |  SELECT hi.cell, hi.id,
         |    MAX(ROUND(${dot("a.embedding", "b.embedding")} / sqrt(a.n2 * b.n2), 6)) AS max_sim
         |  FROM cells hi
         |  JOIN cells lo ON hi.cell = lo.cell AND lo.id < hi.id
         |  JOIN n a ON a.vec_id = hi.id
         |  JOIN n b ON b.vec_id = lo.id
         |  GROUP BY 1, 2)
         |SELECT cells.id, cells.cell, sims.max_sim,
         |  (sims.max_sim IS NULL OR sims.max_sim < 0.3) AS kept
         |FROM cells LEFT JOIN sims ON cells.id = sims.id""".stripMargin,

    "q154_knn_graph" ->
      s"""WITH $knnGraphCtes
         |SELECT id AS vec_id, CAST(nbr_rank AS BIGINT) AS nbr_rank, nbr_id,
         |  ROUND(c, 6) + 0.0 AS cos
         |FROM rk WHERE nbr_rank <= 3""".stripMargin,

    "q159_knn_classify" ->
      s"""WITH $knnGraphCtes,
         |votes AS (
         |  SELECT rk.id, l.label AS nbr_label, COUNT(*) AS cnt
         |  FROM rk JOIN embeddings l ON l.vec_id = rk.nbr_id
         |  WHERE rk.nbr_rank <= 5 GROUP BY 1, 2),
         |win AS (
         |  SELECT id, nbr_label, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, nbr_label) AS r
         |  FROM votes)
         |SELECT e.vec_id, e.label, w.nbr_label AS pred_label,
         |  CAST(w.cnt AS BIGINT) AS n_votes, (e.label = w.nbr_label) AS agree
         |FROM embeddings e JOIN win w ON w.id = e.vec_id AND w.r = 1""".stripMargin,

    "q160_token_budget" -> {
      val cases = MixWeights.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN '$s' THEN $w::DOUBLE" }
        .mkString(" ")
      s"""WITH t AS (
         |  SELECT source, CAST(SUM(len($WORDS)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |w AS (
         |  SELECT source, n_tokens,
         |    CASE source $cases ELSE 0.0::DOUBLE END AS weight
         |  FROM t)
         |SELECT source, n_tokens, weight,
         |  ROUND(1000000 * weight, 6) AS alloc_tokens,
         |  ROUND(1000000 * weight / n_tokens, 6) AS epochs,
         |  (1000000 * weight / n_tokens > 4.0::DOUBLE) AS over_cap
         |FROM w""".stripMargin
    },

    "q161_matryoshka" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id < 20),
         |sc AS (
         |  SELECT q.qid, c.vec_id AS cid,
         |    ${dot("c.embedding", "q.qe")} /
         |      sqrt(${dot("c.embedding", "c.embedding")} * ${dot("q.qe", "q.qe")})
         |      AS cos_full,
         |    ${dotSub("c.embedding", "q.qe", 16)} /
         |      sqrt(${dotSub("c.embedding", "c.embedding", 16)} *
         |           ${dotSub("q.qe", "q.qe", 16)}) AS cos_sub
         |  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.qid),
         |rf AS (
         |  SELECT qid, cid, cos_full, ROW_NUMBER() OVER (
         |    PARTITION BY qid ORDER BY cos_full DESC, cid) AS r FROM sc),
         |rs AS (
         |  SELECT qid, cid, cos_sub, ROW_NUMBER() OVER (
         |    PARTITION BY qid ORDER BY cos_sub DESC, cid) AS r FROM sc)
         |SELECT f.qid AS vec_id, f.cid AS top1_full, s.cid AS top1_sub,
         |  (f.cid = s.cid) AS is_match,
         |  ROUND(f.cos_full, 6) + 0.0 AS cos_full_top,
         |  ROUND(s.cos_sub, 6) + 0.0 AS cos_sub_top
         |FROM rf f JOIN rs s ON f.qid = s.qid AND f.r = 1 AND s.r = 1""".stripMargin,

    "q163_rrf_fusion" ->
      s"""WITH bmq AS (SELECT doc_id, score FROM ($bm25Sql) x),
         |tb AS (SELECT doc_id, r AS rank_a FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
         |  FROM bmq) WHERE r <= 20),
         |cq AS (
         |  SELECT c.vec_id AS doc_id,
         |    ${dot("c.embedding", "q.embedding")} /
         |      sqrt(${dot("c.embedding", "c.embedding")} *
         |           ${dot("q.embedding", "q.embedding")}) AS cos
         |  FROM embeddings c CROSS JOIN
         |    (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |  WHERE c.vec_id <> 0),
         |tc AS (SELECT doc_id, r AS rank_b FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r
         |  FROM cq) WHERE r <= 20)
         |SELECT doc_id,
         |  COALESCE(rank_a, 0) AS rank_a, COALESCE(rank_b, 0) AS rank_b,
         |  ROUND(COALESCE(1.0::DOUBLE / (60 + rank_a), 0.0::DOUBLE)
         |      + COALESCE(1.0::DOUBLE / (60 + rank_b), 0.0::DOUBLE), 6) AS rrf
         |FROM tb FULL JOIN tc USING (doc_id)""".stripMargin,

    "q166_bpe_encode" -> KernelQueries.golden("q166_bpe_encode"),
    "q204_fertility" -> KernelQueries.golden("q204_fertility"),

    "q174_pack_boundaries" ->
      s"""WITH nt AS (
         |  SELECT source, doc_id,
         |    CAST(len($WORDS) AS BIGINT) AS n_tok
         |  FROM documents),
         |base AS (
         |  SELECT source, doc_id, n_tok,
         |    COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
         |      AS start_off
         |  FROM nt),
         |x AS (
         |  SELECT source, doc_id, n_tok, start_off,
         |    start_off // 256 AS first_pack,
         |    (start_off + n_tok - 1) // 256 AS last_pack
         |  FROM base WHERE n_tok > 0),
         |e AS (
         |  SELECT source, doc_id, n_tok, start_off, first_pack, last_pack, p
         |  FROM x, unnest(range(first_pack, last_pack + 1)) AS t(p))
         |SELECT source, CAST(p AS BIGINT) AS pack_id, doc_id,
         |  GREATEST(start_off, p * 256) - p * 256 AS seg_start,
         |  LEAST(start_off + n_tok, (p + 1) * 256)
         |    - GREATEST(start_off, p * 256) AS seg_len,
         |  (p = first_pack) AS is_doc_start,
         |  (p = last_pack) AS is_doc_end
         |FROM e""".stripMargin,

    "q178_pmi_pairs" ->
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |b2 AS (
         |  SELECT bg[1] AS w1, bg[2] AS w2
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
         |        FROM wr WHERE len(w) >= 2)),
         |uni AS (SELECT word, COUNT(*) AS c
         |        FROM (SELECT unnest($WORDS) AS word FROM documents)
         |        GROUP BY 1),
         |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM b2 GROUP BY 1, 2),
         |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
         |nb AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_big FROM big)
         |SELECT w1, w2, c12,
         |  ROUND(ln(((c12::DOUBLE * n_tok) * n_tok) /
         |    ((n_big::DOUBLE * u1.c) * u2.c)), 6) AS pmi
         |FROM big JOIN uni u1 ON u1.word = w1
         |         JOIN uni u2 ON u2.word = w2
         |         CROSS JOIN nt CROSS JOIN nb
         |WHERE c12 >= 30""".stripMargin,

    "q179_vocab_overlap" ->
      s"""WITH sv AS (
         |  SELECT DISTINCT source, word
         |  FROM (SELECT source, unnest($WORDS) AS word FROM documents)),
         |sz AS (SELECT source, COUNT(*) AS n FROM sv GROUP BY 1),
         |i AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    COUNT(*) AS n_common
         |  FROM sv a JOIN sv b ON a.word = b.word AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, n_common, sa.n AS n_a, sb.n AS n_b,
         |  ROUND(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) AS jaccard
         |FROM i JOIN sz sa ON sa.source = i.source_a
         |       JOIN sz sb ON sb.source = i.source_b""".stripMargin,

    "q173_epoch_shuffle" ->
      """WITH e AS (
        |  SELECT doc_id, CAST(ep AS BIGINT) AS epoch,
        |    ('0x' || substr(md5(CAST(ep AS VARCHAR) || ':' ||
        |      CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents, unnest(range(0, 3)) AS t(ep))
        |SELECT doc_id, epoch, h % 8 AS shard,
        |  ROW_NUMBER() OVER (PARTITION BY epoch, h % 8
        |    ORDER BY h, doc_id) AS pos
        |FROM e""".stripMargin,

    // Reuses the shared pairs CTE; unused recursive closure CTEs behind
    // it are pruned by the optimizer (q138 precedent).
    "q170_dup_graph_stats" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |e AS (SELECT id_a AS u, id_b AS v FROM pairs),
         |nodes AS (
         |  SELECT COUNT(DISTINCT n) AS n_nodes
         |  FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)),
         |deg AS (
         |  SELECT n, COUNT(*) AS d
         |  FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
         |  GROUP BY 1),
         |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
         |      FROM deg),
         |t AS (
         |  SELECT COUNT(*) AS n_tri
         |  FROM e e1 JOIN e e2 ON e1.v = e2.u
         |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
         |SELECT nodes.n_nodes AS n_nodes,
         |  (SELECT COUNT(*) FROM e) AS n_edges,
         |  COALESCE(n_wedges, 0) AS n_wedges,
         |  CAST(n_tri AS BIGINT) AS n_triangles,
         |  CASE WHEN COALESCE(n_wedges, 0) > 0
         |    THEN ROUND(3.0::DOUBLE * n_tri / n_wedges, 6) END AS transitivity
         |FROM w, t, nodes""".stripMargin,

    "q169_split_leakage" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
         |      AS b
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, ${shinglesSql(3)} AS shingles
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |sig AS (
         |  SELECT doc_id, shingles,
         |    list_transform(range(0, 8), j -> $MINHASH_SQL) AS mh
         |  FROM sh WHERE len(shingles) > 0),
         |bands AS (
         |  SELECT doc_id, b AS band_idx,
         |    mh[2*b+1] * 2147483648 + mh[2*b+2] AS band_key
         |  FROM sig, unnest(range(0, 4)) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM bands a
         |  JOIN d da ON da.doc_id = a.doc_id AND da.b < 80
         |  JOIN bands b2
         |    ON a.band_idx = b2.band_idx AND a.band_key = b2.band_key
         |  JOIN d db ON db.doc_id = b2.doc_id AND db.b >= 90),
         |ver AS (
         |  SELECT DISTINCT id_b FROM cand
         |  JOIN sh sa ON sa.doc_id = id_a
         |  JOIN sh sb ON sb.doc_id = id_b
         |  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
         |    / len(list_distinct(sa.shingles || sb.shingles)), 6) >= 0.3)
         |SELECT d.source, COUNT(*) AS n_test,
         |  CAST(SUM(CASE WHEN v.id_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_leaked,
         |  ROUND(CAST(SUM(CASE WHEN v.id_b IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT)::DOUBLE / COUNT(*), 6) AS leak_rate
         |FROM d LEFT JOIN ver v ON v.id_b = d.doc_id
         |WHERE d.b >= 90
         |GROUP BY 1""".stripMargin,

    "q164_lsh_audit" ->
      s"""WITH $lshCandCtes,
         |j AS (
         |  SELECT ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
         |      / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jacc
         |  FROM cand JOIN sh sa ON sa.doc_id = cand.id_a
         |            JOIN sh sb ON sb.doc_id = cand.id_b)
         |SELECT COUNT(*) AS n_candidates,
         |  CAST(SUM(CASE WHEN jacc >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_verified,
         |  ROUND(CAST(SUM(CASE WHEN jacc >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
         |    ::DOUBLE / COUNT(*), 6) AS cand_precision
         |FROM j""".stripMargin,

    "q155_soft_dedup" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |sz AS (SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         |  COALESCE(sz.n, 1) AS cluster_size,
         |  ROUND(1.0::DOUBLE / COALESCE(sz.n, 1), 6) AS weight
         |FROM documents d
         |LEFT JOIN comp c USING (doc_id)
         |LEFT JOIN sz ON sz.cluster_id = c.cluster_id""".stripMargin,

    "q212_rebalance" -> {
      val ps = (0 to 8).map(s =>
        s"('0x' || substr(md5('hrw:$s:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT * 16 + $s AS p_$s")
      val g8 = (0 until 8).map(s => s"p_$s").mkString(", ")
      val g9 = (0 to 8).map(s => s"p_$s").mkString(", ")
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5('shard1' || CAST(doc_id AS VARCHAR)), 1, 15))
         |      ::BIGINT AS hm,
         |    ${ps.mkString(",\n    ")}
         |  FROM documents),
         |f AS (
         |  SELECT (hm % 8) <> (hm % 9) AS moved_mod,
         |    (GREATEST($g8) % 16) <> (GREATEST($g9) % 16) AS moved_hrw
         |  FROM h),
         |g AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN moved_mod THEN 1 ELSE 0 END) AS BIGINT) AS mm,
         |    CAST(SUM(CASE WHEN moved_hrw THEN 1 ELSE 0 END) AS BIGINT) AS mh
         |  FROM f)
         |SELECT 'mod' AS method, n AS n_docs, mm AS n_moved,
         |  ROUND(mm::DOUBLE / n, 6) AS moved_frac FROM g
         |UNION ALL
         |SELECT 'rendezvous', n, mh, ROUND(mh::DOUBLE / n, 6) FROM g""".stripMargin
    },

    "q211_effective_tokens" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |sz AS (SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY 1),
         |wt AS (
         |  SELECT d.doc_id, d.source, CAST(len($WORDS) AS BIGINT) AS toks,
         |    ROUND(1.0::DOUBLE / COALESCE(sz.n, 1), 6) AS weight
         |  FROM documents d
         |  LEFT JOIN comp c USING (doc_id)
         |  LEFT JOIN sz ON sz.cluster_id = c.cluster_id),
         |g AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(toks) AS BIGINT) AS raw_tokens,
         |    ROUND(${graft.core.Det.sumDetSql("toks * weight", 6)}, 6)
         |      AS effective_tokens
         |  FROM wt GROUP BY 1)
         |SELECT source, n_docs, raw_tokens, effective_tokens,
         |  CASE WHEN effective_tokens > 0.0
         |    THEN ROUND(raw_tokens / effective_tokens, 6) END AS inflation
         |FROM g""".stripMargin,

    "q171_weighted_sample" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |sz AS (SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY 1),
         |ws AS (
         |  SELECT d.doc_id,
         |    COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         |    COALESCE(sz.n, 1) AS cluster_size,
         |    ROUND(1.0::DOUBLE / COALESCE(sz.n, 1), 6) AS weight,
         |    (('0x' || substr(md5('ws:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
         |      ::BIGINT)::DOUBLE / 4294967296.0 AS u_raw
         |  FROM documents d
         |  LEFT JOIN comp c USING (doc_id)
         |  LEFT JOIN sz ON sz.cluster_id = c.cluster_id)
         |SELECT doc_id, cluster_id, cluster_size, weight,
         |  ROUND(u_raw, 6) AS u,
         |  (u_raw < weight) AS kept
         |FROM ws""".stripMargin,

    "q84_rep_spans" -> {
      val span = (0 until 10).map(j => s"w[i+$j]").mkString(" || ' ' || ")
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |sp AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(1, len(w) - 8), i -> $span)) AS s
         |        FROM wr WHERE len(w) >= 10)),
         |nd AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM sp GROUP BY 1),
         |pd AS (
         |  SELECT doc_id, COUNT(*) AS n_spans,
         |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM sp JOIN nd USING (h) GROUP BY 1)
         |SELECT d.doc_id, COALESCE(n_spans, 0) AS n_spans,
         |  COALESCE(n_dup, 0) AS n_dup_spans,
         |  CASE WHEN n_spans IS NOT NULL
         |    THEN ROUND(n_dup::DOUBLE / n_spans, 6) END AS dup_frac
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin
    },

    "q85_bigram_lm" -> bigramLmSql,

    "q125_perplexity_filter" ->
      s"""SELECT doc_id, n_bigrams, avg_nll,
         |  CAST(floor(avg_nll) AS BIGINT) AS bucket,
         |  COALESCE(avg_nll <= 6.0, false) AS kept
         |FROM ($bigramLmSql)""".stripMargin,

    "q128_dsir" ->
      s"""WITH wr AS (SELECT doc_id, lang = 'en' AS tgt, $WORDS AS w
         |            FROM documents),
         |bg AS (
         |  SELECT doc_id, tgt,
         |    ('0x' || substr(md5(bgs), 1, 15))::BIGINT % 4096 AS b
         |  FROM (SELECT doc_id, tgt, unnest(list_transform(
         |          range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bgs
         |        FROM wr WHERE len(w) >= 2)),
         |perdoc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         |rawh AS (SELECT b, COUNT(*) AS cr FROM bg GROUP BY 1),
         |tgth AS (SELECT b, COUNT(*) AS ct FROM bg WHERE tgt GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS nr,
         |  CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS nt FROM bg),
         |ratio AS (
         |  SELECT rawh.b, ROUND(
         |    ln((COALESCE(ct, 0) + 1.0) / CAST(nt + 4096 AS DOUBLE)) -
         |    ln((cr + 1.0) / CAST(nr + 4096 AS DOUBLE)), 6) AS lr
         |  FROM rawh LEFT JOIN tgth USING (b) CROSS JOIN tot),
         |pd AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feat,
         |    ROUND(${graft.core.Det.sumDetSql("c * lr", 6)}, 6) AS logw
         |  FROM perdoc JOIN ratio USING (b) GROUP BY 1)
         |SELECT d.doc_id, COALESCE(n_feat, 0) AS n_feat, logw,
         |  COALESCE(logw >= 0.0, false) AS kept
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q133_gopher_rules" -> gopherSelectSql,

    "q131_zipf" -> {
      val sd = (e: String) => graft.core.Det.sumDetSql(e, 6)
      s"""WITH wc AS (
         |  SELECT word, COUNT(*) AS cnt
         |  FROM (SELECT unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1 ORDER BY cnt DESC, word LIMIT 1000),
         |t AS (
         |  SELECT ROUND(ln(ROW_NUMBER() OVER (ORDER BY cnt DESC, word)), 6) AS x,
         |    ROUND(ln(cnt), 6) AS y
         |  FROM wc),
         |s AS (
         |  SELECT COUNT(*) AS n, ${sd("x")} AS sx, ${sd("y")} AS sy,
         |    ${sd("x * y")} AS sxy, ${sd("x * x")} AS sxx
         |  FROM t)
         |SELECT n,
         |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
         |    6) AS intercept
         |FROM s""".stripMargin
    },

    "q132_source_report" ->
      s"""WITH q AS (
         |  SELECT source, n_words, quality_score FROM (
         |    SELECT source, len(w) AS n_words,
         |      ROUND(0.4 * ROUND(len(list_distinct(w))::DOUBLE / len(w), 6)
         |        + 0.3 * LEAST(len(w)::DOUBLE / 50.0, 1.0)
         |        + 0.3 * (1.0 - ROUND(len(list_filter(w, x -> x IN
         |            (${TextAnalysis.stopwords.head._2.map(x => s"'$x'").mkString(", ")})))::DOUBLE
         |          / len(w), 6)), 6) AS quality_score
         |    FROM (SELECT source, $WORDS AS w FROM documents)))
    |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN n_words = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_empty,
         |  ROUND(${graft.core.Det.avgDetSql("n_words::DOUBLE", 0)}, 6)
         |    AS avg_words,
         |  ROUND(${graft.core.Det.avgDetSql(
              "CASE WHEN n_words > 0 THEN quality_score END", 6)}, 6)
         |    AS avg_quality,
         |  ROUND(SUM(CASE WHEN n_words > 0 AND quality_score < 0.5
         |      THEN 1 ELSE 0 END)::DOUBLE
         |    / COUNT(CASE WHEN n_words > 0 THEN quality_score END), 6)
         |    AS low_quality_rate
         |FROM q GROUP BY 1""".stripMargin,

    "q129_hash_classifier" ->
      s"""SELECT doc_id, n_words, margin,
         |  CASE WHEN margin IS NOT NULL
         |    THEN ROUND(1.0 / (1.0 + exp(-margin)), 6) END AS prob,
         |  COALESCE(CASE WHEN margin IS NOT NULL
         |    THEN ROUND(1.0 / (1.0 + exp(-margin)), 6) END >= 0.5,
         |    false) AS label
         |FROM (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         |    CASE WHEN len(w) > 0 THEN ROUND(list_reduce(
         |      list_transform(w, x ->
         |        ((('0x' || substr(md5('clf:' || x), 1, 15))::BIGINT % 2001)
         |          - 1000) / 1000.0),
         |      (a, b) -> a + b) / len(w), 6) END AS margin
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents))""".stripMargin,

    "q130_rand_projection" -> {
      val m = graft.llm.Similarity.rpMatrix(64, 16)
      val scale = math.rint(math.sqrt(3.0 / 16) * 1e6) / 1e6
      (0 until 16).map { j =>
        val terms = (0 until 64).filter(i => m(i)(j) != 0).map { i =>
          val sign = if (m(i)(j) > 0) "+" else "-"
          s"$sign (embedding[${i + 1}])::DOUBLE"
        }
        val body =
          if (terms.isEmpty) "0.0"
          else terms.mkString(" ").stripPrefix("+ ")
        s"""SELECT vec_id, CAST($j AS BIGINT) AS dim,
           |  ROUND(($body) * $scale, 6) + 0.0 AS val FROM embeddings""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "q127_containment" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(3)} AS s
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |r2 AS (
         |  SELECT DISTINCT doc_id, unnest(s) AS shingle
         |  FROM sh WHERE len(s) > 0),
         |dfq AS (SELECT shingle, COUNT(*) AS df FROM r2 GROUP BY 1),
         |rare AS (SELECT r2.doc_id, r2.shingle, df
         |         FROM r2 JOIN dfq USING (shingle) WHERE df <= 5),
         |pref AS (SELECT doc_id, shingle FROM (
         |  SELECT doc_id, shingle, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY df, shingle) AS rn FROM rare)
         |  WHERE rn <= 5),
         |cand AS (
         |  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS id_a,
         |    GREATEST(a.doc_id, b.doc_id) AS id_b
         |  FROM pref a JOIN rare b USING (shingle)
         |  WHERE a.doc_id <> b.doc_id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, COUNT(*) AS i
         |  FROM cand c
         |  JOIN r2 ra ON ra.doc_id = c.id_a
         |  JOIN r2 rb ON rb.doc_id = c.id_b AND rb.shingle = ra.shingle
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM r2 GROUP BY 1)
         |SELECT id_a, id_b,
         |  ROUND(i::DOUBLE / za.n, 6) AS cont_a,
         |  ROUND(i::DOUBLE / zb.n, 6) AS cont_b
         |FROM inter
         |JOIN sz za ON za.doc_id = id_a
         |JOIN sz zb ON zb.doc_id = id_b
         |WHERE greatest(ROUND(i::DOUBLE / za.n, 6),
         |               ROUND(i::DOUBLE / zb.n, 6)) >= 0.3""".stripMargin,

    "q86_source_drift" ->
      s"""WITH sw AS (
         |  SELECT source, word, COUNT(*) AS c
         |  FROM (SELECT source, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |corpus AS (SELECT word, CAST(SUM(c) AS BIGINT) AS cw FROM sw GROUP BY 1),
         |totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ts FROM sw GROUP BY 1),
         |tc AS (SELECT CAST(SUM(cw) AS BIGINT) AS tc FROM corpus),
         |terms AS (
         |  SELECT source, ts,
         |    ROUND((c::DOUBLE / ts::DOUBLE)
         |      * ROUND(ln(c::DOUBLE / ts::DOUBLE), 6), 10) AS ent_term,
         |    ROUND((c::DOUBLE / ts::DOUBLE)
         |      * ROUND(ln((c::DOUBLE / ts::DOUBLE) / (cw::DOUBLE / tc::DOUBLE)), 6), 10) AS kl_term
         |  FROM sw JOIN corpus USING (word) JOIN totals USING (source) CROSS JOIN tc)
         |SELECT source, MAX(ts) AS n_tokens, COUNT(*) AS n_vocab,
         |  ROUND(-${graft.core.Det.sumDetSql("ent_term", 10)}, 6) AS entropy,
         |  ROUND(${graft.core.Det.sumDetSql("kl_term", 10)}, 6) AS kl_corpus
         |FROM terms GROUP BY 1""".stripMargin,

    "q81_decontam" -> decontamSql,

    // q118 is q81 with a Spark-side Bloom pre-filter that provably does
    // not change the result set — the oracle is the identical SQL.
    "q118_decontam_bloom" -> decontamSql,

    "q107_bpe_pairs" ->
      s"""WITH wc AS (
         |  SELECT word, COUNT(*) AS c
         |  FROM (SELECT unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1),
         |sym AS (SELECT c, string_split(word || '_', '') AS s FROM wc),
         |pairs AS (
         |  SELECT c, s[i] AS sym_a, s[i + 1] AS sym_b
         |  FROM sym, unnest(range(1, len(s))) AS t(i))
         |SELECT sym_a, sym_b, CAST(SUM(c) AS BIGINT) AS pair_count
         |FROM pairs GROUP BY 1, 2 HAVING SUM(c) >= 10""".stripMargin,

    "q103_dup_ngrams" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(${shinglesSql(5)}) AS shingle
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |c AS (SELECT shingle, COUNT(*) AS n FROM sh GROUP BY 1)
         |SELECT doc_id, COUNT(*) AS n_shingles,
         |  COUNT(*) FILTER (WHERE n > 1) AS n_dup_shingles,
         |  round_even(COUNT(*) FILTER (WHERE n > 1) / COUNT(*), 6) AS dup_frac
         |FROM sh JOIN c USING (shingle)
         |GROUP BY 1""".stripMargin,

    "q109_doc_chunks" ->
      s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
         |nn AS (SELECT doc_id, w, len(w) AS n FROM d WHERE len(w) > 0),
         |st AS (
         |  SELECT doc_id, w, n,
         |    unnest(CASE WHEN n <= 24 THEN [CAST(0 AS BIGINT)]
         |      ELSE list_distinct(list_append(range(0, n - 24, 16), n - 24))
         |      END) AS start
         |  FROM nn)
         |SELECT doc_id, CAST(start AS BIGINT) AS start_word,
         |  CAST(LEAST(24, n - start) AS BIGINT) AS n_words,
         |  array_to_string(w[start + 1 : start + 24], ' ') AS chunk
         |FROM st""".stripMargin,

    "q110_length_buckets" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, CAST(len($WORDS) AS BIGINT) AS n_words
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, source, n_words,
         |    CAST(CASE WHEN n_words <= 16 THEN 16 WHEN n_words <= 32 THEN 32
         |      WHEN n_words <= 64 THEN 64 WHEN n_words <= 128 THEN 128
         |      ELSE 256 END AS BIGINT) AS bucket,
         |    ('0x' || substr(md5('lbb1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |      % 4 AS shard
         |  FROM d WHERE n_words > 0)
         |SELECT doc_id, source, n_words, bucket, shard,
         |  (ROW_NUMBER() OVER (PARTITION BY source, shard, bucket
         |     ORDER BY doc_id) - 1) // (256 // bucket) AS batch_id,
         |  CAST(bucket - LEAST(n_words, bucket) AS DOUBLE) / bucket AS pad_frac
         |FROM b""".stripMargin,

    "q80_shards" ->
      """SELECT doc_id, shard, pos FROM (
        |  SELECT doc_id, h % 16 AS shard,
        |    ROW_NUMBER() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS pos
        |  FROM (SELECT doc_id,
        |          ('0x' || substr(md5('shard1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |        FROM documents))""".stripMargin,

    "q61_embed_dup" -> {
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |bands AS ($bandKeysSql),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.bi = b.bi AND a.bk = b.bk AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |  ROUND(${dot("a.embedding", "b.embedding")} / sqrt(a.n2 * b.n2), 6) AS cos
         |FROM cand JOIN n a ON cand.id_a = a.vec_id
         |          JOIN n b ON cand.id_b = b.vec_id
         |WHERE ROUND(${dot("a.embedding", "b.embedding")} / sqrt(a.n2 * b.n2), 6) >= 0.3""".stripMargin
    },

    "q106_label_agreement" -> {
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |bands AS ($bandKeysSql),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.bi = b.bi AND a.bk = b.bk AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT id_a, id_b,
         |    ROUND(${dot("a.embedding", "b.embedding")} / sqrt(a.n2 * b.n2), 6) AS cos
         |  FROM cand JOIN n a ON cand.id_a = a.vec_id
         |            JOIN n b ON cand.id_b = b.vec_id
         |  WHERE ROUND(${dot("a.embedding", "b.embedding")} / sqrt(a.n2 * b.n2), 6) >= 0.3)
         |SELECT least(la.label, lb.label) AS label_lo,
         |  greatest(la.label, lb.label) AS label_hi,
         |  COUNT(*) AS n_pairs,
         |  CAST(SUM(CAST(cos AS DECIMAL(24,6))) AS DOUBLE) AS sum_cos
         |FROM pairs
         |JOIN embeddings la ON pairs.id_a = la.vec_id
         |JOIN embeddings lb ON pairs.id_b = lb.vec_id
         |GROUP BY 1, 2""".stripMargin
    },

    "q144_split_assign" ->
      """WITH a AS (
        |  SELECT source, n_chars,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT source, n_chars,
        |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |        FROM documents))
        |SELECT source, split, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
        |FROM a GROUP BY 1, 2""".stripMargin,

    "q145_dup_spans" -> {
      val K = 8
      s"""WITH base AS (
         |  SELECT doc_id, CAST(len($WORDS) AS BIGINT) AS n_words, $WORDS AS w
         |  FROM documents),
         |wins AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         |    array_to_string(list_slice(w, i + 1, i + $K), ' ') AS gram
         |  FROM base, unnest(range(0, n_words - $K + 1)) AS t(i)
         |  WHERE n_words >= $K),
         |dupg AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) > 1),
         |dup AS (SELECT doc_id, pos FROM wins JOIN dupg USING (gram)),
         |c AS (
         |  SELECT doc_id, pos,
         |    MAX(pos + $K - 1) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cme
         |  FROM dup),
         |cov AS (
         |  SELECT doc_id, CAST(SUM(GREATEST(
         |      pos + $K - 1 - GREATEST(pos, COALESCE(cme + 1, pos)) + 1, 0))
         |    AS BIGINT) AS covered_tokens
         |  FROM c GROUP BY 1)
         |SELECT b.doc_id, b.n_words,
         |  COALESCE(cov.covered_tokens, 0) AS covered_tokens,
         |  ROUND(COALESCE(cov.covered_tokens, 0)::DOUBLE / b.n_words, 6) AS dup_frac
         |FROM base b LEFT JOIN cov USING (doc_id)""".stripMargin
    },

    "q215_contamination_span" -> {
      val K = 8
      s"""WITH base AS (
         |  SELECT doc_id, CAST(len($WORDS) AS BIGINT) AS n_words, $WORDS AS w
         |  FROM documents),
         |wins AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         |    array_to_string(list_slice(w, i + 1, i + $K), ' ') AS gram
         |  FROM base, unnest(range(0, n_words - $K + 1)) AS t(i)
         |  WHERE n_words >= $K),
         |eg AS (SELECT DISTINCT gram FROM wins WHERE doc_id % 97 = 0),
         |h AS (SELECT doc_id, pos FROM wins JOIN eg USING (gram)
         |      WHERE doc_id % 97 <> 0),
         |r AS (SELECT doc_id, pos,
         |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
         |          AS grp
         |      FROM h),
         |rl AS (SELECT doc_id, COUNT(*) AS len FROM r GROUP BY doc_id, grp),
         |agg AS (SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_hits,
         |          MAX(len) AS max_run
         |        FROM rl GROUP BY 1)
         |SELECT b.doc_id, b.n_words,
         |  GREATEST(b.n_words - ${K - 1}, 0) AS n_grams,
         |  COALESCE(a.n_hits, 0) AS n_hits,
         |  COALESCE(a.max_run, 0) AS max_run,
         |  CASE WHEN COALESCE(a.max_run, 0) > 0 THEN a.max_run + ${K - 1}
         |       ELSE 0 END AS span_tokens
         |FROM base b LEFT JOIN agg a USING (doc_id)
         |WHERE b.doc_id % 97 <> 0""".stripMargin
    },

    "q216_cluster_split" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |r AS (
         |  SELECT d.doc_id, d.source,
         |    COALESCE(c.cluster_id, d.doc_id) AS root
         |  FROM documents d LEFT JOIN comp c USING (doc_id)),
         |b AS (
         |  SELECT doc_id, source, root,
         |    ('0x' || substr(md5(CAST(root AS VARCHAR)), 1, 8))::BIGINT % 100
         |      AS bk
         |  FROM r)
         |SELECT doc_id, source, root,
         |  CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,

    "q217_margin_mining" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |fwd AS (
         |  SELECT query_id, cand_id, cos, rnk FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |                 c.vec_id) AS rnk
         |    FROM n q JOIN n c ON q.vec_id % 2 = 0 AND q.vec_id < 40
         |                     AND c.vec_id % 2 = 1)
         |  WHERE rnk <= 4),
         |favg AS (
         |  SELECT query_id,
         |    CAST(SUM(CAST(cos AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_q
         |  FROM fwd GROUP BY 1),
         |cand AS (SELECT DISTINCT cand_id FROM fwd),
         |bwd AS (
         |  SELECT cid AS cand_id, cos FROM (
         |    SELECT y.vec_id AS cid, s.vec_id AS sid,
         |      ROUND(${dot("y.embedding", "s.embedding")} / sqrt(y.n2 * s.n2), 6) AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY y.vec_id
         |        ORDER BY ROUND(${dot("y.embedding", "s.embedding")} / sqrt(y.n2 * s.n2), 6) DESC,
         |                 s.vec_id) AS rnk
         |    FROM n y JOIN cand ON y.vec_id = cand.cand_id
         |             JOIN n s ON s.vec_id % 2 = 0)
         |  WHERE rnk <= 4),
         |bavg AS (
         |  SELECT cand_id,
         |    CAST(SUM(CAST(cos AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_c
         |  FROM bwd GROUP BY 1)
         |SELECT f.query_id, f.cand_id, f.cos, f.rnk,
         |  ROUND(f.cos / ((avg_q + avg_c) / 2), 6) AS margin
         |FROM fwd f JOIN favg USING (query_id) JOIN bavg USING (cand_id)""".stripMargin,

    "q219_ccnet_buckets" ->
      s"""WITH lm AS ($bigramLmSql),
         |sc AS (
         |  SELECT l.doc_id, d.lang, l.avg_nll
         |  FROM lm l JOIN documents d USING (doc_id)
         |  WHERE l.avg_nll IS NOT NULL),
         |th AS (
         |  SELECT lang, quantile_cont(avg_nll,
         |    [${1.0 / 3}, ${2.0 / 3}]) AS t
         |  FROM sc GROUP BY 1)
         |SELECT sc.lang,
         |  CASE WHEN avg_nll <= t[1] THEN 'head'
         |       WHEN avg_nll <= t[2] THEN 'middle'
         |       ELSE 'tail' END AS bucket,
         |  COUNT(*) AS n_docs,
         |  ROUND(MIN(avg_nll), 6) AS min_nll,
         |  ROUND(MAX(avg_nll), 6) AS max_nll
         |FROM sc JOIN th USING (lang)
         |GROUP BY 1, 2""".stripMargin,

    "q220_source_overlap" -> {
      val a = Dedup.HASH_A.mkString("[", ", ", "]")
      val b = Dedup.HASH_B.mkString("[", ", ", "]")
      s"""WITH sh AS (
         |  SELECT doc_id, source, unnest(${shinglesSql(3)}) AS shingle
         |  FROM (SELECT doc_id, source, $WORDS AS w FROM documents)),
         |h AS (
         |  SELECT source, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hb
         |  FROM sh),
         |sig AS (
         |  SELECT source, j,
         |    MIN((($a)[j+1] * hb + ($b)[j+1]) % ${Dedup.MINHASH_P}) AS mh
         |  FROM h, unnest(range(0, 8)) AS t(j) GROUP BY 1, 2)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  CAST(COUNT(*) FILTER (WHERE a.mh = b.mh) AS BIGINT) AS n_eq,
         |  ROUND((COUNT(*) FILTER (WHERE a.mh = b.mh))::DOUBLE / 8, 6)
         |    AS est_jaccard
         |FROM sig a JOIN sig b ON a.j = b.j AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin
    },

    // The parquet round trip is an identity, and min over a partition of
    // the rows is min over the rows — so the oracle computes the direct
    // per-source signature and the workflow's invariants: full-width
    // signature agreement and the KMV estimate off the merged minima.
    "q231_sketch_shard_merge" -> {
      val a = Dedup.HASH_A.mkString("[", ", ", "]")
      val b = Dedup.HASH_B.mkString("[", ", ", "]")
      s"""WITH sh AS (
         |  SELECT doc_id, source, unnest(${shinglesSql(3)}) AS shingle
         |  FROM (SELECT doc_id, source, $WORDS AS w FROM documents)),
         |h AS (
         |  SELECT doc_id, source,
         |    ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hb
         |  FROM sh),
         |sig AS (
         |  SELECT source, j,
         |    MIN((($a)[j+1] * hb + ($b)[j+1]) % ${Dedup.MINHASH_P}) AS mh
         |  FROM h, unnest(range(0, 8)) AS t(j) GROUP BY 1, 2),
         |ssum AS (
         |  SELECT source, CAST(SUM(mh) AS BIGINT) AS smh FROM sig GROUP BY 1),
         |shards AS (
         |  SELECT source, COUNT(DISTINCT doc_id % 4) AS n_shards FROM sh
         |  GROUP BY 1)
         |SELECT s.source, shards.n_shards, CAST(8 AS BIGINT) AS n_eq_sig,
         |  ROUND(8.0 * ${Dedup.MINHASH_P} / smh - 1.0, 2) AS est_kmv,
         |  TRUE AS merge_exact
         |FROM ssum s JOIN shards USING (source)""".stripMargin
    },

    "q232_bottomk_sample" ->
      """WITH b AS (
        |  SELECT source, doc_id, LENGTH(text)::DOUBLE AS len,
        |    md5('bk1' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |samp AS (
        |  SELECT * FROM (
        |    SELECT b.*, ROW_NUMBER() OVER (
        |      PARTITION BY source ORDER BY h, doc_id) AS rnk FROM b)
        |  WHERE rnk <= 64),
        |e AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    quantile_cont(len, [0.5, 0.9]) AS q
        |  FROM b GROUP BY 1),
        |sm AS (
        |  SELECT source, COUNT(*) AS n_sample,
        |    quantile_cont(len, [0.5, 0.9]) AS q
        |  FROM samp GROUP BY 1)
        |SELECT e.source, e.n_docs, sm.n_sample,
        |  ROUND(e.q[1], 4) AS exact_p50, ROUND(sm.q[1], 4) AS est_p50,
        |  ROUND(e.q[2], 4) AS exact_p90, ROUND(sm.q[2], 4) AS est_p90,
        |  ROUND(ABS(sm.q[1] - e.q[1]) / e.q[1], 4) AS err_p50,
        |  ROUND(ABS(sm.q[2] - e.q[2]) / e.q[2], 4) AS err_p90
        |FROM e JOIN sm USING (source)""".stripMargin,

    "q233_countmin" -> {
      val a = Dedup.HASH_A.mkString("[", ", ", "]")
      val b = Dedup.HASH_B.mkString("[", ", ", "]")
      s"""WITH f AS (
         |  SELECT word, COUNT(*) AS n_exact FROM (
         |    SELECT unnest($WORDS) AS word FROM documents) GROUP BY 1),
         |hb AS (
         |  SELECT word, n_exact,
         |    ('0x' || substr(md5(word), 1, 8))::BIGINT AS base
         |  FROM f),
         |cells AS (
         |  SELECT j,
         |    ((($a)[j+1] * base + ($b)[j+1]) % ${Dedup.MINHASH_P}) % 256
         |      AS bucket,
         |    n_exact
         |  FROM hb, unnest(range(0, 4)) AS t(j)),
         |sk AS (
         |  SELECT j, bucket, CAST(SUM(n_exact) AS BIGINT) AS c
         |  FROM cells GROUP BY 1, 2),
         |top AS (
         |  SELECT word, n_exact, base FROM hb
         |  ORDER BY n_exact DESC, word LIMIT 20),
         |probe AS (
         |  SELECT word, n_exact, j,
         |    ((($a)[j+1] * base + ($b)[j+1]) % ${Dedup.MINHASH_P}) % 256
         |      AS bucket
         |  FROM top, unnest(range(0, 4)) AS t(j))
         |SELECT p.word, MAX(p.n_exact) AS n_exact, MIN(sk.c) AS n_est,
         |  MIN(sk.c) - MAX(p.n_exact) AS overcount
         |FROM probe p JOIN sk USING (j, bucket)
         |GROUP BY 1""".stripMargin
    },

    "q235_hill_tail" -> {
      val sd = graft.core.Det.sumDetSql("tt", 6)
      s"""WITH b AS (
         |  SELECT source, doc_id, LENGTH(text)::DOUBLE AS len
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, len, ROW_NUMBER() OVER (
         |    PARTITION BY source ORDER BY len DESC, doc_id) AS rnk
         |  FROM b),
         |thr AS (SELECT source, len AS xk FROM r WHERE rnk = 17),
         |t AS (
         |  SELECT r.source, ROUND(ln(r.len / thr.xk), 6) AS tt
         |  FROM r JOIN thr USING (source) WHERE rnk <= 16),
         |g AS (
         |  SELECT source, COUNT(*) AS n_top, $sd AS st
         |  FROM t GROUP BY 1)
         |SELECT g.source, g.n_top, thr.xk AS x_k,
         |  ROUND(st / 16, 6) AS mean_log_excess,
         |  CASE WHEN ROUND(st / 16, 6) > 0
         |       THEN ROUND(1.0::DOUBLE / ROUND(st / 16, 6), 6) END
         |    AS hill_alpha
         |FROM g JOIN thr USING (source)""".stripMargin
    },

    "q236_token_gini" ->
      s"""WITH f AS (
         |  SELECT source, word, COUNT(*) AS c FROM (
         |    SELECT source, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT source, c, ROW_NUMBER() OVER (
         |    PARTITION BY source ORDER BY c, word) AS i
         |  FROM f),
         |g AS (
         |  SELECT source, COUNT(*) AS n_types,
         |    CAST(SUM(c) AS BIGINT) AS total_tokens,
         |    CAST(SUM(i * c) AS BIGINT) AS ic
         |  FROM r GROUP BY 1)
         |SELECT source, n_types, total_tokens,
         |  ROUND((2 * ic - (n_types + 1) * total_tokens)::DOUBLE
         |    / (n_types * total_tokens)::DOUBLE, 6) AS gini
         |FROM g""".stripMargin,

    "q234_mojibake" ->
      """WITH carved AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 13 = 0 THEN replace(text, 'a', 'Ã¡')
        |         ELSE text END AS t
        |  FROM documents),
        |cnt AS (
        |  SELECT source,
        |    (LENGTH(t) - LENGTH(replace(t, 'Ã¡', ''))) // 2
        |    + (LENGTH(t) - LENGTH(replace(t, 'Ã©', ''))) // 2
        |    + (LENGTH(t) - LENGTH(replace(t, '�', ''))) AS bad
        |  FROM carved)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN bad > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(SUM(bad) AS BIGINT) AS total_markers,
        |  ROUND(SUM(CASE WHEN bad > 0 THEN 1 ELSE 0 END)::DOUBLE
        |    / COUNT(*), 6) AS flag_rate
        |FROM cnt GROUP BY 1""".stripMargin,

    "q237_moments_quantile" -> {
      val sd8 = (e: String) => graft.core.Det.sumDetSql(e, 8)
      def est(z: Double): String =
        s"mu + sd*($z::DOUBLE) + sd*sk*(${CfK1(z)}::DOUBLE)" +
          s" + sd*ku*(${CfK2(z)}::DOUBLE) + sd*sk*sk*(${CfK3(z)}::DOUBLE)"
      s"""WITH b AS (
         |  SELECT source, ROUND(ln(LENGTH(text)::DOUBLE), 8) AS t
         |  FROM documents),
         |p AS (SELECT source, t, ROUND(t*t, 8) AS t2 FROM b),
         |p2 AS (SELECT source, t, t2, ROUND(t2*t, 8) AS t3 FROM p),
         |p3 AS (SELECT source, t, t2, t3, ROUND(t3*t, 8) AS t4 FROM p2),
         |g AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    ${sd8("t")} AS s1, ${sd8("t2")} AS s2,
         |    ${sd8("t3")} AS s3, ${sd8("t4")} AS s4,
         |    quantile_cont(t, [0.5, 0.9]) AS q
         |  FROM p3 GROUP BY 1),
         |m1 AS (SELECT *, s1 / n_docs AS mu FROM g),
         |m2c AS (SELECT *, s2 / n_docs - mu * mu AS m2 FROM m1),
         |m3 AS (SELECT *, sqrt(m2) AS sd FROM m2c),
         |m4 AS (
         |  SELECT *,
         |    (s3 / n_docs - 3 * mu * m2 - mu * mu * mu) / (m2 * sd) AS sk,
         |    (s4 / n_docs - 4 * mu * (s3 / n_docs)
         |      + 6 * mu * mu * (s2 / n_docs)
         |      - 3 * mu * mu * mu * mu) / (m2 * m2) - 3 AS ku
         |  FROM m3),
         |e AS (
         |  SELECT *, ${est(0.0)} AS e50, ${est(1.2815515655446004)} AS e90
         |  FROM m4)
         |SELECT source, n_docs,
         |  ROUND(mu, 6) AS mean_ln, ROUND(sd, 6) AS sd_ln,
         |  ROUND(sk, 6) AS skew, ROUND(ku, 6) AS ex_kurt,
         |  ROUND(e50, 6) AS est_p50, ROUND(q[1], 6) AS exact_p50,
         |  ROUND(ABS(e50 - q[1]), 6) AS err_p50,
         |  ROUND(e90, 6) AS est_p90, ROUND(q[2], 6) AS exact_p90,
         |  ROUND(ABS(e90 - q[2]), 6) AS err_p90
         |FROM e""".stripMargin
    },

    "q238_unimax" ->
      s"""WITH t AS (
         |  SELECT source, CAST(SUM(len($WORDS)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |c AS (SELECT source, n_tokens, n_tokens * 4 AS cap_tokens FROM t),
         |s AS (SELECT CAST(SUM(n_tokens) * 2 AS BIGINT) AS bb,
         |             COUNT(*) AS k FROM c),
         |r AS (
         |  SELECT c.*, s.bb, s.k,
         |    CAST(ROW_NUMBER() OVER (ORDER BY cap_tokens, source)
         |      AS BIGINT) AS i,
         |    CAST(SUM(cap_tokens) OVER (ORDER BY cap_tokens, source
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pref
         |  FROM c, s),
         |f AS (
         |  SELECT *, (cap_tokens * (k - i + 1) <=
         |             bb - (pref - cap_tokens)) AS sat
         |  FROM r),
         |m AS (SELECT COALESCE(MAX(CASE WHEN sat THEN i END), 0) AS mm,
         |             COALESCE(MAX(CASE WHEN sat THEN pref END), 0) AS pm
         |      FROM f),
         |a AS (
         |  SELECT f.*, m.mm, m.pm,
         |    CASE WHEN i <= mm THEN cap_tokens::DOUBLE
         |         ELSE (bb - pm)::DOUBLE / (k - mm)::DOUBLE END AS alloc
         |  FROM f, m)
         |SELECT source, n_tokens, cap_tokens,
         |  ROUND(alloc, 4) AS alloc_tokens,
         |  ROUND(alloc / n_tokens::DOUBLE, 6) AS epochs,
         |  CASE WHEN i <= mm THEN 1 ELSE 0 END AS saturated
         |FROM a""".stripMargin,

    "q239_ngram_novelty" ->
      s"""WITH wr AS (SELECT source, doc_id, $WORDS AS w FROM documents),
         |g AS (
         |  SELECT source, doc_id, substr(md5(sh), 1, 16) AS gk
         |  FROM (SELECT source, doc_id, unnest(${shinglesSql(3)}) AS sh
         |        FROM wr)),
         |fo AS (SELECT gk, MIN(doc_id) AS first_doc FROM g GROUP BY 1),
         |d AS (
         |  SELECT g.source, g.doc_id, COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nov
         |  FROM g JOIN fo USING (gk) GROUP BY 1, 2),
         |r AS (
         |  SELECT source, doc_id, n,
         |    ROUND(nov::DOUBLE / n, 6) AS rr
         |  FROM d)
         |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_grams,
         |  ROUND(${graft.core.Det.avgDetSql("rr", 6)}, 6) AS avg_novelty,
         |  CAST(SUM(CASE WHEN rr < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_low_novelty
         |FROM r GROUP BY 1""".stripMargin,

    "q240_hyperball" -> {
      // Register-step and ball-step CTE generators; the estimator text is
      // q139's verbatim (proven cross-engine double parity).
      def regStep(prev: String, out: String) =
        s"""$out AS (
           |  SELECT v, bucket, MAX(m) AS m FROM (
           |    SELECT * FROM $prev
           |    UNION ALL
           |    SELECT e.v AS v, r.bucket, r.m
           |    FROM edges e JOIN $prev r ON r.v = e.u)
           |  GROUP BY 1, 2)""".stripMargin
      def ballStep(prev: String, out: String) =
        s"""$out AS (
           |  SELECT DISTINCT v, w FROM (
           |    SELECT * FROM $prev
           |    UNION ALL
           |    SELECT e.v AS v, b.w FROM edges e JOIN $prev b ON b.v = e.u))"""
          .stripMargin
      def estCte(reg: String, out: String) =
        s"""$out AS (
           |  SELECT v, CASE WHEN raw <= 160.0 AND zeros > 0
           |    THEN ROUND(64 * ln(CAST(64.0 AS DOUBLE) / zeros), 4)
           |    ELSE ROUND(raw, 4) END AS est
           |  FROM (
           |    SELECT v, 64 - np AS zeros,
           |      CAST(2904.064 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
           |        / CAST(psum + (64 - np)::HUGEINT
           |            * 1152921504606846976::HUGEINT AS DOUBLE) AS raw
           |    FROM (SELECT v, COUNT(*) AS np,
           |            SUM((1::BIGINT << (60 - m))::HUGEINT) AS psum
           |          FROM $reg GROUP BY 1)))""".stripMargin
      def snapCte(est: String, b: String, t: Int, out: String) =
        s"""$out AS (
           |  SELECT CAST($t AS BIGINT) AS t, COUNT(*) AS n_nodes,
           |    ROUND(${graft.core.Det.avgDetSql("est", 4)}, 4) AS avg_est_ball,
           |    ROUND(CAST(SUM(c) AS BIGINT)::DOUBLE / COUNT(*), 6)
           |      AS avg_exact_ball,
           |    ROUND(${graft.core.Det.avgDetSql("err", 4)}, 4) AS mean_abs_err
           |  FROM (
           |    SELECT ee.v, ee.est, x.c,
           |      ROUND(ABS(ee.est - x.c::DOUBLE), 4) AS err
           |    FROM $est ee JOIN (SELECT v, COUNT(*) AS c FROM $b GROUP BY 1) x
           |      USING (v)))""".stripMargin
      s"""WITH RECURSIVE $textClusterCtes,
         |nd AS (SELECT DISTINCT u AS v FROM edges),
         |h0 AS (
         |  SELECT v, ('0x' || substr(md5('hb:' || CAST(v AS VARCHAR)),
         |    1, 15))::BIGINT AS hv
         |  FROM nd),
         |r0 AS (
         |  SELECT v, hv & 63 AS bucket,
         |    CASE WHEN (hv >> 6) = 0 THEN 55
         |         ELSE 55 - length(bin(hv >> 6)) END AS m
         |  FROM h0),
         |${regStep("r0", "r1")},
         |${regStep("r1", "r2")},
         |b0 AS (SELECT v, v AS w FROM nd),
         |${ballStep("b0", "b1")},
         |${ballStep("b1", "b2")},
         |${estCte("r0", "e0")},
         |${estCte("r1", "e1")},
         |${estCte("r2", "e2")},
         |${snapCte("e0", "b0", 0, "s0")},
         |${snapCte("e1", "b1", 1, "s1")},
         |${snapCte("e2", "b2", 2, "s2")}
         |SELECT * FROM s0 UNION ALL SELECT * FROM s1
         |UNION ALL SELECT * FROM s2""".stripMargin
    },

    "q256_lm_persist" ->
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |b2 AS (
         |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
         |        FROM wr WHERE len(w) >= 2)),
         |counts AS (SELECT w1, w2, COUNT(*) AS c12 FROM b2 GROUP BY 1, 2),
         |pd AS (SELECT doc_id, COUNT(*) AS n_bigrams FROM b2 GROUP BY 1),
         |s AS (
         |  SELECT COUNT(*) AS n_docs,
         |    CAST(SUM(CASE WHEN n_bigrams IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_scored
         |  FROM documents d LEFT JOIN pd USING (doc_id))
         |SELECT n_docs, n_scored, n_docs AS n_eq, TRUE AS persist_exact
         |FROM s""".stripMargin,

    "q257_rendezvous" ->
      s"""WITH hs AS (
         |  SELECT doc_id, j AS s,
         |    ('0x' || substr(md5('hrw' || CAST(j AS VARCHAR) || ':'
         |      || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM documents, unnest(range(0, 5)) AS t(j)),
         |a4 AS (
         |  SELECT doc_id, s AS shard4 FROM (
         |    SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY h DESC, s DESC) AS rn
         |    FROM hs WHERE s < 4) WHERE rn = 1),
         |a5 AS (
         |  SELECT doc_id, s AS shard5 FROM (
         |    SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY h DESC, s DESC) AS rn
         |    FROM hs) WHERE rn = 1)
         |SELECT shard4 AS shard, COUNT(*) AS n_before,
         |  CAST(SUM(CASE WHEN shard5 <> shard4 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_moved,
         |  CAST(SUM(CASE WHEN shard5 <> shard4 AND shard5 <> 4
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_elsewhere,
         |  ROUND(CAST(SUM(CASE WHEN shard5 <> shard4 THEN 1 ELSE 0 END)
         |    AS BIGINT)::DOUBLE / COUNT(*), 6) AS moved_frac
         |FROM a4 JOIN a5 USING (doc_id)
         |GROUP BY 1""".stripMargin,

    "q258_hash_collisions" ->
      s"""WITH v AS (
         |  SELECT word, COUNT(*) AS c FROM (
         |    SELECT unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1),
         |kb AS (
         |  SELECT k,
         |    ('0x' || substr(md5(word), 1, 15))::BIGINT
         |      % (CASE WHEN k = 8 THEN 256 WHEN k = 10 THEN 1024
         |         ELSE 4096 END) AS bucket,
         |    c
         |  FROM v, unnest([8, 10, 12]) AS t(k)),
         |b AS (
         |  SELECT k, bucket, COUNT(*) AS t, CAST(SUM(c) AS BIGINT) AS m
         |  FROM kb GROUP BY 1, 2)
         |SELECT k, CAST(SUM(t) AS BIGINT) AS n_types,
         |  COUNT(*) AS n_buckets_used,
         |  ROUND(CAST(SUM(CASE WHEN t > 1 THEN t ELSE 0 END) AS BIGINT)
         |    ::DOUBLE / CAST(SUM(t) AS BIGINT), 6) AS type_collision_rate,
         |  ROUND(CAST(SUM(CASE WHEN t > 1 THEN m ELSE 0 END) AS BIGINT)
         |    ::DOUBLE / CAST(SUM(m) AS BIGINT), 6) AS mass_collision_rate
         |FROM b GROUP BY 1""".stripMargin,

    "q290_hits" -> {
      val S = graft.ops.PageRank.HitsScale
      val iter = (k: Int) =>
        s"""a${k}r AS MATERIALIZED (
           |  SELECT s AS node, CAST(SUM(h) AS BIGINT) AS r
           |  FROM cs JOIN h${k - 1} ON h${k - 1}.node = cs.c GROUP BY 1),
           |a$k AS MATERIALIZED (
           |  SELECT node, (r * $S)
           |    // (SELECT CAST(SUM(r) AS BIGINT) FROM a${k}r) AS a
           |  FROM a${k}r),
           |h${k}r AS MATERIALIZED (
           |  SELECT c AS node, CAST(SUM(a) AS BIGINT) AS r
           |  FROM cs JOIN a$k ON a$k.node = cs.s GROUP BY 1),
           |h$k AS MATERIALIZED (
           |  SELECT node, (r * $S)
           |    // (SELECT CAST(SUM(r) AS BIGINT) FROM h${k}r) AS h
           |  FROM h${k}r)""".stripMargin
      s"""WITH cs AS MATERIALIZED (
         |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |h0 AS MATERIALIZED (SELECT DISTINCT c AS node,
         |       CAST($S AS BIGINT) AS h FROM cs),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT node, 'hub' AS role, h AS score_scaled FROM h5
         |UNION ALL
         |SELECT node, 'authority' AS role, a AS score_scaled
         |FROM a5""".stripMargin
    },

    "q291_dedup_venn" ->
      s"""WITH $lshCandCtes,
         |mp AS (
         |  SELECT id_a, id_b FROM cand
         |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
         |  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))
         |    ::DOUBLE / len(list_distinct(sa.shingles || sb.shingles)), 6)
         |    >= 0.3),
         |hh AS (
         |  SELECT doc_id, list_transform($WORDS, w2 ->
         |    ('0x' || substr(md5(w2), 1, 15))::BIGINT) AS hs
         |  FROM documents WHERE len($WORDS) > 0),
         |fp AS (
         |  SELECT doc_id, CAST(list_reduce(list_transform(range(0, 60),
         |    j -> CASE WHEN CAST(list_sum(list_transform(hs, x ->
         |        CASE WHEN ((x >> j) & 1) = 1 THEN 1 ELSE -1 END))
         |        AS BIGINT) > 0
         |      THEN (1::BIGINT << j) ELSE 0::BIGINT END),
         |    (a, b) -> a + b) AS BIGINT) AS simhash
         |  FROM hh),
         |sbands AS (
         |  SELECT doc_id, simhash, b AS band_idx,
         |    (simhash >> (b * 15)) & 32767 AS band_val
         |  FROM fp, unnest(range(0, 4)) AS t(b)),
         |sp AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sbands a JOIN sbands b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |  WHERE a.doc_id < b.doc_id
         |    AND bit_count(xor(a.simhash, b.simhash)) <= 10),
         |j AS (
         |  SELECT m.id_a IS NOT NULL AS in_m, s2.id_a IS NOT NULL AS in_s
         |  FROM mp m FULL JOIN sp s2
         |    ON m.id_a = s2.id_a AND m.id_b = s2.id_b)
         |SELECT
         |  CAST(SUM(CASE WHEN in_m AND in_s THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_both,
         |  CAST(SUM(CASE WHEN in_m AND NOT in_s THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_minhash_only,
         |  CAST(SUM(CASE WHEN NOT in_m AND in_s THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_simhash_only,
         |  ROUND(CAST(SUM(CASE WHEN in_m AND in_s THEN 1 ELSE 0 END)
         |    AS BIGINT)::DOUBLE / COUNT(*), 6) AS pair_jaccard
         |FROM j""".stripMargin,

    "q292_fightin_words" ->
      s"""WITH c AS (
         |  SELECT grp, word, COUNT(*) AS y FROM (
         |    SELECT source AS grp, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |w AS (
         |  SELECT word, CAST(SUM(y) AS BIGINT) AS yw FROM c GROUP BY 1
         |  HAVING CAST(SUM(y) AS BIGINT) >= 25),
         |g AS (SELECT grp, CAST(SUM(y) AS BIGINT) AS ni FROM c
         |      GROUP BY 1),
         |k AS (SELECT c.grp, c.word, y, yw, ni
         |      FROM c JOIN w USING (word) JOIN g USING (grp)),
         |t AS (SELECT CAST(SUM(y) AS BIGINT) AS n,
         |        COUNT(DISTINCT word) AS v FROM k),
         |sc AS (
         |  SELECT grp, word, y, yw,
         |    ROUND(ln((y + 0.01::DOUBLE)
         |      / (ni + 0.01::DOUBLE * v - y - 0.01::DOUBLE)), 6) AS l1,
         |    ROUND(ln(((yw - y) + 0.01::DOUBLE)
         |      / (n - ni + 0.01::DOUBLE * v - (yw - y) - 0.01::DOUBLE)),
         |      6) AS l2,
         |    1.0::DOUBLE / (y + 0.01::DOUBLE)
         |      + 1.0::DOUBLE / ((yw - y) + 0.01::DOUBLE) AS var
         |  FROM k, t)
         |SELECT grp AS source, word, y, yw AS y_total,
         |  ROUND(l1 - l2, 6) + 0.0 AS log_odds,
         |  ROUND((l1 - l2) / sqrt(var), 4) + 0.0 AS z
         |FROM sc""".stripMargin,

    "q293_entropy_rate" ->
      s"""WITH uc AS (
         |  SELECT grp, word, COUNT(*) AS c FROM (
         |    SELECT source AS grp, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |un AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_tokens FROM uc
         |       GROUP BY 1),
         |hu AS (
         |  SELECT grp, MAX(n_tokens) AS n_tokens,
         |    CAST(SUM(CAST(ROUND(c * ln(c::DOUBLE / n_tokens), 6)
         |      AS DECIMAL(24,6))) AS DOUBLE) AS su
         |  FROM uc JOIN un USING (grp) GROUP BY 1),
         |b2 AS (
         |  SELECT grp, bg[1] AS w1, bg[2] AS w2 FROM (
         |    SELECT source AS grp, unnest(list_transform(
         |      range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
         |    FROM (SELECT source, doc_id, $WORDS AS w FROM documents)
         |    WHERE len(w) >= 2)),
         |bg AS (SELECT grp, w1, w2, COUNT(*) AS c12 FROM b2
         |       GROUP BY 1, 2, 3),
         |ctx AS (SELECT grp, w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg
         |        GROUP BY 1, 2),
         |bn AS (SELECT grp, CAST(SUM(c12) AS BIGINT) AS n_bigrams
         |       FROM bg GROUP BY 1),
         |hc AS (
         |  SELECT grp, CAST(SUM(CAST(ROUND(c12 * ln(c12::DOUBLE / c1), 6)
         |    AS DECIMAL(24,6))) AS DOUBLE) AS sc2
         |  FROM bg JOIN ctx USING (grp, w1) GROUP BY 1)
         |SELECT grp AS source, n_tokens, n_bigrams,
         |  ROUND(-su / n_tokens, 6) AS h_unigram,
         |  ROUND(-sc2 / n_bigrams, 6) AS h_cond,
         |  ROUND(-su / n_tokens - (-sc2 / n_bigrams), 6) + 0.0
         |    AS info_gain
         |FROM hu JOIN hc USING (grp) JOIN bn USING (grp)""".stripMargin,

    "q287_lof" ->
      s"""WITH $knnGraphCtes,
         |g AS (
         |  SELECT id AS p, nbr_id AS o, 1.0::DOUBLE - ROUND(c, 6) AS d
         |  FROM rk WHERE nbr_rank <= 3),
         |kd AS (SELECT p, MAX(d) AS kd FROM g GROUP BY 1),
         |lrd AS (
         |  SELECT p, n,
         |    CASE WHEN sr > 0.0::DOUBLE THEN ROUND(n::DOUBLE / sr, 8) END
         |      AS lrd
         |  FROM (
         |    SELECT g.p, COUNT(*) AS n,
         |      CAST(SUM(CAST(GREATEST(k2.kd, g.d) AS DECIMAL(24,6)))
         |        AS DOUBLE) AS sr
         |    FROM g JOIN kd k2 ON k2.p = g.o
         |    GROUP BY 1)),
         |agg AS (
         |  SELECT g.p, COUNT(l2.lrd) AS n_nbrs,
         |    CAST(SUM(CAST(l2.lrd AS DECIMAL(24,8))) AS DOUBLE) AS sl
         |  FROM g JOIN lrd l2 ON l2.p = g.o
         |  GROUP BY 1)
         |SELECT agg.p AS vec_id, n_nbrs, lrd.lrd AS lrd,
         |  ROUND(CASE WHEN lrd.lrd > 0.0::DOUBLE AND n_nbrs > 0
         |    THEN sl / n_nbrs / lrd.lrd END, 6) AS lof
         |FROM agg JOIN lrd ON lrd.p = agg.p""".stripMargin,

    "q288_ann_ndcg" -> {
      val disc = (1 to 5).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
      val idcg = (1 to 5).map(i => (6 - i) * disc(i - 1)).sum
      val dcase = (1 to 5).map(i => s"WHEN rnk = $i THEN ${disc(i - 1)}")
        .mkString(" ")
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |exact AS (
         |  SELECT query_id, cand_id, 6 - rnk AS rel FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${dot("q.embedding", "c.embedding")}
         |          / sqrt(q.n2 * c.n2), 6) DESC, c.vec_id) AS rnk
         |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 20)
         |  WHERE rnk <= 5),
         |cents AS (
         |  SELECT cent_id, c_emb, c_n2 FROM (
         |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
         |      COUNT(*) OVER () AS ccnt
         |    FROM n)
         |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
         |ranked AS (
         |  SELECT n.vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |      ORDER BY ${dot("n.embedding", "cents.c_emb")}
         |        / sqrt(n.n2 * cents.c_n2) DESC, cent_id) AS rn
         |  FROM n CROSS JOIN cents),
         |cells AS (SELECT vec_id AS cand_id, cent_id AS cell
         |          FROM ranked WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, cent_id AS cell
         |  FROM ranked WHERE rn <= 2 AND vec_id < 20),
         |cand AS (
         |  SELECT DISTINCT query_id, cand_id
         |  FROM probes JOIN cells USING (cell)
         |  WHERE cand_id <> query_id),
         |ann AS (
         |  SELECT query_id, cand_id, rnk FROM (
         |    SELECT query_id, cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY ROUND(${dot("q.embedding", "c.embedding")}
         |          / sqrt(q.n2 * c.n2), 6) DESC, cand_id) AS rnk
         |    FROM cand JOIN n q ON cand.query_id = q.vec_id
         |              JOIN n c ON cand.cand_id = c.vec_id)
         |  WHERE rnk <= 5),
         |j AS (
         |  SELECT ann.query_id,
         |    COALESCE(exact.rel, 0) AS rel,
         |    ROUND(COALESCE(exact.rel, 0)::DOUBLE *
         |      (CASE $dcase ELSE 0.0::DOUBLE END), 8) AS g
         |  FROM ann LEFT JOIN exact USING (query_id, cand_id))
         |SELECT query_id,
         |  CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hits,
         |  ROUND(CAST(SUM(CAST(g AS DECIMAL(24,8))) AS DOUBLE), 6)
         |    AS dcg,
         |  ROUND(CAST(SUM(CAST(g AS DECIMAL(24,8))) AS DOUBLE)
         |    / $idcg, 6) AS ndcg
         |FROM j GROUP BY 1""".stripMargin
    },

    "q289_query_likelihood" -> {
      val ts = Bm25Terms
      val tfCols = ts.indices.map(i =>
        s"CAST(SUM(CASE WHEN word = '${ts(i)}' THEN 1 ELSE 0 END) AS BIGINT) AS tf$i")
        .mkString(", ")
      val cfCols = ts.indices.map(i =>
        s"CAST(SUM(tf$i) AS BIGINT) AS cf$i").mkString(", ")
      val contribs = ts.indices.map(i =>
        s"""ROUND(ln((tf$i::DOUBLE + 10.0::DOUBLE * (cf$i::DOUBLE / ct))
           | / (dl::DOUBLE + 10.0::DOUBLE)), 6)""".stripMargin
          .replace("\n", ""))
        .mkString(" + ")
      s"""WITH wr AS (SELECT doc_id, unnest($WORDS) AS word FROM documents),
         |pd AS (
         |  SELECT doc_id, COUNT(*) AS dl, $tfCols
         |  FROM wr GROUP BY 1),
         |c AS (SELECT CAST(SUM(dl) AS BIGINT) AS ct, $cfCols FROM pd)
         |SELECT doc_id, dl, ROUND($contribs, 6) + 0.0 AS score
         |FROM pd, c""".stripMargin
    },

    "q285_participation_ratio" ->
      s"""WITH $topPcCtes
         |SELECT 64 AS dim, ROUND(tr2, 8) AS trace,
         |  ROUND(f2, 10) AS frobenius_sq,
         |  ROUND(CASE WHEN f2 > 0.0::DOUBLE THEN tr2 * tr2 / f2 END, 4)
         |    AS participation_ratio
         |FROM (
         |  SELECT
         |    CAST(SUM(CASE WHEN i = j
         |      THEN CAST(ROUND(cov, 12) AS DECIMAL(24,12))
         |      ELSE CAST(0.0 AS DECIMAL(24,12)) END) AS DOUBLE) AS tr2,
         |    CAST(SUM(CAST(ROUND(cov * cov, 14) AS DECIMAL(24,14)))
         |      AS DOUBLE) AS f2
         |  FROM cov)""".stripMargin,

    "q286_twonn" ->
      s"""WITH $knnGraphCtes,
         |p AS (
         |  SELECT id,
         |    MAX(CASE WHEN nbr_rank = 1 THEN ROUND(c, 6) END) AS c1,
         |    MAX(CASE WHEN nbr_rank = 2 THEN ROUND(c, 6) END) AS c2
         |  FROM rk WHERE nbr_rank <= 2 GROUP BY 1),
         |l AS (
         |  SELECT ROUND(ln((1.0::DOUBLE - c2) / (1.0::DOUBLE - c1)), 8)
         |    AS lg
         |  FROM p WHERE c2 IS NOT NULL AND c1 < 1.0::DOUBLE),
         |a AS (
         |  SELECT COUNT(*) AS n_used,
         |    CAST(SUM(CAST(lg AS DECIMAL(24,8))) AS DOUBLE) AS s
         |  FROM l)
         |SELECT n_used, ROUND(s, 6) AS sum_log,
         |  ROUND(CASE WHEN s > 0.0::DOUBLE THEN n_used::DOUBLE / s END, 4)
         |    AS intrinsic_dim
         |FROM a""".stripMargin,

    "q278_chinchilla_budget" ->
      s"""WITH t AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS corpus_tokens,
         |    CAST(SUM(CASE WHEN doc_id = keep_id THEN n ELSE 0 END)
         |      AS BIGINT) AS effective_tokens
         |  FROM (
         |    SELECT d.doc_id, len($WORDS) AS n, k.keep_id
         |    FROM documents d JOIN (
         |      SELECT md5(text) AS h, MIN(doc_id) AS keep_id
         |      FROM documents GROUP BY 1) k ON md5(d.text) = k.h)),
         |g AS (SELECT * FROM (VALUES
         |  ('125M', 125000000), ('350M', 350000000),
         |  ('1.3B', 1300000000), ('2.7B', 2700000000),
         |  ('6.7B', 6700000000), ('13B', 13000000000))
         |  AS v(model, params))
         |SELECT model, CAST(params AS BIGINT) AS params,
         |  CAST(params * 20 AS BIGINT) AS need_tokens,
         |  corpus_tokens, effective_tokens,
         |  ROUND(corpus_tokens::DOUBLE / (params * 20), 8) AS coverage,
         |  ROUND((params * 20)::DOUBLE / effective_tokens, 2)
         |    AS epochs_needed
         |FROM g, t""".stripMargin,

    "q279_disparate_impact" ->
      s"""WITH m AS (
         |  SELECT lang,
         |    COALESCE(CASE WHEN margin IS NOT NULL
         |      THEN ROUND(1.0 / (1.0 + exp(-margin)), 6) END >= 0.5,
         |      false) AS label
         |  FROM (
         |    SELECT lang, CASE WHEN len(w) > 0 THEN ROUND(list_reduce(
         |      list_transform(w, x ->
         |        ((('0x' || substr(md5('clf:' || x), 1, 15))::BIGINT
         |          % 2001) - 1000) / 1000.0),
         |      (a, b) -> a + b) / len(w), 6) END AS margin
         |    FROM (SELECT lang, $WORDS AS w FROM documents))),
         |r AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_keep
         |  FROM m GROUP BY 1),
         |x AS (SELECT MAX(n_keep::DOUBLE / n_docs) AS mx FROM r)
         |SELECT lang, n_docs, n_keep,
         |  ROUND(n_keep::DOUBLE / n_docs, 6) AS keep_rate,
         |  ROUND(CASE WHEN mx > 0.0::DOUBLE
         |    THEN (n_keep::DOUBLE / n_docs) / mx END, 6) AS di_ratio,
         |  COALESCE(CASE WHEN mx > 0.0::DOUBLE
         |    THEN (n_keep::DOUBLE / n_docs) / mx < 0.8::DOUBLE END,
         |    false) AS below_80pct_rule
         |FROM r, x""".stripMargin,

    "q281_brier_decomposition" ->
      s"""WITH sc AS (
         |  SELECT source, lang = 'en' AS y,
         |    CASE WHEN margin IS NOT NULL
         |      THEN ROUND(1.0 / (1.0 + exp(-margin)), 6) END AS prob
         |  FROM (
         |    SELECT source, lang, CASE WHEN len(w) > 0 THEN ROUND(
         |      list_reduce(list_transform(w, x ->
         |        ((('0x' || substr(md5('clf:' || x), 1, 15))::BIGINT
         |          % 2001) - 1000) / 1000.0),
         |      (a, b) -> a + b) / len(w), 6) END AS margin
         |    FROM (SELECT source, lang, $WORDS AS w FROM documents))),
         |rows_ AS (
         |  SELECT source, y, prob,
         |    LEAST(CAST(FLOOR(prob * 10) AS BIGINT), 9) AS bin
         |  FROM sc WHERE prob IS NOT NULL),
         |pb AS (
         |  SELECT source, bin, COUNT(*) AS n,
         |    ROUND(${graft.core.Det.sumDetSql("prob", 6)} / COUNT(*), 6)
         |      AS conf,
         |    ROUND(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
         |      ::DOUBLE / COUNT(*), 6) AS acc
         |  FROM rows_ GROUP BY 1, 2),
         |base AS (
         |  SELECT source, COUNT(*) AS nn,
         |    ROUND(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
         |      ::DOUBLE / COUNT(*), 6) AS ybar,
         |    ${graft.core.Det.sumDetSql(
             "ROUND((prob - CASE WHEN y THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) * " +
               "(prob - CASE WHEN y THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END), 6)", 6)}
         |      AS sb
         |  FROM rows_ GROUP BY 1)
         |SELECT source, nn AS n_docs, ybar AS base_rate,
         |  ROUND(rel / nn, 6) AS reliability,
         |  ROUND(res / nn, 6) AS resolution,
         |  ROUND(ybar * (1.0::DOUBLE - ybar), 6) AS uncertainty,
         |  ROUND(sb / nn, 6) AS brier
         |FROM (
         |  SELECT source, nn, ybar, sb,
         |    ${graft.core.Det.sumDetSql(
             "ROUND(n * ((conf - acc) * (conf - acc)), 6)", 6)} AS rel,
         |    ${graft.core.Det.sumDetSql(
             "ROUND(n * ((acc - ybar) * (acc - ybar)), 6)", 6)} AS res
         |  FROM pb JOIN base USING (source)
         |  GROUP BY 1, 2, 3, 4)""".stripMargin,

    "q272_phrase_search" ->
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |bg AS (
         |  SELECT doc_id, i - 1 AS pos, w[i] AS w1, w[i+1] AS w2
         |  FROM wr, unnest(range(1, len(w))) AS t(i)),
         |top AS (
         |  SELECT w1, w2 FROM bg GROUP BY 1, 2
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w1, w2) = 1)
         |SELECT doc_id, w1 || ' ' || w2 AS phrase, COUNT(*) AS n_matches,
         |  CAST(MIN(pos) AS BIGINT) AS first_pos
         |FROM bg JOIN top USING (w1, w2)
         |GROUP BY 1, 2""".stripMargin,

    "q273_clustering_coeff" ->
      s"""WITH $lshCandCtes,
         |pairs AS (
         |  SELECT id_a, id_b FROM cand
         |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
         |  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))
         |    ::DOUBLE / len(list_distinct(sa.shingles || sb.shingles)), 6)
         |    >= 0.3),
         |e AS (SELECT id_a AS u, id_b AS v FROM pairs),
         |deg AS (
         |  SELECT id, COUNT(*) AS deg FROM (
         |    SELECT u AS id FROM e UNION ALL SELECT v FROM e)
         |  GROUP BY 1),
         |tri AS (
         |  SELECT id, COUNT(*) AS t FROM (
         |    SELECT unnest([e1.u, e1.v, e2.v]) AS id
         |    FROM e e1 JOIN e e2 ON e1.v = e2.u
         |    WHERE EXISTS (SELECT 1 FROM e e3
         |                  WHERE e3.u = e1.u AND e3.v = e2.v))
         |  GROUP BY 1)
         |SELECT deg.id, deg.deg, COALESCE(t, 0) AS n_triangles,
         |  CASE WHEN deg >= 2 THEN ROUND(
         |    2.0::DOUBLE * COALESCE(t, 0) / (deg * (deg - 1)), 6) END
         |    AS local_cc
         |FROM deg LEFT JOIN tri USING (id)""".stripMargin,

    "q274_assortativity" ->
      s"""WITH $lshCandCtes,
         |pairs AS (
         |  SELECT id_a, id_b FROM cand
         |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
         |  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))
         |    ::DOUBLE / len(list_distinct(sa.shingles || sb.shingles)), 6)
         |    >= 0.3),
         |dir AS (SELECT id_a AS u, id_b AS v FROM pairs
         |        UNION ALL SELECT id_b, id_a FROM pairs),
         |deg AS (SELECT u, COUNT(*) AS d FROM dir GROUP BY 1),
         |xy AS (
         |  SELECT dx.d AS x, dy.d AS y
         |  FROM dir JOIN deg dx ON dx.u = dir.u
         |  JOIN deg dy ON dy.u = dir.v),
         |a AS (
         |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |    SUM(CAST(y AS HUGEINT) * y) AS syy,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM xy),
         |b AS (
         |  SELECT n, sxy, sx, sy,
         |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy
         |  FROM a)
         |SELECT n AS n_dir_edges,
         |  ROUND(CASE WHEN vx > 0 AND vy > 0 THEN
         |    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         |      / sqrt(CAST(CAST(vx AS VARCHAR) AS DOUBLE)
         |        * CAST(CAST(vy AS VARCHAR) AS DOUBLE)) END, 6) + 0.0
         |    AS assortativity
         |FROM b""".stripMargin,

    "q275_distinct_n" ->
      s"""WITH u AS (
         |  SELECT source, COUNT(*) AS n_tokens,
         |    COUNT(DISTINCT word) AS n_distinct_1
         |  FROM (SELECT source, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1),
         |b AS (
         |  SELECT source, COUNT(DISTINCT g) AS n_distinct_2 FROM (
         |    SELECT source, unnest(${shinglesSql(2)}) AS g
         |    FROM (SELECT source, $WORDS AS w FROM documents))
         |  GROUP BY 1),
         |t AS (
         |  SELECT source, CAST(SUM(CASE WHEN len(w) > 1 THEN len(w) - 1
         |    ELSE 0 END) AS BIGINT) AS n_bigrams
         |  FROM (SELECT source, $WORDS AS w FROM documents) GROUP BY 1)
         |SELECT source, n_tokens, n_distinct_1,
         |  ROUND(n_distinct_1::DOUBLE / n_tokens, 6) AS distinct_1,
         |  n_bigrams, n_distinct_2,
         |  CASE WHEN n_bigrams > 0 THEN
         |    ROUND(n_distinct_2::DOUBLE / n_bigrams, 6) END AS distinct_2
         |FROM u JOIN b USING (source) JOIN t USING (source)""".stripMargin,

    "q277_randomized_response" -> {
      val thr = (0.75 * math.pow(2.0, 60)).toLong
      s"""WITH toks AS (
         |  SELECT doc_id, i - 1 AS pos, w[i] AS word
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents),
         |    unnest(range(1, len(w) + 1)) AS t(i)),
         |v AS (
         |  SELECT list_sort(list(word)) AS vl, COUNT(*) AS vn
         |  FROM (SELECT DISTINCT word FROM toks)),
         |rep AS (
         |  SELECT CASE WHEN
         |      ('0x' || substr(md5('rr:' || CAST(doc_id AS VARCHAR)
         |        || ':' || CAST(pos AS VARCHAR)), 1, 15))::BIGINT < $thr
         |    THEN word
         |    ELSE vl[(('0x' || substr(md5('rrpick:'
         |      || CAST(doc_id AS VARCHAR) || ':'
         |      || CAST(pos AS VARCHAR)), 1, 15))::BIGINT % vn) + 1]
         |    END AS word
         |  FROM toks, v),
         |obs AS (SELECT word, COUNT(*) AS obs_count FROM rep GROUP BY 1),
         |truth AS (SELECT word, COUNT(*) AS true_count FROM toks
         |  GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n, (SELECT vn FROM v) AS vn FROM toks)
         |SELECT word, COALESCE(true_count, 0) AS true_count,
         |  COALESCE(obs_count, 0) AS obs_count,
         |  ROUND((COALESCE(obs_count, 0)::DOUBLE - n * 0.25::DOUBLE / vn)
         |    / (0.75::DOUBLE - 0.25::DOUBLE / vn), 4) + 0.0 AS est_count
         |FROM obs FULL JOIN truth USING (word), n""".stripMargin
    },

    "q267_textrank" -> {
      val S = graft.ops.PageRank.SCALE
      val iter = (k: Int) =>
        s"""r$k AS (
           |  SELECT n0.node,
           |    (15 * (SELECT $S // n FROM n)
           |      + 85 * COALESCE(m.in_mass, 0)) // 100 AS pr
           |  FROM nodes n0 LEFT JOIN (
           |    SELECT e.dst AS node,
           |      CAST(SUM(r.pr // d.deg) AS BIGINT) AS in_mass
           |    FROM r${k - 1} r JOIN deg d USING (node)
           |    JOIN edges e ON e.src = r.node
           |    GROUP BY 1) m USING (node))""".stripMargin
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |bg AS (
         |  SELECT bg[1] AS w1, bg[2] AS w2
         |  FROM (SELECT unnest(list_transform(range(1, len(w)),
         |          i -> [w[i], w[i+1]])) AS bg
         |        FROM wr WHERE len(w) >= 2)
         |  WHERE bg[1] <> bg[2]),
         |vocab AS (
         |  SELECT word, ROW_NUMBER() OVER (ORDER BY word) AS nid FROM (
         |    SELECT word FROM (SELECT unnest(w) AS word FROM wr)
         |    GROUP BY 1 HAVING COUNT(*) >= 25)),
         |adj AS (
         |  SELECT DISTINCT LEAST(a.nid, b.nid) AS u,
         |    GREATEST(a.nid, b.nid) AS v
         |  FROM bg JOIN vocab a ON a.word = bg.w1
         |  JOIN vocab b ON b.word = bg.w2),
         |edges AS (SELECT u AS src, v AS dst FROM adj
         |          UNION ALL SELECT v, u FROM adj),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst AS node FROM edges),
         |deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges
         |        GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM nodes),
         |r0 AS (SELECT node, (SELECT $S // n FROM n) AS pr FROM nodes),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT v.word, r.pr AS rank_scaled
         |FROM r5 r JOIN vocab v ON v.nid = r.node""".stripMargin
    },

    "q269_max_coverage" -> {
      val levels = (2 to 5).map { k =>
        s"""p$k AS (
           |  SELECT doc, COUNT(*) AS gain FROM dw
           |  WHERE word NOT IN (SELECT word FROM c${k - 1}) GROUP BY 1
           |  QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, doc) = 1),
           |c$k AS (SELECT word FROM c${k - 1}
           |        UNION SELECT word FROM dw JOIN p$k USING (doc))"""
          .stripMargin
      }.mkString(",\n")
      val picks = (1 to 5)
        .map(k => s"SELECT $k AS pick_round, doc AS doc_id, gain FROM p$k")
        .mkString("\n  UNION ALL ")
      s"""WITH dw AS (
         |  SELECT doc_id AS doc, word FROM (
         |    SELECT doc_id, unnest(${shinglesSql(3)}) AS word
         |    FROM (SELECT doc_id, $WORDS AS w FROM documents))),
         |tot AS (SELECT COUNT(DISTINCT word) AS t FROM dw),
         |p1 AS (
         |  SELECT doc, COUNT(*) AS gain FROM dw GROUP BY 1
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, doc) = 1),
         |c1 AS (SELECT DISTINCT word FROM dw JOIN p1 USING (doc)),
         |$levels,
         |picks AS (
         |  $picks)
         |SELECT pick_round, doc_id, gain,
         |  CAST(SUM(gain) OVER (ORDER BY pick_round) AS BIGINT)
         |    AS cum_words,
         |  ROUND(CAST(SUM(gain) OVER (ORDER BY pick_round) AS BIGINT)
         |    ::DOUBLE / t, 6) AS coverage_frac
         |FROM picks, tot""".stripMargin
    },

    "q270_burstiness" ->
      s"""WITH tf AS (
         |  SELECT doc_id, word, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |a AS (
         |  SELECT word, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT)
         |    AS tf_total, CAST(SUM(tf * tf) AS BIGINT) AS tf2
         |  FROM tf GROUP BY 1 HAVING COUNT(*) >= 25),
         |m AS (SELECT word, df, tf_total, tf2,
         |  tf_total::DOUBLE / df AS m FROM a)
         |SELECT word, df, tf_total, ROUND(m, 6) AS mean_tf,
         |  ROUND((tf2::DOUBLE / df - m * m) / m, 6) + 0.0 AS vmr
         |FROM m""".stripMargin,

    "q259_knn_shapley" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, embedding,
         |    ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |r AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |      ROUND(${dot("q.embedding", "c.embedding")}
         |        / sqrt(q.n2 * c.n2), 6) DESC, c.vec_id) AS rnk,
         |    CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS m
         |  FROM n q JOIN n c ON c.vec_id >= 20
         |  WHERE q.vec_id < 20),
         |d AS (
         |  SELECT query_id, cand_id, rnk, m,
         |    COUNT(*) OVER (PARTITION BY query_id) AS nn,
         |    LEAD(m) OVER (PARTITION BY query_id ORDER BY rnk) AS m2
         |  FROM r),
         |s AS (
         |  SELECT query_id, cand_id,
         |    SUM(CASE WHEN rnk < nn THEN CAST(FLOOR(
         |        ((m - m2) * LEAST(5, rnk))::DOUBLE / (5 * rnk)
         |          * 1073741824 + 0.5) AS BIGINT) ELSE 0 END)
         |      OVER (PARTITION BY query_id ORDER BY rnk DESC
         |        ROWS UNBOUNDED PRECEDING)
         |    + MAX(CASE WHEN rnk = nn THEN CAST(FLOOR(
         |        m::DOUBLE / nn * 1073741824 + 0.5) AS BIGINT) END)
         |      OVER (PARTITION BY query_id) AS s_scaled
         |  FROM d)
         |SELECT cand_id AS vec_id, COUNT(*) AS n_queries,
         |  ROUND(CAST(SUM(s_scaled) AS BIGINT)::DOUBLE / 1073741824
         |    / COUNT(*), 6) + 0.0 AS shap_mean
         |FROM s GROUP BY 1""".stripMargin,

    "q260_lsh_params" -> {
      def pw(x: String, e: Int): String =
        if (e == 1) x else { val h = pw(x, e / 2); s"($h * $h)" }
      val arms = Seq((2, 8), (4, 4), (8, 2), (16, 1)).map { case (b, r) =>
        val p = s"1.0 - ${pw(s"(1.0 - ${pw("j", r)})", b)}"
        s"""SELECT $b AS bands, $r AS rows_per_band, j,
           |  CAST(FLOOR(($p) * 1073741824 + 0.5) AS BIGINT) AS qp
           |  FROM pr""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $lshCandCtes,
         |pr AS (
         |  SELECT ROUND(len(list_intersect(sa.shingles, sb.shingles))
         |    ::DOUBLE / len(list_distinct(sa.shingles || sb.shingles)), 6)
         |    AS j
         |  FROM cand JOIN sh sa ON sa.doc_id = id_a
         |  JOIN sh sb ON sb.doc_id = id_b
         |  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))
         |    ::DOUBLE / len(list_distinct(sa.shingles || sb.shingles)), 6)
         |    >= 0.1),
         |fan AS ($arms)
         |SELECT bands, rows_per_band,
         |  CAST(SUM(CASE WHEN j >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_true_pairs,
         |  CASE WHEN CAST(SUM(CASE WHEN j >= 0.3 THEN 1 ELSE 0 END)
         |      AS BIGINT) > 0
         |    THEN ROUND(CAST(SUM(CASE WHEN j >= 0.3 THEN qp ELSE 0 END)
         |      AS BIGINT)::DOUBLE / 1073741824
         |      / CAST(SUM(CASE WHEN j >= 0.3 THEN 1 ELSE 0 END)
         |        AS BIGINT), 6) END AS exp_recall,
         |  CAST(SUM(CASE WHEN j < 0.3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fp_cand,
         |  CASE WHEN CAST(SUM(CASE WHEN j < 0.3 THEN 1 ELSE 0 END)
         |      AS BIGINT) > 0
         |    THEN ROUND(CAST(SUM(CASE WHEN j < 0.3 THEN qp ELSE 0 END)
         |      AS BIGINT)::DOUBLE / 1073741824
         |      / CAST(SUM(CASE WHEN j < 0.3 THEN 1 ELSE 0 END)
         |        AS BIGINT), 6) END AS exp_fp_rate
         |FROM fan GROUP BY 1, 2
         |ORDER BY bands""".stripMargin
    },

    "q261_label_prop" -> {
      def iterCte(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT u AS id, lab FROM (
           |    SELECT e.u AS u, l.lab AS lab, COUNT(*) AS c,
           |      ROW_NUMBER() OVER (PARTITION BY e.u
           |        ORDER BY COUNT(*) DESC, l.lab) AS rn
           |    FROM edges e JOIN $prev l ON l.id = e.v
           |    GROUP BY e.u, l.lab)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH $lshCandCtes,
         |pairs AS (
         |  SELECT id_a, id_b FROM cand
         |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
         |  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))
         |    ::DOUBLE / len(list_distinct(sa.shingles || sb.shingles)), 6)
         |    >= 0.3),
         |edges AS (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT id_a AS u, id_b AS v FROM pairs
         |    UNION ALL SELECT id_b, id_a FROM pairs)),
         |l0 AS (SELECT DISTINCT u AS id, u AS lab FROM edges),
         |${iterCte("l0", "l1")},
         |${iterCte("l1", "l2")},
         |${iterCte("l2", "l3")},
         |${iterCte("l3", "l4")}
         |SELECT id, lab AS community,
         |  COUNT(*) OVER (PARTITION BY lab) AS community_size
         |FROM l4""".stripMargin
    },

    "q262_fleiss_kappa" ->
      s"""WITH q AS (
         |  SELECT CAST((CASE WHEN len(w) >= 50 THEN 1 ELSE 0 END)
         |    + (CASE WHEN len(w) > 0 AND 5 * len(list_filter(w,
         |        x -> regexp_matches(x, '[a-z]'))) >= 4 * len(w)
         |        THEN 1 ELSE 0 END)
         |    + (CASE WHEN len(list_intersect(list_distinct(w),
         |        ['the','a','is','of','and','to','in'])) >= 2
         |        THEN 1 ELSE 0 END) AS BIGINT) AS x
         |  FROM (SELECT $WORDS AS w FROM documents)),
         |s AS (
         |  SELECT COUNT(*) AS n_docs, CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(x * (x - 1) + (3 - x) * (2 - x)) AS BIGINT) AS sq
         |  FROM q),
         |t AS (
         |  SELECT n_docs, sx::DOUBLE / (3.0::DOUBLE * n_docs) AS pk,
         |    sq::DOUBLE / (6.0::DOUBLE * n_docs) AS pbar
         |  FROM s),
         |u AS (
         |  SELECT n_docs, pbar,
         |    pk * pk + (1.0::DOUBLE - pk) * (1.0::DOUBLE - pk) AS pe
         |  FROM t)
         |SELECT n_docs, ROUND(pbar, 6) AS p_bar, ROUND(pe, 6) AS p_e,
         |  ROUND(CASE WHEN pe <> 1.0 THEN (pbar - pe)
         |    / (1.0::DOUBLE - pe) END, 6) + 0.0 AS kappa
         |FROM u""".stripMargin,

    "q263_spearman_filters" ->
      s"""WITH sc AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(w) > 0 THEN ROUND(list_reduce(
         |      list_transform(w, x ->
         |        ((('0x' || substr(md5('clf:' || x), 1, 15))::BIGINT
         |          % 2001) - 1000) / 1000.0),
         |      (a, b) -> a + b) / len(w), 6) END AS margin,
         |    CASE WHEN len(w) > 0 THEN ROUND(
         |      CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
         |        / len(w), 6) END AS mwl
         |  FROM (SELECT doc_id, source, $WORDS AS w FROM documents)),
         |r AS (
         |  SELECT source,
         |    2 * RANK() OVER (PARTITION BY source ORDER BY margin)
         |      + COUNT(*) OVER (PARTITION BY source, margin) - 1 AS rx,
         |    2 * RANK() OVER (PARTITION BY source ORDER BY mwl)
         |      + COUNT(*) OVER (PARTITION BY source, mwl) - 1 AS ry
         |  FROM sc WHERE margin IS NOT NULL AND mwl IS NOT NULL),
         |a AS (
         |  SELECT source, COUNT(*) AS n, SUM(rx) AS sx, SUM(ry) AS sy,
         |    SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
         |    SUM(rx * ry) AS sxy
         |  FROM r GROUP BY 1)
         |SELECT source, n,
         |  ROUND(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         |    / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
         |      * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)), 6)
         |    + 0.0 AS rho_spearman
         |FROM a""".stripMargin,

    "q264_misra_gries" ->
      s"""WITH wc AS (
         |  SELECT doc_id % 8 AS shard, word, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |sp AS (
         |  SELECT shard, word, c, ROW_NUMBER() OVER (PARTITION BY shard
         |    ORDER BY c DESC, word) AS rn
         |  FROM wc),
         |pv AS (
         |  SELECT shard, COALESCE(MAX(CASE WHEN rn = 21 THEN c END), 0)
         |    AS pvt FROM sp GROUP BY 1),
         |ss AS (
         |  SELECT word, c - pvt AS e FROM sp JOIN pv USING (shard)
         |  WHERE c > pvt),
         |ms AS (SELECT word, CAST(SUM(e) AS BIGINT) AS se FROM ss
         |  GROUP BY 1),
         |mp AS (
         |  SELECT COALESCE(MAX(CASE WHEN rn = 21 THEN se END), 0)
         |    AS pvt2
         |  FROM (SELECT se, ROW_NUMBER() OVER (ORDER BY se DESC, word)
         |    AS rn FROM ms)),
         |mg AS (
         |  SELECT word, se - pvt2 AS est_count FROM ms, mp
         |  WHERE se > pvt2),
         |ex AS (SELECT word, CAST(SUM(c) AS BIGINT) AS true_count
         |  FROM wc GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM wc)
         |SELECT word, est_count, true_count,
         |  true_count - est_count AS err,
         |  (est_count <= true_count
         |    AND (true_count - est_count) * 21 <= n) AS bound_ok
         |FROM mg JOIN ex USING (word), tot""".stripMargin,

    "q266_conformal" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) > 0 THEN ROUND(list_reduce(
         |      list_transform(w, x ->
         |        ((('0x' || substr(md5('clf:' || x), 1, 15))::BIGINT
         |          % 2001) - 1000) / 1000.0),
         |      (a, b) -> a + b) / len(w), 6) END AS margin
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |mm AS (SELECT doc_id, margin FROM m WHERE margin IS NOT NULL),
         |cal AS (
         |  SELECT margin,
         |    ROW_NUMBER() OVER (ORDER BY margin, doc_id) AS rn,
         |    COUNT(*) OVER () AS ncal
         |  FROM mm WHERE doc_id % 5 <> 0),
         |q AS (
         |  SELECT ncal AS n_cal,
         |    CAST(CEIL((ncal + 1) * 0.9::DOUBLE) AS BIGINT) AS q_index,
         |    margin AS qhat
         |  FROM cal
         |  WHERE rn = LEAST(CAST(CEIL((ncal + 1) * 0.9::DOUBLE)
         |    AS BIGINT), ncal))
         |SELECT n_cal, q_index, qhat, COUNT(*) AS n_test,
         |  ROUND(CAST(SUM(CASE WHEN margin <= qhat THEN 1 ELSE 0 END)
         |    AS BIGINT)::DOUBLE / COUNT(*), 6) AS coverage
         |FROM mm, q WHERE doc_id % 5 = 0
         |GROUP BY 1, 2, 3""".stripMargin,

    "q253_ams_shard_merge" ->
      s"""WITH wr AS (
         |  SELECT source, doc_id, unnest($WORDS) AS word FROM documents),
         |shards AS (
         |  SELECT source, COUNT(DISTINCT doc_id % 4) AS n_shards
         |  FROM wr GROUP BY 1),
         |f AS (SELECT source, word, COUNT(*) AS c FROM wr GROUP BY 1, 2),
         |sg AS (
         |  SELECT source, c, j,
         |    1 - 2 * (('0x' || substr(md5('ams' || CAST(j AS VARCHAR)
         |      || ':' || word), 1, 15))::BIGINT & 1) AS s
         |  FROM f, unnest(range(0, 16)) AS t(j)),
         |sk AS (SELECT source, j, CAST(SUM(s * c) AS BIGINT) AS y
         |       FROM sg GROUP BY 1, 2),
         |e AS (SELECT source, CAST(SUM(y * y) AS BIGINT)::DOUBLE / 16
         |        AS est
         |      FROM sk GROUP BY 1)
         |SELECT e.source, shards.n_shards, CAST(16 AS BIGINT) AS n_eq,
         |  ROUND(e.est, 4) AS f2_est, TRUE AS merge_exact
         |FROM e JOIN shards USING (source)""".stripMargin,

    "q250_langid_confusion" ->
      s"""WITH pred AS ($langSelectSql),
         |j AS (SELECT d.lang, p.pred_lang
         |      FROM documents d JOIN pred p USING (doc_id)),
         |t AS (
         |  SELECT lang, COUNT(*) AS n_true,
         |    CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_correct
         |  FROM j GROUP BY 1),
         |p AS (SELECT pred_lang AS lang, COUNT(*) AS n_pred
         |      FROM j GROUP BY 1),
         |m AS (
         |  SELECT t.lang, n_true, COALESCE(n_pred, 0) AS n_pred, n_correct,
         |    CASE WHEN COALESCE(n_pred, 0) > 0
         |      THEN n_correct::DOUBLE / n_pred END AS pr,
         |    n_correct::DOUBLE / n_true AS rc
         |  FROM t LEFT JOIN p USING (lang))
         |SELECT lang, n_true, n_pred, n_correct,
         |  ROUND(pr, 6) AS "precision", ROUND(rc, 6) AS recall,
         |  ROUND(CASE WHEN pr + rc > 0.0::DOUBLE
         |    THEN 2.0 * pr * rc / (pr + rc) ELSE 0.0::DOUBLE END, 6) AS f1
         |FROM m""".stripMargin,

    "q251_curriculum" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, len($WORDS) AS n_words FROM documents),
         |tot AS (SELECT COUNT(*) AS n FROM d),
         |r AS (
         |  SELECT doc_id, source, n_words,
         |    ROW_NUMBER() OVER (ORDER BY n_words, doc_id) AS rn
         |  FROM d)
         |SELECT doc_id, source, n_words,
         |  ROUND(rn::DOUBLE / n, 6) AS cdf,
         |  CAST(ceil(1000.0 * (rn::DOUBLE / n) * (rn::DOUBLE / n))
         |    AS BIGINT) AS unlock_step
         |FROM r, tot""".stripMargin,

    "q252_chao1" ->
      s"""WITH f AS (
         |  SELECT source, word, COUNT(*) AS c FROM (
         |    SELECT source, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |a AS (
         |  SELECT source, COUNT(*) AS n_types,
         |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |  FROM f GROUP BY 1)
         |SELECT source, n_types, n1, n2,
         |  ROUND(n_types + (n1 * (n1 - 1))::DOUBLE / (2.0 * (n2 + 1)), 4)
         |    AS chao1
         |FROM a""".stripMargin,

    "q244_good_turing" ->
      s"""WITH f AS (
         |  SELECT source, word, COUNT(*) AS c FROM (
         |    SELECT source, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |nr AS (SELECT source, c AS r, COUNT(*) AS n_r FROM f GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
         |          COUNT(*) AS n_types
         |        FROM f GROUP BY 1),
         |n1 AS (SELECT source, n_r AS c1 FROM nr WHERE r = 1),
         |l AS (
         |  SELECT source, r, n_r,
         |    lead(r) OVER (PARTITION BY source ORDER BY r) AS rnext,
         |    lead(n_r) OVER (PARTITION BY source ORDER BY r) AS nnext
         |  FROM nr)
         |SELECT l.source, r, n_r,
         |  ROUND(CASE WHEN rnext = r + 1
         |    THEN (r + 1)::DOUBLE * nnext / n_r END, 6) AS r_star,
         |  ROUND(COALESCE(c1, 0)::DOUBLE / n, 6) AS p_unseen
         |FROM l JOIN tot USING (source) LEFT JOIN n1 USING (source)
         |WHERE r <= 10""".stripMargin,

    "q245_moore_lewis" ->
      s"""WITH wr AS (
         |  SELECT doc_id, lang = 'en' AS sd, $WORDS AS w FROM documents),
         |b2 AS (
         |  SELECT doc_id, sd, bg[1] AS w1, bg[2] AS w2
         |  FROM (SELECT doc_id, sd, unnest(list_transform(
         |          range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
         |        FROM wr WHERE len(w) >= 2)),
         |cg AS (SELECT w1, w2, COUNT(*) AS cg12 FROM b2 GROUP BY 1, 2),
         |ci AS (SELECT w1, w2, COUNT(*) AS ci12 FROM b2 WHERE sd
         |       GROUP BY 1, 2),
         |ctxg AS (SELECT w1, CAST(SUM(cg12) AS BIGINT) AS cg1
         |         FROM cg GROUP BY 1),
         |ctxi AS (SELECT w1, CAST(SUM(ci12) AS BIGINT) AS ci1
         |         FROM ci GROUP BY 1),
         |vg AS (SELECT COUNT(DISTINCT word) AS vg
         |       FROM (SELECT unnest(w) AS word FROM wr)),
         |vi AS (SELECT COUNT(DISTINCT word) AS vi
         |       FROM (SELECT unnest(w) AS word FROM wr WHERE sd)),
         |terms AS (
         |  SELECT doc_id,
         |    ROUND(-ln((cg12 + 1.0) / CAST(cg1 + vg AS DOUBLE)), 6) AS ng,
         |    ROUND(-ln((COALESCE(ci12, 0) + 1.0)
         |      / CAST(COALESCE(ci1, 0) + vi AS DOUBLE)), 6) AS ni
         |  FROM b2
         |  JOIN cg USING (w1, w2) JOIN ctxg USING (w1)
         |  LEFT JOIN ci USING (w1, w2) LEFT JOIN ctxi USING (w1)
         |  CROSS JOIN vg CROSS JOIN vi),
         |pd AS (
         |  SELECT doc_id, COUNT(*) AS n_bigrams,
         |    ROUND(${graft.core.Det.sumDetSql("ng", 6)} / COUNT(*), 6)
         |      AS avg_nll_gen,
         |    ROUND(${graft.core.Det.sumDetSql("ni", 6)} / COUNT(*), 6)
         |      AS avg_nll_in
         |  FROM terms GROUP BY 1)
         |SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
         |  avg_nll_gen, avg_nll_in,
         |  ROUND(avg_nll_in - avg_nll_gen, 6) AS ml_score,
         |  ROUND(avg_nll_in - avg_nll_gen, 6) < 0.0::DOUBLE AS keep
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q246_mmd" ->
      s"""WITH s AS (
         |  SELECT label, pos,
         |    CAST(SUM(CAST(ROUND(embedding[pos]::DOUBLE, 6)
         |      AS DECIMAL(24,6))) AS DOUBLE) AS s
         |  FROM embeddings, unnest(range(1, 65)) AS t(pos)
         |  GROUP BY 1, 2),
         |st AS (
         |  SELECT label, COUNT(*) AS m,
         |    CAST(SUM(CAST(ROUND(${dot("embedding", "embedding")}, 6)
         |      AS DECIMAL(24,6))) AS DOUBLE) AS q
         |  FROM embeddings GROUP BY 1),
         |sf AS (
         |  SELECT label,
         |    CAST(SUM(CAST(ROUND(s * s, 6) AS DECIMAL(24,6))) AS DOUBLE)
         |      AS ss
         |  FROM s GROUP BY 1),
         |cx AS (
         |  SELECT a.label AS label_a, b.label AS label_b,
         |    CAST(SUM(CAST(ROUND(a.s * b.s, 6) AS DECIMAL(24,6)))
         |      AS DOUBLE) AS sab
         |  FROM s a JOIN s b ON a.pos = b.pos AND a.label < b.label
         |  GROUP BY 1, 2)
         |SELECT label_a, label_b, sa.m AS m_a, sb.m AS m_b,
         |  ROUND((sfa.ss - sa.q) / CAST(sa.m * (sa.m - 1) AS DOUBLE)
         |    + (sfb.ss - sb.q) / CAST(sb.m * (sb.m - 1) AS DOUBLE)
         |    - 2.0 * sab / CAST(sa.m * sb.m AS DOUBLE), 6) AS mmd2
         |FROM cx
         |JOIN st sa ON sa.label = cx.label_a
         |JOIN st sb ON sb.label = cx.label_b
         |JOIN sf sfa ON sfa.label = cx.label_a
         |JOIN sf sfb ON sfb.label = cx.label_b""".stripMargin,

    "q247_silhouette" ->
      s"""WITH $kmeansCtes,
         |sil0 AS (
         |  SELECT n.vec_id, c.cluster,
         |    n.n2 + c.c_n2 - 2.0 * ${dot("n.embedding", "c.c_emb")} AS d2,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |      n.n2 + c.c_n2 - 2.0 * ${dot("n.embedding", "c.c_emb")},
         |      c.cluster) AS rn
         |  FROM n CROSS JOIN cents1 c),
         |silp AS (
         |  SELECT o.vec_id, o.cluster,
         |    sqrt(greatest(o.d2, 0.0::DOUBLE)) AS a,
         |    sqrt(greatest(q.d2, 0.0::DOUBLE)) AS b
         |  FROM sil0 o JOIN sil0 q
         |    ON o.vec_id = q.vec_id AND q.rn = 2
         |  WHERE o.rn = 1),
         |sils AS (
         |  SELECT cluster, ROUND(a, 6) AS a6, ROUND(b, 6) AS b6,
         |    ROUND(CASE WHEN greatest(a, b) > 0.0::DOUBLE
         |      THEN (b - a) / greatest(a, b) ELSE 0.0::DOUBLE END, 6) AS s6
         |  FROM silp)
         |SELECT cluster, COUNT(*) AS n_points,
         |  ROUND(${graft.core.Det.avgDetSql("a6", 6)}, 6) AS avg_a,
         |  ROUND(${graft.core.Det.avgDetSql("b6", 6)}, 6) AS avg_b,
         |  ROUND(${graft.core.Det.avgDetSql("s6", 6)}, 6) AS avg_silhouette
         |FROM sils GROUP BY 1""".stripMargin,

    "q241_theta_diff" ->
      s"""WITH wr AS (SELECT source, doc_id, $WORDS AS w FROM documents),
         |sh AS (
         |  SELECT DISTINCT source, substr(md5(sg), 1, 16) AS gk
         |  FROM (SELECT source, unnest(${shinglesSql(3)}) AS sg FROM wr)),
         |hh AS (
         |  SELECT source, gk,
         |    ('0x' || substr(md5(gk), 1, 15))::BIGINT AS h
         |  FROM sh),
         |ret AS (SELECT * FROM (
         |  SELECT source, gk, h, ROW_NUMBER() OVER (
         |    PARTITION BY source ORDER BY h, gk) AS rnk
         |  FROM hh) WHERE rnk <= 64),
         |kth AS (SELECT source, h AS kth FROM ret WHERE rnk = 64),
         |pr AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    LEAST(a.kth, b.kth) AS theta
         |  FROM kth a JOIN kth b ON a.source <> b.source),
         |below AS (
         |  SELECT pr.src_a, pr.src_b, pr.theta, r.gk
         |  FROM pr JOIN ret r ON r.source = pr.src_a AND r.h < pr.theta),
         |rc AS (
         |  SELECT b.src_a, b.src_b, b.theta, COUNT(*) AS rr
         |  FROM below b LEFT JOIN ret rb
         |    ON rb.source = b.src_b AND rb.gk = b.gk
         |  WHERE rb.gk IS NULL
         |  GROUP BY 1, 2, 3),
         |e AS (
         |  SELECT pr.src_a, pr.src_b,
         |    ROUND(COALESCE(rc.rr, 0)::DOUBLE
         |      * CAST(1152921504606846976 AS DOUBLE)
         |      / pr.theta::DOUBLE, 4) AS est_diff
         |  FROM pr LEFT JOIN rc USING (src_a, src_b)),
         |na AS (SELECT source AS src_a, COUNT(*) AS n_a FROM sh GROUP BY 1),
         |it AS (
         |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS i
         |  FROM sh a JOIN sh b ON a.gk = b.gk AND a.source <> b.source
         |  GROUP BY 1, 2)
         |SELECT e.src_a, e.src_b, na.n_a, e.est_diff,
         |  na.n_a - COALESCE(it.i, 0) AS exact_diff,
         |  ROUND(ABS(e.est_diff - (na.n_a - COALESCE(it.i, 0))::DOUBLE)
         |    / (na.n_a - COALESCE(it.i, 0))::DOUBLE, 6) AS rel_err
         |FROM e
         |JOIN na USING (src_a)
         |LEFT JOIN it ON it.src_a = e.src_a AND it.src_b = e.src_b"""
        .stripMargin,

    "q242_snm_dedup" ->
      s"""WITH k AS (
         |  SELECT source, doc_id, substr(lower(text), 1, 40) AS kk
         |  FROM documents),
         |l AS (
         |  SELECT source, doc_id AS id_a, kk AS ka,
         |    lead(doc_id, 1) OVER (PARTITION BY source
         |      ORDER BY kk, doc_id) AS id1,
         |    lead(kk, 1) OVER (PARTITION BY source
         |      ORDER BY kk, doc_id) AS k1,
         |    lead(doc_id, 2) OVER (PARTITION BY source
         |      ORDER BY kk, doc_id) AS id2,
         |    lead(kk, 2) OVER (PARTITION BY source
         |      ORDER BY kk, doc_id) AS k2
         |  FROM k),
         |c AS (
         |  SELECT source, id_a, ka, id1 AS id_b, k1 AS kb FROM l
         |  WHERE id1 IS NOT NULL
         |  UNION ALL
         |  SELECT source, id_a, ka, id2, k2 FROM l WHERE id2 IS NOT NULL),
         |d AS (SELECT source, levenshtein(ka, kb) AS dist FROM c)
         |SELECT source, COUNT(*) AS n_candidates,
         |  CAST(SUM(CASE WHEN dist <= 8 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_matches,
         |  ROUND(${graft.core.Det.avgDetSql("dist", 1)}, 4) AS avg_dist
         |FROM d GROUP BY 1""".stripMargin,

    "q243_ams_f2" ->
      s"""WITH f AS (
         |  SELECT source, word, COUNT(*) AS c FROM (
         |    SELECT source, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |sg AS (
         |  SELECT source, c, j,
         |    1 - 2 * (('0x' || substr(md5('ams' || CAST(j AS VARCHAR)
         |      || ':' || word), 1, 15))::BIGINT & 1) AS s
         |  FROM f, unnest(range(0, 16)) AS t(j)),
         |sk AS (SELECT source, j, CAST(SUM(s * c) AS BIGINT) AS y
         |       FROM sg GROUP BY 1, 2),
         |e AS (SELECT source, CAST(SUM(y * y) AS BIGINT)::DOUBLE / 16
         |        AS est
         |      FROM sk GROUP BY 1),
         |x AS (SELECT source, COUNT(*) AS n_types,
         |        CAST(SUM(c * c) AS BIGINT) AS f2_exact
         |      FROM f GROUP BY 1)
         |SELECT x.source, x.n_types, x.f2_exact, ROUND(e.est, 4) AS f2_est,
         |  ROUND(ABS(e.est - f2_exact::DOUBLE) / f2_exact::DOUBLE, 6)
         |    AS rel_err
         |FROM x JOIN e USING (source)""".stripMargin,

    "q221_vocab_coverage" ->
      s"""WITH wd AS (SELECT unnest($WORDS) AS word FROM documents),
         |f AS (SELECT word, COUNT(*) AS c FROM wd GROUP BY 1),
         |r AS (
         |  SELECT word, c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rnk
         |  FROM f),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM f),
         |e AS (
         |  SELECT rnk, c, unnest([100, 1000, 10000, 100000]) AS vsz FROM r),
         |g AS (
         |  SELECT vsz, COUNT(*) AS n_types, CAST(SUM(c) AS BIGINT) AS covered
         |  FROM e WHERE rnk <= vsz GROUP BY 1)
         |SELECT CAST(vsz AS BIGINT) AS vocab_size, n_types,
         |  covered AS covered_tokens,
         |  ROUND(covered::DOUBLE / tot, 6) AS coverage,
         |  ROUND((tot - covered)::DOUBLE / tot, 6) AS oov_rate
         |FROM g, tot""".stripMargin,

    "q225_embedding_divergence" -> {
      val m = graft.llm.Similarity.rpMatrix(64, 4)
      val scale = math.rint(math.sqrt(3.0 / 4) * 1e6) / 1e6
      val projCols = (0 until 4).map { j =>
        val terms = (0 until 64).filter(i => m(i)(j) != 0).map { i =>
          val sign = if (m(i)(j) > 0) "+" else "-"
          s"$sign (e.embedding[${i + 1}])::DOUBLE"
        }
        val body =
          if (terms.isEmpty) "0.0" else terms.mkString(" ").stripPrefix("+ ")
        s"ROUND(($body) * $scale, 6) + 0.0 AS p$j"
      }.mkString(",\n    ")
      val cellExpr = (0 until 4).map { j =>
        s"CASE WHEN p$j >= 0 THEN ${1 << (3 - j)} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH pr AS (
         |  SELECT d.source AS g,
         |    $projCols
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         |cellt AS (SELECT g, CAST($cellExpr AS BIGINT) AS cell FROM pr),
         |counts AS (SELECT g, cell, COUNT(*) AS c FROM cellt GROUP BY 1, 2),
         |totals AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM counts
         |           GROUP BY 1),
         |filled AS (
         |  SELECT t.g, r.range AS cell, t.n,
         |    (COALESCE(c.c, 0) + 1)::DOUBLE / (t.n + 16) AS p
         |  FROM totals t CROSS JOIN range(16) r
         |  LEFT JOIN counts c ON c.g = t.g AND c.cell = r.range),
         |pairs AS (
         |  SELECT a.g AS src_a, b.g AS src_b, a.n AS n_a, b.n AS n_b,
         |    ROUND((a.p * ln(a.p / ((a.p + b.p) / 2)) +
         |           b.p * ln(b.p / ((a.p + b.p) / 2))) / 2, 8) AS term
         |  FROM filled a JOIN filled b ON a.cell = b.cell AND a.g < b.g),
         |agg AS (
         |  SELECT src_a, src_b, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         |    ${graft.core.Det.roundSumDetSql("term", 8, 6)} AS js_divergence
         |  FROM pairs GROUP BY 1, 2)
         |SELECT src_a, src_b, n_a, n_b, js_divergence,
         |  ROUND(sqrt(GREATEST(js_divergence, 0.0::DOUBLE)), 6) AS js_dist
         |FROM agg""".stripMargin
    },

    "q226_calibration_ece" ->
      s"""WITH sc AS (
         |  SELECT doc_id, CASE WHEN margin IS NOT NULL
         |    THEN ROUND(1.0 / (1.0 + exp(-margin)), 6) END AS prob
         |  FROM (
         |    SELECT doc_id, CASE WHEN len(w) > 0 THEN ROUND(list_reduce(
         |      list_transform(w, x ->
         |        ((('0x' || substr(md5('clf:' || x), 1, 15))::BIGINT % 2001)
         |          - 1000) / 1000.0),
         |      (a, b) -> a + b) / len(w), 6) END AS margin
         |    FROM (SELECT doc_id, $WORDS AS w FROM documents))),
         |j AS (
         |  SELECT d.source, (d.lang = 'en') AS y, sc.prob,
         |    CAST(LEAST(floor(sc.prob * 10), 9) AS BIGINT) AS bin
         |  FROM documents d JOIN sc USING (doc_id)
         |  WHERE sc.prob IS NOT NULL),
         |perbin AS (
         |  SELECT source, bin, COUNT(*) AS n,
         |    ROUND(${graft.core.Det.sumDetSql("prob", 6)} / COUNT(*), 6)
         |      AS conf,
         |    ROUND(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
         |      / COUNT(*), 6) AS acc
         |  FROM j GROUP BY 1, 2),
         |g AS (SELECT source, bin, n, conf, acc,
         |        ROUND(abs(conf - acc), 6) AS gap FROM perbin),
         |e AS (
         |  SELECT source,
         |    ROUND(${graft.core.Det.sumDetSql("ROUND(n * gap, 6)", 6)}
         |      / CAST(SUM(n) AS BIGINT), 6) AS ece
         |  FROM g GROUP BY 1)
         |SELECT g.source, bin, n, conf, acc, gap, ece
         |FROM g JOIN e USING (source)""".stripMargin,

    "q227_doremi_weights" ->
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |toks AS (SELECT doc_id, unnest(w) AS word FROM wr),
         |uc AS (SELECT word, COUNT(*) AS cw FROM toks GROUP BY 1),
         |nv AS (SELECT CAST(SUM(cw) AS BIGINT) AS n, COUNT(*) AS v FROM uc),
         |uterm AS (
         |  SELECT doc_id, ROUND(-ln((cw + 1.0) / CAST(n + v AS DOUBLE)), 6)
         |    AS unll
         |  FROM toks JOIN uc USING (word) CROSS JOIN nv),
         |ud AS (
         |  SELECT doc_id,
         |    ROUND(${graft.core.Det.sumDetSql("unll", 6)} / COUNT(*), 6)
         |      AS uni
         |  FROM uterm GROUP BY 1),
         |b2 AS (
         |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
         |        FROM wr WHERE len(w) >= 2)),
         |bcounts AS (SELECT w1, w2, COUNT(*) AS c12 FROM b2 GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bcounts
         |        GROUP BY 1),
         |vv AS (SELECT COUNT(DISTINCT word) AS vb FROM toks),
         |bterm AS (
         |  SELECT doc_id, ROUND(-ln((c12 + 1.0) / CAST(c1 + vb AS DOUBLE)), 6)
         |    AS nll
         |  FROM b2 JOIN bcounts USING (w1, w2) JOIN ctx USING (w1)
         |  CROSS JOIN vv),
         |bd AS (
         |  SELECT doc_id,
         |    ROUND(${graft.core.Det.sumDetSql("nll", 6)} / COUNT(*), 6)
         |      AS avg_nll
         |  FROM bterm GROUP BY 1),
         |pd AS (
         |  SELECT d.source, ROUND(bd.avg_nll - ud.uni, 6) AS ex
         |  FROM documents d JOIN ud USING (doc_id) JOIN bd USING (doc_id)),
         |ps AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    ROUND(${graft.core.Det.sumDetSql("ex", 6)} / COUNT(*), 6)
         |      AS excess_nll
         |  FROM pd GROUP BY 1),
         |mx AS (SELECT MAX(excess_nll) AS mxe FROM ps),
         |nm AS (SELECT source, n_docs, excess_nll,
         |         ROUND(exp(excess_nll - mxe), 8) AS num
         |       FROM ps CROSS JOIN mx),
         |dn AS (SELECT ${graft.core.Det.sumDetSql("num", 8)} AS den FROM nm)
         |SELECT source, n_docs, excess_nll, ROUND(num / den, 6) AS weight
         |FROM nm CROSS JOIN dn""".stripMargin,

    "q228_kmv_cardinality" -> {
      val a = Dedup.HASH_A.mkString("[", ", ", "]")
      val b = Dedup.HASH_B.mkString("[", ", ", "]")
      s"""WITH sh AS (
         |  SELECT DISTINCT source, doc_id, shingle FROM (
         |    SELECT doc_id, source, unnest(${shinglesSql(3)}) AS shingle
         |    FROM (SELECT doc_id, source, $WORDS AS w FROM documents))),
         |h AS (
         |  SELECT source, shingle,
         |    ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hb
         |  FROM sh),
         |sig AS (
         |  SELECT source, j,
         |    MIN((($a)[j+1] * hb + ($b)[j+1]) % ${Dedup.MINHASH_P}) AS mh
         |  FROM h, unnest(range(0, 8)) AS t(j) GROUP BY 1, 2),
         |agg AS (
         |  SELECT s.source, e.n_exact, CAST(SUM(s.mh) AS BIGINT) AS smh
         |  FROM sig s JOIN (
         |    SELECT source, COUNT(DISTINCT shingle) AS n_exact
         |    FROM sh GROUP BY 1) e USING (source)
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT source, n_exact,
         |    ROUND(8.0::DOUBLE * ${Dedup.MINHASH_P} / smh - 1.0::DOUBLE, 2)
         |      AS est_kmv
         |  FROM agg)
         |SELECT source, n_exact, est_kmv,
         |  ROUND(abs(est_kmv - n_exact) / n_exact, 4) AS rel_err
         |FROM est""".stripMargin
    },

    "q229_confident_joint" ->
      s"""WITH $knnGraphCtes,
         |frac AS (
         |  SELECT rk.id, l.label AS nbr_label, COUNT(*) AS c,
         |    ROUND(COUNT(*)::DOUBLE / 5, 6) AS frac
         |  FROM rk JOIN embeddings l ON l.vec_id = rk.nbr_id
         |  WHERE rk.nbr_rank <= 5 GROUP BY 1, 2),
         |nj AS (SELECT label, COUNT(*) AS njn FROM embeddings GROUP BY 1),
         |ss AS (
         |  SELECT e.label, ${graft.core.Det.sumDetSql("f.frac", 6)} AS sself
         |  FROM frac f JOIN embeddings e
         |    ON e.vec_id = f.id AND e.label = f.nbr_label
         |  GROUP BY 1),
         |tj AS (
         |  SELECT nj.label AS pred_label,
         |    ROUND(COALESCE(ss.sself, 0.0::DOUBLE) / nj.njn, 6) AS t_pred
         |  FROM nj LEFT JOIN ss USING (label)),
         |qual AS (
         |  SELECT f.id, f.nbr_label, f.frac,
         |    ROW_NUMBER() OVER (PARTITION BY f.id
         |      ORDER BY f.frac DESC, f.nbr_label) AS r
         |  FROM frac f JOIN tj ON f.nbr_label = tj.pred_label
         |  WHERE f.frac >= tj.t_pred),
         |assign AS (SELECT id, nbr_label AS pred_label FROM qual WHERE r = 1),
         |cj AS (
         |  SELECT e.label, a.pred_label, COUNT(*) AS n_confident
         |  FROM embeddings e JOIN assign a ON a.id = e.vec_id
         |  GROUP BY 1, 2),
         |rt AS (SELECT label, CAST(SUM(n_confident) AS BIGINT) AS rtn
         |       FROM cj GROUP BY 1)
         |SELECT cj.label, cj.pred_label, cj.n_confident,
         |  ROUND(cj.n_confident::DOUBLE / rt.rtn, 6) AS frac_of_label,
         |  tj.t_pred
         |FROM cj JOIN rt USING (label)
         |JOIN tj ON tj.pred_label = cj.pred_label""".stripMargin,

    "q230_kneser_ney" ->
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |b2 AS (
         |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
         |        FROM wr WHERE len(w) >= 2)),
         |counts AS (SELECT w1, w2, COUNT(*) AS c12 FROM b2 GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         |          COUNT(*) AS t1 FROM counts GROUP BY 1),
         |cont AS (SELECT w2, COUNT(*) AS n2 FROM counts GROUP BY 1),
         |nb AS (SELECT COUNT(*) AS nbt FROM counts),
         |terms AS (
         |  SELECT doc_id, c12, ROUND(-ln(
         |    (c12 - 0.75::DOUBLE) / c1 +
         |      ((0.75::DOUBLE * t1) / c1) * (n2::DOUBLE / nbt)), 6) AS nll
         |  FROM b2 LEFT JOIN counts USING (w1, w2) LEFT JOIN ctx USING (w1)
         |  LEFT JOIN cont USING (w2) CROSS JOIN nb),
         |pd AS (
         |  SELECT doc_id, COUNT(*) AS n_bigrams,
         |    CAST(COUNT(*) FILTER (WHERE c12 IS NULL) AS BIGINT) AS n_unseen,
         |    CASE WHEN COUNT(nll) > 0 THEN
         |      ROUND(${graft.core.Det.sumDetSql("nll", 6)} / COUNT(nll), 6)
         |    END AS avg_nll_kn
         |  FROM terms GROUP BY 1)
         |SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
         |  COALESCE(n_unseen, 0) AS n_unseen, avg_nll_kn
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q146_cluster_purity" ->
      s"""WITH $kmeansCtes,
         |lab AS (
         |  SELECT a2.vec_id, a2.cluster, e.label
         |  FROM a2 JOIN embeddings e USING (vec_id)),
         |cnt AS (SELECT cluster, label, COUNT(*) AS n_l FROM lab GROUP BY 1, 2),
         |top AS (
         |  SELECT cluster, label AS top_label, n_l AS top_n,
         |    ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY n_l DESC, label)
         |      AS rn
         |  FROM cnt)
         |SELECT c.cluster, CAST(SUM(c.n_l) AS BIGINT) AS n,
         |  MAX(t.top_label) AS top_label, MAX(t.top_n) AS top_n,
         |  ROUND(MAX(t.top_n)::DOUBLE / SUM(c.n_l), 6) AS purity
         |FROM cnt c JOIN top t ON c.cluster = t.cluster AND t.rn = 1
         |GROUP BY c.cluster""".stripMargin,

    "q147_hard_negatives" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, embedding,
         |    ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings)
         |SELECT query_id, q_label, cand_id, cand_label, cos, rnk FROM (
         |  SELECT q.vec_id AS query_id, q.label AS q_label,
         |    c.vec_id AS cand_id, c.label AS cand_label,
         |    ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |      ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |      c.vec_id) AS rnk
         |  FROM n q JOIN n c
         |    ON q.vec_id < 20 AND q.vec_id <> c.vec_id AND q.label <> c.label)
         |WHERE rnk <= 5""".stripMargin,

    // Mirrors Similarity.semDedupIncremental: quantizer (ceil(sqrt(N))
    // lowest-id seeds) and cell layout from the INDEX side only; new-batch
    // rows verified against index cell-mates with the 6-digit cosine.
    "q148_semdedup_incr" ->
      s"""WITH idx AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings WHERE vec_id % 10 <> 0),
         |nw AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |cents AS (
         |  SELECT cent_id, c_emb, c_n2 FROM (
         |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
         |      COUNT(*) OVER () AS ccnt
         |    FROM idx)
         |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
         |cellsI AS (
         |  SELECT vec_id AS idx_id, cent_id AS cell FROM (
         |    SELECT idx.vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY idx.vec_id
         |        ORDER BY ${dot("idx.embedding", "cents.c_emb")} / sqrt(idx.n2 * cents.c_n2) DESC,
         |                 cent_id) AS rn
         |    FROM idx CROSS JOIN cents) WHERE rn = 1),
         |cellsN AS (
         |  SELECT vec_id AS id, cent_id AS cell FROM (
         |    SELECT nw.vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY nw.vec_id
         |        ORDER BY ${dot("nw.embedding", "cents.c_emb")} / sqrt(nw.n2 * cents.c_n2) DESC,
         |                 cent_id) AS rn
         |    FROM nw CROSS JOIN cents) WHERE rn = 1),
         |sims AS (
         |  SELECT cn.cell, cn.id,
         |    MAX(ROUND(${dot("a.embedding", "b.embedding")} / sqrt(a.n2 * b.n2), 6)) AS max_sim
         |  FROM cellsN cn
         |  JOIN cellsI ci ON cn.cell = ci.cell
         |  JOIN nw a ON a.vec_id = cn.id
         |  JOIN idx b ON b.vec_id = ci.idx_id
         |  GROUP BY 1, 2)
         |SELECT cellsN.id, cellsN.cell, sims.max_sim,
         |  (sims.max_sim IS NULL OR sims.max_sim < 0.7) AS kept
         |FROM cellsN LEFT JOIN sims ON cellsN.id = sims.id""".stripMargin,

    "q149_inverted_search" ->
      s"""WITH p AS (
         |  SELECT DISTINCT doc_id, word
         |  FROM (SELECT doc_id, unnest($WORDS) AS word FROM documents)),
         |top AS (
         |  SELECT word FROM (SELECT word, COUNT(*) AS df FROM p GROUP BY 1)
         |  ORDER BY df DESC, word LIMIT 8)
         |SELECT a.word AS word_a, b.word AS word_b, COUNT(*) AS n_docs
         |FROM (SELECT * FROM p WHERE word IN (SELECT word FROM top)) a
         |JOIN (SELECT * FROM p WHERE word IN (SELECT word FROM top)) b
         |  USING (doc_id)
         |WHERE a.word < b.word
         |GROUP BY 1, 2""".stripMargin,

    "q152_unk_mask" ->
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |toks AS (
         |  SELECT doc_id, i, w[i] AS word
         |  FROM wr, unnest(range(1, len(w) + 1)) AS t(i)),
         |dfs AS (
         |  SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         |m AS (
         |  SELECT doc_id, i,
         |    CASE WHEN df < 30 THEN '<unk>' ELSE word END AS word,
         |    CASE WHEN df < 30 THEN 1 ELSE 0 END AS unk
         |  FROM toks JOIN dfs USING (word)),
         |agg AS (
         |  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS masked,
         |    CAST(SUM(unk) AS BIGINT) AS n_unk, COUNT(*) AS n_tokens
         |  FROM m GROUP BY 1)
         |SELECT d.doc_id, COALESCE(masked, '') AS masked,
         |  COALESCE(n_unk, 0) AS n_unk, COALESCE(n_tokens, 0) AS n_tokens
         |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin,

    "q188_priority_sample" ->
      """WITH p AS (
        |  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |    (((('0x' || substr(md5('ps1' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT)::DOUBLE + 1.0) / 4294967296.0) / CAST(n_chars AS DOUBLE)
        |      AS priority
        |  FROM documents WHERE n_chars > 0)
        |SELECT source, doc_id, weight, priority, rnk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY priority, doc_id) AS rnk FROM p)
        |WHERE rnk <= 20""".stripMargin,

    "q189_edit_pairs" ->
      """WITH k AS (
        |  SELECT lang || chr(1) || substr(text, 1, 10) AS block, doc_id AS id,
        |    substr(text, 1, 40) AS t
        |  FROM documents),
        |ok AS (SELECT block FROM k GROUP BY 1
        |       HAVING COUNT(*) > 1 AND COUNT(*) <= 1000),
        |i AS (SELECT k.* FROM k JOIN ok USING (block))
        |SELECT a.block, a.id AS id_a, b.id AS id_b,
        |  levenshtein(a.t, b.t) AS dist,
        |  ROUND(1.0::DOUBLE - levenshtein(a.t, b.t)::DOUBLE
        |    / GREATEST(length(a.t), length(b.t)), 6) + 0.0 AS sim
        |FROM i a JOIN i b ON a.block = b.block AND a.id < b.id
        |WHERE levenshtein(a.t, b.t) <= 15""".stripMargin,

    "q190_int8_quant" ->
      """WITH c AS (
        |  SELECT i.i - 1 AS pos, CAST(embedding[i.i] AS DOUBLE) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS i(i)),
        |r AS (
        |  SELECT pos, MIN(x) AS mn, MAX(x) AS mx,
        |    (MAX(x) - MIN(x)) / 255.0 AS scale
        |  FROM c GROUP BY 1),
        |q AS (
        |  SELECT c.pos, r.mn, r.mx, r.scale, c.x,
        |    CASE WHEN r.scale = 0 THEN 0
        |      ELSE CAST(FLOOR((c.x - r.mn) / r.scale + 0.5) AS BIGINT)
        |    END AS code
        |  FROM c JOIN r USING (pos)),
        |e2 AS (
        |  SELECT pos, mn, mx, scale,
        |    ABS(x - (mn + code::DOUBLE * scale)) AS err
        |  FROM q)
        |SELECT CAST(pos AS INT) AS pos, MIN(mn) AS mn, MAX(mx) AS mx,
        |  MIN(scale) AS scale, MAX(err) AS max_abs_err,
        |  CAST(SUM(CAST(FLOOR(err * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / COUNT(*) / 1e9 AS mean_abs_err
        |FROM e2 GROUP BY pos""".stripMargin,

    "q191_top_pc" -> topPcSql,

    "q192_abtt" -> abttSql,

    "q195_kcenter" -> kCenterSql,

    // q30's exact chain + the band/probe matches: bit flips as the
    // portable arithmetic k + m - 2*(k & m), probes = the band key plus
    // its 8 single-bit perturbations.
    "q198_multiprobe" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |bands AS ($bandKeysSql),
         |qb AS (SELECT vec_id, bi, bk FROM bands WHERE vec_id < 20),
         |probes AS (
         |  SELECT vec_id, bi,
         |    CASE WHEN t.p < 0 THEN bk
         |         ELSE bk + (1 << t.p) - 2 * (bk & (1 << t.p)) END AS pk
         |  FROM qb, unnest(range(-1, 8)) AS t(p)),
         |plain AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
         |  FROM qb q JOIN bands c ON q.bi = c.bi AND q.bk = c.bk
         |  WHERE q.vec_id <> c.vec_id),
         |mp AS (
         |  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS cand_id
         |  FROM probes p JOIN bands c ON p.bi = c.bi AND p.pk = c.bk
         |  WHERE p.vec_id <> c.vec_id),
         |exact AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${dot("q.embedding", "c.embedding")}
         |          / sqrt(q.n2 * c.n2), 6) DESC, c.vec_id) AS rnk
         |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 20)
         |  WHERE rnk <= 5)
         |SELECT e.query_id, COUNT(*) AS n_exact,
         |  CAST(SUM(CASE WHEN pl.cand_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits_plain,
         |  CAST(SUM(CASE WHEN mp.cand_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits_mp,
         |  ROUND(CAST(SUM(CASE WHEN pl.cand_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT)::DOUBLE / COUNT(*), 6) AS recall_plain,
         |  ROUND(CAST(SUM(CASE WHEN mp.cand_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT)::DOUBLE / COUNT(*), 6) AS recall_mp
         |FROM exact e
         |LEFT JOIN plain pl ON pl.query_id = e.query_id AND pl.cand_id = e.cand_id
         |LEFT JOIN mp ON mp.query_id = e.query_id AND mp.cand_id = e.cand_id
         |GROUP BY 1""".stripMargin,

    "q199_quality_dup_matrix" -> {
      val en = TextAnalysis.stopwords.head._2.map(x => s"'$x'").mkString(", ")
      s"""WITH RECURSIVE $textClusterCtes,
         |q AS (
         |  SELECT s.doc_id, d.source,
         |    ROUND(0.4 * ROUND(n_unique::DOUBLE / n_words, 6)
         |        + 0.3 * LEAST(n_words::DOUBLE / 50.0, 1.0)
         |        + 0.3 * (1.0 - ROUND(n_stop::DOUBLE / n_words, 6)), 6)
         |      AS quality_score
         |  FROM (SELECT doc_id, len(w) AS n_words,
         |          len(list_distinct(w)) AS n_unique,
         |          len(list_filter(w, x -> x IN ($en))) AS n_stop
         |        FROM (SELECT doc_id, $WORDS AS w FROM documents)) s
         |  JOIN documents d USING (doc_id)),
         |m AS (
         |  SELECT q.source, q.quality_score,
         |    CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup,
         |    NTILE(10) OVER (PARTITION BY q.source
         |      ORDER BY q.quality_score NULLS FIRST, q.doc_id) AS decile
         |  FROM q LEFT JOIN comp c ON c.doc_id = q.doc_id)
         |SELECT source, CAST(decile AS BIGINT) AS decile,
         |  COUNT(*) AS n_docs, CAST(SUM(dup) AS BIGINT) AS n_dup,
         |  ROUND(CAST(SUM(dup) AS BIGINT)::DOUBLE / COUNT(*), 6) AS dup_rate
         |FROM m GROUP BY 1, 2""".stripMargin
    },

    "q196_dedup_verdict" ->
      s"""WITH RECURSIVE $textClusterCtes,
         |ex AS (SELECT md5(text) AS h, MIN(doc_id) AS keep_id
         |       FROM documents GROUP BY 1),
         |we AS (SELECT d.doc_id, e.keep_id
         |       FROM documents d JOIN ex e ON md5(d.text) = e.h),
         |canon AS (
         |  SELECT c.cluster_id, MIN(c.doc_id) AS canon_id
         |  FROM comp c JOIN we ON we.doc_id = c.doc_id
         |  WHERE we.doc_id = we.keep_id GROUP BY 1)
         |SELECT w.doc_id,
         |  CASE WHEN w.doc_id <> w.keep_id THEN 'exact_dup'
         |       WHEN cn.canon_id IS NOT NULL AND w.doc_id <> cn.canon_id
         |         THEN 'near_dup'
         |       ELSE 'kept' END AS verdict,
         |  CASE WHEN w.doc_id <> w.keep_id THEN w.keep_id
         |       WHEN cn.canon_id IS NOT NULL AND w.doc_id <> cn.canon_id
         |         THEN cn.canon_id END AS dup_of
         |FROM we w
         |LEFT JOIN comp c ON c.doc_id = w.doc_id
         |LEFT JOIN canon cn ON cn.cluster_id = c.cluster_id""".stripMargin,

    "q194_lexical_diversity" ->
      s"""WITH dw AS (
         |  SELECT doc_id, word, COUNT(*) AS c FROM (
         |    SELECT doc_id, unnest($WORDS) AS word FROM documents)
         |  GROUP BY 1, 2),
         |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM dw GROUP BY 1),
         |terms AS (
         |  SELECT doc_id, c, n,
         |    ROUND((c::DOUBLE / n::DOUBLE)
         |      * ROUND(ln(c::DOUBLE / n::DOUBLE), 6), 10) AS t
         |  FROM dw JOIN tot USING (doc_id)),
         |agg AS (
         |  SELECT doc_id, MAX(n) AS nt, COUNT(*) AS ty,
         |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         |    ROUND(0.0::DOUBLE - ${graft.core.Det.sumDetSql("t", 10)}, 6)
         |      AS entropy
         |  FROM terms GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(nt, 0) AS n_tokens, COALESCE(ty, 0) AS n_types,
         |  CASE WHEN nt IS NOT NULL
         |    THEN ROUND(ty::DOUBLE / nt, 6) + 0.0 END AS ttr,
         |  CASE WHEN ty IS NOT NULL
         |    THEN ROUND(hapax::DOUBLE / ty, 6) + 0.0 END AS hapax_frac,
         |  entropy + 0.0 AS entropy
         |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin,

    "q200_corpus_diff" ->
      s"""WITH old AS (
         |  SELECT doc_id, source, text FROM documents WHERE doc_id % 11 <> 0),
         |neu AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
         |  FROM documents WHERE doc_id % 13 <> 0),
         |j AS (
         |  SELECT COALESCE(n.source, o.source) AS source,
         |    CASE WHEN o.doc_id IS NULL THEN 'added'
         |         WHEN n.doc_id IS NULL THEN 'removed'
         |         WHEN md5(o.text) = md5(n.text) THEN 'unchanged'
         |         ELSE 'changed' END AS status,
         |    COALESCE(length(o.text), 0) AS co,
         |    COALESCE(length(n.text), 0) AS cn
         |  FROM old o FULL JOIN neu n ON o.doc_id = n.doc_id)
         |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(co) AS BIGINT) AS chars_old,
         |  CAST(SUM(cn) AS BIGINT) AS chars_new
         |FROM j GROUP BY 1, 2""".stripMargin,

    "q201_heaps_fit" -> {
      val sd = (e: String) => graft.core.Det.sumDetSql(e, 6)
      s"""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
         |wr AS (
         |  SELECT (doc_id * 64) // (m + 1) AS bkt, unnest($WORDS) AS word
         |  FROM documents, mx),
         |tok AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS toks
         |        FROM wr GROUP BY 1),
         |typ AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS types FROM (
         |          SELECT word, MIN(bkt) AS bkt FROM wr GROUP BY 1)
         |        GROUP BY 1),
         |c0 AS (
         |  SELECT COALESCE(t.bkt, y.bkt) AS bkt, COALESCE(toks, 0) AS toks,
         |    COALESCE(types, 0) AS types
         |  FROM tok t FULL JOIN typ y ON t.bkt = y.bkt),
         |c1 AS (
         |  SELECT CAST(SUM(toks) OVER cum AS BIGINT) AS ct,
         |    CAST(SUM(types) OVER cum AS BIGINT) AS cy
         |  FROM c0 WINDOW cum AS (ORDER BY bkt
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT ct, cy, ROUND(ln(ct), 6) AS x, ROUND(ln(cy), 6) AS y
         |      FROM c1 WHERE ct > 0 AND cy > 0),
         |s AS (
         |  SELECT COUNT(*) AS n, MAX(ct) AS total_tokens,
         |    MAX(cy) AS total_types, ${sd("x")} AS sx, ${sd("y")} AS sy,
         |    ${sd("x * y")} AS sxy, ${sd("x * x")} AS sxx
         |  FROM t)
         |SELECT n AS n_points, total_tokens, total_types,
         |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
         |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
         |    6) AS log_k
         |FROM s""".stripMargin
    },

    "q203_winnowing" ->
      s"""WITH g AS (
         |  SELECT doc_id, lower(text) AS t, length(lower(text)) - 7 AS m
         |  FROM documents WHERE length(lower(text)) >= 11),
         |pk AS (
         |  SELECT doc_id, m, list_transform(range(0, m), i ->
         |    ('0x' || substr(md5(substr(t, CAST(i + 1 AS INT), 8)), 1, 8))::BIGINT
         |      * 1048576 + (1048575 - i)) AS p
         |  FROM g),
         |fp AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, m - 3),
         |    j -> list_aggregate(p[CAST(j + 1 AS INT):CAST(j + 4 AS INT)],
         |      'min')))) AS v
         |  FROM pk),
         |f AS (SELECT DISTINCT doc_id, v // 1048576 AS h FROM fp),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
         |       FROM f GROUP BY 1),
         |dfh AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM f GROUP BY 1),
         |r AS (SELECT f.doc_id, f.h FROM f JOIN dfh USING (h) WHERE df <= 10),
         |sh AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM r a JOIN r b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, n_shared,
         |  ROUND(n_shared::DOUBLE / LEAST(sa.sz, sb.sz), 6) AS overlap
         |FROM sh
         |JOIN sz sa ON sa.doc_id = sh.id_a
         |JOIN sz sb ON sb.doc_id = sh.id_b""".stripMargin,

    "q205_boilerplate" ->
      s"""WITH r AS (
         |  SELECT source, kind, gram FROM (
         |    SELECT source, lower(text) AS t FROM documents
         |    WHERE length(lower(text)) >= 16),
         |  LATERAL (VALUES ('prefix', substr(t, 1, 16)),
         |                  ('suffix', substr(t, length(t) - 15, 16)))
         |    AS v(kind, gram)),
         |c AS (
         |  SELECT source, kind, gram, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM r GROUP BY 1, 2, 3),
         |tot AS (
         |  SELECT source, kind, CAST(COUNT(*) AS BIGINT) AS tot
         |  FROM r GROUP BY 1, 2),
         |rk AS (
         |  SELECT source, kind, gram, n,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source, kind
         |      ORDER BY n DESC, gram) AS BIGINT) AS rank
         |  FROM c)
         |SELECT rk.source, rk.kind, rank, gram, n,
         |  ROUND(n::DOUBLE / tot, 6) AS share
         |FROM rk JOIN tot ON tot.source = rk.source AND tot.kind = rk.kind
         |WHERE rank <= 3""".stripMargin,

    "q207_label_separation" ->
      s"""WITH sv AS (
         |  SELECT CAST(label AS BIGINT) AS label, list_transform(embedding,
         |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 16777216 + 0.5) AS BIGINT))
         |    AS s
         |  FROM embeddings),
         |c0 AS (
         |  SELECT label, ii.i AS i, CAST(SUM(s[ii.i]) AS BIGINT) AS si,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sv, unnest(range(1, 65)) AS ii(i) GROUP BY 1, 2),
         |c1 AS (SELECT label, MAX(n) AS n, list(si ORDER BY i) AS sil
         |       FROM c0 GROUP BY 1),
         |c2 AS (SELECT label, n, list_transform(sil,
         |         x -> (CAST(x AS DOUBLE) / 16777216.0) / n) AS c FROM c1),
         |c3 AS (SELECT label, n, c, ${dot("c", "c")} AS cn2 FROM c2),
         |own AS (
         |  SELECT e.label, ROUND(${dot("e.embedding", "c3.c")} /
         |    sqrt(${dot("e.embedding", "e.embedding")} * c3.cn2), 6) AS cos
         |  FROM embeddings e JOIN c3 ON c3.label = e.label),
         |intra AS (
         |  SELECT label, ROUND(${graft.core.Det.sumDetSql("cos", 6)}
         |    / COUNT(*), 6) AS mean_intra_cos
         |  FROM own GROUP BY 1)
         |SELECT a.label AS label_a, b.label AS label_b,
         |  ROUND(${dot("a.c", "b.c")} / sqrt(a.cn2 * b.cn2), 6)
         |    AS centroid_cos,
         |  CASE WHEN a.label = b.label THEN a.n END AS n_vecs,
         |  i.mean_intra_cos
         |FROM c3 a CROSS JOIN c3 b
         |LEFT JOIN intra i ON i.label = a.label AND a.label = b.label""".stripMargin,

    "q210_neyman_alloc" -> {
      val en = TextAnalysis.stopwords.head._2.map(x => s"'$x'").mkString(", ")
      val sd = (e: String) => graft.core.Det.sumDetSql(e, 6)
      s"""WITH wr AS (SELECT doc_id, source, $WORDS AS w FROM documents),
         |q AS (
         |  SELECT source,
         |    ROUND(0.4 * ROUND(len(list_distinct(w))::DOUBLE / len(w), 6)
         |      + 0.3 * LEAST(len(w)::DOUBLE / 50.0, 1.0)
         |      + 0.3 * (1.0 - ROUND(len(list_filter(w, x -> x IN ($en)))::DOUBLE
         |          / len(w), 6)), 6) AS qs
         |  FROM wr),
         |x AS (SELECT source AS stratum, ROUND(qs, 6) AS x FROM q
         |      WHERE qs IS NOT NULL),
         |ps AS (
         |  SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    ${sd("x")} AS sx, ${sd("x * x")} AS sxx
         |  FROM x GROUP BY 1),
         |v AS (
         |  SELECT stratum, n_docs, ROUND(sx / n_docs, 6) AS mean_score,
         |    CASE WHEN n_docs > 1
         |      THEN ROUND((sxx - sx * sx / n_docs) / (n_docs - 1), 6)
         |      ELSE 0.0::DOUBLE END AS var_score
         |  FROM ps),
         |v2 AS (
         |  SELECT *, ROUND(n_docs * sqrt(var_score), 6) AS ns FROM v),
         |tot AS (SELECT ${sd("ns")} AS tot FROM v2)
         |SELECT stratum, n_docs, mean_score, var_score,
         |  CASE WHEN tot > 0.0 THEN ROUND(ns / tot, 6)
         |    ELSE 0.0::DOUBLE END AS alloc_share,
         |  CAST(FLOOR((CASE WHEN tot > 0.0 THEN ROUND(ns / tot, 6)
         |    ELSE 0.0::DOUBLE END) * 100 + 0.5) AS BIGINT) AS n_alloc
         |FROM v2 CROSS JOIN tot""".stripMargin
    },

    "q209_quantile_norm" -> {
      val en = TextAnalysis.stopwords.head._2.map(x => s"'$x'").mkString(", ")
      s"""WITH wr AS (SELECT doc_id, source, $WORDS AS w FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |    ROUND(0.4 * ROUND(len(list_distinct(w))::DOUBLE / len(w), 6)
         |      + 0.3 * LEAST(len(w)::DOUBLE / 50.0, 1.0)
         |      + 0.3 * (1.0 - ROUND(len(list_filter(w, x -> x IN ($en)))::DOUBLE
         |          / len(w), 6)), 6) AS quality_score
         |  FROM wr)
         |SELECT doc_id, source, quality_score,
         |  PERCENT_RANK() OVER sw AS pct_rank,
         |  CAST(LEAST(FLOOR(PERCENT_RANK() OVER sw * 10), 9.0) AS BIGINT)
         |    AS norm_decile
         |FROM q WHERE quality_score IS NOT NULL
         |WINDOW sw AS (PARTITION BY source ORDER BY quality_score)""".stripMargin
    },

    "q208_filter_kappa" -> {
      val pairs = Seq(("quality", "gopher", "fa", "fb"),
        ("quality", "perplexity", "fa", "fc"),
        ("gopher", "perplexity", "fb", "fc"))
      val sums = pairs.zipWithIndex.flatMap { case ((_, _, x, y), i) =>
        Seq(s"CAST(SUM(CASE WHEN $x THEN 1 ELSE 0 END) AS BIGINT) AS ka$i",
          s"CAST(SUM(CASE WHEN $y THEN 1 ELSE 0 END) AS BIGINT) AS kb$i",
          s"CAST(SUM(CASE WHEN $x AND $y THEN 1 ELSE 0 END) AS BIGINT) AS kab$i")
      }
      val rows = pairs.zipWithIndex.map { case ((na, nb, _, _), i) =>
        s"""SELECT '$na' AS filter_a, '$nb' AS filter_b, n AS n_docs,
           |  ka$i AS n_keep_a, kb$i AS n_keep_b, kab$i AS n_keep_both,
           |  ROUND(po, 6) AS po, ROUND(pe, 6) AS pe,
           |  CASE WHEN pe <> 1.0
           |    THEN ROUND((po - pe) / (1.0 - pe), 6) END AS kappa
           |FROM (SELECT n, ka$i, kb$i, kab$i,
           |  CAST(kab$i * 2 + n - ka$i - kb$i AS DOUBLE) / n AS po,
           |  (CAST(ka$i AS DOUBLE) / n) * (CAST(kb$i AS DOUBLE) / n)
           |    + (1.0 - CAST(ka$i AS DOUBLE) / n)
           |    * (1.0 - CAST(kb$i AS DOUBLE) / n) AS pe
           |  FROM g)""".stripMargin
      }
      s"""WITH qa AS (
         |  SELECT doc_id, COALESCE(quality_score >= 0.73, false) AS fa
         |  FROM ($qualitySelectSql)),
         |gb AS (SELECT doc_id, keep AS fb FROM ($gopherSelectSql)),
         |pc AS (
         |  SELECT doc_id, COALESCE(avg_nll <= 3.39, false) AS fc
         |  FROM ($bigramLmSql)),
         |j AS (
         |  SELECT qa.doc_id, fa, fb, fc
         |  FROM qa JOIN gb USING (doc_id) JOIN pc USING (doc_id)),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, ${sums.mkString(",\n  ")}
         |      FROM j)
         |${rows.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // The merge is exact by the KMV invariant (each corpus bottom-k
    // element is retained by its own shard), so the oracle computes the
    // corpus-at-once bottom-k and asserts full positional agreement.
    "q294_theta_persist" ->
      s"""WITH wr AS (SELECT source, doc_id, $WORDS AS w FROM documents),
         |shd AS (
         |  SELECT DISTINCT doc_id % 4 AS shard, source,
         |    substr(md5(sg), 1, 16) AS gk
         |  FROM (SELECT doc_id, source, unnest(${shinglesSql(3)}) AS sg
         |        FROM wr)),
         |hh AS (
         |  SELECT source, gk, ('0x' || substr(md5(gk), 1, 15))::BIGINT AS h
         |  FROM (SELECT DISTINCT source, gk FROM shd)),
         |ret AS (SELECT * FROM (
         |  SELECT source, gk, h, ROW_NUMBER() OVER (
         |    PARTITION BY source ORDER BY h, gk) AS rnk
         |  FROM hh) WHERE rnk <= 64),
         |nsh AS (SELECT source, COUNT(DISTINCT shard) AS n_shards
         |        FROM shd GROUP BY 1),
         |agg AS (
         |  SELECT source, COUNT(*) AS n_retained,
         |    MAX(CASE WHEN rnk = 64 THEN h END) AS kth
         |  FROM ret GROUP BY 1)
         |SELECT a.source, nsh.n_shards, a.n_retained,
         |  a.n_retained AS n_eq, TRUE AS merge_exact,
         |  ROUND(63.0::DOUBLE * CAST(1152921504606846976 AS DOUBLE)
         |    / a.kth::DOUBLE, 4) AS est_distinct
         |FROM agg a JOIN nsh USING (source)""".stripMargin,

    // Decimal addition is exact and associative, so the shard re-merge
    // reproduces the corpus-at-once moments bit-for-bit; the oracle
    // recomputes q237's Cornish-Fisher estimates and asserts exactness.
    "q295_moments_persist" -> {
      val sd8 = (e: String) => graft.core.Det.sumDetSql(e, 8)
      def est(z: Double): String =
        s"mu + sd*($z::DOUBLE) + sd*sk*(${CfK1(z)}::DOUBLE)" +
          s" + sd*ku*(${CfK2(z)}::DOUBLE) + sd*sk*sk*(${CfK3(z)}::DOUBLE)"
      s"""WITH b AS (
         |  SELECT source, doc_id, ROUND(ln(LENGTH(text)::DOUBLE), 8) AS t
         |  FROM documents),
         |p AS (SELECT source, doc_id, t, ROUND(t*t, 8) AS t2 FROM b),
         |p2 AS (SELECT source, doc_id, t, t2, ROUND(t2*t, 8) AS t3 FROM p),
         |p3 AS (SELECT source, doc_id, t, t2, t3, ROUND(t3*t, 8) AS t4
         |       FROM p2),
         |g AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    COUNT(DISTINCT doc_id % 4) AS n_shards,
         |    ${sd8("t")} AS s1, ${sd8("t2")} AS s2,
         |    ${sd8("t3")} AS s3, ${sd8("t4")} AS s4
         |  FROM p3 GROUP BY 1),
         |m1 AS (SELECT *, s1 / n_docs AS mu FROM g),
         |m2c AS (SELECT *, s2 / n_docs - mu * mu AS m2 FROM m1),
         |m3 AS (SELECT *, sqrt(m2) AS sd FROM m2c),
         |m4 AS (
         |  SELECT *,
         |    (s3 / n_docs - 3 * mu * m2 - mu * mu * mu) / (m2 * sd) AS sk,
         |    (s4 / n_docs - 4 * mu * (s3 / n_docs)
         |      + 6 * mu * mu * (s2 / n_docs)
         |      - 3 * mu * mu * mu * mu) / (m2 * m2) - 3 AS ku
         |  FROM m3),
         |e AS (SELECT *, ${est(0.0)} AS e50, ${est(Z90)} AS e90 FROM m4)
         |SELECT source, n_shards, n_docs,
         |  ROUND(e50, 6) AS est_p50, ROUND(e90, 6) AS est_p90,
         |  TRUE AS persist_exact
         |FROM e""".stripMargin
    },

    // HLL registers are max-mergeable, so the incremental path equals
    // the from-scratch t=2 run register-for-register; the oracle
    // recomputes the direct registers (q240's CTE machinery verbatim)
    // and asserts full agreement plus the t=2 estimate.
    "q296_hyperball_persist" -> {
      def regStep(prev: String, out: String) =
        s"""$out AS (
           |  SELECT v, bucket, MAX(m) AS m FROM (
           |    SELECT * FROM $prev
           |    UNION ALL
           |    SELECT e.v AS v, r.bucket, r.m
           |    FROM edges e JOIN $prev r ON r.v = e.u)
           |  GROUP BY 1, 2)""".stripMargin
      def estCte(reg: String, out: String) =
        s"""$out AS (
           |  SELECT v, CASE WHEN raw <= 160.0 AND zeros > 0
           |    THEN ROUND(64 * ln(CAST(64.0 AS DOUBLE) / zeros), 4)
           |    ELSE ROUND(raw, 4) END AS est
           |  FROM (
           |    SELECT v, 64 - np AS zeros,
           |      CAST(2904.064 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
           |        / CAST(psum + (64 - np)::HUGEINT
           |            * 1152921504606846976::HUGEINT AS DOUBLE) AS raw
           |    FROM (SELECT v, COUNT(*) AS np,
           |            SUM((1::BIGINT << (60 - m))::HUGEINT) AS psum
           |          FROM $reg GROUP BY 1)))""".stripMargin
      s"""WITH RECURSIVE $textClusterCtes,
         |nd AS (SELECT DISTINCT u AS v FROM edges),
         |h0 AS (
         |  SELECT v, ('0x' || substr(md5('hb:' || CAST(v AS VARCHAR)),
         |    1, 15))::BIGINT AS hv
         |  FROM nd),
         |r0 AS (
         |  SELECT v, hv & 63 AS bucket,
         |    CASE WHEN (hv >> 6) = 0 THEN 55
         |         ELSE 55 - length(bin(hv >> 6)) END AS m
         |  FROM h0),
         |${regStep("r0", "r1")},
         |${regStep("r1", "r2")},
         |${estCte("r2", "e2")},
         |cnt AS (SELECT COUNT(*) AS n_registers FROM r2)
         |SELECT (SELECT COUNT(*) FROM nd) AS n_nodes,
         |  cnt.n_registers, cnt.n_registers AS n_eq_registers,
         |  TRUE AS merge_exact,
         |  (SELECT ROUND(${graft.core.Det.avgDetSql("est", 4)}, 4) FROM e2)
         |    AS avg_est_t2
         |FROM cnt""".stripMargin
    },

    // The per-round survivor sets are each referenced three times (two
    // edge-filter legs + the tally) and chain three levels deep — every
    // round CTE is AS MATERIALIZED or DuckDB's per-reference inlining
    // re-expands the chain exponentially (the q290 HITS oracle lesson).
    "q297_kcore" -> {
      def peel(prevA: String, prevE: String, a: String, e: String) =
        s"""$a AS MATERIALIZED (
           |  SELECT u FROM (
           |    SELECT u, COUNT(*) AS d FROM $prevE GROUP BY 1)
           |  WHERE d >= 2),
           |$e AS MATERIALIZED (
           |  SELECT pe.u, pe.v FROM $prevE pe
           |  JOIN $a x ON x.u = pe.u JOIN $a y ON y.u = pe.v)""".stripMargin
      def row(r: Int, a: String, e: String, prevA: String) =
        s"""SELECT CAST($r AS BIGINT) AS round,
           |  (SELECT COUNT(*) FROM $a) AS n_alive,
           |  (SELECT COUNT(*) FROM $e) AS n_dir_edges,
           |  CAST((SELECT COUNT(*) FROM $prevA)
           |    - (SELECT COUNT(*) FROM $a) AS BIGINT) AS n_removed"""
          .stripMargin
      s"""WITH RECURSIVE $textClusterCtes,
         |e0 AS MATERIALIZED (SELECT u, v FROM edges),
         |a0 AS MATERIALIZED (SELECT DISTINCT u FROM e0),
         |${peel("a0", "e0", "a1", "e1")},
         |${peel("a1", "e1", "a2", "e2")},
         |${peel("a2", "e2", "a3", "e3")}
         |${row(0, "a0", "e0", "a0")}
         |UNION ALL ${row(1, "a1", "e1", "a0")}
         |UNION ALL ${row(2, "a2", "e2", "a1")}
         |UNION ALL ${row(3, "a3", "e3", "a2")}""".stripMargin
    },

    "q298_texttiling" ->
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |tok AS (
         |  SELECT doc_id, (i - 1) // 20 AS b, w[i] AS word
         |  FROM wr, unnest(range(1, len(w) + 1)) AS t(i)),
         |cnt AS (
         |  SELECT doc_id, b, word, COUNT(*) AS c FROM tok GROUP BY 1, 2, 3),
         |nrm AS (
         |  SELECT doc_id, b, CAST(SUM(c * c) AS BIGINT) AS n2
         |  FROM cnt GROUP BY 1, 2),
         |dt AS (
         |  SELECT a.doc_id, a.b, CAST(SUM(a.c * bb.c) AS BIGINT) AS dot
         |  FROM cnt a JOIN cnt bb ON bb.doc_id = a.doc_id
         |    AND bb.b = a.b + 1 AND bb.word = a.word
         |  GROUP BY 1, 2),
         |gap AS (
         |  SELECT na.doc_id,
         |    ROUND(COALESCE(dot, 0)::DOUBLE
         |      / sqrt(na.n2::DOUBLE * nb.n2::DOUBLE), 6) AS cs
         |  FROM nrm na JOIN nrm nb ON nb.doc_id = na.doc_id
         |    AND nb.b = na.b + 1
         |  LEFT JOIN dt ON dt.doc_id = na.doc_id AND dt.b = na.b),
         |pd AS (
         |  SELECT doc_id, COUNT(*) AS n_gaps,
         |    ${graft.core.Det.avgDetSql("cs", 6)} AS avg_cohesion,
         |    CAST(SUM(CASE WHEN cs < 0.15::DOUBLE THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_boundaries
         |  FROM gap GROUP BY 1),
         |nb2 AS (
         |  SELECT doc_id, CAST(MAX(b) + 1 AS BIGINT) AS n_blocks
         |  FROM cnt GROUP BY 1)
         |SELECT d.doc_id, COALESCE(n_blocks, 0) AS n_blocks,
         |  COALESCE(n_gaps, 0) AS n_gaps, avg_cohesion,
         |  COALESCE(n_boundaries, 0) AS n_boundaries
         |FROM documents d LEFT JOIN nb2 USING (doc_id)
         |LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q299_substring_dup" -> {
      val gram = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH wr AS (SELECT source, doc_id, $WORDS AS w FROM documents),
         |tok AS (
         |  SELECT source, doc_id, COUNT(*) AS nt
         |  FROM (SELECT source, doc_id, unnest(w) FROM wr) GROUP BY 1, 2),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos, md5($gram) AS gk
         |  FROM wr, unnest(range(1, len(w) - 6)) AS t(i)),
         |dup AS (SELECT gk FROM g GROUP BY 1 HAVING COUNT(*) >= 2),
         |f AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gk)),
         |m AS (
         |  SELECT doc_id, pos,
         |    MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM f),
         |sid AS (
         |  SELECT doc_id, pos,
         |    CAST(SUM(CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0
         |      END) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sp
         |  FROM m),
         |spans AS (
         |  SELECT doc_id, sp, MIN(pos) AS s0, MAX(pos + 8) AS e0
         |  FROM sid GROUP BY 1, 2),
         |pd AS (
         |  SELECT doc_id, CAST(SUM(e0 - s0) AS BIGINT) AS dup_t
         |  FROM spans GROUP BY 1)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN COALESCE(dup_t, 0) > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_docs_dup,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(COALESCE(dup_t, 0)) AS BIGINT) AS n_dup_tokens,
         |  CAST(SUM(COALESCE(dup_t, 0)) AS BIGINT)::DOUBLE
         |    / CAST(SUM(nt) AS BIGINT)::DOUBLE AS dup_token_frac
         |FROM tok LEFT JOIN pd USING (doc_id) GROUP BY 1""".stripMargin
    },

    // The oracle mirrors the shard → merge arithmetic (not just the
    // direct census) so the BIGINT count grain and the full-outer
    // parity columns are computed the same way on both engines; the
    // parquet round-trip itself is the Spark-side subject under test.
    "q300_substr_census_persist" -> {
      val gram = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |g AS (
         |  SELECT doc_id, md5($gram) AS gk
         |  FROM wr, unnest(range(1, len(w) - 6)) AS t(i)),
         |sc AS (
         |  SELECT doc_id % 4 AS shard, gk, COUNT(*) AS c
         |  FROM g GROUP BY 1, 2),
         |m AS (SELECT gk, CAST(SUM(c) AS BIGINT) AS cm FROM sc GROUP BY 1),
         |d AS (SELECT gk, COUNT(*) AS cd FROM g GROUP BY 1),
         |cmp AS (
         |  SELECT COUNT(*) AS n_keys,
         |    CAST(SUM(CASE WHEN cm >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup_keys_merged,
         |    CAST(SUM(CASE WHEN cd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup_keys_direct,
         |    CAST(SUM(CASE WHEN cm IS NOT DISTINCT FROM cd THEN 0 ELSE 1
         |      END) AS BIGINT) AS nmis
         |  FROM m FULL JOIN d USING (gk)),
         |dd AS (
         |  SELECT COUNT(DISTINCT doc_id) AS n_docs_dup
         |  FROM g WHERE gk IN (SELECT gk FROM m WHERE cm >= 2)),
         |ns AS (SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards
         |       FROM sc)
         |SELECT n_shards, n_keys, n_dup_keys_merged, n_dup_keys_direct,
         |  nmis = 0 AS merge_exact, n_docs_dup
         |FROM cmp, dd, ns""".stripMargin
    },

    "q301_intradoc_dupgrams" -> {
      val gram = (0 until 5).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH wr AS (SELECT source, doc_id, $WORDS AS w FROM documents),
         |tok AS (
         |  SELECT source, doc_id, COUNT(*) AS nt
         |  FROM (SELECT source, doc_id, unnest(w) FROM wr) GROUP BY 1, 2),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos, md5($gram) AS gk
         |  FROM wr, unnest(range(1, len(w) - 3)) AS t(i)),
         |f AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      COUNT(*) OVER (PARTITION BY doc_id, gk) AS c FROM g)
         |  WHERE c >= 2),
         |m AS (
         |  SELECT doc_id, pos,
         |    MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM f),
         |sid AS (
         |  SELECT doc_id, pos,
         |    CAST(SUM(CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0
         |      END) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sp
         |  FROM m),
         |spans AS (
         |  SELECT doc_id, sp, MIN(pos) AS s0, MAX(pos + 5) AS e0
         |  FROM sid GROUP BY 1, 2),
         |pd AS (
         |  SELECT doc_id, CAST(SUM(e0 - s0) AS BIGINT) AS dup_t
         |  FROM spans GROUP BY 1)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN COALESCE(dup_t, 0) * 5 > nt THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_docs_flagged,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(COALESCE(dup_t, 0)) AS BIGINT) AS n_dup_tokens,
         |  CAST(SUM(COALESCE(dup_t, 0)) AS BIGINT)::DOUBLE
         |    / CAST(SUM(nt) AS BIGINT)::DOUBLE AS dup_token_frac
         |FROM tok LEFT JOIN pd USING (doc_id) GROUP BY 1""".stripMargin
    },

    "q302_sq8_recall" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |exact AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ROUND(${dot("q.embedding", "c.embedding")} / sqrt(q.n2 * c.n2), 6) DESC,
         |        c.vec_id) AS rnk
         |    FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
         |  WHERE rnk <= 5),
         |c AS (
         |  SELECT vec_id, i.i AS i, CAST(embedding[i.i] AS DOUBLE) AS x
         |  FROM embeddings, unnest(range(1, 65)) AS i(i)),
         |r AS (
         |  SELECT i, MIN(x) AS mn, (MAX(x) - MIN(x)) / 255.0 AS sc
         |  FROM c GROUP BY 1),
         |dq AS (
         |  SELECT vec_id, list(CASE WHEN sc = 0 THEN mn
         |    ELSE mn + LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
         |      FLOOR((x - mn) / sc + 0.5))) * sc END ORDER BY i) AS e
         |  FROM c JOIN r USING (i) GROUP BY 1),
         |dn AS (SELECT vec_id, e, ${dot("e", "e")} AS n2 FROM dq),
         |approx AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ROUND(${dot("q.e", "c.e")} / sqrt(q.n2 * c.n2), 6) DESC,
         |        c.vec_id) AS rnk
         |    FROM dn q JOIN dn c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
         |  WHERE rnk <= 5)
         |SELECT e.query_id, COUNT(*) AS n_exact,
         |  CAST(SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  ROUND(CAST(SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
         |    / COUNT(*), 6) AS recall
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.cand_id = a.cand_id
         |GROUP BY 1""".stripMargin,

    "q303_source_gram_leakage" -> {
      val gram = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH wr AS (SELECT source, doc_id, $WORDS AS w FROM documents),
         |g AS (
         |  SELECT DISTINCT source, md5($gram) AS gk
         |  FROM wr, unnest(range(1, len(w) - 6)) AS t(i)),
         |t AS (SELECT source, COUNT(*) AS n FROM g GROUP BY 1),
         |p AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    COUNT(*) AS n_shared_grams
         |  FROM g a JOIN g b ON a.gk = b.gk AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, n_shared_grams,
         |  ta.n AS n_grams_a, tb.n AS n_grams_b,
         |  n_shared_grams::DOUBLE / LEAST(ta.n, tb.n)::DOUBLE
         |    AS containment,
         |  n_shared_grams::DOUBLE / (ta.n + tb.n - n_shared_grams)::DOUBLE
         |    AS jaccard
         |FROM p JOIN t ta ON ta.source = p.source_a
         |       JOIN t tb ON tb.source = p.source_b""".stripMargin
    },

    "q305_ivf_cell_drift" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |o AS (SELECT * FROM n WHERE vec_id % 2 = 0),
         |nw AS (SELECT * FROM n WHERE vec_id % 2 = 1),
         |cents AS (
         |  SELECT cent_id, c_emb, c_n2 FROM (
         |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
         |      COUNT(*) OVER () AS ccnt
         |    FROM o)
         |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
         |lst AS (SELECT COUNT(*) AS l FROM cents),
         |ao AS (
         |  SELECT cent_id AS cell, COUNT(*) AS n_old FROM (
         |    SELECT o.vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY o.vec_id ORDER BY
         |        ${dot("o.embedding", "cents.c_emb")} / sqrt(o.n2 * cents.c_n2) DESC,
         |        cent_id) AS rn
         |    FROM o CROSS JOIN cents)
         |  WHERE rn = 1 GROUP BY 1),
         |an AS (
         |  SELECT cent_id AS cell, COUNT(*) AS n_new FROM (
         |    SELECT nw.vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY nw.vec_id ORDER BY
         |        ${dot("nw.embedding", "cents.c_emb")} / sqrt(nw.n2 * cents.c_n2) DESC,
         |        cent_id) AS rn
         |    FROM nw CROSS JOIN cents)
         |  WHERE rn = 1 GROUP BY 1),
         |byc AS (
         |  SELECT cent_id AS cell, COALESCE(n_old, 0) AS n_old,
         |    COALESCE(n_new, 0) AS n_new,
         |    COALESCE(n_old, 0) + COALESCE(n_new, 0) AS n_total
         |  FROM cents LEFT JOIN ao ON ao.cell = cents.cent_id
         |             LEFT JOIN an ON an.cell = cents.cent_id),
         |tot AS (SELECT CAST(SUM(n_total) AS BIGINT) AS nn FROM byc)
         |SELECT cell, n_old, n_new, n_total,
         |  CAST(CAST(CAST(n_total AS HUGEINT) * l AS VARCHAR) AS DOUBLE)
         |    / nn::DOUBLE AS load_factor,
         |  CAST(n_total AS HUGEINT) * l > CAST(nn AS HUGEINT) * 2
         |    AS needs_split
         |FROM byc, tot, lst""".stripMargin,

    "q306_centroid_drift" ->
      s"""WITH s AS (
         |  SELECT label, vec_id % 2 AS b, i.i AS d,
         |    CAST(FLOOR(CAST(embedding[i.i] AS DOUBLE) * 16777216 + 0.5)
         |      AS BIGINT) AS sv
         |  FROM embeddings, unnest(range(1, 65)) AS i(i)),
         |g AS (
         |  SELECT label, b, d, SUM(sv) AS sm, COUNT(*) AS c
         |  FROM s GROUP BY 1, 2, 3),
         |j AS (
         |  SELECT o.label, o.sm AS so, n.sm AS sn, o.c AS co, n.c AS cn
         |  FROM g o JOIN g n ON o.label = n.label AND o.d = n.d
         |  WHERE o.b = 0 AND n.b = 1),
         |a AS (
         |  SELECT label, MAX(co) AS n_old, MAX(cn) AS n_new,
         |    SUM(so * sn) AS xy, SUM(so * so) AS xx, SUM(sn * sn) AS yy
         |  FROM j GROUP BY 1)
         |SELECT label, n_old, n_new,
         |  CASE WHEN xx > 0 AND yy > 0 THEN
         |    CAST(CAST(xy AS VARCHAR) AS DOUBLE) /
         |      sqrt(CAST(CAST(xx AS VARCHAR) AS DOUBLE)
         |        * CAST(CAST(yy AS VARCHAR) AS DOUBLE)) END AS cos_centroid,
         |  1.0::DOUBLE - (CASE WHEN xx > 0 AND yy > 0 THEN
         |    CAST(CAST(xy AS VARCHAR) AS DOUBLE) /
         |      sqrt(CAST(CAST(xx AS VARCHAR) AS DOUBLE)
         |        * CAST(CAST(yy AS VARCHAR) AS DOUBLE)) END) AS drift
         |FROM a""".stripMargin,

    "q307_substr_pairs" -> {
      val gram = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH wr AS (SELECT doc_id, $WORDS AS w FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, md5($gram) AS gk
         |  FROM wr, unnest(range(1, len(w) - 6)) AS t(i)),
         |rare AS (
         |  SELECT gk FROM g GROUP BY 1
         |  HAVING COUNT(*) >= 2 AND COUNT(*) <= 8),
         |h AS (SELECT g.doc_id, g.gk FROM g JOIN rare USING (gk))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  COUNT(*) AS n_shared_grams
         |FROM h a JOIN h b ON a.gk = b.gk AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin
    },

    "q308_source_churn" -> {
      val a = Dedup.HASH_A.mkString("[", ", ", "]")
      val b = Dedup.HASH_B.mkString("[", ", ", "]")
      s"""WITH sh AS (
         |  SELECT doc_id, source, unnest(${shinglesSql(3)}) AS shingle
         |  FROM (SELECT doc_id, source, $WORDS AS w FROM documents)),
         |h AS (
         |  SELECT ('0x' || substr(md5('churn1' || CAST(doc_id AS VARCHAR)),
         |      1, 8))::BIGINT % 2 AS hb2, source,
         |    ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hb
         |  FROM sh),
         |sig AS (
         |  SELECT hb2, source, j,
         |    MIN((($a)[j+1] * hb + ($b)[j+1]) % ${Dedup.MINHASH_P}) AS mh
         |  FROM h, unnest(range(0, 8)) AS t(j) GROUP BY 1, 2, 3)
         |SELECT o.source,
         |  CAST(COUNT(*) FILTER (WHERE o.mh = n.mh) AS BIGINT) AS n_eq,
         |  ROUND((COUNT(*) FILTER (WHERE o.mh = n.mh))::DOUBLE / 8, 6)
         |    AS est_jaccard,
         |  ROUND(1.0::DOUBLE
         |    - (COUNT(*) FILTER (WHERE o.mh = n.mh))::DOUBLE / 8, 6)
         |    AS est_churn
         |FROM sig o JOIN sig n ON o.source = n.source AND o.j = n.j
         |WHERE o.hb2 = 0 AND n.hb2 = 1
         |GROUP BY 1""".stripMargin
    },

    "q309_lm_drift" ->
      s"""WITH wr AS (
         |  SELECT doc_id, source,
         |    ('0x' || substr(md5('churn1' || CAST(doc_id AS VARCHAR)),
         |      1, 8))::BIGINT % 2 AS hb2, $WORDS AS w
         |  FROM documents),
         |b2t AS (
         |  SELECT bg[1] AS w1, bg[2] AS w2
         |  FROM (SELECT unnest(list_transform(
         |          range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
         |        FROM wr WHERE len(w) >= 2 AND hb2 = 0)),
         |counts AS (SELECT w1, w2, COUNT(*) AS c12 FROM b2t GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         |          COUNT(*) AS t1 FROM counts GROUP BY 1),
         |cont AS (SELECT w2, COUNT(*) AS n2 FROM counts GROUP BY 1),
         |nb AS (SELECT COUNT(*) AS nbt FROM counts),
         |b2s AS (
         |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
         |        FROM wr WHERE len(w) >= 2 AND hb2 = 1)),
         |terms AS (
         |  SELECT doc_id, c12, ROUND(-ln(
         |    (c12 - 0.75::DOUBLE) / c1 +
         |      ((0.75::DOUBLE * t1) / c1) * (n2::DOUBLE / nbt)), 6) AS nll
         |  FROM b2s LEFT JOIN counts USING (w1, w2) LEFT JOIN ctx USING (w1)
         |  LEFT JOIN cont USING (w2) CROSS JOIN nb),
         |pd AS (
         |  SELECT doc_id, COUNT(*) AS n_bigrams,
         |    CAST(COUNT(*) FILTER (WHERE c12 IS NULL) AS BIGINT) AS n_unseen,
         |    CASE WHEN COUNT(nll) > 0 THEN
         |      ROUND(${graft.core.Det.sumDetSql("nll", 6)} / COUNT(nll), 6)
         |    END AS avg_nll_kn,
         |    CAST(COUNT(nll) AS BIGINT) AS n_scored
         |  FROM terms GROUP BY 1)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(COALESCE(n_bigrams, 0)) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(COALESCE(n_unseen, 0)) AS BIGINT) AS n_unseen,
         |  CASE WHEN SUM(COALESCE(n_bigrams, 0)) > 0 THEN
         |    CAST(SUM(COALESCE(n_unseen, 0)) AS BIGINT)::DOUBLE
         |      / CAST(SUM(COALESCE(n_bigrams, 0)) AS BIGINT)::DOUBLE
         |  END AS unseen_frac,
         |  CASE WHEN COUNT(avg_nll_kn) > 0 THEN
         |    ROUND(${graft.core.Det.sumDetSql("avg_nll_kn", 6)}
         |      / COUNT(avg_nll_kn), 6)
         |  END AS mean_doc_nll
         |FROM (SELECT doc_id, source FROM wr WHERE hb2 = 1) d
         |LEFT JOIN pd USING (doc_id)
         |GROUP BY 1""".stripMargin,

    "q310_local_dup_venn" -> {
      val gram = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH g AS (
         |  SELECT doc_id, lower(text) AS t, length(lower(text)) - 7 AS m
         |  FROM documents WHERE length(lower(text)) >= 11),
         |pk AS (
         |  SELECT doc_id, m, list_transform(range(0, m), i ->
         |    ('0x' || substr(md5(substr(t, CAST(i + 1 AS INT), 8)), 1, 8))::BIGINT
         |      * 1048576 + (1048575 - i)) AS p
         |  FROM g),
         |fp AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, m - 3),
         |    j -> list_aggregate(p[CAST(j + 1 AS INT):CAST(j + 4 AS INT)],
         |      'min')))) AS v
         |  FROM pk),
         |f AS (SELECT DISTINCT doc_id, v // 1048576 AS h FROM fp),
         |dfh AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM f GROUP BY 1),
         |r AS (SELECT f.doc_id, f.h FROM f JOIN dfh USING (h) WHERE df <= 10),
         |wd AS (
         |  SELECT DISTINCT a.doc_id FROM r a
         |  JOIN r b ON a.h = b.h AND a.doc_id <> b.doc_id),
         |wr2 AS (SELECT doc_id, $WORDS AS w FROM documents),
         |gg AS (
         |  SELECT DISTINCT doc_id, md5($gram) AS gk
         |  FROM wr2, unnest(range(1, len(w) - 6)) AS t(i)),
         |rare AS (
         |  SELECT gk FROM gg GROUP BY 1
         |  HAVING COUNT(*) >= 2 AND COUNT(*) <= 8),
         |hh AS (SELECT gg.doc_id, gg.gk FROM gg JOIN rare USING (gk)),
         |sp AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM hh a JOIN hh b ON a.gk = b.gk AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |sd AS (SELECT id_a AS doc_id FROM sp UNION SELECT id_b FROM sp)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN wd.doc_id IS NOT NULL AND sd.doc_id IS NOT
         |    NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |  CAST(SUM(CASE WHEN wd.doc_id IS NOT NULL AND sd.doc_id IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_win_only,
         |  CAST(SUM(CASE WHEN wd.doc_id IS NULL AND sd.doc_id IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_substr_only,
         |  CAST(SUM(CASE WHEN wd.doc_id IS NULL AND sd.doc_id IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
         |FROM documents d
         |LEFT JOIN wd ON wd.doc_id = d.doc_id
         |LEFT JOIN sd ON sd.doc_id = d.doc_id
         |GROUP BY 1""".stripMargin
    },

    "q311_hubness" ->
      s"""WITH $knnGraphCtes,
         |kcn AS (
         |  SELECT nbr_id, CAST(COUNT(*) AS BIGINT) AS kc
         |  FROM rk WHERE nbr_rank <= 3 GROUP BY 1),
         |kocc AS (
         |  SELECT e.vec_id, COALESCE(kcn.kc, 0) AS kc
         |  FROM embeddings e LEFT JOIN kcn ON kcn.nbr_id = e.vec_id),
         |a AS (
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN kc = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_antihubs,
         |    CAST(SUM(CASE WHEN kc > 6 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_hubs,
         |    MAX(kc) AS max_kocc,
         |    SUM(CAST(kc AS HUGEINT)) AS s1,
         |    SUM(CAST(kc AS HUGEINT) * kc) AS s2,
         |    SUM(CAST(kc AS HUGEINT) * kc * kc) AS s3
         |  FROM kocc),
         |b AS (
         |  SELECT n, n_antihubs, n_hubs, max_kocc, s1,
         |    n * s2 - s1 * s1 AS v2,
         |    n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS v3
         |  FROM a)
         |SELECT n AS n_nodes, n_antihubs, n_hubs, max_kocc,
         |  CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
         |    AS mean_kocc,
         |  CASE WHEN v2 > 0 THEN
         |    (CAST(CAST(v3 AS VARCHAR) AS DOUBLE)
         |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         |    / ((CAST(CAST(v2 AS VARCHAR) AS DOUBLE)
         |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         |       * sqrt(CAST(CAST(v2 AS VARCHAR) AS DOUBLE)
         |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |  END AS skew_kocc
         |FROM b""".stripMargin,

    "q312_ivf_boundary" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |cents AS (
         |  SELECT cent_id, c_emb, c_n2 FROM (
         |    SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS crn,
         |      COUNT(*) OVER () AS ccnt
         |    FROM n)
         |  WHERE crn <= CAST(ceil(sqrt(ccnt::DOUBLE)) AS BIGINT)),
         |ranked AS (
         |  SELECT n.vec_id, cent_id,
         |    ${dot("n.embedding", "cents.c_emb")} / sqrt(n.n2 * cents.c_n2)
         |      AS cc,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |      ${dot("n.embedding", "cents.c_emb")} / sqrt(n.n2 * cents.c_n2) DESC,
         |      cent_id) AS rn
         |  FROM n CROSS JOIN cents),
         |t AS (
         |  SELECT vec_id,
         |    MAX(CASE WHEN rn = 1 THEN cent_id END) AS cell,
         |    MAX(CASE WHEN rn = 1 THEN cc END) AS c1,
         |    MAX(CASE WHEN rn = 2 THEN cc END) AS c2
         |  FROM ranked WHERE rn <= 2 GROUP BY 1)
         |SELECT cell, COUNT(*) AS n_vecs,
         |  CAST(SUM(CASE WHEN c1 - c2 < 0.05::DOUBLE THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_boundary,
         |  CAST(SUM(CASE WHEN c1 - c2 < 0.05::DOUBLE THEN 1 ELSE 0 END)
         |    AS BIGINT)::DOUBLE / COUNT(*) AS boundary_frac
         |FROM t GROUP BY 1""".stripMargin,

    "q313_ivf_cell_split" ->
      s"""WITH ${ivfSplitCtes(6, 5)},
         |rows_ AS (
         |  SELECT b.cell, CAST(0 AS BIGINT) AS sub, b.n_total AS n_vecs,
         |    FALSE AS was_split
         |  FROM byc b LEFT JOIN flag f ON f.cell = b.cell
         |  WHERE f.cell IS NULL
         |  UNION ALL
         |  SELECT f.cell, t.j AS sub, COUNT(a2.vec_id) AS n_vecs,
         |    TRUE AS was_split
         |  FROM flag f
         |  CROSS JOIN (SELECT CAST(0 AS BIGINT) AS j
         |              UNION ALL SELECT CAST(1 AS BIGINT)) t
         |  LEFT JOIN asg2 a2 ON a2.cell = f.cell AND a2.sub = t.j
         |  GROUP BY 1, 2)
         |SELECT cell, sub, n_vecs, was_split,
         |  CAST(CAST(CAST(n_vecs AS HUGEINT) * (l + nsplit) AS VARCHAR)
         |    AS DOUBLE) / nn::DOUBLE AS load_factor
         |FROM rows_, lst, tot, nf""".stripMargin,

    "q314_ivf_split_recall" ->
      s"""WITH ${ivfSplitCtes(6, 5)},
         |surv AS (
         |  SELECT cents.cent_id AS cell, CAST(0 AS BIGINT) AS sub, c_emb
         |  FROM cents LEFT JOIN flag f ON f.cell = cents.cent_id
         |  WHERE f.cell IS NULL),
         |survd AS (
         |  SELECT cell, sub, i.i AS d,
         |    CAST(CAST(FLOOR(CAST(c_emb[i.i] AS DOUBLE) * 16777216 + 0.5)
         |      AS BIGINT) AS HUGEINT) AS sv
         |  FROM surv, unnest(range(1, 65)) AS i(i)),
         |ncd AS (SELECT * FROM survd
         |  UNION ALL SELECT cell, j AS sub, d, sv FROM csum),
         |ncn AS (SELECT cell, sub, SUM(sv * sv) AS cn2 FROM ncd
         |  GROUP BY 1, 2),
         |qv AS (
         |  SELECT vec_id AS query_id,
         |    list_transform(range(1, 65), i -> CAST(FLOOR(
         |      CAST(embedding[i] AS DOUBLE) * 16777216 + 0.5) AS BIGINT))
         |      AS mx
         |  FROM embeddings WHERE vec_id < 20),
         |qv2 AS (SELECT query_id, mx,
         |    list_reduce(list_transform(range(1, 65), i -> mx[i] * mx[i]),
         |      (x, y) -> x + y) AS mn2 FROM qv),
         |pd AS (
         |  SELECT q.query_id, c.cell, c.sub,
         |    SUM(CAST(q.mx[c.d] AS HUGEINT) * c.sv) AS dt
         |  FROM qv2 q CROSS JOIN ncd c GROUP BY 1, 2, 3),
         |pc AS (SELECT query_id, cell, sub FROM (
         |    SELECT p.query_id, p.cell, p.sub,
         |      ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
         |        CAST(CAST(p.dt AS VARCHAR) AS DOUBLE) /
         |          sqrt(q.mn2::DOUBLE * CAST(CAST(n2.cn2 AS VARCHAR)
         |            AS DOUBLE)) DESC,
         |        p.cell, p.sub) AS pr
         |    FROM pd p JOIN ncn n2 ON n2.cell = p.cell AND n2.sub = p.sub
         |              JOIN qv2 q ON q.query_id = p.query_id)
         |  WHERE pr <= 5),
         |cand AS (
         |  SELECT DISTINCT pc.query_id, a2.vec_id AS cand_id
         |  FROM pc JOIN asg2 a2 ON a2.cell = pc.cell AND a2.sub = pc.sub
         |  WHERE a2.vec_id <> pc.query_id),
         |approx AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT cand.query_id, cand.cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.query_id
         |        ORDER BY ROUND(${dot("q.embedding", "c.embedding")}
         |          / sqrt(q.n2 * c.n2), 6) DESC, cand.cand_id) AS rnk
         |    FROM cand JOIN n q ON cand.query_id = q.vec_id
         |              JOIN n c ON cand.cand_id = c.vec_id)
         |  WHERE rnk <= 5),
         |exact AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ROUND(${dot("q.embedding", "c.embedding")}
         |          / sqrt(q.n2 * c.n2), 6) DESC, c.vec_id) AS rnk
         |    FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
         |  WHERE rnk <= 5)
         |SELECT e.query_id, COUNT(*) AS n_exact,
         |  CAST(SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hits,
         |  ROUND(CAST(SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0
         |    END) AS BIGINT)::DOUBLE / COUNT(*), 6) AS recall
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.cand_id = a.cand_id
         |GROUP BY 1""".stripMargin,

    "q315_dup_span_hist" -> {
      val gram = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH wr AS (SELECT source, doc_id, $WORDS AS w FROM documents),
         |g AS (
         |  SELECT source, doc_id, i - 1 AS pos, md5($gram) AS gk
         |  FROM wr, unnest(range(1, len(w) - 6)) AS t(i)),
         |dup AS (SELECT gk FROM g GROUP BY 1 HAVING COUNT(*) >= 2),
         |f AS (SELECT g.source, g.doc_id, g.pos FROM g JOIN dup USING (gk)),
         |m AS (
         |  SELECT source, doc_id, pos,
         |    MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM f),
         |sid AS (
         |  SELECT source, doc_id, pos,
         |    CAST(SUM(CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0
         |      END) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sp
         |  FROM m),
         |spans AS (
         |  SELECT MAX(source) AS source, doc_id,
         |    CAST(MAX(pos + 8) - MIN(pos) AS BIGINT) AS len
         |  FROM sid GROUP BY doc_id, sp),
         |sl AS (
         |  SELECT source, doc_id, len,
         |    CAST(length(bin(len)) AS BIGINT) AS bucket
         |  FROM spans),
         |h AS (
         |  SELECT source, bucket, COUNT(*) AS n_spans,
         |    CAST(SUM(len) AS BIGINT) AS span_tokens,
         |    MAX(len) AS max_span_len
         |  FROM sl GROUP BY 1, 2),
         |dl AS (
         |  SELECT source, bucket, COUNT(*) AS n_docs_longest FROM (
         |    SELECT source, doc_id,
         |      CAST(length(bin(MAX(len))) AS BIGINT) AS bucket
         |    FROM sl GROUP BY 1, 2)
         |  GROUP BY 1, 2)
         |SELECT h.source, h.bucket, n_spans, span_tokens, max_span_len,
         |  COALESCE(n_docs_longest, CAST(0 AS BIGINT)) AS n_docs_longest
         |FROM h LEFT JOIN dl USING (source, bucket)""".stripMargin
    }
  )

  /** Shared CTE chain for q191/q192: the fixed-point covariance Gramian
    * plus 9 power iterations unrolled as list_reduce CTEs — every fold
    * index-ascending with first-element seed, the exact order of
    * [[graft.llm.EmbeddingOps]]'s driver loops, so the doubles match
    * bit-for-bit. */
  private lazy val topPcCtes: String = {
    val QQ = "16777216.0 * 16777216.0"
    val iter = (k: Int) =>
      s"""w$k AS (
         |  SELECT list_transform(range(1, 65), i ->
         |    list_reduce(list_transform(range(1, 65), j -> m[i][j] * v[j]),
         |      (a, b) -> a + b)) AS w
         |  FROM v${k - 1}, cm),
         |v$k AS (
         |  SELECT list_transform(w, x -> x / lam) AS v, lam FROM (
         |    SELECT w, list_reduce(list_transform(w, x -> abs(x)),
         |      (a, b) -> GREATEST(a, b)) AS lam FROM w$k))""".stripMargin
    s"""s AS (
       |  SELECT list_transform(embedding, x ->
       |    CAST(FLOOR(CAST(x AS DOUBLE) * 16777216 + 0.5) AS BIGINT)) AS s
       |  FROM embeddings),
       |cells AS (
       |  SELECT ii.i AS i, jj.j AS j, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(s.s[ii.i] * s.s[jj.j] AS DECIMAL(38,0)))
       |      AS DECIMAL(38,0)) AS ss
       |  FROM s, unnest(range(1, 65)) AS ii(i), unnest(range(1, 65)) AS jj(j)
       |  GROUP BY 1, 2),
       |sums AS (
       |  SELECT ii.i AS k, CAST(SUM(CAST(s.s[ii.i] AS DECIMAL(38,0)))
       |    AS DECIMAL(38,0)) AS sk
       |  FROM s, unnest(range(1, 65)) AS ii(i) GROUP BY 1),
       |cov AS (
       |  SELECT i, j,
       |    CAST(CAST(n * ss - a.sk * b.sk AS VARCHAR) AS DOUBLE) /
       |      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) * ($QQ)) AS cov
       |  FROM cells JOIN sums a ON a.k = i JOIN sums b ON b.k = j),
       |cm AS (
       |  SELECT list(l ORDER BY i) AS m FROM (
       |    SELECT i, list(cov ORDER BY j) AS l FROM cov GROUP BY i)),
       |v0 AS (SELECT list_transform(range(1, 65), x -> 1.0::DOUBLE) AS v FROM cm),
       |${(1 to 9).map(iter).mkString(",\n")},
       |tr AS (
       |  SELECT list_reduce(list_transform(range(1, 65), d -> m[d][d]),
       |    (a, b) -> a + b) AS trace
       |  FROM cm)""".stripMargin
  }

  private lazy val topPcSql: String =
    s"""WITH $topPcCtes
       |SELECT CAST(i.i - 1 AS INT) AS pos, v[i.i] AS loading,
       |  lam AS eigenvalue, lam / trace AS explained_frac
       |FROM v9, tr, unnest(range(1, 65)) AS i(i)""".stripMargin

  /** q192's oracle: All-but-the-Top over the q191 chain — unit top
    * direction, string-routed exact means, and the same distributed-dot
    * identities (uᵀ(x−μ) = uᵀx − uᵀμ; ‖x−μ‖² = xᵀx − 2xᵀμ + μᵀμ) in the
    * same parenthesization as the Spark expression tree. */
  private lazy val abttSql: String =
    s"""WITH $topPcCtes,
       |unit AS (
       |  SELECT list_transform(v, x -> x / l2) AS u FROM (
       |    SELECT v, sqrt(list_reduce(list_transform(v, x -> x * x),
       |      (a, b) -> a + b)) AS l2 FROM v9)),
       |nn AS (SELECT COUNT(*) AS n FROM embeddings),
       |mu AS (
       |  SELECT list(CAST(CAST(sk AS VARCHAR) AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * 16777216.0) ORDER BY k) AS mu
       |  FROM sums, nn),
       |consts AS (
       |  SELECT
       |    list_reduce(list_transform(range(1, 65), k -> mu[k] * u[k]),
       |      (a, b) -> a + b) AS c0,
       |    list_reduce(list_transform(range(1, 65), k -> mu[k] * mu[k]),
       |      (a, b) -> a + b) AS cmm
       |  FROM mu, unit),
       |rowdots AS (
       |  SELECT vec_id,
       |    ${dot("embedding", "embedding")} AS xx,
       |    list_reduce(list_transform(range(1, 65),
       |      k -> CAST(embedding[k] AS DOUBLE) * u[k]), (a, b) -> a + b) AS ux,
       |    list_reduce(list_transform(range(1, 65),
       |      k -> CAST(embedding[k] AS DOUBLE) * mu[k]), (a, b) -> a + b) AS xmu
       |  FROM embeddings, unit, mu)
       |SELECT vec_id, ux - c0 AS pc1_coef,
       |  ((xx - 2.0::DOUBLE * xmu) + cmm) - (ux - c0) * (ux - c0) AS resid_sq
       |FROM rowdots, consts""".stripMargin

  /** q195's oracle: the Gonzalez farthest-point greedy unrolled — round r
    * scores every unchosen vector's MAX cosine against the r−1 chosen
    * rows (the same raw IEEE dot folds) and picks the minimum, ties to
    * the lower id, mirroring [[graft.llm.EmbeddingOps.kCenterCoreset]]'s
    * literal-center map + global min_by pass. */
  private lazy val kCenterSql: String = {
    val round = (r: Int) =>
      s"""sel$r AS (
         |  SELECT x.vec_id, x.embedding, x.n2,
         |    MAX(${dot("x.embedding", "c.embedding")}
         |      / sqrt(x.n2 * c.n2)) AS mc,
         |    CAST($r AS BIGINT) AS sel_rank
         |  FROM n x, ch${r - 1} c
         |  WHERE x.vec_id NOT IN (SELECT vec_id FROM ch${r - 1})
         |  GROUP BY x.vec_id, x.embedding, x.n2
         |  ORDER BY mc, x.vec_id LIMIT 1),
         |ch$r AS (SELECT * FROM ch${r - 1} UNION ALL
         |         SELECT vec_id, embedding, n2, mc, sel_rank FROM sel$r)"""
        .stripMargin
    s"""WITH n AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS n2
       |  FROM embeddings),
       |ch1 AS (
       |  SELECT vec_id, embedding, n2, NULL::DOUBLE AS mc,
       |    CAST(1 AS BIGINT) AS sel_rank
       |  FROM n ORDER BY vec_id LIMIT 1),
       |${(2 to 8).map(round).mkString(",\n")}
       |SELECT sel_rank, vec_id, mc AS max_cos FROM ch8""".stripMargin
  }

  /** Banded sign-bit keys mirroring VectorOps.bandDims(4, 8, 64): one row
    * per (vec_id, band_idx) with the band's 8-bit key. */
  private def bandKeysSql: String =
    (0 until 4).map { j =>
      val key = (0 until 8).map(k =>
        s"CASE WHEN embedding[${(j * 8 + k) * 2 + 1}] > 0 THEN ${1 << k} ELSE 0 END")
        .mkString(" + ")
      s"SELECT vec_id, $j AS bi, $key AS bk FROM embeddings"
    }.mkString("\n  UNION ALL ")
}
