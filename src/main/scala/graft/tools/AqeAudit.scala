package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off AQE audit (round-10 verdict #7): execute the heavy composite
  * queries at a given SF and report whether the final adaptive plans
  * contain skew-join splits ("skew=true") or nested-loop fallbacks. */
object AqeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q117_ivfpq_rerank", "q119_incremental_dedup",
      "q127_containment", "q22_minhash_pairs", "q69_dedup_clusters",
      "q137_canonical_docs", "q138_cross_source", "q140_ivfpq_persist",
      // round-13 additions with non-trivial join graphs
      "q154_knn_graph", "q155_soft_dedup", "q164_lsh_audit",
      "q159_knn_classify", "q166_bpe_encode", "q168_hll_merge",
      // round-13 verdict #6: the broadcast-threshold Pareto rollup, the
      // 5-table star join, and the dangling-mass PageRank loop
      "q180_revenue_pareto", "q186_star_revenue", "q187_pagerank_dangling",
      // r13 additions with non-trivial join graphs: the staged dedup
      // verdict composite and the personalized PageRank loop
      "q196_dedup_verdict", "q193_ppr",
      // r14 additions: the winnowing pair join, the snapshot full-outer
      // diff, the three-filter kappa join, and the cluster-weighted
      // token rollup
      "q203_winnowing", "q200_corpus_diff", "q208_filter_kappa",
      "q211_effective_tokens",
      // q213–q227 batch: the cluster-rooted split join, the exact
      // contamination-span join, the merged-signature source matrix,
      // the k-anonymity double aggregate, the sign-cell JS pair join,
      // and the two-LM DoReMi composite
      "q216_cluster_split", "q215_contamination_span",
      "q220_source_overlap", "q222_k_anonymity",
      "q225_embedding_divergence", "q227_doremi_weights",
      // q228–q231 batch (r14): the KMV shingle aggregate, the
      // confident-learning joint composite, the Kneser-Ney four-table
      // checkpoint reuse, and the shard-sketch persist + re-merge
      "q228_kmv_cardinality", "q229_confident_joint", "q230_kneser_ney",
      "q231_sketch_shard_merge",
      // q232–q255 batch (r14): the non-trivial join graphs — blocked
      // record linkage rode in earlier; here the theta-sketch pair
      // join, the SNM window chain, the two-LM Moore–Lewis composite,
      // the MMD moment pair join, the silhouette centroid fan-out, the
      // MK pairwise self-join, the KS half-split windows, and the AMS
      // shard persist + re-merge
      "q239_ngram_novelty", "q240_hyperball", "q241_theta_diff",
      "q242_snm_dedup", "q245_moore_lewis", "q246_mmd",
      "q247_silhouette", "q248_mann_kendall", "q250_langid_confusion",
      "q253_ams_shard_merge", "q254_ks_test",
      // q256–q258 batch: the KN model persist + re-score join, the
      // rendezvous double-argmax self-join, and the vocab-bounded
      // collision fan-out
      "q256_lm_persist", "q257_rendezvous", "q258_hash_collisions",
      // q259–q266 batch: the Shapley query fan-out + rank windows, the
      // S-curve pair fan-out, the 4-round LPA join loop, and the
      // Misra–Gries shard/merge window chain
      "q259_knn_shapley", "q260_lsh_params", "q261_label_prop",
      "q264_misra_gries",
      // q267–q271 batch: the TextRank vocab/edge joins + PageRank loop,
      // the adaptive max-coverage anti-join rounds, and the bootstrap
      // replicate fan-out
      "q267_textrank", "q269_max_coverage", "q271_poisson_bootstrap",
      // q272–q277 batch: the phrase argmax + match joins, the two
      // near-dup graph statistics (triangle corners, degree pairs), and
      // the RR vocab-broadcast channel
      "q272_phrase_search", "q273_clustering_coeff", "q274_assortativity",
      "q277_randomized_response",
      // q278–q281 batch: the dedup-keyed token budget, the calibration
      // bin joins
      "q278_chinchilla_budget", "q281_brier_decomposition",
      // q282–q286 batch: the per-user CUPED moment join, the rank-sum
      // windows, the Gramian trace pass, and the 2-NN cell graph
      "q282_cuped", "q283_mann_whitney", "q285_participation_ratio",
      "q286_twonn",
      // q287–q289 batch: the three-round LOF graph joins, the
      // exact-vs-IVF ranking join, and the QL per-doc scorer
      "q287_lof", "q288_ann_ndcg", "q289_query_likelihood",
      // q290–q293 batch: the HITS alternating join loop, the two-method
      // pair-set full outer, the Fightin'-Words vocab joins, and the
      // bigram entropy chain
      "q290_hits", "q291_dedup_venn", "q292_fightin_words",
      "q293_entropy_rate",
      // q294–q298 batch (r15): the theta shard persist + positional
      // re-merge join, the moments shard re-merge, the HyperBall
      // incremental register merge + full-outer compare, the k-core
      // peel loop, and the TextTiling adjacent-block joins
      "q294_theta_persist", "q295_moments_persist",
      "q296_hyperball_persist", "q297_kcore", "q298_texttiling",
      // the gram-keyed duplicate census + semi-join flag-back
      "q299_substring_dup")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.count() // materialize: AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      val skews = "skew=true".r.findAllIn(plan).size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      println(s"[aqe] $n skewSplits=$skews bnlj=$bnlj smj=$smj bhj=$bhj")
    }
    spark.stop()
  }
}
