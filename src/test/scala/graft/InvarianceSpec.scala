package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism under re-partitioning: the same query must return
  * byte-identical rows whether the cluster shuffles into 2 or 32
  * partitions — the property that makes results reproducible when
  * the same job runs on a laptop and on 1000 executors. Exercises a
  * codegen agg, the LSH dedup pipeline, the sentence-combining fold,
  * the TopKPerGroup heap operator, and a compiled Cypher aggregate.
  */
class InvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("representative queries are partition-count invariant") {
    val names = Seq(
      // round-6 closers: micro-nat entropy terms, exact-integer Gini
      // ranks, six-moment assortativity sums — all must survive any
      // partitioning byte-identically
      "q_source_entropy", "q_token_gini", "q_assortativity",
      "q1_agg", "q_dedup_minhash", "q_chunk_sentences",
      "q_stratified_sample", "q_cypher_ex7",
      // round-3 additions: span-dedup coverage counts, degree-oriented
      // wedge triangles, the rewrite-rule heap plan, subword fold
      "q_dedup_substring", "q_triangles", "q_topn_auto", "q_tokenize_subword",
      // sketch-merge aggregate, MG candidate pruning, bounded peel,
      // shard addressing, batch-vs-corpus LSH join
      "q_source_minhash", "q_heavy_hitters", "q_kcore",
      "q_shard_export", "q_dedup_incremental",
      // bipartite HITS, seeded pagerank, wedge link prediction,
      // probe-batch lexical top-k, built-in session windows, funnel
      "q_hits", "q_ppr", "q_link_prediction", "q_doc_similarity",
      "q_session_window", "q_funnel",
      // round-4 additions: line-hash boilerplate join, struct-min LPA,
      // centroid-assign + LSH-blocked semdedup, hashed-LM DSIR weights
      "q_dedup_lines", "q_lpa_communities", "q_semdedup", "q_dsir_weights",
      "q_entity_resolution", "q_dedup_temporal",
      // late round-4 additions: greedy MMR selection, hash-driven
      // walks/fanouts, BFS betweenness, BPE merge rounds, the RAG
      // serving composition, integer-grid power iteration
      "q_mmr", "q_walks", "q_neighbor_sample", "q_betweenness",
      "q_bpe_train", "q_rag_context", "q_top_component", "q_dedup_url",
      // round-6 additions: label-filtered heap top-k, broadcast-count
      // PMI, bucket-window histogram, integer-grid TV drift, micro-
      // grid DCG sums, TakeOrdered PRF pool, struct-min purity
      "q_hard_negatives", "q_pmi_cooccur", "q_length_hist",
      "q_drift_report", "q_ndcg", "q_prf_expansion", "q_cluster_purity",
      "q_burst_detect", "q_ql_ranking",
      // late round-6 additions: wedge edge-support, frontier BFS
      // closeness, KMV heap minima, bucketed histogram quantiles,
      // per-lang percentile terciles, grouping-set expand
      "q_edge_support", "q_closeness", "q_kmv_distinct",
      "q_hist_quantiles", "q_perplexity_buckets", "q_grouping_sets",
      // closing round-6 additions: truss peel, broadcast day-join
      // window distinct, k=1 passage heap, verdict rollup, integer-
      // grid Pearson, scaled-long HLL registers, shortestPath BFS
      "q_ktruss_peel", "q_dau_stickiness", "q_passage_rank",
      "q_keep_rate", "q_signal_corr", "q_hll_distinct",
      "q_graph_summary", "q_cypher_sp",
      // user-sequence lag window + integer-ppm transition matrix
      "q_event_transitions",
      // KMV sketch merge: pairwise union/intersection estimates
      "q_kmv_overlap",
      // integer-grid centroid distances + TakeOrdered outliers
      "q_embed_outliers",
      // band-bucket histogram + key-skew profiler
      "q_lsh_bucket_stats", "q_skew_report",
      // heap-ranked first-relevant rank + hits@K
      "q_mrr",
      // provenance rollup of verified pairs + struct-min best copy
      "q_cross_source_dups", "q_best_copy",
      // chunk-hash dedup groups + log2 degree histogram
      "q_chunk_dedup", "q_degree_dist",
      // DF-threshold stopwords + histogram join sizing
      "q_stopword_df", "q_join_size_est",
      // z-ordered layout read-back, Poisson-weight replicate sums
      "q_zorder_scan", "q_bootstrap_ci",
      // round-8 extension: frontier pair counts + HLL register max
      // with delta propagation — both merge-order-free by design
      "q_anf", "q_anf_hll",
      // round-9 additions: the canonical min-pred witness and the
      // lexicographic witness SET must be partition-independent or
      // "canonical" means nothing; fulltext top-k ties break on
      // (score, name, uid); capped twins rank through the heap
      "q_cypher_path", "q_cypher_asp_paths", "q_cypher_fulltext",
      "q_cypher_ex31", "q_dedup_simhash_topk", "q_dedup_embedding_topk",
      // the third capped twin runs the same cappedPartners rank path
      // whose canonical ordering this sweep exists to pin (r9 ADVICE)
      "q_dedup_minhash_topk",
      // round-10 additions: the vector CALL's score-desc/text tiebreak,
      // the concat item's value, and the weighted witness's canonical
      // (cost, pred) chain must not depend on partitioning
      "q_cypher_vector", "q_cypher_ex32", "q_cypher_wpath",
      // full existential subqueries: semi/anti joins must be
      // partition-count-independent like every other plan here
      "q_cypher_ex33",
      // COUNT subqueries: grouped left-outer joins, same requirement
      "q_cypher_ex34",
      // stage-level EXISTS after aggregation; size((pattern)) twin;
      // var-to-var anti-join triangle gate
      "q_cypher_ex35", "q_cypher_ex36", "q_cypher_ex37",
      // rel-var predicate inside the anti-join body; boolean EXISTS item
      "q_cypher_ex38", "q_cypher_ex39",
      // round-11 additions: max-normalized hybrid fusion (per-leg
      // top-ks + ≤2k-row max-fusion), per-hop-filtered var-length
      // expansion, multi-type var-length union, and the interleaved
      // path value (witness + pair-ordered rel tokens) must all be
      // partition-count-independent
      "q_cypher_hybrid", "q_cypher_ex41", "q_cypher_ex42", "q_cypher_ex43",
      // bare-pattern subquery bodies ride the same subquery joins;
      // zero-length hops add a seed-identity union leg
      "q_cypher_ex44", "q_cypher_ex45",
      // ordinary-MATCH path values are pure column concatenations
      "q_cypher_ex46")
    // q_cypher_ex40 (UNION ALL) is deliberately NOT in the
    // sequence-equality sweep: its contract is a MULTISET (no final
    // ORDER BY — the gate sorts rows before hashing), so row order
    // legitimately varies with partitioning; its multiset is pinned
    // below instead.
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Seq[(String, Seq[org.apache.spark.sql.Row])] =
      names.map(n => n -> SparkEntry.queries(n)(spark, TestSpark.sf).collect().toSeq)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val low = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", orig)
      val high = runAll()
      low.zip(high).foreach { case ((n, a), (_, b)) =>
        assert(a == b, s"$n differs between 2 and $orig shuffle partitions")
      }
      // the UNION ALL key's MULTISET is partition-independent even
      // though its row order is not
      def ex40(): Seq[String] =
        SparkEntry.queries("q_cypher_ex40")(spark, TestSpark.sf)
          .collect().map(_.getString(0)).sorted.toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val m2 = ex40()
      spark.conf.set("spark.sql.shuffle.partitions", orig)
      assert(m2 == ex40(),
        "q_cypher_ex40 multiset differs between 2 and default shuffle partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("reliable-checkpoint seam is result-identical to local mode") {
    // Ckpt.barrier (round 12): with spark.graft.checkpoint.reliableDir
    // set, every operator barrier becomes a reliable checkpoint() —
    // the cluster fault-tolerance posture. The seam must not change a
    // single row; exercised on barrier-heavy representatives (an
    // iterative loop, a var-length cypher expansion, a banded dedup).
    val names = Seq("q_pagerank", "q_cypher_ex41", "q_dedup_minhash")
    val local = names.map(n =>
      SparkEntry.queries(n)(spark, TestSpark.sf).collect().toSeq)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Ckpt.ReliableDirConf, dir)
    try {
      val reliable = names.map(n =>
        SparkEntry.queries(n)(spark, TestSpark.sf).collect().toSeq)
      names.lazyZip(local).lazyZip(reliable).foreach { (n, a, b) =>
        assert(a == b, s"$n differs between local and reliable checkpoints")
      }
    } finally {
      spark.conf.unset(Ckpt.ReliableDirConf)
      graft.sources.Catalog.rmTree(new java.io.File(dir))
    }
  }
}
