package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: formatted physical plans of the headline queries,
  * the durable evidence behind SURVEY §5/§6's claims (pushdown, pruned
  * read schemas, broadcast joins, TakeOrdered top-k, custom operator
  * shapes). Usage: runMain graft.PlanDump [sfDir].
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val heads = Seq(
      "q1_agg" -> "filter pushdown + column pruning + codegen agg",
      "q3_join" -> "broadcast dim joins, no fact shuffle",
      "q_mentions" -> "broadcast gazetteer join, one doc_id window shuffle",
      "q_cosine_topk" -> "HOF cosine + TakeOrderedAndProject (no global sort)",
      "q_dedup_minhash" -> "narrow signature fold + id-only LSH band shuffle",
      "q_topk_custom" -> "custom TopKPerGroup partial/final around one exchange",
      "q_cooccur" -> "single-pass pair explosion + map-side-combined count",
      "q_dedup_simhash64" -> "pigeonhole banded equi-join on 8-byte sigs — no cartesian",
      "q_cosine_topk_filtered" -> "lang predicate at the scan + TakeOrdered top-k",
      "q_knn_join" -> "per-query top-k via TopKPerGroup heaps, no per-query window",
      "q_stratified_sample" -> "per-stratum quota via TopKPerGroup, no stratum-sized window",
      "q_cypher_ex8" -> "multi-pattern Cypher compiled to a shared-key equi-join chain",
      "q_quantize_embeddings" -> "zero-shuffle narrow HOF folds (scan-speed quantization)",
      "q_ann_pq" -> "PQ: broadcast codebook, map-side max_by encode, integer ADC sums",
      "q_ann_ivf" -> "IVF assignment via partial_max_by — narrow exchange, no window",
      "q_decontaminate" -> "broadcast eval-gram semi-join; 16-byte keys only",
      "q_unigram_lm" -> "map-side vocab agg + 1-row broadcast total, integer logp sums",
      "q_chunk_fold" -> "per-doc fold chunker — zero exchanges",
      "q_dedup_embedding" -> "native SrpSig buckets + bucket-blocked verify join",
      "q_dedup_substring" -> "span dedup: md5-key shuffle only, coverage explode on dups",
      "q_bloom_decontaminate" -> "BloomFilterAggregate scalar subquery + might_contain prune",
      "q_triangles" -> "degree-oriented wedge equi-joins, no window, no cartesian",
      "q_rrf" -> "two TakeOrdered pools fused full-outer on bounded rows",
      "q_cypher_ex14" -> "var-length Cypher: unioned midpoint equi-joins per path length",
      "q_media_phash" -> "payload-local phash signatures + banded hamming equi-join",
      "q_topn_auto" -> "TopKRewriteRule output: heap operator, no Window, no sort",
      "q_tokenize_subword" -> "per-row greedy subword fold; vocab as codegen'd IN-lists",
      "q_heavy_hitters" -> "MG-sketch candidate broadcast + exact recount, vocab never shuffles",
      "q_kcore" -> "degree-peel rounds: map-side degree count + semi-joins on a shrinking edge list",
      "q_source_minhash" -> "per-doc sig fold + element-wise-min sketch merge per source",
      "q_doc_similarity" -> "feature-hashed tf-idf vectors, broadcast probe batch, heap top-k",
      "q_link_prediction" -> "wedge equi-join w/ center-degree cap, anti-join on direct edges",
      "q_funnel" -> "chained per-user min aggs on one shuffle key, no raw-stream window",
      "q_dedup_lines" -> "line-hash boilerplate: 8-byte-key groupBys + hash equi-join mark",
      "q_quality_classifier" -> "frozen linear head: one scan, zero shuffles, quantized logits",
      "q_lpa_communities" -> "seeded LPA round: labeled-frontier equi-join + struct-min argmax",
      "q_semdedup" -> "broadcast centroid E-step + cluster∧LSH-bucket-blocked verify",
      "q_dsir_weights" -> "1024-bucket hashed LMs broadcast back; integer logp sums",
      "q_entity_resolution" -> "DF-capped token blocking + struct-min canonical pick",
      "q_dedup_temporal" -> "(band, day-bucket) equi-join blocking — time-split hot keys",
      "q_ann_ivfpq" -> "IVF probe prune BEFORE the ADC join; broadcast codebook + query table",
      "q_kmeans" -> "Lloyd rounds: broadcast centroids, struct-min assign, (k,dim) mean shuffle",
      "q_ann_recall" -> "four ANN methods + exact baseline joined on K-row id sets",
      "q_modularity" -> "endpoint-community equi-joins + #communities-row integer-grid rollup",
      "q_proto_filter" -> "broadcast per-cluster percentile threshold — window-free keep rule",
      "q_cube" -> "grouping-set Expand under ONE partial aggregate exchange",
      "q_mix_temperature" -> "corpus collapses to #sources rows before any mixture math",
      "q_zipf_fit" -> "vocab agg + 100-row TakeOrdered + 1-row integer-sum regression",
      "q_dedup_url" -> "join-free URL canonicalization + one hash shuffle on the URL key",
      "q_mmr" -> "TopK-row candidate checkpoint; greedy rounds corpus-independent",
      "q_walks" -> "indexed-adjacency hops: two equi-joins per step, narrow frontier",
      "q_neighbor_sample" -> "GraphSAGE fanouts via TopKPerGroup heaps, no hub window",
      "q_betweenness" -> "k-source BFS layers: frontier equi-join + anti-join + σ sum",
      "q_bpe_train" -> "vocab collapse once; per-round pair agg + broadcast best-pair merge fold",
      "q_rag_context" -> "resolve→retrieve→dedup→budget→format; TakeOrdered then ≤K-row windows",
      "q_top_component" -> "power iteration: broadcast 1-row w, corpus pass + 64-row dim sum",
      "q_training_export" -> "curation verdict → two-level packing → shard hash as ONE plan",
      "q_edge_support" -> "truss support: degree-oriented wedge equi-joins, hub fan-out bounded",
      "q_ktruss_peel" -> "two peel rounds, same support plan on a shrinking edge list",
      "q_passage_rank" -> "chunk BM25 → k=1 heap per doc → global TakeOrdered",
      "q_cypher_sp" -> "Cypher shortestPath compiled to frontier BFS, not a path unroll",
      "q_hll_distinct" -> "register maxes map-side; harmonic sum as exact scaled longs",
      "q_dau_stickiness" -> "one (day,user) dedup pass + broadcast day-join window distinct",
      "q_kmv_distinct" -> "KMV minima via TopKPerGroup heaps — distinct hashes never converge",
      "q_hist_quantiles" -> "broadcast min/max + map-side bucket counts; window over ≤256 rows/type",
      "q_grouping_sets" -> "three grouping sets Expanded under ONE partial-agg exchange",
      "q_hard_negatives" -> "label-filtered broadcast probes + TopKPerGroup heap",
      "q_pmi_cooccur" -> "one materialized mentions pass; broadcast count tables; TakeOrdered",
      "q_length_hist" -> "one (source,bucket) shuffle; cumulative window over bucket rows",
      "q_drift_report" -> "both cohorts counted in one pass; integer-grid TV rollup",
      "q_ndcg" -> "scoring pass shared by n_rel agg and heap top-k; bounded idcg fold",
      "q_prf_expansion" -> "TakeOrdered pool broadcast into map-side-combined TF agg",
      "q_cluster_purity" -> "corpus collapses to K×labels cells on one exchange; struct-min majority",
      "q_burst_detect" -> "stream collapses to (hour,type) rows; trailing window on the aggregate",
      "q_source_entropy" -> "one (lang,source) shuffle; broadcast per-lang rollup; micro-nat long sums",
      "q_token_gini" -> "corpus collapses to source rows; windows post-agg; moment rows broadcast",
      "q_assortativity" -> "endpoint-degree equi-joins + one six-moment map-side-combined agg",
      "q_zorder_scan" -> "z-clustered layout read-back: both box predicates pushed to the scan",
      "q_bootstrap_ci" -> "broadcast ×32 replicate expand + ONE map-side-combined 32-row agg",
      "q_anf" -> "sampled ANF: frontier equi-join + anti-join per hop, pair state only",
      "q_anf_hll" -> "HyperANF: delta-register edge join + (node,reg) max — no V² state")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` at `$sfDir`. These are the\n")
    sb.append("plan shapes SURVEY §5 promises; PlanSpec/SourcesSpec assert the\n")
    sb.append("load-bearing properties in CI.\n")
    heads.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE so the real plan prints
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md written (${heads.size} plans)")
    spark.stop()
  }
}
