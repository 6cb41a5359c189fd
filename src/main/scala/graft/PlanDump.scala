package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: the `explain("formatted")` output of the headline
  * queries, as reviewable evidence of the physical properties the engine
  * promises (bounded top-k, broadcasts, pushdown, partition pruning,
  * whole-stage codegen spans). Regenerate after planner-affecting changes:
  *
  *   java -cp ... graft.PlanDump /root/testdata/sf0.001 PLANS.md
  */
object PlanDump {

  private val Headliners = Seq(
    "q1_pricing" -> "TPC-H Q1: decimal-exact aggregation",
    "q5_nation" -> "TPC-H Q5: star join (broadcast dims + pushed region filter)",
    "q_semantic_topk" -> "semantic search: exact cosine top-k, no corpus shuffle",
    "q_lexical_bm25_indexed" -> "BM25 from the posting table only",
    "q_dedup_minhash" -> "MinHash LSH: keyed bucket joins, no all-pairs product",
    "q_corpus_rollup" -> "ROLLUP grouping sets: Expand + ONE aggregate exchange",
    "q_ann_ivf" -> "IVF probe: cluster-pruned scan + bounded top-k",
    "q_ann_pq" -> "PQ: ADC over codes (no embedding scan) + exact re-rank",
    "q_ann_pq_residual" -> "residual IVF-PQ: per-(query,cluster) ADC tables over codes",
    "q_ann_knn_blocked" -> "blocked kNN: within-cluster keyed self-join",
    "q_top_orders_per_customer" -> "per-key top-k window (WindowGroupLimit)",
    "q_events_asof" -> "as-of join: one keyed shuffle + ordered window, no inequality theta-join",
    "q_events_range" -> "range join: bucketed equi-join, range filter inside the join stage",
    "q_pipeline_curate" -> "curation pipeline: quality -> langid -> dedup -> sample in one plan",
    "q_pipeline_curate2" -> "curation v2: repetition + boilerplate gates -> dedup -> rollup, keyed only",
    "q_text_boilerplate" -> "boilerplate coverage: combiner-collapsed df + semi-join probe",
    "q_dedup_ngram_prefix" -> "PPJoin: xxhash64-keyed prefix candidates + sorted-merge verify",
    "q_hybrid_rrf" -> "hybrid RRF: bounded per-query aggregate fusion, no global window",
    "q_hybrid_rrf_many" -> "batched hybrid: one docs×queries semantic pass + shared-stats BM25 legs",
    "q_events_sessionize" -> "sessionize: user-keyed lag + running sum, one exchange",
    "q_events_window" -> "tumbling window agg over TIMESTAMP_NTZ: combiner-collapsed",
    "q_mixture_budget" -> "token-budget fill: bin aggregate + tiny window, boundary fill as range-sliced prefix sum",
    "q_export_shards" -> "export sharding: hash-derived shard, per-shard bounded row_number",
    "q_pack_offsets" -> "sequence packing: bucket-sliced distributed prefix sum, ONE corpus shuffle",
    "q_pipeline_curate4" -> "curation v4: length gate -> DSIR selection -> sequence packing, one plan",
    "q_quality_classifier" -> "trained quality filter: literal weight array, narrow scoring pass, integer-exact gradient sums",
    "q_dedup_semantic" -> "SemDeDup: cluster-keyed cosine pairs, never all-pairs",
    "q_rag_context" -> "context assembly: per-query bounded window over the serving shortlist",
    "q_keywords_tfidf" -> "TF-IDF keywords: (doc,term)/(term) keyed aggs, per-doc bounded window",
    "q_text_langid_multi" -> "language ID: native CharTrigrams generate + broadcast profile join + keyed argmax",
    "q_phrase_search" -> "phrase search: slot emission + ONE (id,p0) keyed shuffle, no positional self-join",
    "q_unigram_train" -> "unigram-LM: vocab-sized word table, Viterbi over broadcast costs, keyed usage agg",
    "q_events_retention" -> "cohort retention: keyed distinct -> per-user min -> co-partitioned join",
    "q_cluster_topics" -> "cluster topics: narrow centroid argmin + cluster-keyed term aggs",
    "q_text_perplexity_kn" -> "Kneser-Ney LM: checkpointed type table feeds context/continuation legs, keyed joins",
    "q_pipeline_curate7" -> "curation v7: gopher gate -> langid -> KN terciles -> fill, ONE composed plan",
    "q_semantic_filtered" -> "filtered vector search: predicate pushed into the scan under the top-k",
    "q_filter_c4" -> "C4 gate: ONE native C4LineStats pass per row (CSE-deduped struct fields), no shuffle",
    "q_dedup_across" -> "cross-corpus near-dup: bipartite (band,bucket) inner join, candidates output-shaped",
    "q_text_novelty" -> "novelty: distinct-shingle agg + LEFT SEMI probe, per-doc keyed counts",
    "q_ann_recall" -> "ANN recall report: both retrieval legs bounded top-k, hit join on (query,id)",
    "q_pipeline_curate8" -> "curation v8: C4 clean -> bipartite novelty gate -> rollup, one composed plan",
    "q_graph_pagerank" -> "near-dup PageRank: output-sized edge list, per-round ONE keyed join + agg",
    "q_dedup_survivor" -> "survivor selection: component-keyed argmax window over the cluster join",
    "q_corpus_overlap" -> "corpus overlap: corpus-keyed signature agg + broadcast pair compare",
    "q_events_markov" -> "Markov transitions: partitioned session windows + |types|^2-bounded aggs",
    "q_classifier_calibration" -> "calibration: trained margins -> literal bin edges -> 10-key agg",
    "q_embed_stats" -> "embedding stats: narrow posexplode + 64-key combiner-collapsed agg",
    "q_ann_ndcg" -> "NDCG/MRR eval: bounded top-k legs + per-query discount-weight join",
    "q_classifier_auc" -> "exact AUC: distinct-margin agg + bucket-sliced prefix sum, window PARTITIONED by bucket (no global sort)",
    "q_drift_psi" -> "PSI drift: two pruned scans -> 10-key aggs -> bins-sized grid, single-row broadcast total",
    "q_sample_weighted" -> "weighted sample: Gumbel micro-key + TakeOrderedAndProject heap",
    "q_graph_triangles" -> "triangle census: degree-ordered orientation, wedge equi-join + closing-edge probe (O(m^1.5))",
    "q_dedup_clusters_lss" -> "LSS components: per-round keyed min-aggs + joins, edge set output-sized",
    "q_events_anomaly" -> "hourly anomaly: keyed count + broadcast grid zero-fill + |grid| stats aggs",
    "q_embed_pca" -> "PCA power round: broadcast 64-row component join + two keyed aggs per pass",
    "q_ann_dim_sweep" -> "dim sweep: four truncated top-k legs unioned against ONE checkpointed truth leg",
    "q_events_paths" -> "session paths: user-keyed session windows -> |types|^3-bounded count -> top-k heap",
    "q_events_abtest" -> "A/B readout: unit-keyed agg -> 2-row arm agg -> single-row z projection",
    "q4_priority" -> "TPC-H Q4 shape: LeftSemi hash join, range predicate in the join condition",
    "q18_large" -> "TPC-H Q18 shape: HAVING-side partial agg -> surviving-key join-back -> top-10 heap",
    "q19_disjunct" -> "TPC-H Q19 shape: broadcast hash join with the OR arms as residual condition",
    "q11_important" -> "TPC-H Q11 shape: two keyed aggs + 1-row broadcast threshold (no second corpus pass)",
    "q22_segment" -> "TPC-H Q22 shape: 1-row broadcast scalar + LeftAnti dormancy join",
    "q_corpus_cube" -> "CUBE: Expand x4 grouping sets, ONE aggregate exchange (partials collapse map-side)",
    "q_corpus_pivot" -> "pivot: explicit value list -> ONE aggregate, no distinct-values job",
    "q_ann_nndescent" -> "NN-descent round: bounded neighbor self-joins + vector-fetch joins + per-src window",
    "q_graph_ppr" -> "personalized PageRank round: one keyed join + agg, seed-conditional restart projection",
    "q_dedup_containment" -> "containment pairs: inverted-index candidate join, direction fan-out output-sized",
    "q_bootstrap_ci" -> "Poisson bootstrap: B-way explode collapses map-side to B rows per partition",
    "q_drift_semantic" -> "semantic drift: two dim-keyed combiner aggs -> d-row join -> broadcast summary",
    "q_profile_merge" -> "mergeable profile: two 1-row aggs -> |cols|-row merge agg (metadata-sized)",
    "q_trend_ols" -> "grouped OLS: one keyed sufficient-statistics agg -> closed-form projection",
    "q_chunk_embed_pool" -> "chunk-embed-pool: chunk explode -> per-partition batch embed -> (doc,dim) agg",
    "q_dedup_containment_prefix" -> "one-sided prefix containment: rarity-prefix probe join vs RAW (un-windowed) indexed shingles",
    "q_dedup_editdist" -> "Ed-Join: positional char-q-gram prefix candidates + levenshtein verify, light leg broadcast",
    "q_mine_triplets" -> "triplet mining: output-sized pair/kNN frames, anti-join + per-anchor bounded window",
    "q_knn_mutual_clusters" -> "mutual-kNN clustering: reciprocity self-join -> components over output-sized edges",
    "q2_mincost" -> "TPC-H Q2 shape: per-part min agg joined back (decorrelated scalar subquery)",
    "q7_volume" -> "TPC-H Q7 shape: fact reaching TWO broadcast nation dims through supplier and customer",
    "q8_share" -> "TPC-H Q8 shape: 6-table star + LeftSemi region gate + conditional-ratio agg",
    "q13_distribution" -> "TPC-H Q13 shape: LEFT join count(col) histogram (null-preserving count)",
    "q15_topsupplier" -> "TPC-H Q15 shape: 1-row max broadcast back against its own aggregate input",
    "q17_smallqty" -> "TPC-H Q17 shape: per-part avg decorrelated to agg + join-back, cross-multiplied compare",
    "q21_waiting" -> "TPC-H Q21 shape: LeftSemi (other supplier exists) + LeftAnti (no other returner) on the fact",
    "q_ann_graph_beam" -> "graph-beam ANN: medoid-routed entries + broadcast frontier probes + point vector fetches, corpus-size-independent per hop",
    "q_pipeline_curate9" -> "skew-aware rollup: diagnosed-hot keys through two-phase salted agg, cold keys plain — one union",
    "q_privacy_kanon" -> "k-anonymity audit: ONE combiner-collapsed QI-class agg x broadcast k values, no second corpus pass",
    "q_search_expanded" -> "PRF expansion: two bounded BM25 serves around R-doc candidate mining + broadcast-probed df scan",
    "q_search_spell" -> "SymSpell: vocab-sized delete expansion join vs broadcast query variants, banded levenshtein verify",
    "q_mine_kcenter" -> "k-center: k narrow running-min distance maps + 1-row argmax each — no joins, no pair space",
    "q_pack_batches" -> "length batching: histogram agg -> driver offsets -> keyed in-length window (no global sort)",
    "q_events_scd2" -> "SCD2 build: two key-partitioned windows sharing one exchange",
    "q_events_pit" -> "point-in-time: SCD2 build + backward as-of union window (no range join)",
    "q_profile_hll" -> "HLL: narrow hash map + (group, register) max agg — output 512 registers regardless of corpus",
    "q_profile_cms" -> "CMS: d-way explode + combiner-collapsed cell counts; probes broadcast",
    "q_dedup_source_sim" -> "bottom-k: distinct + WindowGroupLimit signatures; estimation reads groups x k rows only",
    "q_events_assoc" -> "association rules: basket-keyed self-join (fan-out sum basket^2, capped), exact ppm",
    "q_eval_outliers" -> "MAD outliers: three keyed aggs, group-sized median/MAD frames broadcast back",
    "q_er_clusters" -> "ER: Ed-Join prefix candidates + banded verify -> star components",
    "q_graph_lpa" -> "LPA: per round one keyed join + vote agg + per-node argmax over <= degree rows",
    "q_rag_attribution" -> "attribution: (answer, gram)-keyed match join, argmax bounded by shortlist",
    "q_events_seasonal" -> "seasonal MASE: two lag windows over one series-keyed exchange + one agg",
    "q_search_ltr" -> "LTR features: serve top-k + one-pass stats agg + shortlist-only assembly",
    "q_snapshot_diff" -> "snapshot diff: full-outer join on 16-byte digests, keyed status rollup",
    "q_compaction_plan" -> "compaction plan: file-inventory agg -> bucketed prefix sum (window partitioned by coarse bucket)",
    "q_zorder_layout" -> "z-order: per-row codegen'd bit fold + ONE keyed aggregate",
    "q_sanitize_extended" -> "extended sanitize: single projection pass, Luhn fold inside codegen",
    "q_events_overlap" -> "interval-overlap join: bucket explode + keyed equi-join, NO inequality theta-join",
    "q_corpus_kl" -> "per-slice KL: keyed aggs + ONE token-keyed join, micro-nat integer sum",
    "q_lexical_boolean" -> "boolean retrieval: term-pruned postings, AND = keyed count, NOT = left-anti",
    "q_feature_binning" -> "equal-frequency binning: value-count prefix sum (partitioned window) + broadcast bin map",
    "q_events_pattern" -> "sequence patterns: ONE keyed aggregate + per-row regex, no self-joins",
    "q_ann_graph_ivf" -> "two-layer serving: IVF reps route the query into the graph beam")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` on `$sfDir`. What to look for:\n")
    sb.append("`TakeOrderedAndProject` (bounded top-k), `BroadcastHashJoin`\n")
    sb.append("(small side broadcast), `PushedFilters`/`ReadSchema` (scan\n")
    sb.append("pushdown + pruning), `PartitionFilters` (physical partition\n")
    sb.append("pruning), `WholeStageCodegen` spans, and the ABSENCE of\n")
    sb.append("`CartesianProduct`/global `Sort` in search/dedup paths.\n\n")
    sb.append("Reading note: cluster assignment in the ANN sections is a\n")
    sb.append("single narrow projection — the `nearestcentroidindex(...)`\n")
    sb.append("native expression loops over the baked K-centroid matrix per\n")
    sb.append("row (no vector-x-centroid join exists anywhere in the plan);\n")
    sb.append("the serving joins are keyed (see PlanSpec's all-pairs guards).\n")
    for ((name, caption) <- Headliners) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name — $caption\n\n```text\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    spark.stop()
  }
}
