package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for a representative query per operator
  * family into PLANS.md — the plan-review artifact: broadcast vs
  * sort-merge choices, pushed filters, partial aggregation, and codegen
  * coverage are visible (and asserted in PlanSpec; this file is for
  * human review). Regenerate with:
  *   sbt "runMain graft.Plans [sfDir]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq(
      "q_agg_pricing_summary", // flagship: scan → partial+final agg
      "q_scan_filter_pushdown", // PushedFilters into the parquet scan
      "q_join_star", // broadcast dims around the fact
      "q_join_sortmerge", // fact⋈fact shuffle join
      "q_win_range_frame", // value-range window, per-customer
      "q_dedup_minhash", // LSH banding equi-join, no all-pairs
      "q_sim_ann_ivf", // IVF cell equi-join + re-rank
      "q_stream_tumbling", // windowed aggregation (batch twin)
      "q_text_langid", // profile build + broadcast map-side scorer
      "q_merge_upsert", // CDC merge: dedup window + full outer join
      "q_dedup_near_ngram", // size-pruned shingle self-join
      "q_sim_cosine_topk", // brute-force BNLJ self-join + TakeOrdered
      "q_text_normalize", // native nfc_normalize expression in projection
      "q_sessionize", // one user_id window exchange reused by the session agg
      "q_retention_cohort", // per-user agg + co-partitioned join back
      "q_decontaminate", // broadcast semi join on the holdout gram set
      "q_pipeline_corpus", // fused quality→dedup→decontaminate→chunk chain
      "q_agg_heavy_hitters", // mergeable MG summary: partial ObjectHashAggregate
      "q_incremental_agg", // state+batch partial-aggregate merge
      "q_join_salted", // skew-salted equi-join on (key, salt)
      "q_sim_ann_lsh", // native lsh_signatures_f expr + bucket equi-join
      "q_ts_interpolate", // per-user spine + ignore-nulls neighbour windows
      "q_win_streak", // gaps-and-islands: window + two hash aggregates
      "q_tpch_q3", // filtered fact⋈fact + TakeOrdered top-10
      "q_tpch_q5", // 6-table join ordering, dims broadcast
      "q_tpch_q18", // grouped-HAVING semi shape + TakeOrdered top-100
      "q_join_bucketed", // bucketed SMJ + same-key agg: zero hash exchanges
      "q_pack_sequences", // per-shard cumsum packing, partitioned window
      "q_quality_lm", // broadcast vocab logprob join + decimal sum
      "q_join_bloom_prefilter", // scalar bloom subquery prefilter + exact semi
      "q_tpch_q11", // group-sum vs window-total HAVING, tiny window input
      "q_tpch_q13", // left-outer count-of-counts, two partial+final aggs
      "q_tpch_q17", // decorrelated avg-qty: broadcast brand semi lands first
      "q_tpch_q21", // EXISTS pair collapsed to one per-order aggregate
      "q_tpch_q22", // 1-row threshold broadcast + anti join
      "q_tpch_q4", // semi join with equi key + non-equi lateness predicate
      "q_tpch_q15", // windowed global max over the tiny per-supplier agg
      "q_tpch_q16", // NOT IN as broadcast anti join + 3-key count-distinct
      "q_tpch_q19", // OR-of-ANDs stays a hash join, disjunction post-join
      "q_tpch_q6", // pure pushdown: every predicate in PushedFilters
      "q_tpch_q7", // two-region volume: dims pre-shrunk, one fact shuffle
      "q_tpch_q8", // market share in ONE conditional aggregate
      "q_tpch_q9", // profit star: LIKE-pruned part before the fact join
      "q_tpch_q2", // window-min over per-(part,supplier) agg, never the fact
      "q_tpch_q20", // 1-row relative threshold broadcast + left-semi
      "q_dedup_minhash_jaccard", // LSH candidates + exact verify, no all-pairs
      "q_dedup_incremental", // cross-set bucket join: incoming vs existing
      "q_source_schema_evolution", // mergeSchema union-of-footers read
      "q_graph_bfs", // per-hop join + min-agg, vertex-keyed co-partition
      "q_join_nearest", // one interleaved window, no self-join
      "q_join_interval_overlap", // entity-key-blocked interval pairs
      "q_win_custom_topk", // bounded TopKAgg as a window function
      "q_agg_bitmap_overlap", // bitmap AND-fold bucket join
      "q_table_checksum", // xor signature: one partial-agg pass
      "q_dedup_chunks", // array-slice chunking, chunk-keyed equi-join
      "q_topk_group_agg", // bounded-heap partial ObjectHashAggregate
      "q_agg_bitmap_distinct", // two map-side-foldable aggs, no Expand
      "q_layout_zorder", // integer z-interleave + 1-row max attach
      "q_skyline_pareto", // day-spine window, fact never globally sorted
      "q_stats_equidepth", // 1-row decile bounds broadcast + HOF fold
      "q_dedup_prefix_filter", // prefix-token equi-join + exact verify
      "q_cluster_kmeans", // per-iteration broadcast join + two keyed aggs
      "q_feat_cov", // in-row pair explode → one (p1,p2)-keyed aggregate
      "q_skew_diagnose", // agg → TakeOrdered 10 → tiny window
      "q_incremental_join", // three delta-sized joins + state merge
      "q_agg_quantile_sketch", // bounded KMV partial ObjectHashAggregate
      "q_funnel_window", // chained left equi-joins with range predicates
      "q_multimodal_phash", // batched codec pass + (band,chunk) equi-join
      "q_text_bpe_train", // vocab-sized pair aggregate + 1-row merge broadcasts
      "q_text_bpe_encode", // learned-vocab equi-join over the word stream
      "q_rec_item_neighbors", // single-subtree basket pairs + map-side symmetrize
      "q_ml_auc", // distinct-bucket agg + ordered window on the bucket frame
      "q_ts_hazard", // per-user agg → interval deltas → hour-spine windows
      "q_stats_bootstrap", // ×32 explode + 32-key partial agg + 1-row attach
      "q_stream_topk", // tumbling agg + day-partitioned WindowGroupLimit
      "q_dedup_substring", // stride-compressed gram explode + gram-key agg
      "q_ml_ndcg", // user-partitioned rank window + literal-discount ledger
      "q_stats_spearman", // value-level rank margins, no per-row sort
      "q_sample_weighted", // bounded TopKAgg + tiny winners broadcast rejoin
      "q_graph_kcore3", // iterated degree-filter equi-joins, vertex-bounded
      "q_stats_gini", // r9: distributed rank — range-partition + offsets
      "q_ml_knn_accuracy_banded", // r9: exact cell-pruned 5-NN, no all-pairs
      "q_dedup_containment_prefix", // r9: one shared per-doc array aggregate
      "q_dedup_embedding_banded", // r9b: cell-pruned threshold dedup
      "q_sim_cosine_topk_banded") // r9b: cell-pruned global top-k (floor prune)
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans (generated by graft.Plans)\n"
    sb ++= s"\nInput: `$sfDir`, `local[$cpus]`, shuffle.partitions=$cpus.\n"
    sb ++= "Shapes asserted in PlanSpec; dumped here for review.\n"
    keys.foreach { k =>
      val plan = SparkEntry.queries(k)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      sb ++= s"\n## $k\n\n```\n$plan```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    spark.stop()
  }
}
