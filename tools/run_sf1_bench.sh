#!/bin/bash
# sf1 stress bench (r8 verdict task 1; subset extended r12 per the r11
# verdict): scan/agg/window/dedup/text over the 10x sf1data scale-up
# (tools/gen_sf1.py), PLUS the data-bound families that previously had
# no at-scale measurement — the span-dedup chain (d25/d26/p10/p11, the
# steepest cost shape in the repo: gram explode is O(corpus tokens)),
# the IVF-PQ lifecycle (s17-s21: 5 queries stay fixed while the corpus
# grows 10x, so the scan-side scaling is real), CDC chunking + storage
# dedup (m09/m10), semantic decon (d27), and the SQL curation surface
# (x42/x43/x49, same plans as d25/t12/d13 reached from SQL), plus the
# online PQ policy loop e27 (r13: one gated retrain, O(corpus) by
# design — the at-scale price of the drift-excess policy). Still excluded on
# documented grounds: merge/replay keys (cost is per-commit metadata,
# not data volume), d06/d11 (query-set x corpus both scale 10x in the
# synthetic copy, a data artifact of duplicate vectors, not a plan
# property), heavier streaming drains (e03+: state-scan cost covered
# by e01/e02; e25/e26 = p10/p11's plans under a micro-batch loop).
# Usage: run_sf1_bench.sh [OUT.json]
cd /root/repo
KEYS="q01_filter_project,q02_cast_datefns,q03_agg_pricing,q04_agg_having,q05_window_running,q06_window_rank,q07_topk,q08_join_agg,q09_semi_join,q10_anti_join,q11_set_ops,q12_distinct,q12b_approx_distinct,q13_time_bucket,q14_rollup,q15_json_extract,q16_cube,q17_percentiles,q17b_approx_percentiles,q20_asof_join,q21_range_join,q31_pivot,q32_grouping_sets,q33_window_shift,q34_unpivot,q35_bootstrap,q38_star_join,q39_correlated,q40_gapfill,q41_funnel,q42_histogram,q43_sql_surface,q44_retention,q45_vwap,q46_cost_basis,q47_rolling,q48_sessions_batch,q49_anomaly,q50_asof_forward,q51_period_over_period,q52_window_dist,q53_retention,q54_blame_exists,d01_exact_dedup,d02_minhash_sig,d03_lsh_pairs,d04_jaccard_neardup,d05_simhash,d07_decontaminate,d08_hash_sample,d09_dup_clusters,d10_mixture_sample,d12_token_budget,t01_token_stats,t02_quality,t03_langid,t04_fingerprint,t05_chunk,t06_vocabulary,t07_scrub,t08_repetition,t09_pack,t10_countmin,t11_tfidf,d25_dup_spans,d26_span_dedup,d27_semantic_decontaminate,p10_span_chain,p11_scrub_chain,s17_ivf_pq,s18_ivf_pq_append,s19_ivf_pq_delete,s20_ivf_pq_drift,s21_ivf_pq_retrain,x42_sql_dup_spans,x43_sql_gopher_rules,x49_sql_decon,e27_stream_pq_retrain,m09_cdc_chunks,m10_chunk_dedup,m01_media_meta,m02_media_profile,m03_media_decode,m04_frame_sample,e01_windowed_counts,e02_sessions"
SPARK_GRAFT_SF_DIR=/root/repo/sf1data \
SPARK_GRAFT_BENCH_ONLY="$KEYS" \
SPARK_GRAFT_BENCH_FULL_OUT="${1:-/root/repo/bench_full_sf1.json}" \
SPARK_GRAFT_BENCH_PRODUCER=builder \
sbt -batch "runMain graft.Bench" > /tmp/bench_sf1.log 2>&1
echo "exit=$?" >> /tmp/bench_sf1.log
