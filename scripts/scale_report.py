#!/usr/bin/env python3
"""Per-query growth table between two Bench runs at different scales
(PLANS.md "measured scaling" evidence — VERDICT r8 #1). Dev tooling;
the driver never runs this.

Usage: python3 scripts/scale_report.py <base_bench.json> <big_bench.json> [K]

K = data-size ratio between the two runs (default 10). For each query
present in both files, prints the warm min-time ratio, the implied
growth exponent e = log_K(ratio), the predicted exponent class from
the plan-shape table below, and a verdict (OK if measured ≤ predicted
+ margin; fixed per-query overhead makes measured exponents
UNDERestimates, so any measured > predicted is a real flag, not noise).
"""
import json, math, sys

# predicted growth exponents from the executed-plan shapes (PLANS.md):
#   1.0  scan/agg/join-with-dim/window — linear in fact rows
#   1.35 banded pair families on the dup-cluster-of-10 corpus: corpus
#        grows K×, within-band candidate volume grows ~K^2 in the dup
#        factor but stays sliver-bounded by banding; measured r8 ≈ 1.35
#   1.5  trained-cell families: ~sqrt(n) cells × cell^2 work, and
#        IVF probe cost n·sqrt(n)
#   2.0  exact all-pairs candidate-bound (ngram_jaccard/containment on
#        a dup-heavy corpus: df^2 growth — the documented routed-around
#        regime, kept in the suite deliberately)
PRED = {}
def _cls(e, *names):
    for n in names: PRED[n] = e
_cls(1.35, 'minhash_lsh', 'lsh_band_stats', 'minhash_calibration',
     'simhash_calibration',
     'neardup_clusters', 'cluster_reps', 'cluster_size_hist',
     'simhash_pairs', 'winnow_pairs', 'doc_fingerprint', 'dup_spans',
     'scrub_spans', 'cross_dedup', 'cross_dedup_persisted', 'curation_pipeline', 'curation_report',
     'dup_rate_by_source', 'source_overlap', 'edit_distance_pairs',
     'contamination_bench')
_cls(1.5, 'semdedup', 'doc_similar_topk', 'embedding_neardup',
     'embedding_lsh_neardup', 'embedding_clusters', 'knn_graph',
     'knn_label_vote', 'knn_triangles', 'label_spread', 'ann_ivf_topk',
     'ann_ivf_trained', 'ann_ivf_persisted', 'ivf_train', 'ivf_pq_topk', 'ivf_pq_topk_set', 'ivf_pq_persisted',
     'pq_adc_topk', 'semantic_mix', 'doc_topics', 'topic_keywords',
     'ivf_pq_rotated_topk', 'ivf_pq_rotated_persisted')
_cls(2.0, 'ngram_jaccard', 'containment_pairs')
# Every other query is EXPLICITLY classified linear (ann brute force:
# n_query fixed slice x n corpus; scans/aggs/joins-with-dims/windows;
# model-build families bounded by trained-model size). A query in the
# bench json but in NEITHER table gets verdict UNCLASSIFIED and counts
# as a flag (VERDICT r9 #6: a new pair-family query silently defaulting
# to e=1.0 makes EXCEEDS spurious; defaulting is banned).
_cls(1.0,
     'ann_cosine_topk', 'ann_cosine_topk_set', 'attribution_asof',
     'audio_windows', 'avg_value_udaf', 'blacklist',
     'blacklist_stateful', 'cdc_chunks', 'channel_counts',
     'chunk_documents', 'click_no_purchase', 'clicks_by_province',
     'contamination', 'contamination_bloom', 'contamination_bloom_sql', 'bloom_calibration', 'split_leakage',
     'event_daily_leaf_store', 'rolling_active_users_store',
     'rolling_active_users_store_sql', 'uv_hll_calibration',
     'retention_cohorts_store_sql', 'user_churn_store_sql',
     'retention_cohorts_store', 'user_churn_store', 'uv_theta_daily_sql',
     'value_quantiles_daily_sql', 'cms_topk_est_sql', 'pq_whiten_compare',
     'corpus_coverage', 'dataset_card', 'event_daily_leaf',
     'retention_cohorts', 'retention_cohorts_sql', 'rolling_active_users',
     'rolling_active_users_sql', 'acquisition_cohorts',
     'user_churn', 'user_churn_sql', 'audience_overlap', 'uv_theta_daily',
     'retention_theta', 'theta_calibration', 'value_quantiles_daily',
     'value_quantiles_by_type', 'qsample_calibration', 'distinct_plan_report',
     'importance_sample',
     'dataset_split', 'dedup_exact', 'doc_quantiles',
     'doc_term_vectors', 'embedding_covariance', 'embedding_dim_stats',
     'embedding_outliers', 'event_cube', 'event_pivot', 'event_rollup',
     'events_by_type_salted', 'frame_sample', 'funnel',
     'heavy_hitters', 'cms_topk_est', 'cms_calibration',
     'cms_source_affinity', 'hot_users_topn', 'hot_users_topn_sql',
     'hourly_anomalies', 'jaccard_plan_report', 'key_skew_report',
     'lang_id', 'late_events', 'latest_snapshot', 'lm_bigram_score',
     'login_fail', 'login_fail_cep', 'media_features',
     'mixture_sample', 'ngram_novelty', 'normalized_dedup', 'oov_rate',
     'order_timeout', 'pack_documents', 'page_views', 'pii_scrub',
     'pmi_bigrams', 'pq_distortion', 'pq_encode', 'profile_table',
     'props_json_agg', 'q1_pricing_summary', 'q3_top_orders',
     'q5_region_revenue', 'quality_filter', 'repetition_stats',
     'rolling_hour_stats', 'session_windows', 'simhash',
     'source_mix_report', 'source_quality', 'sq8_encode',
     'stratified_sample', 'text_stats', 'textrank_keywords',
     'tfidf_topk', 'token_freq_hist', 'token_topk', 'total_counts',
     'tx_match', 'tx_match_join', 'unique_visitors',
     'unique_visitors_approx', 'uv_bitmap', 'uv_udaf', 'vocab_growth',
     'zorder_layout')
MARGIN = 0.18   # log10(1.5)/~2 — covers single-sample noise at K=10

def load(p):
    d = json.loads(open(p).read())
    return ({k: v for k, v in d.get('queries', {}).items() if v is not None},
            {k: v for k, v in (d.get('cold') or {}).items() if v is not None})

def coverage(bench_json):
    """--coverage <bench_out.json>: assert every registered query is
    classified (VERDICT r9 #6) — exits 1 listing any unclassified key,
    so a new pair-family query can't silently default."""
    qs = set(json.loads(open(bench_json).read()).get('queries', {}))
    missing = sorted(qs - set(PRED))
    if missing:
        print(f'UNCLASSIFIED ({len(missing)}): {", ".join(missing)}')
        sys.exit(1)
    print(f'all {len(qs)} queries classified '
          f'({sum(1 for q in qs if PRED[q] > 1)} super-linear)')

USAGE = ('usage: scale_report.py <base_bench.json> <big_bench.json> [K]\n'
         '       scale_report.py --coverage <bench_out.json>')

def main():
    if len(sys.argv) < 2:
        print(USAGE); sys.exit(1)
    if sys.argv[1] == '--coverage':
        if len(sys.argv) < 3:
            print(USAGE); sys.exit(1)
        return coverage(sys.argv[2])
    if len(sys.argv) < 3:
        print(USAGE); sys.exit(1)
    base, big = sys.argv[1], sys.argv[2]
    k = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    (bq, bc), (gq, gc) = load(base), load(big)
    rows = []
    for name in sorted(set(bq) & set(gq)):
        r = gq[name] / bq[name] if bq[name] > 0 else float('nan')
        e = math.log(r, k) if r > 0 else float('nan')
        pred = PRED.get(name)
        if pred is None:
            verdict, pred = 'UNCLASSIFIED', float('nan')
        else:
            verdict = 'OK' if e <= pred + MARGIN else 'EXCEEDS'
        rows.append((name, bq[name], gq[name], r, e, pred, verdict))
    rows.sort(key=lambda t: -t[4])
    print(f'| query | t({base.split("/")[-1]}) s | t(K={k:g}) s | ratio | measured e | predicted e | verdict |')
    print('|---|---|---|---|---|---|---|')
    for name, t1, t2, r, e, pred, v in rows:
        print(f'| {name} | {t1:.2f} | {t2:.2f} | {r:.1f}x | {e:.2f} | {pred:g} | {v} |')
    flags = [t for t in rows if t[6] != 'OK']
    print(f'\n{len(rows)} queries compared; {len(flags)} exceed predicted exponent'
          + (': ' + ', '.join(t[0] for t in flags) if flags else ''))
    tot1, tot2 = sum(bq[n] for n, *_ in rows), sum(gq[n] for n, *_ in rows)
    print(f'warm totals: {tot1:.1f}s -> {tot2:.1f}s ({tot2/tot1:.1f}x, e={math.log(tot2/tot1,k):.2f})')

if __name__ == '__main__':
    main()
