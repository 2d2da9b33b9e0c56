"""Benchmark harness (driver-run per round; see BASELINE.md).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "triples_per_sec": ...}

--scaling: run the headline KG pipeline in fresh subprocesses at each
parallelism level (default 8 then 32; override with
NERFRAY_SCALING_LEVELS=8,16,32) on the same input and report per-level
throughputs plus scaling efficiency = thr(hi) / ((hi/lo) * thr(lo))
(sandbox stand-in for the north_rule's N vs 4N node clusters).

The bench corpus is the deterministic corpus generator at
BENCH_MULT x the sf dir's documents row count (same input at every
parallelism level; generation is distributed and part of the measured
pipeline, playing the role of the parquet scan).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_MULT = int(os.environ.get("NERFRAY_BENCH_MULT", "20"))


def _quiet_empty_bundle_warnings() -> None:
    from nerfray import quiet_empty_bundle_warnings
    quiet_empty_bundle_warnings()


def run_headline(sf_dir: str, num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    _quiet_empty_bundle_warnings()

    from nerfray import model
    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source

    model.model_artifact()  # train/load outside the timed region

    n = corpus_source.corpus_rows_for(sf_dir) * BENCH_MULT
    queries: dict[str, float] = {}

    # two runs, best-of (same as --single-kg): run 1 pays actor-pool
    # spin-up + memo warm-up; run 2 is the steady-state wall
    runs = []
    for _ in range(2):
        t0 = time.time()
        trips = kg.kg_pipeline(corpus_source.corpus_dataset_by_repo(n),
                               tagger="crf", dedup="partitioned")
        n_triples = trips.count()
        runs.append(time.time() - t0)
    kg_sec = min(runs)
    queries["kg_triples"] = round(kg_sec, 3)
    queries["kg_triples_warmup_run"] = round(runs[0], 3)

    # generic-input variant (all-to-all dedup shuffle) for comparison
    t0 = time.time()
    kg.kg_pipeline(corpus_source.corpus_dataset(n), tagger="crf").count()
    queries["kg_triples_shuffle_dedup"] = round(time.time() - t0, 3)

    # full sink path: checkpointed, manifested, subject-partitioned write
    # (secondaries are best-effort: a failure records -1, never kills the
    # headline measurement)
    import shutil
    import tempfile
    try:
        from nerfray.state import manifest as mf
        out_dir = tempfile.mkdtemp(prefix="nerfray_bench_write_")
        n_write = corpus_source.corpus_rows_for(sf_dir)
        t0 = time.time()
        mf.run_checkpointed(n_write, out_dir, n_shards=4, tagger="crf")
        queries["kg_write_checkpointed"] = round(time.time() - t0, 3)
        shutil.rmtree(out_dir, ignore_errors=True)
    except Exception:
        queries["kg_write_checkpointed"] = -1.0

    # secondary pipelines at native sf scale (incl. the distributed
    # graph ops, so the recorded bench evidences them beyond gate scale)
    import __ray_entry__ as e
    qs = e.queries()
    for name in ("kg_nodes", "kg_components", "kg_components_repo",
                 "kg_pagerank", "kg_pagerank_planted", "dedup_exact",
                 "dedup_minhash", "dedup_simhash_pairs", "dedup_incremental",
                 "bloom_corpus",
                 "dedup_minhash_drops", "sim_topk", "text_stats",
                 "events_sessionize", "events_sessionize_split",
                 "events_asof_split", "events_sliding",
                 "events_window_selfjoin", "docs_pipeline",
                 "docs_word_df", "docs_inverted_index", "docs_search",
                 "join_orders_lineitem",
                 "join_priority_shipped", "join_skew_salted",
                 "sketch_hll_custkeys",
                 "customer_price_quantiles", "events_value_quantiles",
                 "distinct_custkeys_by_status",
                 "top_orders_per_status", "docs_top_words", "docs_cooccur",
                 "docs_bigrams",
                 "graph_triangles_planted", "docs_pii_redacted",
                 "docs_repetition", "docs_decontam",
                 "docs_mixture", "docs_packed", "docs_packed_split",
                 "kg_common_neighbors", "docs_crossdup", "emb_kmeans",
                 "events_interval_join", "docs_range_export",
                 "events_range_export_sampled", "docs_normalized",
                 "emb_quantized", "join_q5_nation_revenue",
                 "events_hourly_incremental", "emb_pca", "media_shards",
                 "docs_paragraph_dedup", "kg_labelprop_planted",
                 "kg_entity_types", "join_bloom_prefiltered",
                 "docs_url_hosts", "docs_blocklist", "events_scd2",
                 "events_outliers", "kg_lib_assoc", "kg_repo_cards",
                 "emb_centroid_outliers", "docs_classifier",
                 "events_zonemap_scan", "events_zorder_scan",
                 "kg_triples_compacted", "kg_lookup_object",
                 "kg_schema_evolution", "events_hot_users",
                 "join_q18_topk", "dedup_incremental_bloom",
                 "join_adaptive_rollup", "events_resampled_daily",
                 "docs_length_ntile", "events_quality_checks",
                 "events_temporal_join", "media_meta_routed",
                 "docs_splits_leakproof", "docs_bottomk_layout",
                 "docs_compression", "kg_apply_delta",
                 "events_pivot_daily", "events_unpivot_daily",
                 "sim_knn_graph", "docs_curation_scored",
                 "events_ab_test", "events_moving_sum",
                 "docs_dup_spans", "kg_time_travel", "docs_lm_score",
                 "kg_random_walks", "kg_walk_skipgrams",
                 "kg_hash_embedding", "emb_semdedup",
                 "lineitem_q6_revenue", "join_q14_promo",
                 "join_q10_returned", "join_q12_priority",
                 "join_q22_idle_rich", "docs_novelty",
                 "docs_weighted_sample", "orders_q13_distribution",
                 "join_q15_top_supplier", "lineitem_q17_small_qty",
                 "join_q19_disjunctive", "join_q7_nation_volume",
                 "docs_csv_roundtrip", "docs_jsonl_roundtrip",
                 "join_q8_market_share", "join_q21_waiting",
                 "join_q2_min_cost", "join_q9_profit",
                 "join_q11_important_stock", "join_q16_supplier_cnt",
                 "join_q20_majority", "dedup_editdist",
                 "sim_pq", "docs_hybrid_rrf", "sim_ivfpq",
                 "docs_dsir_scores", "docs_dsir_selected",
                 "docs_phrase_search", "docs_classifier_pr",
                 "kg_taxonomy_closure", "kg_type_inference",
                 "kg_type_rollup", "kg_entity_resolution",
                 "kg_er_clusters", "kg_canonical_usage",
                 "kg_fused_facts", "kg_domain_violations",
                 "docs_line_signals", "docs_bm25_rerank",
                 "media_phash_pairs", "kg_hyperanf_planted",
                 "kg_negatives", "kg_khop_sample",
                 "kg_clustering_planted", "kg_linkpred_planted",
                 "sketch_kmv_custkeys", "kg_merge_upsert",
                 "join_bucketed_rollup", "events_streaks",
                 "events_bloom_pointscan", "kg_mst_planted",
                 "kg_scc_planted",
                 "events_covered_time", "events_transitions",
                 "events_new_users_daily", "events_user_rank",
                 "part_pareto", "docs_table_checksum",
                 "docs_domain_cap", "docs_feather_roundtrip",
                 "docs_orc_roundtrip", "kg_sssp_paths_planted",
                 "kg_matching_planted", "kg_ppr_planted",
                 "events_cusum_alerts", "kg_mis_planted",
                 "kg_landmarks_planted", "docs_bucket_diff",
                 "docs_dupclass_weights", "docs_jsonl_gz_roundtrip",
                 "kg_range_violations", "dedup_editdist_census"):
        t0 = time.time()
        try:
            res = qs[name](sf_dir)
            if isinstance(res, ray.data.Dataset):
                res.count()
            queries[name] = round(time.time() - t0, 3)
        except Exception:
            queries[name] = -1.0

    # 10x scale probe inside the recorded bench: per-row cost must stay
    # flat an order of magnitude past the headline input
    try:
        t0 = time.time()
        n10 = n * 10
        trips10 = kg.kg_pipeline(corpus_source.corpus_dataset_by_repo(n10),
                                 tagger="crf", dedup="partitioned")
        n_triples10 = trips10.count()
        probe_sec = time.time() - t0
        queries["kg_scale_probe_10x"] = round(probe_sec, 3)
        out_probe = round(n_triples10 / probe_sec, 1)
    except Exception:
        queries["kg_scale_probe_10x"] = -1.0
        out_probe = -1.0

    # Per-query walls go to BENCH_DETAIL.json; the stdout JSON line
    # stays COMPACT (headline metrics only) so the driver's tail
    # capture always parses it (round 3 lost its whole bench record to
    # one oversized line).
    detail = {
        "metric": "kg_triples_wall_sec",
        "value": kg_sec,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "corpus_rows": n,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / kg_sec, 1),
        "scale_probe_triples_per_sec": out_probe,
    }
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError:
        pass
    n_timed = sum(1 for v in queries.values() if v >= 0)
    out = {
        "metric": "kg_triples_wall_sec",
        "value": kg_sec,
        "unit": "sec",
        "queries": {
            "kg_triples": queries.get("kg_triples"),
            "kg_triples_warmup_run": queries.get("kg_triples_warmup_run"),
            "kg_write_checkpointed": queries.get("kg_write_checkpointed"),
            "kg_scale_probe_10x": queries.get("kg_scale_probe_10x"),
        },
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "corpus_rows": n,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / kg_sec, 1),
        "scale_probe_triples_per_sec": out_probe,
        "catalog_queries_timed": n_timed,
        "catalog_queries_failed": len(queries) - n_timed,
        "catalog_wall_sec": round(sum(v for v in queries.values()
                                      if v >= 0), 1),
        "detail": "BENCH_DETAIL.json",
    }
    ray.shutdown()
    return out


# 800 × sf0.1 rows = 4M files: large enough that steady-state pipeline
# throughput dominates fixed ramp (actor-pool spin-up, memo-cache
# warm-up) at BOTH parallelism levels — at 2M files the 32-cpu run was
# still ramp-bound (~0.79 measured eff); at 4M both levels sit on their
# steady rates (measured 0.955, see BASELINE.md)
SCALING_MULT = int(os.environ.get("NERFRAY_SCALING_MULT", "800"))


def run_scaling(sf_dir: str) -> dict:
    """Same job, fresh process per parallelism level. Uses a larger corpus
    multiple than the headline run so parallel work dominates fixed
    per-run overhead (driver setup, actor ramp-up, shuffle barriers) —
    i.e. the measurement reflects scaling of the pipeline, not of Ray's
    constant startup cost."""
    levels = tuple(int(x) for x in os.environ.get(
        "NERFRAY_SCALING_LEVELS", "8,32").split(","))
    results = {}
    for cpus in levels:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                   NERFRAY_BENCH_MULT=str(SCALING_MULT))
        p = subprocess.run(
            [sys.executable, __file__, "--single-kg"],
            env=env, capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    lo, hi = levels[0], levels[-1]
    thr_lo = results[lo]["triples_per_sec"]
    thr_hi = results[hi]["triples_per_sec"]
    eff = thr_hi / ((hi / lo) * thr_lo)
    return {
        "metric": f"scaling_efficiency_{lo}_to_{hi}",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {f"kg_triples@{c}": results[c]["value"]
                    for c in levels},
        "sf": sf_dir,
        "num_cpus": list(levels),
        "triples_per_sec": {str(c): results[c]["triples_per_sec"]
                            for c in levels},
    }


def run_single_kg(sf_dir: str, num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    _quiet_empty_bundle_warnings()
    from nerfray import model
    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source

    model.model_artifact()
    n = corpus_source.corpus_rows_for(sf_dir) * BENCH_MULT
    # best-of-2 steady-state: the first run pays worker/import warm-up;
    # reporting the faster of two identical runs measures the pipeline,
    # not process cold-start, and damps sandbox noise
    times = []
    n_triples = 0
    for _ in range(2):
        t0 = time.time()
        trips = kg.kg_pipeline(corpus_source.corpus_dataset_by_repo(n),
                               tagger="crf", dedup="partitioned")
        n_triples = trips.count()
        times.append(time.time() - t0)
    sec = min(times)
    out = {"metric": "kg_triples_wall_sec", "value": round(sec, 3),
           "unit": "sec", "num_cpus": num_cpus, "corpus_rows": n,
           "n_triples": n_triples, "runs_sec": [round(t, 3) for t in times],
           "triples_per_sec": round(n_triples / sec, 1),
           "spill": _spill_stats()}
    ray.shutdown()
    return out


def _spill_stats() -> dict:
    """Object-store spill totals for the current Ray session (0s if the
    working set never exceeded the store).  memory_summary needs grpc
    (absent here), so read the raylet's own spill report from the
    session log — the last 'Spilled N MiB, M objects' line is the
    session-cumulative total."""
    import glob
    import re
    try:
        import ray._private.worker as w
        session = w.global_worker.node.get_session_dir_path()
        best = {"spilled_mib": 0, "spilled_objects": 0}
        for path in glob.glob(os.path.join(session, "logs", "raylet*.out")):
            with open(path, errors="replace") as f:
                for m in re.finditer(r"Spilled (\d+) MiB, (\d+) objects",
                                     f.read()):
                    mib, objs = int(m.group(1)), int(m.group(2))
                    if mib >= best["spilled_mib"]:
                        best = {"spilled_mib": mib, "spilled_objects": objs}
        return best
    except Exception:
        return {"spilled_mib": -1, "spilled_objects": -1}


def run_weak_scaling(sf_dir: str, num_cpus: int) -> dict:
    """WEAK scaling on the fixed-size 'cluster': same cpu count, 4x the
    input (default 4M -> 16M corpus files) in fresh processes.  On a
    fixed cluster a 4x input should cost ~4x wall (flat throughput);
    a ratio well above 4 means something row-superlinear or driver-side
    grows with n.  Each level also records object-store spill bytes —
    the evidence that the pipeline streams through spill territory
    rather than holding the working set in memory."""
    mults = tuple(int(x) for x in os.environ.get(
        "NERFRAY_WEAK_MULTS", "800,3200").split(","))
    results = {}
    for m in mults:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus),
                   NERFRAY_BENCH_MULT=str(m))
        p = subprocess.run(
            [sys.executable, __file__, "--single-kg"],
            env=env, capture_output=True, text=True, timeout=7200)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[m] = json.loads(line)
    lo, hi = mults[0], mults[-1]
    wall_ratio = results[hi]["value"] / results[lo]["value"]
    return {
        "metric": f"weak_scaling_wall_ratio_{hi // lo}x_input",
        "value": round(wall_ratio, 3),
        "unit": "ratio",
        "expected": float(hi // lo),
        "queries": {f"kg_triples@{m}x": results[m]["value"]
                    for m in mults},
        "corpus_rows": {str(m): results[m]["corpus_rows"] for m in mults},
        "triples_per_sec": {str(m): results[m]["triples_per_sec"]
                            for m in mults},
        "spill": {str(m): results[m].get("spill") for m in mults},
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }


def run_scale_probe(sf_dir: str, num_cpus: int) -> dict:
    """10x-headline corpus (default 1M files) in one fresh session: the
    evidence that the partitioned path's per-row cost stays flat past
    object-store-spill territory (blocks stay bounded; nothing driver-
    side grows with n). Compare triples_per_sec with the headline run."""
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    _quiet_empty_bundle_warnings()
    from nerfray import model
    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source

    model.model_artifact()
    n = corpus_source.corpus_rows_for(sf_dir) * BENCH_MULT * 10
    t0 = time.time()
    trips = kg.kg_pipeline(corpus_source.corpus_dataset_by_repo(n),
                           tagger="crf", dedup="partitioned")
    n_triples = trips.count()
    sec = time.time() - t0
    out = {"metric": "kg_triples_scale_probe_sec", "value": round(sec, 3),
           "unit": "sec", "num_cpus": num_cpus, "corpus_rows": n,
           "n_triples": n_triples,
           "triples_per_sec": round(n_triples / sec, 1),
           "spill": _spill_stats()}
    ray.shutdown()
    return out


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        out = run_scaling(sf_dir)
    elif "--single-kg" in sys.argv:
        out = run_single_kg(sf_dir, num_cpus)
    elif "--scale-probe" in sys.argv:
        out = run_scale_probe(sf_dir, num_cpus)
    elif "--weak-scaling" in sys.argv:
        out = run_weak_scaling(sf_dir, num_cpus)
    else:
        out = run_headline(sf_dir, num_cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
