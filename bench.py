"""Benchmark harness (driver contract).

Runs the headline KG-construction pipeline + representative operator
queries over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints
ONE JSON line:

  {"metric": "kg_build_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "turns": ..., "turns_per_sec": ...}

``python bench.py --scaling`` runs the same job in fresh processes at
num_cpus=N and num_cpus=4N (the sandbox stand-in for N-node vs 4N-node
clusters; currently 4 vs 16 — see run_scaling for why not 8 vs 32) on a
~7.5M-turn corpus and prints throughput at both plus the scaling
efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _ensure_corpus(sf_dir: str):
    from guac_ray.synth import corpus_for_sf

    return corpus_for_sf(sf_dir)


def run_bench(sf_dir: str, num_cpus: int, corpus_dir: str | None = None,
              kg_only: bool = False, repeats: int = 1) -> dict:
    """``repeats > 1`` re-runs the headline job and every query and
    keeps the MINIMUM — the shared host's deliverable CPU varies ~2×
    between windows (see ``--cpuprobe`` / BASELINE.md), and min-of-k is
    the standard way to measure the engine rather than the weather.
    ``--scaling`` keeps repeats=1 (it does its own min-of-N trials)."""
    import ray

    if corpus_dir:
        corpus = {
            "transcripts": os.path.join(corpus_dir, "transcripts"),
            "catalog": os.path.join(corpus_dir, "entity_catalog.parquet"),
        }
    else:
        corpus = _ensure_corpus(sf_dir)  # generation excluded from timings

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    # warm page cache (untimed) so we measure compute+shuffle, not
    # disk. count() alone is NOT a warmup: Ray satisfies parquet counts
    # from footer metadata without touching data pages — an actual
    # column materialization forces the real bytes through the cache.
    def _touch(path: str) -> int:
        d = rd.read_parquet(path)
        return sum(b.num_rows for b in d.iter_batches(
            batch_format="pyarrow", batch_size=65536))

    turns = _touch(corpus["transcripts"])
    if not kg_only:
        for t in ("lineitem", "orders", "customer", "documents", "embeddings", "events"):
            _touch(f"{sf_dir}/{t}.parquet")

    # warm the WORKER pool (untimed): first-trial spikes (r4:
    # kg_pagerank_top [10.23, 3.99]) were cold worker processes paying
    # guac_ray/pandas/numpy imports inside the first timed query. One
    # 1-row task per CPU forces every worker to pre-import the library;
    # Ray reuses those processes for all later task stages.
    def _warm_worker(batch):
        import guac_ray.pipelines.suite  # noqa: F401 (heavy import tree)
        import guac_ray.functions.joins  # noqa: F401

        return batch

    (rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2)
        .map_batches(_warm_worker, batch_size=1).materialize())

    # ---- headline: full KG construction (extract→link→dedup→write) ----
    from guac_ray.pipelines.kg import build_graph

    # sink on shm: a single local disk is the one resource a real cluster
    # scales per-node (each node writes its own shard to its own store);
    # writing the bench output through the VM's lone blockdev would
    # measure that disk, not the engine
    out_root = "/dev/shm/guac_ray_bench" if os.path.isdir("/dev/shm") else "/tmp/guac_ray_bench"
    # $GRAFT_EXCHANGE_ROOT reroutes ONLY the dedup exchange off
    # /dev/shm — the shared-mount dry run (BASELINE.md "cluster
    # story"): on a real multi-node cluster the exchange lives on the
    # shared filesystem, so the disk-backed number is the honest
    # multi-node floor; the output sink stays put so the delta
    # isolates the exchange.
    exch_root = os.environ.get("GRAFT_EXCHANGE_ROOT", out_root)
    # a FRESH process owns no live Datasets over the exchange, so clear
    # the whole base eagerly — fresh_exchange_dir's unique subdirs
    # otherwise accumulate RAM-backed copies across scaling trials.
    # ONLY on the default node-local root: a GRAFT_EXCHANGE_ROOT
    # override is the shared-mount dry run, where a blanket rmtree
    # would delete a live SIBLING driver's exchange mid-consumption —
    # exfs's owner-aware pruning handles that base instead.
    if "GRAFT_EXCHANGE_ROOT" not in os.environ:
        shutil.rmtree(f"{exch_root}/_exchange", ignore_errors=True)
    out_dir = f"{out_root}/{os.path.basename(os.path.normpath(sf_dir))}"
    # actor-pool floor sized to the node so the pool is warm before the
    # post-sort burst; ceiling leaves CPUs for shuffle tasks
    conc = (max(2, num_cpus // 2), max(2, num_cpus * 3 // 4))
    kg_sec = write_sec = float("inf")
    kg_trials: list[float] = []
    n_edges = 0
    for _ in range(max(1, repeats)):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        g = build_graph(
            corpus["transcripts"], catalog_path=corpus["catalog"],
            num_buckets=64, extract_concurrency=conc,
            exchange_dir=f"{exch_root}/_exchange",
        )
        # headline = read→sort→extract→link→global dedup, consumed (the
        # BASELINE metric is triple-extraction throughput); the output
        # write is timed separately — with the fs exchange, re-consuming
        # the edge dataset re-runs only the cheap per-bucket phase
        n_edges = g["edges"].count()
        kg_trials.append(round(time.time() - t0, 3))
        kg_sec = min(kg_sec, kg_trials[-1])
        t0 = time.time()
        g["edges"].write_parquet(os.path.join(out_dir, "edges"))
        write_sec = min(write_sec, time.time() - t0)

    # ---- representative operator queries ----
    # min-of-k with ALL raw trials reported: the shared host's
    # deliverable CPU swings ~2x between windows (BASELINE.md), so the
    # paired evidence must land in the bench record itself
    qtimes: dict[str, float] = {}
    qtrials: dict[str, list[float]] = {}
    if not kg_only:
        from guac_ray.pipelines.suite import SUITE

        bench_queries = [
            "q1_pricing_summary", "q3_building_revenue", "top_customers",
            "events_windows", "exact_dedup_docs",
            "doc_quality", "knn_search",
            "neardup_docs_minhash", "neardup_docs_simhash",
            "kg_tool_usage",
            # round-3 additions: banded range join, exact quantiles,
            # reshape roundtrip, exact prefix-filtered similarity join
            "purchase_click_window", "events_value_quantiles",
            "events_type_long", "simjoin_docs", "corpus_curation",
            # round-4 additions: fused window family, quantized pagerank,
            # full outer hash join, sketch+verify heavy hitters, tf-idf
            "events_window_funcs", "kg_pagerank_top",
            "events_customer_outer", "kg_heavy_tools", "doc_tfidf",
            "doc_decontaminate",
            # round-4 second wave: boilerplate turn removal, RE2 PII
            # scrub, fixed-point k-means, Gopher repetition signals
            "kg_strip_boilerplate", "doc_pii_scrub", "emb_kmeans",
            "doc_repetition", "kg_triangles",
            # round-4 third wave: k-core peel, linkage components,
            # rolling window family (inside events_window_funcs),
            # grouped feature scaling, line-level boilerplate
            "kg_kcore", "kg_components", "events_zscore",
            "doc_strip_lines",
            # round-4 fourth wave: order-sensitive aggregates (inside
            # events_user_stats), funnel, interval overlap join,
            # context-window chunking, exact grouped correlation
            "events_user_stats", "events_funnel", "events_span_join",
            "doc_chunks", "events_corr",
            # round-4 fifth wave: set ops, transitions, quantile
            # bucketing, weighted shortest paths, MAD, vector centroids
            "events_setops", "events_transitions",
            "events_quantile_buckets", "kg_patch_cost", "events_mad",
            "emb_label_centroids",
            # round-4 sixth wave: corpus-unigram surprisal scoring,
            # per-node clustering coefficient, grouped entropy,
            # neighbor-degree assortativity
            "doc_surprisal", "kg_clustering", "events_entropy",
            "kg_neighbor_deg", "events_percentile", "doc_entropy",
            "kg_link_predict",
            # round-5: real-format document parsers (SPDX / CycloneDX /
            # OpenVEX+CSAF fleets synthesized from part/supplier, plus
            # ITE-6 vuln/SLSA+DSSE and scorecard/deps.dev fleets)
            "kg_spdx_ingest", "kg_cdx_ingest", "kg_vex_ingest",
            "kg_ite6_ingest", "kg_depsdev_ingest",
            # round-5: SemDeDup-style cluster-bucketed semantic dedup +
            # ExactSubstr repeated-passage coverage and removal
            "emb_semdedup", "doc_dup_passages", "doc_remove_passages",
            # round-5: DSIR importance weights (target vs raw LMs),
            # edit-distance-1 entity join, image dHash near-dup,
            # fixed-point BM25 retrieval
            "doc_dsir", "supplier_name_matches", "media_neardup",
            "doc_bm25",
            # round-5 session 4: PMI collocations, OHLC resample
            # (grouped argmin/argmax), RRF hybrid retrieval, first-owner
            # n-gram novelty, association-rule mining
            "doc_pmi_collocations", "events_ohlc", "doc_hybrid_search",
            "doc_ngram_novelty", "basket_pairs",
            # round-5 session 5: bigram-LM cross-entropy (perplexity
            # filter), calendar-day streaks (gaps-and-islands),
            # daily-cohort retention matrix, rolling DAU/WAU,
            # degree assortativity, inverted-index build,
            # domain-discriminative terms
            "doc_lm_xent", "user_streaks", "events_cohort_retention",
            "events_dau_wau", "kg_assortativity", "doc_postings",
            "doc_domain_terms", "kg_degree_hist", "kg_reciprocity",
            # round-5 session 6: per-user gap quantiles (high-
            # cardinality grouped exact quantile), per-user TWAP
            "events_user_gaps", "events_twap", "orders_basket_sig",
            "doc_pii_inventory", "doc_bpe_merges", "kg_ppr_vuln", "kg_ktruss", "events_running_distinct", "doc_bpe_tokens", "events_grouping_sets", "q18_large_orders", "events_user_mad",
            # round-5 session 7: SCD2 validity-interval build,
            # robust modified-z-score outlier flags
            "events_scd2", "events_anomalies", "orders_profile",
            "events_expectations", "events_cdc_merge", "q13_order_distribution",
            "events_chi2", "events_debounce", "events_user_mode",
            "q10_returned_revenue", "events_trend", "orders_reconcile",
            "q6_forecast_revenue", "q14_promo_share", "events_hourly_spine",
            "events_asof_state",
            # round-5 session 9: remaining TPC-H composites — semi-join
            # EXISTS, decorrelated avg subquery, disjunctive pushdown
            "q4_priority_check", "q17_small_qty_revenue",
            "q19_brand_band_revenue", "q22_dormant_customers",
            "q16_supplier_variety", "q5_local_revenue",
            "q21_waiting_suppliers", "q15_top_supplier",
            "q12_priority_by_flag",
            "q7_nation_volume", "q8_market_share", "events_user_pivot", "events_acf",
            "q2_min_cost_supplier", "q11_important_parts", "events_cume_nth", "q9_product_profit",
            "q20_surge_suppliers", "events_value_hist", "events_share_of_type",
            # round-5 session 12: experimentation stats (Welch t,
            # Mann-Whitney U, KS), exact multi-feature OLS, per-user
            # fixed-point EWMA, incremental MV refresh, HITS,
            # synchronous label propagation
            "events_ab_ttest", "events_mannwhitney", "events_ks_test",
            "events_multireg", "events_user_ewma", "events_mv_refresh",
            "kg_hits", "kg_label_prop",
            # HDR quantile sketches (global + per-key)
            "events_hdr_quantiles", "events_user_hdr",
            # binary-outcome A/B + CUPED variance reduction + SRM
            "events_ab_conversion", "events_cuped", "events_srm",
            # distributed exact PCA top component
            "emb_pca_top",
        ]
        for name in bench_queries:
            fn, _ = SUITE[name]
            trials = []
            for _ in range(max(1, repeats)):
                t0 = time.time()
                res = fn(sf_dir)
                if hasattr(res, "to_pandas"):
                    res.to_pandas()
                trials.append(round(time.time() - t0, 3))
            qtimes[name] = min(trials)
            qtrials[name] = trials

    ray.shutdown()
    return {
        "metric": "kg_build_sec",
        # FIXED 32-worker probe regardless of this run's num_cpus:
        # the reading exists to compare across records, and a 4-worker
        # aggregate is ~1/8 of a 32-worker one on ANY host
        "cpu_weather_m_md5_s": quick_weather(32),
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "queries_trials": qtrials,
        "kg_trials": kg_trials,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "turns": turns,
        "edges": n_edges,
        "turns_per_sec": round(turns / kg_sec, 1),
        "write_sec": round(write_sec, 3),
    }


def run_scaling(sf_dir: str) -> dict:
    """Same job, fresh processes, N vs 4N CPUs → scaling efficiency.

    Uses the ~7.5M-turn corpus: smaller inputs are dominated by fixed
    per-job costs and cannot evidence scaling — the criterion needs a
    compute-bound job, as a real multi-node run at 10^12 turns would be.
    """
    from guac_ray.synth import ensure_scaling_corpus

    corpus_dir = ensure_scaling_corpus()["dir"]  # cached after first build

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_KG_ONLY="1", GRAFT_CORPUS_DIR=corpus_dir)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
        except subprocess.CalledProcessError as ex:
            # the child's traceback is the diagnosis — surface it
            # before aborting a multi-hour scaling run
            print(ex.stdout, file=sys.stderr)
            print(ex.stderr, file=sys.stderr)
            raise
        return json.loads(out.strip().splitlines()[-1])

    # N vs 4N at two levels: 4→16 AND 8→32. Runs that occupy the whole
    # 32-CPU VM collide with host co-tenancy (identical 32-CPU jobs
    # historically spread 38–58 s), so the 32-CPU level takes min-of-3
    # and ALL raw trials are reported — the spread of identical-config
    # trials is the isolation evidence separating host noise from
    # engine scaling.
    def best(ncpu: int, trials: int) -> tuple[dict, list[float]]:
        rs = [run(ncpu) for _ in range(trials)]
        secs = [r["value"] for r in rs]
        return min(rs, key=lambda r: r["value"]), secs

    r4, t4 = best(4, 2)
    r8, t8 = best(8, 2)
    r16, t16 = best(16, 2)
    r32, t32 = best(32, 3)
    eff_4_16 = (r4["value"] / r16["value"]) / 4
    eff_8_32 = (r8["value"] / r32["value"]) / 4
    # headline "value" = the 4→16 pair (driver criterion is ANY N vs 4N;
    # ≤16 vCPUs is the regime where this host delivers linear CPU — see
    # --cpuprobe). The 8→32 pair and all raw trials are reported
    # alongside; BASELINE.md carries the isolation analysis.
    return {
        "metric": "scaling_efficiency",
        "value": round(eff_4_16, 3),
        "unit": "ratio",
        "eff_4_16": round(eff_4_16, 3),
        "eff_8_32": round(eff_8_32, 3),
        "sec_4": r4["value"], "sec_8": r8["value"],
        "sec_16": r16["value"], "sec_32": r32["value"],
        "trials_sec": {"4": t4, "8": t8, "16": t16, "32": t32},
        "turns_per_sec_16": r16["turns_per_sec"],
        "turns_per_sec_32": r32["turns_per_sec"],
        "turns": r4["turns"],
        "num_cpus_lo": 4,
        "num_cpus_hi": 16,
        "sf": "scaling(~7.5M turns)",
    }


def _burn(_n):
    """Pure-CPU probe worker: tight md5 chain, ~zero memory traffic."""
    return _burn_for(6.0)


def _burn_for(secs: float):
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    it = 0
    while time.time() - t0 < secs:
        for _ in range(2000):
            h = hashlib.md5(h).digest()
        it += 2000
    return it


def _burn_short(_n):
    return _burn_for(1.5)


def quick_weather(workers: int = 32) -> float:
    """One-point host-CPU-delivery reading (aggregate M md5/s at
    ``workers`` procs, 1.5 s) stamped into every bench record: this
    shared host's deliverable CPU swings ~2× between windows (full
    probe history in BASELINE.md — e.g. 52.4 M md5/s in the round-3
    window vs 32.7 in a round-4 window, which alone rescales every
    wall-time by 1.6×), so a bench number is only comparable across
    rounds TOGETHER with its same-window weather reading."""
    import multiprocessing as mp

    with mp.Pool(workers) as p:
        t0 = time.time()
        tot = sum(p.map(_burn_short, range(workers)))
    return round(tot / (time.time() - t0) / 1e6, 2)


def run_cpuprobe() -> dict:
    """Host-CPU-delivery isolation experiment (no Ray, no engine): if
    aggregate pure-CPU throughput itself scales sub-linearly from N to
    4N processes, the VM's vCPUs are not backed by that many deliverable
    cores and NO engine can reach 0.8 on this box — the engine's scaling
    efficiency must be read relative to this ceiling."""
    import multiprocessing as mp

    out = {}
    for w in (4, 8, 16, 32):
        with mp.Pool(w) as p:
            t0 = time.time()
            tot = sum(p.map(_burn, range(w)))
            out[str(w)] = round(tot / (time.time() - t0) / 1e6, 2)
    return {
        "metric": "cpu_delivery_probe",
        "unit": "M md5/s aggregate",
        "throughput": out,
        "eff_4_16": round(out["16"] / out["4"] / 4, 3),
        "eff_8_32": round(out["32"] / out["8"] / 4, 3),
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--cpuprobe" in sys.argv:
        print(json.dumps(run_cpuprobe()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        kg_only = bool(os.environ.get("GRAFT_KG_ONLY"))
        print(json.dumps(run_bench(
            sf_dir, ncpu,
            corpus_dir=os.environ.get("GRAFT_CORPUS_DIR"),
            kg_only=kg_only,
            # scaling trials (kg_only) do their own min-of-N in fresh
            # processes; the standalone bench takes best-of-2 in-process
            repeats=1 if kg_only else 2,
        )))
