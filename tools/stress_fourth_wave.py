"""10x stress probe for the fourth-wave operators (funnel, interval
overlap join, set ops, grouped corr, transitions, chunking, enriched
user stats): replicate the sf0.1 events/documents tables k times with
shifted keys (users/docs stay distinct across copies, so group
cardinality scales with data — the honest scaling axis for keyed
operators), run each query over the replica dir, print one JSON line
with wall times + the same weather stamp bench.py uses.

Usage: python tools/stress_fourth_wave.py [k]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

QUERIES = [
    "events_user_stats", "events_funnel", "events_span_join",
    "events_corr", "events_setops", "events_transitions",
    "events_quantile_buckets", "doc_chunks",
    # fifth wave (events/documents-fed only; kg/embeddings ops have
    # their own corpora)
    "events_mad", "events_range_windows", "events_props_agg",
    # sixth wave
    "events_entropy", "doc_surprisal", "events_percentile",
    "doc_entropy",
    # round 5: vectorized single-pass decontamination (mark join)
    "doc_decontaminate",
    # round 5, sessions 4-5 (events/documents-fed members; kg /
    # embeddings / orders ops have their own corpora or dims):
    "events_ohlc", "doc_pmi_collocations", "doc_ngram_novelty",
    "doc_lm_xent", "user_streaks", "events_cohort_retention",
    "events_dau_wau",
    # round 5, session 6 (events/documents-fed members):
    "events_user_gaps", "events_twap", "doc_pii_inventory",
    "doc_bpe_merges", "events_running_distinct", "doc_bpe_tokens",
    "events_user_mad", "events_grouping_sets",
    # round 5, sessions 7-8 (events-fed members; q13/orders_profile
    # ride the orders corpus):
    "events_scd2", "events_anomalies", "events_expectations",
    "events_cdc_merge", "events_chi2", "events_debounce",
    "events_user_mode", "events_trend", "events_hourly_spine",
    # round 5, sessions 9-10: the TPC-H composite wave rides the
    # replicated lineitem/orders/part facts (orderkey + partkey
    # strides; supplier/nation stay FIXED dimensions, so broadcasts
    # hold constant while pair cardinality and exchanges scale with
    # k — the honest axis for the composite-key joins), plus the
    # events-fed window/pivot/acf additions:
    "q4_priority_check", "q17_small_qty_revenue",
    "q19_brand_band_revenue", "q22_dormant_customers",
    "q16_supplier_variety", "q5_local_revenue",
    "q21_waiting_suppliers", "q15_top_supplier",
    "q12_priority_by_flag", "q7_nation_volume", "q8_market_share",
    "q2_min_cost_supplier", "q11_important_parts",
    "q9_product_profit", "q20_surge_suppliers",
    "events_user_pivot", "events_acf", "events_cume_nth",
    # round 5, session 12 (events-fed members; kg_hits/kg_label_prop
    # ride the KG corpus): experimentation stats, exact multi-feature
    # OLS, fixed-point EWMA, incremental MV refresh
    "events_ab_ttest", "events_mannwhitney", "events_ks_test",
    "events_multireg", "events_user_ewma", "events_mv_refresh",
    "events_hdr_quantiles", "events_user_hdr",
    "events_ab_conversion", "events_cuped", "events_srm",
]


def build_replica(sf_dir: str, out_dir: str, k: int) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # ONE user-key stride covering BOTH key spaces: customer keys span
    # past events.user_id (c_custkey max 10x user max on this corpus),
    # so striding by user-max alone would overlap the replicated
    # custkey ranges — duplicate keys with conflicting attributes and
    # an unsorted customer table (silently corrupted dimension joins)
    n_users = max(
        int(ev.user_id.max()),
        int(pd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"]).c_custkey.max())) + 1
    n_events = int(ev.event_id.max()) + 1
    parts = []
    for i in range(k):
        c = ev.copy()
        c["user_id"] = c.user_id + i * n_users
        c["event_id"] = c.event_id + i * n_events
        parts.append(c)
    allev = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(allev, preserve_index=False)
                   .replace_schema_metadata(None),
                   f"{out_dir}/events.parquet")
    counts["events"] = len(allev)

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_docs = int(docs.doc_id.max()) + 1
    parts = []
    for i in range(k):
        c = docs.copy()
        c["doc_id"] = c.doc_id + i * n_docs
        parts.append(c)
    alldocs = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(alldocs, preserve_index=False)
                   .replace_schema_metadata(None),
                   f"{out_dir}/documents.parquet")
    counts["documents"] = len(alldocs)

    # customer replicates with the SAME user stride so
    # events_expectations' fk check (user_id -> c_custkey) stays
    # satisfied at k-times scale
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    parts = []
    for i in range(k):
        c = cust.copy()
        c["c_custkey"] = c.c_custkey + i * n_users
        parts.append(c)
    allcust = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(allcust, preserve_index=False)
                   .replace_schema_metadata(None),
                   f"{out_dir}/customer.parquet")
    counts["customer"] = len(allcust)

    # TPC-H facts: lineitem/orders replicate with orderkey + partkey
    # strides (orders' custkey rides the SAME user stride as customer,
    # so every fk stays closed); part replicates with the partkey
    # stride; supplier/nation/region copy VERBATIM — they are
    # dimensions, so the broadcast side of every composite stays
    # constant while the exchanges scale with k.
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    n_orders = int(orders.o_orderkey.max()) + 1
    n_parts = int(part.p_partkey.max()) + 1
    parts = []
    for i in range(k):
        c = orders.copy()
        c["o_orderkey"] = c.o_orderkey + i * n_orders
        c["o_custkey"] = c.o_custkey + i * n_users
        parts.append(c)
    allord = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(allord, preserve_index=False)
                   .replace_schema_metadata(None),
                   f"{out_dir}/orders.parquet")
    counts["orders"] = len(allord)
    parts = []
    for i in range(k):
        c = li.copy()
        c["l_orderkey"] = c.l_orderkey + i * n_orders
        c["l_partkey"] = c.l_partkey + i * n_parts
        parts.append(c)
    allli = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(allli, preserve_index=False)
                   .replace_schema_metadata(None),
                   f"{out_dir}/lineitem.parquet")
    counts["lineitem"] = len(allli)
    parts = []
    for i in range(k):
        c = part.copy()
        c["p_partkey"] = c.p_partkey + i * n_parts
        parts.append(c)
    allpart = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(allpart, preserve_index=False)
                   .replace_schema_metadata(None),
                   f"{out_dir}/part.parquet")
    counts["part"] = len(allpart)
    for dim in ("supplier", "nation", "region"):
        pq.write_table(pq.read_table(f"{sf_dir}/{dim}.parquet"),
                       f"{out_dir}/{dim}.parquet")
    return counts


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/guac_ray_stress_{k}x"
    counts = build_replica(sf_dir, out_dir, k)

    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import quick_weather
    from guac_ray.pipelines.suite import SUITE

    times = {}
    for name in QUERIES:
        fn, _ = SUITE[name]
        t0 = time.time()
        res = fn(out_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        times[name] = round(time.time() - t0, 3)
    rec = {
        "metric": "fourth_wave_10x",
        "k": k,
        "rows": counts,
        "cpu_weather_m_md5_s": quick_weather(),
        "times_sec": times,
    }
    ray.shutdown()
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
