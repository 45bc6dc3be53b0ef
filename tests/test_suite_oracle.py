"""Driver-gate mimic inside pytest: a fast subset of the suite compared
against its DuckDB oracle at sf0.001 (the full 60-query sweep runs via
tools/check_oracle.py at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

FAST = [
    "q1_pricing_summary",
    "orders_cube",
    "doc_decontaminate",
    "distinct_segments",
    "exact_dedup_docs",
    "doc_top_bigrams",
    "doc_quality",
    "doc_tfidf",
    "knn_search",
    "doc_pii_scrub",
    "doc_repetition",
    "emb_kmeans",
    "events_user_stats",
    "events_rank_dense",
    "events_samples",
    "events_customer_outer",
    # round-4 fourth wave
    "events_funnel",
    "events_span_join",
    "doc_chunks",
    "events_corr",
    "events_setops",
    "events_transitions",
    "events_quantile_buckets",
    # round-4 fifth wave
    "kg_patch_cost",
    "events_mad",
    "emb_label_centroids",
    "events_range_windows",
    "events_props_agg",
    "doc_weighted_sample",
    # round-4 sixth wave
    "doc_surprisal",
    "events_entropy",
    "events_percentile",
    "doc_entropy",
    # round 5: real-format SBOM / VEX document ingest
    "kg_spdx_ingest",
    "kg_cdx_ingest",
    "kg_vex_ingest",
    # round 5: attestation / metadata document ingest
    "kg_ite6_ingest",
    "kg_depsdev_ingest",
    # round 5: SemDeDup-style cluster-bucketed semantic dedup +
    # ExactSubstr repeated-passage coverage and removal
    "emb_semdedup",
    "doc_dup_passages",
    "doc_remove_passages",
    # round 5: DSIR importance weights + edit-distance entity join +
    # fixed-point BM25 retrieval
    "doc_dsir",
    "supplier_name_matches",
    "doc_bm25",
    # round 5, session 4: corpus-statistics / retrieval wave
    "doc_pmi_collocations",
    "events_ohlc",
    "doc_hybrid_search",
    "doc_ngram_novelty",
    "basket_pairs",
    # round 5, session 5: LM scoring / analytics wave
    "doc_lm_xent",
    "user_streaks",
    "events_cohort_retention",
    "events_dau_wau",
    "kg_assortativity",
    "doc_postings",
    "doc_domain_terms",
    "kg_degree_hist",
    "kg_reciprocity",
    # round 5, session 8: CDC merge + Q13 composite
    "events_cdc_merge",
    "q13_order_distribution",
    "events_chi2",
    "events_debounce",
    "events_user_mode",
    "q10_returned_revenue",
    "events_trend",
    "orders_reconcile",
    "q6_forecast_revenue",
    "q14_promo_share",
    "events_hourly_spine",
    "events_asof_state",
    # round 5, session 9: remaining TPC-H composite shapes
    "q4_priority_check",
    "q17_small_qty_revenue",
    "q19_brand_band_revenue",
    "q22_dormant_customers",
    "q16_supplier_variety",
    "q5_local_revenue",
    "q21_waiting_suppliers",
    "q15_top_supplier",
    "q12_priority_by_flag",
    "q7_nation_volume",
    "q8_market_share",
    "events_user_pivot",
    "events_acf",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "events_cume_nth",
    "q9_product_profit",
    "q20_surge_suppliers",
    "events_value_hist",
    "events_share_of_type",
]


def test_q13_keeps_zero_order_customers(ray_session, tmp_path):
    """The point of Q13's LEFT join: customers with no qualifying
    orders land in the c_count = 0 class (sf0.001 has none, so the
    oracle-parity run alone would not pin this branch)."""
    import pandas as pd

    from guac_ray.pipelines.suite import q13_order_distribution

    pd.DataFrame({"c_custkey": [1, 2, 3, 4]}).to_parquet(
        tmp_path / "customer.parquet")
    # c1: two non-urgent; c2: urgent only (filtered → zero class);
    # c3: none at all; c4: one non-urgent.
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 4],
        "o_orderpriority": ["2-HIGH", "5-LOW", "1-URGENT", "3-MEDIUM"],
    }).to_parquet(tmp_path / "orders.parquet")
    got = (q13_order_distribution(str(tmp_path)).to_pandas()
           .sort_values("c_count").reset_index(drop=True))
    assert got.values.tolist() == [[0, 2], [1, 1], [2, 1]]


def test_q4_semi_counts_order_once(ray_session, tmp_path):
    """An order with SEVERAL returned lineitems is one EXISTS hit —
    the semi join must not multiply it; an order with no returned
    lineitem (or none at all) must drop."""
    import pandas as pd

    from guac_ray.pipelines.suite import q4_priority_check

    d = pd.Timestamp("1996-02-01")
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_orderpriority": ["2-HIGH", "2-HIGH", "5-LOW", "5-LOW"],
        "o_orderdate": [d, d, d, pd.Timestamp("1997-01-01")],
    }).to_parquet(tmp_path / "orders.parquet")
    # o1: three returned rows (counts once); o2: non-returned only
    # (drops); o3: one returned (counts); o4: returned but OUTSIDE the
    # window (drops at the orders scan).
    pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2, 3, 4],
        "l_returnflag": ["R", "R", "R", "N", "R", "R"],
    }).to_parquet(tmp_path / "lineitem.parquet")
    got = (q4_priority_check(str(tmp_path)).to_pandas()
           .sort_values("o_orderpriority").reset_index(drop=True))
    assert got.values.tolist() == [["2-HIGH", 1], ["5-LOW", 1]]


def test_q17_threshold_is_strict(ray_session, tmp_path):
    """The 20%-of-average predicate is STRICT less-than in exact
    integers: a quantity landing exactly on 0.2·avg must be excluded
    (5·qc·n == qsum), one cent below must be included."""
    import pandas as pd

    from guac_ray.pipelines.suite import q17_small_qty_revenue

    # part 7: quantities (1, 4, 10) → sum 15, n 3, avg 5 → 0.2·avg = 1.
    #   qty 1 is exactly the threshold (5·100·3 == 1500) → EXCLUDED.
    # part 8: quantities (0.99, 4.01, 10) → threshold 1.0, qty 0.99
    #   one cent below (5·99·3 = 1485 < 1500) → INCLUDED (price 7.00).
    pd.DataFrame({
        "l_partkey": [7, 7, 7, 8, 8, 8],
        "l_quantity": [1.0, 4.0, 10.0, 0.99, 4.01, 10.0],
        "l_extendedprice": [5.0, 5.0, 5.0, 7.0, 5.0, 5.0],
    }).to_parquet(tmp_path / "lineitem.parquet")
    got = q17_small_qty_revenue(str(tmp_path)).to_pandas()
    assert got.revenue_cents.tolist() == [700]
    assert got.n_rows.tolist() == [1]


def test_q22_dormancy_is_window_anti(ray_session, tmp_path):
    """Rich + only OLD orders → dormant (kept); rich + one RECENT
    order → dropped by the anti join; poor + no orders at all →
    dropped by the balance predicate; negative balances count toward
    neither the positive average nor the rich set."""
    import pandas as pd

    from guac_ray.pipelines.suite import q22_dormant_customers

    # positive balances: 100, 100, 700 → avg 300. Rich (> 300): c3
    # (700). c4 (-50) is excluded from the average (else avg = 212.5
    # and c1/c2 flip). Make c3 dormant, and add c5 (400, rich) with a
    # recent order to pin the anti side.
    pd.DataFrame({
        "c_custkey": [1, 2, 3, 4, 5],
        "c_nationkey": [7, 7, 9, 9, 9],
        "c_acctbal": [100.0, 100.0, 700.0, -50.0, 400.0],
    }).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame({
        "o_custkey": [3, 5],
        "o_orderdate": [pd.Timestamp("1998-06-01"),   # old → stays dormant
                        pd.Timestamp("2000-06-01")],  # recent → drops
    }).to_parquet(tmp_path / "orders.parquet")
    # avg positive = (100+100+700+400)/4 = 325 → rich: c3, c5.
    got = q22_dormant_customers(str(tmp_path)).to_pandas()
    assert got.values.tolist() == [[9, 1, 70000]]


def test_q21_sole_late_supplier_logic(ray_session, tmp_path):
    """Order 1: suppliers {1, 2}, only supplier 1 late with TWO late
    rows → supplier 1 gets numwait 2 (rows, not orders). Order 2: both
    suppliers late → NOT EXISTS kills it. Order 3: single-supplier
    late → EXISTS kills it. Order 4: sole-late but o_orderstatus='O' →
    the finalized gate kills it. Supplier 9 (NATION_5) would qualify
    on order 5 but is filtered by the nation dimension."""
    import pandas as pd

    from guac_ray.pipelines.suite import q21_waiting_suppliers

    pd.DataFrame({
        "l_orderkey": [1, 1, 1, 1, 2, 2, 3, 4, 4, 5, 5],
        "l_suppkey":  [1, 1, 1, 2, 1, 2, 1, 1, 2, 9, 1],
        "l_returnflag": ["R", "R", "N", "N", "R", "R", "R",
                         "R", "N", "R", "N"],
    }).to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_orderstatus": ["F", "F", "F", "O", "F"],
    }).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({
        "s_suppkey": [1, 2, 9],
        "s_name": ["SUPP_1", "SUPP_2", "SUPP_9"],
        "s_nationkey": [3, 3, 5],
    }).to_parquet(tmp_path / "supplier.parquet")
    pd.DataFrame({
        "n_nationkey": [3, 5],
        "n_name": ["NATION_3", "NATION_5"],
    }).to_parquet(tmp_path / "nation.parquet")

    got = q21_waiting_suppliers(str(tmp_path)).to_pandas()
    assert got.values.tolist() == [["SUPP_1", 2]]


def test_q15_max_tie_keeps_both(ray_session, tmp_path):
    """Two suppliers tied at the exact-cents maximum both survive the
    scalar-subquery filter (the reason Q15 runs on cents, not floats)."""
    import pandas as pd

    from guac_ray.pipelines.suite import q15_top_supplier

    pd.DataFrame({
        "l_suppkey": [1, 2, 2, 3],
        "l_extendedprice": [200.0, 150.0, 50.0, 120.0],
        "l_discount": [0.0, 0.0, 0.0, 0.0],
        "l_shipdate": [pd.Timestamp("1996-02-01")] * 4,
    }).to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({
        "s_suppkey": [1, 2, 3],
        "s_name": ["A", "B", "C"],
    }).to_parquet(tmp_path / "supplier.parquet")

    got = (q15_top_supplier(str(tmp_path)).to_pandas()
           .sort_values("s_suppkey").reset_index(drop=True))
    assert got.values.tolist() == [[1, "A", 20000], [2, "B", 20000]]


def test_q7_pair_is_directional_not_reflexive(ray_session, tmp_path):
    """Both directions of the (9, 6) pair emit separate rows; a
    supplier and customer in the SAME nation never count (snat !=
    cnat); nations outside the pair are invisible."""
    import pandas as pd

    from guac_ray.pipelines.suite import q7_nation_volume

    pd.DataFrame({
        "l_orderkey": [1, 2, 3, 4],
        "l_suppkey": [1, 2, 1, 3],
        "l_shipdate": [pd.Timestamp("1996-05-01")] * 4,
        "l_extendedprice": [100.0, 200.0, 400.0, 800.0],
        "l_discount": [0.0, 0.0, 0.0, 0.0],
    }).to_parquet(tmp_path / "lineitem.parquet")
    # order 1: supp N9 -> cust N6; order 2: supp N6 -> cust N9;
    # order 3: supp N9 -> cust N9 (reflexive, dropped);
    # order 4: supp N4 -> cust N6 (outside pair, dropped)
    pd.DataFrame({"o_orderkey": [1, 2, 3, 4],
                  "o_custkey": [6, 9, 9, 6]}).to_parquet(
        tmp_path / "orders.parquet")
    pd.DataFrame({"c_custkey": [6, 9],
                  "c_nationkey": [6, 9]}).to_parquet(
        tmp_path / "customer.parquet")
    pd.DataFrame({"s_suppkey": [1, 2, 3],
                  "s_nationkey": [9, 6, 4]}).to_parquet(
        tmp_path / "supplier.parquet")
    pd.DataFrame({"n_nationkey": [4, 6, 9],
                  "n_name": ["NATION_4", "NATION_6", "NATION_9"],
                  "n_regionkey": [0, 0, 0]}).to_parquet(
        tmp_path / "nation.parquet")

    got = (q7_nation_volume(str(tmp_path)).to_pandas()
           .sort_values("supp_nation").reset_index(drop=True))
    assert got.values.tolist() == [
        ["NATION_6", "NATION_9", 1996, 20000],
        ["NATION_9", "NATION_6", 1996, 10000]]


def test_q2_argmin_ties_keep_all_minimal(ray_session, tmp_path):
    """Two suppliers tied at a part's minimum cost BOTH survive the
    join-back (exact cents make the tie well-defined); the
    higher-cost supplier drops; a part outside the size/type class is
    invisible even with a valid minimum."""
    import pandas as pd

    from guac_ray.pipelines.suite import q2_min_cost_supplier

    pd.DataFrame({
        "l_partkey": [1, 1, 1, 1, 2],
        "l_suppkey": [1, 1, 2, 3, 1],
        # supplier 1 ships part 1 at 5.00 then 3.00 (min 3.00);
        # supplier 2 at 3.00 (tie); supplier 3 at 9.00 (drops)
        "l_extendedprice": [5.0, 3.0, 3.0, 9.0, 1.0],
    }).to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({
        "p_partkey": [1, 2],
        "p_size": [15, 15],
        "p_type": ["STANDARD BRUSHED", "PROMO PLATED"],  # part 2 filtered
    }).to_parquet(tmp_path / "part.parquet")
    pd.DataFrame({
        "s_suppkey": [1, 2, 3],
        "s_name": ["SA", "SB", "SC"],
        "s_nationkey": [0, 0, 0],
    }).to_parquet(tmp_path / "supplier.parquet")
    pd.DataFrame({"n_nationkey": [0], "n_name": ["NATION_0"]}
                 ).to_parquet(tmp_path / "nation.parquet")

    got = (q2_min_cost_supplier(str(tmp_path)).to_pandas()
           .sort_values("s_name").reset_index(drop=True))
    assert got.values.tolist() == [
        [1, "SA", "NATION_0", 300], [1, "SB", "NATION_0", 300]]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(name, con, ray_session):
    import pyarrow as pa
    from ray.data import Dataset

    from guac_ray.pipelines.suite import SUITE, resolve_sql

    fn, sql = SUITE[name]
    sql = resolve_sql(sql, SF)
    got = fn(SF)
    if isinstance(got, Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    want = con.execute(sql).df()
    g, w = _norm(got), _norm(want)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_every_registered_query_executes(ray_session):
    """Registry-wide smoke guard: every SUITE entry must RUN at sf0.001
    and produce a consumable result — the driver's gate calls exactly
    these callables, so an import error, a renamed column, or a
    scale-edge crash in ANY entry (in-gate or past-cap) fails here
    before it fails on the driver record. Oracle VALUE comparison is
    the FAST list above + tools/check_oracle.py; this asserts
    executability only."""
    import pyarrow as pa
    from ray.data import Dataset

    from guac_ray.pipelines.suite import SUITE

    failures = {}
    for name, (fn, _) in SUITE.items():
        try:
            res = fn(SF)
            if isinstance(res, (Dataset,)):
                res = res.to_pandas()
            elif isinstance(res, pa.Table):
                res = res.to_pandas()
            assert res is not None
        except Exception as e:  # collect all, report once
            failures[name] = repr(e)[:200]
    assert not failures, f"queries failed to execute: {failures}"
