"""Distributed exact quantiles (functions/quantiles.py) vs a local
reference implementing the same quantile_disc rank rule."""

import math

import numpy as np
import pandas as pd
import pytest


def _disc(values: np.ndarray, p: float):
    from fractions import Fraction

    v = np.sort(values[~pd.isna(values)])
    # DuckDB quantile_disc rank: ceil(p*n)-1 in EXACT decimal arithmetic
    r = int(math.ceil(Fraction(str(p)) * len(v))) - 1
    return v[min(max(r, 0), len(v) - 1)]


def test_rank_rule_matches_duckdb_at_float_boundaries():
    """p*(n-1) hits float-representation boundaries (0.55*99 etc.) —
    the local rule and DuckDB must agree exactly there."""
    import duckdb

    for n, ps in [(100, [0.55, 0.54, 0.9, 0.99]), (450, [0.54, 0.55]),
                  (4, [0.25, 0.5, 0.75]), (5, [0.5]), (3, [0.33])]:
        vals = np.arange(n, dtype="float64")
        for p in ps:
            want = duckdb.sql(
                f"SELECT quantile_disc(x, {p}) FROM "
                f"(SELECT unnest(range({n}))::DOUBLE x)").fetchone()[0]
            assert _disc(vals, p) == want, (n, p)


class TestExactQuantiles:
    def test_global_matches_reference(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.quantiles import exact_quantiles

        rng = np.random.default_rng(7)
        df = pd.DataFrame({"x": rng.lognormal(0, 2, 20_000)})
        got = exact_quantiles(
            rd.from_pandas(df).repartition(6), "x",
            {"p50": 0.5, "p95": 0.95, "p01": 0.01}, num_range_buckets=64)
        assert len(got) == 1
        for name, p in [("p50", 0.5), ("p95", 0.95), ("p01", 0.01)]:
            assert got[name].iloc[0] == _disc(df.x.to_numpy(), p)

    def test_grouped_skewed_groups(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.quantiles import exact_quantiles

        rng = np.random.default_rng(8)
        # one huge group, several tiny ones (incl. a 1-row group)
        g = np.concatenate([
            np.repeat("big", 15_000),
            np.repeat("mid", 500),
            np.repeat("tiny", 3),
            ["one"],
        ])
        df = pd.DataFrame({"g": g, "x": rng.normal(0, 10, len(g))})
        got = exact_quantiles(
            rd.from_pandas(df).repartition(5), "x",
            {"p50": 0.5, "p99": 0.99}, by=["g"], num_range_buckets=32,
            num_buckets=4).set_index("g")
        for name, sub in df.groupby("g"):
            for qname, p in [("p50", 0.5), ("p99", 0.99)]:
                assert got.loc[name, qname] == _disc(sub.x.to_numpy(), p), (name, qname)

    def test_integer_dtype_and_nans(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.quantiles import exact_quantiles

        rng = np.random.default_rng(9)
        x = rng.integers(0, 1000, 5000).astype("float64")
        x[::7] = np.nan  # NULL semantics: excluded
        df = pd.DataFrame({"x": x})
        got = exact_quantiles(rd.from_pandas(df).repartition(3), "x",
                              {"p50": 0.5}, num_range_buckets=16)
        assert got["p50"].iloc[0] == _disc(x, 0.5)

    def test_candidate_cap_raises(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.quantiles import exact_quantiles

        df = pd.DataFrame({"x": np.arange(4000, dtype="float64")})
        with pytest.raises(MemoryError, match="num_range_buckets"):
            exact_quantiles(rd.from_pandas(df), "x", {"p50": 0.5},
                            num_range_buckets=2, candidate_cap=100)


def test_empty_input(ray_session):
    import ray.data as rd

    from guac_ray.functions.quantiles import exact_quantiles

    df = pd.DataFrame({"x": pd.Series([], dtype="float64")})
    out = exact_quantiles(rd.from_pandas(df), "x", {"p50": 0.5})
    assert len(out) == 0 and list(out.columns) == ["p50"]


class TestInterpolatedQuantiles:
    def test_matches_duckdb_quantile_cont(self, ray_session):
        """Randomized grouped parity with quantile_cont, incl. a tiny
        splitter count so lo/ceil ranks straddle range buckets."""
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.quantiles import exact_quantiles

        rng = np.random.default_rng(8)
        df = pd.DataFrame({
            "g": rng.integers(0, 7, 4000),
            "v": rng.normal(0, 1000, 4000),
        })
        got = exact_quantiles(
            rd.from_pandas(df).repartition(5), "v",
            {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p999": 0.999},
            by=["g"], num_range_buckets=4, num_buckets=4,
            interpolate=True).sort_values("g").reset_index(drop=True)
        want = duckdb.connect().execute("""
            SELECT g, quantile_cont(v, 0.25) p25, quantile_cont(v, 0.5) p50,
                   quantile_cont(v, 0.75) p75, quantile_cont(v, 0.999) p999
            FROM df GROUP BY g ORDER BY g
        """).df()
        for c in ("p25", "p50", "p75", "p999"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    def test_pinned_lerp_form_and_integral_rank(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.quantiles import exact_quantiles

        # the discriminating probe: p=0.75 over {0.1, 0.3} must give the
        # lerp-form double 0.24999999999999997, not 0.25
        ds = rd.from_pandas(pd.DataFrame({"v": [0.1, 0.3]}))
        r = exact_quantiles(ds, "v", {"q": 0.75}, interpolate=True)
        assert r["q"].iloc[0] == 0.24999999999999997
        # integral h: p=0.5 over 3 values hits rank 1 exactly, no lerp
        ds3 = rd.from_pandas(pd.DataFrame({"v": [10, 20, 30]}))
        r3 = exact_quantiles(ds3, "v", {"q": 0.5}, interpolate=True)
        assert r3["q"].iloc[0] == 20.0 and isinstance(r3["q"].iloc[0], float)

    def test_int_column_returns_double(self, ray_session):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.quantiles import exact_quantiles

        rng = np.random.default_rng(9)
        df = pd.DataFrame({"v": rng.integers(-10**6, 10**6, 999)})
        got = exact_quantiles(rd.from_pandas(df), "v",
                              {"q": 0.37}, interpolate=True)
        want = duckdb.connect().execute(
            "SELECT quantile_cont(v, 0.37) q FROM df").fetchone()[0]
        assert got["q"].iloc[0] == want


class TestGroupedRobustStats:
    """High-cardinality per-key exact median + MAD."""

    def test_hand_computed(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.quantiles import grouped_robust_stats

        # u=1 values [1,2,3,4,100]: median=3 (disc), devs [2,1,0,1,97]
        # sorted [0,1,1,2,97] -> MAD = 1. u=2 single value: MAD 0.
        df = pd.DataFrame({
            "k": [1, 1, 1, 1, 1, 2],
            "v": [1, 2, 3, 4, 100, 7],
        })
        got = grouped_robust_stats(
            rd.from_pandas(df).repartition(3), "k", "v",
            exchange_base=str(tmp_path / "r"), num_buckets=4,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        assert got[["k", "n", "median_cents", "mad_cents"]] \
            .values.tolist() == [[1, 5, 3, 1], [2, 1, 7, 0]]

    def test_even_count_disc_rank_and_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.quantiles import grouped_robust_stats

        # n=4: disc rank ceil(2)-1 = 1 -> the LOWER middle (20);
        # devs |10-20|,|20-20|,|30-20|,|40-20| = [10,0,10,20] sorted
        # [0,10,10,20] -> MAD = disc idx 1 = 10
        df = pd.DataFrame({"k": [9] * 4, "v": [10, 20, 30, 40]})
        got = grouped_robust_stats(
            rd.from_pandas(df).repartition(2), "k", "v",
            exchange_base=str(tmp_path / "e2"), num_buckets=2).to_pandas()
        assert got[["n", "median_cents", "mad_cents"]] \
            .values.tolist() == [[4, 20, 10]]
        empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "v": pd.Series([], dtype="int64")})
        out = grouped_robust_stats(rd.from_pandas(empty), "k", "v",
                                   exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["k", "n", "median_cents", "mad_cents"]) \
            <= set(out.schema().names)


class TestEventsAnomalies:
    """Modified z-score outlier flags (suite.events_anomalies logic):
    the integer cross-multiplied Iglewicz–Hoaglin rule over the
    grouped_robust_stats → hash_join composition, checked end-to-end
    on a hand-planted outlier."""

    def test_planted_outlier_flagged(self, ray_session, tmp_path,
                                     monkeypatch):
        import numpy as np
        import pandas as pd

        import duckdb

        from guac_ray.pipelines import suite

        # user 1: values clustered at ~10.00 with one 500.00 spike —
        # median 1000c, MAD small, spike flagged; user 2: constant
        # values (MAD 0) plus ONE deviating row — any dev > 0 flags
        # under the rule (dev*6745 > 0), the documented MAD=0 edge.
        df = pd.DataFrame({
            "event_id": range(1, 9),
            "user_id": [1, 1, 1, 1, 1, 2, 2, 2],
            "value": [9.9, 10.0, 10.1, 10.2, 500.0, 7.0, 7.0, 7.25],
        })
        p = tmp_path / "events.parquet"
        df.to_parquet(p)
        monkeypatch.setattr(
            suite, "_exchange",
            lambda name: str(tmp_path / "ex" / name))
        got = suite.events_anomalies(str(tmp_path)).to_pandas()
        got = got.sort_values("event_id").reset_index(drop=True)
        oracle = duckdb.sql(
            suite.EVENTS_ANOMALIES_SQL.replace(
                "FROM events", f"FROM '{p}'")
        ).df().sort_values("event_id").reset_index(drop=True)
        assert got["event_id"].tolist() == [5, 8]
        assert got[["event_id", "value_cents", "median_cents",
                    "mad_cents", "dev_cents"]].values.tolist() == \
            oracle[["event_id", "value_cents", "median_cents",
                    "mad_cents", "dev_cents"]].values.tolist()
