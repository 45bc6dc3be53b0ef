"""Grouped feature scaling (functions/scale.py) vs a pandas reference
and its own two join regimes."""

import numpy as np
import pandas as pd
import pytest


def _df(n=2000, seed=11, groups=6):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.integers(0, groups, n),
        "v": rng.integers(-5000, 5000, n).astype("int64"),
        "i": np.arange(n, dtype="int64"),
    })


def _ref(df):
    out = df.copy()
    g = df.groupby("g")["v"]
    s, q = g.transform("sum"), g.transform(lambda x: (x * x).sum())
    n = g.transform("count")
    mn, mx = g.transform("min"), g.transform("max")
    vf, sf, qf, nf = (a.to_numpy().astype("float64")
                      for a in (df["v"], s, q, n))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = (vf - sf / nf) / np.sqrt((qf - (sf * sf) / nf) / nf)
        mm = ((df["v"] - mn).to_numpy().astype("float64")
              / (mx - mn).to_numpy().astype("float64"))
    const = (mn == mx).to_numpy()
    out["z"] = np.where(const, 0.0, z)
    out["mm"] = np.where(const, 0.0, mm)
    return out


class TestFeatureScale:
    @pytest.mark.parametrize("bl", [100_000, 0])  # broadcast vs hash join
    def test_matches_reference_both_regimes(self, ray_session, tmp_path, bl):
        import ray.data as rd

        from guac_ray.functions.scale import feature_scale

        df = _df()
        got = feature_scale(
            rd.from_pandas(df).repartition(4), by="g", col="v",
            broadcast_limit=bl, exchange_base=str(tmp_path / "fs"),
            num_buckets=4,
        ).to_pandas().sort_values("i").reset_index(drop=True)
        want = _ref(df)
        # bit-exact: the operator promises a fixed expression order
        assert (got["z"].to_numpy() == want["z"].to_numpy()).all()
        assert (got["mm"].to_numpy() == want["mm"].to_numpy()).all()

    def test_zero_variance_group_pins_to_zero(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.scale import feature_scale

        df = pd.DataFrame({"g": [1, 1, 1, 2, 2], "v": [7, 7, 7, 1, 3],
                           "i": range(5)})
        df["v"] = df["v"].astype("int64")
        got = feature_scale(
            rd.from_pandas(df), by="g", col="v",
            exchange_base=str(tmp_path / "z0"),
        ).to_pandas().sort_values("i")
        assert (got[got.g == 1][["z", "mm"]].to_numpy() == 0.0).all()
        assert got[got.g == 2]["mm"].tolist() == [0.0, 1.0]

    def test_float_column_rejected(self, ray_session, tmp_path):
        import ray

        import ray.data as rd

        from guac_ray.functions.scale import feature_scale

        df = pd.DataFrame({"g": [1], "v": [1.5]})
        with pytest.raises((TypeError, ray.exceptions.RayTaskError),
                           match="must be integer"):
            feature_scale(rd.from_pandas(df), by="g", col="v",
                          exchange_base=str(tmp_path / "f")).materialize()

    def test_name_collision_rejected(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.scale import feature_scale

        ds = rd.from_pandas(pd.DataFrame({"g": [1], "v": [1]}))
        with pytest.raises(ValueError, match="collide"):
            feature_scale(ds, by="g", col="v", out_z="v")
        with pytest.raises(ValueError, match="collide"):
            feature_scale(ds, by="g", col="v", out_z="x", out_mm="x")


class TestWinsorize:
    def test_matches_duckdb_grouped_and_global(self, ray_session):
        import duckdb
        import ray.data as rd

        from guac_ray.functions.scale import winsorize

        df = _df(1500, seed=3)
        con = duckdb.connect()
        # grouped
        got = winsorize(rd.from_pandas(df).repartition(4), "v", 0.1, 0.9,
                        by="g", out="w").to_pandas().sort_values("i")
        want = con.execute("""
            WITH q AS (SELECT g, quantile_disc(v, 0.1) lo,
                              quantile_disc(v, 0.9) hi FROM df GROUP BY g)
            SELECT i, least(greatest(v, lo), hi) AS w
            FROM df JOIN q USING (g) ORDER BY i
        """).df()
        assert (got["w"].to_numpy() == want["w"].to_numpy()).all()
        assert got["w"].dtype == df["v"].dtype  # ints stay ints
        # global (no by)
        got2 = winsorize(rd.from_pandas(df), "v", 0.05, 0.95,
                         out="w").to_pandas().sort_values("i")
        want2 = con.execute("""
            SELECT i, least(greatest(v, (SELECT quantile_disc(v, 0.05) FROM df)),
                            (SELECT quantile_disc(v, 0.95) FROM df)) AS w
            FROM df ORDER BY i
        """).df()
        assert (got2["w"].to_numpy() == want2["w"].to_numpy()).all()

    def test_bad_bounds_and_collision(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.scale import winsorize

        ds = rd.from_pandas(pd.DataFrame({"g": [1], "v": [1]}))
        with pytest.raises(ValueError, match="lo <= hi"):
            winsorize(ds, "v", 0.9, 0.1)
        with pytest.raises(ValueError, match="collide"):
            winsorize(ds, "v", 0.1, 0.9, out="v")

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.scale import winsorize

        df = pd.DataFrame({"g": pd.Series([], dtype="int64"),
                           "v": pd.Series([], dtype="int64")})
        assert winsorize(rd.from_pandas(df), "v", 0.1, 0.9,
                         by="g").count() == 0


class TestPercentileRank:
    def test_matches_sql_percent_rank(self, ray_session):
        import duckdb
        import ray.data as rd

        from guac_ray.functions.scale import percentile_rank

        vals = pd.DataFrame({
            "id": range(12),
            "v": [5, -3, 5, 0, 7, 7, 7, -3, 100, 0, 5, 1]})
        out = percentile_rank(rd.from_pandas(vals).repartition(3), "v",
                              keep_cols=["id"])
        got = out.to_pandas() if hasattr(out, "to_pandas") else out
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        want = duckdb.sql("""
            SELECT id, v,
                   CAST((1000000 * (rank() OVER (ORDER BY v) - 1))
                        // (count(*) OVER () - 1) AS BIGINT) AS pr_fp
            FROM vals
        """).df()
        g = got.sort_values("id").reset_index(drop=True)
        w = want.sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)

    def test_edges(self, ray_session):
        import pytest
        import ray.data as rd

        from guac_ray.functions.scale import percentile_rank

        one = percentile_rank(
            rd.from_pandas(pd.DataFrame({"v": [42]})), "v")
        df = one.to_pandas() if hasattr(one, "to_pandas") else one
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas()
        assert df["pr_fp"].tolist() == [0]  # single row: no div-by-zero
        # empty input: a DATASET (same contract as the non-empty path)
        # whose keep_cols keep their INPUT types, not an int64 guess
        empty = percentile_rank(
            rd.from_pandas(pd.DataFrame(
                {"v": pd.Series([], dtype="int64"),
                 "name": pd.Series([], dtype="object")})),
            "v", keep_cols=["name"])
        assert empty.count() == 0
        sch = empty.schema()
        tmap = dict(zip(sch.names, sch.types))
        import pyarrow as pa
        assert tmap["name"] == pa.string()
        assert tmap["pr_fp"] == pa.int64()
        with pytest.raises(ValueError):
            percentile_rank(
                rd.from_pandas(pd.DataFrame({"v": [1, 2, 3, 4]})), "v",
                distinct_cap=2)


class TestLookupBelowContract:
    """ADVICE r4: a pass-2 value absent from the pass-1 histogram must
    raise the replay-stability contract error, not silently misrank or
    IndexError past the histogram end."""

    def test_known_values(self):
        import numpy as np

        from guac_ray.functions.scale import _lookup_below

        vals = np.array([2, 5, 9], dtype=np.int64)
        below = np.array([0, 3, 7], dtype=np.int64)
        got = _lookup_below(vals, below, np.array([5, 2, 9, 9]))
        assert got.tolist() == [3, 0, 7, 7]

    def test_unknown_value_raises(self):
        import numpy as np
        import pytest

        from guac_ray.functions.scale import _lookup_below

        vals = np.array([2, 5, 9], dtype=np.int64)
        below = np.array([0, 3, 7], dtype=np.int64)
        for v in (4, 1, 11):  # mid-gap, below min, above max
            with pytest.raises(ValueError, match="replay-stable"):
                _lookup_below(vals, below, np.array([v], dtype=np.int64))

    def test_empty_batch_ok(self):
        import numpy as np

        from guac_ray.functions.scale import _lookup_below

        vals = np.array([2], dtype=np.int64)
        below = np.array([0], dtype=np.int64)
        assert _lookup_below(vals, below,
                             np.array([], dtype=np.int64)).size == 0


class TestGroupedACF:
    def test_matches_numpy_corrcoef(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import grouped_acf

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "g": ["a"] * 60 + ["b"] * 40,
            "ts": pd.to_datetime(np.arange(100), unit="s"),
            "eid": np.arange(100),
            "v": rng.integers(-50, 50, 100),
        })
        got = (grouped_acf(rd.from_pandas(df).repartition(5),
                           "g", "v", "ts", "eid", lags=(1, 2, 3))
               .to_pandas().sort_values(["g", "lag"])
               .reset_index(drop=True))
        for _, r in got.iterrows():
            s = df[df.g == r.g].sort_values("ts").v.to_numpy().astype(float)
            k = int(r.lag)
            assert r.n == len(s) - k
            assert abs(r.acf - np.corrcoef(s[:-k], s[k:])[0, 1]) < 1e-12

    def test_constant_series_and_short_group(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import grouped_acf

        df = pd.DataFrame({
            "g": ["c"] * 5 + ["tiny"] * 2,
            "ts": pd.to_datetime(np.arange(7), unit="s"),
            "eid": np.arange(7),
            "v": [9] * 5 + [1, 2],
        })
        got = (grouped_acf(rd.from_pandas(df), "g", "v", "ts", "eid",
                           lags=(1, 3))
               .to_pandas().sort_values(["g", "lag"])
               .reset_index(drop=True))
        # constant series pins 0.0 (both lags); the 2-row group only
        # has lag-1 pairs — and a single pair is zero-variance → 0.0
        assert got[got.g == "c"].acf.tolist() == [0.0, 0.0]
        tiny = got[got.g == "tiny"]
        assert tiny.lag.tolist() == [1] and tiny.acf.tolist() == [0.0]

    def test_float_and_bad_lag_raise(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import grouped_acf

        df = pd.DataFrame({"g": ["a"], "ts": pd.to_datetime([0], unit="s"),
                           "eid": [0], "v": [1.5]})
        with pytest.raises(Exception, match="cents"):
            grouped_acf(rd.from_pandas(df), "g", "v", "ts",
                        "eid").to_pandas()
        with pytest.raises(ValueError, match="lags"):
            grouped_acf(rd.from_pandas(df), "g", "v", "ts", "eid",
                        lags=(0,))


class TestWaveHardening:
    """Round-5 session-11 review wave: int-width wraps, row-dropping
    merges, and silent casts across the numeric family."""

    def test_feature_scale_int32_no_wrap(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.scale import feature_scale

        # 100000^2 wraps int32 (1410065408); z of identical values = 0.0
        # while a wrapped _sq would produce garbage variance
        df = pd.DataFrame({"g": ["a"] * 4,
                           "v": pd.array([100_000, 100_000, 200_000, 200_000],
                                         dtype="int32")})
        out = feature_scale(rd.from_pandas(df), "g", "v").to_pandas()
        v = out.sort_values("v")
        # exact population z for {1e5,1e5,2e5,2e5}: mean 1.5e5, std 5e4
        assert v["z"].tolist() == [-1.0, -1.0, 1.0, 1.0]

    def test_winsorize_keeps_all_nan_group_rows(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.scale import winsorize

        df = pd.DataFrame({
            "g": ["a"] * 10 + ["b"] * 2,
            "v": [float(i) for i in range(10)] + [np.nan, np.nan]})
        out = winsorize(rd.from_pandas(df), "v", 0.2, 0.8,
                        by="g").to_pandas()
        # group b (all-NaN values) has no quantile bounds but its rows
        # must SURVIVE the append-columns transform
        assert len(out) == 12
        assert (out[out.g == "b"]["v_w"].isna()).all()
        a = out[out.g == "a"].sort_values("v")
        assert a["v_w"].min() >= 1.0 and a["v_w"].max() <= 8.0

    def test_grouped_robust_stats_refuses_floats(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.quantiles import grouped_robust_stats

        df = pd.DataFrame({"k": [1.5, 2.5], "v": [10, 20]})
        with pytest.raises(Exception, match="integer"):
            grouped_robust_stats(rd.from_pandas(df), "k", "v").materialize()

    def test_basket_rules_reject_empty_item(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import basket_pair_rules

        df = pd.DataFrame({"o": [1, 1, 2], "item": ["x", "", "x"]})
        with pytest.raises(Exception, match="sentinel"):
            basket_pair_rules(rd.from_pandas(df), "o", "item",
                              min_support=1)

    def test_pagerank_refuses_integer_keys(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.pagerank import pagerank

        df = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
        with pytest.raises(Exception, match="string"):
            pagerank(rd.from_pandas(df), src_col="src", dst_col="dst",
                     exchange_base=str(tmp_path / "pr")).materialize()

    def test_shortest_paths_int_keys_typed(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from guac_ray.functions.paths import shortest_paths

        df = pd.DataFrame({"src": [1, 2], "dst": [2, 3],
                           "w": np.array([5, 7], dtype="int64")})
        out = shortest_paths(rd.from_pandas(df), 1, k=3,
                             exchange_base=str(tmp_path / "sp"))
        pdf = out.to_pandas().sort_values("node_key")
        assert pdf["node_key"].tolist() == [1, 2, 3]
        assert pdf["dist"].tolist() == [0, 5, 12]
        sch = out.schema()
        assert dict(zip(sch.names, sch.types))["node_key"] == pa.int64()

    def test_hll_excludes_nulls(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.sketch import approx_ndistinct

        df = pd.DataFrame({"v": ["a", "b", "c", None, None, None]})
        est = approx_ndistinct(rd.from_pandas(df), "v")
        assert abs(est - 3) < 0.5  # SQL COUNT(DISTINCT) excludes NULL

    def test_kcore_drops_null_endpoints(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.graph_algs import kcore

        # triangle x-y-z (2-core) + a null phantom edge touching 'p':
        # p has ONE real neighbor (x) and must NOT survive k=2
        df = pd.DataFrame({
            "s": ["x", "y", "z", "p", None],
            "d": ["y", "z", "x", "x", "p"]})
        out = kcore(rd.from_pandas(df), "s", "d", k=2,
                    exchange_base=str(tmp_path / "kc")).to_pandas()
        assert sorted(out["node"]) == ["x", "y", "z"]
