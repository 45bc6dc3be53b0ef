"""Grouped correlation/covariance: bit parity with the SQL expression,
zero-variance pinning, numpy cross-check."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _run(df, num_buckets=2):
    import ray.data as rd

    from guac_ray.functions.stats import grouped_corr

    out = grouped_corr(rd.from_pandas(df), "g", "x", "y",
                       num_buckets=num_buckets).to_pandas()
    return out.sort_values("g").reset_index(drop=True)


SQL = """
WITH m AS (
  SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
         sum(x*x) AS sxx, sum(y*y) AS syy,
         min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
  FROM t GROUP BY g)
SELECT g, n,
  CASE WHEN mnx=mxx OR mny=mxy THEN 0.0 ELSE
    (CAST(sxy AS DOUBLE) - (CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))/CAST(n AS DOUBLE))/CAST(n AS DOUBLE) END AS cov,
  CASE WHEN mnx=mxx OR mny=mxy THEN 0.0 ELSE
    (CAST(sxy AS DOUBLE) - (CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))/CAST(n AS DOUBLE))
    / (sqrt(CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))/CAST(n AS DOUBLE))
       * sqrt(CAST(syy AS DOUBLE) - (CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))/CAST(n AS DOUBLE))) END AS corr
FROM m ORDER BY g
"""


class TestGroupedCorr:
    def test_bit_parity_with_sql(self, ray_session):
        rng = np.random.default_rng(3)
        t = pd.DataFrame({
            "g": rng.integers(0, 7, 5000),
            "x": rng.integers(0, 50_000, 5000).astype("int64"),
            "y": rng.integers(0, 86_400, 5000).astype("int64")})
        got = _run(t, num_buckets=3)
        want = duckdb.sql(SQL).df()
        pd.testing.assert_frame_equal(got, want, check_exact=True,
                                      check_dtype=False)

    def test_matches_numpy(self, ray_session):
        rng = np.random.default_rng(4)
        x = rng.integers(0, 1000, 800).astype("int64")
        y = (3 * x + rng.integers(0, 200, 800)).astype("int64")
        got = _run(pd.DataFrame({"g": 0, "x": x, "y": y}))
        assert got["corr"][0] == pytest.approx(np.corrcoef(x, y)[0, 1], rel=1e-12)
        assert got["cov"][0] == pytest.approx(np.cov(x, y, bias=True)[0, 1],
                                           rel=1e-12)

    def test_zero_variance_pins_zero(self, ray_session):
        got = _run(pd.DataFrame({
            "g": [1, 1, 2, 2], "x": [5, 5, 1, 2], "y": [1, 9, 3, 3]}))
        # g=1: x constant; g=2: y constant — both pin to 0.0, not NaN
        assert got["cov"].tolist() == [0.0, 0.0]
        assert got["corr"].tolist() == [0.0, 0.0]

    def test_float_input_rejected(self, ray_session):
        with pytest.raises(Exception):
            _run(pd.DataFrame({"g": [1], "x": [1.5], "y": [2]}))


class TestEventsEntropy:
    """events_entropy (pipelines/suite.py): micro-nat quantized Shannon
    entropy — uniform k-type users read ln(k)·1e6 (±1 quantization),
    single-type users exactly 0."""

    def test_entropy_properties(self, ray_session, tmp_path):
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.pipelines.suite import events_entropy

        sf = tmp_path / "sf"
        sf.mkdir()
        rows = []
        # user 1: uniform over 4 types, 8 each; user 2: single type;
        # user 3: skewed 9/1
        for t in "abcd":
            rows += [(1, t)] * 8
        rows += [(2, "a")] * 10
        rows += [(3, "a")] * 9 + [(3, "b")]
        df = pd.DataFrame(rows, columns=["user_id", "event_type"])
        pq.write_table(pa.Table.from_pandas(df), sf / "events.parquet")
        out = events_entropy(str(sf))
        got = (out.to_pandas() if hasattr(out, "to_pandas") else out)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        got = got.set_index("user_id")
        assert abs(got.loc[1, "entropy_micronats"]
                   - round(math.log(4) * 1e6)) <= 1
        assert got.loc[2, "entropy_micronats"] == 0
        assert 0 < got.loc[3, "entropy_micronats"] < got.loc[1, "entropy_micronats"]
        assert got.loc[1, "n_types"] == 4 and got.loc[1, "n_events"] == 32


class TestBasketPairRules:
    def test_hand_computed_rules(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import basket_pair_rules

        # baskets: {A,B} x3, {A,C} x2, {B,C} x1, {A} x2  (N=8)
        rows = []
        bid = 0
        for combo, times in ((["A", "B"], 3), (["A", "C"], 2),
                             (["B", "C"], 1), (["A"], 2)):
            for _ in range(times):
                rows += [(bid, it) for it in combo]
                bid += 1
        df = pd.DataFrame(rows, columns=["o", "b"])
        out = basket_pair_rules(
            rd.from_pandas(df).repartition(3), "o", "b", min_support=2
        ).set_index(["item1", "item2"])
        # s_A=7, s_B=4, s_C=3, N=8
        ab = out.loc[("A", "B")]
        assert ab.support == 3
        assert ab.conf12_fp == 1_000_000 * 3 // 7
        assert ab.conf21_fp == 1_000_000 * 3 // 4
        assert ab.lift_fp == 1_000_000 * 8 * 3 // (7 * 4)
        # {B,C} support 1 < min_support -> filtered
        assert ("B", "C") not in out.index
        # duplicate (basket, item) rows must not inflate support
        df2 = pd.concat([df, df], ignore_index=True)
        out2 = basket_pair_rules(rd.from_pandas(df2).repartition(5),
                                 "o", "b", min_support=2)
        pd.testing.assert_frame_equal(
            out.reset_index(), out2, check_dtype=False)

    def test_giant_basket_guard_and_empty(self, ray_session):
        import pytest
        import ray.data as rd

        from guac_ray.functions.stats import basket_pair_rules

        big = pd.DataFrame({"o": 0, "b": [f"i{k}" for k in range(50)]})
        with pytest.raises(Exception, match="max_items_per_basket"):
            basket_pair_rules(rd.from_pandas(big), "o", "b",
                              max_items_per_basket=10)
        empty = basket_pair_rules(
            rd.from_pandas(pd.DataFrame({"o": pd.Series(dtype="int64"),
                                         "b": pd.Series(dtype="object")})),
            "o", "b")
        assert len(empty) == 0 and "lift_fp" in empty.columns


class TestChi2Contingency:
    """Chi-squared independence grid: full observed-label cross
    product with absent cells at n_obs = 0, exact int64 margins, and
    the fixed-order per-cell double."""

    def test_hand_grid_with_zero_cell(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.stats import chi2_contingency

        # labels (a, b) x (x, y) with (b, y) NEVER observed — the cell
        # must still appear with its expected-count contribution.
        df = pd.DataFrame({
            "r": ["a"] * 5 + ["b"] * 3,
            "c": ["x", "x", "y", "y", "y", "x", "x", "x"]})
        got = (chi2_contingency(rd.from_pandas(df).repartition(3),
                                "r", "c", num_buckets=2)
               .to_pandas().sort_values(["r", "c"])
               .reset_index(drop=True))
        assert got[["r", "c", "n_obs"]].values.tolist() == [
            ["a", "x", 2], ["a", "y", 3], ["b", "x", 3], ["b", "y", 0]]
        assert got["n_row"].tolist() == [5, 5, 3, 3]
        assert got["n_col"].tolist() == [5, 3, 5, 3]
        assert got["n_total"].tolist() == [8] * 4
        # reference: (O - E)^2 / E computed independently
        for _, row in got.iterrows():
            e = row.n_row * row.n_col / 8.0
            want = (row.n_obs - e) ** 2 / e
            assert np.isclose(row.chi2_cell, want, rtol=1e-12)
        # total chi2 for a 2x2 grid equals the closed form
        # N*(ad-bc)^2 / (r1*r2*c1*c2)
        o = got.set_index(["r", "c"])["n_obs"]
        num = 8 * (o["a", "x"] * o["b", "y"]
                   - o["a", "y"] * o["b", "x"]) ** 2
        assert np.isclose(got["chi2_cell"].sum(), num / (5 * 3 * 5 * 3),
                          rtol=1e-12)

    def test_typed_empty(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.stats import chi2_contingency

        empty = pd.DataFrame({"r": pd.Series([], dtype="object"),
                              "c": pd.Series([], dtype="int64")})
        out = chi2_contingency(rd.from_pandas(empty), "r", "c")
        assert out.num_rows == 0
        assert out.column_names == ["r", "c", "n_obs", "n_row", "n_col",
                                    "n_total", "chi2_cell"]


class TestGroupedLinreg:
    """OLS per group: exact-line recovery, constant-x pin, noise case
    against the closed form."""

    def test_perfect_line_and_const_pin(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.stats import grouped_linreg

        xs = np.arange(10, dtype="int64")
        rows = pd.DataFrame({
            "g": ["line"] * 10 + ["constx"] * 4,
            "x": np.concatenate([xs, np.full(4, 7, dtype="int64")]),
            "y": np.concatenate([2 * xs + 3,
                                 np.array([1, 5, 9, 13], dtype="int64")]),
        })
        got = (grouped_linreg(rd.from_pandas(rows).repartition(3),
                              ["g"], "x", "y", num_buckets=2)
               .to_pandas().set_index("g"))
        assert got.loc["line", "n"] == 10
        assert np.isclose(got.loc["line", "slope"], 2.0, rtol=1e-12)
        assert np.isclose(got.loc["line", "intercept"], 3.0, rtol=1e-12)
        # constant regressor: slope pinned 0, intercept = mean(y) = 7
        assert got.loc["constx", "slope"] == 0.0
        assert got.loc["constx", "intercept"] == 7.0

    def test_matches_closed_form(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.stats import grouped_linreg

        rng = np.random.RandomState(11)
        x = rng.randint(0, 1000, size=200).astype("int64")
        y = (3 * x + rng.randint(-50, 50, size=200)).astype("int64")
        got = (grouped_linreg(
            rd.from_pandas(pd.DataFrame({"g": 1, "x": x, "y": y}))
            .repartition(5), ["g"], "x", "y").to_pandas())
        want_slope, want_icept = np.polyfit(x.astype(float),
                                            y.astype(float), 1)
        assert np.isclose(got["slope"].iloc[0], want_slope, rtol=1e-9)
        assert np.isclose(got["intercept"].iloc[0], want_icept, rtol=1e-9)


class TestWelchTtest:
    """welch_ttest: scipy-free closed-form cross-check, pins, guards."""

    def _run(self, df, control="c", num_buckets=2):
        import ray.data as rd

        from guac_ray.functions.stats import welch_ttest

        out = welch_ttest(rd.from_pandas(df), "g", "v", control,
                          num_buckets=num_buckets).to_pandas()
        return out.sort_values("g").reset_index(drop=True)

    def test_matches_reference_formula(self, ray_session):
        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 3000),
            "v": rng.integers(0, 10_000, 3000).astype("int64")})
        out = self._run(df, control="c", num_buckets=3)
        assert list(out["g"]) == ["a", "b"]
        for _, row in out.iterrows():
            va = df.loc[df.g == row["g"], "v"].to_numpy().astype("float64")
            vc = df.loc[df.g == "c", "v"].to_numpy().astype("float64")
            na, nc = len(va), len(vc)
            sa2 = va.var(ddof=1) / na
            sc2 = vc.var(ddof=1) / nc
            t_ref = (va.mean() - vc.mean()) / np.sqrt(sa2 + sc2)
            df_ref = (sa2 + sc2) ** 2 / (sa2 ** 2 / (na - 1)
                                         + sc2 ** 2 / (nc - 1))
            assert row["n"] == na and row["n_control"] == nc
            assert abs(row["t_stat"] - t_ref) < 1e-9
            assert abs(row["df"] - df_ref) < 1e-6

    def test_zero_variance_pins_and_small_groups_drop(self, ray_session):
        df = pd.DataFrame({
            "g": ["a"] * 5 + ["c"] * 5 + ["tiny"],
            "v": np.array([7] * 5 + [7] * 5 + [3], dtype="int64")})
        out = self._run(df)
        # both variances zero -> t, df pin to 0.0; n<2 group dropped
        assert list(out["g"]) == ["a"]
        assert out.loc[0, "t_stat"] == 0.0 and out.loc[0, "df"] == 0.0

    def test_missing_control_raises(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import welch_ttest

        df = pd.DataFrame({"g": ["a", "a"], "v": np.array([1, 2], "int64")})
        with pytest.raises(ValueError, match="control group"):
            welch_ttest(rd.from_pandas(df), "g", "v", "nope")

    def test_float_rejected(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import welch_ttest

        df = pd.DataFrame({"g": ["a", "c", "c"], "v": [1.5, 2.0, 3.0]})
        with pytest.raises((TypeError, Exception), match="integer"):
            welch_ttest(rd.from_pandas(df), "g", "v", "c").to_pandas()


class TestMannWhitneyU:
    """mann_whitney_u: scipy-formula cross-check with heavy ties,
    all-tied pin, partitioning invariance."""

    def _run(self, df, num_buckets=2):
        import ray.data as rd

        from guac_ray.functions.stats import mann_whitney_u

        return mann_whitney_u(rd.from_pandas(df), "g", "v", "a", "b",
                              num_buckets=num_buckets).to_pandas()

    def test_matches_rank_reference(self, ray_session):
        rng = np.random.default_rng(12)
        # small value range -> heavy ties, the tie-correction path
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "x"], 2000),
            "v": rng.integers(0, 40, 2000).astype("int64")})
        out = self._run(df, num_buckets=3)
        sub = df[df.g.isin(["a", "b"])]
        ranks = pd.Series(sub["v"]).rank(method="average")
        ra = float(ranks[sub.g == "a"].sum())
        na = int((sub.g == "a").sum())
        nb = int((sub.g == "b").sum())
        u_a = ra - na * (na + 1) / 2
        assert out.loc[0, "n_a"] == na and out.loc[0, "n_b"] == nb
        assert out.loc[0, "u_a_x2"] == int(round(2 * u_a))
        assert out.loc[0, "u_a_x2"] + out.loc[0, "u_b_x2"] == 2 * na * nb
        # z vs the standard tie-corrected normal approximation
        n = na + nb
        _, t = np.unique(sub["v"], return_counts=True)
        tie = float((t.astype("float64") ** 3 - t).sum())
        sig2 = (na * nb / 12.0) * ((n + 1.0) - tie / (n * (n - 1.0)))
        z_ref = (u_a - na * nb / 2.0) / np.sqrt(sig2)
        assert abs(out.loc[0, "z_stat"] - z_ref) < 1e-9

    def test_all_tied_pins_z_zero(self, ray_session):
        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "v": np.array([5, 5, 5, 5], "int64")})
        out = self._run(df)
        assert out.loc[0, "z_stat"] == 0.0
        assert out.loc[0, "u_a_x2"] == out.loc[0, "u_b_x2"] == 4  # 2*U = 2*2

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import mann_whitney_u

        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], 500),
            "v": rng.integers(0, 20, 500).astype("int64")})
        outs = []
        for nblocks in (1, 7):
            ds = rd.from_pandas(df).repartition(nblocks)
            outs.append(mann_whitney_u(ds, "g", "v", "a", "b").to_pandas())
        pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)

    def test_missing_group_raises(self, ray_session):
        df = pd.DataFrame({"g": ["a", "a"], "v": np.array([1, 2], "int64")})
        with pytest.raises((ValueError, Exception), match="both groups"):
            self._run(df)


class TestMultiLinreg:
    """multi_linreg: np.linalg.lstsq parity, exact-integer recovery,
    singular refusal, partitioning invariance."""

    def _run(self, df, feats=("x1", "x2"), num_blocks=1):
        import ray.data as rd

        from guac_ray.functions.stats import multi_linreg

        ds = rd.from_pandas(df).repartition(num_blocks)
        return multi_linreg(ds, list(feats), "y").to_pandas()

    def test_recovers_planted_coefficients(self, ray_session):
        rng = np.random.default_rng(14)
        x1 = rng.integers(0, 24, 4000).astype("int64")
        x2 = rng.integers(0, 7, 4000).astype("int64")
        y = 100 + 3 * x1 - 5 * x2  # exact linear, integer
        out = self._run(pd.DataFrame({"x1": x1, "x2": x2, "y": y}),
                        num_blocks=5)
        betas = dict(zip(out["term"], out["beta"]))
        assert abs(betas["intercept"] - 100.0) < 1e-9
        assert abs(betas["x1"] - 3.0) < 1e-9
        assert abs(betas["x2"] + 5.0) < 1e-9

    def test_matches_lstsq_on_noise(self, ray_session):
        rng = np.random.default_rng(15)
        x1 = rng.integers(0, 24, 3000).astype("int64")
        x2 = rng.integers(0, 7, 3000).astype("int64")
        y = (50 + 2 * x1 + 9 * x2
             + rng.integers(-30, 31, 3000)).astype("int64")
        out = self._run(pd.DataFrame({"x1": x1, "x2": x2, "y": y}),
                        num_blocks=4)
        X = np.column_stack([np.ones(len(x1)), x1, x2]).astype("float64")
        ref, *_ = np.linalg.lstsq(X, y.astype("float64"), rcond=None)
        got = out.set_index("term").loc[["intercept", "x1", "x2"],
                                        "beta"].to_numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-9)

    def test_partitioning_invariance_bit_exact(self, ray_session):
        rng = np.random.default_rng(16)
        df = pd.DataFrame({
            "x1": rng.integers(0, 24, 1000).astype("int64"),
            "x2": rng.integers(0, 7, 1000).astype("int64"),
            "y": rng.integers(0, 5000, 1000).astype("int64")})
        a = self._run(df, num_blocks=1)
        b = self._run(df, num_blocks=9)
        pd.testing.assert_frame_equal(a, b, check_exact=True)

    def test_singular_raises(self, ray_session):
        df = pd.DataFrame({
            "x1": np.array([2] * 50, "int64"),      # constant = collinear
            "x2": np.arange(50, dtype="int64"),     # with the intercept
            "y": np.arange(50, dtype="int64")})
        with pytest.raises((ValueError, Exception), match="singular"):
            self._run(df)

    def test_single_feature_matches_grouped_linreg_form(self, ray_session):
        rng = np.random.default_rng(17)
        x = rng.integers(0, 100, 800).astype("int64")
        y = (7 * x + 13 + rng.integers(-5, 6, 800)).astype("int64")
        out = self._run(pd.DataFrame({"x1": x, "y": y}), feats=("x1",),
                        num_blocks=3)
        xf, yf = x.astype("float64"), y.astype("float64")
        slope_ref = np.polyfit(xf, yf, 1)[0]
        betas = dict(zip(out["term"], out["beta"]))
        assert abs(betas["x1"] - slope_ref) < 1e-8


class TestKsTest:
    """Two-sample KS: scipy-free reference cross-check, identical
    distributions, partitioning invariance, guards."""

    def _run(self, df, num_buckets=2):
        import ray.data as rd

        from guac_ray.functions.stats import ks_test

        return ks_test(rd.from_pandas(df), "g", "v", "a", "b",
                       num_buckets=num_buckets).to_pandas()

    def test_matches_cdf_reference(self, ray_session):
        rng = np.random.default_rng(61)
        # shifted distributions -> a real gap, with heavy ties
        va = rng.integers(0, 50, 800).astype("int64")
        vb = (rng.integers(0, 50, 600) + 5).astype("int64")
        df = pd.DataFrame({
            "g": ["a"] * 800 + ["b"] * 600,
            "v": np.concatenate([va, vb])})
        out = self._run(df, num_buckets=3)
        vals = np.unique(df["v"])
        ca = np.array([(va <= x).sum() for x in vals], dtype="int64")
        cb = np.array([(vb <= x).sum() for x in vals], dtype="int64")
        d_num_ref = int(np.abs(ca * 600 - cb * 800).max())
        assert out.loc[0, "n_a"] == 800 and out.loc[0, "n_b"] == 600
        assert out.loc[0, "d_num"] == d_num_ref
        d_ref = d_num_ref / (800.0 * 600.0)
        assert abs(out.loc[0, "d_stat"] - d_ref) < 1e-15
        z_ref = d_ref * np.sqrt(800.0 * 600.0 / 1400.0)
        assert abs(out.loc[0, "z_stat"] - z_ref) < 1e-12

    def test_identical_distributions_zero(self, ray_session):
        v = np.array([1, 2, 3, 4, 5] * 10, dtype="int64")
        df = pd.DataFrame({"g": ["a"] * 50 + ["b"] * 50,
                           "v": np.concatenate([v, v])})
        out = self._run(df)
        assert out.loc[0, "d_num"] == 0
        assert out.loc[0, "d_stat"] == 0.0 and out.loc[0, "z_stat"] == 0.0

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import ks_test

        rng = np.random.default_rng(62)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], 600),
            "v": rng.integers(0, 30, 600).astype("int64")})
        outs = []
        for nblocks in (1, 7):
            ds = rd.from_pandas(df).repartition(nblocks)
            outs.append(ks_test(ds, "g", "v", "a", "b").to_pandas())
        pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)

    def test_missing_group_raises(self, ray_session):
        df = pd.DataFrame({"g": ["a", "a"], "v": np.array([1, 2], "int64")})
        with pytest.raises((ValueError, Exception), match="both groups"):
            self._run(df)


class TestWelchTtestTyping:
    def test_null_group_stays_null_and_int_groups_keep_type(
            self, ray_session):
        import ray.data as rd

        from guac_ray.functions.stats import welch_ttest

        # integer group labels: output keeps int64, no restringing
        df = pd.DataFrame({
            "g": np.array([1, 1, 1, 2, 2, 2], "int64"),
            "v": np.array([1, 2, 3, 7, 8, 9], "int64")})
        out = welch_ttest(rd.from_pandas(df), "g", "v", 2)
        assert out.schema.field("g").type == "int64"
        got = out.to_pandas()
        assert got["g"].tolist() == [1]
        # NULL group label survives as NULL, not the string 'None'
        df2 = pd.DataFrame({
            "g": ["a", "a", "a", None, None, None, "c", "c", "c"],
            "v": np.array([1, 2, 3, 4, 5, 9, 6, 7, 8], "int64")})
        out2 = welch_ttest(rd.from_pandas(df2), "g", "v", "c").to_pandas()
        assert len(out2) == 2
        assert out2["g"].isna().sum() == 1  # the NULL group row


class TestTwoProportionZtest:
    def _run(self, df, control="a", num_buckets=2):
        import ray.data as rd

        from guac_ray.functions.stats import two_proportion_ztest

        return two_proportion_ztest(
            rd.from_pandas(df), "g", "f", control,
            num_buckets=num_buckets).to_pandas()

    def test_matches_closed_form(self, ray_session):
        rng = np.random.default_rng(101)
        n = 3000
        g = rng.choice(["a", "b", "c"], n)
        # different planted rates per variant
        rate = np.where(g == "a", 0.2, np.where(g == "b", 0.3, 0.25))
        f = (rng.uniform(size=n) < rate).astype("int64")
        out = (self._run(pd.DataFrame({"g": g, "f": f}), num_buckets=3)
               .sort_values("g").reset_index(drop=True))
        assert list(out["g"]) == ["b", "c"]
        for _, row in out.iterrows():
            nv = int((g == row["g"]).sum())
            cv = int(f[g == row["g"]].sum())
            nc = int((g == "a").sum())
            cc = int(f[g == "a"].sum())
            assert row["n"] == nv and row["conv"] == cv
            p = (cv + cc) / (nv + nc)
            z_ref = ((cv / nv - cc / nc)
                     / np.sqrt(p * (1 - p) * (1 / nv + 1 / nc)))
            assert abs(row["z_stat"] - z_ref) < 1e-12

    def test_degenerate_pool_pins_zero(self, ray_session):
        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "f": np.array([0, 0, 0, 0], "int64")})
        out = self._run(df)
        assert out.loc[0, "z_stat"] == 0.0

    def test_bad_flag_and_missing_control(self, ray_session):
        df = pd.DataFrame({"g": ["a", "b"], "f": np.array([2, 0], "int64")})
        with pytest.raises(Exception, match="0, 1"):
            self._run(df)
        df2 = pd.DataFrame({"g": ["b", "b"], "f": np.array([1, 0], "int64")})
        with pytest.raises(Exception, match="control"):
            self._run(df2)


class TestCupedAdjust:
    def _run(self, df, num_buckets=2):
        import ray.data as rd

        from guac_ray.functions.stats import cuped_adjust

        return (cuped_adjust(rd.from_pandas(df), "g", "x", "y",
                             num_buckets=num_buckets).to_pandas()
                .sort_values("g").reset_index(drop=True))

    def test_matches_reference_and_reduces_variance(self, ray_session):
        rng = np.random.default_rng(102)
        n = 4000
        g = rng.choice(["a", "b"], n)
        x = rng.integers(0, 10_000, n).astype("int64")
        # post correlated with pre + a small true lift for b
        y = (x + rng.integers(-500, 500, n)
             + np.where(g == "b", 50, 0)).astype("int64")
        out = self._run(pd.DataFrame({"g": g, "x": x, "y": y}))
        xf, yf = x.astype("float64"), y.astype("float64")
        theta = np.cov(xf, yf, bias=True)[0, 1] / xf.var()
        for _, row in out.iterrows():
            m = g == row["g"]
            adj_ref = yf[m].mean() - theta * (xf[m].mean() - xf.mean())
            assert abs(row["mean_adj"] - adj_ref) < 1e-6
        # CUPED's point: adjusted lift ~ true lift with the pre-period
        # noise removed
        lift = (out.set_index("g").loc["b", "mean_adj"]
                - out.set_index("g").loc["a", "mean_adj"])
        assert 20 < lift < 80

    def test_constant_pre_pins_theta_zero(self, ray_session):
        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "x": np.array([5, 5, 5, 5], "int64"),
                           "y": np.array([1, 3, 7, 9], "int64")})
        out = self._run(df)
        # theta = 0 -> mean_adj == mean_post exactly
        assert (out["mean_adj"] == out["mean_post"]).all()

    def test_float_rejected(self, ray_session):
        df = pd.DataFrame({"g": ["a", "b"], "x": [1.5, 2.0],
                           "y": [1, 2]})
        with pytest.raises(Exception, match="integer"):
            self._run(df)
