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
