"""HyperLogLog distinct-count sketch: accuracy bounds, merge laws,
distributed fold."""

import numpy as np
import pandas as pd
import pytest

from guac_ray.functions.sketch import (
    hll_estimate,
    hll_fold,
    hll_merge,
)


class TestPure:
    def test_accuracy_within_3_sigma(self):
        # std error at p=12 is ~1.6%; assert 5% (≈3σ)
        for n in (100, 5_000, 100_000):
            vals = pd.Series(np.arange(n))
            est = hll_estimate(hll_fold(vals, p=12))
            assert abs(est - n) / n < 0.05, (n, est)

    def test_merge_equals_single_fold(self):
        a = pd.Series(np.arange(0, 6000))
        b = pd.Series(np.arange(3000, 9000))      # overlapping
        merged = hll_merge([hll_fold(a).tobytes(), hll_fold(b).tobytes()])
        whole = hll_fold(pd.Series(np.arange(0, 9000)))
        assert (merged == whole).all()            # max-merge is exact on registers

    def test_merge_idempotent_commutative(self):
        x = hll_fold(pd.Series(["a", "b", "c"])).tobytes()
        y = hll_fold(pd.Series(["c", "d"])).tobytes()
        assert (hll_merge([x, y]) == hll_merge([y, x, y])).all()

    def test_empty(self):
        assert hll_estimate(hll_fold(pd.Series([], dtype=str))) == 0.0


class TestDistributed:
    def test_whole_dataset_estimate(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.sketch import approx_ndistinct

        n, dups = 20_000, 3
        df = pd.DataFrame({"u": np.arange(n).repeat(dups)})
        est = approx_ndistinct(rd.from_pandas(df).repartition(6), "u")
        assert abs(est - n) / n < 0.05

    def test_grouped_estimates(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.sketch import approx_ndistinct_grouped

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "grp": np.repeat(["a", "b", "c"], 30_000),
            "u": np.concatenate([
                rng.integers(0, 1000, 30_000),     # ~1000 distinct
                rng.integers(0, 5000, 30_000),     # ~5000 distinct
                np.arange(30_000),                 # 30000 distinct
            ]),
        })
        out = approx_ndistinct_grouped(
            rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(5),
            ["grp"], "u",
        ).to_pandas().set_index("grp")
        exact = df.groupby("grp").u.nunique()
        for g in ("a", "b", "c"):
            rel = abs(out.loc[g, "approx_n"] - exact[g]) / exact[g]
            assert rel < 0.05, (g, out.loc[g, "approx_n"], exact[g])


class TestHeavyHitters:
    def _zipfish(self, n=20000, seed=7):
        rng = np.random.default_rng(seed)
        # one dominant item, a mid tier, and a long uniform tail
        vals = np.concatenate([
            np.repeat("hot", n // 2),
            np.repeat(["warm1", "warm2"], n // 10),
            rng.integers(0, 5000, n - n // 2 - 2 * (n // 10)).astype(str),
        ])
        rng.shuffle(vals)
        return pd.DataFrame({"v": vals})

    def test_matches_exact_groupby(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.sketch import heavy_hitters

        df = self._zipfish()
        for k in (3, 8, 50):
            got = heavy_hitters(
                rd.from_pandas(df).repartition(8), "v", k=k
            ).to_pandas().sort_values("v").reset_index(drop=True)
            vc = df.v.value_counts()
            want = vc[vc * k > len(df)].rename_axis("v").reset_index(name="n")
            want = want.sort_values("v").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_no_hitters_and_validation(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.sketch import heavy_hitters

        uniform = pd.DataFrame({"v": np.arange(5000).astype(str)})
        got = heavy_hitters(rd.from_pandas(uniform).repartition(4), "v", k=10).to_pandas()
        assert len(got) == 0
        with pytest.raises(ValueError):
            heavy_hitters(rd.from_pandas(uniform), "v", k=1)

    def test_int_column_returns_strings(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.sketch import heavy_hitters

        df = pd.DataFrame({"v": [1] * 90 + list(range(2, 12))})
        got = heavy_hitters(rd.from_pandas(df).repartition(3), "v", k=4).to_pandas()
        assert got.v.tolist() == ["1"] and got.n.tolist() == [90]
