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
