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


class TestHdrQuantiles:
    """HDR quantile sketch: relative-error bound vs exact quantiles,
    bucket determinism under partitioning, zero handling, guards."""

    def _run(self, v, m=64, pcts=(50, 90, 99), nblocks=1):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.sketch import hdr_quantiles

        df = pd.DataFrame({"v": np.asarray(v, dtype="int64")})
        return hdr_quantiles(rd.from_pandas(df).repartition(nblocks),
                             "v", pcts=pcts, m=m).to_pandas()

    def test_relative_error_bound(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(81)
        # lognormal-ish heavy tail in integers
        v = np.maximum(1, (np.exp(rng.normal(5, 2, 20_000)))
                       .astype("int64"))
        out = self._run(v, m=64).set_index("pct")
        for pct in (50, 90, 99):
            rank = (pct * len(v) + 99) // 100
            true = int(np.sort(v)[rank - 1])
            est = int(out.loc[pct, "est"])
            assert est <= true  # lower-bound estimator
            # guaranteed: est > true*(1 - 1/m) - 1 (bucket width)
            assert est >= true * (1 - 1.0 / 64) - 1, (pct, est, true)

    def test_partitioning_bit_exact(self, ray_session):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(82)
        v = rng.integers(0, 100_000, 5000)
        a = self._run(v, nblocks=1)
        b = self._run(v, nblocks=13)
        pd.testing.assert_frame_equal(a, b, check_exact=True)

    def test_zeros_and_exact_small(self, ray_session):
        # all zeros: every quantile estimates 0 exactly
        out = self._run([0] * 10).set_index("pct")
        assert (out["est"] == 0).all()
        # powers of two are bucket lower bounds -> exact estimates
        out = self._run([16] * 100, pcts=(50,)).set_index("pct")
        assert out.loc[50, "est"] == 16

    def test_guards(self, ray_session):
        import pytest

        with pytest.raises(Exception, match="negative"):
            self._run([-1, 5])
        with pytest.raises(Exception, match="2\\^53"):
            self._run([1 << 53])
        with pytest.raises(ValueError, match="m must"):
            self._run([1], m=1)
        with pytest.raises(ValueError, match="pcts"):
            self._run([1], pcts=(0,))

    def test_float_rejected(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.sketch import hdr_quantiles

        df = pd.DataFrame({"v": [1.5, 2.0]})
        with pytest.raises(Exception, match="integer"):
            hdr_quantiles(rd.from_pandas(df), "v").to_pandas()


class TestHdrQuantilesGrouped:
    """Per-key HDR sketch: per-key relative-error bound, partitioning
    bit-exactness, single-row keys, typed empty."""

    def _run(self, df, tmp_path, name, m=64, pcts=(50, 99),
             nblocks=1, num_buckets=4):
        import ray.data as rd

        from guac_ray.functions.sketch import hdr_quantiles_grouped

        return (hdr_quantiles_grouped(
            rd.from_pandas(df).repartition(nblocks), "k", "v",
            pcts=pcts, m=m, exchange_base=str(tmp_path / name),
            num_buckets=num_buckets).to_pandas()
            .sort_values(["k", "pct"]).reset_index(drop=True))

    def test_per_key_error_bound(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(91)
        n = 20_000
        df = pd.DataFrame({
            "k": rng.integers(0, 25, n),
            "v": np.maximum(1, np.exp(rng.normal(4, 2, n))
                            .astype("int64"))})
        out = self._run(df, tmp_path, "g1", nblocks=6)
        for (key, pct), grp in out.groupby(["k", "pct"]):
            vv = np.sort(df.loc[df.k == key, "v"].to_numpy())
            rank = (pct * len(vv) + 99) // 100
            true = int(vv[rank - 1])
            est = int(grp["est"].iloc[0])
            assert est <= true
            assert est >= true * (1 - 1.0 / 64) - 1, (key, pct)

    def test_partitioning_bit_exact(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(92)
        df = pd.DataFrame({
            "k": rng.integers(0, 15, 4000),
            "v": rng.integers(0, 100_000, 4000).astype("int64")})
        a = self._run(df, tmp_path, "g2", nblocks=1, num_buckets=2)
        b = self._run(df, tmp_path, "g3", nblocks=9, num_buckets=7)
        pd.testing.assert_frame_equal(a, b, check_exact=True)

    def test_single_row_keys_exact(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd

        # one row per key at a power of two: estimate is exact
        df = pd.DataFrame({"k": np.arange(5),
                           "v": np.array([1, 2, 4, 8, 16], "int64")})
        out = self._run(df, tmp_path, "g4", pcts=(50,))
        assert out["est"].tolist() == [1, 2, 4, 8, 16]
        assert (out["rank"] == 1).all()

    def test_typed_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.sketch import hdr_quantiles_grouped

        df = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                           "v": pd.Series([], dtype="int64")})
        out = hdr_quantiles_grouped(
            rd.from_pandas(df), "k", "v",
            exchange_base=str(tmp_path / "g5"))
        assert out.schema().names == ["k", "pct", "rank", "est"]
