"""grouped_agg correctness vs pandas across fns and cardinalities."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def df():
    rng = np.random.default_rng(11)
    return pd.DataFrame({
        "k": rng.integers(0, 300, 20000).astype(str),
        "g2": rng.integers(0, 3, 20000),
        "v": rng.standard_normal(20000) * 10,
        "w": rng.integers(-50, 50, 20000),
    })


class TestGroupedAgg:
    def test_all_fns_match_pandas(self, ray_session, df):
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_agg

        got = grouped_agg(
            rd.from_pandas(df).repartition(8),
            ["k"],
            {
                "s": ("v", "sum"),
                "n": ("v", "count"),
                "lo": ("w", "min"),
                "hi": ("w", "max"),
                "m": ("v", "mean"),
            },
            num_buckets=8,
        ).to_pandas().set_index("k").sort_index()

        want = df.groupby("k").agg(
            s=("v", "sum"), n=("v", "size"), lo=("w", "min"),
            hi=("w", "max"), m=("v", "mean"),
        ).sort_index()
        want.index = want.index.astype(str)
        assert len(got) == len(want)
        assert (got.n.to_numpy() == want.n.to_numpy()).all()
        assert (got.lo.to_numpy() == want.lo.to_numpy()).all()
        assert (got.hi.to_numpy() == want.hi.to_numpy()).all()
        np.testing.assert_allclose(got.s.to_numpy(), want.s.to_numpy(), rtol=1e-12)
        np.testing.assert_allclose(got.m.to_numpy(), want.m.to_numpy(), rtol=1e-12)

    def test_multi_key(self, ray_session, df):
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_agg

        got = grouped_agg(
            rd.from_pandas(df).repartition(4),
            ["k", "g2"], {"n": ("v", "count")}, num_buckets=4,
        ).to_pandas()
        want = df.groupby(["k", "g2"]).size().reset_index(name="n")
        assert len(got) == len(want)
        g = got.sort_values(["k", "g2"]).reset_index(drop=True)
        w = want.sort_values(["k", "g2"]).reset_index(drop=True)
        assert (g.n.to_numpy() == w.n.to_numpy()).all()
