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


class TestUserStatsOrderSensitive:
    """The order-sensitive aggregate family folded into events_user_stats:
    exact count-distinct, mode with the lexicographic-min tie rule, and
    ordered string_agg."""

    def _run(self, tmp_path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.pipelines.suite import events_user_stats

        pq.write_table(pa.table({
            "event_id": list(range(len(rows["user_id"]))),
            "user_id": rows["user_id"],
            "event_type": rows["event_type"],
            "value": [1.0] * len(rows["user_id"]),
        }), str(tmp_path / "events.parquet"))
        out = events_user_stats(str(tmp_path))
        return out.to_pandas().sort_values("user_id").reset_index(drop=True)

    def test_mode_tie_breaks_lexicographic(self, ray_session, tmp_path):
        # user 1: b x2, a x2 (tie -> 'a'); user 2: z x3, a x1 (-> 'z')
        df = self._run(tmp_path, {
            "user_id": [1, 1, 1, 1, 2, 2, 2, 2],
            "event_type": ["b", "b", "a", "a", "z", "z", "z", "a"],
        })
        assert df.top_type.tolist() == ["a", "z"]
        assert df.n_types.tolist() == [2, 2]
        assert df.types_list.tolist() == ["a,b", "a,z"]
        assert df.n.tolist() == [4, 4]
        assert df.value_cents.tolist() == [400, 400]

    def test_empty_input_typed(self, ray_session, tmp_path):
        df = self._run(tmp_path, {"user_id": [], "event_type": []})
        assert len(df) == 0
        assert list(df.columns) == ["user_id", "n", "value_cents",
                                    "n_types", "top_type", "types_list"]
