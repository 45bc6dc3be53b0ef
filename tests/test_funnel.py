"""Funnel operator semantics: anchored window, strict ordering,
earliest-completion, missing-step-1 keys."""

import pandas as pd
import pyarrow as pa
import pytest


def _run(rows, within=None, steps=("a", "b", "c")):
    import ray.data as rd

    from guac_ray.functions.funnel import funnel

    df = pd.DataFrame(rows, columns=["user", "ts", "step"])
    df["ts"] = pd.to_datetime(df.ts, unit="s").astype("datetime64[us]")
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = funnel(ds, "user", "ts", "step", list(steps), within=within,
                 num_buckets=4)
    if isinstance(out, pa.Table):
        return out.to_pandas()
    return out.to_pandas().sort_values("user").reset_index(drop=True)


class TestFunnel:
    def test_full_chain_earliest(self, ray_session):
        out = _run([
            (1, 100, "a"), (1, 50, "a"),        # t1 = min = 50
            (1, 60, "b"), (1, 40, "b"),         # 40 <= t1 → t2 = 60
            (1, 70, "c"),
        ])
        r = out.iloc[0]
        assert r.funnel_level == 3
        assert r.t1 == pd.Timestamp(50, unit="s")
        assert r.t2 == pd.Timestamp(60, unit="s")
        assert r.t3 == pd.Timestamp(70, unit="s")

    def test_step_order_strict(self, ray_session):
        # c before b: chain stops at level 1 (b never happens after a)
        out = _run([(1, 10, "a"), (1, 20, "c"), (1, 5, "b")])
        assert out.iloc[0].funnel_level == 1
        assert pd.isna(out.iloc[0].t2) and pd.isna(out.iloc[0].t3)

    def test_missing_step1_absent(self, ray_session):
        out = _run([(1, 10, "a"), (2, 10, "b"), (2, 20, "c")])
        assert out.user.tolist() == [1]

    def test_anchored_window_boundary(self, ray_session):
        # within = 10s anchored at t1=0: b at exactly +10 passes,
        # c at +11 fails even though it is within 10s of b
        out = _run([(1, 0, "a"), (1, 10, "b"), (1, 11, "c")],
                   within=pd.Timedelta(seconds=10))
        r = out.iloc[0]
        assert r.funnel_level == 2
        assert r.t2 == pd.Timestamp(10, unit="s") and pd.isna(r.t3)

    def test_equal_ts_not_after(self, ray_session):
        # b at the same instant as a does NOT count (strict >)
        out = _run([(1, 10, "a"), (1, 10, "b")])
        assert out.iloc[0].funnel_level == 1

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            _run([(1, 1, "a")], steps=("a",))
        with pytest.raises(ValueError):
            _run([(1, 1, "a")], steps=("a", "a"))

    def test_empty_typed(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.funnel import funnel

        df = pd.DataFrame([], columns=["user", "ts", "step"])
        df["ts"] = pd.to_datetime(df.ts, unit="s").astype("datetime64[us]")
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        out = funnel(ds, "user", "ts", "step", ["a", "b", "c"],
                     num_buckets=4)
        # typed empty DATASET — same contract as the populated path
        # (Ray's to_pandas drops columns on fully empty datasets, so
        # assert the schema itself)
        assert out.count() == 0
        assert out.schema().names == [
            "user", "funnel_level", "t1", "t2", "t3"]
