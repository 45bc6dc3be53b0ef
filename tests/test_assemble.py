"""Dedup / salted-count shuffle correctness, incl. the skew fixture."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def ray_ok(ray_session):
    import ray.data as rd

    return rd


class TestDedupExact:
    def test_cross_block_dedup_first_wins(self, ray_ok):
        import ray.data as rd

        from guac_ray.stages.assemble import dedup_exact

        # duplicates scattered across many blocks
        df = pd.DataFrame(
            {"k": [f"key{i % 50}" for i in range(5000)],
             "v": list(range(5000))}
        )
        ds = rd.from_pandas(df).repartition(16)
        out = dedup_exact(ds, ["k"], num_buckets=8, keep_cols=["k", "v"]).to_pandas()
        assert len(out) == 50
        assert set(out.k) == set(df.k)

    def test_identity_only_output(self, ray_ok):
        import ray.data as rd

        from guac_ray.stages.assemble import dedup_exact

        df = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "x", "y"], "c": [9, 8, 7]})
        out = dedup_exact(rd.from_pandas(df), ["a", "b"], num_buckets=4).to_pandas()
        assert sorted(out.columns) == ["a", "b"]
        assert len(out) == 2


class TestDedupExactFs:
    def test_fs_exchange_matches_object_store_path(self, ray_ok, tmp_path):
        import ray.data as rd

        from guac_ray.stages.assemble import dedup_exact, dedup_exact_fs

        df = pd.DataFrame(
            {"k": [f"key{i % 37}" for i in range(4000)],
             "p": [f"p{i % 5}" for i in range(4000)]}
        )
        ds = rd.from_pandas(df).repartition(8)
        a = dedup_exact(ds, ["k", "p"], num_buckets=8).to_pandas()
        b = dedup_exact_fs(
            rd.from_pandas(df).repartition(8), ["k", "p"],
            str(tmp_path / "exch"), num_buckets=8,
        ).to_pandas()
        sa = set(map(tuple, a.itertuples(index=False)))
        sb = set(map(tuple, b[["k", "p"]].itertuples(index=False)))
        assert sa == sb and len(sa) == 37 * 5

    def test_e2e_exchange_path_matches_golden(self, ray_ok, smoke_corpus, tmp_path):
        from guac_ray.pipelines.kg import build_graph
        from guac_ray.schemas import EDGE_IDENTITY

        # sort=True exercises the clustered-order fs exchange as well
        g = build_graph(
            smoke_corpus["transcripts"], catalog_path=smoke_corpus["catalog"],
            sort=True, num_buckets=8, exchange_dir=str(tmp_path / "ex"),
        )
        got = g["edges"].to_pandas()
        golden = pd.read_parquet(smoke_corpus["golden_edges"])
        sg = set(map(tuple, got[EDGE_IDENTITY].itertuples(index=False)))
        sw = set(map(tuple, golden[EDGE_IDENTITY].itertuples(index=False)))
        assert sg == sw


class TestSaltedCount:
    def test_matches_plain_value_counts_on_skew(self, ray_ok):
        import ray.data as rd

        from guac_ray.stages.assemble import salted_count

        rng = np.random.default_rng(3)
        # zipf-ish: one hot key ~40%
        keys = np.where(rng.random(20000) < 0.4, "hot",
                        rng.integers(0, 500, 20000).astype(str))
        df = pd.DataFrame({"k": keys})
        ds = rd.from_pandas(df).repartition(8)
        got = salted_count(ds, ["k"], num_salts=8, alias="n").to_pandas()
        want = df.k.value_counts()
        assert len(got) == len(want)
        merged = got.set_index("k").n.sort_index()
        pd.testing.assert_series_equal(
            merged, want.sort_index(), check_names=False
        )
