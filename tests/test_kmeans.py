"""Fixed-point k-means + SemDeDup-style semantic dedup
(functions/kmeans.py): parity with naive single-process references,
batch-layout invariance, tie + empty-cluster + witness rules."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from guac_ray.functions.kmeans import (kmeans_fixed_point,
                                       semdedup_embeddings)


def _naive(ids, X, k, iters, scale=4096, offset=1.0):
    """The contract, written as the obvious loop."""
    order = np.argsort(ids)
    q = np.floor((X.astype(np.float64) + offset) * scale).astype(np.int64)
    cents = q[order[:k]].copy()
    for _ in range(iters):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = q[m].sum(axis=0) // m.sum()
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def _ds(ids, X, blocks=3):
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    return rd.from_pandas(df).repartition(blocks)


class TestKmeans:
    def test_matches_naive_reference(self, ray_session):
        rng = np.random.RandomState(7)
        X = rng.uniform(-0.9, 0.9, size=(120, 8)).astype(np.float32)
        ids = np.arange(120, dtype=np.int64)
        rng.shuffle(ids)
        got = kmeans_fixed_point(
            _ds(ids, X), k=5, iters=3).to_pandas().sort_values("vec_id")
        want = _naive(ids, X, k=5, iters=3)
        order = np.argsort(ids)
        np.testing.assert_array_equal(
            got["cluster"].to_numpy(), want[order])

    def test_batch_layout_invariance(self, ray_session):
        rng = np.random.RandomState(11)
        X = rng.uniform(-0.5, 0.5, size=(60, 4)).astype(np.float32)
        ids = np.arange(60, dtype=np.int64)
        a = kmeans_fixed_point(_ds(ids, X, blocks=1), k=4, iters=2
                               ).to_pandas().sort_values("vec_id")
        b = kmeans_fixed_point(_ds(ids, X, blocks=7), k=4, iters=2
                               ).to_pandas().sort_values("vec_id")
        np.testing.assert_array_equal(a["cluster"].to_numpy(),
                                      b["cluster"].to_numpy())

    def test_tie_breaks_to_lowest_cluster(self, ray_session):
        # two IDENTICAL init points → every vector is equidistant from
        # clusters 0 and 1; all must land in 0
        X = np.array([[0.1, 0.1], [0.1, 0.1], [0.1, 0.1]], dtype=np.float32)
        ids = np.array([0, 1, 2], dtype=np.int64)
        got = kmeans_fixed_point(_ds(ids, X, blocks=1), k=2, iters=1
                                 ).to_pandas()
        assert set(got["cluster"]) == {0}

    def test_k_exceeds_rows_raises(self, ray_session):
        X = np.zeros((3, 2), dtype=np.float32)
        ids = np.arange(3, dtype=np.int64)
        with pytest.raises(ValueError, match="k=5"):
            kmeans_fixed_point(_ds(ids, X, blocks=1), k=5, iters=1)

    def test_semdedup_matches_naive(self, ray_session):
        """Cluster with _naive, then the any-lower-id-witness drop rule
        written as the obvious O(n²) loop."""
        rng = np.random.RandomState(3)
        X = rng.uniform(-0.9, 0.9, size=(150, 6)).astype(np.float32)
        ids = np.arange(150, dtype=np.int64)
        rng.shuffle(ids)
        k, iters, d2 = 4, 2, 3_000_000
        got = semdedup_embeddings(
            _ds(ids, X, blocks=4), k=k, iters=iters, dist2_max=d2,
        ).to_pandas().sort_values("vec_id").reset_index(drop=True)

        a = _naive(ids, X, k=k, iters=iters)
        q = np.floor((X.astype(np.float64) + 1.0) * 4096).astype(np.int64)
        order = np.argsort(ids)  # rows sorted by vec_id
        qs, cs = q[order], a[order]
        kept = np.ones(len(ids), dtype=np.int64)
        for j in range(len(ids)):
            for i in range(j):
                if cs[i] == cs[j] and ((qs[i] - qs[j]) ** 2).sum() <= d2:
                    kept[j] = 0
                    break
        np.testing.assert_array_equal(got["cluster"].to_numpy(), cs)
        np.testing.assert_array_equal(got["kept"].to_numpy(), kept)
        assert 0 < kept.sum() < len(ids)  # both branches exercised

    def test_semdedup_dropped_row_still_witnesses(self, ray_session):
        """Chain a–b–c with d(a,b)≤D, d(b,c)≤D, d(a,c)>D: the pair-graph
        rule drops BOTH b and c (b witnesses c even though b is itself
        dropped) — unlike the sequential greedy, which would keep c."""
        X = np.array([[0.0, 0.0], [0.012, 0.0], [0.024, 0.0],
                      [0.9, 0.9]], dtype=np.float32)
        ids = np.array([0, 1, 2, 3], dtype=np.int64)
        # quantized gaps: 0.012*4096 ≈ 49 → d²(a,b)=d²(b,c)≈2401,
        # d²(a,c)≈9604 — pick D between them
        got = semdedup_embeddings(
            _ds(ids, X, blocks=1), k=2, iters=1, dist2_max=4000,
        ).to_pandas().sort_values("vec_id")
        assert got["kept"].tolist() == [1, 0, 0, 1]

    def test_semdedup_layout_invariance_and_empty(self, ray_session):
        rng = np.random.RandomState(5)
        X = rng.uniform(-0.5, 0.5, size=(80, 4)).astype(np.float32)
        ids = np.arange(80, dtype=np.int64)
        a = semdedup_embeddings(_ds(ids, X, blocks=1), k=3, iters=2,
                                dist2_max=2_000_000).to_pandas()
        b = semdedup_embeddings(_ds(ids, X, blocks=9), k=3, iters=2,
                                dist2_max=2_000_000).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("vec_id").reset_index(drop=True),
            b.sort_values("vec_id").reset_index(drop=True))

    def test_semdedup_cluster_guard_raises(self, ray_session):
        X = np.zeros((30, 2), dtype=np.float32)  # one giant cluster
        ids = np.arange(30, dtype=np.int64)
        with pytest.raises(Exception, match="max_cluster_rows"):
            semdedup_embeddings(_ds(ids, X, blocks=1), k=2, iters=1,
                                dist2_max=10, max_cluster_rows=5
                                ).to_pandas()

    def test_quantize_floor_parity_with_duckdb(self, ray_session):
        """floor((float32→float64 + 1.0) * 4096) must be the identical
        int on both engines for awkward float32 values."""
        import duckdb

        vals = np.array(
            [0.123, -0.5252062, 0.45837352, 0.0, -1e-7, 0.99999994],
            dtype=np.float32)
        ours = np.floor((vals.astype(np.float64) + 1.0) * 4096).astype(
            np.int64)
        con = duckdb.connect()
        theirs = [con.execute(
            "SELECT CAST(floor((CAST(CAST(? AS FLOAT) AS DOUBLE) + 1.0)"
            " * 4096) AS BIGINT)", [float(v)]).fetchone()[0]
            for v in vals]
        np.testing.assert_array_equal(ours, np.array(theirs))


class TestEmptyBlocks:
    """Round-5 hardening: empty blocks (upstream filters) survive every
    kmeans/semdedup map stage instead of crashing on reshape(0, -1)."""

    def test_kmeans_survives_empty_blocks(self, ray_session):
        import pyarrow.compute as pc

        rng = np.random.RandomState(11)
        X = rng.uniform(-0.9, 0.9, size=(90, 6)).astype(np.float32)
        ids = np.arange(90, dtype=np.int64)
        ds = _ds(ids, X, blocks=6).map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 45)),
            batch_format="pyarrow")          # half the blocks empty
        got = kmeans_fixed_point(ds, k=4, iters=2).to_pandas()
        got = got.sort_values("vec_id")
        want = _naive(ids[:45], X[:45], k=4, iters=2)
        np.testing.assert_array_equal(got["cluster"].to_numpy(), want)

    def test_semdedup_survives_empty_blocks(self, ray_session, tmp_path):
        import pyarrow.compute as pc

        rng = np.random.RandomState(12)
        X = rng.uniform(-0.9, 0.9, size=(60, 6)).astype(np.float32)
        X[41] = X[40]                       # planted exact dup
        ids = np.arange(60, dtype=np.int64)
        ds = _ds(ids, X, blocks=6).map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 50)),
            batch_format="pyarrow")
        out = semdedup_embeddings(
            ds, k=3, iters=2, exchange_base=str(tmp_path / "sx"),
        ).to_pandas().sort_values("vec_id")
        assert len(out) == 50
        assert out[out.vec_id == 41].kept.iloc[0] == 0  # dup pruned
        assert out[out.vec_id == 40].kept.iloc[0] == 1  # lower id kept
