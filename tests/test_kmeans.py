"""Fixed-point k-means (functions/kmeans.py): parity with a naive
single-process reference, batch-layout invariance, tie + empty-cluster
rules."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from guac_ray.functions.kmeans import kmeans_fixed_point


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
