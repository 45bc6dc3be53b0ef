"""ANN: brute-force exactness, IVF recall, near-dup LSH."""

import numpy as np
import pandas as pd
import pytest


def _emb_df(n=300, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    # plant a near-duplicate of vector 7
    mat[n - 1] = mat[7] + rng.standard_normal(dim) * 0.01
    return pd.DataFrame({"vec_id": range(n), "embedding": list(mat)})


def _exact_topk(df, qvec, k):
    mat = np.stack(df.embedding.to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = qvec / np.linalg.norm(qvec)
    sims = mat @ q
    order = np.lexsort((df.vec_id.to_numpy(), -sims))
    return list(df.vec_id.to_numpy()[order][:k])


class TestKnn:
    def test_brute_matches_numpy_exact(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.ann import knn_brute

        df = _emb_df()
        q = np.asarray(df.embedding.iloc[3])
        got = knn_brute(rd.from_pandas(df).repartition(4), [3], q[None, :], k=10,
                        concurrency=(1, 2)).to_pandas()
        got_ids = got.sort_values(["score", "vec_id"], ascending=[False, True]).vec_id.tolist()
        assert got_ids == _exact_topk(df, q, 10)

    def test_ivf_recall(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.ann import knn_ivf

        df = _emb_df()
        q = np.asarray(df.embedding.iloc[3])
        got = knn_ivf(rd.from_pandas(df).repartition(4), [3], q[None, :], k=10,
                      n_clusters=8, nprobe=4, concurrency=(1, 2)).to_pandas()
        want = set(_exact_topk(df, q, 10))
        recall = len(set(got.vec_id) & want) / 10
        assert recall >= 0.6, recall

    def test_neardup_finds_planted_pair(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.ann import embedding_neardup

        df = _emb_df()
        pairs = embedding_neardup(rd.from_pandas(df).repartition(3),
                                  threshold=0.98, concurrency=(1, 2)).to_pandas()
        got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
        assert (7, len(df) - 1) in got
