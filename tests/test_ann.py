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

    def test_ivf_save_load_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.ann import IvfIndex

        df = _emb_df()
        idx = IvfIndex.fit(rd.from_pandas(df).repartition(3), n_clusters=8)
        p = str(tmp_path / "ivf.parquet")
        idx.save(p)
        idx2 = IvfIndex.load(p)
        assert np.allclose(idx.centroids, idx2.centroids)

    def test_neardup_finds_planted_pair(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.ann import embedding_neardup

        df = _emb_df()
        pairs = embedding_neardup(rd.from_pandas(df).repartition(3),
                                  threshold=0.98, concurrency=(1, 2)).to_pandas()
        got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
        assert (7, len(df) - 1) in got

    def test_neardup_recall_vs_bruteforce(self, ray_session):
        """Multi-band LSH must recover ≥90% of true cosine≥0.95 pairs
        (the single-band design this replaced measured ~30%)."""
        import ray.data as rd

        from guac_ray.functions.ann import embedding_neardup

        rng = np.random.default_rng(21)
        n, dim, planted = 400, 32, 40
        mat = rng.standard_normal((n, dim))
        for i in range(planted):  # vec n-1-i ≈ vec i
            mat[n - 1 - i] = mat[i] + rng.standard_normal(dim) * 0.02
        df = pd.DataFrame({"vec_id": range(n), "embedding": list(mat)})

        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = nm @ nm.T
        iu = np.triu_indices(n, k=1)
        true_pairs = {
            (int(iu[0][j]), int(iu[1][j]))
            for j in np.nonzero(sims[iu] >= 0.95)[0]
        }
        assert len(true_pairs) >= planted  # sanity: corpus has true pairs

        # exact_limit=0 pins the LSH regime (default would go exact here)
        got = embedding_neardup(rd.from_pandas(df).repartition(4),
                                threshold=0.95, concurrency=(1, 2),
                                exact_limit=0).to_pandas()
        got_pairs = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
        recall = len(got_pairs & true_pairs) / len(true_pairs)
        assert recall >= 0.9, recall
        assert got_pairs <= true_pairs  # exact verify ⇒ no false positives

    def test_neardup_exact_regime_is_bruteforce(self, ray_session):
        """Under ``exact_limit`` the planner must return the FULL true
        pair set (recall 1.0) — the property the DuckDB oracle relies
        on for byte-stable comparison."""
        import ray.data as rd

        from guac_ray.functions.ann import embedding_neardup

        rng = np.random.default_rng(11)
        n, dim = 250, 24
        mat = rng.standard_normal((n, dim))
        for i in range(20):
            mat[n - 1 - i] = mat[i] + rng.standard_normal(dim) * 0.02
        df = pd.DataFrame({"vec_id": range(n), "embedding": list(mat)})

        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        iu = np.triu_indices(n, k=1)
        sims = (nm @ nm.T)[iu]
        true_pairs = {(int(iu[0][j]), int(iu[1][j]))
                      for j in np.nonzero(sims >= 0.95)[0]}

        got = embedding_neardup(rd.from_pandas(df).repartition(4),
                                threshold=0.95, concurrency=(1, 2)).to_pandas()
        got_pairs = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
        assert got_pairs == true_pairs
        # exact path emits each pair once — no cross-band duplicates
        assert len(got) == len(got_pairs)

    def test_neardup_join_verify_regime_512dim(self, ray_session, tmp_path):
        """Wide vectors above ``shuffle_cell_limit``: bands carry ids
        only and verification runs through the pairs ⋈ embeddings
        fs-exchange hash joins. Same contract as the in-shuffle regime:
        no false positives, planted near-dups recovered."""
        import ray.data as rd

        from guac_ray.functions.ann import embedding_neardup

        rng = np.random.default_rng(17)
        n, dim, planted = 300, 512, 25
        mat = rng.standard_normal((n, dim))
        for i in range(planted):
            mat[n - 1 - i] = mat[i] + rng.standard_normal(dim) * 0.01
        df = pd.DataFrame({"vec_id": range(n), "embedding": list(mat)})

        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        iu = np.triu_indices(n, k=1)
        sims = (nm @ nm.T)[iu]
        true_pairs = {(int(iu[0][j]), int(iu[1][j]))
                      for j in np.nonzero(sims >= 0.95)[0]}
        true_cos = {(int(iu[0][j]), int(iu[1][j])): float(sims[j])
                    for j in range(len(sims))}
        assert len(true_pairs) >= planted

        # exact_limit=0 + shuffle_cell_limit=0 force the join-verify plan
        got = embedding_neardup(
            rd.from_pandas(df).repartition(4), threshold=0.95,
            concurrency=(1, 2), exact_limit=0, shuffle_cell_limit=0,
            exchange_dir=str(tmp_path / "ex"), num_join_buckets=4,
        ).to_pandas()
        got_pairs = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
        assert got_pairs <= true_pairs            # verify ⇒ no false positives
        recall = len(got_pairs & true_pairs) / len(true_pairs)
        assert recall >= 0.9, recall
        assert len(got) == len(got_pairs)         # join verify didn't duplicate
        for r in got.itertuples(index=False):     # cosines come from the join
            assert abs(r.cosine - true_cos[(r.a, r.b)]) < 1e-9

    def test_ivf_fit_samples_uniformly_on_clustered_input(self, ray_session):
        """Sorted/clustered input: limit()-sampling sees only the first
        cluster; random_sample must place centroids in both, keeping
        recall for a query in the LAST cluster."""
        import ray.data as rd

        from guac_ray.functions.ann import IvfIndex, knn_ivf

        rng = np.random.default_rng(3)
        dim = 16
        a = rng.standard_normal(dim) * 10
        b = -a  # two far-apart clusters
        mat = np.concatenate([
            a + rng.standard_normal((500, dim)),   # first blocks: cluster A
            b + rng.standard_normal((500, dim)),   # last blocks: cluster B
        ])
        df = pd.DataFrame({"vec_id": range(1000), "embedding": list(mat)})
        ds = rd.from_pandas(df).repartition(8)

        idx = IvfIndex.fit(ds, n_clusters=8, sample=256)
        # at least one centroid must live in each half-space
        side = idx.centroids @ (a / np.linalg.norm(a))
        assert (side > 0).any() and (side < 0).any()

        q = np.asarray(df.embedding.iloc[999])
        got = knn_ivf(ds, [999], q[None, :], k=10, n_clusters=8, nprobe=4,
                      concurrency=(1, 2)).to_pandas()
        want = set(_exact_topk(df, q, 10))
        recall = len(set(got.vec_id) & want) / 10
        assert recall >= 0.9, recall


class TestRrfFuse:
    def test_fusion_semantics(self):
        from guac_ray.functions.ann import rrf_fuse

        lex = pd.DataFrame({"doc_id": [1, 2, 3], "lex_rank": [1, 2, 3]})
        vec = pd.DataFrame({"doc_id": [2, 4], "vec_rank": [1, 2]})
        out = rrf_fuse([("lex_rank", lex), ("vec_rank", vec)], k=10)
        # doc 2 is in BOTH legs -> must outrank doc 1 (lex rank 1 only)
        assert out.doc_id.tolist()[0] == 2
        row2 = out.set_index("doc_id").loc[2]
        assert row2.rrf_fp == 1_000_000 // 62 + 1_000_000 // 61
        # absent leg surfaces as rank 0 and contributes nothing
        row4 = out.set_index("doc_id").loc[4]
        assert row4.lex_rank == 0
        assert row4.rrf_fp == 1_000_000 // 62
        # deterministic id tie-break: docs 1 and 4 share no score here,
        # but equal-score ties order by doc_id ascending
        tie = rrf_fuse([("a", pd.DataFrame({"doc_id": [9, 5], "a": [1, 1]}))],
                       k=2)
        assert tie.doc_id.tolist() == [5, 9] or tie.a.tolist() == [1, 1]

    def test_top_k_cut_and_integer_exactness(self):
        from guac_ray.functions.ann import rrf_fuse

        legs = [("r1", pd.DataFrame({"doc_id": range(30),
                                     "r1": range(1, 31)}))]
        out = rrf_fuse(legs, k=5)
        assert len(out) == 5
        assert out.rrf_fp.tolist() == [1_000_000 // (60 + r)
                                       for r in range(1, 6)]
        assert out.rrf_fp.dtype == "int64"


class TestBatchRobustness:
    """Round-5 hardening: empty blocks survive every scorer, ragged/null
    vectors fail LOUDLY instead of silently scrambling row boundaries."""

    def test_empty_blocks_survive_scorers(self, ray_session):
        import pyarrow.compute as pc
        import ray.data as rd

        from guac_ray.functions.ann import knn_brute, knn_ivf

        df = _emb_df(n=200)
        ds = rd.from_pandas(df).repartition(8).map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 100)),
            batch_format="pyarrow")          # half the blocks come back empty
        q = np.asarray(df.embedding.iloc[3])
        got = knn_brute(ds, [3], q[None, :], k=5,
                        concurrency=(1, 2)).to_pandas()
        sub = df[df.vec_id < 100]
        assert sorted(got.vec_id.tolist()) == sorted(_exact_topk(sub, q, 5))
        # IVF path takes the same empty blocks through _IvfScorer
        got2 = knn_ivf(ds, [3], q[None, :], k=5, n_clusters=4,
                       nprobe=4, concurrency=(1, 2)).to_pandas()
        assert len(got2) == 5

    def test_empty_blocks_survive_neardup_project(self, ray_session):
        import pyarrow.compute as pc
        import ray.data as rd

        from guac_ray.functions.ann import embedding_neardup

        df = _emb_df(n=120)
        ds = rd.from_pandas(df).repartition(6).map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 60)),
            batch_format="pyarrow")
        # force the LSH regime (exact_limit below the row count)
        out = embedding_neardup(ds, threshold=0.8, exact_limit=10,
                                concurrency=(1, 2))
        # the dataset must carry the TYPED pair schema even when zero
        # pairs survive (Ray's to_pandas drops columns on any fully
        # empty dataset, so assert on the schema contract itself)
        sch = out.schema()
        assert sch.names == ["a", "b", "cosine"]
        assert out.count() == 0

    def test_batch_mat_rejects_ragged_and_null(self):
        import pyarrow as pa

        from guac_ray.functions.ann import _batch_mat

        ragged = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                           "embedding": pa.array([[1.0, 2.0, 3.0],
                                                  [4.0, 5.0, 6.0, 7.0]])})
        with pytest.raises(ValueError, match="ragged"):
            _batch_mat(ragged)
        withnull = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                             "embedding": pa.array([[1.0, 2.0], None],
                                                   pa.list_(pa.float64()))})
        with pytest.raises(ValueError, match="null"):
            _batch_mat(withnull)
        # the silent-scramble shape: 2 rows, flat size 6 divides evenly
        # into (2, 3) — MUST still raise, not misalign
        scramble = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                             "embedding": pa.array([[1.0, 2.0],
                                                    [3.0, 4.0, 5.0, 6.0]])})
        with pytest.raises(ValueError, match="ragged"):
            _batch_mat(scramble)
