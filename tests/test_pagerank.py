"""Exchange-native PageRank (functions/pagerank.py) vs a local dense
power iteration with identical semantics (teleport + dangling-mass
redistribution, L1 stopping rule)."""

import numpy as np
import pandas as pd
import pytest


def _ref_pagerank(edges: pd.DataFrame, d=0.85, max_iters=20, tol=1e-9):
    e = edges.drop_duplicates(["src", "dst"])
    nodes = sorted(set(e.src) | set(e.dst))
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    out = np.zeros(N)
    for s in e.src:
        out[idx[s]] += 1
    r = np.full(N, 1.0 / N)
    si = e.src.map(idx).to_numpy()
    di = e.dst.map(idx).to_numpy()
    for _ in range(max_iters):
        contrib = np.zeros(N)
        np.add.at(contrib, di, r[si] / out[si])
        dangling = r[out == 0].sum()
        r_new = (1 - d) / N + d * (contrib + dangling / N)
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            break
    return pd.DataFrame({"node_key": nodes, "rank": r})


def _graph(seed=4, n_nodes=80, n_edges=400):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "subj_key": [f"n{i}" for i in rng.integers(0, n_nodes, n_edges)],
        "obj_key": [f"n{i}" for i in rng.integers(0, n_nodes, n_edges)],
    })
    # guarantee some dangling nodes: targets that never appear as source
    df.loc[:10, "obj_key"] = [f"sink{i}" for i in range(11)]
    return df[df.subj_key != df.obj_key]


class TestPagerank:
    def test_matches_dense_reference(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.pagerank import pagerank

        df = _graph()
        got = pagerank(rd.from_pandas(df).repartition(4),
                       exchange_base=str(tmp_path / "pr"), num_buckets=4,
                       max_iters=20).to_pandas()
        want = _ref_pagerank(
            df.rename(columns={"subj_key": "src", "obj_key": "dst"}))
        m = got.merge(want, on="node_key", suffixes=("", "_ref"))
        assert len(m) == len(want)
        assert np.abs(m["rank"] - m["rank_ref"]).max() < 1e-12
        # probability mass conserved (dangling handled)
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_early_convergence(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.pagerank import pagerank

        # a 3-cycle converges to uniform immediately
        df = pd.DataFrame({"subj_key": ["a", "b", "c"],
                           "obj_key": ["b", "c", "a"]})
        got = pagerank(rd.from_pandas(df), exchange_base=str(tmp_path / "pr2"),
                       num_buckets=2, max_iters=50, tol=1e-12).to_pandas()
        assert np.allclose(got["rank"], 1 / 3)

    def test_empty_edges(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.pagerank import pagerank

        df = pd.DataFrame({"subj_key": pd.Series([], dtype=str),
                           "obj_key": pd.Series([], dtype=str)})
        got = pagerank(rd.from_pandas(df), exchange_base=str(tmp_path / "pr3"),
                       num_buckets=2).to_pandas()
        assert len(got) == 0


def _ref_pagerank_quantized(edges: pd.DataFrame, Q=10**12, num=17, den=20,
                            max_iters=10):
    """Single-process integer reference of the exact fixed-point
    recurrence (mirrors the SQL oracle)."""
    e = edges.drop_duplicates(["src", "dst"])
    nodes = sorted(set(e.src) | set(e.dst))
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    out = np.zeros(N, dtype=np.int64)
    for s in e.src:
        out[idx[s]] += 1
    r = np.full(N, Q // N, dtype=np.int64)
    si = e.src.map(idx).to_numpy()
    di = e.dst.map(idx).to_numpy()
    for _ in range(max_iters):
        contrib = np.zeros(N, dtype=np.int64)
        np.add.at(contrib, di, r[si] // out[si])
        dang = int(r[out == 0].sum())
        r = ((den - num) * Q) // (den * N) + (num * (contrib + dang // N)) // den
    return pd.DataFrame({"node_key": nodes, "rank": r})


class TestPagerankQuantized:
    def test_bit_exact_vs_integer_reference(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.pagerank import pagerank

        df = _graph(seed=12)
        got = pagerank(rd.from_pandas(df).repartition(4),
                       exchange_base=str(tmp_path / "prq"), num_buckets=4,
                       max_iters=10, quantize_scale=10**12).to_pandas()
        want = _ref_pagerank_quantized(
            df.rename(columns={"subj_key": "src", "obj_key": "dst"}))
        m = got.merge(want, on="node_key", suffixes=("", "_ref"))
        assert len(m) == len(want)
        assert got["rank"].dtype == np.int64
        assert (m["rank"] == m["rank_ref"]).all()  # BIT-exact, not close

    def test_quantized_close_to_float(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.pagerank import pagerank

        df = _graph(seed=5)
        q = pagerank(rd.from_pandas(df), exchange_base=str(tmp_path / "prq2"),
                     num_buckets=2, max_iters=20,
                     quantize_scale=10**12).to_pandas()
        f = _ref_pagerank(
            df.rename(columns={"subj_key": "src", "obj_key": "dst"}),
            max_iters=20, tol=0)
        m = q.merge(f, on="node_key", suffixes=("_q", "_f"))
        assert (np.abs(m["rank_q"] / 1e12 - m["rank_f"]) < 1e-9).all()


def _ref_ppr(edges: pd.DataFrame, prefix: str, d=0.85, max_iters=20,
             tol=1e-9):
    """Dense personalized PageRank reference: teleport + dangling mass
    restart only to seed nodes (key starts with prefix)."""
    e = edges.drop_duplicates(["src", "dst"])
    nodes = sorted(set(e.src) | set(e.dst))
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    seed = np.array([n.startswith(prefix) for n in nodes])
    S = int(seed.sum())
    out = np.zeros(N)
    for s in e.src:
        out[idx[s]] += 1
    r = np.where(seed, 1.0 / S, 0.0)
    si = e.src.map(idx).to_numpy()
    di = e.dst.map(idx).to_numpy()
    for _ in range(max_iters):
        contrib = np.zeros(N)
        np.add.at(contrib, di, r[si] / out[si])
        dangling = r[out == 0].sum()
        r_new = np.where(seed, (1 - d) / S, 0.0) \
            + d * (contrib + np.where(seed, dangling / S, 0.0))
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            break
    return pd.DataFrame({"node_key": nodes, "rank": r})


class TestPersonalizedPagerank:
    def test_matches_dense_reference(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.pagerank import pagerank

        df = _graph(seed=11)
        # make a seed family: relabel a handful of nodes with a prefix
        for old in ["n1", "n2", "n3"]:
            df.loc[df.subj_key == old, "subj_key"] = "seed:" + old
            df.loc[df.obj_key == old, "obj_key"] = "seed:" + old
        got = pagerank(
            rd.from_pandas(df).repartition(4), max_iters=25,
            exchange_base=str(tmp_path / "ppr"), num_buckets=4,
            seed_prefix="seed:",
        ).to_pandas().sort_values("node_key").reset_index(drop=True)
        want = _ref_ppr(df.rename(columns={"subj_key": "src",
                                           "obj_key": "dst"}),
                        "seed:", max_iters=25) \
            .sort_values("node_key").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, atol=1e-12, rtol=0)
        # mass concentrates on / near seeds; non-reachable nodes get 0
        assert got.loc[got.node_key.str.startswith("seed:"),
                       "rank"].sum() > 0.15

    def test_unmatched_prefix_raises_and_quantized_runs(
            self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.pagerank import pagerank

        df = _graph(seed=12)
        with pytest.raises(ValueError, match="seed prefix"):
            pagerank(rd.from_pandas(df),
                     exchange_base=str(tmp_path / "bad"),
                     seed_prefix="nosuch:")
        df.loc[df.subj_key == "n5", "subj_key"] = "s:n5"
        df.loc[df.obj_key == "n5", "obj_key"] = "s:n5"
        q = pagerank(rd.from_pandas(df), max_iters=8,
                     exchange_base=str(tmp_path / "q"), num_buckets=4,
                     quantize_scale=10**12,
                     seed_prefix="s:").to_pandas()
        f = pagerank(rd.from_pandas(df), max_iters=8,
                     exchange_base=str(tmp_path / "f"), num_buckets=4,
                     seed_prefix="s:").to_pandas()
        m = q.merge(f, on="node_key", suffixes=("_q", "_f"))
        # quantized ranks track float within iteration-accumulated
        # floor-division error
        assert (np.abs(m.rank_q / 1e12 - m.rank_f) < 1e-6).all()
        assert (q["rank"] >= 0).all() and q["rank"].dtype == "int64"
