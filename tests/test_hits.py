"""HITS: dense integer-reference parity, structural sanity on known
graphs, empty/guard behavior, partitioning invariance."""

import numpy as np
import pandas as pd
import pytest


def _dense_hits(edges: list[tuple], Q: int, iters: int):
    """Pure-Python reference of the SAME quantized recurrence."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    es = sorted({(idx[u], idx[v]) for u, v in edges})
    h = {i: Q for i in range(len(nodes))}
    a = {}
    mxh = Q
    mxa = 0
    for _ in range(iters):
        a = {i: 0 for i in range(len(nodes))}
        for u, v in es:
            a[v] += (h[u] * Q) // mxh
        mxa = max(a.values())
        h = {i: 0 for i in range(len(nodes))}
        for u, v in es:
            h[u] += (a[v] * Q) // mxa
        mxh = max(h.values())
    return {
        nodes[i]: ((h[i] * Q) // mxh, (a[i] * Q) // mxa)
        for i in range(len(nodes))
    }


def _run(edges, tmp_path, name, Q=1 << 20, iters=4, num_buckets=4):
    import ray.data as rd

    from guac_ray.functions.hits import hits

    df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
    out = hits(rd.from_pandas(df), max_iters=iters,
               exchange_base=str(tmp_path / name),
               num_buckets=num_buckets, quantize_scale=Q).to_pandas()
    return out.sort_values("node_key").reset_index(drop=True)


class TestHits:
    def test_dense_reference_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(41)
        nodes = [f"n{i}" for i in range(30)]
        edges = list({(nodes[a], nodes[b])
                      for a, b in rng.integers(0, 30, (150, 2))
                      if a != b})
        got = _run(edges, tmp_path, "h1", iters=5)
        want = _dense_hits(edges, 1 << 20, 5)
        assert len(got) == len(want)
        for _, row in got.iterrows():
            wh, wa = want[row["node_key"]]
            assert row["hub_fp"] == wh and row["auth_fp"] == wa, \
                row["node_key"]

    def test_star_graph_structure(self, ray_session, tmp_path):
        # spokes -> center: center is THE authority, spokes THE hubs
        edges = [(f"s{i}", "center") for i in range(5)]
        out = _run(edges, tmp_path, "h2").set_index("node_key")
        Q = 1 << 20
        assert out.loc["center", "auth_fp"] == Q
        assert out.loc["center", "hub_fp"] == 0
        for i in range(5):
            assert out.loc[f"s{i}", "hub_fp"] == Q
            assert out.loc[f"s{i}", "auth_fp"] == 0

    def test_partitioning_invariance(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.hits import hits

        rng = np.random.default_rng(42)
        edges = list({(f"n{a}", f"n{b}")
                      for a, b in rng.integers(0, 25, (120, 2))
                      if a != b})
        df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
        outs = []
        for i, (nblocks, nb) in enumerate([(1, 2), (7, 5)]):
            ds = rd.from_pandas(df).repartition(nblocks)
            outs.append(
                hits(ds, max_iters=3,
                     exchange_base=str(tmp_path / f"hp{i}"),
                     num_buckets=nb).to_pandas()
                .sort_values("node_key").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)

    def test_duplicate_edges_ignored(self, ray_session, tmp_path):
        base = [("a", "b"), ("c", "b")]
        out1 = _run(base, tmp_path, "h3")
        out2 = _run(base + base + [("a", "b")], tmp_path, "h4")
        pd.testing.assert_frame_equal(out1, out2, check_exact=True)

    def test_empty_and_guards(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.hits import hits

        df = pd.DataFrame({"subj_key": pd.Series([], dtype="object"),
                           "obj_key": pd.Series([], dtype="object")})
        out = hits(rd.from_pandas(df),
                   exchange_base=str(tmp_path / "h5"))
        # typed-empty contract on the Dataset schema (the house rule:
        # to_pandas of an empty from_arrow drops columns in Ray 2.49)
        assert out.schema().names == ["node_key", "hub_fp", "auth_fp"]
        assert len(out.to_pandas()) == 0
        with pytest.raises(ValueError, match="max_iters"):
            hits(rd.from_pandas(df), max_iters=0)

    def test_overflow_guard(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.hits import hits

        df = pd.DataFrame({"subj_key": ["a"], "obj_key": ["b"]})
        with pytest.raises(ValueError, match="int64 normalization"):
            hits(rd.from_pandas(df), quantize_scale=1 << 62,
                 exchange_base=str(tmp_path / "h6")).to_pandas()

    def test_integer_keys_refused(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.hits import hits

        df = pd.DataFrame({"subj_key": [1, 2], "obj_key": [2, 3]})
        with pytest.raises(Exception, match="strings"):
            hits(rd.from_pandas(df),
                 exchange_base=str(tmp_path / "h7")).to_pandas()
