"""Degree-oriented exact triangle counting (functions/triangles.py)."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from guac_ray.functions.triangles import _pairs_within_groups, triangle_count


def _brute(edges):
    """O(n³) reference over the undirected simple graph."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1 for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b])


def _run(edges, tmp_path, **kw):
    df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
    out = triangle_count(
        rd.from_pandas(df).repartition(3), "subj_key", "obj_key",
        exchange_base=str(tmp_path / "tri"), num_buckets=4, **kw)
    return out.to_pandas()["n_triangles"].iloc[0]


class TestTriangles:
    def test_known_small_graphs(self, ray_session, tmp_path):
        # triangle + pendant: exactly 1
        assert _run([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
                    tmp_path / "g1") == 1
        # K4: 4 triangles; with duplicate/reversed/self edges thrown in
        k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
              ("b", "d"), ("c", "d"), ("b", "a"), ("c", "c"),
              ("a", "b")]
        assert _run(k4, tmp_path / "g2") == 4
        # star (hub with 10 leaves): 0 — the orientation's raison d'être
        star = [("hub", f"x{i}") for i in range(10)]
        assert _run(star, tmp_path / "g3") == 0

    def test_random_graph_matches_brute_force(self, ray_session, tmp_path):
        rng = np.random.RandomState(5)
        nodes = [f"n{i:02d}" for i in range(30)]
        edges = [
            (nodes[i], nodes[j])
            for i in range(30) for j in range(i + 1, 30)
            if rng.rand() < 0.25
        ]
        # add a hot hub touching everything (skew path)
        edges += [("hub", n) for n in nodes]
        got = _run(edges, tmp_path)
        assert got == _brute(edges)
        assert got > 0

    def test_empty_and_no_triangles(self, ray_session, tmp_path):
        assert _run([("a", "b")], tmp_path / "e1") == 0
        assert _run([("a", "a")], tmp_path / "e2") == 0

    def test_wedge_chunking_invariance(self, ray_session, tmp_path):
        rng = np.random.RandomState(9)
        nodes = [f"m{i}" for i in range(20)]
        edges = [(a, b) for a, b in itertools.combinations(nodes, 2)
                 if rng.rand() < 0.5]
        want = _brute(edges)
        assert _run(edges, tmp_path / "c1", wedge_chunk=7) == want
        assert _run(edges, tmp_path / "c2", wedge_chunk=4_000_000) == want


class TestPairExpansion:
    def test_matches_itertools(self):
        rng = np.random.RandomState(3)
        for trial in range(20):
            sizes = rng.randint(0, 6, size=rng.randint(1, 8)) + 1
            dst, k = [], []
            for g, n in enumerate(sizes):
                vals = sorted(rng.randint(0, 100, size=n))
                dst.extend(vals)
                k.extend(range(n))
            dst = np.asarray(dst)
            k = np.asarray(k, dtype=np.int64)
            chunk = int(rng.randint(1, 10))
            got = set()
            for le, ri in _pairs_within_groups(dst, k, chunk):
                got.update(zip(le.tolist(), ri.tolist()))
            want = set()
            pos = 0
            for n in sizes:
                vals = dst[pos:pos + n]
                want.update((int(vals[i]), int(vals[j]))
                            for i in range(n) for j in range(i + 1, n))
                pos += n
            # multiset vs set: duplicates collapse — compare counts too
            total = sum(len(le) for le, _ in
                        _pairs_within_groups(dst, k, chunk))
            assert total == sum(n * (n - 1) // 2 for n in sizes)
            assert got == want, (sizes, chunk)


class TestClusteringCoefficient:
    def _brute_cc(self, edges, scale=1_000_000):
        adj = {}
        for a, b in edges:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        out = {}
        for v, nb in adj.items():
            d = len(nb)
            if d < 2:
                continue
            t = sum(1 for x, y in itertools.combinations(sorted(nb), 2)
                    if y in adj[x])
            out[v] = (d, t, scale * 2 * t // (d * (d - 1)))
        return out

    def _run(self, edges, base):
        from guac_ray.functions.triangles import clustering_coefficient

        df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
        out = clustering_coefficient(
            rd.from_pandas(df).repartition(3), "subj_key", "obj_key",
            exchange_base=str(base), num_buckets=4)
        got = out.to_pandas() if hasattr(out, "to_pandas") else out
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        return {r.node: (r.deg, r.n_triangles, r.coeff_fp)
                for r in got.itertuples()}

    def test_matches_bruteforce(self, ray_session, tmp_path):
        # triangle + pendant (c has an open wedge), duplicate/reversed/
        # self edges thrown in
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
                 ("b", "a"), ("a", "a"), ("c", "a")]
        assert self._run(edges, tmp_path / "g1") == self._brute_cc(edges)
        # K4 — every coefficient exactly scale (1.0)
        k4 = list(itertools.combinations("wxyz", 2))
        got = self._run(k4, tmp_path / "g2")
        assert got == self._brute_cc(k4)
        assert all(c == 1_000_000 for _, _, c in got.values())

    def test_chunked_wedge_source_alignment(self, ray_session, tmp_path):
        """wedge_chunk small enough to force MULTI-CHUNK pair expansion
        per bucket: pins the row-major np.repeat(src, k) alignment
        between the globally-built source column and the per-chunk
        concatenated pair arrays (a mis-alignment mis-credits triangles
        only when _pairs_within_groups actually chunks)."""
        from guac_ray.functions.triangles import clustering_coefficient

        rng = np.random.default_rng(23)
        edges = sorted({tuple(sorted((f"n{rng.integers(9)}",
                                      f"n{rng.integers(9)}")))
                        for _ in range(28)})
        want = self._brute_cc(edges)
        for chunk in (1, 2, 3):
            df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
            out = clustering_coefficient(
                rd.from_pandas(df).repartition(3), "subj_key", "obj_key",
                exchange_base=str(tmp_path / f"c{chunk}"), num_buckets=4,
                wedge_chunk=chunk)
            got = out.to_pandas() if hasattr(out, "to_pandas") else out
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
            assert {r.node: (r.deg, r.n_triangles, r.coeff_fp)
                    for r in got.itertuples()} == want, chunk

    def test_star_and_random(self, ray_session, tmp_path):
        # star: hub deg=5, zero triangles, coefficient 0; leaves deg=1
        # excluded entirely
        star = [("hub", f"l{i}") for i in range(5)]
        got = self._run(star, tmp_path / "g3")
        assert got == {"hub": (5, 0, 0)}
        rng = np.random.default_rng(7)
        edges = [tuple(sorted((f"n{rng.integers(12)}", f"n{rng.integers(12)}")))
                 for _ in range(40)]
        assert self._run(edges, tmp_path / "g4") == self._brute_cc(edges)

    def test_empty_and_selfloops(self, ray_session, tmp_path):
        got = self._run([("a", "a"), ("b", "b")], tmp_path / "g5")
        assert got == {}


class TestNeighborDegreeStats:
    def _brute(self, edges, scale=1_000_000):
        adj = {}
        for a, b in edges:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        out = {}
        for v, nb in adj.items():
            nds = [len(adj[x]) for x in nb]
            out[v] = (len(nds), sum(nds), max(nds),
                      scale * sum(nds) // len(nds))
        return out

    def _run(self, edges, base):
        from guac_ray.functions.triangles import neighbor_degree_stats

        df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
        out = neighbor_degree_stats(
            rd.from_pandas(df).repartition(3), "subj_key", "obj_key",
            exchange_base=str(base), num_buckets=4)
        got = out.to_pandas() if hasattr(out, "to_pandas") else out
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        return {r.node: (r.deg, r.sum_nbr_deg, r.max_nbr_deg,
                         r.mean_nbr_deg_fp) for r in got.itertuples()}

    def test_matches_bruteforce(self, ray_session, tmp_path):
        # star + triangle + duplicates/self-loops
        edges = [("hub", f"l{i}") for i in range(4)] + [
            ("a", "b"), ("b", "c"), ("c", "a"), ("a", "hub"),
            ("b", "a"), ("hub", "hub")]
        assert self._run(edges, tmp_path / "g1") == self._brute(edges)
        rng = np.random.default_rng(11)
        rand = [tuple(sorted((f"n{rng.integers(10)}", f"n{rng.integers(10)}")))
                for _ in range(30)]
        assert self._run(rand, tmp_path / "g2") == self._brute(rand)

    def test_empty(self, ray_session, tmp_path):
        assert self._run([("x", "x")], tmp_path / "g3") == {}


class TestCommonNeighbors:
    def _brute(self, edges, cap, min_common, scale=1_000_000):
        adj = {}
        for a, b in edges:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        from collections import Counter
        cn = Counter()
        for center, nb in adj.items():
            if len(adj[center]) > cap:
                continue
            for x, y in itertools.combinations(sorted(nb), 2):
                cn[(x, y)] += 1
        out = {}
        for (x, y), c in cn.items():
            if c < min_common:
                continue
            dx, dy = len(adj[x]), len(adj[y])
            out[(x, y)] = (c, dx, dy, scale * c // (dx + dy - c))
        return out

    def _run(self, edges, base, cap=64, min_common=2):
        from guac_ray.functions.triangles import common_neighbors

        df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
        out = common_neighbors(
            rd.from_pandas(df).repartition(3), "subj_key", "obj_key",
            exchange_base=str(base), num_buckets=4,
            max_center_degree=cap, min_common=min_common)
        got = out.to_pandas() if hasattr(out, "to_pandas") else out
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        return {(r.x, r.y): (r.common, r.deg_x, r.deg_y, r.jaccard_fp)
                for r in got.itertuples()}

    def test_matches_bruteforce(self, ray_session, tmp_path):
        rng = np.random.default_rng(31)
        edges = sorted({tuple(sorted((f"n{rng.integers(10)}",
                                      f"n{rng.integers(10)}")))
                        for _ in range(35)})
        assert (self._run(edges, tmp_path / "g1")
                == self._brute(edges, 64, 2))
        # min_common=1 keeps single-wedge pairs too
        assert (self._run(edges, tmp_path / "g2", min_common=1)
                == self._brute(edges, 64, 1))

    def test_center_degree_cap(self, ray_session, tmp_path):
        # star hub (deg 5 > cap 3): excluded as center, so leaf pairs
        # lose their only common neighbor -> empty result
        star = [("hub", f"l{i}") for i in range(5)]
        assert self._run(star, tmp_path / "g3", cap=3, min_common=1) == {}
        # with the cap raised the hub mediates all C(5,2) leaf pairs
        got = self._run(star, tmp_path / "g4", cap=5, min_common=1)
        assert got == self._brute(star, 5, 1) and len(got) == 10


class TestDegreeAssortativity:
    """Newman degree assortativity over directed stubs."""

    @staticmethod
    def _assort(edges, tmp_path, tag):
        from guac_ray.functions.triangles import degree_assortativity

        df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
        out = degree_assortativity(
            rd.from_pandas(df).repartition(3), "subj_key", "obj_key",
            exchange_base=str(tmp_path / tag), num_buckets=4).to_pandas()
        assert out["graph"].tolist() == ["all"]
        return out.iloc[0]

    def test_known_graphs(self, ray_session, tmp_path):
        # path a-b-c-d: the textbook r = -0.5 graph (n = 2m = 6 stubs)
        row = self._assort([("a", "b"), ("b", "c"), ("c", "d")],
                           tmp_path, "p4")
        assert row["n"] == 6
        assert row["corr"] == pytest.approx(-0.5)
        # star: maximally disassortative, r = -1 (hub deg 5, leaves 1)
        star = [("hub", f"x{i}") for i in range(5)]
        assert self._assort(star, tmp_path, "star")["corr"] \
            == pytest.approx(-1.0)
        # cycle: every degree 2 → zero variance → 0.0 by the const rule
        cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        assert self._assort(cyc, tmp_path, "cyc")["corr"] == 0.0

    def test_matches_numpy_and_dedup(self, ray_session, tmp_path):
        rng = np.random.RandomState(11)
        nodes = [f"n{i:02d}" for i in range(25)]
        edges = [(nodes[i], nodes[j])
                 for i in range(25) for j in range(i + 1, 25)
                 if rng.rand() < 0.2]
        # duplicates, reversals, self-loops must not move the answer
        noisy = edges + [(b, a) for a, b in edges[:7]] \
            + [("n00", "n00")] + edges[:3]
        row = self._assort(noisy, tmp_path, "rnd")
        # naive stub corr over the clean simple graph
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        x = np.array([deg[a] for a, b in edges]
                     + [deg[b] for a, b in edges], dtype=float)
        y = np.array([deg[b] for a, b in edges]
                     + [deg[a] for a, b in edges], dtype=float)
        assert row["n"] == 2 * len(edges)
        assert row["corr"] == pytest.approx(np.corrcoef(x, y)[0, 1])


class TestDegreeHistogram:
    """Degree-distribution counts over the canonical simple graph."""

    def test_hand_computed_and_noise_immune(self, ray_session, tmp_path):
        from collections import Counter

        from guac_ray.functions.triangles import degree_histogram

        # star(4 leaves) + a disjoint triangle: degs hub=4, leaves=1×4,
        # triangle=2×3 → hist {1:4, 2:3, 4:1}; dup/rev/self edges noise
        edges = [("hub", f"l{i}") for i in range(4)] \
            + [("a", "b"), ("b", "c"), ("c", "a")] \
            + [("l0", "hub"), ("hub", "l1"), ("x", "x")]
        df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
        got = degree_histogram(
            rd.from_pandas(df).repartition(3), "subj_key", "obj_key",
            exchange_base=str(tmp_path / "dh"), num_buckets=4,
        ).to_pandas().sort_values("deg").reset_index(drop=True)
        assert got[["deg", "n_nodes"]].values.tolist() == [
            [1, 4], [2, 3], [4, 1]]
        # invariants on a random graph: Σ n_nodes = |V|, Σ deg·n = 2|E|
        rng = np.random.RandomState(2)
        nodes = [f"n{i}" for i in range(40)]
        redges = [(nodes[i], nodes[j])
                  for i in range(40) for j in range(i + 1, 40)
                  if rng.rand() < 0.1]
        rdf = pd.DataFrame(redges, columns=["subj_key", "obj_key"])
        h = degree_histogram(
            rd.from_pandas(rdf).repartition(4), "subj_key", "obj_key",
            exchange_base=str(tmp_path / "dr"), num_buckets=4).to_pandas()
        deg = Counter()
        for a, b in redges:
            deg[a] += 1
            deg[b] += 1
        assert int(h["n_nodes"].sum()) == len(deg)
        assert int((h["deg"] * h["n_nodes"]).sum()) == 2 * len(redges)
        want = Counter(deg.values())
        assert {int(d): int(n) for d, n in zip(h["deg"], h["n_nodes"])} \
            == dict(want)


class TestReciprocity:
    """Directed-edge mutuality with canonical-pair co-location."""

    def test_hand_computed_and_noise(self, ray_session, tmp_path):
        from guac_ray.functions.triangles import reciprocity

        # a<->b mutual (2 mutual edges), a->c, c->d one-way, x->x loop,
        # duplicates of a->b: distinct directed = 4, mutual = 2
        edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"),
                 ("x", "x"), ("a", "b"), ("a", "b")]
        df = pd.DataFrame(edges, columns=["subj_key", "obj_key"])
        got = reciprocity(
            rd.from_pandas(df).repartition(3), "subj_key", "obj_key",
            exchange_base=str(tmp_path / "rc"), num_buckets=4)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        assert got[["graph", "n_directed", "n_mutual",
                    "reciprocity_fp"]].values.tolist() == [
            ["all", 4, 2, 500000]]

    def test_cross_partition_orientations_and_empty(
            self, ray_session, tmp_path):
        from guac_ray.functions.triangles import reciprocity

        # the two orientations live in DIFFERENT input blocks — the
        # canonical-pair bucket must still see both
        df = pd.DataFrame(
            [("p", "q")] * 5 + [("q", "p")] * 5 + [("p", "r")],
            columns=["subj_key", "obj_key"])
        got = reciprocity(
            rd.from_pandas(df).repartition(6), "subj_key", "obj_key",
            exchange_base=str(tmp_path / "x"), num_buckets=2)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        assert got[["n_directed", "n_mutual"]].values.tolist() == [[3, 2]]
        empty = pd.DataFrame({"subj_key": pd.Series([], dtype="object"),
                              "obj_key": pd.Series([], dtype="object")})
        out = reciprocity(rd.from_pandas(empty),
                          exchange_base=str(tmp_path / "e"))
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(out) == 0


class TestKTruss:
    """Triangle-support peeling vs the pure-Python reference."""

    def test_hand_graphs(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.triangles import k_truss

        # K4: every edge in exactly 2 triangles → 4-truss keeps all 6
        k4 = [(a, b) for i, a in enumerate("abcd")
              for b in "abcd"[i + 1:]]
        df = pd.DataFrame(k4, columns=["subj_key", "obj_key"])
        got = k_truss(rd.from_pandas(df), 4,
                      exchange_base=str(tmp_path / "k4")).to_pandas()
        assert len(got) == 6 and set(got.support) == {2}
        # K4 plus a pendant triangle sharing one vertex: the pendant
        # (support-1 edges) peels away at k=4, K4 survives intact
        df2 = pd.DataFrame(k4 + [("d", "x"), ("d", "y"), ("x", "y")],
                           columns=["subj_key", "obj_key"])
        got2 = k_truss(rd.from_pandas(df2).repartition(3), 4,
                       exchange_base=str(tmp_path / "kp")).to_pandas()
        assert sorted(map(tuple, got2[["u", "v"]].values.tolist())) == \
            sorted(k4)
        # triangle-free path → typed empty; k<3 refused
        path = pd.DataFrame({"subj_key": ["a", "b", "c"],
                             "obj_key": ["b", "c", "d"]})
        out = k_truss(rd.from_pandas(path), 3,
                      exchange_base=str(tmp_path / "pe"))
        assert out.count() == 0
        assert set(["u", "v", "support"]) <= set(out.schema().names)
        import pytest as _pt
        with _pt.raises(ValueError, match="k >= 3"):
            k_truss(rd.from_pandas(path), 2)

    def test_random_graph_parity_with_naive(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.triangles import k_truss, k_truss_naive

        rng = np.random.default_rng(9)
        n, m = 24, 160
        df = pd.DataFrame({
            "subj_key": [f"n{i}" for i in rng.integers(0, n, m)],
            "obj_key": [f"n{i}" for i in rng.integers(0, n, m)],
        })
        for k in (3, 5):
            got = k_truss(rd.from_pandas(df).repartition(4), k,
                          exchange_base=str(tmp_path / f"r{k}"),
                          num_buckets=4).to_pandas()
            gd = {(r.u, r.v): r.support for r in got.itertuples()}
            assert gd == k_truss_naive(df.values.tolist(), k)


class TestWave7Hardening:
    """Round-5 session-11: NULL endpoints and typed-empty contracts."""

    def test_null_endpoints_are_not_phantom_nodes(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.triangles import (degree_histogram,
                                                  triangle_count)

        # triangle x-y-z plus two null-endpoint edges
        df = pd.DataFrame({
            "subj_key": ["x", "y", "z", None, "x"],
            "obj_key": ["y", "z", "x", "x", None]})
        ds = rd.from_pandas(df)
        n = triangle_count(ds).to_pandas()["n_triangles"].iloc[0]
        assert n == 1
        hist = degree_histogram(ds).to_pandas()
        # all three real nodes have degree 2; no 'None'/'nan' phantom
        assert hist["deg"].tolist() == [2]
        assert hist["n_nodes"].tolist() == [3]

    def test_reciprocity_null_and_dataset_contract(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.triangles import reciprocity

        df = pd.DataFrame({
            "subj_key": ["a", "b", "a", None],
            "obj_key": ["b", "a", "c", "a"]})
        out = reciprocity(rd.from_pandas(df))
        pdf = out.to_pandas()          # Dataset surface (annotation)
        assert pdf["n_directed"].iloc[0] == 3
        assert pdf["n_mutual"].iloc[0] == 2
        # empty graph: typed-empty DATASET, not a bare pa.Table
        empty = reciprocity(rd.from_pandas(pd.DataFrame(
            {"subj_key": ["q"], "obj_key": ["q"]})))
        assert empty.count() == 0
        assert "reciprocity_fp" in empty.schema().names
