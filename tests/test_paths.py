"""Weighted shortest paths: weight-vs-hop divergence, k-edge bound,
parallel-edge min, validation."""

import numpy as np
import pandas as pd
import pytest


def _sp(edges, source, k=4, tmp=None):
    import ray.data as rd

    from guac_ray.functions.paths import shortest_paths

    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    df["w"] = df.w.astype("int64")
    out = shortest_paths(rd.from_pandas(df), source, k=k, num_buckets=4,
                         exchange_base=str(tmp / "sp") if tmp else None)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out.to_pandas()
    return dict(zip(out.node_key, out.dist))


class TestShortestPaths:
    def test_weighted_beats_fewer_hops(self, ray_session, tmp_path):
        # a→z direct costs 10; a→b→z costs 2+3=5 — weighted SP must
        # pick the LONGER-hop cheaper path (where BFS would not)
        d = _sp([("a", "z", 10), ("a", "b", 2), ("b", "z", 3)], "a",
                tmp=tmp_path)
        assert d == {"a": 0, "b": 2, "z": 5}

    def test_k_edge_bound(self, ray_session, tmp_path):
        # chain a→b→c→d→e→f: f needs 5 edges, absent at k=4
        chain = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
                 ("d", "e", 1), ("e", "f", 1)]
        d4 = _sp(chain, "a", k=4, tmp=tmp_path)
        assert "f" not in d4 and d4["e"] == 4
        d5 = _sp(chain, "a", k=5, tmp=tmp_path)
        assert d5["f"] == 5

    def test_parallel_edges_keep_min(self, ray_session, tmp_path):
        d = _sp([("a", "b", 9), ("a", "b", 2)], "a", tmp=tmp_path)
        assert d["b"] == 2

    def test_early_stop_converged(self, ray_session, tmp_path):
        # diamond converges in 2 rounds; k=50 must not loop 50 times
        # (smoke: correctness under the early-stop path)
        d = _sp([("a", "b", 1), ("a", "c", 5), ("b", "c", 1)], "a",
                k=50, tmp=tmp_path)
        assert d == {"a": 0, "b": 1, "c": 2}

    def test_unreachable_and_source_isolated(self, ray_session, tmp_path):
        d = _sp([("x", "y", 1)], "a", tmp=tmp_path)
        assert d == {"a": 0}  # source itself, nothing else

    def test_validation(self, ray_session, tmp_path):
        with pytest.raises(ValueError):
            _sp([("a", "b", 1)], "a", k=0, tmp=tmp_path)
        with pytest.raises(Exception):  # negative weight refused
            _sp([("a", "b", -1)], "a", tmp=tmp_path)
