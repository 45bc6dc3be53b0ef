"""Read-side graph queries: neighbors / BFS / path / toposort / find."""

import pandas as pd
import pytest

from guac_ray.query.graph import bfs_reach, find_nodes, neighbors, shortest_path, toposort


def _edges_df():
    rows = [
        ("a", "depends_on", "b"),
        ("b", "depends_on", "c"),
        ("c", "depends_on", "d"),
        ("a", "mentions", "x"),
        ("q", "depends_on", "a"),
    ]
    return pd.DataFrame(rows, columns=["subj_key", "pred", "obj_key"]).assign(
        subj_type="n", obj_type="n"
    )


@pytest.fixture()
def edges_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(_edges_df()).repartition(2)


class TestGraphQueries:
    def test_neighbors_directions_and_pred_filter(self, edges_ds):
        out = neighbors(edges_ds, "a", "out").to_pandas()
        assert set(out.obj_key) == {"b", "x"}
        out = neighbors(edges_ds, "a", "in").to_pandas()
        assert set(out.subj_key) == {"q"}
        out = neighbors(edges_ds, "a", "out", preds=["depends_on"]).to_pandas()
        assert set(out.obj_key) == {"b"}

    def test_bfs_reach_depths_and_bound(self, edges_ds):
        d = bfs_reach(edges_ds, "a", max_depth=10, preds=["depends_on"])
        assert d == {"a": 0, "b": 1, "c": 2, "d": 3}
        d = bfs_reach(edges_ds, "a", max_depth=1, preds=["depends_on"])
        assert d == {"a": 0, "b": 1}

    def test_shortest_path(self, edges_ds):
        assert shortest_path(edges_ds, "q", "d") == ["q", "a", "b", "c", "d"]
        assert shortest_path(edges_ds, "d", "a") is None

    def test_toposort_and_cycle(self):
        levels, cyc = toposort(_edges_df())
        assert not cyc
        assert levels[0] == ["q"]
        flat = [n for lvl in levels for n in lvl]
        assert flat.index("a") < flat.index("b") < flat.index("c") < flat.index("d")
        cyc_df = pd.DataFrame(
            [("a", "p", "b"), ("b", "p", "a")],
            columns=["subj_key", "pred", "obj_key"],
        )
        _, cyc = toposort(cyc_df)
        assert cyc

    def test_find_nodes(self, ray_session):
        import ray.data as rd

        nodes = rd.from_pandas(pd.DataFrame({
            "node_type": ["package", "tool"],
            "node_key": ["pkg:pypi/requests@2.0", "ent:tool/search"],
            "attrs": ["{}", "{}"],
        }))
        out = find_nodes(nodes, "requests").to_pandas()
        assert list(out.node_key) == ["pkg:pypi/requests@2.0"]
        out = find_nodes(nodes, "e", node_type="tool").to_pandas()
        assert list(out.node_key) == ["ent:tool/search"]
