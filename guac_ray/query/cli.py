"""Convenience queries mirroring the reference's CLI surface
(``guacone query known|vuln|patch`` — cmd/guacone/cmd/{known,
vulnerability,patch}.go), expressed over the node/edge Parquet tables.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset

from guac_ray.canonical import NO_VULN_KEY
from guac_ray.query.graph import bfs_reach, neighbors, toposort

__all__ = ["known", "vulnerabilities", "patch_plan"]


def known(edges: Dataset, node_key: str) -> pd.DataFrame:
    """Everything known about a node: its edges in both directions,
    grouped per predicate (the ``query known`` report)."""
    out = neighbors(edges, node_key, direction="both").to_pandas()
    if out.empty:
        return pd.DataFrame({"pred": [], "direction": [], "other_key": [], "n": []})
    out["direction"] = (out.subj_key == node_key).map({True: "out", False: "in"})
    out["other_key"] = out.apply(
        lambda r: r.obj_key if r.direction == "out" else r.subj_key, axis=1
    )
    return (
        out.groupby(["pred", "direction", "other_key"])
        .size()
        .reset_index(name="n")
        .sort_values(["pred", "direction", "other_key"])
        .reset_index(drop=True)
    )


def vulnerabilities(edges: Dataset, pkg_key: str) -> pd.DataFrame:
    """certify_vuln + affected_by facts for a package, with the noVuln
    negative made explicit (the ``query vuln`` report)."""
    hits = neighbors(edges, pkg_key, direction="out",
                     preds=["certify_vuln", "affected_by"]).to_pandas()
    if hits.empty:
        return pd.DataFrame({"vuln_key": [], "pred": [], "is_novuln": []})
    out = pd.DataFrame({
        "vuln_key": hits.obj_key,
        "pred": hits.pred,
        "is_novuln": hits.obj_key == NO_VULN_KEY,
    })
    return out.drop_duplicates().sort_values(["pred", "vuln_key"]).reset_index(drop=True)


def patch_plan(edges: Dataset, node_key: str, max_depth: int = 10,
               preds: list[str] | None = None,
               direction: str = "out") -> dict:
    """Blast-radius plan for patching a node (``query patch``,
    pkg/guacanalytics/patchPlanning.go + toposort.go): BFS the dependents
    closure, then toposort the reached subgraph into update levels.

    Over ``preds=["depends_on"]`` pass ``direction="in"`` — the closure
    is then every package whose dependency chain contains ``node_key``
    (patch X, update its dependents), the reference's flagship patch
    workload."""
    depth = bfs_reach(edges, node_key, max_depth=max_depth, preds=preds,
                      direction=direction)
    reached = set(depth)
    # pull the full reached subgraph (small by construction of the BFS)
    import pyarrow as pa
    import pyarrow.compute as pc

    # value-set arrays built ONCE, not per batch (the _expand
    # discipline: 'once per round, not per batch')
    reach_arr = pa.array(sorted(reached))
    preds_arr = pa.array(preds) if preds else None

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(batch["subj_key"], value_set=reach_arr),
            pc.is_in(batch["obj_key"], value_set=reach_arr),
        )
        if preds_arr is not None:
            mask = pc.and_(mask, pc.is_in(batch["pred"],
                                          value_set=preds_arr))
        return batch.filter(mask)

    sub = edges.map_batches(f, batch_format="pyarrow").to_pandas()
    levels, has_cycle = toposort(sub) if len(sub) else ([[node_key]], False)
    return {
        "reached": depth,
        "levels": levels,
        "has_cycle": has_cycle,
        "n_nodes": len(reached),
    }
