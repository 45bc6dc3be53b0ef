"""Read-side graph queries over the node/edge Parquet tables
(SURVEY.md §2.12 — the reference Backend interface's Neighbors / Path /
toposort / blast-radius, re-expressed as table operations).

Design: filtered retrieval stays a Dataset op (scales); traversals
(BFS, toposort) run as ITERATIVE frontier expansion — each round is a
distributed semi-join of the edge table against the (small, broadcast)
frontier set, so only the frontier ever sits on the driver. This
mirrors pkg/guacanalytics/patchPlanning.go:56-115 (BFS blast radius)
and toposort.go:26-61 (Kahn) without an in-memory adjacency backend.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import pandas as pd

from ray.data import Dataset

__all__ = ["neighbors", "bfs_reach", "shortest_path", "toposort", "find_nodes",
           "paginate"]


def paginate(
    ds: Dataset,
    sort_keys: list[str],
    offset: int = 0,
    limit: int = 100,
    descending: bool = False,
) -> Dataset:
    """Deterministic offset/limit page over a sorted result — every
    read-side consumer's pagination contract (backends.go:118-127 takes
    the same {sort, offset, limit} triple). The sort is the distributed
    shuffle; offset+limit prune to one small head before the skip.

    ``sort_keys`` MUST be a total order (unique per row): a distributed
    sort gives no stable tie order across executions, so tie-prone keys
    make successive pages overlap/drop rows. Append enough columns to
    break every tie (e.g. the full edge identity)."""
    if offset < 0 or limit <= 0:
        raise ValueError("offset must be >= 0 and limit > 0")
    # the sort is the distributed shuffle; the limited head (offset+limit
    # rows) is driver-small by the pagination contract, so one Arrow
    # pull applies the skip. Arrow in, Arrow out: rd.from_items would
    # re-infer types (int32 → int64) and hand back a SCHEMA-LESS empty
    # for the past-the-end page every pagination client eventually asks
    # for — the exact class the typed-empty hardening eliminates.
    head = ds.sort(sort_keys, descending=descending).limit(offset + limit)
    import ray.data as rd

    batches = list(head.iter_batches(batch_size=offset + limit,
                                     batch_format="pyarrow"))
    if batches:
        return rd.from_arrow(pa.concat_tables(batches).slice(offset))
    from guac_ray.arrowutil import arrow_type_of

    sch = ds.schema()
    fields = ([(n, arrow_type_of(t) or pa.string())
               for n, t in zip(sch.names, sch.types)]
              if sch is not None else [])
    return rd.from_arrow(pa.schema(fields).empty_table())


def neighbors(
    edges: Dataset,
    node_key: str,
    direction: str = "out",
    preds: list[str] | None = None,
) -> Dataset:
    """Edges touching ``node_key`` (Neighbors with a usingOnly-style
    predicate filter — backends.go:118-127, inmem/path.go:42-170)."""

    def f(batch: pa.Table) -> pa.Table:
        if direction == "out":
            mask = pc.equal(batch["subj_key"], node_key)
        elif direction == "in":
            mask = pc.equal(batch["obj_key"], node_key)
        else:
            mask = pc.or_(
                pc.equal(batch["subj_key"], node_key),
                pc.equal(batch["obj_key"], node_key),
            )
        if preds:
            mask = pc.and_(mask, pc.is_in(batch["pred"], value_set=pa.array(preds)))
        return batch.filter(mask)

    return edges.map_batches(f, batch_format="pyarrow")


def _expand(
    edges: Dataset, frontier: set[str], preds: list[str] | None,
    direction: str = "out",
) -> set[str]:
    """One BFS round: distributed semi-join against the broadcast
    frontier; returns the next frontier's keys. ``direction="in"``
    walks edges REVERSE (obj → subj) — the dependents traversal."""
    src, dst = ("subj_key", "obj_key") if direction == "out" else ("obj_key", "subj_key")

    # built once per round, not per batch
    frontier_arr = pa.array(sorted(frontier))
    preds_arr = pa.array(preds) if preds else None

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[src], value_set=frontier_arr)
        if preds_arr is not None:
            mask = pc.and_(mask, pc.is_in(batch["pred"], value_set=preds_arr))
        t = batch.filter(mask)
        # per-batch dedup; the driver unions the (frontier-bounded) sets.
        # NOT Dataset.unique(): its Unique aggregate crashes with
        # "unhashable type: numpy.ndarray" on some block shapes
        return pa.table({"k": pc.unique(t[dst].combine_chunks())})

    rows = edges.map_batches(f, batch_format="pyarrow").take_all()
    return {r["k"] for r in rows}


def bfs_reach(
    edges: Dataset,
    start: str,
    max_depth: int = 10,
    preds: list[str] | None = None,
    direction: str = "out",
) -> dict[str, int]:
    """{reached node_key: depth} — the dependents "blast radius" BFS
    (patchPlanning.go:56-115), with the reference's maxPathLength-style
    bound (inmem/path.go:42). ``direction="in"`` walks reverse edges:
    over ``depends_on`` that is the set of packages whose dependency
    closure contains ``start`` — the patch blast radius."""
    depth = {start: 0}
    frontier = {start}
    for d in range(1, max_depth + 1):
        nxt = _expand(edges, frontier, preds, direction) - set(depth)
        if not nxt:
            break
        for k in nxt:
            depth[k] = d
        frontier = nxt
    return depth


def shortest_path(
    edges: Dataset, start: str, goal: str, max_depth: int = 10
) -> list[str] | None:
    """BFS with parent tracking → node-key path, or None."""
    parent: dict[str, str | None] = {start: None}
    frontier = {start}
    for _ in range(max_depth):
        if goal in parent:
            break

        fr_arr = pa.array(sorted(frontier))  # once per round, not per batch

        def f(batch: pa.Table, fr_arr=fr_arr) -> pa.Table:
            mask = pc.is_in(batch["subj_key"], value_set=fr_arr)
            t = batch.filter(mask)
            return pa.table({"s": t["subj_key"], "o": t["obj_key"]})

        hops = edges.map_batches(f, batch_format="pyarrow").to_pandas()
        nxt = set()
        for s, o in hops.itertuples(index=False):
            if o not in parent:
                parent[o] = s
                nxt.add(o)
        if not nxt:
            break
        frontier = nxt
    if goal not in parent:
        return None
    path = [goal]
    while parent[path[-1]] is not None:
        path.append(parent[path[-1]])
    return list(reversed(path))


def toposort(edges_df: pd.DataFrame) -> tuple[list[list[str]], bool]:
    """Kahn's level-order toposort over a (small, already-filtered) edge
    frame with columns subj_key/obj_key → (levels, has_cycle). The
    reference's toposort also materializes the subgraph first
    (toposort.go:26-61)."""
    out: dict[str, set[str]] = {}
    indeg: dict[str, int] = {}
    for s, o in edges_df[["subj_key", "obj_key"]].drop_duplicates().itertuples(index=False):
        out.setdefault(s, set()).add(o)
        indeg[o] = indeg.get(o, 0) + 1
        indeg.setdefault(s, indeg.get(s, 0))
    levels = []
    ready = sorted(k for k, d in indeg.items() if d == 0)
    seen = 0
    while ready:
        levels.append(ready)
        nxt = []
        for k in ready:
            seen += 1
            for o in sorted(out.get(k, ())):
                indeg[o] -= 1
                if indeg[o] == 0:
                    nxt.append(o)
        ready = sorted(nxt)
    return levels, seen != len(indeg)


def find_nodes(nodes: Dataset, substring: str, node_type: str | None = None) -> Dataset:
    """FindSoftware-style substring search over node keys
    (backends.go:27-128)."""

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(batch["node_key"], substring)
        if node_type:
            mask = pc.and_(mask, pc.equal(batch["node_type"], node_type))
        return batch.filter(mask)

    return nodes.map_batches(f, batch_format="pyarrow")
