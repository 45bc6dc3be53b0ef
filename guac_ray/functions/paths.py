"""Distributed single-source WEIGHTED shortest paths (k-iteration
Bellman-Ford) — the weighted complement of the BFS blast radius
(query/graph.py:bfs_reach / suite kg_patch_radius), built on the same
static-edge-bucket iteration scheme as functions/pagerank.py.

Semantics (stated so a SQL oracle can mirror it exactly): after k
iterations, ``dist(v)`` = the minimum total weight over all paths from
``source`` to ``v`` using AT MOST k edges — identical to a bounded
recursive CTE ``WHERE hops < k`` reduced by ``min(dist)``. Weights are
INTEGERS (exact addition, order-independent minima ⇒ the result is
bit-identical across any partitioning or engine). Nodes unreachable
within k hops are absent, like the CTE's.

Scale shape (what matters at 10⁹ edges):
  - the EDGE table is hash-partitioned by source into bucket files ONCE,
    locally reduced to min-weight per (src, dst) (parallel edges cannot
    improve a shortest path); iterations never reshuffle edges.
  - each iteration moves only the DIST table — and dist holds only
    REACHED nodes, so early rounds move frontier-sized data, not
    graph-sized. A relax job joins edge bucket k with dist bucket k
    (src-hash == node-hash, co-partition is free), emits per-dst
    candidate minima re-bucketed by dst hash; a merge job min-reduces
    (old dist ∪ candidates) per node bucket and emits one improved-count
    scalar per bucket — the driver sees B integers per round and stops
    early when they sum to zero (converged before k).
  - dist files have deterministic per-bucket names: a retried task
    overwrites its own output (idempotent), a crashed run resumes from
    the last completed ``dist_i`` directory.

The reference's analytics stop at BFS/toposort (pkg/guacanalytics/);
weighted reachability is the natural next question a patch planner asks
("cheapest upgrade path"), and Bellman-Ford is the canonical iterative
relaxation on this machinery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas
from guac_ray.exfs import (default_exchange, exchange_fs, fresh_exchange_dir,
                           fs_bucket_ids, fs_list_files, fs_mkdirs)
from guac_ray.functions.pagerank import _bucket_of, _read_bucket

__all__ = ["shortest_paths"]


def shortest_paths(
    edges: Dataset,
    source: str,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    k: int = 4,
    num_buckets: int = 8,
    exchange_base: str | None = None,
) -> Dataset:
    """Min total ``weight_col`` from ``source`` over paths of ≤ ``k``
    edges → Dataset(node_key, dist). Weights must be non-negative
    integers (the ≤k-edge semantics hold for any integers, but negative
    weights make "shortest" depend on k — refuse them)."""
    if k < 1:
        raise ValueError("shortest_paths: k must be >= 1")
    fsys, _ = exchange_fs()  # resolved ONCE; task closures capture it
    ex = fresh_exchange_dir(exchange_base or default_exchange("spaths"))
    B = num_buckets

    # ---- setup: edges bucketed by src, local min-weight per (src,dst) --
    def part_edges(df: pd.DataFrame) -> pa.Table:
        w = df[weight_col].to_numpy()
        if not np.issubdtype(w.dtype, np.integer):
            raise TypeError(
                f"shortest_paths: {weight_col!r} must be integer, got {w.dtype}")
        if len(w) and int(w.min()) < 0:
            raise ValueError("shortest_paths: negative weights unsupported")
        out = pd.DataFrame({"src": df[src_col], "dst": df[dst_col], "w": w})
        out = out.groupby(["src", "dst"], sort=False)["w"].min().reset_index()
        out["_bucket"] = _bucket_of(out["src"], B)
        return table_from_pandas(out, preserve_index=False)

    e0 = f"{ex}/edges0"
    edges.select_columns([src_col, dst_col, weight_col]).map_batches(
        part_edges, batch_format="pandas").write_parquet(
        e0, partition_cols=["_bucket"], filesystem=fsys)

    eadj = f"{ex}/edges"

    def build_adj(batch: pd.DataFrame) -> pa.Table:
        for kk in batch["k"]:
            df = _read_bucket(fsys, e0, int(kk))
            df = df.groupby(["src", "dst"], sort=False)["w"].min().reset_index()
            d = f"{eadj}/_bucket={kk}"
            fs_mkdirs(fsys, d)
            pq.write_table(table_from_pandas(df, preserve_index=False),
                           f"{d}/part.parquet", filesystem=fsys)
        return pa.table({"k": pa.array(batch["k"], type=pa.int64())})

    ebuckets = fs_bucket_ids(fsys, e0)
    # node-key type follows the EDGE schema (int-keyed graphs are
    # legal here, unlike pagerank): a hardcoded string empty would
    # clash with the int64 blocks of populated buckets downstream
    from guac_ray.arrowutil import arrow_type_of

    ktype = pa.string()
    sch = edges.schema()
    if sch is not None and dst_col in sch.names:
        t = arrow_type_of(dict(zip(sch.names, sch.types))[dst_col])
        if t is not None:
            ktype = t
    empty = pa.schema(
        [("node_key", ktype), ("dist", pa.int64())]).empty_table()
    if not ebuckets:
        return empty  # typed empty table (drivers accept pa.Table)
    rd.from_items([{"k": kk} for kk in ebuckets]).map_batches(
        build_adj, batch_format="pandas", batch_size=1).materialize()

    # ---- dist_0: the source at distance 0, in its node-hash bucket ----
    cur = f"{ex}/dist_0"
    sb = int(_bucket_of(pd.Series([source]), B)[0])
    d = f"{cur}/_bucket={sb}"
    fs_mkdirs(fsys, d)
    pq.write_table(table_from_pandas(pd.DataFrame(
        {"node_key": [source], "dist": np.array([0], dtype="int64")}),
        preserve_index=False), f"{d}/part.parquet", filesystem=fsys)

    for it in range(k):
        cdir = f"{ex}/cand_{it}"
        ndir = f"{ex}/dist_{it + 1}"

        def relax(batch: pd.DataFrame, cur=cur) -> pa.Table:
            outs = []
            for kk in batch["k"]:
                e = _read_bucket(fsys, eadj, int(kk))
                r = _read_bucket(fsys, cur, int(kk))
                if e is None or r is None:
                    continue
                m = e.merge(r, left_on="src", right_on="node_key",
                            how="inner")
                if not len(m):
                    continue
                cand = pd.DataFrame({
                    "node_key": m["dst"],
                    "dist": m["dist"].to_numpy() + m["w"].to_numpy()})
                cand = cand.groupby("node_key", sort=False)["dist"] \
                    .min().reset_index()
                cand["_bucket"] = _bucket_of(cand["node_key"], B)
                outs.append(cand)
            if not outs:
                return pa.schema([("node_key", ktype),
                                  ("dist", pa.int64()),
                                  ("_bucket", pa.int64())]).empty_table()
            return table_from_pandas(pd.concat(outs, ignore_index=True),
                                     preserve_index=False)

        rd.from_items([{"k": kk} for kk in ebuckets]).map_batches(
            relax, batch_format="pandas", batch_size=1).write_parquet(
            cdir, partition_cols=["_bucket"], filesystem=fsys)

        def merge(batch: pd.DataFrame, cur=cur, cdir=cdir,
                  ndir=ndir) -> pa.Table:
            improved = []
            for kk in batch["k"]:
                old = _read_bucket(fsys, cur, int(kk),
                                    columns=["node_key", "dist"])
                cand = _read_bucket(fsys, cdir, int(kk),
                                    columns=["node_key", "dist"])
                parts = [p for p in (old, cand) if p is not None]
                if not parts:
                    continue
                new = pd.concat(parts, ignore_index=True) \
                    .groupby("node_key", sort=False)["dist"].min() \
                    .reset_index()
                n_impr = len(new)
                if old is not None:
                    prev = old.set_index("node_key")["dist"]
                    got = new.set_index("node_key")["dist"]
                    common = got.index.intersection(prev.index)
                    n_impr = int((got.loc[common] < prev.loc[common]).sum()) \
                        + len(got.index.difference(prev.index))
                dd = f"{ndir}/_bucket={kk}"
                fs_mkdirs(fsys, dd)
                pq.write_table(table_from_pandas(new, preserve_index=False),
                               f"{dd}/part.parquet", filesystem=fsys)
                improved.append(n_impr)
            return pa.table({"improved": pa.array(
                [int(sum(improved))], type=pa.int64())})

        all_b = list(range(B))
        impr = rd.from_items([{"k": kk} for kk in all_b]).map_batches(
            merge, batch_format="pandas", batch_size=1).to_pandas()
        cur = ndir
        if int(impr["improved"].sum()) == 0:
            break  # exact fixpoint: further rounds are no-ops

    files = [f for b in fs_bucket_ids(fsys, cur)
             for f in fs_list_files(fsys, f"{cur}/_bucket={b}")]
    if not files:
        return empty
    # columns= also drops the hive-inferred _bucket partition column
    return rd.read_parquet(files, columns=["node_key", "dist"],
                           filesystem=fsys)
