"""Distributed HITS (Kleinberg hubs & authorities) over the assembled
edge table — the bipartite-influence complement of
``functions/pagerank.py``: PageRank scores global importance under a
random surfer; HITS separates "points at good content" (hub) from "is
good content" (authority), the query a provenance KG answers when
asked *which tools/documents vouch for the important artifacts*.

Algorithm: the standard mutual recursion with max-normalization,

    a_i(v) = Σ_{u→v} norm(h_{i-1})(u)      (authority from in-edges)
    h_i(u) = Σ_{u→v} norm(a_i)(v)          (hub from out-edges)
    norm(x)(v) = x(v)·Q // max(x)          (fixed-point, int64)

iterated ``max_iters`` times. Everything is EXACT int64: scores are
multiples of 1/Q, the normalizing division is floor division, and
integer sums are order-independent — so the result is bit-identical
across any partitioning or engine, and the suite's ``kg_hits`` carries
a DuckDB oracle spelling the IDENTICAL unrolled recurrence
(the ``kg_pagerank_top`` discipline). Max-normalization (not L2) keeps
the arithmetic rational; any consistent norm yields the same ranking.

Overflow budget: a raw score is a sum of ≤ N normalized values ≤ Q, so
raw ≤ N·Q, and the normalizing product raw·Q ≤ N·Q² must fit int64 —
asserted at setup (N·Q² < 2⁶³; default Q = 2²⁰ holds to ~8.4M nodes;
larger graphs lower Q, the error message names the trade).

Scale shape (the pagerank contract, doubled):
  - the distinct edge table is hash-partitioned TWICE at setup — by
    src (the h-step's co-partition) and by dst (the a-step's) — into
    static bucket files; iterations never reshuffle edges.
  - each half-step moves only the SCORE table: a contribution job
    joins edge bucket k with score bucket k (both co-partitioned on
    the join side), applies the previous half-step's normalization
    inline (``(rank·Q) // mx`` with the driver-folded scalar max —
    one B-row fold per half-step, nothing node-sized on the driver),
    and writes per-target partial sums re-bucketed by target hash; a
    reduce job sums each bucket and emits its bucket max.
  - deterministic per-bucket file names → retried tasks overwrite
    their own output (idempotent), crashed runs resume from the last
    completed score directory.

The reference has no spectral analytics (pkg/guacanalytics/ stops at
BFS/toposort); HITS is a from-scratch addition on the repo's exchange
primitives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas
from guac_ray.exfs import (bucket_of_keys, default_exchange, exchange_fs,
                           fresh_exchange_dir, fs_bucket_ids,
                           fs_list_files, fs_mkdirs, fs_num_rows)

__all__ = ["hits"]


from guac_ray.exfs import read_bucket_df as _read_bucket

_bucket_of = bucket_of_keys


def hits(
    edges: Dataset,
    src_col: str = "subj_key",
    dst_col: str = "obj_key",
    max_iters: int = 8,
    exchange_base: str | None = None,
    num_buckets: int = 16,
    quantize_scale: int = 1 << 20,
) -> Dataset:
    """HITS hub/authority scores of the directed graph in ``edges`` →
    Dataset(node_key, hub_fp, auth_fp), both int64 fixed-point in
    [0, Q] (max-normalized; divide by ``quantize_scale`` for [0, 1]
    scores). The returned Dataset reads the final score bucket files
    straight from the exchange — take top-k via sort+limit, nothing
    node-sized transits the driver."""
    if max_iters < 1:
        raise ValueError(f"hits: max_iters must be >= 1, got {max_iters}")
    fsys, _ = exchange_fs()  # resolved once; task closures capture it
    ex = fresh_exchange_dir(exchange_base or default_exchange("hits"))
    B = num_buckets
    Q = quantize_scale

    # ---- setup: distinct edges in TWO layouts (by src, by dst) ----
    def part_edges(df: pd.DataFrame, by: str) -> pa.Table:
        # drop NULL endpoints FIRST (the kcore/label_propagation rule):
        # pandas merge MATCHES NaN/None join keys, so a kept null edge
        # would propagate score through a phantom NULL node while the
        # SQL oracle's JOIN never matches NULL — silent divergence
        ok = df[src_col].notna() & df[dst_col].notna()
        out = pd.DataFrame({"src": df[src_col][ok],
                            "dst": df[dst_col][ok]}).drop_duplicates()
        # string keys only (the pagerank-family rule): every internal
        # empty/typed-schema path pins node_key to string, so an
        # integer-keyed graph would flip schemas between empty and
        # populated buckets — refuse at ingest with the fix named
        for c in ("src", "dst"):
            if np.issubdtype(out[c].to_numpy().dtype, np.number):
                raise TypeError(
                    f"hits: {c!r} node keys must be strings — "
                    "stringify integer ids upstream, e.g. .astype(str)")
        out["_bucket"] = _bucket_of(out[by], B)
        return table_from_pandas(out, preserve_index=False)

    e_src0 = f"{ex}/esrc0"
    e_dst0 = f"{ex}/edst0"
    sel = edges.select_columns([src_col, dst_col])
    sel.map_batches(lambda d: part_edges(d, "src"),
                    batch_format="pandas").write_parquet(
        e_src0, partition_cols=["_bucket"], filesystem=fsys)
    sel.map_batches(lambda d: part_edges(d, "dst"),
                    batch_format="pandas").write_parquet(
        e_dst0, partition_cols=["_bucket"], filesystem=fsys)

    empty = pa.schema([("node_key", pa.string()),
                       ("hub_fp", pa.int64()),
                       ("auth_fp", pa.int64())])
    sbuckets = fs_bucket_ids(fsys, e_src0)
    if not sbuckets:
        return rd.from_arrow(empty.empty_table())

    # per-layout in-bucket dedup (cross-batch dupes) + node emission
    def dedup_layout(root0, root, emit_nodes):
        def go(batch: pd.DataFrame) -> pa.Table:
            nodes = []
            for k in batch["k"]:
                df = _read_bucket(fsys, root0, int(k))
                df = df.drop_duplicates(["src", "dst"])
                d = f"{root}/_bucket={k}"
                fs_mkdirs(fsys, d)
                pq.write_table(
                    table_from_pandas(df, preserve_index=False),
                    f"{d}/part.parquet", filesystem=fsys)
                if emit_nodes:
                    nodes.append(pd.DataFrame({"node_key": pd.unique(
                        pd.concat([df["src"], df["dst"]]))}))
            if not emit_nodes or not nodes:
                return pa.table({"node_key": pa.array([], pa.string())})
            return table_from_pandas(
                pd.concat(nodes, ignore_index=True), preserve_index=False)
        return go

    e_src = f"{ex}/esrc"
    e_dst = f"{ex}/edst"
    fs_mkdirs(fsys, e_src)
    fs_mkdirs(fsys, e_dst)
    nodes_ds = rd.from_items(
        [{"k": k} for k in sbuckets]).map_batches(
        dedup_layout(e_src0, e_src, True), batch_format="pandas",
        batch_size=1)
    dbuckets = fs_bucket_ids(fsys, e_dst0)
    rd.from_items([{"k": k} for k in dbuckets]).map_batches(
        dedup_layout(e_dst0, e_dst, False), batch_format="pandas",
        batch_size=1).materialize()

    # ---- nodes bucketed by node hash; h_0 = Q everywhere ----
    from guac_ray.functions.dedup import dedup_exact

    def part_nodes(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["_bucket"] = _bucket_of(df["node_key"], B)
        return table_from_pandas(df, preserve_index=False)

    nodes_dir = f"{ex}/nodes"
    dedup_exact(nodes_ds, ["node_key"], num_buckets=B).map_batches(
        part_nodes, batch_format="pandas").write_parquet(
        nodes_dir, partition_cols=["_bucket"], filesystem=fsys)
    nbuckets = fs_bucket_ids(fsys, nodes_dir)
    n_total = sum(
        fs_num_rows(fsys, f)
        for k in nbuckets
        for f in fs_list_files(fsys, f"{nodes_dir}/_bucket={k}"))
    if n_total * Q * Q >= 2 ** 63:
        raise ValueError(
            f"hits: {n_total} nodes x Q^2 (Q={Q}) exceeds the int64 "
            "normalization budget raw*Q <= N*Q^2 — lower "
            "quantize_scale (each halving doubles the node budget)")

    h_dir = f"{ex}/h_0"

    def init_h(batch: pd.DataFrame) -> pa.Table:
        for k in batch["k"]:
            df = _read_bucket(fsys, nodes_dir, int(k),
                              columns=["node_key"])
            df["rank"] = np.int64(Q)
            d = f"{h_dir}/_bucket={k}"
            fs_mkdirs(fsys, d)
            pq.write_table(table_from_pandas(df, preserve_index=False),
                           f"{d}/part.parquet", filesystem=fsys)
        return pa.table({"k": pa.array(batch["k"], type=pa.int64())})

    rd.from_items([{"k": k} for k in nbuckets]).map_batches(
        init_h, batch_format="pandas", batch_size=1).materialize()

    def half_step(score_dir: str, mx: int, edge_root: str,
                  join_col: str, emit_col: str, out_dir: str) -> int:
        """One propagation: normalized scores at ``score_dir`` (raw,
        with fold ``mx``) flow across ``edge_root``'s edges from
        ``join_col`` to ``emit_col``; returns the new table's max."""
        cdir = f"{out_dir}_c"

        def contrib(batch: pd.DataFrame) -> pa.Table:
            outs = []
            for k in batch["k"]:
                e = _read_bucket(fsys, edge_root, int(k))
                r = _read_bucket(fsys, score_dir, int(k))
                if e is None or r is None:
                    continue
                m = e.merge(r, left_on=join_col, right_on="node_key",
                            how="inner")
                # inline normalization of the PREVIOUS table — the
                # oracle spells the identical (rank*Q)//mx
                w = (m["rank"].to_numpy() * Q) // mx
                part = (pd.DataFrame({"t": m[emit_col], "c": w})
                        .groupby("t", sort=False)["c"].sum()
                        .reset_index())
                part["_bucket"] = _bucket_of(part["t"], B)
                outs.append(part)
            if not outs:
                return pa.schema([("t", pa.string()), ("c", pa.int64()),
                                  ("_bucket", pa.int64())]).empty_table()
            return table_from_pandas(pd.concat(outs, ignore_index=True),
                                     preserve_index=False)

        ebk = fs_bucket_ids(fsys, edge_root)
        rd.from_items([{"k": k} for k in ebk]).map_batches(
            contrib, batch_format="pandas", batch_size=1).write_parquet(
            cdir, partition_cols=["_bucket"], filesystem=fsys)

        def reduce_scores(batch: pd.DataFrame) -> pa.Table:
            maxes = []
            for k in batch["k"]:
                nodes = _read_bucket(fsys, nodes_dir, int(k),
                                     columns=["node_key"])
                c = _read_bucket(fsys, cdir, int(k), columns=["t", "c"])
                if c is not None:
                    agg = c.groupby("t", sort=False)["c"].sum()
                    v = nodes["node_key"].map(agg).fillna(0)
                else:
                    v = np.zeros(len(nodes))
                out = pd.DataFrame({
                    "node_key": nodes["node_key"],
                    "rank": np.asarray(v, dtype="int64")})
                d = f"{out_dir}/_bucket={k}"
                fs_mkdirs(fsys, d)
                pq.write_table(
                    table_from_pandas(out, preserve_index=False),
                    f"{d}/part.parquet", filesystem=fsys)
                maxes.append({"k": int(k),
                              "mx": int(out["rank"].max())
                              if len(out) else 0})
            return table_from_pandas(pd.DataFrame(maxes),
                                     preserve_index=False)

        mres = rd.from_items([{"k": k} for k in nbuckets]).map_batches(
            reduce_scores, batch_format="pandas",
            batch_size=1).to_pandas()
        return int(mres["mx"].max()) if len(mres) else 0

    h_cur, mx_h = h_dir, Q  # h_0 = Q everywhere -> max is Q
    a_cur, mx_a = None, 0
    for it in range(1, max_iters + 1):
        a_cur = f"{ex}/a_{it}"
        mx_a = half_step(h_cur, mx_h, e_src, "src", "dst", a_cur)
        if mx_a == 0:
            break  # no edges carry score; all-zero fixpoint
        h_nxt = f"{ex}/h_{it}"
        mx_h = half_step(a_cur, mx_a, e_dst, "dst", "src", h_nxt)
        h_cur = h_nxt
        if mx_h == 0:
            break

    # ---- distributed finalize: normalize both tables on read ----
    def finalize(batch: pd.DataFrame, a_cur=a_cur, h_cur=h_cur,
                 mx_a=mx_a, mx_h=mx_h) -> pa.Table:
        outs = []
        for k in batch["k"]:
            a = _read_bucket(fsys, a_cur, int(k))
            h = _read_bucket(fsys, h_cur, int(k))
            if a is None or h is None:
                continue
            af = ((a["rank"].to_numpy() * Q) // mx_a
                  if mx_a > 0 else np.zeros(len(a), dtype="int64"))
            hm = dict(zip(h["node_key"], h["rank"]))
            hr = a["node_key"].map(hm).to_numpy().astype("int64")
            hf = ((hr * Q) // mx_h if mx_h > 0
                  else np.zeros(len(a), dtype="int64"))
            outs.append(pd.DataFrame({
                "node_key": a["node_key"],
                "hub_fp": hf.astype("int64"),
                "auth_fp": af.astype("int64")}))
        if not outs:
            return empty.empty_table()
        return table_from_pandas(pd.concat(outs, ignore_index=True),
                                 preserve_index=False)

    return rd.from_items([{"k": k} for k in nbuckets]).map_batches(
        finalize, batch_format="pandas", batch_size=1)
