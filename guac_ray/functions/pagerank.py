"""Distributed PageRank over the assembled edge table — the iterative
sibling of the exchange-native connected components
(``functions/dedup.py``): every round is pure map work over static
bucket files, no object-store all-to-all, no driver-resident graph.

Algorithm: standard damped PageRank with dangling-mass redistribution,

    r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u) + dangling/N )

iterated until the L1 delta < ``tol`` or ``max_iters``.

``quantize_scale`` switches the arithmetic to FIXED-POINT int64 (ranks
are multiples of 1/scale; damping d = num/den exactly, divisions are
floor divisions): integer addition is order-independent, so the result
is bit-identical across any partitioning, summation order, or engine —
which is what lets the suite's ``kg_pagerank_top`` carry a DuCKDB SQL
oracle (the same unrolled integer recurrence) and be hash-checked like
any relational query. Within O(iters · (num/scale)) of the real-valued
ranks; with scale = 10^12 the quantization error is far below any
ranking decision. Mass bound: total int mass ≤ scale, so num·scale ≤
17e12 ≪ int64 — no overflow at any node count.

Scale shape (the part that matters at 10⁹ edges):
  - the EDGE table is hash-partitioned by source into bucket files ONCE
    (plus one per-bucket pass to attach out-degrees — all edges of a
    source land in one bucket, so outdeg is a local groupby, not a
    join). Iterations never reshuffle edges.
  - each iteration moves only the RANK table: a contribution job joins
    bucket k's edges with bucket k's ranks (both already co-partitioned)
    and writes per-destination partial sums re-bucketed by destination
    hash; a rank job then reduces each destination bucket, applies
    teleport + dangling mass, writes ranks_{i+1}, and emits a per-bucket
    L1-delta partial — the driver sees B delta rows and one dangling
    scalar per round, nothing else.
  - rank files are written with deterministic per-bucket names, so a
    retried task overwrites its own output (idempotent), and a crashed
    run resumes from the last completed ``ranks_i`` directory.

The reference has no analytics beyond BFS/toposort
(pkg/guacanalytics/); PageRank is the canonical "which node matters"
query a KG consumer asks next, and the canonical iterative-dataflow
stress test for the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

from guac_ray.exfs import (bucket_of_keys, default_exchange, exchange_fs,
                           fresh_exchange_dir, fs_bucket_ids,
                           fs_list_files, fs_mkdirs, fs_num_rows,
                           read_bucket_df)
from guac_ray.stages.assemble import stable_hash

__all__ = ["pagerank"]

_DANGLING = "\x00dangling\x00"


# shared with hits/label_propagation: the bucket assignment and the
# per-bucket read are a cross-layout contract — one definition (exfs)
_bucket_of = bucket_of_keys
_read_bucket = read_bucket_df


def pagerank(
    edges: Dataset,
    src_col: str = "subj_key",
    dst_col: str = "obj_key",
    damping: float = 0.85,
    max_iters: int = 20,
    tol: float = 1e-9,
    exchange_base: str | None = None,
    num_buckets: int = 16,
    quantize_scale: int | None = None,
    seed_prefix: str | None = None,
) -> Dataset:
    """PageRank of the (deduplicated) directed graph in ``edges`` →
    Dataset(node_key, rank). The returned Dataset reads the FINAL rank
    bucket files straight from the exchange — nothing rank-sized ever
    lands on the driver (take top-k with ``.sort(...).limit(k)``); all
    iteration state lives in the exchange. With ``quantize_scale`` the
    ranks are exact int64 fixed-point (see module docstring); integer
    deltas make ``tol`` an exact-fixpoint early-stop (delta < 1 ⟺ 0),
    so extra iterations past convergence are no-ops on both the engine
    and the SQL-oracle side.

    ``seed_prefix`` switches to PERSONALIZED PageRank (random walk
    with restart): teleport AND dangling mass go only to the nodes
    whose key starts with the prefix (r_0 = 1/|S| on seeds, 0
    elsewhere) — proximity-to-the-seed-set scoring (e.g. 'vuln:' =
    vulnerability exposure). A string prefix rather than a seed list
    keeps the predicate vectorized per bucket and SQL-expressible
    (``LIKE 'pfx%'``) with NO driver-resident seed set at any scale;
    the seed count is one scalar-per-bucket distributed pass, exactly
    like the dangling read."""
    fsys, _ = exchange_fs()  # resolved ONCE; task closures capture it
    ex = fresh_exchange_dir(exchange_base or default_exchange("pagerank"))
    B = num_buckets
    Q = quantize_scale
    if Q is not None:
        from fractions import Fraction

        fr = Fraction(str(damping))
        d_num, d_den = fr.numerator, fr.denominator

    # ---- setup job 1: distinct edges, bucketed by source ----
    def part_edges(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"src": df[src_col], "dst": df[dst_col]}
                           ).drop_duplicates()
        # the dangling-mass sentinel rides the dst column as a reserved
        # STRING key; on an integer-keyed graph the sentinel concat
        # would silently object-mix the column and ArrowInvalid deep in
        # a contribution task — refuse at ingest with the fix named
        # (kcore/shortest_paths accept ints; pagerank needs str keys)
        for c in ("src", "dst"):
            if np.issubdtype(out[c].to_numpy().dtype, np.number):
                raise TypeError(
                    f"pagerank: {c!r} node keys must be strings (the "
                    "dangling sentinel is a reserved string key) — "
                    "stringify integer ids upstream, e.g. "
                    ".astype(str)")
        out["_bucket"] = _bucket_of(out["src"], B)
        return table_from_pandas(out, preserve_index=False)

    e0 = f"{ex}/edges0"
    edges.select_columns([src_col, dst_col]).map_batches(
        part_edges, batch_format="pandas").write_parquet(
        e0, partition_cols=["_bucket"], filesystem=fsys)

    # ---- setup job 2: per-bucket dedup + outdeg attach (local: all of a
    # source's edges are in its bucket) + node emission ----
    eadj = f"{ex}/edges"
    fs_mkdirs(fsys, eadj)

    def build_adj(batch: pd.DataFrame) -> pa.Table:
        nodes = []
        for k in batch["k"]:
            df = _read_bucket(fsys, e0, int(k))
            df = df.drop_duplicates(["src", "dst"])
            df["outdeg"] = df.groupby("src", sort=False)["src"].transform("size")
            d = f"{eadj}/_bucket={k}"
            fs_mkdirs(fsys, d)
            pq.write_table(table_from_pandas(df, preserve_index=False),
                           f"{d}/part.parquet", filesystem=fsys)
            nodes.append(pd.DataFrame({
                "node_key": pd.unique(pd.concat([df["src"], df["dst"]]))}))
        return table_from_pandas(pd.concat(nodes, ignore_index=True),
                                    preserve_index=False)

    ebuckets = fs_bucket_ids(fsys, e0)
    if not ebuckets:
        return rd.from_arrow(pa.schema(
            [("node_key", pa.string()),
             ("rank", pa.int64() if Q is not None else pa.float64())]
        ).empty_table())
    nodes_ds = rd.from_items([{"k": k} for k in ebuckets]).map_batches(
        build_adj, batch_format="pandas", batch_size=1)

    # ---- setup job 3: distinct nodes bucketed by node hash; ranks_0 ----
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

    if seed_prefix is not None:
        # |S| via one scalar-per-bucket pass (the dangling-read shape)
        def count_seeds(batch: pd.DataFrame) -> pa.Table:
            tot = 0
            for k in batch["k"]:
                df = _read_bucket(fsys, nodes_dir, int(k),
                                  columns=["node_key"])
                if df is not None:
                    tot += int(df["node_key"].str.startswith(
                        seed_prefix).sum())
            return pa.table({"c": pa.array([tot], pa.int64())})

        n_seeds = int(rd.from_items([{"k": k} for k in nbuckets])
                      .map_batches(count_seeds, batch_format="pandas",
                                   batch_size=1).to_pandas()["c"].sum())
        if n_seeds == 0:
            raise ValueError(
                f"personalized pagerank: no node matches seed prefix "
                f"{seed_prefix!r}")
    else:
        n_seeds = 0  # unused

    rank_dir = f"{ex}/ranks_0"

    def init_ranks(batch: pd.DataFrame) -> pa.Table:
        for k in batch["k"]:
            df = _read_bucket(fsys, nodes_dir, int(k), columns=["node_key"])
            if seed_prefix is not None:
                seed = df["node_key"].str.startswith(
                    seed_prefix).to_numpy()
                df["rank"] = (np.where(seed, np.int64(Q // n_seeds),
                                       np.int64(0))
                              if Q is not None
                              else np.where(seed, 1.0 / n_seeds, 0.0))
            else:
                df["rank"] = (np.int64(Q // n_total) if Q is not None
                              else 1.0 / n_total)
            d = f"{rank_dir}/_bucket={k}"
            fs_mkdirs(fsys, d)
            pq.write_table(table_from_pandas(df, preserve_index=False),
                           f"{d}/part.parquet", filesystem=fsys)
        return pa.table({"k": pa.array(batch["k"], type=pa.int64())})

    rd.from_items([{"k": k} for k in nbuckets]).map_batches(
        init_ranks, batch_format="pandas", batch_size=1).materialize()

    cur = rank_dir
    for it in range(max_iters):
        cdir = f"{ex}/c_{it}"
        ndir = f"{ex}/ranks_{it + 1}"

        # contribution job: edge bucket k ⋈ rank bucket k (node buckets
        # use node-hash == src-hash, so the co-partition is free)
        def contrib(batch: pd.DataFrame, cur=cur) -> pa.Table:
            outs = []
            for k in batch["k"]:
                e = _read_bucket(fsys, eadj, int(k))
                r = _read_bucket(fsys, cur, int(k))
                if e is None and r is None:
                    continue
                if e is not None and r is not None:
                    m = e.merge(r, left_on="src", right_on="node_key",
                                how="inner")
                    # quantized: floor-div per edge keeps everything
                    # int64 and order-independent under summation
                    if Q is not None:
                        w = m["rank"].to_numpy() // m["outdeg"].to_numpy()
                    else:
                        w = m["rank"].to_numpy() / m["outdeg"].to_numpy()
                    part = (pd.DataFrame({"dst": m["dst"], "c": w})
                            .groupby("dst", sort=False)["c"].sum()
                            .reset_index())
                else:
                    cdtype = "int64" if Q is not None else "float64"
                    part = pd.DataFrame({"dst": pd.Series([], dtype=object),
                                         "c": pd.Series([], dtype=cdtype)})
                # dangling mass: ranked nodes in this bucket with no
                # out-edges (node-bucket == src-bucket by construction)
                if r is not None:
                    srcs = set() if e is None else set(e["src"].unique())
                    dang = r.loc[~r["node_key"].isin(srcs), "rank"].sum()
                    dang = int(dang) if Q is not None else float(dang)
                else:
                    dang = 0 if Q is not None else 0.0
                if dang > 0:
                    part = pd.concat(
                        [part, pd.DataFrame({"dst": [_DANGLING], "c": [dang]})],
                        ignore_index=True)
                # dangling sentinels go to a DEDICATED bucket id (== B,
                # outside the node-hash range) so the driver's per-round
                # scalar read touches only sentinel rows, never a full
                # contribution bucket
                part["_bucket"] = _bucket_of(part["dst"], B)
                part.loc[part["dst"] == _DANGLING, "_bucket"] = B
                outs.append(part)
            if not outs:
                return pa.schema([("dst", pa.string()), ("c", pa.float64()),
                                  ("_bucket", pa.int64())]).empty_table()
            return table_from_pandas(pd.concat(outs, ignore_index=True),
                                        preserve_index=False)

        all_k = sorted(set(ebuckets) | set(nbuckets))
        rd.from_items([{"k": k} for k in all_k]).map_batches(
            contrib, batch_format="pandas", batch_size=1).write_parquet(
            cdir, partition_cols=["_bucket"], filesystem=fsys)

        # dangling scalar: the sentinel bucket holds ONLY sentinel rows
        # (one per contributing task) — a driver read of a few scalars
        b0 = _read_bucket(fsys, cdir, B, columns=["dst", "c"])
        if Q is not None:
            dangling = 0 if b0 is None else int(b0["c"].sum())
        else:
            dangling = 0.0 if b0 is None else float(b0["c"].sum())

        # rank job: reduce contribs per node bucket, apply teleport +
        # dangling, write ranks_{it+1}, emit per-bucket L1 delta
        def new_ranks(batch: pd.DataFrame, cdir=cdir, cur=cur, ndir=ndir,
                      dangling=dangling) -> pa.Table:
            deltas = []
            for k in batch["k"]:
                nodes = _read_bucket(fsys, nodes_dir, int(k),
                                     columns=["node_key"])
                old = _read_bucket(fsys, cur, int(k))
                c = _read_bucket(fsys, cdir, int(k), columns=["dst", "c"])
                if c is not None:
                    c = c[c["dst"] != _DANGLING]
                    agg = c.groupby("dst", sort=False)["c"].sum()
                    contrib_v = nodes["node_key"].map(agg).fillna(0)
                else:
                    contrib_v = np.zeros(len(nodes))
                if seed_prefix is not None:
                    seed = nodes["node_key"].str.startswith(
                        seed_prefix).to_numpy()
                if Q is not None:
                    # integer recurrence — mirrored exactly by the SQL
                    # oracle: tele + (num*(contrib + dangling//N)) // den;
                    # personalized: tele and the dangling share land on
                    # seeds only, N → |S|
                    contrib_i = np.asarray(contrib_v, dtype="int64")
                    if seed_prefix is not None:
                        tele_s = ((d_den - d_num) * Q) // (d_den * n_seeds)
                        rank = (np.where(seed, np.int64(tele_s),
                                         np.int64(0))
                                + (d_num * (contrib_i + np.where(
                                    seed,
                                    np.int64(dangling // n_seeds),
                                    np.int64(0)))) // d_den)
                    else:
                        tele = ((d_den - d_num) * Q) // (d_den * n_total)
                        rank = tele + (
                            d_num * (contrib_i
                                     + dangling // n_total)) // d_den
                elif seed_prefix is not None:
                    rank = (np.where(seed, (1.0 - damping) / n_seeds, 0.0)
                            + damping * (np.asarray(contrib_v,
                                                    dtype="float64")
                                         + np.where(seed,
                                                    dangling / n_seeds,
                                                    0.0)))
                else:
                    rank = ((1.0 - damping) / n_total
                            + damping * (np.asarray(contrib_v, dtype="float64")
                                         + dangling / n_total))
                out = pd.DataFrame({"node_key": nodes["node_key"],
                                    "rank": rank})
                d = f"{ndir}/_bucket={k}"
                fs_mkdirs(fsys, d)
                pq.write_table(table_from_pandas(out, preserve_index=False),
                               f"{d}/part.parquet", filesystem=fsys)
                prev = old.set_index("node_key")["rank"]
                delta = float(np.abs(
                    out.set_index("node_key")["rank"] - prev).sum())
                deltas.append({"k": int(k), "delta": delta})
            return table_from_pandas(pd.DataFrame(deltas),
                                        preserve_index=False)

        deltas = rd.from_items([{"k": k} for k in nbuckets]).map_batches(
            new_ranks, batch_format="pandas", batch_size=1).to_pandas()
        cur = ndir
        if float(deltas["delta"].sum()) < tol:
            break

    # finalize DISTRIBUTED: hand back a Dataset over the final rank
    # bucket files (the exchange dir stays live for this process) — at
    # 10^9 nodes the rank table never transits the driver; top-k goes
    # through Dataset.sort(...).limit(k)
    # columns= also drops the hive-inferred _bucket partition column
    return rd.read_parquet(
        [f for k in nbuckets
         for f in fs_list_files(fsys, f"{cur}/_bucket={k}")],
        columns=["node_key", "rank"], filesystem=fsys)
