"""Exact distributed triangle counting over the assembled KG edge
table — graph analytics beyond the reference's query set (like
pagerank.py; GUAC's GraphQL layer has no analytics endpoints), with an
exact 3-way self-join SQL oracle.

Algorithm: degree-ordered node-iterator (the MapReduce-classic of
Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the
Last Reducer" — public knowledge):

  1. canonicalize to DISTINCT undirected edges (u < v, loops dropped)
     through one ``grouped_agg`` exchange, persisted once as the
     working set;
  2. compute degrees (one more ``grouped_agg``), attach them to both
     endpoints via two co-partitioned ``hash_join``s;
  3. ORIENT each edge from its (degree, key)-smaller endpoint — after
     orientation every out-degree is O(sqrt(m)), so the hub that
     dominates the raw degree distribution (the 40%-hot tool) cannot
     explode the wedge stage: exactly the "curse of the last reducer"
     fix;
  4. per source, emit wedges (dst_i, dst_j) — fully vectorized chunked
     numpy expansion per exchange bucket, never a Python row loop;
  5. a LARGE-LARGE ``hash_join(how="semi")`` of wedges against the
     edge set closes triangles; counting is FUSED into the join's
     reduce (``partial_fn``), so only per-task count rows leave the
     exchange.

Every triangle {a,b,c} is counted exactly once: exactly one of its
vertices precedes the other two in the (degree, key) total order, and
only that vertex emits the closing wedge.

Scale: the wedge exchange is the dominant cost at Θ(Σ d_out²) ≤
O(m^1.5) — the known work bound for exact triangle enumeration; all
other stages are linear exchanges. ``wedge_chunk`` bounds each
expansion's memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas

__all__ = ["triangle_count", "clustering_coefficient",
           "neighbor_degree_stats", "common_neighbors",
           "degree_assortativity", "degree_histogram", "reciprocity",
           "k_truss", "k_truss_naive"]


def _pairs_within_groups(dst: np.ndarray, k: np.ndarray,
                         chunk_pairs: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """All (dst[i], dst[j]) pairs with i<j inside each group, given the
    per-row within-group position ``k`` (rows sorted by group, dst
    ascending within group). Row r pairs dst[r] against the k[r] rows
    before it in its group. Chunked so one expansion holds at most
    ~``chunk_pairs`` pairs."""
    n = len(dst)
    if n == 0:
        return []
    start = np.arange(n, dtype=np.int64) - k          # group start row
    before = np.concatenate(([0], np.cumsum(k)[:-1]))  # pairs before row
    total = int(before[-1] + k[-1])
    if total == 0:
        return []
    out = []
    lo = 0
    while lo < n:
        hi = lo
        acc = 0
        while hi < n and (acc + k[hi] <= chunk_pairs or hi == lo):
            acc += int(k[hi])
            hi += 1
        rows = np.arange(lo, hi)
        kk = k[rows]
        if kk.sum() > 0:
            right = np.repeat(dst[rows], kk)
            p = np.arange(int(kk.sum()), dtype=np.int64)
            left_idx = (p - np.repeat(before[rows] - before[lo], kk)
                        + np.repeat(start[rows], kk))
            out.append((dst[left_idx], right))
        lo = hi
    return out


def _canon_deg(edges: Dataset, a_col: str, b_col: str, base: str,
               num_buckets: int, assume_canonical: bool = False):
    """Shared prefix of every per-graph analytic here: canonicalize to
    DISTINCT undirected edges (u < v, loops dropped) persisted once,
    compute degrees, and attach them to both endpoints via two
    co-partitioned hash joins. Returns ``(E, deg, with_deg)`` — E() is
    a fresh reader over the persisted edge set, ``deg`` the (n, deg)
    table, ``with_deg`` the (u, v, du, dv) join — or ``None`` when the
    canonical edge set is empty (all input edges were self-loops).

    ``assume_canonical`` skips the dedup exchange when the caller
    GUARANTEES the input is already distinct canonical (u < v, no
    loops) — k_truss peel rounds ≥ 1 feed back their own output, so
    re-deduping it would waste one full exchange per round."""
    from guac_ray.exfs import (exchange_fs, fresh_exchange_dir,
                               fs_list_files)
    from guac_ray.functions.joins import hash_join
    from guac_ray.stages.groupagg import grouped_agg

    def canon(t: pa.Table) -> pa.Table:
        a = t[a_col].to_pandas()
        b = t[b_col].to_pandas()
        # drop NULL endpoints BEFORE stringifying: astype(str) would
        # mint literal 'None'/'nan' phantom NODES that enter degrees,
        # wedges and triangle counts (the kcore class)
        ok = a.notna() & b.notna()
        a = a[ok].astype(str)
        b = b[ok].astype(str)
        u = a.where(a < b, b)
        v = b.where(a < b, a)
        df = pd.DataFrame({"u": u, "v": v})
        df = df[df["u"] != df["v"]].drop_duplicates()
        return table_from_pandas(df, preserve_index=False)

    if assume_canonical:
        dedup = edges.select_columns([a_col, b_col]).map_batches(
            lambda df: df.rename(columns={a_col: "u", b_col: "v"}),
            batch_format="pandas")
    else:
        dedup = grouped_agg(
            edges.select_columns([a_col, b_col]).map_batches(
                canon, batch_format="pyarrow"),
            ["u", "v"], {"_n": ("u", "count")},
            num_buckets=num_buckets,
        )
    fsys, _ = exchange_fs()  # resolved ONCE; closures capture it
    edir = fresh_exchange_dir(f"{base}/canon")
    dedup.select_columns(["u", "v"]).write_parquet(edir, filesystem=fsys)
    efiles = fs_list_files(fsys, edir)
    if not efiles:
        return None

    def E() -> Dataset:
        return rd.read_parquet(efiles, filesystem=fsys)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.concat_arrays([
                t["u"].combine_chunks().cast(pa.string()),
                t["v"].combine_chunks().cast(pa.string()),
            ]),
        })

    deg = grouped_agg(
        E().map_batches(endpoints, batch_format="pyarrow"),
        ["n"], {"deg": ("n", "count")}, num_buckets=num_buckets,
    )

    du = deg.map_batches(
        lambda df: df.rename(columns={"n": "u", "deg": "du"}),
        batch_format="pandas")
    dv = deg.map_batches(
        lambda df: df.rename(columns={"n": "v", "deg": "dv"}),
        batch_format="pandas")
    with_du = hash_join(E(), du, on="u",
                        exchange_dir=f"{base}/ju",
                        num_buckets=num_buckets)
    with_deg = hash_join(with_du, dv, on="v",
                         exchange_dir=f"{base}/jv",
                         num_buckets=num_buckets)
    return E, deg, with_deg


def _orient_fn(num_buckets: int):
    """Orient each (u, v, du, dv) edge from its (degree, key)-smaller
    endpoint and attach the source-hash bucket — THE shared tie-break
    of every wedge-based analytic here (a divergence between two copies
    would make triangle_count and clustering_coefficient disagree on
    the same graph)."""
    from guac_ray.stages.assemble import stable_hash

    def orient(df: pd.DataFrame) -> pa.Table:
        fwd = (df["du"] < df["dv"]) | ((df["du"] == df["dv"])
                                       & (df["u"] < df["v"]))
        out = pd.DataFrame({
            "src": df["u"].where(fwd, df["v"]),
            "dst": df["v"].where(fwd, df["u"]),
        })
        out["_bucket"] = (stable_hash(out, ["src"]) % num_buckets
                          ).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    return orient


def _wedges_fn(wedge_chunk: int, carry_source: bool):
    """Per-bucket wedge emitter: all (dst_i, dst_j) pairs per source via
    the chunked vectorized expansion. dst is sorted ascending within a
    group, so every emitted pair already satisfies u < v — the
    canonical edge orientation the closing join needs. With
    ``carry_source`` the (s, u, v) rows keep their source: pairs are
    emitted row-major (k[r] pairs for row r, rows in order), so one
    ``np.repeat(src, k)`` rebuilds the aligned source column."""

    def wedges(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["src", "dst"], kind="mergesort")
        dst = df["dst"].to_numpy()
        src = df["src"].to_numpy()
        grp_change = np.ones(len(df), dtype=bool)
        grp_change[1:] = src[1:] != src[:-1]
        idx = np.arange(len(df), dtype=np.int64)
        start = np.maximum.accumulate(np.where(grp_change, idx, 0))
        k = idx - start
        parts = _pairs_within_groups(dst, k, wedge_chunk)
        cols = {}
        if not parts:
            if carry_source:
                cols["s"] = pa.array([], type=pa.string())
            cols["u"] = pa.array([], type=pa.string())
            cols["v"] = pa.array([], type=pa.string())
            return pa.table(cols)
        if carry_source:
            cols["s"] = pa.array(np.repeat(src, k), type=pa.string())
        cols["u"] = pa.array(np.concatenate([p[0] for p in parts]),
                             type=pa.string())
        cols["v"] = pa.array(np.concatenate([p[1] for p in parts]),
                             type=pa.string())
        return pa.table(cols)

    return wedges


def triangle_count(
    edges: Dataset,
    a_col: str = "subj_key",
    b_col: str = "obj_key",
    exchange_base: str | None = None,
    num_buckets: int = 16,
    wedge_chunk: int = 4_000_000,
) -> Dataset:
    """One-row Dataset {"n_triangles": int64} for the undirected simple
    graph induced by (a_col, b_col)."""
    import os

    from guac_ray.functions.joins import default_exchange, hash_join
    from guac_ray.stages.assemble import fs_exchange_reduce

    base = exchange_base or default_exchange("triangles")
    cd = _canon_deg(edges, a_col, b_col, base, num_buckets)
    if cd is None:
        # every input edge was a self-loop — no graph, no triangles
        return rd.from_items([{"n_triangles": 0}])
    E, _deg, with_deg = cd

    oriented = with_deg.map_batches(_orient_fn(num_buckets),
                                    batch_format="pandas")
    wedge_ds = fs_exchange_reduce(
        oriented, f"{base}/wedge",
        _wedges_fn(wedge_chunk, carry_source=False))
    if wedge_ds is None:
        return rd.from_items([{"n_triangles": 0}])

    # ---- 5. close wedges against the edge set; count fused into the
    # semi join's reduce so only count partials leave the exchange
    def count_partial(t: pa.Table) -> pa.Table:
        return pa.table({"c": pa.array([t.num_rows], type=pa.int64())})

    closed = hash_join(
        wedge_ds, E(), on=["u", "v"],
        exchange_dir=f"{base}/close",
        how="semi", num_buckets=num_buckets, partial_fn=count_partial)
    total = sum(r["c"] for r in closed.take_all())
    return rd.from_items([{"n_triangles": int(total)}])


def clustering_coefficient(
    edges: Dataset,
    a_col: str = "subj_key",
    b_col: str = "obj_key",
    exchange_base: str | None = None,
    num_buckets: int = 16,
    wedge_chunk: int = 4_000_000,
    scale: int = 1_000_000,
) -> Dataset:
    """Per-node LOCAL clustering coefficient over the undirected simple
    graph induced by (a_col, b_col): for every node with degree ≥ 2,
    ``coeff_fp = scale * 2 * T(v) // (deg(v) * (deg(v) - 1))`` —
    fixed-point floor division on int64, exact in every engine.

    Same degree-ordered orientation as :func:`triangle_count` (the hot
    hub cannot explode the wedge stage), but the wedge rows CARRY their
    source, so each triangle surviving the closing semi join credits
    all three of its vertices; per-node triangle counts are then one
    vocabulary-scale ``grouped_agg`` and join back to the degree table
    co-partitioned. Nothing token- or wedge-scale reaches the driver.
    """
    import os

    from guac_ray.functions.joins import default_exchange, hash_join
    from guac_ray.stages.assemble import fs_exchange_reduce
    from guac_ray.stages.groupagg import grouped_agg

    base = exchange_base or default_exchange("clustcoef")
    empty = pa.table({
        "node": pa.array([], type=pa.string()),
        "deg": pa.array([], type=pa.int64()),
        "n_triangles": pa.array([], type=pa.int64()),
        "coeff_fp": pa.array([], type=pa.int64()),
    })

    cd = _canon_deg(edges, a_col, b_col, base, num_buckets)
    if cd is None:
        return rd.from_arrow(empty)  # Dataset, like the populated path
    E, deg, with_deg = cd

    oriented = with_deg.map_batches(_orient_fn(num_buckets),
                                    batch_format="pandas")
    wedge_ds = fs_exchange_reduce(
        oriented, f"{base}/wedge",
        _wedges_fn(wedge_chunk, carry_source=True))

    def deg_named(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"n": "node"})

    deg_nodes = deg.map_batches(deg_named, batch_format="pandas")

    if wedge_ds is None:
        tri = None
    else:
        # close wedges against the edge set; per-vertex credit partials
        # fused into the join reduce — only (node, tc) rows leave it
        def credit_partial(t: pa.Table) -> pa.Table:
            nodes = pa.concat_arrays([
                t["s"].combine_chunks().cast(pa.string()),
                t["u"].combine_chunks().cast(pa.string()),
                t["v"].combine_chunks().cast(pa.string()),
            ])
            vc = nodes.value_counts()
            return pa.table({
                "node": vc.field("values"),
                "tc": vc.field("counts").cast(pa.int64()),
            })

        closed = hash_join(
            wedge_ds, E(), on=["u", "v"],
            exchange_dir=f"{base}/close",
            how="semi", num_buckets=num_buckets,
            partial_fn=credit_partial)
        tri = grouped_agg(closed, ["node"], {"t": ("tc", "sum")},
                          num_buckets=num_buckets)

    if tri is None:
        joined = deg_nodes.map_batches(
            lambda df: df.assign(t=np.int64(0)), batch_format="pandas")
    else:
        joined = hash_join(deg_nodes, tri, on="node",
                           exchange_dir=f"{base}/jt",
                           how="left", num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pa.Table:
        df = df[df["deg"] >= 2]
        if df.empty:
            return empty
        d = df["deg"].to_numpy().astype(np.int64)
        # a triangle-free graph leaves the semi join empty and the left
        # join schema-less on the right: no "t" column at all
        if "t" in df.columns:
            t = np.nan_to_num(
                df["t"].to_numpy().astype("float64"), nan=0.0).astype(np.int64)
        else:
            t = np.zeros(len(df), dtype=np.int64)
        coeff = (scale * 2 * t) // (d * (d - 1))
        return pa.table({
            "node": pa.array(df["node"].astype(str), type=pa.string()),
            "deg": pa.array(d, type=pa.int64()),
            "n_triangles": pa.array(t, type=pa.int64()),
            "coeff_fp": pa.array(coeff, type=pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pandas")


def neighbor_degree_stats(
    edges: Dataset,
    a_col: str = "subj_key",
    b_col: str = "obj_key",
    exchange_base: str | None = None,
    num_buckets: int = 16,
    scale: int = 1_000_000,
) -> Dataset:
    """Per-node NEIGHBOR-degree statistics over the undirected simple
    graph — the local assortativity signal (is this node attached to
    hubs or to leaves?): ``(node, deg, sum_nbr_deg, max_nbr_deg,
    mean_nbr_deg_fp)`` with the mean as fixed-point floor division
    (``scale·Σ // deg``), integer-exact in every engine.

    Shape: the shared :func:`_canon_deg` prefix (canonical edge set +
    degrees attached via two co-partitioned hash joins), then one
    vectorized explode of each edge into its two (node, neighbor-deg)
    rows and a single ``grouped_agg``. Everything is linear exchanges —
    no wedge-scale expansion anywhere."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.groupagg import grouped_agg

    base = exchange_base or default_exchange("nbrdeg")
    empty = pa.table({
        "node": pa.array([], type=pa.string()),
        "deg": pa.array([], type=pa.int64()),
        "sum_nbr_deg": pa.array([], type=pa.int64()),
        "max_nbr_deg": pa.array([], type=pa.int64()),
        "mean_nbr_deg_fp": pa.array([], type=pa.int64()),
    })
    cd = _canon_deg(edges, a_col, b_col, base, num_buckets)
    if cd is None:
        return rd.from_arrow(empty)  # Dataset, like the populated path
    _E, _deg, with_deg = cd

    def explode(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "node": pa.array(
                np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
                type=pa.string()),
            "nd": pa.array(
                np.concatenate([df["dv"].to_numpy(), df["du"].to_numpy()])
                .astype("int64"), type=pa.int64()),
        })

    agg = grouped_agg(
        with_deg.map_batches(explode, batch_format="pandas"),
        ["node"],
        {"deg": ("nd", "count"), "sum_nbr_deg": ("nd", "sum"),
         "max_nbr_deg": ("nd", "max")},
        num_buckets=num_buckets,
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return empty
        d = df["deg"].to_numpy().astype(np.int64)
        s = df["sum_nbr_deg"].to_numpy().astype(np.int64)
        return pa.table({
            "node": pa.array(df["node"].astype(str), type=pa.string()),
            "deg": pa.array(d, type=pa.int64()),
            "sum_nbr_deg": pa.array(s, type=pa.int64()),
            "max_nbr_deg": pa.array(
                df["max_nbr_deg"].to_numpy().astype(np.int64),
                type=pa.int64()),
            "mean_nbr_deg_fp": pa.array((scale * s) // d, type=pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pandas")


def common_neighbors(
    edges: Dataset,
    a_col: str = "subj_key",
    b_col: str = "obj_key",
    exchange_base: str | None = None,
    num_buckets: int = 16,
    wedge_chunk: int = 4_000_000,
    max_center_degree: int = 64,
    min_common: int = 2,
    scale: int = 1_000_000,
) -> Dataset:
    """Common-neighbor counts + Jaccard score for node PAIRS — the
    classic link-prediction signal: pairs that share many neighbors but
    may not be adjacent. ``jaccard_fp = scale·common //
    (deg_x + deg_y − common)`` (|N(x) ∩ N(y)| over |N(x) ∪ N(y)|),
    fixed-point floor division, integer-exact.

    Unlike triangle counting, common-neighbor enumeration needs wedges
    from EVERY center in BOTH directions — orientation cannot save the
    hub (a degree-d center inherently contributes d²/2 candidate
    pairs). The scale control is therefore explicit and semantic:
    centers with degree > ``max_center_degree`` are EXCLUDED (standard
    link-prediction practice — a neighbor shared via a super-hub is
    weak evidence anyway), and the SQL oracle mirrors the same cap, so
    the operator stays exact AND bounded: wedge volume ≤
    Σ_{deg≤cap} deg² ≤ cap·2m. ``min_common`` prunes the output to
    pairs with real signal before anything leaves the reduce."""
    import os

    from guac_ray.functions.joins import default_exchange, hash_join
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash
    from guac_ray.stages.groupagg import grouped_agg

    base = exchange_base or default_exchange("commnbr")
    empty = pa.table({
        "x": pa.array([], type=pa.string()),
        "y": pa.array([], type=pa.string()),
        "common": pa.array([], type=pa.int64()),
        "deg_x": pa.array([], type=pa.int64()),
        "deg_y": pa.array([], type=pa.int64()),
        "jaccard_fp": pa.array([], type=pa.int64()),
    })
    cd = _canon_deg(edges, a_col, b_col, base, num_buckets)
    if cd is None:
        return rd.from_arrow(empty)  # Dataset, like the populated path
    _E, deg, with_deg = cd

    # both directions, center-degree cap applied where the center's own
    # degree is already attached (no extra join)
    def centers(df: pd.DataFrame) -> pa.Table:
        a = pd.DataFrame({"src": df["u"], "dst": df["v"], "cd": df["du"]})
        b = pd.DataFrame({"src": df["v"], "dst": df["u"], "cd": df["dv"]})
        out = pd.concat([a, b], ignore_index=True)
        out = out[out["cd"] <= max_center_degree][["src", "dst"]]
        out["_bucket"] = (stable_hash(out, ["src"]) % num_buckets
                          ).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    adj = with_deg.map_batches(centers, batch_format="pandas")
    pair_ds = fs_exchange_reduce(
        adj, f"{base}/wedge",
        _wedges_fn(wedge_chunk, carry_source=False))
    if pair_ds is None:
        return rd.from_arrow(empty)  # Dataset, like the populated path

    cn = grouped_agg(pair_ds, ["u", "v"], {"common": ("u", "count")},
                     num_buckets=num_buckets)
    cn = cn.map_batches(
        lambda df: df[df["common"] >= min_common].rename(
            columns={"u": "x", "v": "y"}),
        batch_format="pandas")

    dx = deg.map_batches(
        lambda df: df.rename(columns={"n": "x", "deg": "deg_x"}),
        batch_format="pandas")
    dy = deg.map_batches(
        lambda df: df.rename(columns={"n": "y", "deg": "deg_y"}),
        batch_format="pandas")
    j1 = hash_join(cn, dx, on="x", exchange_dir=f"{base}/jx",
                   num_buckets=num_buckets)
    j2 = hash_join(j1, dy, on="y", exchange_dir=f"{base}/jy",
                   num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return empty
        c = df["common"].to_numpy().astype(np.int64)
        dxv = df["deg_x"].to_numpy().astype(np.int64)
        dyv = df["deg_y"].to_numpy().astype(np.int64)
        return pa.table({
            "x": pa.array(df["x"].astype(str), type=pa.string()),
            "y": pa.array(df["y"].astype(str), type=pa.string()),
            "common": pa.array(c, type=pa.int64()),
            "deg_x": pa.array(dxv, type=pa.int64()),
            "deg_y": pa.array(dyv, type=pa.int64()),
            "jaccard_fp": pa.array((scale * c) // (dxv + dyv - c),
                                   type=pa.int64()),
        })

    return j2.map_batches(finish, batch_format="pandas")


def degree_assortativity(
    edges: Dataset,
    a_col: str = "subj_key",
    b_col: str = "obj_key",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Degree assortativity of the undirected simple graph (Newman
    2002): the Pearson correlation of endpoint degrees over DIRECTED
    STUBS — every canonical edge contributes both (du, dv) and
    (dv, du), the standard symmetrization, so the statistic is
    orientation-free. Returns one row ``(graph='all', n=2m, cov,
    corr)``; assortative graphs (hubs link hubs) score > 0,
    disassortative (hub-and-spoke) < 0.

    Shape: the shared :func:`_canon_deg` prefix (canonical edge set +
    degrees attached via two co-partitioned hash joins), one
    vectorized stub explode, and :func:`~guac_ray.functions.stats.
    grouped_corr`'s int64 moment sums under a constant group key —
    the same two-phase exchange and the same fixed double expression
    every corr oracle replays. All linear exchanges; nothing
    wedge-scale, nothing driver-sized."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.functions.stats import grouped_corr

    base = exchange_base or default_exchange("assort")
    empty = pa.table({
        "graph": pa.array([], type=pa.string()),
        "n": pa.array([], type=pa.int64()),
        "cov": pa.array([], type=pa.float64()),
        "corr": pa.array([], type=pa.float64()),
    })
    cd = _canon_deg(edges, a_col, b_col, base, num_buckets)
    if cd is None:
        return rd.from_arrow(empty)  # Dataset, like the populated path
    _E, _deg, with_deg = cd

    def stubs(df: pd.DataFrame) -> pd.DataFrame:
        du = df["du"].to_numpy().astype("int64")
        dv = df["dv"].to_numpy().astype("int64")
        return pd.DataFrame({
            "graph": np.repeat("all", 2 * len(df)),
            "x": np.concatenate([du, dv]),
            "y": np.concatenate([dv, du]),
        })

    return grouped_corr(
        with_deg.map_batches(stubs, batch_format="pandas"),
        "graph", "x", "y", num_buckets=4)


def degree_histogram(
    edges: Dataset,
    a_col: str = "subj_key",
    b_col: str = "obj_key",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Degree distribution of the undirected simple graph — the
    first diagnostic a graph pipeline plots (power-law tail? hub
    count? isolated pairs?): one row per distinct degree value with
    the number of nodes holding it, both exact int64.

    Shape: canonical-edge dedup (the standard in-batch canon map +
    ``grouped_agg`` on (u, v)), a vectorized two-endpoint explode,
    one ``grouped_agg`` per node (its degree), then one more keyed by
    the degree VALUE — each exchange strictly smaller than the last
    (edges → nodes → distinct degrees). Nothing driver-sized; the
    histogram itself is ≤ max-degree rows."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.groupagg import grouped_agg

    base = exchange_base or default_exchange("deghist")
    empty = pa.table({
        "deg": pa.array([], type=pa.int64()),
        "n_nodes": pa.array([], type=pa.int64()),
    })

    def canon(t: pa.Table) -> pa.Table:
        a = t[a_col].to_pandas()
        b = t[b_col].to_pandas()
        # drop NULL endpoints BEFORE stringifying: astype(str) would
        # mint literal 'None'/'nan' phantom NODES that enter degrees,
        # wedges and triangle counts (the kcore class)
        ok = a.notna() & b.notna()
        a = a[ok].astype(str)
        b = b[ok].astype(str)
        u = a.where(a < b, b)
        v = b.where(a < b, a)
        df = pd.DataFrame({"u": u, "v": v})
        df = df[df["u"] != df["v"]].drop_duplicates()
        return table_from_pandas(df, preserve_index=False)

    dedup = grouped_agg(
        edges.select_columns([a_col, b_col]).map_batches(
            canon, batch_format="pyarrow"),
        ["u", "v"], {"_n": ("u", "count")}, num_buckets=num_buckets)

    def explode(df: pd.DataFrame) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate(
            [df["u"].to_numpy(), df["v"].to_numpy()]), type=pa.string())})

    deg = grouped_agg(
        dedup.map_batches(explode, batch_format="pandas"),
        ["node"], {"deg": ("node", "count")}, num_buckets=num_buckets)
    hist = grouped_agg(
        deg.select_columns(["deg"]), ["deg"],
        {"n_nodes": ("deg", "count")},
        num_buckets=max(4, num_buckets // 4))

    def typed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        return pa.table({"deg": t["deg"].cast(pa.int64()),
                         "n_nodes": t["n_nodes"].cast(pa.int64())})

    return hist.map_batches(typed, batch_format="pyarrow")


def reciprocity(
    edges: Dataset,
    a_col: str = "subj_key",
    b_col: str = "obj_key",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Reciprocity of the DIRECTED simple graph — the fraction of
    distinct directed edges whose reverse edge also exists (the only
    graph statistic here that does NOT canonicalize away direction):
    one row ``(graph='all', n_directed, n_mutual, reciprocity_fp)``
    with ``reciprocity_fp = 1e6·n_mutual // n_directed`` in pure
    int64 floor division — exact on any engine.

    Shape: batches emit distinct directed (a, b) pairs bucketed by the
    CANONICAL (unordered) pair hash, so both orientations of a pair —
    and all duplicates of each — land in one bucket; the in-bucket
    pass dedups directed pairs globally and counts 2 mutual edges per
    both-orientations group, emitting one (n_directed, n_mutual)
    partial row per bucket; the driver folds ≤ num_buckets partial
    rows. Nothing driver-sized beyond that fold."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    empty = pa.table({
        "graph": pa.array([], type=pa.string()),
        "n_directed": pa.array([], type=pa.int64()),
        "n_mutual": pa.array([], type=pa.int64()),
        "reciprocity_fp": pa.array([], type=pa.int64()),
    })

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t[a_col].to_pandas()
        b = t[b_col].to_pandas()
        ok = a.notna() & b.notna()  # no 'None'/'nan' phantom endpoints
        a = a[ok].astype(str)
        b = b[ok].astype(str)
        df = pd.DataFrame({"a": a, "b": b})
        df = df[df["a"] != df["b"]].drop_duplicates()
        u = df["a"].where(df["a"] < df["b"], df["b"])
        v = df["b"].where(df["a"] < df["b"], df["a"])
        key = pd.DataFrame({"u": u, "v": v})
        df["_bucket"] = (stable_hash(key, ["u", "v"])
                         % num_buckets).astype("int64")
        return table_from_pandas(df, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["a", "b"]].drop_duplicates()
        u = df["a"].where(df["a"] < df["b"], df["b"])
        v = df["b"].where(df["a"] < df["b"], df["a"])
        sizes = pd.DataFrame({"u": u, "v": v}).groupby(
            ["u", "v"], sort=False).size()
        n_mutual = int(2 * (sizes == 2).sum())
        return pa.table({
            "n_directed": pa.array([len(df)], type=pa.int64()),
            "n_mutual": pa.array([n_mutual], type=pa.int64()),
        })

    parts = fs_exchange_reduce(
        edges.select_columns([a_col, b_col]).map_batches(
            add_bucket, batch_format="pyarrow"),
        exchange_base or default_exchange("recip"), reduce_fn)
    if parts is None:
        return rd.from_arrow(empty)
    # ≤ num_buckets one-row partials: the driver fold is bounded by
    # cluster parallelism, not data
    pf = parts.to_pandas()
    nd = int(pf["n_directed"].sum())
    nm = int(pf["n_mutual"].sum())
    if nd == 0:
        return rd.from_arrow(empty)
    # a one-row Dataset: the annotation promises Dataset, and callers
    # written against that surface must not AttributeError on the
    # populated path either
    return rd.from_arrow(pa.table({
        "graph": pa.array(["all"], type=pa.string()),
        "n_directed": pa.array([nd], type=pa.int64()),
        "n_mutual": pa.array([nm], type=pa.int64()),
        "reciprocity_fp": pa.array([1_000_000 * nm // nd],
                                   type=pa.int64()),
    }))


def k_truss(
    edges: Dataset,
    k: int,
    a_col: str = "subj_key",
    b_col: str = "obj_key",
    exchange_base: str | None = None,
    num_buckets: int = 16,
    wedge_chunk: int = 4_000_000,
    max_rounds: int = 50,
) -> Dataset:
    """The k-truss of the canonical undirected simple graph — the
    triangle-support peeling that extracts the cohesive core community
    detection actually uses (every k-truss edge sits in ≥ k−2
    triangles WITHIN the truss; stricter than k-core's degree
    condition, cheaper than cliques). Returns Dataset(u, v, support)
    of surviving edges with their converged support, all int64/string.

    Iterative dataflow in the PageRank discipline: each peel round is
    the triangle family's existing shape — ``_canon_deg`` (degrees must
    be recomputed on the shrinking graph) → degree-ordered orientation
    → wedge emission → closing SEMI join against the edge set, with the
    per-triangle 3-edge CREDIT fused into the join's reduce
    (``partial_fn``), so only (edge, count) partials ever leave it —
    then one vocabulary-scale ``grouped_agg``. Edges in zero triangles
    never appear in the support table and are dropped implicitly
    (k ≥ 3 ⟹ threshold ≥ 1). Convergence = a round that removes
    nothing; its support table IS the final answer. The driver sees
    one edge-count scalar per round. ``max_rounds`` exhaustion raises —
    never a silently-partial truss."""
    from guac_ray.functions.joins import default_exchange, hash_join
    from guac_ray.stages.assemble import fs_exchange_reduce
    from guac_ray.stages.groupagg import grouped_agg

    if k < 3:
        raise ValueError("k-truss requires k >= 3 (k-2 triangle support)")
    base = exchange_base or default_exchange("ktruss")
    thresh = k - 2
    empty = pa.schema([("u", pa.string()), ("v", pa.string()),
                       ("support", pa.int64())]).empty_table()

    def credit_partial(t: pa.Table) -> pa.Table:
        """(s, u, v) triangles → per-canonical-edge credit partials:
        the closing edge (u, v) plus canon(s, u) and canon(s, v)."""
        s = t["s"].to_pandas().astype(str)
        u = t["u"].to_pandas().astype(str)
        v = t["v"].to_pandas().astype(str)
        a = pd.concat([u, np.minimum(s, u), np.minimum(s, v)],
                      ignore_index=True)
        b = pd.concat([v, np.maximum(s, u), np.maximum(s, v)],
                      ignore_index=True)
        g = (pd.DataFrame({"u": a, "v": b})
             .groupby(["u", "v"], sort=False).size()
             .rename("c").reset_index())
        g["c"] = g["c"].astype("int64")
        return table_from_pandas(g, preserve_index=False)

    cur = edges.select_columns([a_col, b_col])
    ca, cb = a_col, b_col
    n_cur = None  # unknown until the first canon pass
    for rnd in range(max_rounds):
        rb = f"{base}/r{rnd}"
        # rounds >= 1 feed back the previous round's survivors, which
        # are distinct canonical by construction — skip their re-dedup
        cd = _canon_deg(cur, ca, cb, rb, num_buckets,
                        assume_canonical=(rnd > 0))
        if cd is None:
            return rd.from_arrow(empty)
        E, _deg, with_deg = cd
        if n_cur is None:
            n_cur = E().count()
        oriented = with_deg.map_batches(_orient_fn(num_buckets),
                                        batch_format="pandas")
        wedge_ds = fs_exchange_reduce(
            oriented, f"{rb}/wedge",
            _wedges_fn(wedge_chunk, carry_source=True))
        if wedge_ds is None:
            return rd.from_arrow(empty)
        credits = hash_join(
            wedge_ds, E(), on=["u", "v"], exchange_dir=f"{rb}/close",
            how="semi", num_buckets=num_buckets,
            partial_fn=credit_partial)
        supports = grouped_agg(credits, ["u", "v"],
                               {"support": ("c", "sum")},
                               num_buckets=num_buckets)

        def keep(t: pa.Table, thresh=thresh) -> pa.Table:
            import pyarrow.compute as pc
            kept = t.filter(pc.greater_equal(
                pc.cast(t["support"], pa.int64()), thresh))
            return pa.table({"u": kept["u"], "v": kept["v"],
                             "support": kept["support"].cast(pa.int64())})

        surv = supports.map_batches(keep, batch_format="pyarrow")
        n_next = surv.count()
        if n_next == 0:
            return rd.from_arrow(empty)
        if n_next == n_cur:
            return surv
        cur, ca, cb, n_cur = surv.select_columns(["u", "v"]), "u", "v", \
            n_next
    raise ValueError(
        f"k_truss did not converge within max_rounds={max_rounds}; "
        "raise max_rounds (peeling cascades once per round)")


def k_truss_naive(edge_pairs, k: int) -> dict:
    """Pure-Python k-truss reference (set-adjacency peeling) — the
    parity witness for :func:`k_truss` in tests. Takes (a, b) pairs,
    returns {(u, v): support} over the converged truss."""
    E = set()
    for a, b in edge_pairs:
        a, b = str(a), str(b)
        if a != b:
            E.add((min(a, b), max(a, b)))
    while True:
        adj: dict[str, set] = {}
        for u, v in E:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        support = {(u, v): len(adj[u] & adj[v]) for u, v in E}
        drop = {e for e, s in support.items() if s < k - 2}
        if not drop:
            return support
        E -= drop
        if not E:
            return {}
