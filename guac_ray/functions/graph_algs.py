"""Iterative graph decompositions over edge Datasets.

k-core: the maximal induced subgraph where every node has degree >= k,
computed by textbook iterative peeling — each round drops nodes whose
degree within the surviving subgraph is < k, until a fixpoint. The
reference keeps its whole graph in one backend process and answers
neighborhood queries from a map (pkg/assembler/backends/keyvalue/
backend.go); there is no k-core there — this is one of the
training-data-engine graph additions (community trimming / hub
extraction before sampling), built on the repo's distributed
primitives.

Scale shape (the part that must survive 100 TB):
  - the edge list is canonicalized (undirected, simple) ONCE via the
    two-phase exchange dedup, then symmetrized; it only SHRINKS after
    that — every round's filter is a semi join, never an expansion.
  - degrees come from the bucketed two-phase count (grouped_agg), no
    global sort.
  - the alive-node filter is size-guarded two-regime: a driver
    broadcast set while the surviving node list is small enough
    (`broadcast_limit`), else two large-large SEMI hash joins through
    the filesystem exchange — the same discipline as
    functions/ann.py's verify stage.
  - rounds needed = peel depth, which is small for hub-heavy graphs
    (2 at sf0.01); `max_rounds` bounds adversarial chains, and the SQL
    oracle unrolls exactly `max_rounds` levels so a converged run is
    hash-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas

__all__ = ["kcore", "label_propagation"]


def kcore(
    edges: Dataset,
    src: str,
    dst: str,
    k: int,
    exchange_base: str,
    num_buckets: int = 16,
    max_rounds: int = 16,
    broadcast_limit: int = 1_000_000,
) -> Dataset:
    """k-core of the undirected simple graph induced by ``edges`` →
    Dataset of (node, deg) where ``deg`` is the node's degree WITHIN
    the core. Self-loops are dropped; parallel/duplicate edges count
    once. Keys may be strings or ints.

    Peels to fixpoint (at most ``max_rounds`` rounds): round r keeps
    the nodes with >= k distinct surviving neighbors, recomputed over
    the subgraph induced by round r-1's survivors.
    """
    import os

    import ray.data as rdata

    from guac_ray.functions.joins import hash_join, semi_join
    from guac_ray.stages.assemble import dedup_exact
    from guac_ray.stages.groupagg import grouped_agg

    if k < 1:
        raise ValueError(f"kcore: k must be >= 1, got {k}")

    def canon(df: pd.DataFrame) -> pa.Table:
        s, o = df[src], df[dst]
        # drop null endpoints FIRST: NaN != x is True, so a null would
        # survive the self-loop mask as a phantom neighbor inflating a
        # real node's degree past the k threshold (SQL: a NULL
        # comparison is never TRUE, the edge joins nothing)
        ok = s.notna() & o.notna()
        s, o = s[ok], o[ok]
        swap = o < s
        a = s.where(~swap, o)
        b = o.where(~swap, s)
        out = pd.DataFrame({"a": a, "b": b})
        return table_from_pandas(out[a != b], preserve_index=False)

    simple = dedup_exact(
        edges.map_batches(canon, batch_format="pandas"), ["a", "b"],
        num_buckets=num_buckets)

    def sym(t: pa.Table) -> pa.Table:
        a, b = t["a"].combine_chunks(), t["b"].combine_chunks()
        return pa.table({"a": pa.concat_arrays([a, b]),
                         "b": pa.concat_arrays([b, a])})

    e2 = simple.map_batches(sym, batch_format="pyarrow").materialize()

    sch = e2.schema()
    key_type = (dict(zip(sch.names, sch.types))["a"]
                if sch is not None and "a" in sch.names else pa.string())
    empty = rdata.from_arrow(pa.schema(
        [("node", key_type), ("deg", pa.int64())]).empty_table())
    if e2.count() == 0:
        return empty

    def survivors(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["deg"], k))

    core = None
    for rnd in range(max_rounds):
        deg = grouped_agg(e2, ["a"], {"deg": ("a", "count")},
                          num_buckets=num_buckets).materialize()
        total = deg.count()
        core = deg.map_batches(survivors, batch_format="pyarrow").materialize()
        n = core.count()
        if n == 0:
            return empty
        if n == total:
            break  # nobody dropped → fixpoint; deg is within the core
        if n <= broadcast_limit:
            keys = [r["a"] for r in
                    core.select_columns(["a"]).take_all()]
            e2 = semi_join(semi_join(e2, keys, "a"), keys, "b")
        else:
            alive = core.select_columns(["a"])
            e2 = hash_join(e2, alive, on="a",
                           exchange_dir=os.path.join(exchange_base,
                                                     f"ka{rnd}"),
                           how="semi", num_buckets=num_buckets)
            e2 = hash_join(
                e2.map_batches(
                    lambda t: pa.table({"a": t["b"], "b": t["a"]}),
                    batch_format="pyarrow"),
                alive, on="a",
                exchange_dir=os.path.join(exchange_base, f"kb{rnd}"),
                how="semi", num_buckets=num_buckets)
            e2 = e2.map_batches(
                lambda t: pa.table({"a": t["b"], "b": t["a"]}),
                batch_format="pyarrow")
        e2 = e2.materialize()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["a"].combine_chunks().cast(key_type),
            "deg": pc.cast(t["deg"], pa.int64()),
        })

    return core.map_batches(finish, batch_format="pyarrow")


def label_propagation(
    edges: Dataset,
    src: str = "subj_key",
    dst: str = "obj_key",
    rounds: int = 4,
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """SYNCHRONOUS deterministic label propagation (Raghavan et al.
    2007) over the undirected simple graph in ``edges`` — the
    community-detection baseline a dedup/curation pipeline runs to
    group near-duplicate clusters or tool ecosystems: every node
    starts labeled with its own key; each round every node
    simultaneously adopts the most frequent label among its neighbors
    PLUS its own current label (the self-vote), ties broken by the
    SMALLEST label. Exactly ``rounds`` synchronous rounds — no
    convergence check, so the result is a pure deterministic function
    of the graph and ``rounds``, which is what lets the suite's
    ``kg_label_prop`` carry a DuckDB oracle unrolling the identical
    vote-argmax recurrence (classic async LPA is order-dependent and
    unverifiable; the self-vote damps the 2-cycle oscillation
    synchronous LPA is known for).

    Returns Dataset(node_key, label) for every node.

    Scale shape (the pagerank/hits contract): the deduped stub table
    (both orientations, self-loops dropped) is hash-partitioned by
    VOTE SOURCE once at setup — stub (node, nbr) lives in bucket
    hash(nbr), co-partitioned with the label table's hash(node_key)
    layout, so each round's vote join is bucket-local; per round only
    (node, label, count) partials move, re-bucketed by node hash, and
    the reduce is the grouped_mode argmax (count DESC, label ASC).
    The self-vote needs no stub rows: bucket k's label table IS the
    self-vote set for its nodes (hash(v) = k both as voter and
    votee). Nothing label-sized ever transits the driver."""
    import pyarrow.parquet as pq
    import ray.data as rdata

    from guac_ray.exfs import (bucket_of_keys, default_exchange,
                               exchange_fs, fresh_exchange_dir,
                               fs_bucket_ids, fs_list_files, fs_mkdirs,
                               read_bucket_df)
    from guac_ray.functions.dedup import dedup_exact

    if rounds < 1:
        raise ValueError(
            f"label_propagation: rounds must be >= 1, got {rounds}")
    fsys, _ = exchange_fs()
    ex = fresh_exchange_dir(exchange_base
                            or default_exchange("labelprop"))
    B = num_buckets

    # shared with pagerank/hits (one definition in exfs — the bucket
    # assignment is a cross-layout contract)
    def _bucket_of(keys: pd.Series) -> np.ndarray:
        return bucket_of_keys(keys, B)

    _read_bucket = read_bucket_df

    # ---- setup: distinct stubs (both orientations, no self-loops),
    # bucketed by VOTE SOURCE (nbr); in-bucket dedup is global dedup
    # because a (node, nbr) pair always lands in hash(nbr) ----
    def part_stubs(df: pd.DataFrame) -> pa.Table:
        s, o = df[src], df[dst]
        ok = s.notna() & o.notna() & (s != o)
        s, o = s[ok], o[ok]
        # string keys only (the pagerank-family rule): the typed-empty
        # and label-init paths pin node_key/label to string — an
        # integer-keyed graph would flip schemas; refuse at ingest
        for name, col in (("src", s), ("dst", o)):
            if np.issubdtype(col.to_numpy().dtype, np.number):
                raise TypeError(
                    f"label_propagation: {name!r} node keys must be "
                    "strings — stringify integer ids upstream, e.g. "
                    ".astype(str)")
        out = pd.DataFrame({
            "node": pd.concat([s, o], ignore_index=True),
            "nbr": pd.concat([o, s], ignore_index=True),
        }).drop_duplicates()
        out["_bucket"] = _bucket_of(out["nbr"])
        return table_from_pandas(out, preserve_index=False)

    st0 = f"{ex}/stubs0"
    edges.select_columns([src, dst]).map_batches(
        part_stubs, batch_format="pandas").write_parquet(
        st0, partition_cols=["_bucket"], filesystem=fsys)

    empty = pa.schema([("node_key", pa.string()),
                       ("label", pa.string())])
    stb = fs_bucket_ids(fsys, st0)
    if not stb:
        return rdata.from_arrow(empty.empty_table())

    stubs = f"{ex}/stubs"
    fs_mkdirs(fsys, stubs)

    def dedup_stubs(batch: pd.DataFrame) -> pa.Table:
        nodes = []
        for k in batch["k"]:
            df = _read_bucket(fsys, st0, int(k))
            df = df.drop_duplicates(["node", "nbr"])
            d = f"{stubs}/_bucket={k}"
            fs_mkdirs(fsys, d)
            pq.write_table(table_from_pandas(df, preserve_index=False),
                           f"{d}/part.parquet", filesystem=fsys)
            nodes.append(pd.DataFrame({
                "node_key": pd.unique(df["node"])}))
        return table_from_pandas(pd.concat(nodes, ignore_index=True),
                                 preserve_index=False)

    nodes_ds = rdata.from_items([{"k": k} for k in stb]).map_batches(
        dedup_stubs, batch_format="pandas", batch_size=1)

    # ---- labels_0 = own key, bucketed by node hash ----
    def part_nodes(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"node_key": df["node_key"]})
        out["label"] = out["node_key"]
        out["_bucket"] = _bucket_of(out["node_key"])
        return table_from_pandas(out, preserve_index=False)

    lab_dir = f"{ex}/labels_0"
    dedup_exact(nodes_ds, ["node_key"], num_buckets=B).map_batches(
        part_nodes, batch_format="pandas").write_parquet(
        lab_dir, partition_cols=["_bucket"], filesystem=fsys)
    nbuckets = fs_bucket_ids(fsys, lab_dir)

    cur = lab_dir
    for it in range(1, rounds + 1):
        vdir = f"{ex}/votes_{it}"
        ndir = f"{ex}/labels_{it}"

        def votes(batch: pd.DataFrame, cur=cur) -> pa.Table:
            outs = []
            for k in batch["k"]:
                lab = _read_bucket(fsys, cur, int(k))
                if lab is None:
                    continue
                stf = _read_bucket(fsys, stubs, int(k))
                if stf is not None:
                    m = stf.merge(lab, left_on="nbr",
                                  right_on="node_key", how="inner")
                    nb = pd.DataFrame({"node": m["node"],
                                       "lbl": m["label"]})
                else:
                    nb = pd.DataFrame({"node": [], "lbl": []})
                # the self-vote: this bucket's own labels (hash(v)=k
                # as voter AND votee)
                selfv = pd.DataFrame({"node": lab["node_key"],
                                      "lbl": lab["label"]})
                part = (pd.concat([nb, selfv], ignore_index=True)
                        .groupby(["node", "lbl"], sort=False)
                        .size().rename("c").reset_index())
                part["c"] = part["c"].astype("int64")
                part["_bucket"] = _bucket_of(part["node"])
                outs.append(part)
            if not outs:
                return pa.schema(
                    [("node", pa.string()), ("lbl", pa.string()),
                     ("c", pa.int64()),
                     ("_bucket", pa.int64())]).empty_table()
            return table_from_pandas(
                pd.concat(outs, ignore_index=True), preserve_index=False)

        rdata.from_items([{"k": k} for k in nbuckets]).map_batches(
            votes, batch_format="pandas", batch_size=1).write_parquet(
            vdir, partition_cols=["_bucket"], filesystem=fsys)

        def new_labels(batch: pd.DataFrame, vdir=vdir,
                       ndir=ndir) -> pa.Table:
            for k in batch["k"]:
                v = _read_bucket(fsys, vdir, int(k),
                                 columns=["node", "lbl", "c"])
                if v is None:
                    continue
                agg = (v.groupby(["node", "lbl"], sort=False)["c"]
                       .sum().reset_index())
                # argmax: count DESC, label ASC (the grouped_mode rule)
                agg = agg.sort_values(["node", "c", "lbl"],
                                      ascending=[True, False, True],
                                      kind="mergesort")
                win = agg.drop_duplicates("node", keep="first")
                out = pd.DataFrame({"node_key": win["node"],
                                    "label": win["lbl"]})
                d = f"{ndir}/_bucket={k}"
                fs_mkdirs(fsys, d)
                pq.write_table(
                    table_from_pandas(out, preserve_index=False),
                    f"{d}/part.parquet", filesystem=fsys)
            return pa.table({"k": pa.array(batch["k"], pa.int64())})

        rdata.from_items([{"k": k} for k in nbuckets]).map_batches(
            new_labels, batch_format="pandas",
            batch_size=1).materialize()
        cur = ndir

    return rdata.read_parquet(
        [f for k in nbuckets
         for f in fs_list_files(fsys, f"{cur}/_bucket={k}")],
        columns=["node_key", "label"], filesystem=fsys)
