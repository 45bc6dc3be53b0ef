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

__all__ = ["kcore"]


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
