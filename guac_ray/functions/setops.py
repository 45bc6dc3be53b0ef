"""Multiset-to-set operations: INTERSECT and EXCEPT with SQL DISTINCT
semantics over arbitrary key-column tuples — the two set operators the
§2.8 family (union / distinct / dedup, stages/assemble.py dedup_exact)
was still missing.

Semantics: ``intersect_distinct(a, b, cols)`` = distinct ``cols`` tuples
present in BOTH inputs; ``except_distinct(a, b, cols)`` = distinct
tuples of ``a`` absent from ``b`` — exactly SQL ``INTERSECT`` /
``EXCEPT`` (which are defined on distinct rows).

Scale shape: each side is locally deduped per batch (the combiner — at
most one row per distinct tuple per block enters the shuffle), tagged
with its side bit, and routed through ONE filesystem exchange keyed by
the tuple hash, so both sides' copies of a tuple land in the same
reduce bucket. The per-bucket reduce is a vectorized pandas groupby
over (tuple → side bits): intersect keeps tuples with both bits,
except keeps tuples with only the left bit. No broadcast, no sort, no
driver materialization; skew is bounded by tuple-hash uniformity (the
same guarantee every hash exchange here relies on).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas
from guac_ray.functions.joins import default_exchange
from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

__all__ = ["intersect_distinct", "except_distinct"]


def _setop(
    a: Dataset,
    b: Dataset,
    cols: list[str],
    keep: str,
    num_buckets: int,
    exchange_base: str | None,
) -> "Dataset | pa.Table":
    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            t = df[cols].drop_duplicates()
            t = t.assign(_side=pd.Series(side, index=t.index, dtype="int8"))
            t["_bucket"] = (stable_hash(t, cols) % num_buckets).astype("int64")
            return t
        return fn

    tagged = a.map_batches(tag(1), batch_format="pandas").union(
        b.map_batches(tag(2), batch_format="pandas"))

    def reduce_fn(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        # sides are 1 (left) and 2 (right): min==1 & max==2 ⇔ both
        # present; max==1 ⇔ left only — one vectorized groupby agg
        g = df.groupby(cols, sort=False, dropna=False)["_side"].agg(
            ["min", "max"]).reset_index()
        mask = ((g["min"] == 1) & (g["max"] == 2)) if keep == "both" \
            else (g["max"] == 1)
        out = g[mask][cols]
        return table_from_pandas(out, preserve_index=False)

    red = fs_exchange_reduce(
        tagged, exchange_base or default_exchange(f"setop_{keep}"),
        reduce_fn)
    if red is None:
        sch = a.schema()
        if sch is None:  # both inputs entirely empty and schema-less
            return pa.schema([(c, pa.string()) for c in cols]).empty_table()
        kt = dict(zip(sch.names, sch.types))
        return pa.schema([(c, kt[c]) for c in cols]).empty_table()
    return red


def intersect_distinct(
    a: Dataset, b: Dataset, cols: list[str],
    num_buckets: int = 16, exchange_base: str | None = None,
) -> "Dataset | pa.Table":
    """SQL ``INTERSECT``: distinct ``cols`` tuples present in both."""
    return _setop(a, b, cols, "both", num_buckets, exchange_base)


def except_distinct(
    a: Dataset, b: Dataset, cols: list[str],
    num_buckets: int = 16, exchange_base: str | None = None,
) -> "Dataset | pa.Table":
    """SQL ``EXCEPT``: distinct ``cols`` tuples of ``a`` not in ``b``."""
    return _setop(a, b, cols, "only_left", num_buckets, exchange_base)
