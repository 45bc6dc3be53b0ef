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

__all__ = ["intersect_distinct", "except_distinct", "reconcile"]


def _setop(
    a: Dataset,
    b: Dataset,
    cols: list[str],
    keep: str,
    num_buckets: int,
    exchange_base: str | None,
) -> Dataset:
    def tag(side: int):
        def fn(df: pd.DataFrame) -> pa.Table:
            t = df[cols].drop_duplicates()
            t = t.assign(_side=pd.Series(side, index=t.index, dtype="int8"))
            t["_bucket"] = (stable_hash(t, cols) % num_buckets).astype("int64")
            return table_from_pandas(t, preserve_index=False)
        return fn

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

    # TWO map-side inputs into ONE exchange via the multi-input reduce —
    # the reconcile/CDC-merge discipline; Dataset.union's UnionOperator
    # emits an empty-schema RefBundle and a per-run schema warning
    from guac_ray.stages.assemble import fs_exchange_reduce_multi

    red = fs_exchange_reduce_multi(
        [a.map_batches(tag(1), batch_format="pandas"),
         b.map_batches(tag(2), batch_format="pandas")],
        exchange_base or default_exchange(f"setop_{keep}"),
        reduce_fn)
    if red is None:
        # typed empty DATASET (the populated path returns one); numpy
        # dtypes from pandas-block schemas normalize via arrow_type_of
        import ray.data as rd

        from guac_ray.arrowutil import arrow_type_of

        sch = a.schema()
        kt = ({n: arrow_type_of(t)
               for n, t in zip(sch.names, sch.types)}
              if sch is not None else {})
        return rd.from_arrow(pa.schema(
            [(c, kt.get(c) or pa.string()) for c in cols]).empty_table())
    return red


def intersect_distinct(
    a: Dataset, b: Dataset, cols: list[str],
    num_buckets: int = 16, exchange_base: str | None = None,
) -> Dataset:
    """SQL ``INTERSECT``: distinct ``cols`` tuples present in both."""
    return _setop(a, b, cols, "both", num_buckets, exchange_base)


def except_distinct(
    a: Dataset, b: Dataset, cols: list[str],
    num_buckets: int = 16, exchange_base: str | None = None,
) -> Dataset:
    """SQL ``EXCEPT``: distinct ``cols`` tuples of ``a`` not in ``b``."""
    return _setop(a, b, cols, "only_left", num_buckets, exchange_base)


def reconcile(
    left: Dataset,
    right: Dataset,
    on: list[str] | str,
    compare_cols: list[str],
    exchange_base: str | None = None,
    num_buckets: int = 32,
    detail: bool = False,
):
    """Keyed table reconciliation — the migration-validation /
    restatement-audit diff (does the rebuilt table match the old one,
    and where not, HOW): every key present in either side is
    classified ``only_left`` / ``only_right`` / ``equal`` /
    ``differs`` (equal vs differs compares ``compare_cols``
    element-wise, NULL == NULL). Default returns the summary —
    ``(status, n_keys)``, status-cardinality regardless of data size;
    ``detail=True`` returns the per-key Dataset ``(on…, status)`` for
    drill-down.

    Contract: keys are UNIQUE per side (snapshot semantics — a
    duplicate key makes "the" row undefined and silently multiplies
    under SQL FULL OUTER); violations raise, detected exactly
    in-bucket (a key lives in one bucket, so in-bucket dup IS global
    dup).

    Scale shape: both sides project to (on + compare_cols + side bit)
    and write into ONE shared key-hash fs exchange
    (``fs_exchange_reduce_multi`` — the CDC-merge discipline); per
    bucket one outer pandas merge + vectorized column compares; the
    summary is a driver fold over status×bucket one-row partials
    (bounded by 4 × buckets, never data)."""
    import numpy as np

    from guac_ray.stages.assemble import fs_exchange_reduce_multi

    import ray.data as rd

    on = [on] if isinstance(on, str) else list(on)

    def tag(side: int):
        def f(df: pd.DataFrame) -> pa.Table:
            out = df[on + compare_cols].copy()
            out["_side"] = np.int64(side)
            out["_bucket"] = (stable_hash(out, on)
                              % num_buckets).astype("int64")
            return table_from_pandas(out, preserve_index=False)
        return f

    def classify(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        l = df[df["_side"] == 0].drop(columns="_side")
        r = df[df["_side"] == 1].drop(columns="_side")
        for side, name in ((l, "left"), (r, "right")):
            if side.duplicated(on).any():
                raise ValueError(
                    f"reconcile: duplicate key(s) on the {name} side — "
                    "keys must be unique per side (snapshot semantics)")
        m = l.merge(r, on=on, how="outer", suffixes=("_l", "_r"),
                    indicator=True)
        eq = np.ones(len(m), dtype=bool)
        for c in compare_cols:
            a, b = m[f"{c}_l"], m[f"{c}_r"]
            eq &= ((a == b) | (a.isna() & b.isna())).to_numpy()
        status = np.where(
            m["_merge"].to_numpy() == "left_only", "only_left",
            np.where(m["_merge"].to_numpy() == "right_only",
                     "only_right",
                     np.where(eq, "equal", "differs")))
        m = m[on].copy()
        m["status"] = status
        return m

    if detail:
        def reduce_fn(t: pa.Table) -> pa.Table:
            return table_from_pandas(classify(t), preserve_index=False)
    else:
        def reduce_fn(t: pa.Table) -> pa.Table:
            c = (classify(t)["status"].value_counts().rename("n_keys")
                 .rename_axis("status").reset_index())
            c["n_keys"] = c["n_keys"].astype("int64")
            return table_from_pandas(c, preserve_index=False)

    out = fs_exchange_reduce_multi(
        [left.map_batches(tag(0), batch_format="pandas"),
         right.map_batches(tag(1), batch_format="pandas")],
        exchange_base or default_exchange("reconcile"), reduce_fn)
    if out is None:
        if detail:
            return rd.from_arrow(pa.schema(
                [(c, pa.string()) for c in on]
                + [("status", pa.string())]).empty_table())
        return pa.schema([("status", pa.string()),
                          ("n_keys", pa.int64())]).empty_table()
    if detail:
        return out
    # status×bucket one-row partials → one bounded driver fold
    parts = out.to_pandas()
    s = (parts.groupby("status", sort=True)["n_keys"].sum()
         .reset_index())
    s["n_keys"] = s["n_keys"].astype("int64")
    return table_from_pandas(s, preserve_index=False)
