"""Reshaping aggregates: pivot (long→wide counts) and rollup
(multi-level grouping sets).

Neither exists in the reference (its only aggregation is graph-node
merge — SURVEY.md §2.6) or in Ray Data; both are everyday report shapes
over a 100 TB events table, so they're built on the same two-phase
fs-exchange aggregation as everything else:

- :func:`pivot_counts` one-hot-encodes the category column per batch
  (pure map, width = |categories| int64 columns) and sums through
  :func:`grouped_agg` — the wide row never exists as Python objects and
  the shuffle payload is (index, k ints) per partial group.
- :func:`rollup_agg` aggregates ONCE at the finest level distributed,
  then derives every coarser grouping-set level from the finest result
  on the driver — correct because the supported aggregates (sum, count,
  min, max) are re-aggregable, and cheap because a rollup you'd ever
  render has a driver-small finest level (document cardinality in the
  caller if not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from guac_ray.stages.groupagg import grouped_agg

__all__ = ["pivot_counts", "rollup_agg", "cube_agg", "unpivot",
           "grouping_sets_agg"]

_REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def pivot_counts(
    ds: Dataset,
    index: str,
    column: str,
    categories: list[str],
    prefix: str = "n_",
    num_buckets: int = 16,
) -> Dataset:
    """Wide per-``index`` occurrence counts of each category of
    ``column``. Categories must be listed explicitly (the schema of a
    distributed pivot cannot depend on the data without an extra
    distinct pass); values outside ``categories`` are ignored."""
    cols = [f"{prefix}{c}" for c in categories]

    def onehot(t: pa.Table) -> pa.Table:
        vals = t[column].to_numpy(zero_copy_only=False)
        out = {index: t[index]}
        for c, name in zip(categories, cols):
            out[name] = (vals == c).astype("int64")
        return pa.table(out)

    wide = ds.map_batches(onehot, batch_format="pyarrow")
    return grouped_agg(wide, [index], {n: (n, "sum") for n in cols},
                       num_buckets=num_buckets)


def unpivot(
    ds: Dataset,
    index: list[str] | str,
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    var_labels: list[str] | None = None,
) -> Dataset:
    """Wide→long (the inverse of :func:`pivot_counts`): each input row
    becomes ``len(value_cols)`` rows of (index..., label, value). Pure
    per-batch map — no shuffle, row count grows by exactly the column
    factor. ``var_labels`` overrides the emitted label per column
    (default: the column name)."""
    index = [index] if isinstance(index, str) else list(index)
    labels = value_cols if var_labels is None else var_labels
    if len(labels) != len(value_cols):
        raise ValueError(
            f"unpivot: var_labels has {len(labels)} entries for "
            f"{len(value_cols)} value columns")

    def melt(t: pa.Table) -> pa.Table:
        k = len(value_cols)
        n = t.num_rows
        cols = {c: np.repeat(t[c].to_numpy(zero_copy_only=False), k)
                for c in index}
        lab = np.tile(np.array(labels, dtype=object), n)
        vals = np.empty(n * k, dtype="object")
        for j, c in enumerate(value_cols):
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if col.null_count:
                # to_numpy would float-upcast a nullable int column
                # (5 → 5.0, null → NaN) and the typed pa.array below
                # would ArrowInvalid on the NaN — go through Python
                # objects, where ints stay ints and nulls stay None
                vals[j::k] = col.to_pylist()
            else:
                vals[j::k] = col.to_numpy(zero_copy_only=False)
        cols[var_name] = lab
        # preserve the concrete dtype when all value columns agree;
        # heterogeneous columns melt to strings (Arrow columns are typed —
        # there is no object column to fall back to)
        dtypes = {t.schema.field(c).type for c in value_cols}
        if len(dtypes) == 1:
            cols[value_name] = pa.array(vals, type=dtypes.pop())
        else:
            # nulls must stay null — a bare astype(str) would stamp the
            # literal string 'None' over them
            isna = pd.isna(vals)
            conv = np.where(isna, None, vals.astype(str))
            cols[value_name] = pa.array(conv, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(melt, batch_format="pyarrow")


def rollup_agg(
    ds: Dataset,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    fill: str = "ALL",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """ROLLUP(keys...) aggregate: one row per group at every prefix
    level (finest → grand total), dropped key columns filled with
    ``fill`` (string keys assumed — the SQL shape is
    ``COALESCE(k, 'ALL') ... GROUP BY ROLLUP(k, ...)``).

    ``spec``: {out: (in_col, fn)} with fn ∈ sum|count|min|max (mean is
    not re-aggregable from finest rows — decompose it yourself).
    Distributed work happens once, at the finest level; coarser levels
    re-aggregate the finest pandas frame on the driver."""
    for out, (_c, fn) in spec.items():
        if fn not in _REAGG:
            raise ValueError(f"rollup_agg: unsupported fn {fn!r} for {out!r}")
    finest = grouped_agg(ds, keys, spec, num_buckets=num_buckets).to_pandas()
    if finest.empty:
        # no groups → no rollup rows (empty-relation shape; a SQL ROLLUP
        # would still emit one grand-total row, but with NULL aggregates
        # that an int-typed frame cannot represent)
        return finest.reindex(columns=keys + list(spec))
    finest[keys] = finest[keys].astype(str)
    levels = [finest]
    grouping_sets = [tuple(keys[:d]) for d in range(len(keys) - 1, -1, -1)]
    for gset in grouping_sets:
        levels.append(_derive_level(finest, keys, spec, gset, fill))
    out = pd.concat(levels, ignore_index=True)
    # re-aggregated counts stay int64; pandas .agg on empty groups can
    # upcast — normalize to the finest dtypes
    for c in spec:
        out[c] = out[c].astype(finest[c].dtype)
    return out


def _derive_level(finest: pd.DataFrame, keys: list[str], spec, gset, fill):
    """Re-aggregate the finest frame to one grouping set, dropped key
    columns filled with ``fill``."""
    agg = {out: _REAGG[spec[out][1]] for out in spec}
    head = list(gset)
    if head:
        lvl = finest.groupby(head, as_index=False).agg(agg)
    else:
        lvl = finest[list(spec)].agg(agg).to_frame().T
    for k in keys:
        if k not in gset:
            lvl[k] = fill
    return lvl[keys + list(spec)]


def cube_agg(
    ds: Dataset,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    fill: str = "ALL",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """CUBE(keys...) aggregate: one row per group for EVERY subset of
    the keys (2^k grouping sets — a strict superset of ROLLUP's k+1
    prefix sets). Same discipline as ``rollup_agg``: the distributed
    two-phase aggregate runs ONCE at the finest level; every coarser
    grouping set re-aggregates the finest pandas frame on the driver —
    bounded by finest-group cardinality, never input size. Same
    re-aggregability rules (sum|count|min|max)."""
    from itertools import combinations

    for out, (_c, fn) in spec.items():
        if fn not in _REAGG:
            raise ValueError(f"cube_agg: unsupported fn {fn!r} for {out!r}")
    finest = grouped_agg(ds, keys, spec, num_buckets=num_buckets).to_pandas()
    if finest.empty:
        return finest.reindex(columns=keys + list(spec))
    finest[keys] = finest[keys].astype(str)
    levels = [finest]
    for size in range(len(keys) - 1, -1, -1):
        for gset in combinations(keys, size):
            levels.append(_derive_level(finest, keys, spec, gset, fill))
    out = pd.concat(levels, ignore_index=True)
    for c in spec:
        out[c] = out[c].astype(finest[c].dtype)
    return out


def grouping_sets_agg(
    ds: Dataset,
    keys: list[str],
    sets: list[tuple[str, ...]],
    spec: dict[str, tuple[str, str]],
    fill: str = "ALL",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """GROUP BY GROUPING SETS (arbitrary lattice selection) — the
    general form ROLLUP (prefix sets) and CUBE (all subsets) are
    special cases of: emit exactly the requested grouping sets, each a
    subset of ``keys``, dropped key columns filled with ``fill``. Same
    discipline as ``rollup_agg``: the distributed two-phase aggregate
    runs ONCE at the finest level; every requested set re-aggregates
    the finest pandas frame on the driver — bounded by finest-group
    cardinality, never input size. Duplicate sets are emitted
    duplicate, exactly as SQL does. Same re-aggregability rules
    (sum|count|min|max)."""
    for out, (_c, fn) in spec.items():
        if fn not in _REAGG:
            raise ValueError(
                f"grouping_sets_agg: unsupported fn {fn!r} for {out!r}")
    norm = []
    for gset in sets:
        gs = tuple(gset)
        extra = set(gs) - set(keys)
        if extra:
            raise ValueError(
                f"grouping_sets_agg: set {gs} references non-key "
                f"columns {sorted(extra)}")
        norm.append(gs)
    finest = grouped_agg(ds, keys, spec, num_buckets=num_buckets).to_pandas()
    if finest.empty:
        return finest.reindex(columns=keys + list(spec))
    finest[keys] = finest[keys].astype(str)
    levels = [(_derive_level(finest, keys, spec, gs, fill)
               if set(gs) != set(keys)
               # the full key set IS the finest frame (column order kept)
               else finest[keys + list(spec)])
              for gs in norm]
    out = pd.concat(levels, ignore_index=True)
    for c in spec:
        out[c] = out[c].astype(finest[c].dtype)
    return out
