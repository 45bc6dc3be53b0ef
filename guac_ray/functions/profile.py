"""Column profiling — the data-quality summary pass (Deequ/
whylogs-style analyzers) every warehouse runs before trusting a new
table: per column, row/null counts, EXACT distinct cardinality, and
typed min/max, in one long-format row per column.

Scale shape (two passes over the column-pruned table, both pure map):

  1. scalar stats: per-batch partials (n, n_null, min, max) — the
     driver folds ``columns × blocks`` partial rows, bounded by
     parallelism, never data (the reciprocity precedent).
  2. EXACT distinct: per batch, each column's IN-BATCH distinct values
     as (col_id, val_str) pairs → one fs exchange bucketed by
     hash(col, val) (equal pairs co-locate, so in-bucket distinct IS
     global distinct) → per-bucket per-column counts; the driver folds
     ``columns × buckets`` one-row partials.

Values are stringified per the column's declared kind before distinct
counting so one exchange schema serves every type, and the mapping is
INJECTIVE per kind (int64 → decimal string; float64 → cents — the
house fixed-point contract, mirrored in the SQL oracle; timestamps →
epoch-µs string; strings → identity), which is what makes the distinct
count exact rather than hash-approximate.

Kinds: ``int`` (int64), ``cents`` (float64 money → floor(x*100+0.5)),
``ts_us`` (timestamp → epoch µs), ``str``. Numeric kinds report
``min_num``/``max_num`` (int64, NULL for string columns); ``str``
reports ``min_str``/``max_str`` (lexicographic, NULL for numerics) —
one fixed output schema across all kinds, the long-format contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas

__all__ = ["table_profile"]

_KINDS = ("int", "cents", "ts_us", "str")


def _to_num(s: pd.Series, kind: str) -> np.ndarray:
    """Non-null values of ``s`` as int64 per the kind's injective map."""
    v = s.dropna()
    if kind == "int":
        return v.to_numpy().astype("int64")
    if kind == "cents":
        return np.floor(v.to_numpy(dtype="float64") * 100 + 0.5).astype("int64")
    if kind == "ts_us":
        return v.to_numpy().astype("datetime64[us]").astype("int64")
    raise AssertionError(kind)


def table_profile(
    ds: Dataset,
    spec: dict[str, str],
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> pa.Table:
    """Profile the columns named in ``spec`` (col → kind). Returns one
    pa.Table row per column: (col, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str)."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    for c, k in spec.items():
        if k not in _KINDS:
            raise ValueError(f"table_profile: unknown kind {k!r} for {c!r}")
    cols = sorted(spec)
    col_id = {c: i for i, c in enumerate(cols)}
    proj = ds.select_columns(cols)

    # ---- pass 1: scalar partials (driver folds blocks × cols rows) ----
    def scalar_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            k, s = spec[c], df[c]
            n, n_null = len(s), int(s.isna().sum())
            r = {"col": c, "n_rows": n, "n_null": n_null,
                 "min_num": None, "max_num": None,
                 "min_str": None, "max_str": None}
            if n > n_null:
                if k == "str":
                    v = s.dropna()
                    r["min_str"], r["max_str"] = v.min(), v.max()
                else:
                    v = _to_num(s, k)
                    r["min_num"], r["max_num"] = int(v.min()), int(v.max())
            rows.append(r)
        return pd.DataFrame(rows)

    parts = proj.map_batches(scalar_partial,
                             batch_format="pandas").to_pandas()
    agg = {}
    for _, r in parts.iterrows():
        a = agg.setdefault(r["col"], {
            "n_rows": 0, "n_null": 0, "min_num": None, "max_num": None,
            "min_str": None, "max_str": None})
        a["n_rows"] += int(r["n_rows"])
        a["n_null"] += int(r["n_null"])
        for key, op in (("min_num", min), ("max_num", max),
                        ("min_str", min), ("max_str", max)):
            if r[key] is not None and not pd.isna(r[key]):
                # block-level None promotes numeric partial columns to
                # float (NaN) — restore the exact int64 before folding
                v = int(r[key]) if key.endswith("_num") else str(r[key])
                a[key] = v if a[key] is None else op(a[key], v)

    # ---- pass 2: exact distinct through the pair exchange ----
    def pair_partial(df: pd.DataFrame) -> pa.Table:
        outs = []
        for c in cols:
            k, s = spec[c], df[c]
            if k == "str":
                vals = s.dropna().astype(str).to_numpy()
            else:
                vals = _to_num(s, k).astype(str)
            u = np.unique(vals)
            outs.append(pd.DataFrame({
                "_cid": np.full(len(u), col_id[c], dtype=np.int64),
                "_val": u}))
        out = (pd.concat(outs, ignore_index=True) if outs else
               pd.DataFrame({"_cid": pd.Series([], dtype="int64"),
                             "_val": pd.Series([], dtype="object")}))
        out["_bucket"] = (stable_hash(out, ["_cid", "_val"])
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.select(["_cid", "_val"]).to_pandas()
        g = (df.drop_duplicates().groupby("_cid", sort=False)
             .size().reset_index(name="n"))
        return table_from_pandas(
            pd.DataFrame({"_cid": g["_cid"].astype("int64"),
                          "n": g["n"].astype("int64")}),
            preserve_index=False)

    out = fs_exchange_reduce(
        proj.map_batches(pair_partial, batch_format="pandas"),
        exchange_base or default_exchange("profile"), reduce_fn)
    n_distinct = {c: 0 for c in cols}
    if out is not None:
        for _, r in out.to_pandas().iterrows():
            n_distinct[cols[int(r["_cid"])]] += int(r["n"])

    rows = []
    for c in cols:
        a = agg.get(c, {"n_rows": 0, "n_null": 0, "min_num": None,
                        "max_num": None, "min_str": None,
                        "max_str": None})
        rows.append({"col": c, "n_rows": a["n_rows"],
                     "n_null": a["n_null"], "n_distinct": n_distinct[c],
                     "min_num": a["min_num"], "max_num": a["max_num"],
                     "min_str": a["min_str"], "max_str": a["max_str"]})
    def col_of(key, typ):
        return pa.array([r[key] for r in rows], typ)

    return pa.table({
        "col": col_of("col", pa.string()),
        "n_rows": col_of("n_rows", pa.int64()),
        "n_null": col_of("n_null", pa.int64()),
        "n_distinct": col_of("n_distinct", pa.int64()),
        "min_num": col_of("min_num", pa.int64()),
        "max_num": col_of("max_num", pa.int64()),
        "min_str": col_of("min_str", pa.string()),
        "max_str": col_of("max_str", pa.string()),
    })
