"""Data-quality expectations — the declarative constraint-validation
suite (Great-Expectations / dbt-test style) a pipeline runs before
promoting a table: each check yields one row (check_name, n_checked,
n_violations, passed), so the report is check-cardinality regardless
of data size.

Check kinds and their scale shapes:

  - ``not_null`` / ``accepted_values`` / ``range_cents``: row-local —
    ALL of them fold into ONE shared map pass emitting per-batch
    violation counts; the driver folds ``checks × blocks`` int rows.
  - ``unique``: not row-local — one key-hash fs exchange where
    in-bucket ``rows − distinct`` IS the global duplicate count
    (equal keys co-locate); driver folds bucket partials.
  - ``fk``: referential integrity — the co-partitioned fs-exchange
    ANTI join against the parent table (the parent is NOT assumed
    broadcast-small; at warehouse scale it rarely is), counted
    distributedly.

``range_cents`` compares on the house fixed-point cents so the bound
is a cross-engine contract (float comparisons at the boundary are
not). All counts int64-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas

__all__ = ["check_table"]


def check_table(
    ds: Dataset,
    checks: list[dict],
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> pa.Table:
    """Run ``checks`` against ``ds``. Each check is a dict with
    ``kind`` ∈ {not_null, unique, accepted_values, range_cents, fk}
    plus ``col`` and kind-specific fields (``values`` for
    accepted_values; ``lo``/``hi`` cents for range_cents; ``parent``
    (Dataset) + ``parent_col`` for fk). Returns one pa.Table row per
    check, in input order: (check_name, n_checked, n_violations,
    passed)."""
    from guac_ray.functions.joins import default_exchange, hash_join
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    base = exchange_base or default_exchange("expect")
    rowlocal = [c for c in checks
                if c["kind"] in ("not_null", "accepted_values",
                                 "range_cents")]
    for c in checks:
        if c["kind"] not in ("not_null", "unique", "accepted_values",
                             "range_cents", "fk"):
            raise ValueError(f"check_table: unknown kind {c['kind']!r}")

    def name_of(c: dict) -> str:
        return c.get("name", f"{c['kind']}:{c['col']}")

    # ---- shared row-local pass (+ the row count every check shares) --
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {"_rows": len(df)}
        for c in rowlocal:
            s = df[c["col"]]
            if c["kind"] == "not_null":
                v = int(s.isna().sum())
            elif c["kind"] == "accepted_values":
                v = int((~s.isin(c["values"]) & s.notna()).sum())
            else:  # range_cents
                # NULLs are NOT range violations (the accepted_values /
                # not_null convention: value checks skip nulls — pair
                # with a not_null check to flag them); the NaN floor-
                # cast would otherwise count every null as INT64_MIN
                sv = s[s.notna()]
                vc = np.floor(sv.to_numpy(dtype="float64") * 100
                              + 0.5).astype("int64")
                v = int(((vc < c["lo"]) | (vc > c["hi"])).sum())
            out[name_of(c)] = v
        return pd.DataFrame([out])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n_rows = int(parts["_rows"].sum()) if len(parts) else 0
    viol = {name_of(c): (int(parts[name_of(c)].sum())
                         if len(parts) else 0)
            for c in rowlocal}

    # ---- unique: key-hash exchange, in-bucket dup count is global ----
    for c in (c for c in checks if c["kind"] == "unique"):
        col = c["col"]

        def add_bucket(df: pd.DataFrame, col=col) -> pa.Table:
            out = pd.DataFrame({col: df[col]})
            out["_bucket"] = (stable_hash(out, [col])
                              % num_buckets).astype("int64")
            return table_from_pandas(out, preserve_index=False)

        def dup_count(t: pa.Table, col=col) -> pa.Table:
            n = t.num_rows
            d = len(pd.unique(t[col].to_numpy(zero_copy_only=False)))
            return pa.table({"dups": pa.array([n - d], pa.int64())})

        out = fs_exchange_reduce(
            ds.select_columns([col]).map_batches(
                add_bucket, batch_format="pandas"),
            f"{base}_uq", dup_count)
        viol[name_of(c)] = (0 if out is None else
                            int(out.to_pandas()["dups"].sum()))

    # ---- fk: partitioned ANTI join against the parent ----
    for c in (c for c in checks if c["kind"] == "fk"):
        col, pcol = c["col"], c["parent_col"]
        parent = c["parent"].select_columns([pcol])
        if pcol != col:
            parent = parent.map_batches(
                lambda t, col=col: t.rename_columns([col]),
                batch_format="pyarrow")
        orphans = hash_join(ds.select_columns([col]), parent, on=col,
                            how="anti", exchange_dir=f"{base}_fk",
                            num_buckets=num_buckets)
        viol[name_of(c)] = int(orphans.count())

    rows = [{"check_name": name_of(c), "n_checked": n_rows,
             "n_violations": viol[name_of(c)],
             "passed": int(viol[name_of(c)] == 0)} for c in checks]
    return pa.table({
        "check_name": pa.array([r["check_name"] for r in rows],
                               pa.string()),
        "n_checked": pa.array([r["n_checked"] for r in rows],
                              pa.int64()),
        "n_violations": pa.array([r["n_violations"] for r in rows],
                                 pa.int64()),
        "passed": pa.array([r["passed"] for r in rows], pa.int64()),
    })
