"""Range-clustered Parquet layout + zone-map pruned reads — the
data-skipping index (Iceberg/Delta file-statistics pruning, Snowflake
micro-partition zone maps) a 100 TB store needs for selective scans:
cluster ONCE on the column queries filter by, then a point/range query
opens only the range directories whose [min, max] intersect the
predicate instead of every file in the table.

Write shape: range boundaries come from the engine's EXACT distributed
quantiles (equal-ROW ranges — balanced files even on skewed value
distributions, and deterministic: same data → same boundaries → same
layout, the resume contract); routing is one vectorized searchsorted
per batch; the write is ``write_parquet(partition_cols=["_range"])``
(every task appends only its own files — no coordination, the fs
exchange discipline). The manifest records each range's EXACT min/max
and row count read from the parquet FOOTERS (statistics only — no data
pass), written LAST as the commit point (the checkpoint.py manifest
rule, so a killed write is re-runnable and never half-trusted).

Read shape: ``read_pruned`` consults the manifest, opens only
intersecting ranges, and (belt and braces) re-applies the predicate as
a scan-level pyarrow filter inside the kept ranges. Reference parity:
GUAC's backends index nouns by key in the DB; this is the same
point-lookup story re-expressed for Parquet-native storage
(SURVEY §1.6).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

__all__ = ["write_clustered", "read_pruned", "prune_plan"]

MANIFEST = "_zonemap.json"


def write_clustered(
    ds: Dataset,
    out_dir: str,
    by_col: str,
    num_ranges: int = 32,
) -> dict:
    """Cluster ``ds`` into ``num_ranges`` equal-row value ranges on
    int64 ``by_col`` and write ``out_dir/_range=K/*.parquet`` plus the
    zone-map manifest. Returns the manifest dict."""
    from guac_ray.functions.quantiles import exact_quantiles

    import pyarrow.parquet as pq

    if num_ranges < 1:
        raise ValueError("write_clustered: num_ranges must be >= 1")
    qs = {f"q{i}": i / num_ranges for i in range(1, num_ranges)}
    bounds = np.array([], dtype="int64")
    if qs:
        qt = exact_quantiles(ds, by_col, qs)
        if not qt.empty:
            bounds = np.unique(
                qt.iloc[0][list(qs)].to_numpy().astype("int64"))

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        v = df[by_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"write_clustered: {by_col!r} must be int64 (use the "
                f"cents trick for floats), got {v.dtype}")
        df["_range"] = np.searchsorted(
            bounds, v, side="right").astype("int64")
        return df

    # a rerun (killed write, or re-clustering updated data) must not
    # APPEND a second generation of uniquely-named files that the
    # manifest would count as live rows — clear stale range dirs first;
    # the manifest stays the commit point for readers either way
    import shutil

    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            fp = os.path.join(out_dir, name)
            if name.startswith("_range="):
                shutil.rmtree(fp, ignore_errors=True)
            elif name == MANIFEST:
                try:
                    os.remove(fp)
                except OSError:
                    pass
    ds.map_batches(route, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["_range"])

    # manifest from parquet FOOTER statistics only — no data pass
    ranges = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("_range="):
            continue
        rid = int(name.split("=", 1)[1])
        mn, mx, rows = None, None, 0
        for f in sorted(os.listdir(os.path.join(out_dir, name))):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(
                os.path.join(out_dir, name, f)).metadata
            rows += md.num_rows
            ci = md.schema.to_arrow_schema().names.index(by_col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        "write_clustered: parquet statistics missing "
                        f"for {by_col!r} — zone map would be blind")
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
        ranges.append({"range": rid, "dir": name, "min": int(mn),
                       "max": int(mx), "rows": rows})
    ranges.sort(key=lambda r: r["range"])  # numeric, not lexicographic
    manifest = {"by_col": by_col,
                "bounds": [int(b) for b in bounds],
                "ranges": ranges}
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))  # commit point
    return manifest


def prune_plan(out_dir: str, lo: int, hi: int) -> dict:
    """Which range dirs does [lo, hi] (inclusive) touch? Returns
    {"read": [dirs], "skipped": n, "total": n, "rows_read_bound": n}
    — the plan, separated from the read so tests and the CLI can
    assert on pruning without consuming data."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        m = json.load(f)
    keep, rows = [], 0
    for r in m["ranges"]:
        if r["max"] >= lo and r["min"] <= hi:
            keep.append(r["dir"])
            rows += r["rows"]
    return {"read": keep, "skipped": len(m["ranges"]) - len(keep),
            "total": len(m["ranges"]), "rows_read_bound": rows,
            "by_col": m["by_col"]}


def read_pruned(
    out_dir: str,
    lo: int,
    hi: int,
    columns: list[str] | None = None,
) -> "Dataset":
    """Dataset over ONLY the ranges intersecting [lo, hi], with the
    exact predicate re-applied as a scan-level pyarrow filter (zone
    maps admit whole ranges; the filter trims the edges). An empty
    plan returns a typed empty Dataset from the manifest's schema."""
    import pyarrow.dataset as pds  # noqa: F401 (expression support)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    plan = prune_plan(out_dir, lo, hi)
    by_col = plan["by_col"]
    if not plan["read"]:
        first = None
        with open(os.path.join(out_dir, MANIFEST)) as f:
            m = json.load(f)
        for r in m["ranges"]:
            d = os.path.join(out_dir, r["dir"])
            fs = [x for x in os.listdir(d) if x.endswith(".parquet")]
            if fs:
                first = os.path.join(d, fs[0])
                break
        if first is None:
            return rd.from_arrow(pa.schema([]).empty_table())
        sch = pq.read_schema(first).remove_metadata()
        if columns:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())
    # expand to files: Ray's read_parquet takes a LIST of file paths
    # (a list of directories is not expanded)
    paths = [os.path.join(out_dir, d, f)
             for d in plan["read"]
             for f in sorted(os.listdir(os.path.join(out_dir, d)))
             if f.endswith(".parquet")]
    expr = (pc.field(by_col) >= lo) & (pc.field(by_col) <= hi)
    return rd.read_parquet(paths, columns=columns, filter=expr)
