"""Grouped feature scaling: z-score standardization and min-max
normalization of an integer column, per group — the feature-prep step
in front of model training / embedding quantization.

Exactness discipline: the input column is INTEGER (the repo's
integer-cents trick), so the group statistics (sum, sum-of-squares,
count, min, max) are exact int64; the per-row float expression is then
evaluated in ONE fixed operation order —

    z  = (v - s/n) / sqrt((q - (s*s)/n) / n)        (population std)
    mm = (v - mn) / (mx - mn)

— each IEEE op of which is deterministic, so a SQL oracle spelling the
IDENTICAL expression tree reproduces the doubles bit-for-bit.
Zero-variance groups (mn == mx, an exact integer test — never the
overflow-prone n*q == s*s) yield 0.0 in both engines instead of a
NaN/NULL divergence.

Scale shape: one bucketed two-phase aggregate over the data (no sort),
then the small per-group stats table joins back — broadcast while the
group cardinality is under ``broadcast_limit``, else a large-large
hash join through the filesystem exchange. The data itself is touched
exactly twice, both times as a streaming map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas

__all__ = ["feature_scale", "winsorize", "percentile_rank"]


def feature_scale(
    ds: Dataset,
    by: list[str] | str,
    col: str,
    out_z: str = "z",
    out_mm: str = "mm",
    num_buckets: int = 16,
    broadcast_limit: int = 100_000,
    exchange_base: str | None = None,
) -> Dataset:
    """Append per-group z-score (``out_z``) and min-max (``out_mm``)
    columns for integer column ``col``, grouped by ``by``."""
    import ray

    from guac_ray.stages.groupagg import grouped_agg

    by = [by] if isinstance(by, str) else list(by)
    clash = {out_z, out_mm} & ({col} | set(by))
    if clash or out_z == out_mm:
        raise ValueError(f"feature_scale: output names collide: {clash}")

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"feature_scale: {col!r} must be integer (use the cents "
                f"trick for floats), got {v.dtype}")
        # int64 BEFORE multiplying: a parquet-born int32 column passes
        # the integer check but v*v wraps at ~46341² in its native width
        v = v.astype(np.int64)
        return df.assign(_sq=v * v)

    stats = grouped_agg(
        ds.map_batches(sq, batch_format="pandas"), by,
        {"_s": (col, "sum"), "_q": ("_sq", "sum"), "_n": (col, "count"),
         "_mn": (col, "min"), "_mx": (col, "max")},
        num_buckets=num_buckets).materialize()

    def apply_stats(df: pd.DataFrame) -> pa.Table:
        vf = df[col].to_numpy().astype("float64")
        sf = df["_s"].to_numpy().astype("float64")
        nf = df["_n"].to_numpy().astype("float64")
        qf = df["_q"].to_numpy().astype("float64")
        mn = df["_mn"].to_numpy()
        mx = df["_mx"].to_numpy()
        const = mn == mx
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (vf - sf / nf) / np.sqrt((qf - (sf * sf) / nf) / nf)
            mm = (df[col].to_numpy() - mn).astype("float64") \
                / (mx - mn).astype("float64")
        out = df.drop(columns=["_s", "_q", "_n", "_mn", "_mx"])
        out[out_z] = np.where(const, 0.0, z)
        out[out_mm] = np.where(const, 0.0, mm)
        return table_from_pandas(out, preserve_index=False)

    if stats.count() <= broadcast_limit:
        small = stats.to_pandas()
        ref = ray.put(small)

        class Scale:
            def __init__(self):
                self.stats = ray.get(ref)

            def __call__(self, df: pd.DataFrame) -> pa.Table:
                # LEFT merge: rows with a null group key (dropped by the
                # aggregate) must not vanish from an append-columns
                # transform — they come back with NaN z/mm instead
                return apply_stats(df.merge(self.stats, on=by, how="left"))

        return ds.map_batches(Scale, batch_format="pandas",
                              concurrency=(1, 4))

    from guac_ray.functions.joins import default_exchange, hash_join

    joined = hash_join(
        ds, stats, on=by, how="left",
        exchange_dir=exchange_base or default_exchange("featscale"),
        num_buckets=num_buckets)
    return joined.map_batches(apply_stats, batch_format="pandas")


def winsorize(
    ds: Dataset,
    col: str,
    lo: float,
    hi: float,
    by: list[str] | str | None = None,
    out: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Winsorization: clip ``col`` to its exact [lo, hi] quantiles,
    optionally per group — the outlier-taming companion of
    ``feature_scale``. Quantiles come from the distributed exact
    quantile operator (functions/quantiles.py — sample → range-bucket
    counts → one filtered refinement, ``quantile_disc`` rank rule), so
    the clip bounds are ACTUAL data values and integer columns stay
    integers; the per-group bounds frame is driver-sized by that
    operator's contract and broadcasts once. One streaming pass over
    the data after the quantile pass.

    ``out`` defaults to ``{col}_w`` (the original column is kept).

    Rows whose group has no bounds — a null ``by`` key, or a group whose
    ``col`` is entirely NaN (both invisible to the quantile pass) — are
    KEPT with ``out`` = the unclipped value: an append-columns transform
    must never silently drop input rows."""
    import ray

    from guac_ray.functions.quantiles import exact_quantiles

    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"winsorize: need 0 <= lo <= hi <= 1, "
                         f"got ({lo}, {hi})")
    by = [by] if isinstance(by, str) else list(by or [])
    out = out or f"{col}_w"
    if out in set(by) | {col}:
        raise ValueError(f"winsorize: output name {out!r} collides")

    bounds = exact_quantiles(ds, col, {"_qlo": lo, "_qhi": hi}, by=by,
                             num_buckets=num_buckets)
    ref = ray.put(bounds)

    class Clip:
        def __init__(self):
            self.bounds = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            if by:
                m = df.merge(self.bounds, on=by, how="left")
            elif len(self.bounds):
                m = df.assign(_qlo=self.bounds["_qlo"].iloc[0],
                              _qhi=self.bounds["_qhi"].iloc[0])
            else:  # empty input: no bounds, nothing to clip
                m = df.assign(_qlo=np.nan, _qhi=np.nan)
            v = m[col].to_numpy()
            qlo = m["_qlo"].to_numpy()
            qhi = m["_qhi"].to_numpy()
            has = ~(pd.isna(qlo) | pd.isna(qhi))
            clipped = np.minimum(np.maximum(v, qlo), qhi)
            m[out] = np.where(has, clipped, v).astype(v.dtype)
            return table_from_pandas(m.drop(columns=["_qlo", "_qhi"]),
                                     preserve_index=False)

    return ds.map_batches(Clip, batch_format="pandas", concurrency=(1, 4))


def _lookup_below(vals: np.ndarray, below: np.ndarray,
                  vn: np.ndarray) -> np.ndarray:
    """Map each value to its #strictly-below count via the sorted
    pass-1 histogram. Every input value must EXIST in that histogram; a
    miss means the input re-executed non-deterministically between the
    two scans (non-replay-stable lineage — the same contract text.py's
    ``_require_known_tokens`` enforces). Without the check a novel
    value silently takes a NEIGHBOR's below-count (wrong rank), and a
    value above the histogram max indexes past the array end."""
    idx = np.minimum(np.searchsorted(vals, vn), len(vals) - 1)
    bad = vals[idx] != vn
    if bad.any():
        raise ValueError(
            f"percentile_rank: value {vn[bad.argmax()]!r} absent from "
            "the histogram pass — the input Dataset must be "
            "replay-stable between the histogram scan and the ranking "
            "scan")
    return below[idx]


def percentile_rank(
    ds: "Dataset",
    value_col: str,
    keep_cols: list[str] | None = None,
    scale: int = 1_000_000,
    num_buckets: int = 16,
    distinct_cap: int = 20_000_000,
) -> "Dataset":
    """GLOBAL percent-rank of an integer column WITHOUT a global sort —
    the scale path for whole-dataset ranking: ``pr_fp = scale ·
    (#rows strictly below) // (n − 1)``, fixed-point floor division on
    int64 so every engine reproduces it bit-for-bit (ties share a rank
    exactly as SQL ``percent_rank`` does, since #strictly-below equals
    ``rank() − 1``).

    Shape: one bucketed two-phase count per DISTINCT value (the
    exchange carries distinct-value × blocks partial rows, never the
    data), the small value histogram sorts on the driver
    (size-guarded by ``distinct_cap`` — beyond it, range-bucket the
    histogram like quantiles.py instead), cumulative counts broadcast
    once via ``ray.put``, and pass 2 is a pure vectorized map. The
    data is touched exactly twice, both as streaming maps; nothing
    data-scale moves or sorts. Single-row inputs get ``pr_fp = 0``
    (SQL's percent_rank would divide by zero there).
    """
    import ray

    from guac_ray.stages.groupagg import grouped_agg

    def cnt(df: pd.DataFrame) -> pa.Table:
        out = df.groupby(value_col, sort=False).size().reset_index(name="c")
        return table_from_pandas(out, preserve_index=False)

    hist = grouped_agg(
        ds.select_columns([value_col]).map_batches(cnt, batch_format="pandas"),
        [value_col], {"n": ("c", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    if len(hist) > distinct_cap:
        raise ValueError(
            f"distinct values ({len(hist)}) exceed distinct_cap "
            f"({distinct_cap}); range-bucket the histogram (quantiles.py "
            "pattern) for ultra-wide domains")
    if hist.empty:
        # typed empty DATASET (the non-empty path returns a Dataset, and
        # keep_cols must carry their INPUT types — an int64 guess for a
        # string column breaks any downstream schema unification)
        import ray.data as rd

        from guac_ray.arrowutil import arrow_type_of

        sch = ds.schema()
        tmap = ({nm: arrow_type_of(t)
                 for nm, t in zip(sch.names, sch.types)}
                if sch is not None else {})
        fields = [(c, tmap[c] if tmap.get(c) is not None else pa.int64())
                  for c in (keep_cols or [])]
        fields += [(value_col, pa.int64()), ("pr_fp", pa.int64())]
        return rd.from_arrow(pa.schema(fields).empty_table())
    hist = hist.sort_values(value_col)
    counts = hist["n"].to_numpy().astype(np.int64)
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    n_total = int(counts.sum())
    # two sorted int64 arrays, not a dict: the histogram can approach
    # data-cardinality (near-unique values), and searchsorted keeps the
    # broadcast compact and the per-batch lookup one vectorized pass
    bref = ray.put((hist[value_col].to_numpy().astype(np.int64), below))

    class Ranker:
        def __init__(self):
            self.vals, self.below_arr = ray.get(bref)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            v = df[value_col].astype("int64")
            cb = _lookup_below(self.vals, self.below_arr, v.to_numpy())
            pr = ((scale * cb) // (n_total - 1) if n_total > 1
                  else np.zeros(len(df), dtype=np.int64))
            cols = {c: df[c] for c in (keep_cols or [])}
            cols[value_col] = v
            cols["pr_fp"] = pr.astype("int64") if n_total > 1 else pr
            return table_from_pandas(pd.DataFrame(cols),
                                     preserve_index=False)

    return ds.map_batches(Ranker, batch_format="pandas",
                          concurrency=(1, 4))
