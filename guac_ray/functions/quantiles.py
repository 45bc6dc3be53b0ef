"""Distributed EXACT quantiles (global and grouped).

The reference has no quantile operator (SURVEY.md §2.7: no sampling, no
sketches); a training-data pipeline needs percentiles constantly
(latency SLOs, length caps, score thresholds). Ray Data's built-in path
would be ``ds.sort(col)`` — a full all-to-all on 100 TB for a handful
of scalars. This module computes exact discrete quantiles (DuckDB
``quantile_disc`` semantics: 0-based rank ``ceil(p*n) - 1`` in EXACT
decimal arithmetic, per group) with three streaming passes and no
global sort:

  1. **sample** — a deterministic strided per-batch sample (no RNG, so
     reruns are identical) picks ``num_range_buckets`` range splitters.
     Splitter quality affects only pass-3 candidate size, never
     correctness.
  2. **count** — one pure-map pass assigns each row its range bucket
     (``np.searchsorted``); :func:`grouped_agg` sums (group, bucket)
     counts through the fs exchange. The driver sees only the
     G×B count table and computes, per requested quantile, which bucket
     holds the target rank and the within-bucket offset.
  3. **refine** — one filtered pass collects ONLY the values in needed
     (group, bucket) pairs (≈ n/B rows per quantile, ``candidate_cap``
     guarded); a local sort of each small candidate set yields the
     exact element.

Scale shape: passes 1–3 are map-only over the input; the only shuffle
is the count aggregation whose payload is (group, bucket, n) — bytes,
not data. Driver memory holds the count table plus ≤ ``candidate_cap``
scalars. Skewed value distributions concentrate candidates in one
bucket; raise ``num_range_buckets`` (cost: a wider count table) if the
cap trips.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas

from ray.data import Dataset

from guac_ray.stages.groupagg import grouped_agg

__all__ = ["exact_quantiles", "grouped_robust_stats"]


def _strided_sample(v: np.ndarray, k: int) -> np.ndarray:
    if len(v) <= k:
        return v
    step = max(1, len(v) // k)
    return v[::step][:k]


def exact_quantiles(
    ds: Dataset,
    col: str,
    qs: dict[str, float],
    by: list[str] | None = None,
    num_range_buckets: int = 512,
    sample_per_batch: int = 64,
    candidate_cap: int = 5_000_000,
    num_buckets: int = 16,
    interpolate: bool = False,
) -> pd.DataFrame:
    """Exact discrete quantiles of ``ds[col]``, optionally per ``by``
    group. ``qs`` maps output column name → quantile in [0, 1]. Returns
    a small pandas frame: ``by`` columns + one column per ``qs`` entry
    (the driver-sized result of a distributed computation, like every
    top-k in this engine). NaN values are excluded (SQL NULL
    semantics); rows with a null ``by`` key are excluded from the
    output (the two-phase aggregate drops null group keys).

    ``interpolate=True`` switches to DuckDB ``quantile_cont``
    semantics (empirically pinned): target rank ``h = p*(n-1)`` in
    DOUBLE arithmetic (unlike disc's exact-decimal rank — pinned the
    other way by a p=0.999 sweep where exact-decimal h picks a
    different frac in the last ulp), result ``lo*(1-f) + hi*f`` as
    DOUBLE where lo/hi are the order statistics at floor(h)/floor(h)+1
    and ``f = h - floor(h)`` — the probe at p=0.75 over {0.1, 0.3}
    distinguishes this lerp form (0.24999999999999997) from
    ``lo + (hi-lo)*f`` (0.25). Same three passes; a quantile needs at
    most one extra candidate rank."""
    by = list(by or [])
    proj = ds.select_columns(by + [col])

    def sample_batch(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)]
        return pa.table({col: _strided_sample(v, sample_per_batch)})

    sample = proj.map_batches(sample_batch, batch_format="pyarrow").to_pandas()
    if sample.empty:
        return pd.DataFrame(columns=by + list(qs))
    probe = np.linspace(0.0, 1.0, num_range_buckets + 1)[1:-1]
    splitters = np.unique(np.quantile(sample[col].to_numpy(), probe))

    def bucketize(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        keep = ~pd.isna(v)
        cols = {c: t[c].to_numpy(zero_copy_only=False)[keep] for c in by}
        cols["_qb"] = np.searchsorted(
            splitters, v[keep], side="right").astype("int64")
        return pa.table(cols)

    bucketed = proj.map_batches(bucketize, batch_format="pyarrow")
    counts = grouped_agg(bucketed, by + ["_qb"], {"n": ("_qb", "count")},
                         num_buckets=num_buckets).to_pandas()
    if counts.empty:
        return pd.DataFrame(columns=by + list(qs))

    # per group: locate each quantile's bucket + within-bucket offset
    def group_key(row) -> tuple:
        return tuple(row[c] for c in by)

    # (group..., qb) -> [(qname, offset, part)]; part ∈ val | lo | hi
    needed: dict[tuple, list[tuple[str, int, str]]] = {}
    group_rows: dict[tuple, dict] = {}
    fracs: dict[tuple, dict[str, float]] = {}
    counts = counts.sort_values(by + ["_qb"]) if by else counts.sort_values("_qb")
    for g, sub in (counts.groupby(by, sort=True) if by else [((), counts)]):
        g = g if isinstance(g, tuple) else (g,)
        qb = sub["_qb"].to_numpy()
        n_arr = sub["n"].to_numpy()
        cum = np.cumsum(n_arr)
        n = int(cum[-1])
        group_rows[g] = {}
        fracs[g] = {}

        def locate(r: int) -> tuple[int, int]:
            i = int(np.searchsorted(cum, r, side="right"))
            return int(qb[i]), r - (int(cum[i - 1]) if i > 0 else 0)

        for qname, p in qs.items():
            if interpolate:
                # quantile_cont: h = p*(n-1) in DOUBLE; lerp the two
                # straddling ranks with the double fractional part
                h = float(p) * (n - 1)
                r_lo = min(max(int(math.floor(h)), 0), n - 1)
                frac = h - r_lo
                fracs[g][qname] = frac
                b, off = locate(r_lo)
                needed.setdefault((*g, b), []).append((qname, off, "lo"))
                if frac > 0 and r_lo + 1 <= n - 1:
                    b2, off2 = locate(r_lo + 1)
                    needed.setdefault((*g, b2), []).append((qname, off2, "hi"))
                continue
            # DuckDB quantile_disc rank: ceil(p*n) - 1 computed in EXACT
            # arithmetic (a SQL literal like 0.55 is DECIMAL, not double
            # — empirically pinned: p=0.55, n=100 → index 54, while a
            # double ceil gives 55). Fraction(str(p)) recovers the
            # decimal the caller wrote from the Python float.
            r = int(math.ceil(Fraction(str(p)) * n)) - 1
            r = min(max(r, 0), n - 1)
            b, offset = locate(r)
            needed.setdefault((*g, b), []).append((qname, offset, "val"))

    import ray
    need_df = pd.DataFrame(
        [{**dict(zip(by, k[:-1])), "_qb": k[-1]} for k in needed])
    needed_ref = ray.put(need_df)

    def pick_candidates(df: pd.DataFrame) -> pa.Table:
        want = ray.get(needed_ref)
        df = df[~df[col].isna()].copy()
        df["_qb"] = np.searchsorted(
            splitters, df[col].to_numpy(), side="right").astype("int64")
        out = df.merge(want, on=by + ["_qb"], how="inner")[by + ["_qb", col]]
        return table_from_pandas(out, preserve_index=False)

    cand = proj.map_batches(pick_candidates, batch_format="pandas").to_pandas()
    if len(cand) > candidate_cap:
        raise MemoryError(
            f"exact_quantiles: {len(cand)} candidate rows exceed "
            f"candidate_cap={candidate_cap}; raise num_range_buckets "
            f"(currently {num_range_buckets}) to narrow the refinement")

    # one pass over candidates (not one filter per needed key); dropna=False
    # keeps SQL NULL-group semantics for null by-values
    grouped_vals: dict[tuple, np.ndarray] = {}
    if by:
        for key, sub in cand.groupby(by + ["_qb"], sort=False, dropna=False):
            grouped_vals[key] = np.sort(sub[col].to_numpy())
    else:
        for qb, sub in cand.groupby("_qb", sort=False):
            grouped_vals[(qb,)] = np.sort(sub[col].to_numpy())
    # replay-stability guard: pass 3 must see EXACTLY the rows pass 2
    # counted in each needed (group, bucket) — a non-deterministic
    # upstream re-execution (e.g. an unseeded sample) would otherwise
    # yield a bare KeyError/IndexError, or SILENTLY return a neighboring
    # order statistic when the bucket merely changed contents but kept
    # enough rows. Same contract scale._lookup_below enforces.
    if by:
        exp_df = counts.set_index(by + ["_qb"])["n"]
    else:
        exp_df = counts.set_index("_qb")["n"]
    parts: dict[tuple, dict[str, dict[str, float]]] = {}
    for key, picks in needed.items():
        g = key[:-1]
        vals = grouped_vals.get(key)
        expected = int(exp_df.get(key if by else key[-1], 0))
        if vals is None or len(vals) != expected:
            raise RuntimeError(
                f"exact_quantiles: candidate bucket {key!r} holds "
                f"{0 if vals is None else len(vals)} rows but the count "
                f"pass saw {expected} — the input Dataset must be "
                "replay-stable between the count scan and the refine "
                "scan (materialize() it, or seed the upstream sample)")
        for qname, offset, part in picks:
            if part == "val":
                group_rows[g][qname] = vals[offset]
            else:
                parts.setdefault(g, {}).setdefault(qname, {})[part] = vals[offset]
    for g, per_q in parts.items():
        for qname, pr in per_q.items():
            lo = float(pr["lo"])
            if "hi" in pr:
                f = fracs[g][qname]
                group_rows[g][qname] = lo * (1 - f) + float(pr["hi"]) * f
            else:
                group_rows[g][qname] = lo

    rows = []
    for g in sorted(group_rows):
        row = {c: val for c, val in zip(by, g)}
        row.update({qname: group_rows[g].get(qname) for qname in qs})
        rows.append(row)
    return pd.DataFrame(rows, columns=by + list(qs))


def grouped_robust_stats(
    ds,
    key_col: str,
    val_col: str,
    exchange_base: str | None = None,
    num_buckets: int = 16,
):
    """HIGH-cardinality grouped robust statistics — exact per-key
    median and MAD (median absolute deviation) when groups ≈ keys
    (users), where :func:`exact_quantiles`' histogram-exchange shape
    (built for FEW groups over MANY values) is wrong by design — the
    same argument as streams.gap_quantiles, here for value
    distributions rather than inter-arrival gaps. One key-hash fs
    exchange of 2 int64 columns co-locates each key's values; per
    bucket TWO vectorized sort + np.unique offset passes (median, then
    deviation median) compute every key's exact DuckDB
    ``quantile_disc`` ranks with no per-key Python loop. Output:
    (key_col, n, median, mad), all int64 — exact on any engine."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from guac_ray.arrowutil import table_from_pandas
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        kv = df[key_col].to_numpy()
        vv = df[val_col].to_numpy()
        # refuse non-integer dtypes LOUDLY (sibling discipline:
        # feature_scale.sq, grouped_corr.moments, shortest_paths): a
        # float key — usually a pandas NULL-upcast accident — would
        # TRUNCATE-merge distinct groups (1.9 and 1.2 → 1; NaN →
        # INT64_MIN) and float values would silently lose cents
        if not (np.issubdtype(kv.dtype, np.integer)
                and np.issubdtype(vv.dtype, np.integer)):
            raise TypeError(
                f"grouped_robust_stats: {key_col!r}/{val_col!r} must be "
                f"integer (cents trick for floats; drop NULL keys "
                f"upstream), got {kv.dtype}/{vv.dtype}")
        out = pd.DataFrame({
            key_col: kv.astype("int64"),
            "_v": vv.astype("int64"),
        })
        out["_bucket"] = (stable_hash(out, [key_col])
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = t["_v"].to_numpy(zero_copy_only=False)
        # pass 1: per-key exact disc median (rank ceil(n/2)-1, pure
        # integer arithmetic)
        o = np.lexsort((vals, keys))
        k, v = keys[o], vals[o]
        uniq, start, cnt = np.unique(k, return_index=True,
                                     return_counts=True)
        med = v[start + (cnt + 1) // 2 - 1]
        # pass 2: per-key disc median of |v - key's median|; re-sorting
        # by (key, dev) keeps the same key order and counts, so the
        # pass-1 group offsets stay valid
        dev = np.abs(v - np.repeat(med, cnt))
        d = dev[np.lexsort((dev, k))]
        mad = d[start + (cnt + 1) // 2 - 1]
        return pa.table({key_col: pa.array(uniq),
                         "n": pa.array(cnt.astype("int64")),
                         "median_cents": pa.array(med),
                         "mad_cents": pa.array(mad)})

    out = fs_exchange_reduce(
        ds.map_batches(add_bucket, batch_format="pandas"),
        exchange_base or default_exchange("grobust"), reduce_fn)
    if out is None:
        return rd.from_arrow(pa.schema(
            [(key_col, pa.int64()), ("n", pa.int64()),
             ("median_cents", pa.int64()),
             ("mad_cents", pa.int64())]).empty_table())
    return out
