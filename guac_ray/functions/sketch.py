"""Distributed cardinality sketches: HyperLogLog distinct counting.

The public HLL construction (Flajolet et al. 2007): hash each value to
64 bits, use the top ``p`` bits as a register index (m = 2^p registers)
and the position of the first set bit of the remainder as the register
value (max); estimate = alpha_m · m² / Σ 2^-reg with the standard
small-range (linear counting) correction. Standard error ≈ 1.04/√m
(~1.6 % at p=12, 4 KB per sketch).

Ray shape: each ``map_batches`` task folds its batch into ONE register
array and emits it as a single binary row — the shuffle carries
O(blocks) × 2^p bytes, never the values. Register arrays merge by
elementwise max (associative/commutative/idempotent), so grouped
variants just group the partial rows and max-reduce. This is the sketch
analog of ``grouped_agg``'s partial-combine discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas

from ray.data import Dataset

__all__ = ["hll_fold", "hll_merge", "hll_estimate", "approx_ndistinct",
           "approx_ndistinct_grouped", "heavy_hitters", "hdr_quantiles", "hdr_quantiles_grouped"]

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def _hash64(values: pd.Series) -> np.ndarray:
    """Stable 64-bit hashes (pandas siphash with its fixed default key —
    identical across processes)."""
    return pd.util.hash_pandas_object(
        values.astype(str), index=False, categorize=False
    ).to_numpy().astype(np.uint64)


def _rho(w: np.ndarray, max_bits: int) -> np.ndarray:
    """Position (1-based) of the first set bit scanning the TOP
    ``max_bits`` bits of the 64-bit value ``w`` from the MSB;
    max_bits+1 when all scanned bits are zero. Vectorized mask-compare
    loop — exact, no float log tricks. (The hash remainder sits in the
    HIGH bits after ``h << p``.)"""
    out = np.full(w.shape, max_bits + 1, dtype=np.uint8)
    found = np.zeros(w.shape, dtype=bool)
    for i in range(max_bits):
        bit = (w >> np.uint64(63 - i)) & np.uint64(1)
        hit = (~found) & (bit == 1)
        out[hit] = i + 1
        found |= hit
    return out


def hll_fold(values: pd.Series, p: int = 12) -> np.ndarray:
    """Fold a value series into a fresh 2^p register array (uint8).
    NULLs are excluded BEFORE hashing (SQL ``COUNT(DISTINCT)``
    semantics — ``astype(str)`` would otherwise hash NaN/None as the
    literal strings 'nan'/'None' and count NULL as a distinct value,
    colliding with any real 'nan' string to boot)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    values = values[~values.isna()]
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    rho = _rho(w, 64 - p)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(blobs: list[bytes], p: int = 12) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for b in blobs:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:                      # small-range correction
        zeros = int((regs == 0).sum())
        if zeros:
            return m * float(np.log(m / zeros))
    return float(est)


def approx_ndistinct(ds: Dataset, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) over the whole Dataset."""

    def partial(df: pd.DataFrame) -> pa.Table:
        return pa.table({"regs": pa.array([hll_fold(df[col], p).tobytes()],
                                          type=pa.binary())})

    blobs = [r["regs"] for r in
             ds.map_batches(partial, batch_format="pandas").take_all()]
    return hll_estimate(hll_merge(blobs, p))


def approx_ndistinct_grouped(
    ds: Dataset, key_cols: list[str], col: str, p: int = 12,
    num_buckets: int = 8, out_col: str = "approx_n",
) -> Dataset:
    """Approximate per-key distinct counts: per-batch per-key register
    partials → coarse-bucketed groupby → per-key max-merge + estimate.
    The shuffle carries one 2^p-byte blob per (key, block)."""
    from guac_ray.stages.assemble import stable_hash

    def _typed_empty(df: pd.DataFrame) -> pa.Table:
        # an empty pandas batch must still emit TYPED columns: letting
        # from_pandas infer null-typed regs/key columns breaks Arrow
        # schema unification against the binary-typed non-empty blocks
        # (same guard family as grouped_agg / events_sliding)
        fields = []
        for k in key_cols:
            t = pa.Array.from_pandas(df[k]).type if k in df else pa.string()
            if pa.types.is_null(t):
                t = pa.string()
            fields.append((k, t))
        fields += [("regs", pa.binary()), ("_bucket", pa.int64())]
        return pa.schema(fields).empty_table()

    def partial(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _typed_empty(df)
        keys, blobs = [], []
        for k, sub in df.groupby(key_cols, sort=False):
            keys.append(k if isinstance(k, tuple) else (k,))
            blobs.append(hll_fold(sub[col], p).tobytes())
        out = pd.DataFrame(keys, columns=key_cols)
        out["regs"] = blobs
        out["_bucket"] = (stable_hash(out, key_cols) % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def final(g: pd.DataFrame) -> pa.Table:
        rows = []
        for k, sub in g.groupby(key_cols, sort=False):
            est = hll_estimate(hll_merge(list(sub["regs"]), p))
            rows.append((k if isinstance(k, tuple) else (k,)) + (est,))
        out = pd.DataFrame(rows, columns=key_cols + [out_col])
        return table_from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
    )


def heavy_hitters(
    ds: Dataset,
    col: str,
    k: int,
    num_buckets: int = 16,
    candidate_cap: int = 5_000_000,
) -> Dataset:
    """EXACT heavy hitters — items whose count strictly exceeds
    ``total_rows / k`` — in two streaming passes (the sketch-then-verify
    discipline; cf. Misra–Gries 1982 / space-saving summaries).

    Pass 1 (candidate sketch): each batch emits the items whose BATCH
    count exceeds ``batch_rows / k`` — at most k-1 items per batch, via
    one vectorized ``value_counts`` — plus a row carrying the batch row
    count. Pigeonhole guarantee: if ``count(x)·k > Σ nᵢ`` then
    ``countᵢ(x)·k > nᵢ`` for at least one batch i, so the union of
    per-batch candidates is a SUPERSET of every true heavy hitter (the
    converse doesn't hold — locally-hot items are pruned by pass 2).

    Pass 2 (exact verify): the deduped candidate set is broadcast once
    (``ray.put``; size-guarded by ``candidate_cap`` — it is bounded by
    (k-1)·num_batches but in practice vocabulary-sized), the input is
    re-scanned with a candidate filter, and exact grouped counts keep
    items with ``count·k > total``. All comparisons are integer —
    the result equals ``GROUP BY col HAVING count(*)*k > total`` —
    at the cost of two column-pruned scans and a candidate-sized
    (not corpus-sized) shuffle. Item values are returned as STRINGS
    (the sketch normalizes through str for dtype-generic set
    membership).
    """
    import ray

    from guac_ray.stages.groupagg import grouped_agg

    if k < 2:
        raise ValueError("k must be >= 2 (threshold = total/k)")

    def sketch(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        vc = df[col].value_counts()
        cand = vc[vc.to_numpy() * k > n]
        items = cand.index.astype(str).tolist()
        return pa.table({
            "item": pa.array(items + [None], type=pa.string()),
            "rows": pa.array([0] * len(items) + [n], type=pa.int64()),
        })

    summary = ds.select_columns([col]).map_batches(
        sketch, batch_format="pandas").to_pandas()
    total = int(summary["rows"].sum())
    cands = set(summary["item"].dropna())
    if len(cands) > candidate_cap:
        raise ValueError(
            f"candidate set ({len(cands)}) exceeds candidate_cap "
            f"({candidate_cap}); raise the cap or lower k")
    cref = ray.put(frozenset(cands))

    def exact_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].astype(str)  # one conversion, reused by filter+count
        g = s[s.isin(ray.get(cref))].value_counts().reset_index()
        g.columns = [col, "_n"]
        return g

    agg = grouped_agg(
        ds.select_columns([col]).map_batches(exact_partial, batch_format="pandas"),
        [col], {"n": ("_n", "sum")}, num_buckets=num_buckets,
    )

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["n"].to_numpy() * k > total]
        return pd.DataFrame({col: out[col], "n": out["n"].astype("int64")})

    return agg.map_batches(threshold, batch_format="pandas")


def hdr_quantiles(
    ds: Dataset,
    value_col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
    m: int = 64,
    num_buckets: int = 4,
) -> "pa.Table":
    """HDR-histogram quantile SKETCH — the relative-error, mergeable
    quantile estimator that is the documented scale path past the
    exact machinery's ``distinct_cap`` (functions/quantiles.py raises
    when distinct values exceed the histogram-exchange budget; this
    sketch's state is bounded by 54·m buckets REGARDLESS of data,
    so it holds at any cardinality). Values bucket by
    (e = floor(log2 v), sub = ((v − 2ᵉ)·m) >> e): base-2 exponent
    levels with ``m`` linear sub-buckets each — the HdrHistogram /
    DDSketch layout with INTEGER-EXACT bucketing (no float log, so
    bucket assignment is bit-identical on any engine; DuckDB spells
    the exponent as ``length(bin(v)) − 1``). The per-percentile
    estimate is the LOWER BOUND of the first bucket whose cumulative
    count reaches rank ⌈pct·n/100⌉ — an underestimate by strictly
    less than a factor 1/m of the true value (v ≥ 2ᵉ and bucket width
    2ᵉ/m), i.e. guaranteed relative error < 1/m.

    Unlike KLL/t-digest, the sketch is a pure COUNT TABLE: merging is
    integer addition, so the result is deterministic under ANY
    partitioning or merge order — the house bit-exactness contract —
    and the suite's ``events_hdr_quantiles`` carries a full SQL
    oracle (approximate in VALUE, exact as an ALGORITHM).

    Output: one row per pct — (pct, rank, est), all int64.
    Constraints: values must be NONNEGATIVE ints < 2⁵³ (the numpy
    frexp exactness window; cents-scale data is far inside), m in
    [2, 1024]; both guarded loudly. v = 0 gets its own (e = −1)
    bucket with lower bound 0.

    Shape: one streaming bucket map feeding the two-phase aggregate
    at (e, sub) grain — shuffle is ≤ 54·m partial rows per block; the
    driver folds a constant-size table."""
    from guac_ray.stages.groupagg import grouped_agg

    if not (2 <= m <= 1024):
        raise ValueError(f"hdr_quantiles: m must be in [2, 1024], got {m}")
    for p_ in pcts:
        if not (1 <= int(p_) <= 100):
            raise ValueError(
                f"hdr_quantiles: pcts must be integer percents in "
                f"[1, 100], got {p_}")

    def to_bucket(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        v = df[value_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"hdr_quantiles: {value_col!r} must be integer (use "
                f"the cents trick for floats), got {v.dtype}")
        v = v.astype(np.int64)
        if len(v) and v.min() < 0:
            raise ValueError(
                "hdr_quantiles: negative values — relative-error "
                "buckets need v >= 0; shift or split the series")
        if len(v) and v.max() >= (1 << 53):
            raise ValueError(
                "hdr_quantiles: values >= 2^53 leave the exact "
                "float64-exponent window; rescale first")
        # exact integer floor(log2): float64 conversion is exact
        # below 2^53, so frexp's exponent is exact
        e = np.frexp(v.astype(np.float64))[1].astype(np.int64) - 1
        e[v == 0] = -1
        sub = np.zeros(len(v), dtype=np.int64)
        pos = v > 0
        ve, ee = v[pos], e[pos]
        sub[pos] = ((ve - (np.int64(1) << ee)) * m) >> ee
        g = (pd.DataFrame({"e": e, "sub": sub})
             .groupby(["e", "sub"], sort=False)
             .size().rename("c").reset_index())
        g["c"] = g["c"].astype("int64")
        return pa.table({"e": pa.array(g["e"]),
                         "sub": pa.array(g["sub"]),
                         "c": pa.array(g["c"])})

    import pyarrow as pa

    hist = grouped_agg(
        ds.map_batches(to_bucket, batch_format="pandas"),
        ["e", "sub"], {"n": ("c", "sum")},
        num_buckets=num_buckets).to_pandas()
    if hist.empty:
        return pa.schema([("pct", pa.int64()), ("rank", pa.int64()),
                          ("est", pa.int64())]).empty_table()
    hist = hist.sort_values(["e", "sub"]).reset_index(drop=True)
    cum = hist["n"].cumsum().to_numpy()
    n_total = int(cum[-1])
    ee = hist["e"].to_numpy()
    ss = hist["sub"].to_numpy()
    lower = np.where(
        ee < 0, np.int64(0),
        (np.int64(1) << np.maximum(ee, 0))
        + ((ss << np.maximum(ee, 0)) // m))
    rows = []
    for p_ in pcts:
        rank = (int(p_) * n_total + 99) // 100  # ceil(pct*n/100)
        idx = int(np.searchsorted(cum, rank, side="left"))
        rows.append({"pct": int(p_), "rank": rank,
                     "est": int(lower[idx])})
    out = pd.DataFrame(rows)
    return pa.table({"pct": pa.array(out["pct"], pa.int64()),
                     "rank": pa.array(out["rank"], pa.int64()),
                     "est": pa.array(out["est"], pa.int64())})


def hdr_quantiles_grouped(
    ds: Dataset,
    key_col: str,
    value_col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
    m: int = 64,
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """PER-KEY HDR quantile sketch — ``hdr_quantiles`` grouped by a
    key (per-user p99 latency, per-domain p50 doc length) at UNBOUNDED
    key cardinality: per-key state is ≤ 54·m buckets and the whole
    reduction is counts, so it distributes as one key-hash exchange of
    (key, e, sub, n) partials — in-batch combined first, the
    grouped_agg discipline — with the per-bucket finalize a single
    vectorized cumsum + searchsorted over each key's sorted buckets.
    Same integer-exact bucketing, lower-bound estimate, and < 1/m
    relative-error guarantee as the global sketch; deterministic under
    any partitioning. Output: one row per (key, pct) —
    ``(key_col, pct, rank, est)``, all value columns int64."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    import pyarrow as pa
    import ray.data as rd

    if not (2 <= m <= 1024):
        raise ValueError(
            f"hdr_quantiles_grouped: m must be in [2, 1024], got {m}")
    for p_ in pcts:
        if not (1 <= int(p_) <= 100):
            raise ValueError(
                f"hdr_quantiles_grouped: pcts must be integer percents "
                f"in [1, 100], got {p_}")
    pct_arr = np.asarray(sorted(int(p_) for p_ in pcts), dtype=np.int64)

    def to_bucket(df: pd.DataFrame) -> "pa.Table":
        v = df[value_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"hdr_quantiles_grouped: {value_col!r} must be integer "
                f"(use the cents trick for floats), got {v.dtype}")
        v = v.astype(np.int64)
        if len(v) and v.min() < 0:
            raise ValueError(
                "hdr_quantiles_grouped: negative values — "
                "relative-error buckets need v >= 0")
        if len(v) and v.max() >= (1 << 53):
            raise ValueError(
                "hdr_quantiles_grouped: values >= 2^53 leave the "
                "exact float64-exponent window; rescale first")
        e = np.frexp(v.astype(np.float64))[1].astype(np.int64) - 1
        e[v == 0] = -1
        sub = np.zeros(len(v), dtype=np.int64)
        pos = v > 0
        ve, ee = v[pos], e[pos]
        sub[pos] = ((ve - (np.int64(1) << ee)) * m) >> ee
        g = (pd.DataFrame({key_col: df[key_col].to_numpy(),
                           "e": e, "sub": sub})
             .groupby([key_col, "e", "sub"], sort=False, dropna=False)
             .size().rename("c").reset_index())
        g["c"] = g["c"].astype("int64")
        g["_bucket"] = (stable_hash(g, [key_col])
                        % num_buckets).astype("int64")
        return table_from_pandas(g, preserve_index=False)

    def reduce_fn(t: "pa.Table") -> "pa.Table":
        df = (t.to_pandas()
              .groupby([key_col, "e", "sub"], sort=False,
                       dropna=False)["c"].sum().reset_index()
              .sort_values([key_col, "e", "sub"], kind="mergesort")
              .reset_index(drop=True))
        k = df[key_col].to_numpy()
        n = len(k)
        new_key = np.ones(n, dtype=bool)
        # NULL keys are ONE SQL group: a bare k[1:] != k[:-1] is True
        # for consecutive NaNs (NaN != NaN), fragmenting the null key
        # into one garbage quantile row per bucket — mask NaN-vs-NaN
        # comparisons back to "same key" (sort_values groups them)
        na = pd.isna(k)
        new_key[1:] = (k[1:] != k[:-1]) & ~(na[1:] & na[:-1])
        starts = np.flatnonzero(new_key)
        ends = np.append(starts[1:], n)
        c = df["c"].to_numpy()
        cs = np.cumsum(c)
        base = np.where(new_key, cs - c, 0)
        cum = cs - np.maximum.accumulate(base)  # per-key running count
        totals = cum[ends - 1]                  # per-key n
        ee = df["e"].to_numpy()
        ss = df["sub"].to_numpy()
        lower = np.where(
            ee < 0, np.int64(0),
            (np.int64(1) << np.maximum(ee, 0))
            + ((ss << np.maximum(ee, 0)) // m))
        rows_k, rows_p, rows_r, rows_e = [], [], [], []
        for p_ in pct_arr:
            ranks = (p_ * totals + 99) // 100
            # first bucket index within each key whose cum >= rank:
            # searchsorted per key over its slice, vectorized across
            # keys via the global cumsum offsets (rank is per-key, so
            # probe base + rank in the running-count space)
            glob_target = ranks + (cs[starts] - c[starts])
            idx = np.searchsorted(cs, glob_target, side="left")
            rows_k.append(k[starts])
            rows_p.append(np.full(len(starts), p_, dtype=np.int64))
            rows_r.append(ranks.astype(np.int64))
            rows_e.append(lower[idx].astype(np.int64))
        out = pd.DataFrame({
            key_col: np.concatenate(rows_k),
            "pct": np.concatenate(rows_p),
            "rank": np.concatenate(rows_r),
            "est": np.concatenate(rows_e)})
        return table_from_pandas(out, preserve_index=False)

    out = fs_exchange_reduce(
        ds.select_columns([key_col, value_col]).map_batches(
            to_bucket, batch_format="pandas"),
        exchange_base or default_exchange("hdrg"), reduce_fn)
    if out is None:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}
        kt = types.get(key_col)
        kt = kt if isinstance(kt, pa.DataType) else pa.string()
        return rd.from_arrow(pa.schema(
            [(key_col, kt), ("pct", pa.int64()),
             ("rank", pa.int64()), ("est", pa.int64())]).empty_table())
    return out
