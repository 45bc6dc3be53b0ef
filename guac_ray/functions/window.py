"""Partitioned window operators: lag/lead/row_number/cumsum per key, and
keep-latest compaction (the CDC/upsert primitive).

Ray Data has no window functions; the reference never needs them (graph
nouns are unordered). An events/training pipeline uses them constantly
(gap-to-previous features, dedup-keep-latest snapshots), so they get the
same treatment as every wide operator here:

- :func:`windowed` co-partitions rows by key through the filesystem
  exchange, sorts each bucket ONCE by (key, order...), and computes all
  requested window columns vectorized on the sorted frame (groupby
  shift / cumsum / cumcount — no per-row Python). The partitioning
  assumption: all rows of one key land in one bucket (hash-guaranteed);
  a single key's rows must fit one reduce task, the same contract as
  every PARTITION BY in a SQL engine's hash-windowing mode.
- :func:`keep_latest` is two-phase: a per-batch partial keeps each
  key's newest row (bounded rows into the shuffle — the combiner), then
  the per-bucket reduce keeps the global newest. Ties break by the last
  ``order`` column ascending, so give it a unique tiebreaker (e.g. the
  event id) for a deterministic result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas

import ray.data as rd
from ray.data import Dataset

from guac_ray.functions.joins import default_exchange
from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

__all__ = ["windowed", "keep_latest"]

_OPS = ("lag", "lead", "row_number", "cumsum", "rank", "dense_rank",
        "ntile", "percent_rank", "cume_dist", "nth_value",
        "moving_sum", "moving_avg", "moving_min", "moving_max",
        "moving_count", "range_sum", "range_count",
        "first_value", "last_value")

_MOVING = ("moving_sum", "moving_avg", "moving_min", "moving_max",
           "moving_count")


def _typed_empty(ds: Dataset, ops: dict[str, tuple] | None = None) -> pa.Table:
    """Typed empty result for an empty input: input columns plus (for
    ``windowed``) the window columns — so downstream select_columns /
    map_batches keep working on the empty shape."""
    sch = ds.schema()
    if sch is None:
        return pa.schema([]).empty_table()
    fields = list(zip(sch.names, sch.types))
    types = dict(fields)
    for name in (ops or {}):
        if name in types:
            raise ValueError(
                f"windowed: output name {name!r} would overwrite an "
                "input column — rename the output")
    for name, spec in (ops or {}).items():
        if spec[0] in ("row_number", "rank", "dense_rank", "ntile",
                       "moving_count", "range_count"):
            fields.append((name, pa.int64()))
        elif spec[0] == "range_sum":
            # always float64, matching the non-empty path (which must
            # be able to represent an all-NULL frame as NaN): empty and
            # populated buckets may never disagree on schema
            fields.append((name, pa.float64()))
        elif (spec[0] in ("percent_rank", "cume_dist")
                or spec[0] in _MOVING):
            # pandas rolling always yields float64
            fields.append((name, pa.float64()))
        elif (spec[0] in ("lag", "lead", "nth_value")
                and pa.types.is_integer(types[spec[1]])):
            # match the non-empty path: pandas shift introduces NaN, so
            # integer sources come back as double there too
            fields.append((name, pa.float64()))
        else:  # cumsum / non-integer lag/lead inherit the source type
            fields.append((name, types[spec[1]]))
    return pa.schema(fields).empty_table()


def windowed(
    ds: Dataset,
    by: list[str] | str,
    order: list[str] | str,
    ops: dict[str, tuple],
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """SQL-window analog: for each output column name, ``ops`` maps to
    ``("lag", col[, k])`` / ``("lead", col[, k])`` (offset k, default 1,
    NULL at the edge), ``("row_number",)`` (1-based within key, in
    ``order``), ``("cumsum", col)`` (inclusive running sum),
    ``("rank",)`` / ``("dense_rank",)`` (SQL semantics over the full
    ``order`` tuple: ties share a rank; rank leaves gaps, dense_rank
    does not — both are functions of the order-key VALUE, so they are
    deterministic even when the order tuple has ties),
    ``("ntile", k)`` (SQL NTILE: the first n%k buckets get the extra
    row — POSITIONAL, so only deterministic under a tie-free order),
    ``("percent_rank",)`` ((rank-1)/(n-1), 0.0 for a single-row
    partition — tie-safe like rank), ``("cume_dist",)`` (tie-run max
    rank over n — tie-safe), ``("nth_value", col, k)`` (the k-th
    row's value over the WHOLE partition, NULL when it has fewer than
    k rows — positional like ntile), or the rolling family
    ``("moving_sum"|"moving_avg"|"moving_min"|"moving_max"|
    "moving_count", col, k)`` — SQL ``agg(col) OVER (... ROWS BETWEEN
    k-1 PRECEDING AND CURRENT ROW)`` over a NUMERIC column: NULLs are
    skipped like SQL aggregates (an all-NULL window yields NULL;
    moving_count yields 0). min/max/count are engine-exact; sum/avg
    use pandas' sliding-window summation, which is only bit-identical
    to a SQL oracle when the column is integer-valued (the repo's
    integer-cents discipline) — derive a cents column first for exact
    parity. Rows come back with all original columns plus the window
    columns; row order is not meaningful (as after any shuffle)."""
    by = [by] if isinstance(by, str) else list(by)
    order = [order] if isinstance(order, str) else list(order)
    for name, spec in ops.items():
        if spec[0] not in _OPS:
            raise ValueError(f"windowed: unknown op {spec[0]!r} for {name!r}")
        if spec[0] == "ntile" and (len(spec) < 2 or int(spec[1]) < 1):
            # SQL raises on NTILE(0); silent numpy //0 garbage must not
            # stand in for that
            raise ValueError(f"windowed: ntile requires k >= 1 for {name!r}")
        if spec[0] in _MOVING and (len(spec) < 3 or int(spec[2]) < 1):
            raise ValueError(
                f"windowed: {spec[0]} requires (op, col, k) with k >= 1 "
                f"for {name!r}")
        if spec[0] in ("range_sum", "range_count"):
            if len(spec) < 3:
                raise ValueError(
                    f"windowed: {spec[0]} requires (op, col, window) "
                    f"for {name!r}")
            if len(order) != 1:
                # validate EAGERLY (the reduce runs lazily in a task)
                raise ValueError(
                    f"windowed: {spec[0]} needs exactly one order column "
                    f"(RANGE frames are value-defined) for {name!r}")
    src_cols = {spec[1] for spec in ops.values()
                if len(spec) > 1
                and spec[0] in ("lag", "lead", "cumsum", "range_sum",
                                "range_count", "first_value",
                                "last_value", "nth_value") + _MOVING}
    shadowed = set(ops) & (src_cols | set(by) | set(order))
    if shadowed:
        # an output name equal to a column another op reads would make
        # that op consume the already-overwritten values
        raise ValueError(
            f"windowed: output name(s) {sorted(shadowed)} shadow input "
            f"columns used by the window — rename the outputs")

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["_bucket"] = (stable_hash(df, by) % num_buckets).astype("int64")
        return table_from_pandas(df, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(by + order, kind="mergesort")
        clash = set(ops) & (set(df.columns) - {"_bucket"})
        if clash:
            # the eager guard covers only columns the window READS; a
            # payload column with an output's name would be silently
            # overwritten here
            raise ValueError(
                f"windowed: output name(s) {sorted(clash)} would "
                "overwrite input columns — rename the outputs")
        # dropna=False: SQL window partitions treat NULL keys as one
        # partition, not as rows to silently drop
        g = df.groupby(by, sort=False, dropna=False)
        # compute every window column BEFORE assigning any: the GroupBy
        # reads the live frame, so interleaving writes would feed one
        # op's output into another op that names the same source column
        new = {}
        rn = tie_start = rank_s = nsz = None

        def _rank() -> pd.Series:
            nonlocal rn, tie_start, rank_s
            if rank_s is None:
                # a row opens a new tie-run when ANY of (key, order)
                # differs from the previous sorted row; NULLs are
                # PEERS (SQL ORDER BY semantics), so null == null
                # must count as equal — bare == yields False on NaN
                cur, prev = df[by + order], df[by + order].shift()
                prev_eq = (cur == prev) | (cur.isna() & prev.isna())
                tie_start = ~prev_eq.all(axis=1)
                if len(tie_start):
                    # row 0 ALWAYS opens a run: when every (by, order)
                    # value of the first sorted row is NULL, the
                    # null==null peer rule wrongly matches the phantom
                    # shifted row and the ffill below has no seed
                    tie_start.iloc[0] = True
                rn = (g.cumcount() + 1).astype("int64")
                # rank = row_number at the tie-run start, propagated
                rank_s = rn.where(tie_start).ffill().astype("int64")
            return rank_s

        def _nsz() -> pd.Series:
            nonlocal nsz
            if nsz is None:
                nsz = g[by[0]].transform("size").astype("int64")
            return nsz

        for name, spec in ops.items():
            if spec[0] == "lag":
                new[name] = g[spec[1]].shift(spec[2] if len(spec) > 2 else 1)
            elif spec[0] == "lead":
                new[name] = g[spec[1]].shift(-(spec[2] if len(spec) > 2 else 1))
            elif spec[0] == "row_number":
                new[name] = (g.cumcount() + 1).astype("int64")
            elif spec[0] == "cumsum":
                vcol = df[spec[1]]
                if vcol.isna().any():
                    # SQL SUM() OVER skips NULLs but still emits the
                    # running total AT the NULL row (NULL only until
                    # the partition's first non-null); pandas cumsum
                    # would leave NaN at the NULL row instead
                    run = vcol.fillna(0).groupby(
                        [df[c] for c in by], sort=False,
                        dropna=False).cumsum()
                    seen = vcol.notna().groupby(
                        [df[c] for c in by], sort=False,
                        dropna=False).cummax()
                    new[name] = run.where(seen)
                else:
                    new[name] = g[spec[1]].cumsum()
            elif spec[0] == "first_value":
                # SQL first_value over the default frame: the partition's
                # first row in `order` (tie-free order assumed for
                # determinism, like ntile)
                new[name] = g[spec[1]].transform("first")
            elif spec[0] == "last_value":
                # SQL last_value needs ROWS BETWEEN UNBOUNDED PRECEDING
                # AND UNBOUNDED FOLLOWING to mean "partition last" — the
                # default frame would make it the current row; this op
                # implements the whole-partition form
                new[name] = g[spec[1]].transform("last")
            elif spec[0] == "rank":
                new[name] = _rank()
            elif spec[0] == "dense_rank":
                _rank()
                new[name] = tie_start.astype("int64").groupby(
                    [df[c] for c in by], sort=False,
                    dropna=False).cumsum()
            elif spec[0] == "ntile":
                k = int(spec[1])
                pos = (g.cumcount() + 1).to_numpy()  # 1-based
                n = _nsz().to_numpy()
                q, r = n // k, n % k
                big = r * (q + 1)  # rows covered by the larger buckets
                qq = np.maximum(q, 1)  # q==0 ⇒ first branch always taken
                new[name] = pd.Series(np.where(
                    pos <= big,
                    (pos - 1) // (q + 1) + 1,
                    r + (pos - 1 - big) // qq + 1,
                ).astype("int64"), index=df.index)
            elif spec[0] == "percent_rank":
                n = _nsz()
                new[name] = ((_rank() - 1) / (n - 1).clip(lower=1)
                             ).where(n > 1, 0.0).astype("float64")
            elif spec[0] == "cume_dist":
                # SQL CUME_DIST: (# peers with order-key <= current)/n
                # = row_number at the END of the tie run, over n —
                # tie-safe like rank (peers share the value)
                _rank()  # materializes tie_start and rn
                run_end = np.append(tie_start.to_numpy()[1:], True)
                max_rank = pd.Series(
                    rn.to_numpy(), index=df.index
                ).where(pd.Series(run_end, index=df.index)).bfill()
                new[name] = (max_rank / _nsz()).astype("float64")
            elif spec[0] == "nth_value":
                # SQL nth_value over the WHOLE partition (ROWS BETWEEN
                # UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING): the
                # k-th row's value in `order`, NULL when the partition
                # has fewer than k rows. POSITIONAL like ntile — pin a
                # tie-free order for determinism. Vectorized off the
                # sorted frame's group-start offsets; no per-group
                # Python.
                k = int(spec[2])
                if k < 1:
                    raise ValueError("windowed: nth_value k must be >= 1")
                rn_ = (g.cumcount() + 1).to_numpy()
                pos = np.arange(len(df))
                gstart = rn_ == 1
                starts = pos[gstart]
                gid = np.cumsum(gstart) - 1
                nth_idx = starts[gid] + (k - 1)
                valid = _nsz().to_numpy() >= k
                taken = df[spec[1]].to_numpy()[
                    np.minimum(nth_idx, len(df) - 1)]
                ser = pd.Series(taken, index=df.index).where(
                    pd.Series(valid, index=df.index))
                if np.issubdtype(df[spec[1]].dtype, np.integer):
                    # match _typed_empty and lag/lead: integer sources
                    # come back float64 ALWAYS, not just in buckets
                    # that happen to contain a short partition
                    ser = ser.astype("float64")
                new[name] = ser
            elif spec[0] in ("range_sum", "range_count"):
                # SQL RANGE BETWEEN <win> PRECEDING AND CURRENT ROW over
                # a SINGLE numeric/datetime order column: the frame is
                # VALUE-defined, so equal-ordinate PEERS are included
                # (even ones after the current row in sort order) —
                # exactly three vectorized searchsorteds on the same
                # dense-rank composite the range join uses, then
                # prefix-sum differences. NULL values are skipped like
                # SQL aggregates (all-NULL window ⇒ NULL sum, 0 count).
                if len(order) != 1:
                    raise ValueError(
                        f"windowed: {spec[0]} needs exactly one order "
                        f"column (RANGE frames are value-defined)")
                col, win = spec[1], spec[2]
                oser = df[order[0]]
                if oser.isna().any():
                    raise ValueError(
                        f"windowed: {spec[0]} order column has NULLs — "
                        "a NaT/NaN ordinate casts to INT64_MIN and "
                        "corrupts every frame sharing its key; drop "
                        "null-ordered rows upstream")
                ovals = oser.to_numpy()
                if np.issubdtype(ovals.dtype, np.datetime64):
                    ts = ovals.astype("datetime64[ns]").view("int64")
                    W = int(pd.Timedelta(win).value)
                else:
                    if not np.issubdtype(ovals.dtype, np.integer):
                        # float ordinates would TRUNCATE (2.7 -> 2) and
                        # silently redefine the frame — the
                        # interval_join class
                        raise TypeError(
                            f"windowed: {spec[0]} order column must be "
                            f"integer or datetime (cents trick for "
                            f"floats), got {ovals.dtype}")
                    ts = ovals.astype("int64")
                    W = int(win)
                cur, prev = df[by], df[by].shift()
                prev_eq = ((cur == prev) | (cur.isna() & prev.isna())
                           ).all(axis=1)
                krank = (~prev_eq).to_numpy().cumsum().astype("int64")
                uvals = np.unique(ts)
                span = np.int64(len(uvals) + 1)
                rowcomp = krank * span + np.searchsorted(uvals, ts)
                qlo = krank * span + np.searchsorted(uvals, ts - W, "left")
                qhi = krank * span + np.searchsorted(uvals, ts, "right")
                lo = np.searchsorted(rowcomp, qlo, side="left")
                hi = np.searchsorted(rowcomp, qhi, side="left")
                v = df[col].to_numpy()
                nn = ~pd.isna(v)
                pref_n = np.concatenate([[0], np.cumsum(nn)])
                n_in = (pref_n[hi] - pref_n[lo]).astype("int64")
                if spec[0] == "range_count":
                    new[name] = pd.Series(n_in, index=df.index)
                else:
                    vv = np.where(nn, v, 0)
                    pref_s = np.concatenate([[0], np.cumsum(vv)])
                    # ALWAYS float64 (all-NULL frames are NaN), so the
                    # output schema never depends on which bucket a row
                    # landed in; exact for integer sums up to 2^53 —
                    # same contract as the ROWS-based moving family
                    s = (pref_s[hi] - pref_s[lo]).astype("float64")
                    s[n_in == 0] = np.nan  # SQL: all-NULL window ⇒ NULL
                    new[name] = pd.Series(s, index=df.index)
            elif spec[0] in _MOVING:
                col, k = spec[1], int(spec[2])
                # grouped rolling: result index is (by-levels…, orig
                # index) — drop the group levels to align back onto df
                r = g[col].rolling(k, min_periods=1)
                agg = {"moving_sum": "sum", "moving_avg": "mean",
                       "moving_min": "min", "moving_max": "max",
                       "moving_count": "count"}[spec[0]]
                s = getattr(r, agg)().droplevel(list(range(len(by))))
                if spec[0] == "moving_count":
                    # count of non-NULLs is never NaN (min_periods=1
                    # with an all-NaN window gives 0.0, not NaN)
                    s = s.astype("int64")
                new[name] = s
        for name, v in new.items():
            df[name] = v
        return table_from_pandas(df, preserve_index=False)

    out = fs_exchange_reduce(
        ds.map_batches(add_bucket, batch_format="pandas"),
        exchange_base or default_exchange("window"), reduce_fn)
    if out is None:
        return rd.from_arrow(_typed_empty(ds, ops))
    return out


def keep_latest(
    ds: Dataset,
    by: list[str] | str,
    order: list[str] | str,
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """One row per key: the row with the greatest ``order`` tuple — the
    upsert-compaction / snapshot primitive. Per-batch partial first, so
    the shuffle carries at most one row per (key, batch)."""
    by = [by] if isinstance(by, str) else list(by)
    order = [order] if isinstance(order, str) else list(order)

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        # na_position='first': a NULL order value must never WIN the
        # latest pick (pandas sorts NaN/NaT LAST by default, so
        # keep='last' would crown a corrupt null-ts row as the key's
        # snapshot); an all-null key still keeps one row
        return (df.sort_values(by + order, kind="mergesort",
                               na_position="first")
                .drop_duplicates(by, keep="last"))

    def partial(df: pd.DataFrame) -> pa.Table:
        out = latest(df)  # drop_duplicates already returns a new frame
        out["_bucket"] = (stable_hash(out, by) % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        return table_from_pandas(latest(t.to_pandas()),
                                    preserve_index=False)

    out = fs_exchange_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        exchange_base or default_exchange("keep_latest"), reduce_fn)
    if out is None:
        return rd.from_arrow(_typed_empty(ds))
    return out
