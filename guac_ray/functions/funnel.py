"""Funnel (ordered event-sequence) analysis: per key, the earliest
completion chain through an ordered list of step predicates.

Semantics (anchored earliest-completion — the deterministic variant of
the windowed-funnel family popularized by ClickHouse's ``windowFunnel``,
restated so a SQL oracle can mirror it exactly):

- ``t1``  = min ``order`` among rows whose step column equals step 1;
  keys with no step-1 row do not appear in the output (same as the
  oracle's step-1 GROUP BY).
- ``t_k`` = min ``order`` among rows whose step column equals step k
  with ``order > t_{k-1}``, and — when ``within`` is given — with
  ``order - t1 <= within`` (the window is ANCHORED at step 1, so a
  slow chain cannot drift the horizon forward).
- ``funnel_level`` = number of non-null ``t_k`` (1..k).

Greedy earliest matching is order-insensitive to input row order
(every ``t_k`` is a min over a value-defined set), so the operator is
deterministic under any shuffle.

Scale: rows are co-partitioned by key hash through the filesystem
exchange (all rows of one key in one reduce bucket — the same contract
as every PARTITION BY here); each bucket computes the chain in k
VECTORIZED passes (boolean mask → groupby-min → merge), never a
per-row Python loop. Shuffle volume is one row per input event of a
step type (non-step rows are pruned before the exchange — at 100 TB
the funnel over 5 step types of a 100-type stream moves 5% of rows).

This operator has no analog in the reference (GUAC graphs are
unordered); it belongs to the events/streams family
(pkg/ingestor-adjacent analytics) that SURVEY.md §2.7/§2.12 extends.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas
from guac_ray.functions.joins import default_exchange
from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

__all__ = ["funnel"]


def funnel(
    ds: Dataset,
    key: str,
    order: str,
    step_col: str,
    steps: list[str],
    within: "pd.Timedelta | int | None" = None,
    num_buckets: int = 16,
    exchange_base: str | None = None,
) -> "Dataset | pa.Table":
    """Per-``key`` funnel over ``steps`` (ordered list of ``step_col``
    values). Returns columns ``key, funnel_level, t1..tk``; ``t_k`` is
    null past the furthest step reached. ``within`` bounds steps 2..k
    to ``order - t1 <= within`` (a ``pd.Timedelta`` for timestamp
    ``order`` columns, or a plain int for integer ordinates)."""
    if len(steps) < 2:
        raise ValueError("funnel: need at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel: steps must be distinct")
    k = len(steps)
    step_set = list(steps)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df[step_col].isin(step_set)]
        out = pd.DataFrame({
            key: m[key].to_numpy(),
            order: m[order].to_numpy(),
            step_col: m[step_col].to_numpy(),
        })
        # the SHARED partitioner (fixed key, categorize=False, float-key
        # refusal) — an inlined hash here would silently diverge from
        # any future stable_hash hardening
        out["_bucket"] = (stable_hash(out, [key])
                          % num_buckets).astype("int64")
        return out

    def reduce_fn(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        t1 = (df[df[step_col] == steps[0]].groupby(key, sort=False)[order]
              .min().rename("t1").reset_index())
        out = t1
        prev = "t1"
        for i, s in enumerate(steps[1:], start=2):
            cols = [key, "t1"] if prev == "t1" else [key, "t1", prev]
            cand = df[df[step_col] == s][[key, order]].merge(
                out[cols], on=key)
            ok = cand[order] > cand[prev]
            if within is not None:
                ok &= (cand[order] - cand["t1"]) <= within
            ti = (cand[ok].groupby(key, sort=False)[order]
                  .min().rename(f"t{i}").reset_index())
            out = out.merge(ti, on=key, how="left")
            prev = f"t{i}"
        level = pd.Series(1, index=out.index)
        for i in range(2, k + 1):
            level = level + out[f"t{i}"].notna().astype("int64")
        out.insert(1, "funnel_level", level.astype("int64"))
        return table_from_pandas(out)

    pruned = ds.map_batches(partial, batch_format="pandas")
    red = fs_exchange_reduce(
        pruned, exchange_base or default_exchange("funnel"), reduce_fn)
    if red is None:
        # typed empty DATASET (the non-empty path returns one): key and
        # order types from the input schema, normalized through
        # arrow_type_of — pandas-block datasets report numpy dtypes
        # here, which pa.schema would reject
        import ray.data as rd

        from guac_ray.arrowutil import arrow_type_of

        sch = ds.schema()
        kt = ({n: arrow_type_of(t)
               for n, t in zip(sch.names, sch.types)}
              if sch is not None else {})
        fields = [(key, kt.get(key) or pa.string()),
                  ("funnel_level", pa.int64())]
        fields += [(f"t{i}", kt.get(order) or pa.timestamp("us"))
                   for i in range(1, k + 1)]
        return rd.from_arrow(pa.schema(fields).empty_table())
    return red
