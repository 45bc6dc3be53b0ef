"""Join operators (SURVEY.md §2.5).

Three tiers, chosen by side sizes:

  - ``broadcast_join``: small side fits one worker → ``ray.put`` once,
    pandas merge per batch. No shuffle.
  - ``semi_join`` / ``anti_join``: only the KEY SET of the small side is
    broadcast; the filter is vectorized ``isin`` per batch (the
    reference's certifier re-scan anti-join —
    pkg/certifier/components/root_package/root_package.go:127-184).
  - ``hash_join``: both sides large → co-partition BOTH sides by
    ``hash(key) % B`` through the filesystem exchange (same mechanism as
    the dedup shuffle, both phases pure map work), then one task per
    bucket joins the matching partitions with a pandas merge. Skewed hot
    keys split across sub-buckets by salting the PROBE side and
    replicating the build side (``salt`` param).
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from guac_ray.stages.assemble import stable_hash

__all__ = ["broadcast_join", "semi_join", "anti_join", "hash_join", "asof_join"]


def default_exchange(name: str) -> str:
    """Default exchange base: RAM-backed when available. ALL exchange
    users resolve through here so the base-dir policy lives once."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    return f"{base}/guac_ray_exchange/{name}"


def fresh_exchange_dir(base: str) -> str:
    """A unique subdirectory per exchange use. Callers pass a stable base
    path (e.g. ``/dev/shm/guac_ray_exchange/priority_join``); each call
    gets its own subdir so a previously returned lazy Dataset — which
    re-reads its exchange files on every consumption — is never silently
    repointed at newer data by a later call with the same base. Stale
    siblings from finished calls are pruned opportunistically (best
    effort: a sibling may still back a live Dataset in THIS process, so
    pruning only removes dirs older than one hour)."""
    os.makedirs(base, exist_ok=True)
    import time as _time

    now = _time.time()
    for d in os.listdir(base):
        p = os.path.join(base, d)
        try:
            if now - os.path.getmtime(p) > 3600:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    return os.path.join(base, uuid.uuid4().hex[:12])


def broadcast_join(
    ds: Dataset,
    small_df: pd.DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> Dataset:
    """Small-side broadcast join: the frame ships to the object store once
    and every batch merges against it."""
    ref = ray.put(small_df)

    class Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            out = df.merge(self.small, on=on, how=how)
            return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(Join, batch_format="pandas", concurrency=(1, 4))


def _key_set_ref(keys) -> "ray.ObjectRef":
    return ray.put(frozenset(keys))


def semi_join(ds: Dataset, keys, col: str) -> Dataset:
    """Keep rows whose ``col`` is in the broadcast key set."""
    ref = _key_set_ref(keys)

    def f(df: pd.DataFrame) -> pa.Table:
        ks = ray.get(ref)
        return pa.Table.from_pandas(df[df[col].isin(ks)], preserve_index=False)

    return ds.map_batches(f, batch_format="pandas")


def anti_join(ds: Dataset, keys, col: str) -> Dataset:
    """Keep rows whose ``col`` is NOT in the broadcast key set."""
    ref = _key_set_ref(keys)

    def f(df: pd.DataFrame) -> pa.Table:
        ks = ray.get(ref)
        return pa.Table.from_pandas(df[~df[col].isin(ks)], preserve_index=False)

    return ds.map_batches(f, batch_format="pandas")


def hash_join(
    left: Dataset,
    right: Dataset,
    on: list[str] | str,
    exchange_dir: str,
    how: str = "inner",
    num_buckets: int = 32,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> Dataset:
    """Large-large partitioned hash join via the filesystem exchange.

    Both inputs are hash-partitioned on the join key into
    ``exchange_dir/{left,right}/_jb=K``; a map task per bucket merges the
    two matching partitions. Rows with equal keys land in equal buckets
    by construction, so the union of per-bucket joins IS the join.

    ``num_buckets`` bounds per-task memory (≈ side_size / num_buckets
    each); raise it with data size. For pathological single-key skew,
    pre-split the hot key upstream (salt column) — buckets here only
    balance across DISTINCT keys.
    """
    keys = [on] if isinstance(on, str) else list(on)
    exchange_dir = fresh_exchange_dir(exchange_dir)

    def part(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["_jb"] = (stable_hash(df, keys) % num_buckets).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    ldir = os.path.join(exchange_dir, "left")
    rdir = os.path.join(exchange_dir, "right")
    left.map_batches(part, batch_format="pandas").write_parquet(
        ldir, partition_cols=["_jb"]
    )
    right.map_batches(part, batch_format="pandas").write_parquet(
        rdir, partition_cols=["_jb"]
    )

    if how not in ("inner", "left"):
        raise NotImplementedError("hash_join implements inner and left joins; "
                                  "use broadcast_join / semi_join / anti_join "
                                  "for the other patterns")

    lb = {int(p.rsplit("=", 1)[1]) for p in glob.glob(os.path.join(ldir, "_jb=*"))}
    rb = {int(p.rsplit("=", 1)[1]) for p in glob.glob(os.path.join(rdir, "_jb=*"))}
    # inner: only buckets present on BOTH sides can produce rows — pruning
    # also keeps every output block non-empty (no schema-less placeholders).
    # left: every left bucket must emit its rows, matched or not.
    present = sorted(lb & rb) if how == "inner" else sorted(lb)
    # for left joins a right-side-empty bucket still needs the right
    # columns WITH their dtypes — capture the right schema once (from
    # the exchange files, or from the Dataset when right wrote nothing)
    right_empty: pd.DataFrame | None = None
    if how == "left":
        if rb:
            import pyarrow.parquet as pq

            any_rb = next(iter(rb))
            f0 = glob.glob(os.path.join(rdir, f"_jb={any_rb}", "*.parquet"))[0]
            sch = pq.read_schema(f0)
            if "_jb" in sch.names:
                sch = sch.remove(sch.get_field_index("_jb"))
            right_empty = sch.empty_table().to_pandas()
        else:
            rsch = right.schema()
            if rsch is not None:
                right_empty = pa.schema(
                    [(n, t) for n, t in zip(rsch.names, rsch.types)
                     if n != "_jb"]
                ).empty_table().to_pandas()

    def join_bucket(batch: pd.DataFrame) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for k in batch["k"]:
            lt = pq.read_table(os.path.join(ldir, f"_jb={k}")).to_pandas()
            rpath = os.path.join(rdir, f"_jb={k}")
            if os.path.isdir(rpath):
                rt = pq.read_table(rpath).to_pandas()
            elif right_empty is not None:
                rt = right_empty
            else:  # right side entirely empty: nulls for the key cols only
                rt = pd.DataFrame({k2: pd.Series(dtype=lt[k2].dtype) for k2 in keys})
            outs.append(lt.merge(rt, on=keys, how=how, suffixes=suffixes))
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    buckets = rd.from_items([{"k": k} for k in present])
    return buckets.map_batches(join_bucket, batch_format="pandas", batch_size=1)


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    exchange_dir: str,
    num_buckets: int = 16,
    right_suffix: str = "_r",
) -> Dataset:
    """As-of join (backward, inclusive): for each left row, the latest
    right row with the same ``by`` key and ``right.on <= left.on`` —
    matching DuckDB's ``ASOF JOIN … ON l.by = r.by AND l.on >= r.on``
    (inner semantics: unmatched left rows drop).

    Both sides co-partition on ``by`` through the filesystem exchange;
    within each bucket a sorted ``pd.merge_asof(by=…)`` does the work.
    The partitioning assumption: all rows of one ``by`` key land in one
    bucket (guaranteed by the hash), so no as-of pair spans buckets.
    """
    exchange_dir = fresh_exchange_dir(exchange_dir)

    def part(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["_jb"] = (stable_hash(df, [by]) % num_buckets).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    ldir = os.path.join(exchange_dir, "left")
    rdir = os.path.join(exchange_dir, "right")
    left.map_batches(part, batch_format="pandas").write_parquet(
        ldir, partition_cols=["_jb"]
    )
    right.map_batches(part, batch_format="pandas").write_parquet(
        rdir, partition_cols=["_jb"]
    )
    present = sorted(
        {int(p.rsplit("=", 1)[1]) for p in glob.glob(os.path.join(ldir, "_jb=*"))}
        & {int(p.rsplit("=", 1)[1]) for p in glob.glob(os.path.join(rdir, "_jb=*"))}
    )

    def join_bucket(batch: pd.DataFrame) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for k in batch["k"]:
            lt = pq.read_table(os.path.join(ldir, f"_jb={k}")).to_pandas()
            rt = pq.read_table(os.path.join(rdir, f"_jb={k}")).to_pandas()
            rt["_matched"] = np.int8(1)
            lt = lt.sort_values(on, kind="mergesort")
            rt = rt.sort_values(on, kind="mergesort")
            m = pd.merge_asof(lt, rt, on=on, by=by, direction="backward",
                              allow_exact_matches=True, suffixes=("", right_suffix))
            # inner semantics: drop lefts with no as-of match
            m = m[m["_matched"].notna()].drop(columns=["_matched"])
            outs.append(m)
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    buckets = rd.from_items([{"k": k} for k in present])
    return buckets.map_batches(join_bucket, batch_format="pandas", batch_size=1)
