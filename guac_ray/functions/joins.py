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


# every exchange dir handed out by THIS process: a lazy Dataset returned
# hours ago still re-reads its files on each consumption, so dirs this
# process created are never pruned, no matter their age — only leftovers
# from DEAD processes (not in the registry) age out.
_LIVE_EXCHANGE_DIRS: set[str] = set()


def fresh_exchange_dir(base: str) -> str:
    """A unique subdirectory per exchange use. Callers pass a stable base
    path (e.g. ``/dev/shm/guac_ray_exchange/priority_join``); each call
    gets its own subdir so a previously returned lazy Dataset — which
    re-reads its exchange files on every consumption — is never silently
    repointed at newer data by a later call with the same base. Siblings
    registered by this process are live (they may back a lazy Dataset)
    and are never pruned; unregistered siblings from dead processes are
    pruned once older than one hour."""
    os.makedirs(base, exist_ok=True)
    import time as _time

    now = _time.time()
    for d in os.listdir(base):
        p = os.path.join(base, d)
        if p in _LIVE_EXCHANGE_DIRS:
            continue
        try:
            if now - os.path.getmtime(p) > 3600:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    p = os.path.join(base, uuid.uuid4().hex[:12])
    _LIVE_EXCHANGE_DIRS.add(p)
    return p


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


def _default_num_buckets() -> int:
    """Reduce-partition default sized to the cluster: ≥ 2 tasks per CPU
    so the reduce phase never runs at a fraction of the machine (the
    round-2 q3 regression was 16 buckets on 32 CPUs)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    return max(32, 2 * cpus)


def _partition_both(
    left: Dataset, right: Dataset, lkeys: list[str], rkeys: list[str],
    exchange_dir: str, num_buckets: int,
) -> tuple[str, str]:
    """Hash-partition both join inputs into ``exchange_dir/{left,right}``
    CONCURRENTLY: each side is an independent pure-map pipeline, and two
    streaming executions share the cluster — the sequential version
    measured as the dominant cost of the round-2 partitioned join (two
    back-to-back driver-blocking writes per join)."""
    import threading

    from guac_ray.compat import stabilize_optional_imports

    stabilize_optional_imports()  # concurrent write_parquet probes fsspec

    def part_fn(keys):
        def part(df: pd.DataFrame) -> pa.Table:
            df = df.copy()
            df["_jb"] = (stable_hash(df, keys) % num_buckets).astype("int64")
            return pa.Table.from_pandas(df, preserve_index=False)
        return part

    ldir = os.path.join(exchange_dir, "left")
    rdir = os.path.join(exchange_dir, "right")
    errs: list[BaseException] = []

    def write_right():
        try:
            right.map_batches(part_fn(rkeys), batch_format="pandas").write_parquet(
                rdir, partition_cols=["_jb"])
        except BaseException as ex:  # propagate to the driver thread
            errs.append(ex)

    t = threading.Thread(target=write_right, daemon=True)
    t.start()
    left.map_batches(part_fn(lkeys), batch_format="pandas").write_parquet(
        ldir, partition_cols=["_jb"])
    t.join()
    if errs:
        raise errs[0]
    return ldir, rdir


def _bucket_files(side_dir: str) -> dict[int, list[str]]:
    """bucket id → parquet files (reading FILES, not the hive dirs, keeps
    the synthetic ``_jb`` column out of the join output)."""
    out: dict[int, list[str]] = {}
    for p in glob.glob(os.path.join(side_dir, "_jb=*", "*.parquet")):
        k = int(p.split("_jb=")[1].split(os.sep)[0])
        out.setdefault(k, []).append(p)
    for v in out.values():
        v.sort()
    return out


def hash_join(
    left: Dataset,
    right: Dataset,
    on: list[str] | str,
    exchange_dir: str,
    how: str = "inner",
    num_buckets: int | None = None,
    suffixes: tuple[str, str] = ("_l", "_r"),
    partial_fn=None,
    probe_rows_per_task: int = 2_000_000,
) -> Dataset:
    """Large-large partitioned hash join via the filesystem exchange.

    Both inputs are hash-partitioned on the join key into
    ``exchange_dir/{left,right}/_jb=K`` (the two partition writes run
    CONCURRENTLY); reduce tasks then join per bucket with the Arrow
    hash-join kernel (``pa.Table.join`` — no pandas conversion on the
    hot path). Rows with equal keys land in equal buckets by
    construction, so the union of per-bucket joins IS the join.

    Scale controls:
      - ``num_buckets`` (default ≥ 2× cluster CPUs) bounds BUILD-side
        task memory (≈ right_size / num_buckets must fit one worker).
      - ``probe_rows_per_task`` splits a bucket's PROBE (left) files
        across several tasks — correct for inner/left joins because each
        left row joins only against the full right bucket, so probe-side
        memory is bounded independently of bucket size and a skewed
        bucket fans out instead of serializing on one task.
      - ``partial_fn`` (pa.Table → pa.Table) runs inside each reduce
        task on its join output — fuse the downstream per-batch PARTIAL
        aggregate here so the join payload never re-enters the object
        store. Results are partials (a key may span probe chunks);
        callers still finalize with ``grouped_agg``.

    Null join keys never match (Arrow join semantics; the engine's
    pipelines produce non-null keys). For pathological single-key skew,
    pre-split the hot key upstream (salt column) — buckets only balance
    across DISTINCT keys.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise NotImplementedError("hash_join implements inner and left joins; "
                                  "use broadcast_join / semi_join / anti_join "
                                  "for the other patterns")
    if num_buckets is None:
        num_buckets = _default_num_buckets()
    exchange_dir = fresh_exchange_dir(exchange_dir)
    ldir, rdir = _partition_both(left, right, keys, keys, exchange_dir, num_buckets)

    import pyarrow.parquet as pq

    lfiles = _bucket_files(ldir)
    rfiles = _bucket_files(rdir)
    # inner: only buckets present on BOTH sides can produce rows — pruning
    # also keeps every output block non-empty (no schema-less placeholders).
    # left: every left bucket must emit its rows, matched or not.
    present = (
        sorted(lfiles.keys() & rfiles.keys()) if how == "inner"
        else sorted(lfiles.keys())
    )
    # for left joins a right-side-empty bucket still needs the right
    # columns WITH their dtypes — capture the right schema once (from
    # the exchange files, or from the Dataset when right wrote nothing)
    right_schema: pa.Schema | None = None
    if how == "left":
        if rfiles:
            f0 = next(iter(rfiles.values()))[0]
            right_schema = pq.read_schema(f0)
        else:
            rsch = right.schema()
            if rsch is not None:
                right_schema = pa.schema(
                    [(n, t) for n, t in zip(rsch.names, rsch.types)
                     if n != "_jb"])

    # one task per (bucket, probe-file chunk): chunk by footer row counts
    tasks: list[dict] = []
    for k in present:
        chunk: list[str] = []
        rows = 0
        for f in lfiles[k]:
            chunk.append(f)
            rows += pq.ParquetFile(f).metadata.num_rows
            if rows >= probe_rows_per_task:
                tasks.append({"k": k, "lfiles": chunk})
                chunk, rows = [], 0
        if chunk:
            tasks.append({"k": k, "lfiles": chunk})

    join_type = "inner" if how == "inner" else "left outer"

    def join_task(batch: pd.DataFrame) -> pa.Table:
        outs = []
        for k, files in zip(batch["k"], batch["lfiles"]):
            lt = pa.concat_tables([pq.read_table(f) for f in files])
            rfs = rfiles.get(int(k))
            if rfs:
                rt = pa.concat_tables([pq.read_table(f) for f in rfs])
            elif right_schema is not None:
                rt = right_schema.empty_table()
            else:  # right side entirely empty: key columns only
                rt = pa.schema(
                    [(c, lt.schema.field(c).type) for c in keys]).empty_table()
            j = lt.join(rt, keys=keys, join_type=join_type,
                        left_suffix=suffixes[0], right_suffix=suffixes[1],
                        use_threads=False)
            outs.append(partial_fn(j) if partial_fn is not None else j)
        return pa.concat_tables(outs)

    buckets = rd.from_items([{"k": t["k"], "lfiles": t["lfiles"]} for t in tasks])
    return buckets.map_batches(join_task, batch_format="pandas", batch_size=1)


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
    ldir, rdir = _partition_both(left, right, [by], [by], exchange_dir, num_buckets)
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
