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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from guac_ray.arrowutil import table_from_pandas

import ray
import ray.data as rd
from ray.data import Dataset

# the exchange filesystem plumbing lives in guac_ray.exfs; re-exported
# here because every exchange consumer historically imports it from
# this module
from guac_ray.exfs import (  # noqa: F401  (re-exports)
    default_exchange,
    exchange_fs,
    fresh_exchange_dir,
    fs_list_files,
    fs_listdir,
    fs_num_rows,
    fs_read_table,
)
from guac_ray.stages.assemble import stable_hash

__all__ = ["broadcast_join", "semi_join", "anti_join", "hash_join", "asof_join",
           "range_join", "interval_join", "skew_join"]


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
            return table_from_pandas(out, preserve_index=False)

    return ds.map_batches(Join, batch_format="pandas", concurrency=(1, 4))


def _key_set_ref(keys) -> "ray.ObjectRef":
    return ray.put(frozenset(keys))


def semi_join(ds: Dataset, keys, col: str) -> Dataset:
    """Keep rows whose ``col`` is in the broadcast key set."""
    ref = _key_set_ref(keys)

    def f(df: pd.DataFrame) -> pa.Table:
        ks = ray.get(ref)
        return table_from_pandas(df[df[col].isin(ks)], preserve_index=False)

    return ds.map_batches(f, batch_format="pandas")


def anti_join(ds: Dataset, keys, col: str) -> Dataset:
    """Keep rows whose ``col`` is NOT in the broadcast key set."""
    ref = _key_set_ref(keys)

    def f(df: pd.DataFrame) -> pa.Table:
        ks = ray.get(ref)
        return table_from_pandas(df[~df[col].isin(ks)], preserve_index=False)

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
    exchange_dir: str, num_buckets: int, filesystem=None,
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
            for c in keys:
                if np.issubdtype(df[c].dtype, np.floating):
                    # stable_hash stringifies per dtype (int 5 → "5",
                    # float 5.0 → "5.0"), so a float key on ONE side —
                    # usually a silent pandas NULL-upcast — lands equal
                    # values in different buckets and the join quietly
                    # drops matches. Refuse loudly instead.
                    raise TypeError(
                        f"join key {c!r} is float ({df[c].dtype}) — "
                        "cast both sides to int64/string before the "
                        "join (a NaN-introducing upcast is the usual "
                        "culprit; fill or drop the nulls first)")
            df = df.copy()
            df["_jb"] = (stable_hash(df, keys) % num_buckets).astype("int64")
            return table_from_pandas(df, preserve_index=False)
        return part

    ldir = f"{exchange_dir}/left"
    rdir = f"{exchange_dir}/right"
    errs: list[BaseException] = []

    def write_right():
        try:
            right.map_batches(part_fn(rkeys), batch_format="pandas").write_parquet(
                rdir, partition_cols=["_jb"], filesystem=filesystem)
        except BaseException as ex:  # propagate to the driver thread
            errs.append(ex)

    t = threading.Thread(target=write_right, daemon=True)
    t.start()
    left.map_batches(part_fn(lkeys), batch_format="pandas").write_parquet(
        ldir, partition_cols=["_jb"], filesystem=filesystem)
    t.join()
    if errs:
        raise errs[0]
    return ldir, rdir


def _bucket_files(fsys, side_dir: str) -> dict[int, list[str]]:
    """bucket id → parquet files (reading FILES, not the hive dirs, keeps
    the synthetic ``_jb`` column out of the join output)."""
    import pyarrow.fs as pafs

    out: dict[int, list[str]] = {}
    for info in fs_listdir(fsys, side_dir):
        name = info.path.rsplit("/", 1)[-1]
        if info.type == pafs.FileType.Directory and name.startswith("_jb="):
            files = fs_list_files(fsys, info.path)
            if files:
                out[int(name[4:])] = files
    return out


def _bloom_idx(h: np.ndarray, i: int, m_bits: int) -> np.ndarray:
    """The i-th Bloom bit index for uint64 key hashes — the ONE place
    the stride/modulus lives, shared by build and probe (a divergence
    between the two silently drops matching join rows)."""
    return ((h >> np.uint64(i * 23)) % np.uint64(m_bits)).astype(np.int64)


# hash-function count shared by _build_bloom and the probe in hash_join —
# a build/probe mismatch would leave bits unset and silently drop
# matching rows from an inner join
_BLOOM_K_HASHES = 2


def _build_bloom(ds: Dataset, keys: list[str], m_bits: int = 1 << 23,
                 k_hashes: int = _BLOOM_K_HASHES) -> np.ndarray:
    """Bloom bitmap over the join keys of ``ds`` (byte-per-bit uint8 for
    cheap vectorized membership tests). Partial bitmaps are OR-ed on the
    driver from a column-pruned streaming scan — the driver holds
    ``m_bits`` bytes (8 MiB default) plus one partial at a time, never
    the key set."""
    bloom = np.zeros(m_bits, dtype=np.uint8)

    def partial(df: pd.DataFrame) -> pa.Table:
        h = stable_hash(df, keys)
        idx = np.concatenate([_bloom_idx(h, i, m_bits)
                              for i in range(k_hashes)])
        return pa.table({"idx": pa.array(np.unique(idx))})

    for batch in ds.select_columns(keys).map_batches(
            partial, batch_format="pandas").iter_batches(
            batch_format="pyarrow"):
        bloom[batch["idx"].to_numpy(zero_copy_only=False)] = 1
    return bloom


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
    bloom_prune: bool = False,
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
        bucket fans out instead of serializing on one task. Splitting is
        also correct for SEMI/ANTI (the keep/drop decision is row-local
        given the full right bucket). FULL OUTER joins run one task per
        bucket instead: emitting a right row as unmatched requires
        having seen the WHOLE left bucket, so a split probe would
        duplicate right-unmatched rows (bucket memory for outer ≈
        (left+right)/num_buckets — raise ``num_buckets`` to shrink it).

    ``how="semi"`` / ``how="anti"`` are the LARGE-LARGE membership
    joins (left rows with / without a key match; no right columns in
    the output) — the distributed counterpart of the broadcast-set
    ``semi_join`` / ``anti_join`` helpers. Only the right KEY columns
    enter the exchange, pre-deduped per batch. ``how="mark"`` is the
    membership PROBE (SQL ``EXISTS`` as a column): every left row comes
    back with an int8 ``_mark`` ∈ {0, 1} instead of being filtered —
    one exchange answers "which rows match AND which don't", where a
    semi + anti pair would pay it twice. Same right-key shipping and
    probe-splitting rules as semi (the flag is row-local).
      - ``partial_fn`` (pa.Table → pa.Table) runs inside each reduce
        task on its join output — fuse the downstream per-batch PARTIAL
        aggregate here so the join payload never re-enters the object
        store. Results are partials (a key may span probe chunks);
        callers still finalize with ``grouped_agg``.

    Null join keys never match (Arrow join semantics; the engine's
    pipelines produce non-null keys). For pathological single-key skew,
    pre-split the hot key upstream (salt column) — buckets only balance
    across DISTINCT keys.

    ``bloom_prune=True`` (inner joins only) spends one extra
    column-pruned scan of the RIGHT keys to build a Bloom bitmap, then
    drops left rows that cannot match BEFORE they enter the exchange —
    worth it when the left side is much larger than its matching subset
    (the semi-join-pushdown shape). False positives only pass extra rows
    to the (exact) Arrow join, so the result is unchanged.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "outer", "semi", "anti", "mark"):
        raise NotImplementedError(
            "hash_join implements inner/left/outer/semi/anti/mark; use "
            "broadcast_join (or the set-based semi_join/anti_join) for "
            "small right sides")
    if num_buckets is None:
        num_buckets = _default_num_buckets()
    if bloom_prune and how not in ("inner", "semi"):
        raise ValueError("bloom_prune only applies to inner/semi joins — "
                         "left/outer/anti must keep unmatched rows")
    if how in ("semi", "anti", "mark"):
        # only membership matters: ship nothing but (deduped) right keys
        # through the exchange
        right = right.select_columns(keys).map_batches(
            lambda t: t.group_by(keys).aggregate([]), batch_format="pyarrow")
    if bloom_prune:
        bloom = _build_bloom(right, keys)
        bref = ray.put(bloom)
        m_bits = len(bloom)

        def prune(df: pd.DataFrame) -> pa.Table:
            b = ray.get(bref)
            h = stable_hash(df, keys)
            ok = np.ones(len(df), dtype=bool)
            for i in range(_BLOOM_K_HASHES):
                ok &= b[_bloom_idx(h, i, m_bits)] == 1
            return table_from_pandas(df[ok], preserve_index=False)

        left = left.map_batches(prune, batch_format="pandas")
    fsys, _ = exchange_fs()  # resolved ONCE, captured by task closures
    exchange_dir = fresh_exchange_dir(exchange_dir)
    ldir, rdir = _partition_both(left, right, keys, keys, exchange_dir,
                                 num_buckets, filesystem=fsys)

    import pyarrow.parquet as pq

    lfiles = _bucket_files(fsys, ldir)
    rfiles = _bucket_files(fsys, rdir)
    # inner: only buckets present on BOTH sides can produce rows — pruning
    # also keeps every output block non-empty (no schema-less placeholders).
    # left: every left bucket must emit its rows, matched or not.
    # outer: every bucket on EITHER side emits rows.
    if how in ("inner", "semi"):
        present = sorted(lfiles.keys() & rfiles.keys())
    elif how in ("left", "anti", "mark"):
        present = sorted(lfiles.keys())
    else:  # outer
        present = sorted(lfiles.keys() | rfiles.keys())

    def _side_schema(files: dict[int, list[str]], ds: Dataset) -> pa.Schema | None:
        """Schema for a side that may be empty in some (or all) buckets,
        so empty placeholders keep the column dtypes."""
        if files:
            return pq.read_schema(next(iter(files.values()))[0],
                                  filesystem=fsys)
        sch = ds.schema()
        if sch is not None:
            fields = [(n, t) for n, t in zip(sch.names, sch.types)
                      if n != "_jb"]
            # pandas-born blocks report numpy dtypes here; an empty
            # side is exactly the path this branch exists for, so it
            # must not TypeError inside pa.schema
            if all(isinstance(t, pa.DataType) for _, t in fields):
                return pa.schema(fields)
        return None

    right_schema = _side_schema(rfiles, right) if how in ("left", "outer") else None
    left_schema = _side_schema(lfiles, left) if how == "outer" else None

    # one task per (bucket, probe-file chunk): chunk by footer row counts.
    # outer joins never split a bucket's probe side (see docstring).
    tasks: list[dict] = []
    for k in present:
        if how == "outer":
            tasks.append({"k": k, "lfiles": lfiles.get(k, [])})
            continue
        chunk: list[str] = []
        rows = 0
        for f in lfiles[k]:
            chunk.append(f)
            rows += fs_num_rows(fsys, f)
            if rows >= probe_rows_per_task:
                tasks.append({"k": k, "lfiles": chunk})
                chunk, rows = [], 0
        if chunk:
            tasks.append({"k": k, "lfiles": chunk})

    join_type = {"inner": "inner", "left": "left outer",
                 "outer": "full outer", "semi": "left semi",
                 "anti": "left anti", "mark": "left outer"}[how]

    def join_task(batch: pd.DataFrame) -> pa.Table:
        outs = []
        for k, lspec in zip(batch["k"], batch["lfiles"]):
            files = lspec.split("\n") if lspec else []
            rfs = rfiles.get(int(k))
            rt = (pa.concat_tables([fs_read_table(fsys, f) for f in rfs])
                  if rfs else None)
            if len(files):
                lt = pa.concat_tables([fs_read_table(fsys, f) for f in files])
            elif left_schema is not None:  # outer, right-only bucket
                lt = left_schema.empty_table()
            else:  # left side entirely empty + schema-less: keys from right
                lt = pa.schema(
                    [(c, rt.schema.field(c).type) for c in keys]).empty_table()
            if how == "mark":
                # EXISTS flag per left row: re-dedup the right keys
                # WITHIN the bucket (the pre-exchange dedup is only
                # per-batch, and a duplicate key would multiply rows
                # under left-outer), then mark = matched ? 1 : 0
                if rt is not None and rt.num_rows:
                    rtd = rt.group_by(keys).aggregate([])
                    rtd = rtd.append_column("_mark", pa.array(
                        np.ones(rtd.num_rows, dtype=np.int8)))
                    j = lt.join(rtd, keys=keys, join_type="left outer",
                                left_suffix=suffixes[0],
                                right_suffix=suffixes[1], use_threads=False)
                    mi = j.schema.get_field_index("_mark")
                    j = j.set_column(mi, "_mark",
                                     pc.fill_null(j.column("_mark"),
                                                  np.int8(0)))
                else:
                    j = lt.append_column("_mark", pa.array(
                        np.zeros(lt.num_rows, dtype=np.int8)))
                outs.append(partial_fn(j) if partial_fn is not None else j)
                continue
            if rt is None:
                if right_schema is not None:
                    rt = right_schema.empty_table()
                else:  # right side entirely empty: key columns only
                    rt = pa.schema(
                        [(c, lt.schema.field(c).type) for c in keys]).empty_table()
            j = lt.join(rt, keys=keys, join_type=join_type,
                        left_suffix=suffixes[0], right_suffix=suffixes[1],
                        use_threads=False)
            outs.append(partial_fn(j) if partial_fn is not None else j)
        return pa.concat_tables(outs)

    if not tasks:
        # disjoint key sets (or an empty probe side): a SCHEMA-LESS
        # empty (rd.from_items([])) breaks downstream select/concat —
        # derive the joined schema from the two sides instead. With a
        # partial_fn, run it ON the typed empty so the caller sees the
        # PARTIAL's output schema (grouped_agg needs its _bucket column
        # even on an empty join).
        lsch = _side_schema(lfiles, left)
        rsch = _side_schema(rfiles, right)
        if lsch is not None:
            fields = list(zip(lsch.names, lsch.types))
            if how in ("inner", "left", "outer") and rsch is not None:
                have = {n for n, _ in fields}
                for n, t in zip(rsch.names, rsch.types):
                    if n in keys:
                        continue
                    fields.append((n + suffixes[1] if n in have else n, t))
            elif how == "mark":
                fields.append(("_mark", pa.int8()))
            emptyt = pa.schema(fields).empty_table()
            if partial_fn is not None:
                emptyt = partial_fn(emptyt)
            return rd.from_arrow(emptyt)
    buckets = rd.from_items(
        [{"k": t["k"], "lfiles": "\n".join(t["lfiles"])} for t in tasks])
    return buckets.map_batches(join_task, batch_format="pandas", batch_size=1)


def _as_i64(arr: np.ndarray):
    """View datetime64/int arrays as int64 for ordered arithmetic; floats
    pass through (handled by the loop fallback in ``_banded_matches``)."""
    a = np.asarray(arr)
    if np.issubdtype(a.dtype, np.datetime64):
        return a.astype("datetime64[ns]").view("int64")
    if np.issubdtype(a.dtype, np.integer):
        return a.astype("int64", copy=False)
    return a


def _window_matches(
    lby: np.ndarray, wlo: np.ndarray, whi: np.ndarray,
    rby: np.ndarray, ron: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-row-window match within one co-partitioned bucket.

    Inputs: left key array with PER-ROW inclusive window bounds
    ``[wlo[i], whi[i]]``, and right key + ordinate arrays (right MUST be
    sorted by (by, on)). Returns (left_idx, right_idx) pairs where
    ``lby[i] == rby[j]`` and ``wlo[i] <= ron[j] <= whi[i]``.

    The whole match is a handful of ``np.searchsorted`` calls on a
    DENSE-RANK composite: each right row encodes as
    ``key_rank * span + ordinate_rank`` where ordinate_rank is the
    position of ``on`` among the bucket's distinct ordinate values, so
    ``span = n_distinct + 1`` regardless of the ordinate's numeric
    domain — nanosecond timestamps over years encode as comfortably as
    small ints, and the composite stays below int64 for any bucket under
    ~3e9 rows. No per-key (let alone per-row) Python work on the
    integer path; float ordinates take a per-left-row loop fallback
    (rank arithmetic on float bounds is exact only to 2^53).
    """
    wlo_i, whi_i, ron_i = _as_i64(wlo), _as_i64(whi), _as_i64(ron)
    ukeys, rstart = np.unique(rby, return_index=True)
    composite_ok = (
        np.issubdtype(np.asarray(wlo_i).dtype, np.integer)
        and np.issubdtype(np.asarray(whi_i).dtype, np.integer)
        and np.issubdtype(np.asarray(ron_i).dtype, np.integer)
        and len(ron_i) > 0
    )
    if composite_ok:
        rvals = np.unique(ron_i)  # sorted distinct ordinates
        span = len(rvals) + 1  # ordinate ranks occupy [0, len(rvals)]
        composite_ok = (len(ukeys) + 1) * span < 2**62  # ~never trips now
    if composite_ok:
        rank = np.searchsorted(ukeys, lby)
        valid = (rank < len(ukeys))
        valid[valid] &= ukeys[rank[valid]] == lby[valid]
        rank = np.where(valid, rank, 0).astype("int64")
        # right rows arrive sorted by (by, on), so rcomp is nondecreasing
        rcomp = (
            np.searchsorted(ukeys, rby).astype("int64") * span
            + np.searchsorted(rvals, ron_i)
        )
        # left-of-q_lo rank counts ordinates < q_lo; right-of-q_hi rank
        # counts ordinates <= q_hi — both queried with side="left" on
        # rcomp, which lands on the first element at-or-past that rank
        qlo = rank * span + np.searchsorted(rvals, wlo_i, side="left")
        qhi = rank * span + np.searchsorted(rvals, whi_i, side="right")
        lo = np.searchsorted(rcomp, qlo, side="left")
        hi = np.searchsorted(rcomp, qhi, side="left")
        counts = np.where(valid, np.maximum(hi - lo, 0), 0)
    else:
        # float ordinates: per-LEFT-ROW loop, two searchsorteds per row —
        # correct but slow; integer/datetime ordinates never come here
        slices = {k: (int(s), int(e)) for k, s, e in zip(
            ukeys, rstart, np.append(rstart[1:], len(rby)))}
        lo = np.zeros(len(lby), dtype="int64")
        hi = np.zeros(len(lby), dtype="int64")
        for i in range(len(lby)):
            se = slices.get(lby[i])
            if se is None:
                continue
            s, e = se
            lo[i] = s + np.searchsorted(ron_i[s:e], wlo_i[i], side="left")
            hi[i] = s + np.searchsorted(ron_i[s:e], whi_i[i], side="right")
        counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    if total == 0:
        z = np.empty(0, dtype="int64")
        return z, z
    lidx = np.repeat(np.arange(len(lby), dtype="int64"), counts)
    cum = np.cumsum(counts)
    intra = np.arange(total, dtype="int64") - np.repeat(cum - counts, counts)
    ridx = np.repeat(lo, counts) + intra
    return lidx, ridx


def _banded_matches(
    lby: np.ndarray, lon: np.ndarray, rby: np.ndarray, ron: np.ndarray,
    lower: int, upper: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Banded-interval match: pairs with ``lby[i] == rby[j]`` and
    ``lon[i]+lower <= ron[j] <= lon[i]+upper`` — the per-row-window
    matcher with a shared band offset (see :func:`_window_matches`)."""
    lon_i = _as_i64(lon)
    if (np.issubdtype(np.asarray(lon_i).dtype, np.integer)
            and isinstance(lower, (int, np.integer))
            and isinstance(upper, (int, np.integer))):
        return _window_matches(lby, lon_i + lower, lon_i + upper, rby, ron)
    return _window_matches(lby, np.asarray(lon_i) + lower,
                           np.asarray(lon_i) + upper, rby, ron)


def range_join(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    lower,
    upper,
    exchange_dir: str,
    num_buckets: int | None = None,
    suffixes: tuple[str, str] = ("", "_r"),
) -> Dataset:
    """Banded interval (range) join: all pairs with ``l.by == r.by`` and
    ``l.on + lower <= r.on <= l.on + upper`` (bounds inclusive; pass
    ``pd.Timedelta`` offsets for datetime ``on``). The one-row-per-match
    sibling of :func:`asof_join` (which keeps only the latest match) —
    the reference has no such operator; Ray Data has no join at all, so
    this composes the fs exchange with a vectorized banded merge.

    Scale shape: both sides co-partition on ``by`` through the
    filesystem exchange (pure map work, same mechanism as
    :func:`hash_join`); one task per bucket sorts its right partition by
    ``(by, on)`` and finds every left row's match window with three
    vectorized ``searchsorted`` calls (see :func:`_banded_matches`) —
    output size equals true match count, never |bucket|². The
    partitioning assumption: all rows of one ``by`` key land in one
    bucket (hash-guaranteed); a single pathologically hot key serializes
    into its bucket's task — salt upstream if a key exceeds worker
    memory.
    """
    if num_buckets is None:
        num_buckets = max(16, _default_num_buckets() // 4)
    fsys, _ = exchange_fs()
    exchange_dir = fresh_exchange_dir(exchange_dir)
    ldir, rdir = _partition_both(left, right, [by], [by], exchange_dir,
                                 num_buckets, filesystem=fsys)
    lfiles = _bucket_files(fsys, ldir)
    rfiles = _bucket_files(fsys, rdir)
    present = sorted(lfiles.keys() & rfiles.keys())

    lower_i = int(pd.Timedelta(lower).value) if isinstance(lower, (pd.Timedelta, str)) else lower
    upper_i = int(pd.Timedelta(upper).value) if isinstance(upper, (pd.Timedelta, str)) else upper

    def join_bucket(batch: pd.DataFrame) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for k in batch["k"]:
            lt = pa.concat_tables([fs_read_table(fsys, f)
                                   for f in lfiles[int(k)]])
            rt = pa.concat_tables([fs_read_table(fsys, f)
                                   for f in rfiles[int(k)]])
            ldf = lt.to_pandas()
            rdf = rt.to_pandas().sort_values([by, on], kind="mergesort")
            lidx, ridx = _banded_matches(
                ldf[by].to_numpy(), ldf[on].to_numpy(),
                rdf[by].to_numpy(), rdf[on].to_numpy(),
                lower_i, upper_i)
            lpart = ldf.iloc[lidx].reset_index(drop=True)
            rpart = (rdf.drop(columns=[by]).iloc[ridx]
                     .reset_index(drop=True))
            rpart.columns = [
                c if c not in lpart.columns else c + suffixes[1]
                for c in rpart.columns]
            lpart.columns = [
                c if c + suffixes[1] not in rpart.columns else c + suffixes[0]
                for c in lpart.columns]
            combined = list(lpart.columns) + list(rpart.columns)
            if len(set(combined)) != len(combined):
                # e.g. the right side natively holds both 'x' and
                # 'x_r': suffixing would emit duplicate labels and
                # pd.concat would produce an ambiguous frame
                dupes = sorted({c for c in combined
                                if combined.count(c) > 1})
                raise ValueError(
                    f"join output column collision {dupes} — pick "
                    "non-colliding suffixes or rename the inputs")
            outs.append(pd.concat([lpart, rpart], axis=1))
        return table_from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    buckets = rd.from_items([{"k": k} for k in present])
    return buckets.map_batches(join_bucket, batch_format="pandas", batch_size=1)


def interval_join(
    left: Dataset,
    right: Dataset,
    by: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    exchange_dir: str,
    num_buckets: int | None = None,
    suffixes: tuple[str, str] = ("", "_r"),
) -> Dataset:
    """Interval OVERLAP join: all pairs with ``l.by == r.by`` and
    ``l.start <= r.end AND r.start <= l.end`` (inclusive — touching
    intervals match, the literal SQL overlap predicate, so reversed
    spans behave exactly as the oracle's comparison does).

    Scale shape: both sides co-partition on ``by`` through the
    filesystem exchange; one task per bucket sorts its right partition
    by ``(by, start)`` and applies the classic max-interval-length
    bound — a match's right START must lie in
    ``[l.start - max_right_len, l.end]``, so candidates come from three
    vectorized ``searchsorted`` calls (:func:`_window_matches`) and one
    vectorized ``r.end >= l.start`` verify pass. Candidate count
    exceeds the true match count only by rows whose start falls in the
    window but end short of ``l.start`` — bounded by right-interval
    length SKEW: one pathologically long right interval widens every
    window in its bucket, so split giant intervals upstream (the same
    advice every interval-join engine documents).
    """
    if num_buckets is None:
        num_buckets = max(16, _default_num_buckets() // 4)
    fsys, _ = exchange_fs()
    exchange_dir = fresh_exchange_dir(exchange_dir)
    ldir, rdir = _partition_both(left, right, [by], [by], exchange_dir,
                                 num_buckets, filesystem=fsys)
    lfiles = _bucket_files(fsys, ldir)
    rfiles = _bucket_files(fsys, rdir)
    present = sorted(lfiles.keys() & rfiles.keys())

    def join_bucket(batch: pd.DataFrame) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for k in batch["k"]:
            lt = pa.concat_tables([fs_read_table(fsys, f)
                                   for f in lfiles[int(k)]])
            rt = pa.concat_tables([fs_read_table(fsys, f)
                                   for f in rfiles[int(k)]])
            ldf = lt.to_pandas()
            rdf = rt.to_pandas().sort_values([by, right_start],
                                             kind="mergesort")
            ls = _as_i64(ldf[left_start].to_numpy())
            le = _as_i64(ldf[left_end].to_numpy())
            rs = _as_i64(rdf[right_start].to_numpy())
            re_ = _as_i64(rdf[right_end].to_numpy())
            # keep the native dtype: int() would TRUNCATE a float
            # interval length (2.7 → 2), narrowing the candidate
            # window and silently dropping true overlaps
            maxlen = max((re_ - rs).max(), 0) if len(rs) else 0
            lidx, ridx = _window_matches(
                ldf[by].to_numpy(), ls - maxlen, le,
                rdf[by].to_numpy(), rs)
            if len(lidx):
                keep = re_[ridx] >= ls[lidx]  # verify the end condition
                lidx, ridx = lidx[keep], ridx[keep]
            lpart = ldf.iloc[lidx].reset_index(drop=True)
            rpart = (rdf.drop(columns=[by]).iloc[ridx]
                     .reset_index(drop=True))
            rpart.columns = [
                c if c not in lpart.columns else c + suffixes[1]
                for c in rpart.columns]
            lpart.columns = [
                c if c + suffixes[1] not in rpart.columns else c + suffixes[0]
                for c in lpart.columns]
            combined = list(lpart.columns) + list(rpart.columns)
            if len(set(combined)) != len(combined):
                # e.g. the right side natively holds both 'x' and
                # 'x_r': suffixing would emit duplicate labels and
                # pd.concat would produce an ambiguous frame
                dupes = sorted({c for c in combined
                                if combined.count(c) > 1})
                raise ValueError(
                    f"join output column collision {dupes} — pick "
                    "non-colliding suffixes or rename the inputs")
            outs.append(pd.concat([lpart, rpart], axis=1))
        return table_from_pandas(pd.concat(outs, ignore_index=True),
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
    how: str = "inner",
) -> Dataset:
    """As-of join (backward, inclusive): for each left row, the latest
    right row with the same ``by`` key and ``right.on <= left.on`` —
    matching DuckDB's ``ASOF JOIN … ON l.by = r.by AND l.on >= r.on``.
    ``how='inner'`` drops unmatched left rows; ``how='left'`` keeps them
    with null right columns (DuckDB ``ASOF LEFT JOIN`` — integer right
    columns come back as nullable doubles, the usual pandas NULL
    upcast).

    Both sides co-partition on ``by`` through the filesystem exchange;
    within each bucket a sorted ``pd.merge_asof(by=…)`` does the work.
    For ``how='left'``, left-only buckets (no right bucket at all)
    merge against a typed empty right frame built from the right
    Dataset's pre-exchange schema, so the output schema is identical
    across buckets. The partitioning assumption: all rows of one ``by``
    key land in one bucket (guaranteed by the hash), so no as-of pair
    spans buckets.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    rschema = right.schema() if how == "left" else None
    if rschema is not None and not all(
            isinstance(t, pa.DataType) for t in rschema.types):
        # pandas-born blocks report numpy dtypes; the typed-empty
        # branch below would TypeError inside pa.schema — fall back to
        # the schema-unknowable path instead
        rschema = None
    fsys, _ = exchange_fs()
    exchange_dir = fresh_exchange_dir(exchange_dir)
    ldir, rdir = _partition_both(left, right, [by], [by], exchange_dir,
                                 num_buckets, filesystem=fsys)
    lpresent = set(_bucket_files(fsys, ldir))
    rpresent = set(_bucket_files(fsys, rdir))
    present = sorted(lpresent & rpresent) if how == "inner" \
        else sorted(lpresent)

    def join_bucket(batch: pd.DataFrame) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for k in batch["k"]:
            lt = fs_read_table(fsys, f"{ldir}/_jb={k}").to_pandas()
            if int(k) in rpresent:
                rt = fs_read_table(fsys, f"{rdir}/_jb={k}").to_pandas()
            elif rschema is not None:  # how == "left": typed empty right
                rt = pa.schema(
                    list(zip(rschema.names, rschema.types))).empty_table() \
                    .to_pandas()
            else:  # right Dataset entirely empty (schema unknowable):
                # merge against just the join columns so every left row
                # survives with no extra right columns
                rt = lt[[by, on]].iloc[0:0].copy()
            rt["_matched"] = np.int8(1)
            lt = lt.sort_values(on, kind="mergesort")
            rt = rt.sort_values(on, kind="mergesort")
            m = pd.merge_asof(lt, rt, on=on, by=by, direction="backward",
                              allow_exact_matches=True, suffixes=("", right_suffix))
            if how == "inner":  # drop lefts with no as-of match
                m = m[m["_matched"].notna()]
            outs.append(m.drop(columns=["_matched"]))
        return table_from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    buckets = rd.from_items([{"k": k} for k in present])
    return buckets.map_batches(join_bucket, batch_format="pandas", batch_size=1)


def skew_join(
    left: Dataset,
    right: Dataset,
    on: list[str] | str,
    hot_keys: list,
    exchange_dir: str,
    salt: int = 8,
    num_buckets: int | None = None,
    suffixes: tuple[str, str] = ("_l", "_r"),
    partial_fn=None,
    probe_rows_per_task: int = 2_000_000,
) -> Dataset:
    """Skew-replicated INNER hash join — the hot-key treatment
    ``hash_join``'s docstring prescribes ("pre-split the hot key
    upstream (salt column) — buckets only balance across DISTINCT
    keys"), implemented: when a handful of keys dominate the BUILD
    (right) side, their bucket's build table outgrows one worker no
    matter how many buckets exist. Here each hot right row scatters
    across ``salt`` sub-partitions and each hot LEFT row replicates
    once per sub-partition, then the ordinary partitioned hash join
    runs on the composite key ``(on…, _salt)`` — a hot left row meets
    exactly one salt's share of the hot build rows per bucket, so the
    union over salts IS the join, with the hot build side spread over
    up to ``salt`` distinct buckets (full salt× task-memory relief
    needs ``num_buckets`` comfortably above ``salt``, the usual
    hash-partition caveat). Non-hot keys ride salt 0 untouched.

    ``hot_keys`` is the driver-known hot list — at scale produced by
    the EXACT heavy-hitter sketch (functions/sketch.py, the
    kg_heavy_tools machinery), which is ≤k-per-batch bounded; it must
    be SMALL (it ships in every task closure). Single-key tuples pass
    as scalars when ``on`` is a single column.

    INNER only by construction: left replication would multiply
    unmatched rows under left/outer semantics and double-count under
    semi/anti — those modes keep hash_join's probe-splitting as their
    skew relief. Right-side salt assignment is per-batch cycling
    (balanced by construction); ANY assignment is correct for an
    inner join — the salt is pure routing, never semantics — so the
    output is identical to the unsalted join (pinned by tests).
    Extra cost vs hash_join: hot LEFT rows ship ``salt``× (they are
    the small side of the skew by hypothesis)."""
    keys = [on] if isinstance(on, str) else list(on)
    if salt < 2:
        raise ValueError("skew_join: salt must be >= 2 — salt=1 is "
                         "hash_join")
    hot = (set(hot_keys) if len(keys) == 1
           else {tuple(k) for k in hot_keys})

    def _hot_mask(df: pd.DataFrame) -> np.ndarray:
        if len(keys) == 1:
            return df[keys[0]].isin(hot).to_numpy()
        return pd.MultiIndex.from_frame(df[keys]).isin(hot)

    def tag_right(df: pd.DataFrame) -> pa.Table:
        m = _hot_mask(df)
        s = np.zeros(len(df), dtype="int64")
        n_hot = int(m.sum())
        if n_hot:
            # deterministic per-batch STARTING OFFSET: a cycle that
            # restarts at 0 every batch piles hot rows onto low salts
            # whenever hot-rows-per-batch < salt (e.g. one hot build
            # row per small block), collapsing the relief back to one
            # bucket while the left still pays full salt× replication
            # hash the full first hot ROW (not just the key — one hot
            # key hashes identically in every batch): batch contents
            # differ, so offsets spread across batches, yet the value
            # is replay-stable for a given batch
            off = int(stable_hash(df[m].head(1),
                                  list(df.columns))[0] % salt)
            s[m] = (off + np.arange(n_hot, dtype="int64")) % salt
        out = df.copy()
        out["_salt"] = s
        return table_from_pandas(out, preserve_index=False)

    def tag_left(df: pd.DataFrame) -> pa.Table:
        m = _hot_mask(df)
        cold = df[~m].copy()
        cold["_salt"] = np.int64(0)
        h = df[m]
        if len(h):
            rep = h.loc[h.index.repeat(salt)].copy()
            rep["_salt"] = np.tile(np.arange(salt, dtype="int64"),
                                   len(h))
            cold = pd.concat([cold, rep], ignore_index=True)
        return table_from_pandas(cold, preserve_index=False)

    out = hash_join(
        left.map_batches(tag_left, batch_format="pandas"),
        right.map_batches(tag_right, batch_format="pandas"),
        on=keys + ["_salt"], exchange_dir=exchange_dir, how="inner",
        num_buckets=num_buckets, suffixes=suffixes,
        partial_fn=partial_fn,
        probe_rows_per_task=probe_rows_per_task)
    if partial_fn is not None:
        return out  # caller's partial owns the schema
    return out.map_batches(lambda t: t.drop_columns(["_salt"]),
                           batch_format="pyarrow")
