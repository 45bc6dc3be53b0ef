"""Parquet small-file compaction (the table-maintenance half of a real
deployment: streaming jobs and per-partition checkpoints leave thousands
of KB-scale files; readers then pay per-file open/footer costs and the
scheduler per-task overheads).

``compact_parquet`` bin-packs input files into groups of
``target_mb`` (by on-disk size, greedy in name order so the packing is
deterministic), then rewrites one output file per group in parallel —
pure map work, no shuffle, safe for any row layout because compaction
never reorders across groups. Resumable: each group's output name is a
digest of its input file list, so a rerun skips groups whose output
already exists (the same manifest discipline as the checkpoint store).
"""

from __future__ import annotations

import glob
import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

__all__ = ["compact_parquet", "plan_groups"]


def plan_groups(files: list[tuple[str, int]],
                target_bytes: int) -> list[list[str]]:
    """Deterministic greedy bin-packing of (path, size) pairs, input
    order preserved (sorted by path upstream)."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_sz = 0
    for path, sz in files:
        if cur and cur_sz + sz > target_bytes:
            groups.append(cur)
            cur, cur_sz = [], 0
        cur.append(path)
        cur_sz += sz
    if cur:
        groups.append(cur)
    return groups


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_mb: int = 256,
    delete_inputs: bool = False,
) -> dict:
    """Compact every ``*.parquet`` under ``in_dir`` (recursive) into
    ~``target_mb`` files in ``out_dir``. Returns {groups, skipped,
    rows}. ``delete_inputs`` removes source files only AFTER their
    group's output is fully written (crash-safe: a rerun redoes the
    group or skips it on the digest)."""
    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.parquet"),
                             recursive=True))
    if not paths:
        raise ValueError(f"compact_parquet: no parquet files under {in_dir!r}")
    files = [(p, os.path.getsize(p)) for p in paths]
    groups = plan_groups(files, target_mb * (1 << 20))
    os.makedirs(out_dir, exist_ok=True)

    def work(batch: pd.DataFrame) -> pa.Table:
        out = []
        for gid in batch["gid"]:
            members = groups[int(gid)]
            digest = hashlib.sha256(
                "\n".join(members).encode()).hexdigest()[:16]
            dest = os.path.join(out_dir, f"compact-{digest}.parquet")
            if os.path.exists(dest):
                out.append({"gid": int(gid), "rows": -1, "skipped": True})
                continue
            t = pa.concat_tables(
                [pq.read_table(f) for f in members], promote_options="default")
            tmp = dest + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, dest)  # atomic commit
            if delete_inputs:
                for f in members:
                    try:
                        os.remove(f)
                    except OSError:
                        pass
            out.append({"gid": int(gid), "rows": t.num_rows,
                        "skipped": False})
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    res = rd.from_items([{"gid": i} for i in range(len(groups))]).map_batches(
        work, batch_format="pandas", batch_size=1).to_pandas()
    return {
        "groups": len(groups),
        "skipped": int(res["skipped"].sum()),
        "rows": int(res.loc[~res["skipped"], "rows"].sum()),
    }
