"""Parquet small-file compaction (the table-maintenance half of a real
deployment: streaming jobs and per-partition checkpoints leave thousands
of KB-scale files; readers then pay per-file open/footer costs and the
scheduler per-task overheads).

``compact_parquet`` bin-packs input files into groups of
``target_mb`` (by on-disk size, greedy in name order so the packing is
deterministic), then rewrites one output file per group in parallel —
pure map work, no shuffle, safe for any row layout because compaction
never reorders across groups.

Crash-safety contract: the PLAN (group → member list) is persisted to
``out_dir/_compact_manifest.json`` atomically BEFORE any data work, and
reruns resume that exact plan — so a crash can never change which group
a surviving file packs into (replanning from the post-crash file set
would re-pack a half-deleted group's survivors into a new digest and
duplicate their rows). Each group's output name is a digest of its
member list; a rerun skips groups whose output exists. With
``delete_inputs`` the inputs are removed only AFTER every group's
output exists — output files are the only commit points. New files
that appear under ``in_dir`` between runs are planned as additional
groups appended to the manifest (incremental compaction).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas
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


_MANIFEST = "_compact_manifest.json"


def _load_or_extend_manifest(in_dir: str, out_dir: str,
                             target_bytes: int) -> list[list[str]]:
    """Resume the persisted plan if one exists; plan any files it does
    not cover as APPENDED groups; rewrite atomically. The manifest is
    written before any data work so a crash mid-run can never change an
    existing group's membership (and therefore its output digest)."""
    mpath = os.path.join(out_dir, _MANIFEST)
    groups: list[list[str]] = []
    if os.path.exists(mpath):
        with open(mpath) as f:
            groups = json.load(f)["groups"]
    covered = {p for g in groups for p in g}
    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.parquet"),
                             recursive=True))
    if not paths and not groups:
        raise ValueError(f"compact_parquet: no parquet files under {in_dir!r}")
    new = [(p, os.path.getsize(p)) for p in paths if p not in covered]
    if new:
        groups = groups + plan_groups(new, target_bytes)
    if new or not os.path.exists(mpath):
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"groups": groups}, f)
        os.replace(tmp, mpath)
    return groups


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_mb: int = 256,
    delete_inputs: bool = False,
) -> dict:
    """Compact every ``*.parquet`` under ``in_dir`` (recursive) into
    ~``target_mb`` files in ``out_dir``. Returns {groups, skipped,
    rows}. ``delete_inputs`` removes source files only after EVERY
    group's output exists (see module docstring for the crash-safety
    contract)."""
    in_real, out_real = os.path.realpath(in_dir), os.path.realpath(out_dir)
    if out_real == in_real or out_real.startswith(in_real + os.sep):
        raise ValueError(
            "compact_parquet: out_dir must not be inside in_dir — a rerun "
            "would re-ingest the compacted outputs")
    os.makedirs(out_dir, exist_ok=True)
    groups = _load_or_extend_manifest(in_dir, out_dir, target_mb * (1 << 20))
    if not groups:
        return {"groups": 0, "skipped": 0, "rows": 0}

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
            out.append({"gid": int(gid), "rows": t.num_rows,
                        "skipped": False})
        return table_from_pandas(pd.DataFrame(out), preserve_index=False)

    res = rd.from_items([{"gid": i} for i in range(len(groups))]).map_batches(
        work, batch_format="pandas", batch_size=1).to_pandas()
    if delete_inputs:
        # every group's output now exists; removing inputs is pure
        # cleanup, and a crash mid-removal just leaves files that the
        # next rerun (all groups digest-skipped) removes again
        for g in groups:
            for f in g:
                try:
                    os.remove(f)
                except OSError:
                    pass
    return {
        "groups": len(groups),
        "skipped": int(res["skipped"].sum()),
        "rows": int(res.loc[~res["skipped"], "rows"].sum()),
    }
