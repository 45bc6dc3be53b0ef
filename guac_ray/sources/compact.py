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
member list (salted with the group index for v2 groups); a rerun skips
groups whose output exists. With ``delete_inputs`` the inputs are
removed only AFTER every group's output exists — output files are the
only commit points — and a file is removed only while its (size,
mtime_ns) still matches what the plan recorded, so a producer
RECREATING a compacted path can never lose the new data: the stale
member skips the delete, and the next run plans the recreated file as
a fresh group. New files that appear under ``in_dir`` between runs are
planned as additional groups appended to the manifest (incremental
compaction).

Deliberately LOCAL-filesystem only (unlike the exchange, which is
pyarrow.fs-pluggable via guac_ray/exfs.py): the crash-safety contract
leans on atomic rename (``os.replace``) and ``mtime_ns`` stats, which
object stores don't provide — compaction of an object-store table needs
a manifest-swap design (Iceberg-style) instead, not a lying port of
this one.
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


def _group_digest(members: list[str], gid: int, legacy: bool) -> str:
    """Output-file digest for one group. Legacy (v1) groups keep the
    pure member-list digest so existing outputs stay recognized; v2
    groups salt with the group index, because a path can legitimately
    be planned AGAIN after its file is recreated — two generations of
    the same member list must not collide on one output name."""
    base = "\n".join(members)
    if not legacy:
        base += f"\n#gen={gid}"
    return hashlib.sha256(base.encode()).hexdigest()[:16]


def _load_or_extend_manifest(in_dir: str, out_dir: str,
                             target_bytes: int) -> list[dict]:
    """Resume the persisted plan if one exists; plan any files it does
    not cover as APPENDED groups; rewrite atomically. The manifest is
    written before any data work so a crash mid-run can never change an
    existing group's membership (and therefore its output digest).

    Each member records (size, mtime_ns) at planning time: a covered
    path whose CURRENT stat differs was recreated by a producer after
    compaction — its new content is planned as a fresh member, and the
    stale member's deletion is suppressed (delete_inputs only removes a
    file whose stat still matches the member it was planned as). That
    closes the silent-loss window where a rerun deleted a recreated
    file it had never read.

    Returns [{"digest": str, "members": [{"p", "sz", "mt"}, ...]}, ...].
    """
    mpath = os.path.join(out_dir, _MANIFEST)
    groups: list[dict] = []
    if os.path.exists(mpath):
        with open(mpath) as f:
            data = json.load(f)
        if data.get("v", 1) >= 2:
            groups = data["groups"]
        else:  # v1: plain path lists; no stats recorded → sz/mt None
            groups = [
                {"digest": _group_digest(g, i, legacy=True),
                 "members": [{"p": p, "sz": None, "mt": None} for p in g]}
                for i, g in enumerate(data["groups"])
            ]
            # a v1 group whose output is NOT yet built will read the
            # files as they are NOW — stamp current stats so the
            # recreation test and the deletion guard can actually
            # protect them; members of COMPLETED groups stay
            # unverifiable (sz None) and are never deleted
            for g in groups:
                dest = os.path.join(
                    out_dir, f"compact-{g['digest']}.parquet")
                if os.path.exists(dest):
                    continue
                for m in g["members"]:
                    try:
                        st = os.stat(m["p"])
                        m["sz"], m["mt"] = st.st_size, st.st_mtime_ns
                    except OSError:
                        pass
    covered: dict[str, dict] = {}
    for g in groups:
        for m in g["members"]:
            covered[m["p"]] = m  # latest plan generation wins
    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.parquet"),
                             recursive=True))
    if not paths and not groups:
        raise ValueError(f"compact_parquet: no parquet files under {in_dir!r}")
    new: list[tuple[str, int, int]] = []
    for p in paths:
        st = os.stat(p)
        m = covered.get(p)
        if m is None:
            new.append((p, st.st_size, st.st_mtime_ns))
        elif m["sz"] is not None and (m["sz"] != st.st_size
                                      or m["mt"] != st.st_mtime_ns):
            # recreated since it was planned: new data under an old name
            new.append((p, st.st_size, st.st_mtime_ns))
    if new:
        stats = {p: (sz, mt) for p, sz, mt in new}
        for g in plan_groups([(p, sz) for p, sz, _ in new], target_bytes):
            gid = len(groups)
            groups.append({
                "digest": _group_digest(g, gid, legacy=False),
                "members": [{"p": p, "sz": stats[p][0], "mt": stats[p][1]}
                            for p in g],
            })
    if new or not os.path.exists(mpath):
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"v": 2, "groups": groups}, f)
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
            g = groups[int(gid)]
            dest = os.path.join(out_dir, f"compact-{g['digest']}.parquet")
            if os.path.exists(dest):
                out.append({"gid": int(gid), "rows": -1, "skipped": True})
                continue
            tabs = []
            for m in g["members"]:
                if m["sz"] is not None:
                    try:
                        st = os.stat(m["p"])
                    except OSError:
                        continue  # deleted since planning: bytes gone
                    if (st.st_size != m["sz"]
                            or st.st_mtime_ns != m["mt"]):
                        # recreated since planning: the NEW bytes belong
                        # to the appended group that replanned this
                        # path — reading them here would DUPLICATE rows
                        # (and the old generation's bytes are already
                        # unrecoverable)
                        continue
                tabs.append(pq.read_table(m["p"]))
            if not tabs:
                # nothing of this generation survives — an idempotent
                # no-op, never a fabricated empty output
                out.append({"gid": int(gid), "rows": 0, "skipped": False})
                continue
            t = pa.concat_tables(tabs, promote_options="default")
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
        # next rerun (all groups digest-skipped) removes again. A file
        # is removed ONLY if its stat still matches the member it was
        # planned as — a producer recreating a compacted path leaves
        # NEW data that this run never read (it gets planned+compacted
        # on the next run, then deleted by ITS matching member).
        for g in groups:
            for m in g["members"]:
                try:
                    if m["sz"] is None:
                        # v1 member of a completed group: no recorded
                        # stat to verify against — deleting it could
                        # destroy a RECREATED file this run never read
                        continue
                    st = os.stat(m["p"])
                    if st.st_size != m["sz"] or st.st_mtime_ns != m["mt"]:
                        continue  # recreated since planning: keep
                    os.remove(m["p"])
                except OSError:
                    pass
    return {
        "groups": len(groups),
        "skipped": int(res["skipped"].sum()),
        "rows": int(res.loc[~res["skipped"], "rows"].sum()),
    }
