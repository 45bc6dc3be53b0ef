"""Per-partition checkpointing with lineage + metrics records (north
rule; SURVEY.md §4 "checkpoint/resume" row).

The reference resumes via durable NATS consumer cursors and collector
mod-time checks (nats_emitter.go:179, file.go:81-83). A batch engine's
equivalent is a partition manifest:

  out/
    raw_edges/part-<i>/*.parquet     extraction output per input partition
    _ckpt/part-<i>.json              manifest: inputs+digests, row counts,
                                     wall time, engine version (lineage)
    edges/  nodes/                   assembled graph (stage B)
    metrics/part-<i>.json            per-partition metrics records

Stage A (extract+link) is embarrassingly parallel across partitions —
each partition is one Ray Data job over its shard group, written
atomically (tmp dir + rename) so Ray task retries / reruns can't leave a
half partition. Stage B (the dedup shuffles) runs over stage A's files,
so a crash resumes by re-running only missing partitions + stage B.

A partition here = a group of input files. On a real cluster the loop
body submits concurrently (`ray job submit` per partition group or one
driver with N concurrent Dataset executions); sequential here keeps the
single-node test deterministic.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray.data as rd

from guac_ray.pipelines.kg import extract_triples
from guac_ray.stages.assemble import assemble_edges, nodes_from_edges

__all__ = ["partition_inputs", "partition_inputs_incremental",
           "run_extract_partition", "run_graph_job", "poll_graph_job",
           "resume_status"]

ENGINE_VERSION = "guac_ray-0.1.0"


def _digest(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        # mtime_ns, not whole seconds: a same-size rewrite within one
        # second must change the digest (compact.py's discipline) or
        # resume silently serves stale edges
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def partition_inputs(transcripts_dir: str, num_partitions: int) -> list[list[str]]:
    files = sorted(
        os.path.join(transcripts_dir, f)
        for f in os.listdir(transcripts_dir)
        if f.endswith(".parquet")
    )
    num_partitions = min(num_partitions, len(files))
    return [files[i::num_partitions] for i in range(num_partitions)]


def partition_inputs_incremental(
    transcripts_dir: str, out_dir: str, num_partitions: int
) -> list[tuple[int, list[str]]]:
    """STABLE file → partition assignment for a GROWING input directory
    (the reference's steady-state mode: the file collector skips
    already-seen files by mod-time, file.go:81-83).

    Round-robin repartitioning reshuffles every file when one shard is
    added, invalidating every manifest digest and forcing a full
    re-extract. Instead the assignment is persisted
    (``_ckpt/assignment.json``): files keep their partition forever, new
    files pack into NEW partitions sized like the existing ones, so a
    rerun extracts only the new partitions (plus any whose files were
    modified — the digest's mtime component is the mod-time check).
    Deleted files drop from the assignment; their partition's digest then
    mismatches and it re-extracts from the survivors."""
    files = sorted(
        os.path.join(transcripts_dir, f)
        for f in os.listdir(transcripts_dir)
        if f.endswith(".parquet")
    )
    apath = os.path.join(out_dir, "_ckpt", "assignment.json")
    assign: dict[str, int] = {}
    if os.path.exists(apath):
        with open(apath) as f:
            assign = json.load(f)
    live = set(files)
    assign = {f: p for f, p in assign.items() if f in live}
    new = [f for f in files if f not in assign]
    if new:
        if assign:
            from collections import Counter

            sizes = Counter(assign.values())
            per = max(1, round(sum(sizes.values()) / len(sizes)))
        else:
            per = max(1, -(-len(new) // max(1, num_partitions)))  # ceil
        next_id = max(assign.values(), default=-1) + 1
        for gi in range(0, len(new), per):
            for f in new[gi:gi + per]:
                assign[f] = next_id + gi // per
    os.makedirs(os.path.dirname(apath), exist_ok=True)
    with open(apath + ".tmp", "w") as f:
        json.dump(assign, f, indent=1)
    os.replace(apath + ".tmp", apath)

    plan: dict[int, list[str]] = {}
    for fp, pid in assign.items():
        plan.setdefault(pid, []).append(fp)
    return sorted((pid, sorted(fs)) for pid, fs in plan.items())


def run_extract_partition(
    part_id: int,
    files: list[str],
    out_dir: str,
    catalog_path: str | None = None,
    force: bool = False,
    link_ref=None,
) -> dict:
    """Extract+link ONE partition → raw_edges/part-<i>/ with manifest.
    Skips (and says so) when the manifest matches the input digest."""
    ck_dir = os.path.join(out_dir, "_ckpt")
    mx_dir = os.path.join(out_dir, "metrics")
    os.makedirs(ck_dir, exist_ok=True)
    os.makedirs(mx_dir, exist_ok=True)
    manifest_path = os.path.join(ck_dir, f"part-{part_id:04d}.json")
    dest = os.path.join(out_dir, "raw_edges", f"part-{part_id:04d}")
    digest = _digest(files)
    # the skip check must cover EVERYTHING that shapes the output: the
    # transcript bytes, the entity catalog (a changed catalog silently
    # re-links nothing if only transcripts are digested), and the
    # engine version (changed extraction rules = changed output)
    cat_digest = _digest([catalog_path]) if catalog_path else None

    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if (m.get("input_digest") == digest
                and m.get("catalog_digest") == cat_digest
                and m.get("engine") == ENGINE_VERSION
                and os.path.isdir(dest)):
            return {**m, "skipped": True}

    t0 = time.time()
    ds = rd.read_parquet(files)
    rows_in = ds.count()
    if link_ref is None and catalog_path:
        # standalone call: load here; job runners pass one shared
        # link_ref so N partitions don't re-read + re-broadcast the
        # catalog N times per poll
        import ray

        from guac_ray.stages.linker import load_surface_map

        link_ref = ray.put(load_surface_map(catalog_path))
    triples = extract_triples(ds, link_ref=link_ref)
    tmp = dest + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    triples.write_parquet(tmp)
    if not os.path.isdir(tmp):
        # an all-rejected shard extracts ZERO edges and Ray's
        # write_parquet creates no directory for an empty dataset —
        # commit a typed empty part instead, or the partition becomes a
        # poison pill (os.replace FileNotFoundError on every poll)
        import pyarrow.parquet as pq

        from guac_ray.schemas import EDGE_SCHEMA

        os.makedirs(tmp, exist_ok=True)
        pq.write_table(EDGE_SCHEMA.empty_table(),
                       os.path.join(tmp, "part-0.parquet"))
    # the previous good output is deleted only AFTER the replacement
    # fully exists on disk — never destroy-then-hope
    shutil.rmtree(dest, ignore_errors=True)
    os.replace(tmp, dest)
    edges_out = rd.read_parquet(dest).count()
    wall = time.time() - t0

    manifest = {
        "part_id": part_id,
        "inputs": files,
        "input_digest": digest,
        "catalog_digest": cat_digest,
        "rows_in": rows_in,
        "edges_out": edges_out,
        "wall_sec": round(wall, 3),
        "engine": ENGINE_VERSION,
        "skipped": False,
    }
    # manifest written LAST (commit point)
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(manifest_path + ".tmp", manifest_path)
    with open(os.path.join(mx_dir, f"part-{part_id:04d}.json"), "w") as f:
        json.dump(
            {
                "part_id": part_id,
                "turns_per_sec": round(rows_in / wall, 1) if wall else None,
                "rows_in": rows_in,
                "edges_out": edges_out,
                "wall_sec": round(wall, 3),
            },
            f,
        )
    return manifest


def _stabilize_optional_imports() -> None:
    from guac_ray.compat import stabilize_optional_imports

    stabilize_optional_imports()


def run_graph_job(
    transcripts_dir: str,
    out_dir: str,
    catalog_path: str | None = None,
    num_partitions: int = 4,
    num_buckets: int = 64,
    exchange_dir: str | None = None,
    max_concurrent: int = 1,
    incremental: bool = False,
) -> dict:
    """Checkpointable end-to-end job. Stage A per-partition (resumable),
    stage B assembles from stage A's files (no re-extraction).

    ``max_concurrent > 1`` submits stage-A partitions from a thread
    pool — each partition is an independent Dataset execution, so
    concurrent submissions keep the cluster busy across the per-job
    setup gaps (the real-cluster shape: one driver, N in-flight
    partition jobs). Partition outputs are independent directories, so
    concurrency never races; manifests are written per-partition.

    ``incremental=True`` keys the plan on the persisted file → partition
    assignment (:func:`partition_inputs_incremental`): a rerun over a
    GROWN input directory extracts only partitions holding new or
    modified files and skips the rest on manifest digests — the
    steady-state collection mode. Stage B always reassembles (it is the
    cheap global dedup over stage-A files)."""
    if incremental:
        plan = partition_inputs_incremental(transcripts_dir, out_dir, num_partitions)
    else:
        plan = list(enumerate(partition_inputs(transcripts_dir, num_partitions)))
    if not plan:
        raise ValueError(
            f"run_graph_job: no transcript shards found under {transcripts_dir!r}"
        )
    link_ref = None
    if catalog_path:
        import ray

        from guac_ray.stages.linker import load_surface_map

        link_ref = ray.put(load_surface_map(catalog_path))
    if max_concurrent <= 1:
        manifests = [
            run_extract_partition(i, files, out_dir, catalog_path,
                                  link_ref=link_ref)
            for i, files in plan
        ]
    else:
        from concurrent.futures import ThreadPoolExecutor

        _stabilize_optional_imports()
        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            manifests = list(pool.map(
                lambda p: run_extract_partition(
                    p[0], p[1], out_dir, catalog_path, link_ref=link_ref),
                plan,
            ))
    # assemble ONLY the partitions in the current plan — a previous run
    # with a different num_partitions / input set leaves stale
    # raw_edges/part-* dirs that must not blend into the graph
    raw_root = os.path.join(out_dir, "raw_edges")
    current = {f"part-{m['part_id']:04d}" for m in manifests}
    for d in os.listdir(raw_root):
        if d not in current:
            shutil.rmtree(os.path.join(raw_root, d), ignore_errors=True)
    # same for stale stage-A manifests/metrics beyond the current plan
    for sub in ("_ckpt", "metrics"):
        p = os.path.join(out_dir, sub)
        if os.path.isdir(p):
            for f in os.listdir(p):
                # only part-* manifests are plan-scoped; the incremental
                # assignment file persists across runs
                if f.startswith("part-") and f.split(".")[0] not in current:
                    os.unlink(os.path.join(p, f))
    # steady-state fast path: when every stage-A partition was a digest
    # skip AND the assembled graph was built from exactly this plan, the
    # whole job is a no-op (the poll loop's common case)
    gpath = os.path.join(out_dir, "_ckpt", "graph.json")
    graph_digest = hashlib.sha256(json.dumps(
        sorted((m["part_id"], m["input_digest"]) for m in manifests)
    ).encode()).hexdigest()[:16]
    out_dirs = {k: os.path.join(out_dir, k)
                for k in ("edges", "nodes", "identifiers")}
    if all(m.get("skipped") for m in manifests) and os.path.exists(gpath):
        with open(gpath) as f:
            prev = json.load(f).get("graph_digest")
        if prev == graph_digest and all(os.path.isdir(d) for d in out_dirs.values()):
            return {
                "partitions": manifests,
                "skipped": len(manifests),
                "assembled": False,
                "edges_dir": out_dirs["edges"],
                "nodes_dir": out_dirs["nodes"],
                "identifiers_dir": out_dirs["identifiers"],
            }
    raw = rd.read_parquet(sorted(
        os.path.join(raw_root, d, f)
        for d in current
        for f in os.listdir(os.path.join(raw_root, d))
        if f.endswith(".parquet")
    ))
    edges = assemble_edges(raw, num_buckets=num_buckets, exchange_dir=exchange_dir)
    edges_dir = os.path.join(out_dir, "edges")
    tmp = edges_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(edges_dir, ignore_errors=True)
    edges.write_parquet(tmp)
    os.replace(tmp, edges_dir)
    # nodes derive from the WRITTEN edges — no pipeline re-execution
    nodes = nodes_from_edges(rd.read_parquet(edges_dir), num_buckets=max(8, num_buckets // 2))
    nodes_dir = os.path.join(out_dir, "nodes")
    tmp = nodes_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(nodes_dir, ignore_errors=True)
    nodes.write_parquet(tmp)
    os.replace(tmp, nodes_dir)

    # identifiers output — the collectsub feedback analog (SURVEY §2.1):
    # round k writes the discovered fetchable identifiers, round k+1's
    # collectors/enrichers read them (ingestor.go:168-180 re-expressed as
    # a table between batch rounds)
    import pyarrow as pa
    import pyarrow.compute as pc

    def idents(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["node_type"],
                        value_set=pa.array(["package", "source", "artifact"]))
        t = batch.filter(mask)
        return pa.table({"kind": t["node_type"], "identifier": t["node_key"]})

    ident_dir = os.path.join(out_dir, "identifiers")
    tmp = ident_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(ident_dir, ignore_errors=True)
    rd.read_parquet(nodes_dir).map_batches(idents, batch_format="pyarrow").write_parquet(tmp)
    os.replace(tmp, ident_dir)

    # commit point for the fast path above
    with open(gpath + ".tmp", "w") as f:
        json.dump({"graph_digest": graph_digest}, f)
    os.replace(gpath + ".tmp", gpath)

    return {
        "partitions": manifests,
        "skipped": sum(1 for m in manifests if m.get("skipped")),
        "assembled": True,
        "edges_dir": edges_dir,
        "nodes_dir": nodes_dir,
        "identifiers_dir": ident_dir,
    }


def poll_graph_job(
    transcripts_dir: str,
    out_dir: str,
    catalog_path: str | None = None,
    num_partitions: int = 4,
    num_buckets: int = 64,
    interval_sec: float = 10.0,
    max_polls: int | None = None,
    idle_stop: int | None = None,
    sleep_fn=time.sleep,
) -> dict:
    """Steady-state collection loop — the reference file collector's
    poll mode (file.go:105-119: UseLastModified + poll interval)
    re-expressed over the incremental partition assignment: every
    ``interval_sec`` re-run :func:`run_graph_job(incremental=True)`.
    Unchanged shards are manifest-digest no-ops; an unchanged PLAN skips
    assembly entirely (graph.json fast path), so an idle poll costs a
    directory listing and a digest. New/modified shards extract into
    their own partitions and trigger one reassembly — the resulting
    graph is always identical to a from-scratch rebuild (tested).

    Stops after ``max_polls`` polls, or after ``idle_stop`` consecutive
    polls that assembled nothing. ``sleep_fn`` is injectable for tests.
    Returns {polls, assemblies, idle_streak, last}."""
    polls = assemblies = idle = 0
    last: dict | None = None
    while True:
        polls += 1
        shards = (os.path.isdir(transcripts_dir)
                  and any(f.endswith(".parquet")
                          for f in os.listdir(transcripts_dir)))
        if not shards:
            # nothing has landed yet — the normal deployment race for a
            # poller (the reference file collector idles too, rather
            # than erroring on an empty watch dir); count as an idle
            # poll and keep waiting for the first shard
            res = {"assembled": False, "empty_dir": True}
        else:
            res = run_graph_job(
                transcripts_dir, out_dir, catalog_path=catalog_path,
                num_partitions=num_partitions, num_buckets=num_buckets,
                incremental=True,
            )
        last = res
        if res["assembled"]:
            assemblies += 1
            idle = 0
        else:
            idle += 1
        if max_polls is not None and polls >= max_polls:
            break
        if idle_stop is not None and idle >= idle_stop:
            break
        sleep_fn(interval_sec)
    return {"polls": polls, "assemblies": assemblies,
            "idle_streak": idle, "last": last}


def resume_status(out_dir: str) -> dict:
    ck = os.path.join(out_dir, "_ckpt")
    done = sorted(
        f for f in os.listdir(ck) if f.startswith("part-")
    ) if os.path.isdir(ck) else []
    return {"completed_partitions": len(done), "manifests": done}
