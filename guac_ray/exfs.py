"""Pluggable EXCHANGE filesystem (r4 verdict "what's wrong #2").

Every fs-exchange stage (dedup, hash join, grouped agg, windows,
pagerank/paths buckets) writes hash-partitioned Parquet and reads it
back per bucket. On this single node the default root is node-local
``/dev/shm`` — correct and fast. On the multi-node cluster the north
rule targets, phase-2 tasks must see every node's bucket files, so the
exchange root has to live on a SHARED filesystem (NFS/Lustre/S3/GCS —
or a MinIO-style on-prem store). This module is the one switch:

  * ``set_exchange_filesystem(fs, base)`` — explicit injection (tests
    use a ``SubTreeFileSystem``, exactly the ``sources/cloud.py``
    pattern; a deployment passes an ``S3FileSystem`` + bucket prefix).
  * ``$GUAC_RAY_EXCHANGE_URI`` — scheme-routed via
    ``sources.cloud.resolve_filesystem`` (``s3://…``, ``gs://…``,
    ``file:///shared/mount``), picked up at first use.
  * neither → ``LocalFileSystem`` on ``/dev/shm`` (the sandbox).

IMPORTANT: module state lives on the DRIVER only — Ray workers import
this module fresh, so stage builders must resolve ``exchange_fs()``
once at graph-build time and let the task CLOSURES capture the
(picklable) filesystem object. Every helper below therefore takes the
filesystem explicitly; none consults global state at task runtime.
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.fs as pafs

__all__ = [
    "set_exchange_filesystem", "exchange_fs",
    "fs_mkdirs", "fs_rmtree", "fs_listdir", "fs_list_files",
    "fs_read_table", "fs_num_rows",
    "bucket_of_keys", "read_bucket_df",
]

_STATE: dict = {"fs": None, "base": None}


def set_exchange_filesystem(filesystem=None, base: str | None = None) -> None:
    """Install the filesystem + base dir all exchange stages resolve
    against. Call on the driver BEFORE building pipelines (lazy
    Datasets capture the filesystem current at build time).
    ``set_exchange_filesystem()`` resets to the node-local default."""
    _STATE["fs"] = filesystem
    _STATE["base"] = base


def _local_base() -> str:
    return "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def exchange_fs() -> tuple:
    """(filesystem, base_dir) for exchange IO — injection wins, then
    ``$GUAC_RAY_EXCHANGE_URI``, then local RAM-backed default."""
    if _STATE["fs"] is not None or _STATE["base"] is not None:
        return (_STATE["fs"] or pafs.LocalFileSystem(),
                _STATE["base"] if _STATE["base"] is not None
                else _local_base())
    uri = os.environ.get("GUAC_RAY_EXCHANGE_URI")
    if uri:
        from guac_ray.sources.cloud import resolve_filesystem

        f, p = resolve_filesystem(uri)
        return f, p.rstrip("/")
    return pafs.LocalFileSystem(), _local_base()


def fs_mkdirs(f, path: str) -> None:
    f.create_dir(path, recursive=True)


def fs_rmtree(f, path: str) -> None:
    try:
        f.delete_dir(path)
    except (OSError, pa.ArrowIOError):  # already gone / racing pruner
        pass


def fs_listdir(f, path: str) -> list["pafs.FileInfo"]:
    """Direct children of ``path`` ([] when the dir doesn't exist)."""
    try:
        return f.get_file_info(
            pafs.FileSelector(path, allow_not_found=True, recursive=False))
    except FileNotFoundError:
        return []


def fs_list_files(f, path: str, suffix: str = ".parquet") -> list[str]:
    """Sorted file paths under ``path`` ending in ``suffix``."""
    return sorted(
        i.path for i in fs_listdir(f, path)
        if i.type == pafs.FileType.File and i.path.endswith(suffix))


def fs_bucket_ids(f, root: str, col: str = "_bucket") -> list[int]:
    """Sorted bucket ids of the hive dirs ``<root>/<col>=K``."""
    pre = f"{col}="
    out = []
    for i in fs_listdir(f, root):
        name = i.path.rsplit("/", 1)[-1]
        if i.type == pafs.FileType.Directory and name.startswith(pre):
            out.append(int(name[len(pre):]))
    return sorted(out)


def fs_read_table(f, path: str, columns: list[str] | None = None):
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns, filesystem=f)


def fs_num_rows(f, path: str) -> int:
    """Row count from the Parquet footer — no data read."""
    import pyarrow.parquet as pq

    return pq.read_metadata(path, filesystem=f).num_rows


def _exchange_owner_tag() -> str:
    import os
    import socket

    return f"{socket.gethostname()}-{os.getpid()}"


def _owner_dead(name: str) -> bool | None:
    """Parse ``host-pid-uuid`` from an exchange dir name: True when
    the creating process is provably dead ON THIS HOST, False when
    provably alive here, None when unknowable (another host, or a
    legacy/unparsable name)."""
    import os
    import socket

    parts = name.rsplit("-", 2)
    if len(parts) != 3 or not parts[1].isdigit():
        return None
    host, pid = parts[0], int(parts[1])
    if host != socket.gethostname():
        return None
    try:
        os.kill(pid, 0)
        return False
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # exists, other uid


def fresh_exchange_dir(base: str) -> str:
    """A unique subdirectory per exchange use, on the CONFIGURED
    exchange filesystem. Callers pass a stable base path; each call
    gets its own subdir so a previously returned lazy Dataset — which
    re-reads its exchange files on every consumption — is never
    silently repointed at newer data by a later call with the same
    base.

    Pruning policy: dir names embed ``host-pid``, so ANOTHER LIVE
    driver's dirs on a shared base are recognizable and never deleted
    (the per-process registry alone cannot see them — deleting a live
    sibling's exchange mid-consumption is silent data loss). A dir is
    pruned when its creator is provably dead on this host and it is
    older than one hour, or — for foreign hosts / legacy names, where
    liveness is unknowable — only after 24 hours."""
    f, _ = exchange_fs()
    fs_mkdirs(f, base)
    now = time.time()
    for info in fs_listdir(f, base):
        if info.path in _LIVE_EXCHANGE_DIRS:
            continue
        name = info.path.rsplit("/", 1)[-1]
        dead = _owner_dead(name)
        if dead is False:
            continue  # live sibling driver on this host
        ttl = 3600 if dead else 86400
        try:
            # mtime=None (object stores synthesize directory entries
            # with no timestamp): treating it as 'created now' would
            # make dead dirs IMMORTAL — the exact leak this pruner
            # exists to stop. A provably-dead owner's dir is prunable
            # regardless of age; an unknowable one is kept (no way to
            # bound the risk without a timestamp).
            if info.mtime is not None:
                age = now - info.mtime.timestamp()
            else:
                age = float("inf") if dead else -1.0
            if age > ttl:
                if info.type == pafs.FileType.Directory:
                    fs_rmtree(f, info.path)
                else:
                    f.delete_file(info.path)
        except (OSError, pa.ArrowIOError):
            pass
    p = (f"{base.rstrip('/')}/{_exchange_owner_tag()}-"
         f"{uuid.uuid4().hex[:12]}")
    _LIVE_EXCHANGE_DIRS.add(p)
    return p


# every exchange dir handed out by THIS process: a lazy Dataset returned
# hours ago still re-reads its files on each consumption, so dirs this
# process created are never pruned, no matter their age — only leftovers
# from DEAD processes (not in the registry) age out.
_LIVE_EXCHANGE_DIRS: set[str] = set()


def default_exchange(name: str) -> str:
    """Default exchange base for a named stage on the configured
    exchange filesystem. ALL exchange users resolve through here so the
    base-dir policy lives once."""
    _, base = exchange_fs()
    return f"{base.rstrip('/')}/guac_ray_exchange/{name}"


def bucket_of_keys(keys, num_buckets: int):
    """Exchange bucket id per key value — the ONE hash every
    graph-iteration operator (pagerank / hits / label_propagation)
    uses for its node/score/stub layouts. A single definition: the
    bucket assignment is a cross-layout CONTRACT (edge bucket k joins
    score bucket k), so a divergent copy silently breaks every
    co-partitioned read."""
    from guac_ray.stages.assemble import stable_hash

    return (stable_hash(keys.to_frame("k"), ["k"])
            % num_buckets).astype("int64")


def read_bucket_df(f, root: str, k: int, columns=None):
    """All parquet files of ``root/_bucket=k`` as ONE pandas frame
    (None when the bucket has no files) — the per-bucket read the
    graph-iteration operators' tasks run against the exchange."""
    import pyarrow as pa

    fls = fs_list_files(f, f"{root}/_bucket={k}")
    if not fls:
        return None
    return pa.concat_tables(
        [fs_read_table(f, x, columns=columns) for x in fls]).to_pandas()
