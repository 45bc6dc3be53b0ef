"""Shared flat-map document reader for the real-format parser family
(SPDX / CycloneDX / OpenVEX / CSAF): one path-table → map_batches
pipeline, gzip-transparent, malformed documents reject-routed unless
``strict``. Each parser module wraps this with its own parse function
and error type — the parse is the only per-format code.

Scale shape: documents are the unit of work (KB–MB each, parsed as a
unit); the distribution axis is ACROSS documents — a pure map with no
shuffle, so throughput scales with workers and document count, and a
failed run re-reads only unprocessed paths.
"""

from __future__ import annotations

import pyarrow as pa

from guac_ray.schemas import EDGE_IDENTITY


def props_json(d: "dict | None") -> str:
    """Canonical edge-identity props serialization (sorted keys, no
    spaces, empty dict → "{}"). ONE definition for every source
    parser: cross-source exact dedup keys on this string
    byte-for-byte, so a divergent copy (different separators) would
    silently split identical edges."""
    import json

    return (json.dumps(d, sort_keys=True, separators=(",", ":"))
            if d else "{}")

__all__ = ["edges_table", "read_edge_documents"]


def edges_table(rows: list[tuple]) -> pa.Table:
    """EDGE_IDENTITY 9-tuples → typed Arrow table ([] keeps schema)."""
    cols = list(zip(*rows)) if rows else [[] for _ in EDGE_IDENTITY]
    return pa.table({n: pa.array(list(c), type=pa.string())
                     for n, c in zip(EDGE_IDENTITY, cols)})


def read_edge_documents(
    paths: str | list[str],
    parse_fn,
    error_cls: type,
    strict: bool = False,
    batch_size: int = 8,
):
    """JSON/JSON.GZ documents → Dataset of EDGE_IDENTITY rows via
    ``parse_fn(blob, source=path)``. ``error_cls`` failures are skipped
    (reject route) unless ``strict``."""
    import os

    import ray.data as rd

    _DOC_EXTS = (".json", ".xml", ".jsonl", ".ndjson")
    _COMP = (".gz", ".zst", ".zstd", ".bz2")
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(_DOC_EXTS)
                or (f.endswith(_COMP)
                    and f.rsplit(".", 1)[0].endswith(_DOC_EXTS)))
        else:
            paths = [paths]
    if not paths:
        return rd.from_arrow(edges_table([]))

    def parse_paths(batch: pa.Table) -> pa.Table:
        from guac_ray.sources.readers import open_maybe_compressed

        rows: list[tuple] = []
        for p in batch["path"].to_pylist():
            try:
                # container failures (truncated .gz, vanished file) are
                # malformed documents too — inside the reject route,
                # or one bad file kills the whole non-strict read
                with open_maybe_compressed(p) as f:
                    blob = f.read()
                rows.extend(parse_fn(blob, source=p))
            except error_cls:
                if strict:
                    raise
            except (OSError, EOFError, pa.ArrowInvalid) as ex:
                if strict:
                    raise error_cls(f"unreadable container {p}: {ex}") from ex
        return edges_table(rows)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        parse_paths, batch_format="pyarrow", batch_size=batch_size)
