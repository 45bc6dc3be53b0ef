"""Transcript source readers — the collector/format-guesser analog
(SURVEY.md §2.1-2.2).

The reference guesses format (JSON / JSON-Lines / XML) then validates
per-type schemas (process/process.go:170-207). Here sources are files:
the format sniffer keys on extension + a content peek, every format
normalizes to the ``input_hint`` Arrow schema, and rows that cannot be
coerced route to rejects rather than crashing. Compressed json/csv
(.gz/.zst/.bz2) decode through Arrow's codec input stream
(``arrow_open_stream_args``) — the reference's Encoding enum analog
(process/process.go:217-253).

Registry (§2.11 plugin surface): ``register_reader("ext", fn)``.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from guac_ray.schemas import TRANSCRIPT_SCHEMA

__all__ = ["read_transcripts_any", "register_reader", "sniff_format", "coerce_schema"]

_READERS: dict[str, callable] = {}


def register_reader(ext: str, fn) -> None:
    """Plugin registry with overwrite-error semantics (the reference's
    Register* pattern — collector.go:62-71)."""
    if ext in _READERS:
        raise ValueError(f"reader already registered for {ext!r}")
    _READERS[ext] = fn


_COMP_EXTS = {".gz": "gzip", ".zst": "zstd", ".zstd": "zstd", ".bz2": "bz2"}


def sniff_compression(path: str) -> str | None:
    """Arrow codec name from the filename suffix (Encoding enum analog —
    process/process.go:217-253 dispatches bzip2/zstd decompressors)."""
    base = path.lower()
    for ext, codec in _COMP_EXTS.items():
        if base.endswith(ext):
            return codec
    return None


def open_maybe_compressed(path: str):
    """Binary reader with the compression suffix transparently decoded
    through Arrow's codec layer (gzip/zstd/bz2 — the same Encoding set
    process.go:217-253 dispatches). Plain files open directly."""
    import pyarrow as pa

    codec = sniff_compression(path)
    if codec is None:
        return open(path, "rb")
    return pa.CompressedInputStream(pa.OSFile(path, "rb"), codec)


def sniff_format(path: str) -> str:
    """Extension-first format guess with a content peek fallback
    (guesser chain analog — first match wins). Compression suffixes
    (.gz/.zst/.bz2) are transparent to the format guess."""
    base = path.lower()
    for cext in _COMP_EXTS:
        if base.endswith(cext):
            base = base[: -len(cext)]
            break
    for ext in (".parquet", ".jsonl", ".ndjson", ".json", ".csv"):
        if base.endswith(ext):
            return ext.lstrip(".")
    with open(path, "rb") as f:
        head = f.read(64)
    if head.startswith(b"PAR1"):
        return "parquet"
    if head.lstrip()[:1] in (b"{", b"["):
        return "json"
    return "csv"


def _salvage_cast(col, typ: pa.DataType) -> pa.Array:
    """Element-wise cast with PER-ROW null-on-failure — the fallback
    when the whole-column cast raises. Nulling the entire column there
    would silently reject-route every VALID row in the batch (one bad
    value ≠ 10k bad rows); a 1-element array cast per row reproduces
    Arrow's column-cast semantics exactly, paid only on the salvage
    path."""
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            out.append(pa.array([v]).cast(typ)[0].as_py())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError, TypeError, ValueError, OverflowError):
            out.append(None)
    return pa.array(out, type=typ)


def coerce_schema(ds: Dataset) -> Dataset:
    """Cast to the canonical transcript schema; rows whose turn_idx/ts
    cannot coerce become nulls → downstream validity filter routes them
    (reject side-channel, never a crash). The null-routing is PER ROW:
    a failed column cast falls back to element-wise salvage."""

    def cast(batch: pa.Table) -> pa.Table:
        cols = {}
        for f in TRANSCRIPT_SCHEMA:
            if f.name in batch.column_names:
                col = batch[f.name]
                try:
                    cols[f.name] = col.cast(f.type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                        pa.ArrowTypeError):
                    # ArrowNotImplementedError covers nested-typed JSON
                    # columns (an object-valued 'text' infers as struct)
                    cols[f.name] = _salvage_cast(col, f.type)
            else:
                cols[f.name] = pa.nulls(batch.num_rows, f.type)
        return pa.table(cols)

    return ds.map_batches(cast, batch_format="pyarrow")


def read_transcripts_any(paths: str | list[str]) -> Dataset:
    """Read transcript rows from parquet / json / json-lines / csv files
    (mixed directories allowed), normalized to the canonical schema.
    Multi-source union = one Dataset over all shards (collector fan-in)."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            # FILES only: a nested directory would crash sniff_format's
            # content peek with IsADirectoryError
            paths = [os.path.join(paths, f)
                     for f in sorted(os.listdir(paths))
                     if os.path.isfile(os.path.join(paths, f))]
        else:
            paths = [paths]
    if not paths:
        # empty directory/list: typed empty (the read_edge_documents
        # guard), not IndexError on parts[0]
        return rd.from_arrow(TRANSCRIPT_SCHEMA.empty_table())
    # group by (format, compression): every group becomes one read, and
    # compressed json/csv shards decode through Arrow's codec stream
    by_fmt: dict[tuple[str, str | None], list[str]] = {}
    for p in paths:
        by_fmt.setdefault((sniff_format(p), sniff_compression(p)), []).append(p)

    parts: list[Dataset] = []
    for (fmt, comp), ps in sorted(by_fmt.items(), key=lambda kv: (kv[0][0], kv[0][1] or "")):
        stream_args = {"compression": comp} if comp else None
        if fmt in _READERS:
            parts.append(_READERS[fmt](ps))
        elif fmt == "parquet":
            parts.append(rd.read_parquet(ps))  # parquet compression is internal
        elif fmt in ("json", "jsonl", "ndjson"):
            parts.append(coerce_schema(
                rd.read_json(ps, arrow_open_stream_args=stream_args)))
        elif fmt == "csv":
            parts.append(coerce_schema(
                rd.read_csv(ps, arrow_open_stream_args=stream_args)))
        else:
            raise ValueError(f"unsupported transcript format: {fmt}")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
