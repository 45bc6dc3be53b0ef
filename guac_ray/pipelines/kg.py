"""The flagship KG-construction pipeline (north rule):

    read_parquet(transcript shards)
      → stable sort (conv_id, turn_idx)          [ordering invariant]
      → map_batches(TranscriptExtractor)         [actor pool, Arrow in/out]
      → map_batches(EntityLinker)                [actor pool, broadcast map]
      → assemble: two-phase dedup shuffles       [edges + nodes]
      → write nodes/edges Parquet

This is the Ray-Data reimagination of the reference's
collect → process → parse → assemble chain (SURVEY.md §3.1,
cmd/guacone/cmd/files.go:59-179) — streaming with backpressure, no
driver-side row loops, no full materialization of the input.
"""

from __future__ import annotations

import os

import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from guac_ray.schemas import VALID_ROLES
from guac_ray.stages.assemble import assemble_edges, nodes_from_edges
from guac_ray.stages.extract import RejectRouter, TranscriptExtractor
from guac_ray.stages.linker import EntityLinker, put_link_map

__all__ = [
    "read_transcripts",
    "filter_valid",
    "extract_triples",
    "link_entities",
    "build_graph",
    "turn_text",
    "rejects",
    "write_graph",
    "ingest_predicates",
]

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(path: str | list[str], columns: list[str] | None = None) -> Dataset:
    """Parquet shard dir (or explicit file list) → Dataset, pruned at the
    read to the requested columns. Storage-scheme URIs (s3:// gs://
    file://) route through the object-store collector
    (sources/cloud.py) — the S3/GCS bucket collectors of the
    reference."""
    first = path if isinstance(path, str) else path[0]
    if "://" in first:
        from guac_ray.sources.cloud import read_parquet_uri

        return read_parquet_uri(path, columns=columns or TRANSCRIPT_COLUMNS)
    return rd.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS)


def filter_valid(ds: Dataset) -> Dataset:
    """Vectorized validity predicate (text non-empty, role in enum)."""

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.not_equal(batch["text"], pa.scalar("")),
            pc.is_in(batch["role"], value_set=pa.array(VALID_ROLES)),
        )
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(f, batch_format="pyarrow")


def cluster_by_conversation(
    ds: Dataset, exchange_dir: str, num_buckets: int = 32
) -> Dataset:
    """Hash-cluster transcripts by conv_id and sort (conv_id, turn_idx)
    within each cluster via the filesystem-partitioned exchange.

    The ordering invariant is PER-CONVERSATION (a conversation's turns in
    stable order, each conversation contiguous); a global total order is
    stronger than needed and costs an object-store all-to-all. This
    clustered layout delivers the invariant with two pure map phases that
    scale with workers — the same trade Hive/Spark ``CLUSTER BY`` makes.
    """
    import pandas as pd

    from guac_ray.exfs import exchange_fs, fresh_exchange_dir, fs_bucket_ids
    from guac_ray.stages.assemble import stable_hash

    fsys, _ = exchange_fs()  # resolved ONCE; task closures capture it
    # FRESH subdir per call (the dedup_exact_fs discipline): rmtree-ing
    # the caller's dir in place would repoint a LAZY Dataset returned by
    # an earlier call at this base — silent wrong rows or missing files
    # on its next consumption
    exchange_dir = fresh_exchange_dir(exchange_dir)

    def part(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["_cb"] = (stable_hash(df, ["conv_id"]) % num_buckets).astype("int64")
        return table_from_pandas(df, preserve_index=False)

    ds.map_batches(part, batch_format="pandas").write_parquet(
        exchange_dir, partition_cols=["_cb"], filesystem=fsys
    )
    bucket_dirs = [f"{exchange_dir}/_cb={b}"
                   for b in fs_bucket_ids(fsys, exchange_dir, "_cb")]
    # read back the columns that were WRITTEN (minus the bucket key):
    # a column-pruned input must not crash the read on absent fields
    sch = ds.schema()
    read_cols = ([n for n in sch.names if n != "_cb"]
                 if sch is not None else list(TRANSCRIPT_COLUMNS))

    def sorted_bucket(batch: pd.DataFrame) -> pa.Table:
        from guac_ray.exfs import fs_read_table

        outs = []
        for bdir in batch["bdir"]:
            df = fs_read_table(fsys, bdir,
                               columns=read_cols).to_pandas()
            outs.append(df.sort_values(["conv_id", "turn_idx"], kind="mergesort"))
        return table_from_pandas(
            pd.concat(outs, ignore_index=True), preserve_index=False
        )

    import ray.data as rd

    paths = rd.from_items([{"bdir": b} for b in bucket_dirs])
    return paths.map_batches(sorted_bucket, batch_format="pandas", batch_size=1)


def rejects(ds: Dataset) -> Dataset:
    """Invalid rows with a reason column (side-channel sink)."""
    return ds.map_batches(RejectRouter, batch_format="pyarrow", concurrency=(1, 2))


def extract_triples(
    ds: Dataset,
    concurrency=(1, 4),
    batch_size: int = 4096,
    link_ref=None,
) -> Dataset:
    """Transcript rows → raw edge rows. Patterns compile once per actor;
    ``link_ref`` (ray.put of a surface→key map) fuses entity linking into
    the same pass."""
    return ds.map_batches(
        TranscriptExtractor,
        fn_constructor_kwargs={"link_ref": link_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def link_entities(edges: Dataset, catalog_path: str, concurrency=(1, 2)) -> Dataset:
    """Alias keys → canonical keys via the broadcast catalog map."""
    ref = put_link_map(catalog_path)
    return edges.map_batches(
        EntityLinker,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def build_graph(
    transcripts_path: str | list[str],
    catalog_path: str | None = None,
    sort: bool = False,
    num_buckets: int = 64,
    extract_concurrency=(1, 4),
    exchange_dir: str | None = None,
) -> dict[str, Dataset]:
    """End-to-end: transcripts → {"edges": Dataset, "nodes": Dataset}.

    ``sort=False`` (default) skips the global (conv_id, turn_idx) sort:
    extraction is strictly per-turn and edge identity carries
    (conv_id, turn_idx), so the assembled graph is IDENTICAL either way
    — at 100 TB an all-to-all on the raw text column would be the job's
    single biggest data movement, spent on an ordering only the
    ``turn_text`` query consumes (and that query sorts its own slimmed
    projection). ``sort=True`` remains for callers that want
    conversation-contiguous batches into the extractor — it raises the
    per-actor dedup-cache hit rate at the cost of the shuffle.

    ``exchange_dir`` routes the dedup through the filesystem-partitioned
    exchange (scales near-linearly; phase 1 runs eagerly) — point it at
    fast local storage (/dev/shm here, the per-node shuffle store on a
    cluster).
    """
    import ray

    from guac_ray.stages.linker import load_surface_map

    ds = read_transcripts(transcripts_path)
    if sort:
        # NOTE: cluster_by_conversation (fs-exchange clustered order) was
        # measured 8× slower than the object-store sort for this text-heavy
        # input on this box — the transcript payload pays parquet
        # encode/decode twice. The object-store sort is cheap here (~4 s
        # for 7.5M rows); the fs exchange stays reserved for the DEDUP
        # shuffle where it wins.
        ds = ds.sort(["conv_id", "turn_idx"])
    # entity linking fused into extraction: the broadcast surface map is
    # applied at fact time (per-turn tool surfaces) instead of a separate
    # actor pool rescanning every edge column
    link_ref = ray.put(load_surface_map(catalog_path)) if catalog_path else None
    triples = extract_triples(ds, concurrency=extract_concurrency, link_ref=link_ref)
    # extractor-produced edges ⇒ justification/origin/collector are
    # functional — safe to slim through the exchange and refit
    edges = assemble_edges(
        triples, num_buckets=num_buckets, refit_functional=True,
        exchange_dir=os.path.join(exchange_dir, "dedup") if exchange_dir else None,
    )
    nodes = nodes_from_edges(edges, num_buckets=max(8, num_buckets // 2))
    return {"edges": edges, "nodes": nodes}


def ingest_predicates(
    edges_path: str | list[str],
    extra: Dataset | None = None,
    num_buckets: int = 32,
) -> dict[str, Dataset]:
    """Trusted triple import (the ``ingest_predicates`` parser —
    pkg/ingestor/parser/ingest_predicates/parser_ingest_predicates.go:44-60):
    pre-derived edge rows in the engine's identity schema bypass
    extraction, optionally union with freshly extracted ``extra`` edges,
    and flow straight into the assemble dedup — identical edges from
    both paths collapse because identity is the full payload."""
    from guac_ray.schemas import EDGE_IDENTITY

    ds = rd.read_parquet(edges_path)
    ds = ds.map_batches(lambda t: t.select(EDGE_IDENTITY), batch_format="pyarrow")
    if extra is not None:
        ds = ds.union(
            extra.map_batches(lambda t: t.select(EDGE_IDENTITY),
                              batch_format="pyarrow"))
    edges = assemble_edges(ds, num_buckets=num_buckets)
    return {"edges": edges, "nodes": nodes_from_edges(edges,
                                                      num_buckets=max(8, num_buckets // 2))}


def turn_text(transcripts_path: str | list[str]) -> Dataset:
    """Per-turn text under stable ordering — the invariant oracle table."""
    ds = read_transcripts(transcripts_path, columns=["conv_id", "turn_idx", "role", "text"])
    ds = filter_valid(ds)
    return ds.select_columns(["conv_id", "turn_idx", "text"]).sort(["conv_id", "turn_idx"])


def write_graph(graph: dict[str, Dataset], out_dir: str) -> dict[str, str]:
    """Write nodes/edges as partitioned Parquet directories."""
    paths = {}
    for name in ("edges", "nodes"):
        p = os.path.join(out_dir, name)
        graph[name].write_parquet(p)
        paths[name] = p
    return paths
