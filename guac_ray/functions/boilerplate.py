"""Sub-document boilerplate removal: drop turns/lines whose exact text
recurs across ≥ ``min_groups`` distinct groups (conversations, domains,
pages). This is the inter-document complement of doc-level dedup — a
corpus can be exactly deduplicated at document granularity and still be
40% templated system preamble at turn granularity (reference analog:
GUAC's per-document parsers skip shared header blocks the same way,
pkg/ingestor/parser/common; the operator here generalizes it to any
grouped text table).

Scale shape (100 TB posture):
  * identity is md5(text) — the same full-payload-hash discipline as
    ``functions.dedup.exact_dedup``; the shuffle carries 16-byte digests
    + group keys, never text;
  * distinct-(text, group) pairs and per-text group counts are BOTH
    two-phase ``grouped_agg`` passes (partial combine per batch, coarse
    hash buckets), so per-key skew — one preamble in every conversation
    — never lands on one reducer;
  * the boilerplate set is bounded above by total_turns / min_groups,
    so at a meaningful threshold it is tiny by construction and
    broadcasts via ``ray.put`` (size-guarded by ``broadcast_cap``);
  * the filter pass is a stateful ACTOR map — the digest frozenset
    (potentially hundreds of MB at the cap) deserializes from plasma
    ONCE per actor in ``__init__``, never per batch.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray

from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas
from guac_ray.functions.dedup import _text_md5 as _digest_col

__all__ = ["boilerplate_digests", "flag_boilerplate", "strip_boilerplate",
           "strip_boiler_lines"]


def boilerplate_digests(
    ds: Dataset,
    text_col: str,
    group_col: str,
    min_groups: int,
    num_buckets: int = 16,
    broadcast_cap: int = 5_000_000,
) -> set[str]:
    """md5 digests of texts that occur in ≥ ``min_groups`` DISTINCT
    groups. Exact distinct counting in two ``grouped_agg`` passes:
    (digest, group) → distinct pairs, then digest → pair count."""
    from guac_ray.stages.groupagg import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "h": _digest_col(t[text_col].to_pylist()),
            "g": t[group_col].to_pylist(),
        }).drop_duplicates()
        return table_from_pandas(df, preserve_index=False)

    pairs = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["h", "g"], {"_n": ("g", "count")}, num_buckets=num_buckets,
    )
    counts = grouped_agg(
        pairs, ["h"], {"n_groups": ("g", "count")}, num_buckets=num_buckets,
    )
    hot = counts.map_batches(
        lambda df: df[df["n_groups"] >= min_groups][["h"]],
        batch_format="pandas",
    )
    # limit() bounds what reaches the driver BEFORE the pull, so a
    # degenerate threshold (min_groups=1 → every distinct text) raises
    # instead of OOMing the driver; ≤ cap rows means limit() is a no-op
    out = hot.limit(broadcast_cap + 1).take_all()
    if len(out) > broadcast_cap:
        raise ValueError(
            f"boilerplate set exceeds broadcast_cap={broadcast_cap} "
            f"digests; raise min_groups or the cap")
    return {r["h"] for r in out}


def flag_boilerplate(
    ds: Dataset,
    text_col: str,
    digests: set[str],
    flag_col: str = "is_boiler",
    concurrency=(1, 4),
) -> Dataset:
    """Add a boolean column: text's md5 is in the boilerplate set. The
    set ships once per ACTOR (``ray.get`` in ``__init__``) — a plain
    task function would re-deserialize the whole frozenset on every
    batch, since only numpy buffers are zero-copy out of plasma."""
    ref = ray.put(frozenset(digests))

    class Flag:
        def __init__(self):
            self.bp = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            hs = _digest_col(t[text_col].to_pylist())
            return t.append_column(
                flag_col,
                pa.array([h in self.bp for h in hs], type=pa.bool_()))

    return ds.map_batches(Flag, batch_format="pyarrow",
                          concurrency=concurrency)


def strip_boilerplate(
    ds: Dataset,
    text_col: str,
    group_col: str,
    min_groups: int,
    num_buckets: int = 16,
) -> Dataset:
    """Rows whose text is NOT cross-group boilerplate (two passes over
    the input: count, then filter — the input is read twice and
    streamed both times; nothing data-sized is ever materialized)."""
    digests = boilerplate_digests(
        ds, text_col, group_col, min_groups, num_buckets=num_buckets)
    flagged = flag_boilerplate(ds, text_col, digests)
    return flagged.map_batches(
        lambda t: t.filter(pa.compute.invert(t["is_boiler"]))
                   .drop_columns(["is_boiler"]),
        batch_format="pyarrow",
    )


def strip_boiler_lines(
    ds: Dataset,
    text_col: str,
    id_col: str,
    min_docs: int,
    num_buckets: int = 16,
    broadcast_cap: int = 5_000_000,
    out_dropped: str = "n_dropped",
    concurrency=(1, 4),
) -> Dataset:
    """LINE-level boilerplate removal (the RefinedWeb/C4 cleanup step):
    rewrite each document, dropping every '\\n'-separated line whose
    exact text appears in ≥ ``min_docs`` DISTINCT documents — nav bars,
    cookie banners, footers — and counting the drops per doc.

    Same two-streamed-pass shape as ``strip_boilerplate``, one level
    down: pass 1 EXPLODES lines (arrow ``split_pattern`` +
    ``list_parent_indices`` — no Python row loop) into the same
    digest-only distinct-count exchanges; pass 2 rewrites each doc
    against the broadcast digest set, preserving line order. A line
    recurring *within* one document counts that document once and, if
    flagged, every copy is dropped. Documents are never dropped — a
    fully-boilerplate doc comes back with empty text (filter on
    ``n_dropped``/emptiness downstream if desired). Note empty lines
    ("\\n\\n") are lines too: frequent enough and they are boilerplate
    by the rule, which also collapses blank-line padding.

    NULL text contributes no lines in EITHER pass (``split_pattern`` on
    a null yields no list elements, and the rewrite skips nulls), so a
    null doc keeps its null text and reads ``n_dropped = 0`` — treating
    it as one empty line in the rewrite would phantom-drop a line the
    count pass never saw."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        lines = pc.split_pattern(
            t[text_col].combine_chunks().cast(pa.string()), "\n")
        idx = pc.list_parent_indices(lines)
        return pa.table({
            id_col: t[id_col].combine_chunks().take(idx),
            "line": pc.list_flatten(lines),
        })

    digests = boilerplate_digests(
        ds.map_batches(explode, batch_format="pyarrow"),
        "line", id_col, min_docs,
        num_buckets=num_buckets, broadcast_cap=broadcast_cap)
    ref = ray.put(frozenset(digests))

    class Rewrite:
        """Digest set deserializes once per actor, not per batch."""

        def __init__(self):
            self.bp = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            kept, dropped = [], []
            for s in t[text_col].to_pylist():
                if s is None:       # no lines in pass 1 → none here
                    kept.append(None)
                    dropped.append(0)
                    continue
                ls = s.split("\n")
                kl = [ln for ln in ls
                      if hashlib.md5(ln.encode("utf-8")).hexdigest()
                      not in self.bp]
                kept.append("\n".join(kl))
                dropped.append(len(ls) - len(kl))
            i = t.schema.get_field_index(text_col)
            out = t.set_column(i, text_col,
                               pa.array(kept, type=pa.string()))
            return out.append_column(out_dropped,
                                     pa.array(dropped, type=pa.int64()))

    return ds.map_batches(Rewrite, batch_format="pyarrow",
                          concurrency=concurrency)
