"""Recursive document unpack with a visited-set cycle guard
(SURVEY.md §2.2 "unpack 1→N explode").

The reference processor unpacks a document tree to parsable leaves in a
fixpoint loop and guards against self-referencing payloads
(pkg/handler/processor/process/process.go:123-167; the parser keeps a
visited set across the tree — parser.go:157-188). Here a "document" is
a JSON value that may embed child documents:

    {"format": "...", "blob": "<leaf content>"}                 leaf
    {"format": "...", "children": [<doc>, <doc>, ...]}          tree

``DocumentUnpacker`` is a map_batches actor stage: each input row's
payload unpacks DEPTH-FIRST with an explicit stack (no recursion), a
per-root digest visited set (a child byte-identical to any ancestor or
prior sibling is skipped and counted — the cycle guard), and a depth
bound. Output is 1→N leaf rows; malformed payloads route to a reject
row instead of raising (log-and-continue, process.go:200-207).
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from ray.data import Dataset

__all__ = ["DocumentUnpacker", "unpack_documents"]

_OUT_SCHEMA = pa.schema(
    [
        ("root_id", pa.string()),
        ("depth", pa.int32()),
        ("format", pa.string()),
        ("blob", pa.string()),
        ("blob_digest", pa.string()),
        # "leaf" | "cycle_skipped" | "reject" | "depth_truncated" |
        # "children_truncated" — every input node accounts for a row,
        # so rejects+leaves+markers reconcile with inputs (silent drops
        # are invisible to monitoring)
        ("status", pa.string()),
    ]
)


def _digest(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


class DocumentUnpacker:
    """Actor-pool batch UDF: (doc_id, payload) rows → leaf rows."""

    def __init__(self, max_depth: int = 8, max_children: int = 10_000):
        self.max_depth = max_depth
        self.max_children = max_children

    def _unpack_one(self, root_id: str, payload: str) -> list[tuple]:
        out: list[tuple] = []
        try:
            root = json.loads(payload)
        except (json.JSONDecodeError, TypeError):
            return [(root_id, 0, "", "", _digest(payload or ""), "reject")]
        # visited set spans the WHOLE tree (cross-branch duplicates skip
        # too — the reference dedups identical blobs once per ingest)
        seen: set[str] = set()
        stack: list[tuple[dict, int]] = [(root, 0)]
        # EVERY emitted row counts toward the bound (cycle_skipped rows
        # included), so max_children actually bounds the output size
        while stack and len(out) < self.max_children:
            doc, depth = stack.pop()
            canon = json.dumps(doc, sort_keys=True, separators=(",", ":"))
            if not isinstance(doc, dict):
                # a malformed child (string/number/array) gets a REJECT
                # row, not a silent drop — log-and-continue means the
                # reject channel sees it
                out.append((root_id, depth, "", "", _digest(canon),
                            "reject"))
                continue
            dg = _digest(canon)
            if dg in seen:
                out.append((root_id, depth, str(doc.get("format", "")),
                            "", dg, "cycle_skipped"))
                continue
            seen.add(dg)
            children = doc.get("children")
            if children and depth < self.max_depth:
                for ch in reversed(children):
                    stack.append((ch, depth + 1))
                continue
            if children:
                # AT the depth bound with a subtree below: a marker row,
                # never a well-formed empty 'leaf' that silently eats
                # the subtree
                out.append((root_id, depth, str(doc.get("format", "")),
                            "", dg, "depth_truncated"))
                continue
            blob = str(doc.get("blob", ""))
            out.append((root_id, depth, str(doc.get("format", "")),
                        blob, _digest(blob), "leaf"))
        if stack:
            # max_children exhausted with work remaining: one loud
            # marker instead of a silently shortened result
            out.append((root_id, stack[-1][1], "", "",
                        _digest(""), "children_truncated"))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows: list[tuple] = []
        for i, p in zip(ids, payloads):
            rows.extend(self._unpack_one(str(i), p or ""))
        if not rows:
            return _OUT_SCHEMA.empty_table()
        cols = list(zip(*rows))
        return pa.Table.from_arrays(
            [pa.array(c, type=_OUT_SCHEMA.field(j).type) for j, c in enumerate(cols)],
            schema=_OUT_SCHEMA,
        )


def unpack_documents(
    ds: Dataset, max_depth: int = 8, concurrency=(1, 2)
) -> Dataset:
    """Explode nested (doc_id, payload) rows to leaf documents."""
    return ds.map_batches(
        DocumentUnpacker,
        fn_constructor_kwargs={"max_depth": max_depth},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
