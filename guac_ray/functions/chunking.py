"""Document chunking: split each document into overlapping fixed-size
codepoint windows — the context-window preparation step of an LLM
training pipeline (every pretraining corpus transits a chunker between
curation and tokenization).

Chunk rule (stated so a SQL oracle can mirror it bit-for-bit):

- ``n_chunks(len) = 1`` if ``len <= size``, else
  ``ceil((len - size) / stride) + 1`` — evaluated in DOUBLE in both
  engines, so the same IEEE division/ceil happens on both sides.
- chunk ``i`` covers codepoints ``[i*stride, i*stride + size)`` —
  DuckDB ``substring(text, i*stride + 1, size)`` exactly.

Every document yields at least one chunk (empty text → one empty
chunk), the last chunk may be shorter than ``size``, and consecutive
chunks overlap by ``size - stride`` codepoints (the standard sliding
window; ``stride == size`` gives disjoint chunks).

Scale: a PURE MAP — no shuffle, no state, zero-copy Arrow in, Arrow
out. The per-batch work is one ``utf8_length`` pass plus one
``utf8_slice_codeunits`` kernel (codepoint-indexed despite
the name — verified against SQL ``substring``) per chunk INDEX present in the batch
(a handful of vectorized passes — never a per-row Python loop), so
throughput is storage-bound at any scale. Output rows are written
per-block like every map stage; a 100-TB corpus chunks shard-parallel
with no cross-worker traffic at all.

No analog in the reference (documents there are parsed, not windowed);
this extends the SURVEY §2 text-analysis family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["chunk_documents"]


def chunk_documents(
    ds: Dataset,
    text_col: str,
    size: int,
    stride: int,
    id_cols: list[str] | None = None,
) -> Dataset:
    """Explode each row into overlapping ``size``-codepoint windows every
    ``stride`` codepoints. Output columns: ``id_cols`` (default: every
    non-text column), ``chunk_idx`` (int64, 0-based) and ``chunk``
    (the window text)."""
    if size < 1 or stride < 1:
        raise ValueError("chunk_documents: size and stride must be >= 1")
    if stride > size:
        raise ValueError(
            "chunk_documents: stride > size would drop codepoints between "
            "consecutive windows")

    def explode(batch: pa.Table) -> pa.Table:
        ids = id_cols if id_cols is not None else [
            c for c in batch.column_names if c != text_col]
        # Drop null-text rows BEFORE computing lengths: a null length is
        # NaN after to_numpy and its int64 cast is undefined (observed:
        # min-int64 chunk counts), and an ALL-null batch would otherwise
        # leave ``outs`` empty. The SQL oracle drops null text the same
        # way (length(NULL) joins nothing).
        batch = batch.filter(pc.is_valid(batch.column(text_col)))
        text = batch.column(text_col)
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        # the SAME double expression the SQL oracle evaluates
        over = np.maximum(lens - size, 0).astype("float64")
        nc = np.where(lens <= size, 1,
                      np.ceil(over / float(stride)) + 1).astype("int64")
        if len(nc) == 0:
            return pa.table(
                {**{c: batch.column(c) for c in ids},
                 "chunk_idx": pa.array([], pa.int64()),
                 "chunk": pa.array([], pa.string())})
        outs = []
        nc_arr = pa.array(nc)
        for i in range(int(nc.max())):
            mask = pc.greater(nc_arr, i)
            sub = batch.filter(mask)
            sliced = pc.utf8_slice_codeunits(
                sub.column(text_col), start=i * stride,
                stop=i * stride + size)
            outs.append(pa.table(
                {**{c: sub.column(c) for c in ids},
                 "chunk_idx": pa.array(
                     np.full(sub.num_rows, i, dtype="int64")),
                 "chunk": sliced}))
        return pa.concat_tables(outs)

    return ds.map_batches(explode, batch_format="pyarrow")
