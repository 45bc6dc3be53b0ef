"""Sequence packing for LLM training shards: group documents into
sequences of at most ``budget`` tokens (token = an
``[A-Za-z0-9_]+`` word run, the ``utf8_stats`` grammar — NOT
whitespace splitting: punctuation-only text counts 0).

Optimal bin packing is NP-hard and inherently sequential; the
distributed discipline here is the same one production packers use:
assign each doc to a DETERMINISTIC bucket (md5 of its id — stable
under any partitioning, resume, or backfill), then run first-fit-
decreasing WITHIN each bucket. Every emitted sequence respects the
budget; the only cost of bucketing is a slightly higher sequence count
than a global greedy pass would produce (bounded: FFD within a bucket
wastes < 1 doc-slot per bin vs its own optimum, and buckets pack
independently — at 10^12 docs a global pass is not an option anyway).

Output is fully deterministic: bucket id + FFD over (tokens desc,
id asc) ⇒ identical sequences for any block layout, so a resumed or
re-partitioned run reproduces the same shards bit-for-bit.

Docs longer than the budget get a single-doc sequence flagged
``oversize`` (the caller decides whether to truncate or drop — this
operator never silently loses a document).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from guac_ray.functions.text import utf8_stats

__all__ = ["pack_sequences"]


class _LeftmostFit:
    """Max-segment-tree over bins in creation order: find the LEFTMOST
    bin with residual ≥ t in O(log n) — the exact first-fit rule, so
    packings are identical to the naive scan, without its O(n·bins)
    blowup when most docs open new bins (1M docs/bucket would otherwise
    cost ~5·10¹¹ Python comparisons in one task)."""

    def __init__(self, max_bins: int):
        self.cap = 1
        while self.cap < max(1, max_bins):
            self.cap *= 2
        self.tree = np.zeros(2 * self.cap, dtype=np.int64)  # max residual
        self.n = 0  # bins created

    def push(self, residual: int):
        i = self.cap + self.n
        self.n += 1
        self.tree[i] = residual
        i //= 2
        while i:
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
            i //= 2

    def take(self, t: int) -> int:
        """Leftmost bin with residual ≥ t (or -1); decrements it."""
        # n == 0 guard: with t == 0 the root max (0) would "fit" and the
        # descent would land on an uncreated leaf
        if self.n == 0 or self.tree[1] < t:
            return -1
        i = 1
        while i < self.cap:
            i = 2 * i if self.tree[2 * i] >= t else 2 * i + 1
        b = i - self.cap
        self.tree[i] -= t
        i //= 2
        while i:
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
            i //= 2
        return b


def _ffd(ids: np.ndarray, toks: np.ndarray, budget: int):
    """First-fit-decreasing over (tokens desc, id asc). Returns a list
    of (member_id_list, total_tokens, oversize)."""
    order = np.lexsort((ids, -toks))
    fit = _LeftmostFit(len(order))
    bins: list[list[int]] = []
    bin_tok: list[int] = []
    out_over: list[tuple[list, int]] = []
    for j in order:
        t = int(toks[j])
        i = int(ids[j])
        if t > budget:
            out_over.append(([i], t))
            continue
        b = fit.take(t)
        if b < 0:
            fit.push(budget - t)
            bins.append([i])
            bin_tok.append(t)
        else:
            bins[b].append(i)
            bin_tok[b] += t
    return ([(m, tt, False) for m, tt in zip(bins, bin_tok)]
            + [(m, tt, True) for m, tt in out_over])


def pack_sequences(
    docs: Dataset,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> Dataset:
    """Pack documents into ≤ ``budget``-token sequences (whitespace
    token counts via the zero-copy utf8 scanner). Returns one row per
    sequence: (seq_key, doc_ids, n_docs, n_tokens, oversize).

    ``num_buckets`` bounds per-task memory (ids+counts of one bucket,
    never text) and fixes the deterministic doc→bucket assignment —
    changing it changes the packing, so treat it as part of the
    dataset recipe.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1 token")

    def count_and_bucket(t: pa.Table) -> pa.Table:
        n_tok, _, _ = utf8_stats(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        # md5 over the DECIMAL id string — the repo's one deterministic
        # id-hash discipline (curation.md5_first_byte / the SQL split
        # oracle md5(CAST(id AS VARCHAR))); hashing native-endian int64
        # bytes would pack differently across architectures
        b = np.frombuffer(
            b"".join(hashlib.md5(str(int(x)).encode()).digest()[:2]
                     for x in ids),
            dtype=">u2").astype("int64") % num_buckets
        return pa.table({
            "_b": pa.array(b), id_col: pa.array(ids),
            "_t": pa.array(n_tok, type=pa.int64()),
        })

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_b"].iloc[0])
        seqs = _ffd(g[id_col].to_numpy(), g["_t"].to_numpy(), budget)
        return pd.DataFrame({
            "seq_key": [f"{b}:{i}" for i in range(len(seqs))],
            "doc_ids": [m for m, _, _ in seqs],
            "n_docs": np.array([len(m) for m, _, _ in seqs], dtype="int64"),
            "n_tokens": np.array([tt for _, tt, _ in seqs], dtype="int64"),
            "oversize": [ov for _, _, ov in seqs],
        })

    keyed = docs.select_columns([id_col, text_col]).map_batches(
        count_and_bucket, batch_format="pyarrow")
    return keyed.groupby("_b").map_groups(pack_bucket, batch_format="pandas")
