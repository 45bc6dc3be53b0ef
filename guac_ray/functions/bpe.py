"""Byte-pair-encoding tokenizer TRAINING over a distributed corpus —
the vocabulary-learning step (GPT-2 / Sennrich et al. 2016) every LLM
data stack runs before token counting, packing or perplexity scoring
can exist. No other operator in the engine is an iterative
vocabulary-building loop; token COUNTING (text.py) consumes a fixed
grammar, this LEARNS one.

Distribution contract (how real tokenizer trainers scale, and how this
one does): BPE never iterates over the corpus — it iterates over the
DISTINCT-WORD COUNT table. The corpus-scale work is exactly one
distributed word-count pass (``_vocab_counts``: per-batch Counter
combiner → grouped_agg exchange — the same pass tf-idf runs); the merge
loop then runs on the top-``max_words`` rows of that table, which is the
engine's documented size-guarded driver product (the doc_domain_terms
precedent — HuggingFace ``tokenizers`` caps the word table the same
way). The loop itself is numpy-vectorized over the full symbol array:
pair counting is one np.unique/bincount per iteration, merge
application is one boolean-mask pass — no per-word Python inside the
loop.

Greedy left-to-right overlap semantics match the reference algorithm:
within a run of consecutive identical-pair matches ("aaaa" under (a,a))
only even offsets merge — a(=)a a(=)a, never the middle pair.
Deterministic under any partitioning: the word table is exact and
global, ties break by (pair_count DESC, left ASC, right ASC).

Reference analog: none (the reference has no tokenizer); public
algorithm per Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

__all__ = ["bpe_train_merges", "bpe_merges_naive",
           "bpe_encode_word", "bpe_token_counts", "BpeTokenCounter"]

END_OF_WORD = "</w>"


def _merge_loop(words: np.ndarray, counts: np.ndarray, n_merges: int,
                min_pair_count: int) -> pd.DataFrame:
    """Exact BPE merge loop over a (word, count) table. Words are
    exploded to per-character symbols + END_OF_WORD once (bounded by
    the word table, not the corpus); each iteration recounts all
    adjacent pairs weighted by word count and applies the best merge.
    """
    sym2id: dict[str, int] = {}
    id2str: list[str] = []

    def sid(s: str) -> int:
        i = sym2id.get(s)
        if i is None:
            i = len(id2str)
            sym2id[s] = i
            id2str.append(s)
        return i

    syms_l: list[int] = []
    wids_l: list[int] = []
    for wi, w in enumerate(words):  # bounded by max_words (driver table)
        for ch in w:
            syms_l.append(sid(ch))
            wids_l.append(wi)
        syms_l.append(sid(END_OF_WORD))
        wids_l.append(wi)
    syms = np.asarray(syms_l, dtype=np.int64)
    wids = np.asarray(wids_l, dtype=np.int64)
    wcnt = np.asarray(counts, dtype=np.int64)

    out = {"rank": [], "left": [], "right": [], "merged": [],
           "pair_count": []}
    for rank in range(1, n_merges + 1):
        if syms.size < 2:
            break
        valid = wids[1:] == wids[:-1]
        if not valid.any():
            break
        left = syms[:-1][valid]
        right = syms[1:][valid]
        w = wcnt[wids[:-1][valid]]
        # pair key packs (left, right) into one int64; vocab ids stay
        # far below 2**31 so the product cannot overflow
        m = np.int64(len(id2str))
        keys = left * m + right
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv, weights=w.astype(np.float64))
        # weights are exact int64 counts; bincount's float64 sum is
        # exact up to 2**53 — guarded loudly, not silently
        if sums.max() >= 2 ** 53:
            raise ValueError("pair counts exceed exact float64 range; "
                             "shard the corpus or raise min_count")
        sums = sums.astype(np.int64)
        best_cnt = int(sums.max())
        if best_cnt < min_pair_count:
            break
        cand = uniq[sums == best_cnt]
        # deterministic tie-break: lexicographic (left, right) strings
        cl = np.asarray([id2str[int(k // m)] for k in cand])
        cr = np.asarray([id2str[int(k % m)] for k in cand])
        order = np.lexsort((cr, cl))
        bl, br = int(cand[order[0]] // m), int(cand[order[0]] % m)
        ls, rs = id2str[bl], id2str[br]
        new_id = sid(ls + rs)

        # match positions (global index into syms)
        pos = np.flatnonzero(
            (syms[:-1] == bl) & (syms[1:] == br) & (wids[:-1] == wids[1:]))
        # greedy left-to-right: inside a run of CONSECUTIVE matches
        # (only possible when left==right) keep even offsets only
        run_id = np.cumsum(np.diff(pos, prepend=pos[0] - 2) != 1)
        run_start = pos[np.diff(pos, prepend=pos[0] - 2) != 1]
        keep = (pos - run_start[run_id - 1]) % 2 == 0
        kept = pos[keep]

        syms[kept] = new_id
        syms = np.delete(syms, kept + 1)
        wids = np.delete(wids, kept + 1)

        out["rank"].append(rank)
        out["left"].append(ls)
        out["right"].append(rs)
        out["merged"].append(ls + rs)
        out["pair_count"].append(best_cnt)

    df = pd.DataFrame(out)
    df["rank"] = df.get("rank", pd.Series(dtype="int64")).astype("int64")
    df["pair_count"] = df.get(
        "pair_count", pd.Series(dtype="int64")).astype("int64")
    return df[["rank", "left", "right", "merged", "pair_count"]]


def bpe_train_merges(
    docs: Dataset,
    n_merges: int = 50,
    max_words: int = 50_000,
    min_count: int = 1,
    min_pair_count: int = 2,
    text_col: str = "text",
    num_buckets: int = 16,
    vocab_cap: int = 2_000_000,
) -> Dataset:
    """Train ``n_merges`` BPE merges over the corpus. Returns a Dataset
    of (rank, left, right, merged, pair_count) — the merge table a
    tokenizer ships as its vocabulary artifact. One distributed
    word-count pass; the merge loop runs over the top-``max_words``
    (count DESC, term ASC) distinct words — exact counts from the FULL
    corpus, merge statistics computed on the capped word table exactly
    as production tokenizer trainers do. Deterministic end to end."""
    import ray.data as rd

    from guac_ray.functions.text import _vocab_counts

    schema = pa.schema([("rank", pa.int64()), ("left", pa.string()),
                        ("right", pa.string()), ("merged", pa.string()),
                        ("pair_count", pa.int64())])
    tab = _vocab_counts(docs, text_col, per_doc_distinct=False,
                        num_buckets=num_buckets, vocab_cap=vocab_cap,
                        out_col="cnt")
    if tab.empty:  # empty corpus: grouped_agg's zero-row frame has no cols
        return rd.from_arrow(schema.empty_table())
    tab = tab[tab["cnt"] >= min_count]
    tab = tab.sort_values(["cnt", "term"], ascending=[False, True],
                          kind="mergesort").head(max_words)
    df = _merge_loop(tab["term"].to_numpy(), tab["cnt"].to_numpy(),
                     n_merges, min_pair_count)
    if df.empty:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow(
        pa.Table.from_pandas(df, schema=schema,
                             preserve_index=False)
        .replace_schema_metadata(None))


def bpe_merges_naive(word_counts: dict[str, int], n_merges: int,
                     min_pair_count: int = 2) -> list[tuple]:
    """Pure-Python reference implementation (Sennrich's dict-of-tuples
    algorithm, greedy left-to-right merge application) — the parity
    witness for ``_merge_loop``'s vectorized engine in tests."""
    vocab = {tuple(w) + (END_OF_WORD,): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple, int] = {}
        for word, c in vocab.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best_cnt = max(pairs.values())
        if best_cnt < min_pair_count:
            break
        bl, br = min(p for p, c in pairs.items() if c == best_cnt)
        new_vocab = {}
        for word, c in vocab.items():
            w2, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == bl
                        and word[i + 1] == br):
                    w2.append(bl + br)
                    i += 2
                else:
                    w2.append(word[i])
                    i += 1
            new_vocab[tuple(w2)] = new_vocab.get(tuple(w2), 0) + c
        vocab = new_vocab
        merges.append((rank, bl, br, bl + br, best_cnt))
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with a trained merge table — the reference
    algorithm (apply the lowest-rank merge present, all its occurrences
    left-to-right, until none applies). Used per DISTINCT word only;
    the engine memoizes around it."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        out, i = [], 0
        while i < len(syms):
            if (i < len(syms) - 1
                    and ranks.get((syms[i], syms[i + 1])) == best):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BpeTokenCounter:
    """Actor-pool stage: per-doc token counts under a TRAINED merge
    table — the budget signal sequence packing and context-window
    planning consume, now under the corpus's own learned vocabulary
    instead of a fixed grammar (text.py's TokenCounter). The merge
    table is tiny and ships once per actor (__init__); encoding is
    MEMOIZED per distinct word, so per batch only never-seen words run
    the per-word reference encode — work is bounded by vocabulary
    growth (Heaps' law), not token count, the same argument that makes
    BPE training word-table-bounded. Token-count arithmetic per doc is
    one np.unique + segment-sum, no per-row Python."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self.memo: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from guac_ray.functions.text import ws_token_stream

        flat, cnt = ws_token_stream(t["text"])
        words = flat.to_numpy(zero_copy_only=False)
        if len(words) == 0:
            return pa.table({
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_words": pa.array(np.zeros(t.num_rows, np.int64)),
                "n_bpe_tokens": pa.array(np.zeros(t.num_rows, np.int64)),
            })
        uniq, inv = np.unique(words, return_inverse=True)
        for w in uniq:  # only NEVER-SEEN words encode (memoized)
            if w not in self.memo:
                self.memo[w] = len(bpe_encode_word(w, self.ranks))
        per_word = np.asarray([self.memo[w] for w in uniq],
                              dtype=np.int64)
        tok_per_occurrence = per_word[inv]
        # segment sums per doc via the token-count offsets
        csum = np.concatenate([[0], np.cumsum(tok_per_occurrence)])
        ends = np.cumsum(cnt)
        starts = ends - cnt
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_words": pa.array(cnt.astype(np.int64)),
            "n_bpe_tokens": pa.array(csum[ends] - csum[starts]),
        })


def bpe_token_counts(
    docs: Dataset,
    merges: list[tuple[str, str]],
    concurrency=(1, 4),
) -> Dataset:
    """Per-doc (n_words, n_bpe_tokens) under a trained merge table —
    the apply side of ``bpe_train_merges``. Stateless-input actor pool;
    the memo warms per actor across batches."""
    return docs.map_batches(
        BpeTokenCounter, batch_format="pyarrow",
        fn_constructor_kwargs={"merges": merges},
        concurrency=concurrency)
