"""End-to-end training-corpus curation — the canonical LLM-data
pipeline, composed entirely from this engine's operators and (unusually
for a curation pipeline) EXACTLY reproducible in SQL, because every
stage is deterministic:

    quality filter        integer-exact thresholds (token count,
                          alpha-chars cross-multiplied — no float ratio)
    exact dedup           keep min(doc_id) per md5(text)
                          (functions/dedup.py:exact_dedup, two-phase)
    near-dup removal      EXACT prefix-filtered Jaccard join
                          (functions/simjoin.py) → connected components
                          (min-label propagation) → keep each cluster's
                          min id. No LSH miss probability anywhere.
    split assignment      md5(doc_id) prefix — resume/backfill-stable

Scale shape: the only all-to-all work is the operators' own exchanges;
the quality filter is a pure Arrow-kernel map (``count_substring_regex``
/ ``utf8_length`` — every byte of the corpus transits this stage, so no
Python-object conversion); the survivor re-join runs through the
co-partitioned hash join; the set of near-dup LOSERS (non-min cluster
members) is bounded by the pair count and broadcasts as an anti-join
key set (swap for a hash join if a corpus is mostly duplicates).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["curate", "md5_first_byte", "decontaminate",
           "dup_passage_stats", "remove_dup_passages", "dsir_importance"]


def md5_first_byte(ids) -> "np.ndarray":
    """First md5 digest byte per int id ('cc' on the hex prefix == 0xCC
    on byte 0) — the deterministic split discipline shared by
    ``curate`` and the suite's ``doc_train_test_split``. md5 has no
    vectorized kernel, so the loop is reduced to ONE digest byte per
    row; all column assembly stays in numpy."""
    import hashlib

    import numpy as np

    return np.frombuffer(
        b"".join(hashlib.md5(str(int(i)).encode()).digest()[:1] for i in ids),
        dtype=np.uint8)


def curate(
    docs: Dataset,
    min_tokens: int = 20,
    min_alpha_pct: int = 60,
    neardup_threshold: float = 0.8,
    shingle_n: int = 10,
    exchange_base: str | None = None,
    num_buckets: int = 8,
    components_driver_limit: int = 100_000,
) -> Dataset:
    """documents(doc_id, text) → kept (doc_id, split) after quality /
    exact-dup / near-dup curation."""
    import os

    from guac_ray.functions.dedup import exact_dedup
    from guac_ray.functions.joins import anti_join, default_exchange, hash_join
    from guac_ray.functions.simjoin import jaccard_similarity_join

    ex = exchange_base or default_exchange("curation")

    def quality(t: pa.Table) -> pa.Table:
        # zero-copy byte scan over the Arrow UTF-8 buffers (no regex, no
        # Python objects), integer-exact same thresholds as the SQL
        # oracle: token count = [A-Za-z0-9_]+ runs; alpha ratio compared
        # cross-multiplied so no float enters the filter
        from guac_ray.functions.text import utf8_stats

        ntok, nalpha, nchars = utf8_stats(t["text"])
        keep = (ntok >= min_tokens) & (nalpha * 100 >= min_alpha_pct * nchars)
        return t.filter(pa.array(keep))

    q = docs.map_batches(quality, batch_format="pyarrow")

    # exact dedup: survivors' ids, then re-attach text via the
    # co-partitioned hash join (scale path; ids are one int column)
    ids = exact_dedup(q).select_columns(["doc_id"])
    survivors = hash_join(q, ids, on="doc_id",
                          exchange_dir=os.path.join(ex, "dedup_join"),
                          num_buckets=num_buckets)

    # materialize ONCE: count() and the pandas/components consumption
    # below would each re-run the whole per-bucket exact-Jaccard verify
    # (the most expensive curation stage) from the lazy lineage
    pairs = jaccard_similarity_join(
        survivors, threshold=neardup_threshold, shingle_n=shingle_n,
        exchange_base=os.path.join(ex, "simjoin"),
        num_buckets=num_buckets).materialize()

    # cluster the near-dup graph; drop every non-minimum member.
    # Size-guarded (the engine's standard policy): a driver-small pair
    # list clusters locally and anti-joins as a broadcast key set; a
    # duplicate-heavy corpus takes the exchange-native components and a
    # co-partitioned left join instead — no loser table on the driver.
    n_pairs = pairs.count()
    surv_ids = survivors.select_columns(["doc_id"])
    if n_pairs == 0:
        kept = surv_ids
    elif n_pairs <= components_driver_limit:
        from guac_ray.functions.dedup import connected_components

        pair_df = pairs.select_columns(["da", "db"]).to_pandas()
        label = connected_components(pair_df.rename(
            columns={"da": "a", "db": "b"}))
        losers = {n for n, root in label.items() if root != n}
        kept = anti_join(surv_ids, losers, "doc_id")
    else:
        from guac_ray.functions.dedup import connected_components_ds

        comp = connected_components_ds(
            pairs.map_batches(
                lambda t: pa.table({"a": t["da"], "b": t["db"]}),
                batch_format="pyarrow"),
            exchange_dir=os.path.join(ex, "components"),
            num_buckets=num_buckets)

        def loser_rows(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.not_equal(t["doc_id"], t["root"])
            t = t.filter(keep)
            return pa.table({"doc_id": t["doc_id"],
                             "_loser": pa.array([1] * t.num_rows,
                                                type=pa.int8())})

        losers_ds = comp.map_batches(loser_rows, batch_format="pyarrow")
        joined = hash_join(surv_ids, losers_ds, on="doc_id", how="left",
                           exchange_dir=os.path.join(ex, "anti"),
                           num_buckets=num_buckets)

        def keep_unmatched(df: pd.DataFrame) -> pa.Table:
            out = df[df["_loser"].isna()][["doc_id"]]
            return table_from_pandas(out, preserve_index=False)

        kept = joined.map_batches(keep_unmatched, batch_format="pandas")

    def assign_split(t: pa.Table) -> pa.Table:
        import numpy as np

        ids_ = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        first = md5_first_byte(ids_)
        return pa.table({
            "doc_id": pa.array(ids_),
            "split": pa.array(np.where(first < 0xCC, "train", "test")),
        })

    return kept.map_batches(assign_split, batch_format="pyarrow")


def decontaminate(
    train: Dataset,
    test: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    exchange_dir: str | None = None,
    num_buckets: int | None = None,
) -> Dataset:
    """Train/test CONTAMINATION check — the curation step every
    benchmark-respecting training pipeline runs before shipping a
    split: for each test document, how many of its distinct word
    ``ngram``-shingles also occur anywhere in the train corpus.

    Returns (id_col, n_shingles, n_contaminated) per test doc with at
    least one shingle (docs shorter than ``ngram`` tokens emit no row —
    they have nothing to leak). Tokens are lowercased whitespace
    splits; shingles are space-joined token windows, both
    SQL-expressible so the whole operator has an exact DuckDB oracle.

    Scale shape (r4-verdict rewrite): the test corpus is shingled
    EXACTLY ONCE, fully vectorized — ``ws_shingles`` runs the whole
    batch through Arrow kernels (regex split → numpy window assembly →
    element-wise join), per-doc distinctness is one batch-local Arrow
    ``group_by`` (a doc is one row, so no shuffle); the train side
    ships only per-batch-deduped shingles; the overlap test is ONE
    LARGE-LARGE ``hash_join(how="mark")`` on the shingle itself — every
    test-shingle row comes back with an EXISTS flag, so ``n_shingles``
    (count) and ``n_contaminated`` (sum of marks) fall out of a single
    partial aggregate FUSED into the join's reduce tasks; the former
    second shingle pass and the doc-id re-attach join are gone. No
    per-row Python anywhere; nothing materializes on the driver.
    Shingles travel as STRINGS for oracle-exactness — at 100-TB scale
    hash them to u64 first (collision risk ~1e-19/pair) and drop the
    oracle claim to rows-only.
    """
    from guac_ray.functions.joins import default_exchange, hash_join
    from guac_ray.functions.text import ws_shingles
    from guac_ray.stages.groupagg import grouped_agg

    ex = exchange_dir or default_exchange("decontaminate")

    def test_shingles(t: pa.Table) -> pa.Table:
        ridx, sh = ws_shingles(t[text_col], ngram)
        ids = t[id_col].combine_chunks().take(pa.array(ridx))
        return pa.table({id_col: ids, "s": sh}).group_by(
            [id_col, "s"]).aggregate([])  # per-doc DISTINCT, batch-local

    def train_shingles(t: pa.Table) -> pa.Table:
        _, sh = ws_shingles(t[text_col], ngram)
        return pa.table({"s": sh}).group_by(["s"]).aggregate([])

    def mark_partial(j: pa.Table) -> pa.Table:
        # inside each join reduce task: (id, s, _mark) → per-doc partial
        # (rows, marked) counts; a doc may span probe chunks, so these
        # are partials for grouped_agg to finalize
        g = j.group_by([id_col]).aggregate(
            [("_mark", "sum"), ("_mark", "count")])
        return pa.table({
            id_col: g[id_col],
            "_c": g["_mark_sum"],
            "_n": g["_mark_count"],
        })

    te_sh = test.select_columns([id_col, text_col]).map_batches(
        test_shingles, batch_format="pyarrow")
    tr_sh = train.select_columns([text_col]).map_batches(
        train_shingles, batch_format="pyarrow")
    marked = hash_join(te_sh, tr_sh, on="s", how="mark",
                       exchange_dir=f"{ex}/mark", num_buckets=num_buckets,
                       partial_fn=mark_partial)
    out = grouped_agg(marked, [id_col],
                      {"n_contaminated": ("_c", "sum"),
                       "n_shingles": ("_n", "sum")}, num_buckets=8)

    def final(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            id_col: df[id_col],
            "n_shingles": df["n_shingles"].astype("int64"),
            "n_contaminated": df["n_contaminated"].astype("int64"),
        }), preserve_index=False)

    return out.map_batches(final, batch_format="pandas")


def dsir_importance(
    target: Dataset,
    raw: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
    vocab_cap: int = 20_000_000,
    num_buckets: int = 8,
    concurrency=2,
) -> Dataset:
    """Data Selection via Importance Resampling (DSIR — Xie et al.
    2023, arXiv:2302.03169): score every RAW-pool document by the
    log-likelihood ratio of a target-domain unigram LM over a raw-pool
    unigram LM — the standard cheap "does this web page look like my
    target distribution" selector (select the top-weighted docs, or
    Gumbel-resample on the weights, downstream).

    log w(d) = Σ_tokens [ln p_target(t) − ln p_raw(t)] with add-one
    (Laplace) smoothing over the UNION vocabulary. Exactness: each
    side's per-term log-prob is quantized to integer micro-nats with
    the ``unigram_surprisal`` discipline — ``q_side(t) =
    floor(scale·(ln(N_side+V) − ln(c_side(t)+1)) + 0.5)`` evaluated in
    libm doubles of exact integers, bit-identical in DuckDB — and a
    document's weight is the int64 SUM of ``q_raw(t) − q_target(t)``
    over token occurrences, so the distributed sum is exact under any
    batching. (DSIR proper uses hashed n-gram buckets to bound the
    feature space; at 100-TB vocabulary route the token⋈weight lookup
    through ``hash_join`` on term and hash terms into buckets first —
    the ``vocab_cap`` guard names the switch, same as tf-idf.)

    Returns (id_col, n_tokens, logw_micronats) for every raw doc with
    ≥ 1 token. Positive = more target-like than raw-average.
    """
    import math

    import ray

    from guac_ray.functions.text import (_require_known_tokens,
                                         _vocab_counts, sql_ws_tokens)

    vt = _vocab_counts(target, text_col, per_doc_distinct=False,
                       num_buckets=num_buckets, vocab_cap=vocab_cap,
                       out_col="c")
    vr = _vocab_counts(raw, text_col, per_doc_distinct=False,
                       num_buckets=num_buckets, vocab_cap=vocab_cap,
                       out_col="c")
    ct = dict(zip(vt["term"], vt["c"].astype(int))) if len(vt) else {}
    cr = dict(zip(vr["term"], vr["c"].astype(int))) if len(vr) else {}
    union = set(ct) | set(cr)
    V = len(union)
    if V == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "logw_micronats": pa.array([], pa.int64())}))
    nt = float(sum(ct.values()) + V)
    nr = float(sum(cr.values()) + V)
    ln_nt, ln_nr = math.log(nt), math.log(nr)
    # the proven two-ln / one-subtract / floor(+0.5) expression, per side
    w = {
        t: (int(math.floor(scale * (ln_nr - math.log(float(cr.get(t, 0) + 1)))
                           + 0.5))
            - int(math.floor(scale * (ln_nt - math.log(float(ct.get(t, 0) + 1)))
                             + 0.5)))
        for t in union
    }
    wref = ray.put(w)

    class Scorer:
        def __init__(self):
            from collections import Counter  # noqa: F401 (per-actor)

            self.w = ray.get(wref)

        def __call__(self, t: pa.Table) -> pa.Table:
            from collections import Counter

            ids, ntok, lw = [], [], []
            for did, txt in zip(t[id_col].to_pylist(),
                                t[text_col].to_pylist()):
                c = Counter(sql_ws_tokens(txt))
                if not c:
                    continue
                _require_known_tokens(c, self.w, "dsir_importance")
                ids.append(did)
                ntok.append(sum(c.values()))
                lw.append(sum(self.w[tk] * n for tk, n in c.items()))
            return pa.table({
                id_col: pa.array(ids, type=t.schema.field(id_col).type),
                "n_tokens": pa.array(ntok, type=pa.int64()),
                "logw_micronats": pa.array(lw, type=pa.int64()),
            })

    return raw.select_columns([id_col, text_col]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency)


def dup_passage_stats(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
    min_count: int = 2,
    exchange_dir: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Repeated-passage coverage — the ExactSubstr measurement of Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499) at token-window granularity: for each
    document, how many of its tokens sit inside at least one
    ``window``-token passage that occurs ≥ ``min_count`` times ANYWHERE
    in the corpus (within-doc repeats count, like their suffix-array
    rule; unlike ``decontaminate``, which tests distinct shingles
    against a separate train corpus).

    Returns (id_col, n_tokens, dup_tokens) per document with ≥ 1
    window (docs shorter than ``window`` tokens emit no row). Tokens
    are the ``ws_shingles`` grammar (lowercased whitespace splits,
    empties dropped) — SQL-expressible, so the operator carries an
    exact DuckDB oracle (suite.DOC_DUP_PASSAGES_SQL).

    Scale shape: one vectorized shingle pass (Arrow kernels + numpy
    window assembly, ``with_pos=True``) emits thin (id, pos, passage)
    rows; TWO filesystem exchanges and nothing else — (1) partition by
    passage hash, so each bucket holds every copy of its passages and
    flags duplicates with a dictionary-encode + bincount (in-bucket
    count IS the global count); (2) partition flagged rows by doc hash
    and resolve token coverage per doc as a vectorized
    interval-union over sorted window starts (equal-length intervals:
    first start contributes ``window``, each next start min(gap,
    window) — one ``np.add.reduceat``). No per-row Python, no
    broadcast of a data-sized dup set, nothing on the driver. Passages
    travel as STRINGS for oracle-exactness — at 100-TB hash to u64
    first (the ``decontaminate`` caveat) and drop the oracle claim to
    rows-only.
    """
    import numpy as np

    from guac_ray.exfs import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce

    ex = exchange_dir or default_exchange("passages")

    def coverage(t: pa.Table) -> pa.Table:
        st = t.sort_by([(id_col, "ascending"), ("pos", "ascending")])
        ids = st[id_col].to_numpy(zero_copy_only=False)
        pos = st["pos"].to_numpy(zero_copy_only=False)
        flg = st["flag"].to_numpy(zero_copy_only=False).astype(bool)
        n = len(ids)
        b = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])  # doc starts
        ends = np.r_[b[1:], n]
        # windows cover pos .. pos+window-1 and exist for every start
        # 0..cnt-window, so the doc's token count is last start + window
        n_tokens = pos[ends - 1] + window
        dup = np.zeros(len(b), dtype=np.int64)
        if flg.any():
            fids, fpos = ids[flg], pos[flg]
            fb = np.flatnonzero(np.r_[True, fids[1:] != fids[:-1]])
            contrib = np.empty(len(fpos), dtype=np.int64)
            contrib[0] = window
            contrib[1:] = np.minimum(fpos[1:] - fpos[:-1], window)
            contrib[fb] = window  # first flagged window of each doc
            cov = np.add.reduceat(contrib, fb)
            # map flagged-doc coverage onto the (sorted) full doc list
            idx = np.searchsorted(ids[b], fids[fb])
            dup[idx] = cov
        return pa.table({
            id_col: st[id_col].take(pa.array(b)),
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "dup_tokens": pa.array(dup),
        })

    flagged = _flagged_windows(
        docs, id_col, text_col, window, min_count, ex, num_buckets)
    if flagged is None:
        return _empty_passage_stats(docs, id_col)
    out = fs_exchange_reduce(flagged, f"{ex}/bydoc", coverage,
                             bucket_col="_bucket")
    if out is None:
        return _empty_passage_stats(docs, id_col)
    return out


def _flagged_windows(
    docs: Dataset,
    id_col: str,
    text_col: str,
    window: int,
    min_count: int,
    ex: str,
    num_buckets: int,
) -> "Dataset | None":
    """Shared first half of the passage ops: one vectorized shingle
    pass emits (id, pos, passage) rows; the by-passage fs exchange
    flags windows whose passage recurs ≥ ``min_count`` times globally
    (all copies of a passage co-locate, so the in-bucket count IS the
    global count). Returns (id_col, pos, flag, _bucket-by-doc-hash)
    rows — every window of every doc — or None when no doc has a
    window."""
    import numpy as np

    from guac_ray.functions.text import ws_shingles
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    def emit(t: pa.Table) -> pa.Table:
        ridx, pos, sh = ws_shingles(t[text_col], window, with_pos=True)
        ids = t[id_col].combine_chunks().take(pa.array(ridx))
        bucket = stable_hash(
            pd.DataFrame({"s": sh.to_pandas()}), ["s"]) % num_buckets
        return pa.table({
            id_col: ids, "pos": pa.array(pos), "s": sh,
            "_bucket": pa.array(bucket.astype(np.int64)),
        })

    def flag_dups(t: pa.Table) -> pa.Table:
        # all copies of a passage are in THIS bucket: dictionary-encode
        # the strings, count codes, flag rows whose passage recurs
        s = t["s"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        codes = pc.dictionary_encode(s).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        counts = np.bincount(codes)
        flag = counts[codes] >= min_count
        bucket = stable_hash(
            pd.DataFrame({"i": t[id_col].to_pandas()}), ["i"]) % num_buckets
        return pa.table({
            id_col: t[id_col],
            "pos": t["pos"],
            "flag": pa.array(flag),
            "_bucket": pa.array(bucket.astype(np.int64)),
        })

    rows = docs.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow")
    return fs_exchange_reduce(rows, f"{ex}/byshingle", flag_dups,
                              bucket_col="_bucket")


def remove_dup_passages(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
    min_count: int = 2,
    exchange_dir: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Repeated-passage REMOVAL — the dedup action of Lee et al. 2022
    (``dup_passage_stats`` is the measurement): rewrite every document
    dropping each token covered by any ``window``-token passage that
    occurs ≥ ``min_count`` times in the corpus. ALL occurrences drop
    (the pair-graph rule again — keep-one-occurrence needs a global
    tiebreak that serializes; the all-drop rule is order-free,
    partition-independent and the usual practical choice for
    boilerplate-heavy web text, cf. the C4/RefinedWeb line filters).

    Returns (id_col, clean_text, n_removed) for EVERY input document —
    docs with no duplicated passage (or fewer than ``window`` tokens)
    come back intact. ``clean_text`` is over the normalized token
    stream (lowercased, whitespace-collapsed — the ``ws_shingles``
    grammar), so the op is exactly SQL-reproducible
    (suite.DOC_REMOVE_PASSAGES_SQL).

    Scale shape: the two ``_flagged_windows`` exchanges, then the
    flagged starts compact per doc into ONE comma-joined string (an
    Arrow ``binary_join`` over a list rebuild — no per-doc Python) and
    flow through the partitioned LEFT ``hash_join`` back to the text;
    the rewrite is one vectorized pass: token stream + numpy
    interval-expansion mask + Arrow list rebuild + ``binary_join``.
    Covered-token dedup (overlapping windows) is ``np.unique`` on the
    expanded indices. Nothing data-sized touches the driver.
    """
    import numpy as np

    from guac_ray.exfs import default_exchange
    from guac_ray.functions.joins import hash_join
    from guac_ray.functions.text import ws_token_stream
    from guac_ray.stages.assemble import fs_exchange_reduce

    ex = exchange_dir or default_exchange("passages_rm")
    proj = docs.select_columns([id_col, text_col])

    def starts_per_doc(t: pa.Table) -> pa.Table:
        st = t.filter(t["flag"]).sort_by(
            [(id_col, "ascending"), ("pos", "ascending")])
        ids = st[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table({
                id_col: st[id_col],
                "starts": pa.array([], pa.string())})
        b = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        offs = np.r_[b, n].astype(np.int32)
        pos_str = pc.cast(st["pos"].combine_chunks(), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offs), pos_str)
        return pa.table({
            id_col: st[id_col].take(pa.array(b)),
            "starts": pc.binary_join(lists, ","),
        })

    flagged = _flagged_windows(
        proj, id_col, text_col, window, min_count, ex, num_buckets)
    if flagged is not None:
        starts = fs_exchange_reduce(flagged, f"{ex}/bydoc", starts_per_doc,
                                    bucket_col="_bucket")
    else:
        starts = None

    if starts is not None:
        joined = hash_join(proj, starts, on=id_col, how="left",
                           exchange_dir=f"{ex}/join",
                           num_buckets=num_buckets)
    else:
        joined = proj.map_batches(
            lambda t: t.append_column(
                "starts", pa.array([None] * t.num_rows, pa.string())),
            batch_format="pyarrow")

    def rewrite(t: pa.Table) -> pa.Table:
        ft, cnt = ws_token_stream(t[text_col])
        doc_off = np.concatenate([[0], np.cumsum(cnt)])
        total = int(doc_off[-1])
        scol = t["starts"]
        if isinstance(scol, pa.ChunkedArray):
            scol = scol.combine_chunks()
        slists = pc.split_pattern(pc.fill_null(scol, ""), ",")
        svals = slists.flatten()
        nonempty = pc.greater(pc.binary_length(svals), 0)
        soff = slists.offsets.to_numpy().astype(np.int64)
        ks = nonempty.to_numpy(zero_copy_only=False).astype(np.int64)
        kcs = np.concatenate([[0], np.cumsum(ks)])
        per_row = kcs[soff[1:]] - kcs[soff[:-1]]  # flagged starts per row
        fs = svals.filter(nonempty)
        fstarts = (pc.cast(fs, pa.int64()).to_numpy(zero_copy_only=False)
                   if len(fs) else np.empty(0, np.int64))
        rs = np.repeat(np.arange(t.num_rows, dtype=np.int64), per_row)
        # expand each start into its window's token indices, then dedup
        # overlaps — flat indices into the batch token stream
        covered = np.unique(
            np.repeat(doc_off[rs] + fstarts, window)
            + np.tile(np.arange(window, dtype=np.int64), len(fstarts))
        ) if len(fstarts) else np.empty(0, np.int64)
        mask = np.ones(total, dtype=bool)
        mask[covered] = False
        kept = ft.filter(pa.array(mask))
        crow = np.searchsorted(doc_off[1:], covered, side="right")
        removed = np.bincount(crow, minlength=t.num_rows).astype(np.int64)
        kept_cnt = cnt - removed
        lists = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(kept_cnt)]),
                     type=pa.int32()), kept)
        return pa.table({
            id_col: t[id_col],
            "clean_text": pc.binary_join(lists, " "),
            "n_removed": pa.array(removed),
        })

    return joined.map_batches(rewrite, batch_format="pyarrow")


def _empty_passage_stats(docs: Dataset, id_col: str) -> Dataset:
    import ray.data as rd

    sch = docs.schema()
    id_type = (dict(zip(sch.names, sch.types)).get(id_col, pa.int64())
               if sch is not None else pa.int64())
    return rd.from_arrow(pa.table({
        id_col: pa.array([], id_type),
        "n_tokens": pa.array([], pa.int64()),
        "dup_tokens": pa.array([], pa.int64())}))


def source_mixture(
    docs: Dataset,
    weights: dict[str, float],
    default: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> Dataset:
    """Domain-reweighted resampling — the mixture step of training-data
    assembly (upsample scarce high-quality domains, downsample bulk
    ones; the Pile / DoReMi discipline). Weight w per source means:
    floor(w) deterministic copies of every doc, plus one more iff the
    doc's md5 first byte < floor(frac(w)·256) — so w=2.5 yields 2 or 3
    copies (expected 2.5), w=0.25 keeps ~a quarter of docs once. The
    md5 rule is the repo's split discipline (``md5_first_byte``), so
    the choice is a pure function of the data: resume-stable,
    engine-swappable, and exactly reproducible in SQL
    (``substr(md5(CAST(id AS VARCHAR)),1,2) < printf('%02x', thr)``).

    Fractions are applied at 1/256 granularity (floor) — weights with
    exact 1/256ths (0.25, 2.5, 1.125…) reproduce exactly; anything
    else floors to the next 256th on BOTH engines.

    Output: one row per kept copy (id_col, source_col, copy) with copy
    = 0..n-1. Stateless vectorized map — no shuffle at any scale; the
    weight table ships inside the closure (bounded by #sources).
    """
    import numpy as np

    def rep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        src = pd.Series(t[source_col].to_pylist())
        w = src.map(weights).fillna(default).to_numpy(dtype="float64")
        base = np.floor(w).astype("int64")
        thr = np.floor((w - np.floor(w)) * 256).astype("int64")
        extra = (md5_first_byte(ids).astype("int64") < thr).astype("int64")
        total = base + extra
        csum = np.concatenate(([0], np.cumsum(total)[:-1]))
        copy = (np.arange(int(total.sum()), dtype="int64")
                - np.repeat(csum, total))
        return pa.table({
            id_col: pa.array(np.repeat(ids, total)),
            source_col: pa.array(np.repeat(src.to_numpy(), total),
                                 type=pa.string()),
            "copy": pa.array(copy),
        })

    return docs.select_columns([id_col, source_col]).map_batches(
        rep, batch_format="pyarrow")


def ngram_novelty(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
    scale: int = 1_000_000,
    num_buckets: int = 8,
) -> "Dataset | pa.Table":
    """Per-document n-gram NOVELTY under first-occurrence attribution:
    of a document's distinct word ``ngram``-shingles, the fraction
    whose global FIRST owner (minimum ``id_col`` over the corpus) is
    the document itself — the keep-first complement of
    ``dup_passage_stats``'s order-free coverage measure, and the
    per-doc "how much does this doc add" signal dedup-aware data
    valuation uses (a perfect duplicate of an earlier doc scores 0).

    Exactness: pure integer counting; ``novelty_fp = scale * n_novel
    // n_shingles`` is int64 floor division. Deterministic because the
    owner is a MIN, not an arrival order.

    Shape: one vectorized shingle pass (``ws_shingles``) with per-doc
    dedup batch-local (a doc is one row, so in-batch distinct IS
    global distinct); ONE by-shingle fs exchange where all copies of a
    shingle co-locate, so the in-bucket min-owner is the global owner
    (dictionary-encode + ``np.minimum.at`` — no per-row Python); each
    bucket emits per-doc partial counts (≤ docs × buckets rows) into
    the standard ``grouped_agg`` combine. Nothing token-scale leaves
    the shingle exchange; zero-window docs drop (SQL-join parity)."""
    import numpy as np

    from guac_ray.functions.text import ws_shingles
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash
    from guac_ray.stages.groupagg import grouped_agg

    def emit(t: pa.Table) -> pa.Table:
        ridx, sh = ws_shingles(t[text_col], ngram)
        ids = t[id_col].combine_chunks().take(pa.array(ridx))
        pairs = pa.table({id_col: ids, "s": sh}).group_by(
            [id_col, "s"]).aggregate([])
        bucket = stable_hash(
            pd.DataFrame({"s": pairs["s"].to_pandas()}), ["s"]) % num_buckets
        return pairs.append_column(
            "_bucket", pa.array(bucket.astype(np.int64)))

    def min_owner(t: pa.Table) -> pa.Table:
        s = t["s"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        codes = pc.dictionary_encode(s).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        owner = np.full(int(codes.max()) + 1, np.iinfo(np.int64).max)
        np.minimum.at(owner, codes, ids)
        novel = (ids == owner[codes]).astype(np.int64)
        part = pd.DataFrame({id_col: ids, "one": np.ones_like(ids),
                             "novel": novel}).groupby(
            id_col, sort=False).sum().reset_index()
        return table_from_pandas(part, preserve_index=False)

    rows = docs.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow")
    from guac_ray.functions.joins import default_exchange

    partials = fs_exchange_reduce(
        rows, default_exchange("novelty"), min_owner)
    if partials is None:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "n_shingles": pa.array([], pa.int64()),
            "n_novel": pa.array([], pa.int64()),
            "novelty_fp": pa.array([], pa.int64()),
        })
    agg = grouped_agg(partials, [id_col],
                      {"n_shingles": ("one", "sum"),
                       "n_novel": ("novel", "sum")},
                      num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_shingles"].to_numpy(zero_copy_only=False).astype("int64")
        nov = t["n_novel"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "n_shingles": pa.array(n),
            "n_novel": pa.array(nov),
            "novelty_fp": pa.array(scale * nov // n),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
