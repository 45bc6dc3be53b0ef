"""Exact set-similarity join (n-gram Jaccard with prefix filtering).

The LSH family (``functions/dedup.py``) is probabilistic: MinHash bands
can miss a true pair near the threshold. This module is the EXACT
complement — every pair with Jaccard(shingles(a), shingles(b)) ≥ t, no
misses, no false positives — using the positional prefix filter of the
set-similarity-join literature (Chaudhuri et al. SSJoin / Xiao et al.
PPJoin, both public): order each document's shingles rarest-first by
global document frequency; two sets can reach Jaccard ≥ t only if their
first ``|s| - ceil(t·|s|) + 1`` shingles share at least one element, so
the candidate join runs over prefixes only and hot shingles (which sit
at the END of the ordering) never join. Lossless — the verify stage
intersects full shingle sets, so the result is byte-identical to the
O(n²) oracle.

Scale shape (all stages pure map + fs exchange):
  1. shingle rows (doc → distinct 5-grams, per-batch map);
  2. document frequency per gram (two-phase grouped count);
  3. prefix selection — df attaches via broadcast when the distinct-gram
     table is small, else a co-partitioned hash join + an exchange
     regroup by doc (size-guarded, same policy as
     ``verify_pairs_sigs``);
  4. candidate pairs: prefix ⋈ prefix on gram through the exchange,
     pair-deduped;
  5. verify: candidate pairs ⋈ full shingle sets (broadcast under the
     row limit, co-partitioned joins above), exact intersection.

Skew note: after prefix filtering the join key distribution is the df
of RARE grams by construction (a gram with df=1 produces zero pairs,
df=2 one pair), so stage 4 has no hot keys — the filter is also the
skew guard.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas

import ray
import ray.data as rd
from ray.data import Dataset

from guac_ray.functions.joins import default_exchange, hash_join
from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash
from guac_ray.stages.groupagg import grouped_agg

__all__ = ["shingle_strings", "jaccard_similarity_join", "edit1_join"]


def _lev_le1(x: str, y: str) -> bool:
    """Exact Levenshtein(x, y) ≤ 1 in one O(len) two-pointer pass."""
    if x == y:
        return True
    lx, ly = len(x), len(y)
    if abs(lx - ly) > 1:
        return False
    if lx == ly:
        return sum(a != b for a, b in zip(x, y)) == 1
    if lx > ly:
        x, y, lx, ly = y, x, ly, lx
    i = j = 0
    skipped = False
    while i < lx:
        if x[i] == y[j]:
            i += 1
            j += 1
        elif skipped:
            return False
        else:
            skipped = True
            j += 1
    return True


def edit1_join(
    ds: Dataset,
    col: str,
    id_col: str,
    exchange_base: str | None = None,
    num_buckets: int = 16,
    max_len: int = 512,
) -> Dataset:
    """EXACT edit-distance-≤1 self-join on a string column — the
    entity-resolution / typo-dedup primitive (FastSS deletion
    neighborhoods, Bocek et al. 2007, public): two strings are within
    one edit iff their {self} ∪ {one-char-deletions} neighborhoods
    intersect... as a CANDIDATE condition (sharing a deletion is
    necessary but admits some distance-2 pairs, e.g. "ab"/"ba"), so
    every candidate is verified with an exact O(len) distance check.
    Returns (a, b, d) with a < b by id and d ∈ {0, 1}.

    Scale shape: variant generation is VECTORIZED — one
    ``utf8_slice_codeunits`` + ``binary_join_element_wise`` pass per
    deletion position (max_len bounds the loop; entity strings are
    short by contract and longer rows raise); variants hash-partition
    into the fs exchange so all strings sharing a neighborhood
    co-locate; per-bucket candidate pairs group on the variant and
    verify with the two-pointer check (bounded by the neighborhood
    structure — a variant's group is the strings one edit apart at
    that position, not the corpus); canonical (a < b) pairs dedup
    exactly across variants via ``dedup_exact``.
    """
    import pyarrow.compute as pc

    from guac_ray.stages.assemble import dedup_exact

    ex = exchange_base or default_exchange("edit1")

    def variants(t: pa.Table) -> pa.Table:
        s = t[col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        s = pc.fill_null(s.cast(pa.string()), "")
        lens = pc.utf8_length(s).to_numpy(zero_copy_only=False)
        if lens.size and int(lens.max()) > max_len:
            raise ValueError(
                f"edit1_join: string longer than max_len={max_len}; "
                "this operator targets short entity strings — raise "
                "max_len deliberately if that is the data")
        ids = t[id_col]
        outs = [pa.table({id_col: ids, "s": s, "v": s})]  # identity
        for i in range(int(lens.max()) if lens.size else 0):
            mask = pa.array(lens > i)
            sub_s = s.filter(mask)
            sub_id = ids.filter(mask)
            head = pc.utf8_slice_codeunits(sub_s, start=0, stop=i)
            tail = pc.utf8_slice_codeunits(sub_s, start=i + 1,
                                           stop=2_147_483_647)
            outs.append(pa.table({
                id_col: sub_id, "s": sub_s,
                "v": pc.binary_join_element_wise(head, tail, ""),
            }))
        out = pa.concat_tables(outs)
        bucket = stable_hash(
            pd.DataFrame({"v": out["v"].to_pandas()}), ["v"]) % num_buckets
        return out.append_column(
            "_bucket", pa.array(bucket.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates([id_col, "v"])
        ra, rb, rd_ = [], [], []
        for _, g in df.groupby("v", sort=False):
            if len(g) < 2:
                continue
            if len(g) > 100_000:
                raise ValueError(
                    "edit1_join: a deletion-neighborhood group exceeds "
                    "100k strings (mass-duplicate key) — exact-dedup "
                    "the column first; the pair set itself would be "
                    "quadratic in the duplicates")
            g = g.drop_duplicates(id_col).sort_values(id_col)
            ids = g[id_col].to_numpy()
            ss = g["s"].to_numpy()
            for ii in range(len(ids)):
                for jj in range(ii + 1, len(ids)):
                    if _lev_le1(ss[ii], ss[jj]):
                        ra.append(ids[ii])
                        rb.append(ids[jj])
                        rd_.append(0 if ss[ii] == ss[jj] else 1)
        return pa.table({
            "a": pa.array(ra, type=pa.int64()),
            "b": pa.array(rb, type=pa.int64()),
            "d": pa.array(rd_, type=pa.int64()),
        })

    rows = ds.select_columns([id_col, col]).map_batches(
        variants, batch_format="pyarrow")
    pairs = fs_exchange_reduce(rows, ex, per_bucket, bucket_col="_bucket")
    if pairs is None:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "d": pa.array([], pa.int64())}))
    return dedup_exact(pairs, ["a", "b"], num_buckets=8,
                       keep_cols=["a", "b", "d"])


def shingle_strings(text: str, n: int = 5) -> list[str]:
    """Distinct character n-gram substrings of the whitespace-normalized,
    lowercased text — the string-valued sibling of
    ``dedup.ngram_hashes`` (exact strings, not hashes, so the result is
    bit-comparable to a SQL substr() oracle). A text shorter than ``n``
    yields itself as its only shingle."""
    s = " ".join((text or "").lower().split())
    if len(s) < n:
        return [s]
    return sorted({s[i:i + n] for i in range(len(s) - n + 1)})


def _prefix_len(n: int, threshold: float) -> int:
    """Required prefix length for Jaccard ≥ threshold is
    ``n - ceil(t*n) + 1``; this uses ``n - floor(t*n) + 1`` — one longer
    at fractional t·n — because float ceil overshoots at representation
    boundaries (e.g. 0.55*100 → 55.000…01 → ceil 56, a prefix ONE TOO
    SHORT, which silently loses true pairs). floor is safe in both fuzz
    directions: upward fuzz cannot cross the next integer, downward fuzz
    only lengthens the prefix."""
    return n - math.floor(threshold * n) + 1


def jaccard_similarity_join(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    shingle_n: int = 5,
    exchange_base: str | None = None,
    num_buckets: int = 16,
    broadcast_df_limit: int = 2_000_000,
    broadcast_sets_limit: int = 200_000,
    pair_buckets: int | None = None,
) -> Dataset:
    """All document pairs with n-gram Jaccard ≥ ``threshold`` →
    ``(da, db, j)`` with ``da < db`` and ``j`` the exact similarity
    (unrounded double — both engines compute the same int/int IEEE
    division)."""
    ex = exchange_base or default_exchange("simjoin")
    _debug = bool(os.environ.get("GUAC_SIMJOIN_DEBUG"))
    import time as _time

    _t0 = _time.time()

    def _mark(stage: str, ds_):
        """With GUAC_SIMJOIN_DEBUG set: materialize each stage and print
        its wall time (profiling aid; normal runs stay lazy/streaming)."""
        nonlocal _t0
        if not _debug:
            return ds_
        ds_ = ds_.materialize() if hasattr(ds_, "materialize") else ds_
        n = ds_.count() if hasattr(ds_, "count") else len(ds_)
        print(f"[simjoin] {stage}: {_time.time() - _t0:.1f}s rows={n}",
              flush=True)
        _t0 = _time.time()
        return ds_

    def shingle_batch(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        grams = [shingle_strings(x, shingle_n) for x in texts]
        counts = np.fromiter((len(g) for g in grams), dtype="int64",
                             count=len(grams))
        flat = [g for gs in grams for g in gs]
        return pa.table({
            id_col: pa.array(np.repeat(ids.astype("int64"), counts)),
            "g": pa.array(flat, type=pa.string()),
            "nsh": pa.array(np.repeat(counts, counts)),
        })

    sh = docs.map_batches(shingle_batch, batch_format="pyarrow")
    df_tab = grouped_agg(sh.select_columns(["g"]), ["g"],
                         {"df": ("g", "count")}, num_buckets=num_buckets
                         ).materialize()  # consumed twice: guard + attach

    df_tab = _mark("df_tab", df_tab)
    n_grams = df_tab.count()
    if n_grams == 0:  # no documents at all
        return rd.from_arrow(_result_schema.empty_table())
    if n_grams <= broadcast_df_limit:
        # df fits one worker: fuse df-attach + prefix selection + set
        # assembly into ONE re-scan of the documents (docs stay whole
        # inside their batch, so no regroup exchange is needed)
        df_pd = df_tab.to_pandas()
        df_ref = ray.put(dict(zip(df_pd["g"], df_pd["df"])))

        class Prefix:
            def __init__(self):
                self.df = ray.get(df_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ids = t[id_col].to_numpy(zero_copy_only=False)
                out_id, out_g, out_n, out_p = [], [], [], []
                for i, text in zip(ids, t[text_col].to_pylist()):
                    grams = shingle_strings(text, shingle_n)
                    k = min(_prefix_len(len(grams), threshold), len(grams))
                    grams.sort(key=lambda g: (self.df[g], g))
                    out_g.extend(grams[:k])
                    out_id.append(np.full(k, i, dtype="int64"))
                    out_n.append(np.full(k, len(grams), dtype="int64"))
                    out_p.append(np.arange(k, dtype="int64"))
                return pa.table({
                    id_col: pa.array(
                        np.concatenate(out_id) if out_id
                        else np.empty(0, dtype="int64")),
                    "g": pa.array(out_g, type=pa.string()),
                    "nsh": pa.array(
                        np.concatenate(out_n) if out_n
                        else np.empty(0, dtype="int64")),
                    "pos": pa.array(
                        np.concatenate(out_p) if out_p
                        else np.empty(0, dtype="int64")),
                })

        prefix = _mark("prefix", docs.map_batches(
            Prefix, batch_format="pyarrow", concurrency=(1, 8)))
    else:
        # huge gram vocabulary: attach df via co-partitioned hash join,
        # regroup rows by document through the exchange, select each
        # doc's prefix inside its bucket
        with_df = hash_join(sh, df_tab, on="g",
                            exchange_dir=os.path.join(ex, "df"),
                            num_buckets=num_buckets)

        def add_bucket(pdf: pd.DataFrame) -> pa.Table:
            pdf = pdf.copy()
            pdf["_bucket"] = (stable_hash(pdf, [id_col]) % num_buckets
                              ).astype("int64")
            return table_from_pandas(pdf, preserve_index=False)

        def prefix_reduce(t: pa.Table) -> pa.Table:
            pdf = t.to_pandas().sort_values([id_col, "df", "g"],
                                            kind="mergesort")
            n = pdf["nsh"].to_numpy()
            # floor-based prefix length — see _prefix_len for why not ceil
            klen = n - np.floor(threshold * n).astype("int64") + 1
            pos = pdf.groupby(id_col, sort=False).cumcount().to_numpy()
            keep = pos < klen
            pdf = pdf.loc[keep, [id_col, "g", "nsh"]]
            pdf["pos"] = pos[keep]
            return table_from_pandas(pdf, preserve_index=False)

        prefix = fs_exchange_reduce(
            with_df.map_batches(add_bucket, batch_format="pandas"),
            os.path.join(ex, "regroup"), prefix_reduce)
        if prefix is None:
            return rd.from_arrow(_result_schema.empty_table())

    # candidate pairs: prefix self-join on gram; pairs emitted inside the
    # reduce (ordered da < db), deduped across grams by a grouped count
    # J ≥ t ⇔ |A∩B| ≥ t/(1+t)·(|A|+|B|) — the required-overlap constant
    t_ratio = threshold / (1.0 + threshold)

    def pair_partial(t: pa.Table) -> pa.Table:
        """Candidate pairs from one gram bucket, with the SSJoin length
        filter AND the PPJoin positional filter applied INSIDE the
        per-gram cross product (numpy, group-chunked) — never a full
        pandas merge materialization. Lossless: a true pair's rarest
        shared gram sits at positions (i, j) with
        1 + min(na-i-1, nb-j-1) ≥ |A∩B| ≥ required, so that row always
        survives. On the saturated-vocabulary corpus this is the
        difference between 122 M materialized merge rows and ~100 k
        surviving candidates (measured at 50 k docs)."""
        pdf = t.to_pandas().sort_values("g", kind="mergesort")
        gv = pdf["g"].to_numpy()
        ids = pdf[id_col].to_numpy()
        pos = pdf["pos"].to_numpy()
        nn = pdf["nsh"].to_numpy()
        n_rows = len(gv)
        if n_rows == 0:
            return pa.schema([("da", pa.int64()),
                              ("db", pa.int64())]).empty_table()
        # all within-group (i < j) pairs, fully vectorized: row i pairs
        # with the counts[i] rows after it in its gram group
        group_id = np.cumsum(np.r_[0, gv[1:] != gv[:-1]])
        grp_end = np.searchsorted(group_id, group_id, side="right")
        counts = grp_end - np.arange(n_rows) - 1
        # mass-duplicate guard (edit1_join's discipline): a corpus of
        # byte-identical documents concentrates every copy's prefix in
        # ONE gram group — the candidate product is quadratic in the
        # duplicates and no filter can thin identical sets. Refuse
        # loudly instead of grinding ~n²/2 pairs through one task.
        if counts.size and int(counts.max()) + 1 > 100_000:
            raise ValueError(
                "jaccard_similarity_join: a prefix-gram group exceeds "
                "100k documents (mass-duplicate / empty-text corpus) — "
                "exact-dedup the text column first; identical sets "
                "make the candidate product quadratic")
        cum = np.cumsum(counts)
        total = int(cum[-1])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        CHUNK = 8_000_000  # pair-index buffer bound (~400 MB peak)
        p0 = 0
        while p0 < total:
            p1 = min(p0 + CHUNK, total)
            # rows covering pair indices [p0, p1)
            r0 = int(np.searchsorted(cum, p0, side="right"))
            r1 = int(np.searchsorted(cum, p1 - 1, side="right")) + 1
            c = counts[r0:r1]
            lidx = np.repeat(np.arange(r0, r1), c)
            ccum = np.cumsum(c)
            intra = (np.arange(int(ccum[-1]))
                     - np.repeat(ccum - c, c))
            ridx = lidx + 1 + intra
            # clip to the requested pair window (chunk edges split rows)
            base = cum[r0 - 1] if r0 > 0 else 0
            gpos = base + np.arange(len(lidx))
            w = (gpos >= p0) & (gpos < p1)
            lidx, ridx = lidx[w], ridx[w]
            na_, nb_ = nn[lidx], nn[ridx]
            bound = 1 + np.minimum(na_ - pos[lidx] - 1, nb_ - pos[ridx] - 1)
            req = t_ratio * (na_ + nb_) - 1e-9
            m = ((bound >= req)
                 & (threshold * na_ <= nb_ + 1e-9)
                 & (threshold * nb_ <= na_ + 1e-9)
                 & (ids[lidx] != ids[ridx]))
            if m.any():
                a_ids, b_ids = ids[lidx[m]], ids[ridx[m]]
                out_a.append(np.minimum(a_ids, b_ids))
                out_b.append(np.maximum(a_ids, b_ids))
            p0 = p1
        if not out_a:
            return pa.schema([("da", pa.int64()),
                              ("db", pa.int64())]).empty_table()
        out = pd.DataFrame({
            "da": np.concatenate(out_a),
            "db": np.concatenate(out_b),
        }).drop_duplicates()
        return table_from_pandas(out, preserve_index=False)

    ghash = os.path.join(ex, "cand")
    # pair generation is the quadratic stage — give it its own, cluster-
    # sized reduce parallelism rather than the (small) aggregate bucket
    # count, so every CPU chews expansion chunks
    if pair_buckets is None:
        from guac_ray.functions.joins import _default_num_buckets

        pair_buckets = _default_num_buckets()

    def add_gbucket(pdf: pd.DataFrame) -> pa.Table:
        pdf = pdf.copy()
        pdf["_bucket"] = (stable_hash(pdf, ["g"]) % pair_buckets).astype("int64")
        return table_from_pandas(pdf, preserve_index=False)

    cand = fs_exchange_reduce(
        prefix.map_batches(add_gbucket, batch_format="pandas"),
        ghash, pair_partial)
    if cand is None:
        return rd.from_arrow(_result_schema.empty_table())
    from guac_ray.functions.dedup import dedup_exact

    cand = _mark("cand_raw", cand)
    cand = _mark("cand", dedup_exact(cand, ["da", "db"], num_buckets=8))

    # verify: exact intersection of full shingle sets per candidate pair.
    # The set ships as ONE \x1f-joined string per doc — Arrow's hash join
    # cannot carry list<string> payload columns, and a flat string is
    # also the cheaper exchange payload.
    def sets_batch(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        grams = ["\x1f".join(shingle_strings(x, shingle_n))
                 for x in t[text_col].to_pylist()]
        return pa.table({
            id_col: pa.array(ids.astype("int64")),
            "gs": pa.array(grams, type=pa.string()),
        })

    # strategy guard on the INPUT row count (cheap metadata/count — never
    # re-executes the shingling pass just to pick a plan)
    n_docs = docs.count()
    sets = docs.map_batches(sets_batch, batch_format="pyarrow")

    def verify_fn(a_sets, b_sets, a_ids, b_ids):
        das, dbs, js = [], [], []
        for x, y, sa, sb in zip(a_ids, b_ids, a_sets, b_sets):
            s = sa if isinstance(sa, set) else set(sa.split("\x1f"))
            t_ = sb if isinstance(sb, set) else set(sb.split("\x1f"))
            c = len(s & t_)
            u = len(s) + len(t_) - c
            j = c / u if u else 1.0
            if j >= threshold:
                das.append(x); dbs.append(y); js.append(j)
        return pa.table({"da": pa.array(das, type=pa.int64()),
                         "db": pa.array(dbs, type=pa.int64()),
                         "j": pa.array(js, type=pa.float64())})

    if n_docs <= broadcast_sets_limit:
        sets_pd = sets.to_pandas()
        sref = ray.put(dict(zip(sets_pd[id_col],
                                [set(g.split("\x1f")) for g in sets_pd["gs"]])))

        class Verify:
            def __init__(self):
                self.sets = ray.get(sref)

            def __call__(self, t: pa.Table) -> pa.Table:
                a = t["da"].to_numpy(zero_copy_only=False)
                b = t["db"].to_numpy(zero_copy_only=False)
                return verify_fn([self.sets[x] for x in a],
                                 [self.sets[y] for y in b], a, b)

        # explicit batch_size: the candidate table arrives as a few large
        # dedup output blocks — without splitting, pool parallelism is
        # capped at the block count, not the pair count. Pool stays
        # moderate: every actor materializes the broadcast set dict once
        # in __init__, so more actors = more copies of it in heap.
        return cand.map_batches(Verify, batch_format="pyarrow",
                                batch_size=250_000, concurrency=(1, 8))

    from guac_ray.functions.dedup import _rename_cols

    with_a = hash_join(_rename_cols(cand, {"da": id_col}), sets,
                       on=id_col, exchange_dir=os.path.join(ex, "va"),
                       num_buckets=num_buckets)
    with_ab = hash_join(
        _rename_cols(_rename_cols(with_a, {id_col: "da", "gs": "gs_a"}),
                     {"db": id_col}),
        sets, on=id_col, exchange_dir=os.path.join(ex, "vb"),
        num_buckets=num_buckets)
    with_ab = _rename_cols(with_ab, {id_col: "db", "gs": "gs_b"})

    def verify_joined(t: pa.Table) -> pa.Table:
        return verify_fn(t["gs_a"].to_pylist(), t["gs_b"].to_pylist(),
                         t["da"].to_numpy(zero_copy_only=False),
                         t["db"].to_numpy(zero_copy_only=False))

    return with_ab.map_batches(verify_joined, batch_format="pyarrow")


_result_schema = pa.schema([("da", pa.int64()), ("db", pa.int64()),
                            ("j", pa.float64())])
