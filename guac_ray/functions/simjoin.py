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

import ray
import ray.data as rd
from ray.data import Dataset

from guac_ray.functions.joins import default_exchange, hash_join
from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash
from guac_ray.stages.groupagg import grouped_agg

__all__ = ["shingle_strings", "jaccard_similarity_join"]


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
) -> Dataset:
    """All document pairs with n-gram Jaccard ≥ ``threshold`` →
    ``(da, db, j)`` with ``da < db`` and ``j`` the exact similarity
    (unrounded double — both engines compute the same int/int IEEE
    division)."""
    ex = exchange_base or default_exchange("simjoin")

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
                out_id, out_g, out_n = [], [], []
                for i, text in zip(ids, t[text_col].to_pylist()):
                    grams = shingle_strings(text, shingle_n)
                    k = min(_prefix_len(len(grams), threshold), len(grams))
                    grams.sort(key=lambda g: (self.df[g], g))
                    out_g.extend(grams[:k])
                    out_id.append(np.full(k, i, dtype="int64"))
                    out_n.append(np.full(k, len(grams), dtype="int64"))
                return pa.table({
                    id_col: pa.array(
                        np.concatenate(out_id) if out_id
                        else np.empty(0, dtype="int64")),
                    "g": pa.array(out_g, type=pa.string()),
                    "nsh": pa.array(
                        np.concatenate(out_n) if out_n
                        else np.empty(0, dtype="int64")),
                })

        prefix = docs.map_batches(Prefix, batch_format="pyarrow",
                                  concurrency=(1, 4))
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
            return pa.Table.from_pandas(pdf, preserve_index=False)

        def prefix_reduce(t: pa.Table) -> pa.Table:
            pdf = t.to_pandas().sort_values([id_col, "df", "g"],
                                            kind="mergesort")
            n = pdf["nsh"].to_numpy()
            # floor-based prefix length — see _prefix_len for why not ceil
            klen = n - np.floor(threshold * n).astype("int64") + 1
            pos = pdf.groupby(id_col, sort=False).cumcount().to_numpy()
            keep = pos < klen
            return pa.Table.from_pandas(
                pdf.loc[keep, [id_col, "g", "nsh"]], preserve_index=False)

        prefix = fs_exchange_reduce(
            with_df.map_batches(add_bucket, batch_format="pandas"),
            os.path.join(ex, "regroup"), prefix_reduce)
        if prefix is None:
            return rd.from_arrow(_result_schema.empty_table())

    # candidate pairs: prefix self-join on gram; pairs emitted inside the
    # reduce (ordered da < db), deduped across grams by a grouped count
    def pair_partial(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        m = pdf.merge(pdf, on="g", suffixes=("_a", "_b"))
        a = m[f"{id_col}_a"].to_numpy()
        b = m[f"{id_col}_b"].to_numpy()
        na = m["nsh_a"].to_numpy()
        nb = m["nsh_b"].to_numpy()
        # length filter (SSJoin): |A∩B| ≤ min(na,nb), so J ≥ t requires
        # t·max ≤ min. Small slack keeps the float compare conservative —
        # a filter may only over-keep, never drop a true pair.
        keep = (a < b) & (threshold * na <= nb + 1e-9) \
            & (threshold * nb <= na + 1e-9)
        out = pd.DataFrame({"da": a[keep], "db": b[keep]}).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    ghash = os.path.join(ex, "cand")

    def add_gbucket(pdf: pd.DataFrame) -> pa.Table:
        pdf = pdf.copy()
        pdf["_bucket"] = (stable_hash(pdf, ["g"]) % num_buckets).astype("int64")
        return pa.Table.from_pandas(pdf, preserve_index=False)

    cand = fs_exchange_reduce(
        prefix.map_batches(add_gbucket, batch_format="pandas"),
        ghash, pair_partial)
    if cand is None:
        return rd.from_arrow(_result_schema.empty_table())
    from guac_ray.functions.dedup import dedup_exact

    cand = dedup_exact(cand, ["da", "db"], num_buckets=8)

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

        return cand.map_batches(Verify, batch_format="pyarrow",
                                concurrency=(1, 2))

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
