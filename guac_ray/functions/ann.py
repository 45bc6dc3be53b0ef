"""Similarity search over an embedding column (``list<float>``).

  - ``knn_brute``: baseline exact top-k — per-batch numpy matmul against
    a BROADCAST query matrix (``ray.put`` once), partial top-k per batch,
    tiny final merge. The shuffle carries k rows per (query, batch).
  - ``IvfIndex`` / ``knn_ivf``: the scale path — k-means centroids fitted
    on a driver-side sample, batches prune to the ``nprobe`` nearest
    centroid lists before scoring.
  - ``embedding_neardup``: random-hyperplane LSH buckets + within-bucket
    cosine for near-duplicate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas

import ray
from ray.data import Dataset

__all__ = ["knn_brute", "IvfIndex", "knn_ivf", "embedding_neardup"]


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_mat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, (n × dim) float64) for one batch. Uniform-length vectors →
    one flat-buffer reshape, no per-row python objects: list<float>
    flattens; Ray tensor-extension arrays already yield (n, dim) from
    to_numpy. Null or RAGGED vectors raise loudly: a blind
    ``reshape(n, -1)`` would silently scramble row boundaries whenever
    the flat length happens to divide n (wrong neighbors, no error).
    Zero-row batches return a (0, 0) matrix — callers short-circuit
    empties BEFORE scoring (a 0-dim matrix cannot matmul a query)."""
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"].combine_chunks()
    n = len(ids)
    if n == 0:
        return ids, np.zeros((0, 0), dtype=np.float64)
    if hasattr(col, "flatten"):          # plain List/LargeList/FixedSizeList
        if col.null_count:
            raise ValueError(
                "_batch_mat: null embedding rows — drop or impute them "
                "upstream (flatten() would silently misalign rows)")
        if hasattr(col, "value_lengths"):        # not FixedSizeListArray
            vl = col.value_lengths().to_numpy(zero_copy_only=False)
            if vl.min() != vl.max():
                raise ValueError(
                    f"_batch_mat: ragged embedding lists (lengths "
                    f"{int(vl.min())}..{int(vl.max())}) — fixed-dim "
                    "vectors are required")
        mat = col.flatten().to_numpy(zero_copy_only=False).reshape(
            n, -1).astype(np.float64)
    else:                                # ArrowTensorArray et al.
        mat = np.asarray(col.to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        if mat.ndim != 2:
            raise ValueError(
                "_batch_mat: embedding column is not rectangular")
    return ids, mat


class _BruteScorer:
    """Per-batch partial top-k vs the broadcast query matrix."""

    def __init__(self, qref, k: int):
        q = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        self.qids = q["qids"]
        self.qmat = _normalize(np.asarray(q["qmat"], dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        ids, mat = _batch_mat(batch)
        sims = _normalize(mat) @ self.qmat.T          # (n, q)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, len(ids))
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            top = np.argpartition(-col, k - 1)[:k] if len(col) > k else np.arange(len(col))
            for i in top:
                out_q.append(int(qid))
                out_v.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def _final_topk(partials: Dataset, k: int) -> Dataset:
    def per_query(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(per_query, batch_format="pandas")


def knn_brute(
    embeds: Dataset, qids: list[int], qmat: np.ndarray, k: int = 10, concurrency: int = 2
) -> Dataset:
    """Exact cosine top-k: (query_id, vec_id, score) — k rows per query.
    Ties broken by vec_id so output is deterministic."""
    qref = ray.put({"qids": list(qids), "qmat": np.asarray(qmat)})
    partials = embeds.map_batches(
        _BruteScorer,
        fn_constructor_args=(qref, k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return _final_topk(partials, k)


class IvfIndex:
    """Tiny IVF: k-means on a driver-side sample (numpy Lloyd, fixed
    seed), centroids broadcast to scorers. At cluster scale the sample is
    ``ds.random_sample``; centroid count ~ sqrt(N)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids)

    @classmethod
    def fit(cls, embeds: Dataset, n_clusters: int = 16, sample: int = 4096,
            iters: int = 10, seed: int = 7) -> "IvfIndex":
        # UNIFORM sample — limit() would take the first blocks only and
        # bias centroids badly on sorted/clustered inputs. The trim from
        # the Bernoulli oversample down to ``sample`` rows must ALSO be
        # uniform: ``.limit(sample)`` keeps an ordered PREFIX of the
        # sampled rows, so on a sorted/clustered input the tail of the
        # dataset would get ~zero centroid mass — a seeded rng.choice
        # over the materialized oversample (~2·sample rows, driver-sized
        # by construction) keeps every row equally likely.
        n = embeds.count()
        if n > sample:
            frac = min(1.0, (2.0 * sample) / n)  # oversample, then trim
            sample_rows = embeds.random_sample(frac, seed=seed).to_pandas()
            if len(sample_rows) > sample:
                pick = np.random.default_rng(seed + 1).choice(
                    len(sample_rows), size=sample, replace=False)
                sample_rows = sample_rows.iloc[np.sort(pick)]
            if len(sample_rows) < min(sample // 2, n):
                sample_rows = embeds.limit(sample).to_pandas()  # tiny-input fallback
        else:
            sample_rows = embeds.to_pandas()
        mat = _normalize(np.stack(sample_rows["embedding"].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(seed)
        cents = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
        for _ in range(iters):
            assign = (mat @ cents.T).argmax(axis=1)
            for c in range(len(cents)):
                members = mat[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
            cents = _normalize(cents)
        return cls(cents)

    # ---- persistence: fit once, reuse across sessions/queries ----

    def save(self, path: str) -> None:
        """Parquet snapshot (one row per centroid, list<float> column)."""
        pd.DataFrame({
            "centroid_id": range(len(self.centroids)),
            "centroid": list(self.centroids),
        }).to_parquet(path, index=False)

    @classmethod
    def load(cls, path: str) -> "IvfIndex":
        df = pd.read_parquet(path).sort_values("centroid_id")
        return cls(np.stack(df.centroid.to_numpy()).astype(np.float64))


class _IvfScorer:
    def __init__(self, qref, cents_ref, k: int, nprobe: int):
        q = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        self.qids = q["qids"]
        self.qmat = _normalize(np.asarray(q["qmat"], dtype=np.float64))
        cents = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        self.cents = cents
        self.k = k
        # per-query probe set, computed once per actor
        qc = self.qmat @ cents.T
        self.probe = np.argsort(-qc, axis=1)[:, :nprobe]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        ids, mat = _batch_mat(batch)
        nmat = _normalize(mat)
        assign = (nmat @ self.cents.T).argmax(axis=1)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            mask = np.isin(assign, self.probe[j])
            if not mask.any():
                continue
            col = nmat[mask] @ self.qmat[j]
            sub_ids = ids[mask]
            k = min(self.k, len(sub_ids))
            top = np.argpartition(-col, k - 1)[:k] if len(col) > k else np.arange(len(col))
            for i in top:
                out_q.append(int(qid))
                out_v.append(int(sub_ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def knn_ivf(
    embeds: Dataset,
    qids: list[int],
    qmat: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    concurrency: int = 2,
) -> Dataset:
    """Approximate top-k via IVF pruning. Recall measured in tests vs
    ``knn_brute``; raise ``nprobe`` toward n_clusters for exactness."""
    index = IvfIndex.fit(embeds, n_clusters=n_clusters)
    qref = ray.put({"qids": list(qids), "qmat": np.asarray(qmat)})
    cref = ray.put(index.centroids)
    partials = embeds.map_batches(
        _IvfScorer,
        fn_constructor_args=(qref, cref, k, nprobe),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return _final_topk(partials, k)


_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())])


def _empty_pairs() -> pa.Table:
    return _PAIR_SCHEMA.empty_table()


def _exact_neardup(embeds: Dataset, threshold: float, concurrency) -> Dataset:
    """All-pairs exact cosine under the small-table guard: the full
    normalized matrix broadcasts once (``ray.put``); each batch scores its
    rows against it. Orientation a < b emits every unordered pair exactly
    once globally — no dedup pass needed. 100% recall ⇒ byte-stable vs a
    brute-force oracle regardless of LSH banding luck."""
    df = embeds.to_pandas()  # bounded by exact_limit rows
    ref = ray.put({
        "ids": df["vec_id"].to_numpy().astype("int64"),
        "mat": _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64)),
    })

    class Exact:
        def __init__(self):
            d = ray.get(ref)
            self.ids, self.mat = d["ids"], d["mat"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_pairs()
            ids, mat = _batch_mat(batch)
            sims = _normalize(mat) @ self.mat.T
            rows, cols = np.nonzero(sims >= threshold)
            a, b, s = ids[rows], self.ids[cols], sims[rows, cols]
            m = a < b
            if not m.any():
                return _empty_pairs()
            return pa.table({"a": pa.array(a[m].astype("int64")),
                             "b": pa.array(b[m].astype("int64")),
                             "cosine": pa.array(s[m])})

    return embeds.map_batches(Exact, batch_format="pyarrow",
                              concurrency=concurrency)


def _join_verify_pairs(
    pairs: Dataset, embeds: Dataset, threshold: float,
    exchange_dir: str | None, num_buckets: int | None,
) -> Dataset:
    """Candidate (a, b) pairs ⋈ embeddings on each side through the
    co-partitioned fs-exchange hash join, then vectorized row-wise cosine.
    The embedding table is never broadcast and never rides the band
    shuffle — the plan ``verify_pairs_sigs`` uses above its guard.

    Vectors travel as raw float64 BYTES (one flat-buffer encode per
    batch): Arrow's acero join rejects list-typed payload columns, and
    binary is the proven payload type on this path (the MinHash sig
    joins)."""
    import os

    from guac_ray.functions.dedup import _rename_cols as rename
    from guac_ray.functions.joins import default_exchange, hash_join

    def encode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "emb": pa.array([], type=pa.binary())})
        ids, mat = _batch_mat(batch)
        mat = np.ascontiguousarray(mat, dtype=np.float64)
        fsb = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(8 * mat.shape[1]), n, [None, pa.py_buffer(mat.tobytes())])
        return pa.table({"vec_id": pa.array(ids.astype("int64")),
                         "emb": fsb.cast(pa.binary())})

    emb_bin = embeds.map_batches(encode, batch_format="pyarrow")

    ex = exchange_dir or default_exchange("emb_verify")
    with_a = hash_join(
        rename(pairs, {"a": "vec_id"}), emb_bin,
        on="vec_id", exchange_dir=os.path.join(ex, "a"), num_buckets=num_buckets,
    )
    with_ab = hash_join(
        rename(with_a, {"vec_id": "a", "emb": "emb_a", "b": "vec_id"}),
        emb_bin,
        on="vec_id", exchange_dir=os.path.join(ex, "b"), num_buckets=num_buckets,
    )
    with_ab = rename(with_ab, {"vec_id": "b", "emb": "emb_b"})

    def decode(col: pa.ChunkedArray, n: int) -> np.ndarray:
        return np.frombuffer(b"".join(col.to_pylist()),
                             dtype=np.float64).reshape(n, -1)

    def verify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _empty_pairs()
        sim = (_normalize(decode(t["emb_a"], n))
               * _normalize(decode(t["emb_b"], n))).sum(axis=1)
        keep = sim >= threshold
        if not keep.any():
            return _empty_pairs()
        return pa.table({
            "a": pa.array(t["a"].to_numpy(zero_copy_only=False)[keep].astype("int64")),
            "b": pa.array(t["b"].to_numpy(zero_copy_only=False)[keep].astype("int64")),
            "cosine": pa.array(sim[keep]),
        })

    return with_ab.map_batches(verify, batch_format="pyarrow")


def embedding_neardup(
    embeds: Dataset, threshold: float = 0.95, num_bands: int = 8,
    planes_per_band: int = 8, seed: int = 7, concurrency: int = 2,
    num_coarse: int = 16, max_bucket: int = 4000,
    exact_limit: int = 10_000, shuffle_cell_limit: int = 50_000_000,
    exchange_dir: str | None = None, num_join_buckets: int | None = None,
) -> Dataset:
    """Near-duplicate vector pairs → (a, b, cosine). Size-guarded plan,
    three regimes by input shape:

      1. ``count ≤ exact_limit``: all-pairs exact cosine against a
         broadcast matrix (10k × 768-d f64 ≈ 61 MB) — exact results make
         the output robust to LSH recall at the threshold boundary
         (multi-band recall at cosine == 0.95 is ~0.99, not 1.0).
      2. ``count × dim ≤ shuffle_cell_limit``: multi-band random-
         hyperplane LSH (``num_bands`` bands × ``planes_per_band``
         planes; candidate = collision in ANY band), embeddings ride the
         band shuffle as the verify payload, exact cosine inside each
         bucket. Recall math: P(bit)=1−θ/π; b=8, r=8 at 0.95 → ≈0.99.
      3. above it (wide vectors × many rows — the 100-TB shape): bands
         carry (band, bucket, vec_id) ONLY; in-bucket candidates verify
         via pairs ⋈ embeddings fs-exchange hash joins — the vector
         column moves through ONE co-partitioned join per side instead
         of ×num_bands through the shuffle.

    All regimes: bucket groupby is COARSE (``num_coarse`` groups, fine
    (band, bucket) fan-out in pandas inside), ``max_bucket`` caps
    degenerate buckets, cross-band duplicate pairs exact-deduped.
    """
    from guac_ray.stages.assemble import dedup_exact, ensure_schema

    n_rows = embeds.count()
    if n_rows <= exact_limit:
        return _exact_neardup(embeds, threshold, concurrency)

    first = embeds.take(1)
    dim = len(first[0]["embedding"]) if first else 0
    carry_embedding = n_rows * max(dim, 1) <= shuffle_cell_limit

    total_planes = num_bands * planes_per_band

    class Project:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                cols = {"band_id": pa.array([], type=pa.int64()),
                        "bucket": pa.array([], type=pa.int64()),
                        "vec_id": pa.array([], type=pa.int64())}
                if carry_embedding:
                    cols["embedding"] = batch["embedding"].combine_chunks()
                return pa.table(cols)
            ids, mat = _batch_mat(batch)
            if self.planes is None:
                self.planes = np.random.default_rng(seed).standard_normal(
                    (mat.shape[1], total_planes))
            bits = ((_normalize(mat) @ self.planes) > 0).astype(np.int64)
            bits = bits.reshape(len(ids), num_bands, planes_per_band)
            keys = (bits << np.arange(planes_per_band)[None, None, :]).sum(axis=2)
            n = len(ids)
            # explode: one row per (vec, band)
            cols = {
                "band_id": pa.array(
                    np.tile(np.arange(num_bands, dtype=np.int64), n)),
                "bucket": pa.array(keys.reshape(-1).astype("int64")),
                "vec_id": pa.array(np.repeat(ids.astype("int64"), num_bands)),
            }
            if carry_embedding:
                cols["embedding"] = batch["embedding"].take(
                    pa.array(np.repeat(np.arange(n), num_bands)))
            return pa.table(cols)

    def coarse(batch: pa.Table) -> pa.Table:
        from guac_ray.stages.assemble import hash_bucket

        b = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bid = batch["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = b ^ (bid * np.uint64(0x9E3779B97F4A7C15))
        return batch.append_column("_cb", pa.array(hash_bucket(key, num_coarse)))

    out_fields = [("a", pa.int64()), ("b", pa.int64())]
    if carry_embedding:
        out_fields.append(("cosine", pa.float64()))
    out_schema = pa.schema(out_fields)

    def per_coarse(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        outs = []
        for _, sub in g.groupby(["band_id", "bucket"], sort=False):
            sub = sub.drop_duplicates("vec_id")
            if len(sub) < 2:
                continue
            sub = sub.nsmallest(max_bucket, "vec_id").sort_values("vec_id")
            ids = sub["vec_id"].to_numpy()
            iu = np.triu_indices(len(ids), k=1)
            if carry_embedding:
                mat = _normalize(
                    np.stack(sub["embedding"].to_numpy()).astype(np.float64))
                sv = (mat @ mat.T)[iu]
                keep = sv >= threshold
                if keep.any():
                    outs.append(pd.DataFrame({
                        "a": ids[iu[0][keep]], "b": ids[iu[1][keep]],
                        "cosine": sv[keep],
                    }))
            else:
                # candidates only — cosine comes from the join verify
                outs.append(pd.DataFrame({"a": ids[iu[0]], "b": ids[iu[1]]}))
        if not outs:
            return out_schema.empty_table()
        return table_from_pandas(pd.concat(outs, ignore_index=True),
                                    schema=out_schema, preserve_index=False)

    import ray.data as rd

    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce

    banded = (
        embeds.map_batches(Project, batch_format="pyarrow", concurrency=concurrency)
        .map_batches(coarse, batch_format="pyarrow")
    )
    pairs = fs_exchange_reduce(
        banded,
        (exchange_dir + "_bands") if exchange_dir else default_exchange("emb_bands"),
        per_coarse, bucket_col="_cb",
    )
    if pairs is None:
        pairs = rd.from_arrow(out_schema.empty_table())
    # same pair collides in several bands — keep one (cosine is identical)
    if carry_embedding:
        out = dedup_exact(pairs, ["a", "b"], num_buckets=8,
                          keep_cols=["a", "b", "cosine"])
        return ensure_schema(out, _PAIR_SCHEMA)
    cands = dedup_exact(pairs, ["a", "b"], num_buckets=8)
    out = _join_verify_pairs(cands, embeds, threshold,
                             exchange_dir, num_join_buckets)
    return ensure_schema(out, _PAIR_SCHEMA)


def rrf_fuse(legs, key: str = "doc_id", base: int = 60, k: int = 10,
             scale: int = 1_000_000):
    """Reciprocal-rank fusion (Cormack et al. 2009) of retriever legs
    into one integer-exact ranking: ``legs`` is a list of
    ``(rank_col, frame)`` where each frame carries ``key`` plus that
    leg's 1-based rank column. A doc's fused score is
    ``Σ scale // (base + rank)`` over the legs that returned it
    (absent legs contribute 0 and surface as rank 0 in the output) —
    pure int64 floor division, so the fused ranking is bit-exact on
    any engine; only RANKS cross the float boundary upstream.

    Fusion touches only the Σ|leg| candidate rows — final-top-k inputs
    are driver-sized by construction (k rows per leg), so this runs on
    the driver by design; the distributed work is inside each leg."""
    import pandas as pd

    fused = None
    rank_cols = []
    for rank_col, frame in legs:
        f = frame[[key, rank_col]].copy()
        rank_cols.append(rank_col)
        fused = f if fused is None else fused.merge(f, on=key, how="outer")
    score = np.zeros(len(fused), dtype="int64")
    for rc in rank_cols:
        r = fused[rc].fillna(0).astype("int64")
        fused[rc] = r
        score = score + np.where(r.to_numpy() > 0,
                                 scale // (base + r.to_numpy()), 0)
    fused["rrf_fp"] = score
    fused[key] = fused[key].astype("int64")
    return (fused[[key, *rank_cols, "rrf_fp"]]
            .sort_values(["rrf_fp", key], ascending=[False, True])
            .head(k).reset_index(drop=True))
