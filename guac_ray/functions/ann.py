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

import ray
from ray.data import Dataset

__all__ = ["knn_brute", "IvfIndex", "knn_ivf", "embedding_neardup"]


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_mat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"].combine_chunks()
    # uniform-length vectors → one flat buffer reshape, no per-row python
    # objects: list<float> flattens; Ray tensor-extension arrays already
    # yield (n, dim) from to_numpy. Ragged lists fall back to a stack.
    try:
        if hasattr(col, "flatten"):      # plain ListArray
            mat = col.flatten().to_numpy(zero_copy_only=False).reshape(
                len(ids), -1).astype(np.float64)
        else:                            # ArrowTensorArray et al.
            mat = np.asarray(col.to_numpy(zero_copy_only=False),
                             dtype=np.float64)
            if mat.ndim != 2:
                raise ValueError("not rectangular")
    except (ValueError, TypeError):
        mat = np.stack(col.to_pandas().to_numpy()).astype(np.float64)
    return ids, mat


class _BruteScorer:
    """Per-batch partial top-k vs the broadcast query matrix."""

    def __init__(self, qref, k: int):
        q = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        self.qids = q["qids"]
        self.qmat = _normalize(np.asarray(q["qmat"], dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
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
        # bias centroids badly on sorted/clustered inputs
        n = embeds.count()
        if n > sample:
            frac = min(1.0, (2.0 * sample) / n)  # oversample, then trim
            sample_rows = (
                embeds.random_sample(frac, seed=seed).limit(sample).to_pandas()
            )
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


def embedding_neardup(
    embeds: Dataset, threshold: float = 0.95, num_bands: int = 8,
    planes_per_band: int = 8, seed: int = 7, concurrency: int = 2,
    num_coarse: int = 16, max_bucket: int = 4000,
) -> Dataset:
    """Near-duplicate vector pairs by MULTI-BAND random-hyperplane LSH:
    ``num_bands`` independent bands of ``planes_per_band`` hyperplanes
    each; a pair is a candidate if it collides in ANY band (union), then
    verified with exact cosine inside the bucket → (a, b, cosine).

    Recall math: P(bit match) = 1 − θ/π; with b=8, r=8 at cosine 0.95
    (θ≈18°, p≈0.90) the candidate probability is 1−(1−p⁸)⁸ ≈ 0.99 —
    versus ~0.3 for the single 12-plane band this replaces. Cross-band
    duplicate pairs are removed by an exact dedup on (a, b).

    Scale shape mirrors the MinHash path: the bucket groupby is COARSE
    (``num_coarse`` groups — fine (band, bucket) fan-out happens in
    pandas inside), embeddings ride the shuffle ×num_bands (they are the
    verify payload; for very wide vectors lower num_bands or verify via
    a pairs ⋈ embeddings hash join like dedup.verify_pairs_sigs).
    ``max_bucket`` caps degenerate buckets.
    """
    from guac_ray.stages.assemble import dedup_exact, stable_hash

    total_planes = num_bands * planes_per_band

    class Project:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _batch_mat(batch)
            if self.planes is None:
                dim = mat.shape[1]
                self.planes = np.random.default_rng(seed).standard_normal(
                    (dim, total_planes))
            bits = ((_normalize(mat) @ self.planes) > 0).astype(np.int64)
            bits = bits.reshape(len(ids), num_bands, planes_per_band)
            keys = (bits << np.arange(planes_per_band)[None, None, :]).sum(axis=2)
            n = len(ids)
            emb = batch["embedding"]
            # explode: one row per (vec, band)
            idx = pa.array(np.repeat(np.arange(n), num_bands))
            return pa.table(
                {
                    "band_id": pa.array(
                        np.tile(np.arange(num_bands, dtype=np.int64), n)),
                    "bucket": pa.array(keys.reshape(-1).astype("int64")),
                    "vec_id": pa.array(np.repeat(ids.astype("int64"), num_bands)),
                    "embedding": emb.take(idx),
                }
            )

    def coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cb"] = (stable_hash(df, ["band_id", "bucket"]) % num_coarse).astype("int64")
        return df

    def per_coarse(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby(["band_id", "bucket"], sort=False):
            sub = sub.drop_duplicates("vec_id")
            if len(sub) < 2:
                continue
            sub = sub.nsmallest(max_bucket, "vec_id").sort_values("vec_id")
            ids = sub["vec_id"].to_numpy()
            mat = _normalize(np.stack(sub["embedding"].to_numpy()).astype(np.float64))
            sims = mat @ mat.T
            iu = np.triu_indices(len(ids), k=1)
            sv = sims[iu]
            keep = sv >= threshold
            if keep.any():
                outs.append(pd.DataFrame({
                    "a": ids[iu[0][keep]], "b": ids[iu[1][keep]], "cosine": sv[keep],
                }))
        if not outs:
            return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
                {"a": "int64", "b": "int64", "cosine": "float64"})
        return pd.concat(outs, ignore_index=True)

    pairs = (
        embeds.map_batches(Project, batch_format="pyarrow", concurrency=concurrency)
        .map_batches(coarse, batch_format="pandas")
        .groupby("_cb")
        .map_groups(per_coarse, batch_format="pandas")
    )
    # same pair collides in several bands — keep one (cosine is identical)
    from guac_ray.stages.assemble import ensure_schema

    out = dedup_exact(pairs, ["a", "b"], num_buckets=8,
                      keep_cols=["a", "b", "cosine"])
    return ensure_schema(out, pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]))
