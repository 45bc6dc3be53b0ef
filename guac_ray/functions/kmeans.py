"""Distributed k-means over an embedding column — the semantic-
clustering primitive of corpus curation (cluster-balanced sampling,
semantic dedup, domain discovery). Reference analog: GUAC has no ML
clustering; this is one of the beyond-reference training-data operators
(SURVEY.md §2 extension family, like minhash/simhash/ANN).

Determinism contract (why any engine reproduces it bit-for-bit):
  * embeddings quantize to NON-NEGATIVE int64 fixed point
    ``floor((x + offset) * scale)`` — float32→float64 promotion, one
    multiply, one floor: every engine computes identical doubles, and
    floor (unlike round) has no half-even/half-away ambiguity;
  * all distances are exact int64 arithmetic (no float accumulate
    order-dependence), ties broken to the LOWEST cluster id;
  * centroid update is ``sum // count`` — on non-negative ints floor
    division == truncating division, so DuckDB's ``//`` and numpy's
    ``//`` agree (the offset exists precisely to keep everything
    non-negative); empty clusters carry the previous centroid forward.
  The SQL oracle (suite.EMB_KMEANS_SQL) unrolls the same iterations as
  materialized CTEs, the fixed-point-PageRank discipline.

Scale shape (100 TB posture):
  * each iteration is ONE streaming ``map_batches`` pass over the
    column-pruned input: batches matmul against the broadcast centroid
    matrix (``ray.put`` once per iteration, read per actor) and emit
    k partial rows (cluster, count, per-dim sums) — the driver reduces
    k × num_blocks partial rows, bounded by parallelism, never by data;
  * the input is re-read per iteration rather than pinned: at 100 TB
    the object store cannot hold the projection, and a pruned 2-column
    parquet re-scan is the streaming-correct cost of an iterative
    algorithm (same posture as pagerank.py's edge re-reads);
  * the final labelled output is a streamed ``map_batches`` pass
    returning a Dataset — nothing data-sized lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ray.data import Dataset

__all__ = ["quantize_embeddings", "kmeans_fixed_point",
           "semdedup_embeddings"]


def quantize_embeddings(
    batch: pa.Table, vec_col: str, scale: int, offset: float
) -> np.ndarray:
    """(rows, dim) int64 fixed-point matrix for one Arrow batch.
    Accepts list<float> (parquet) and Ray's tensor extension arrays
    (in-memory datasets); vectors must be non-null and equal-length."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        n = len(col)
        flat = col.flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        q = np.floor((flat + offset) * scale).astype(np.int64)
        return q.reshape(n, -1)
    arr = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64)
    return np.floor((arr + offset) * scale).astype(np.int64)


def _assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_k ||q - c_k||² in exact int64; np.argmin returns the first
    (lowest) index on ties — the SQL ``ORDER BY dist, cid LIMIT 1``."""
    # ||q||² is constant per row — rank by -2·q·cᵀ + ||c||² only
    cross = q @ cents.T  # int64 matmul, exact
    d = (cents * cents).sum(axis=1)[None, :] - 2 * cross
    return np.argmin(d, axis=1).astype(np.int64)


def _lloyd_centroids(
    proj: Dataset,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int,
    scale: int,
    offset: float,
) -> np.ndarray:
    """The Lloyd loop under the fixed-point contract above; returns the
    final (k × dim) int64 centroid matrix. Init: the embeddings of the
    k SMALLEST ids (deterministic, no RNG); loop ``iters`` times:
    assign → integer-mean update.
    """
    # init pull: per-batch top-k keeps the driver pull bounded at
    # k × num_blocks rows, never the table
    def topk_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])[:k]
        return t.take(idx)

    small = proj.map_batches(topk_partial, batch_format="pyarrow").take_all()
    small.sort(key=lambda r: r[id_col])
    init_rows = small[:k]
    if len(init_rows) < k:
        raise ValueError(f"kmeans: k={k} but only {len(init_rows)} rows")
    cents = np.floor(
        (np.asarray([r[vec_col] for r in init_rows], dtype=np.float64)
         + offset) * scale).astype(np.int64)
    dim = cents.shape[1]

    for _ in range(iters):
        cref = ray.put(cents)

        def partial_sums(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:      # empty block: contribute no partial
                return pa.table({
                    "cluster": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.list_(pa.int64())),
                })
            c = ray.get(cref)
            q = quantize_embeddings(t, vec_col, scale, offset)
            a = _assign(q, c)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            # sort-by-assignment + reduceat: exact int64 sums (order-free)
            # without np.add.at's unbuffered per-element scatter — this
            # is the hottest line of every Lloyd iteration
            order = np.argsort(a, kind="stable")
            asorted = a[order]
            bounds = np.flatnonzero(np.r_[True, asorted[1:] != asorted[:-1]])
            sums = np.zeros((k, q.shape[1]), dtype=np.int64)
            sums[asorted[bounds]] = np.add.reduceat(q[order], bounds, axis=0)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "n": pa.array(counts),
                "s": pa.array(list(sums), type=pa.list_(pa.int64())),
            })

        parts = proj.map_batches(
            partial_sums, batch_format="pyarrow").take_all()
        # k rows per input block — bounded by parallelism, not data
        n = np.zeros(k, dtype=np.int64)
        s = np.zeros((k, dim), dtype=np.int64)
        for r in parts:
            n[r["cluster"]] += r["n"]
            s[r["cluster"]] += np.asarray(r["s"], dtype=np.int64)
        nz = n > 0
        new = cents.copy()
        new[nz] = s[nz] // n[nz, None]  # non-negative: floor == trunc
        cents = new
    return cents


def kmeans_fixed_point(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    scale: int = 4096,
    offset: float = 1.0,
) -> Dataset:
    """Lloyd's iterations under the fixed-point contract above; returns
    the final assignment as a Dataset (id_col, cluster) streamed by one
    more pass over the input."""
    proj = ds.select_columns([id_col, vec_col])
    cents = _lloyd_centroids(proj, vec_col, id_col, k, iters, scale, offset)
    cref = ray.put(cents)

    def final_assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col],
                             "cluster": pa.array([], type=pa.int64())})
        c = ray.get(cref)
        q = quantize_embeddings(t, vec_col, scale, offset)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(_assign(q, c)),
        })

    return proj.map_batches(final_assign, batch_format="pyarrow")


def semdedup_embeddings(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    scale: int = 4096,
    offset: float = 1.0,
    dist2_max: int = 1_700_000,
    exchange_base: str | None = None,
    num_buckets: int = 8,
    max_cluster_rows: int = 2_000_000,
) -> Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then prune
    near-duplicates WITHIN each cluster — the clustering bounds the
    pairwise work to per-cluster blocks instead of the corpus square.
    Beyond-reference operator (GUAC has no embedding ops); complements
    ``functions.ann.embedding_neardup`` (LSH buckets) with the
    cluster-bucketed regime the paper uses at web scale.

    Returns (id_col, cluster, kept) with kept ∈ {0, 1} int64: a row is
    kept unless SOME lower-id row in ITS cluster lies within
    ``dist2_max`` quantized squared L2. For unit-norm embeddings
    cos(a,b) ≥ τ  ⟺  ‖a−b‖² ≤ 2(1−τ), so the default 1_700_000 at
    scale=4096 ≈ cosine 0.9493 (2·(1−τ)·4096² = 1.7e6). The drop rule
    is the pair-graph "any lower-id witness" variant, NOT the
    sequential greedy (a dropped row still witnesses): that makes the
    result independent of partitioning/visit order and expressible as
    one SQL self-join (suite.EMB_SEMDEDUP_SQL) for the oracle gate.

    Determinism: distances are exact int64 arithmetic over the same
    fixed-point quantization as the clustering (module contract above)
    — any engine reproduces kept bit-for-bit.

    Scale shape (100 TB posture): the Lloyd loop is the streaming
    kmeans above; one more pass emits (id, cluster, qvec) partitioned
    by cluster hash into the filesystem exchange; each bucket task
    segments its clusters and runs a CHUNKED int64 matmul per cluster
    (O(c²·dim) — at web scale k grows with the corpus precisely so c
    stays ~constant, the paper's regime; ``max_cluster_rows`` guards
    the quadratic block instead of degrading silently).
    """
    from guac_ray.stages.assemble import fs_exchange_reduce

    proj = ds.select_columns([id_col, vec_col])
    cents = _lloyd_centroids(proj, vec_col, id_col, k, iters, scale, offset)
    cref = ray.put(cents)

    def assign_q(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: t[id_col],
                "cluster": pa.array([], type=pa.int64()),
                "q": pa.array([], type=pa.list_(pa.int32())),
                "_bucket": pa.array([], type=pa.int64()),
            })
        c = ray.get(cref)
        q = quantize_embeddings(t, vec_col, scale, offset)
        a = _assign(q, c)
        # exchange payload is int32: quantized values are bounded by
        # ~2·scale (≪ 2³¹), so the shuffle moves half the bytes of the
        # original float payload; the prune upcasts to int64 to compute
        if q.size and (q.max() > 2**31 - 1 or q.min() < -(2**31)):
            raise ValueError(
                "semdedup: quantized embedding exceeds int32 — lower "
                "`scale` (or normalize the vectors) so the exchange "
                "payload stays 4-byte")
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(a),
            "q": pa.array(list(q.astype(np.int32)),
                          type=pa.list_(pa.int32())),
            "_bucket": pa.array(a % num_buckets),
        })

    def prune(t: pa.Table) -> pa.Table:
        t = t.sort_by([("cluster", "ascending"), (id_col, "ascending")])
        clus = t["cluster"].to_numpy(zero_copy_only=False)
        nrows = len(clus)
        qcol = t["q"]
        if isinstance(qcol, pa.ChunkedArray):
            qcol = qcol.combine_chunks()
        q = qcol.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64).reshape(nrows, -1)
        kept = np.ones(nrows, dtype=bool)
        bounds = np.flatnonzero(np.r_[True, clus[1:] != clus[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            c = e - s
            if c > max_cluster_rows:
                raise ValueError(
                    f"semdedup: cluster of {c} rows exceeds "
                    f"max_cluster_rows={max_cluster_rows}; raise k so "
                    f"clusters stay pairwise-tractable (the SemDeDup "
                    f"regime) or raise the guard")
            if c < 2:
                continue
            blk = q[s:e]
            n2 = (blk * blk).sum(axis=1)
            # chunk rows j so the (chunk × c) distance block bounds
            # memory; exact int64 throughout
            step = max(1, 4_194_304 // c)  # ≈4M-element distance blocks
            for js in range(1, c, step):
                je = min(js + step, c)
                cross = blk[js:je] @ blk[:je].T
                d2 = (n2[js:je, None] + n2[None, :je] - 2 * cross)
                lt = np.arange(je)[None, :] < np.arange(js, je)[:, None]
                kept[s + js:s + je] &= ~(
                    (d2 <= dist2_max) & lt).any(axis=1)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "cluster": t["cluster"].combine_chunks(),
            "kept": pa.array(kept.astype(np.int64)),
        })

    from guac_ray.exfs import default_exchange

    ex = exchange_base or default_exchange("semdedup")
    out = fs_exchange_reduce(
        proj.map_batches(assign_q, batch_format="pyarrow"), ex, prune,
        bucket_col="_bucket")
    if out is None:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "kept": pa.array([], pa.int64())}))
    return out
