"""Deduplication family for training-data pipelines:

  - exact            content-hash → hash-partition → first-wins
  - MinHash + LSH    shingle → minhash sig → band → bucket groupby
  - SimHash          token-hash bit votes → chunk-banded buckets
  - n-gram Jaccard   exact verification of candidate pairs
  - embedding cosine near-dup (see ann.py for the shared projection)

Scale notes (100 TB posture):
  * every per-doc step is a ``map_batches`` stage; signatures are tiny
    (num_perm × 8 bytes) so the band explosion shuffles signatures, never
    text;
  * candidate pairs are verified from signatures; EXACT verification
    re-joins pairs to text through a hash-bucket join
    (``verify_pairs_exact`` — driver-side only under an explicit bound);
  * connected components use iterative min-label propagation over the
    pair list (bounded rounds), not a global union-find.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from guac_ray.stages.assemble import dedup_exact, stable_hash

__all__ = [
    "exact_dedup",
    "MinHasher",
    "minhash_bands",
    "lsh_candidate_pairs",
    "minhash_dedup",
    "SimHasher",
    "simhash_pairs",
    "ngram_set",
    "jaccard",
    "verify_pairs_exact",
    "connected_components",
]

_MERSENNE = (1 << 61) - 1


def _text_md5(texts: list[str]) -> list[str]:
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


def exact_dedup(docs: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Survivors of exact-content dedup: min(id) per md5(text).

    Two-phase: per-batch (hash, min id) partials, then a small
    ``groupby(hash).min`` — the shuffle carries one row per distinct
    content per batch, never the text itself.
    """

    from guac_ray.stages.groupagg import grouped_agg

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"h": _text_md5(batch[text_col].to_pylist()),
             id_col: batch[id_col].to_pylist()}
        )
        out = df.groupby("h", sort=False)[id_col].min().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    out = grouped_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["h"], {id_col: (id_col, "min")}, num_buckets=16,
    )
    return out.map_batches(
        lambda df: df.assign(**{id_col: df[id_col].astype("int64")}),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_FNV_PRIME = np.uint64(1099511628211)


def ngram_hashes(text: str, n: int = 5) -> np.ndarray:
    """Distinct character n-gram shingle hashes as uint64, fully
    vectorized: a polynomial rolling hash over the byte windows (uint64
    wraparound arithmetic — deterministic across processes/platforms).
    ~100× the throughput of per-shingle md5."""
    t = " ".join((text or "").lower().split()).encode("utf-8")
    if len(t) < n:
        t = t + b"\x00" * (n - len(t))
    b = np.frombuffer(t, dtype=np.uint8).astype(np.uint64)
    pw = _FNV_PRIME ** np.arange(n, dtype=np.uint64)        # wraps — fine
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(b, n)
    h = (w * pw[None, ::-1]).sum(axis=1, dtype=np.uint64)
    return np.unique(h) % _MERSENNE


def ngram_set(text: str, n: int = 5) -> set[int]:
    """Shingle set view of :func:`ngram_hashes` (exact-Jaccard path)."""
    return set(int(x) for x in ngram_hashes(text, n))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


class MinHasher:
    """Actor-pool stage: docs → (doc_id, sig:list<uint64>).

    Permutation coefficients are generated once per actor from a fixed
    seed (identical across actors → identical signatures).
    """

    def __init__(self, num_perm: int = 128, shingle_n: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        sh = ngram_hashes(text, self.shingle_n)
        # h_i(x) = (a_i * x + b_i) mod p, minimized over shingles — all numpy
        prod = (self.a[None, :] * sh[:, None] + self.b[None, :]) % _MERSENNE
        return prod.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        # signatures travel as fixed-size binary blobs — a list<uint64>
        # column would marshal num_perm python ints per row at every
        # arrow boundary
        sigs = [self.signature(t).tobytes() for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )


def minhash_bands(sigs: Dataset, num_bands: int = 32) -> Dataset:
    """(doc_id, sig) → exploded (band_id, band_hash, doc_id) rows —
    band_hash folds the band's slice to one uint64. Signatures do NOT
    ride along (they would multiply the banding shuffle by
    num_bands × sig_bytes); similarity verification happens after
    candidate dedup against the signature table."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        blobs = batch["sig"].to_pylist()
        rows_id, rows_band, rows_hash = [], [], []
        for i, blob in zip(ids, blobs):
            sig = np.frombuffer(blob, dtype=np.uint64)
            r = len(sig) // num_bands
            for b in range(num_bands):
                chunk = sig[b * r : (b + 1) * r]
                h = int.from_bytes(hashlib.md5(chunk.tobytes()).digest()[:8], "big")
                rows_id.append(i)
                rows_band.append(b)
                rows_hash.append(h)
        return pa.table(
            {
                "band_id": pa.array(rows_band, type=pa.int32()),
                "band_hash": pa.array(rows_hash, type=pa.uint64()),
                "doc_id": pa.array(rows_id, type=pa.int64()),
            }
        )

    return sigs.map_batches(explode, batch_format="pyarrow")


def lsh_candidate_pairs(
    bands: Dataset,
    threshold: float = 0.7,
    sigs: Dataset | None = None,
    max_bucket: int = 2000,
    num_coarse: int = 16,
) -> Dataset:
    """(band_id, band_hash) buckets → candidate pairs, then signature
    similarity ≥ threshold.

    The banding shuffle co-locates by a COARSE hash of
    (band_id, band_hash) (``num_coarse`` groups) and moves only
    (band, hash, id) triples; the per-(band,hash) fan-out happens in
    vectorized pandas inside each coarse group. Deduped candidate pairs
    are then verified against the broadcast signature table (signature
    volume = num_docs × num_perm×8 B; when that outgrows the object
    store, swap the broadcast for a hash_join of pairs ⋈ sigs — the
    candidate set is always far smaller than the band rows). Buckets
    larger than ``max_bucket`` are truncated (hot-bucket guard).
    """

    def coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cb"] = (
            stable_hash(df, ["band_id", "band_hash"]) % num_coarse
        ).astype("int64")
        return df

    def per_coarse(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby(["band_id", "band_hash"], sort=False):
            sub = sub.drop_duplicates("doc_id")
            if len(sub) < 2:
                continue
            sub = sub.nsmallest(max_bucket, "doc_id")
            ids = np.sort(sub["doc_id"].to_numpy())
            iu = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({"a": ids[iu[0]], "b": ids[iu[1]]}))
        if not outs:
            return pd.DataFrame({"a": [], "b": []}).astype(
                {"a": "int64", "b": "int64"}
            )
        return pd.concat(outs, ignore_index=True)

    pairs = (
        bands.map_batches(coarse, batch_format="pandas")
        .groupby("_cb")
        .map_groups(per_coarse, batch_format="pandas")
    )
    # same pair surfaces from several bands — exact dedup on (a, b)
    pairs = dedup_exact(pairs, ["a", "b"], num_buckets=8)
    if sigs is None:
        return pairs

    import ray

    sig_df = sigs.to_pandas()
    sref = ray.put(dict(zip(sig_df["doc_id"], sig_df["sig"])))

    class Verify:
        def __init__(self):
            self.sigs = ray.get(sref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"a": [], "b": [], "sim": []}).astype(
                    {"a": "int64", "b": "int64", "sim": "float64"})
            sa = np.stack([np.frombuffer(self.sigs[a], dtype=np.uint64) for a in df["a"]])
            sb = np.stack([np.frombuffer(self.sigs[b], dtype=np.uint64) for b in df["b"]])
            sim = (sa == sb).mean(axis=1)
            out = df.assign(sim=sim)
            return out[out.sim >= threshold]

    return pairs.map_batches(Verify, batch_format="pandas", concurrency=(1, 2))


def connected_components(pairs: pd.DataFrame, max_rounds: int = 20) -> dict[int, int]:
    """Min-label propagation over an edge list → {doc_id: cluster_min_id}.
    Pure pandas; at cluster scale the same loop runs as repeated
    groupby-min Dataset rounds (bounded by component diameter)."""
    label: dict[int, int] = {}
    for x in pd.unique(pairs[["a", "b"]].to_numpy().ravel()):
        label[int(x)] = int(x)
    for _ in range(max_rounds):
        changed = False
        for a, b in pairs[["a", "b"]].itertuples(index=False):
            ra, rb = label[int(a)], label[int(b)]
            m = min(ra, rb)
            if ra != m or rb != m:
                label[int(a)] = label[int(b)] = m
                changed = True
        if not changed:
            break
    # path-compress via repeated lookup
    for k in list(label):
        while label[k] != label[label[k]]:
            label[k] = label[label[k]]
    return label


def minhash_dedup(
    docs: Dataset,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_n: int = 5,
    threshold: float = 0.7,
    concurrency: int = 2,
) -> dict:
    """Full near-dup pipeline → {"pairs": DataFrame, "drop": set[int]}.

    Survivor = min doc_id per connected component. The pair set is
    materialized to the driver — bounded by the near-dup rate, and the
    documented contract for this operator (components are driver-small;
    the signatures/bands never are).
    """
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).materialize()  # consumed twice: banding + verification
    pairs = lsh_candidate_pairs(minhash_bands(sigs, num_bands), threshold, sigs=sigs).to_pandas()
    label = connected_components(pairs)
    drop = {d for d, root in label.items() if d != root}
    return {"pairs": pairs, "drop": drop}


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """docs → (doc_id, simhash:uint64). Token hashes vote per bit."""

    def __init__(self, bits: int = 64):
        self.bits = bits

    def simhash(self, text: str) -> int:
        tokens = (text or "").lower().split()
        if not tokens:
            return 0
        votes = np.zeros(self.bits, dtype=np.int64)
        for tok in tokens:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for bit in range(self.bits):
                votes[bit] += 1 if (h >> bit) & 1 else -1
        out = 0
        for bit in range(self.bits):
            if votes[bit] > 0:
                out |= 1 << bit
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = [self.simhash(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(hs, type=pa.uint64()),
            }
        )


def simhash_pairs(
    docs: Dataset, max_hamming: int = 3, concurrency: int = 2
) -> Dataset:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4
    16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical chunk), bucket
    on (chunk_id, chunk_value), verify hamming within buckets."""
    sigs = docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = batch["simhash"].to_pylist()
        rid, rchunk, rval, rh = [], [], [], []
        for i, h in zip(ids, hs):
            for c in range(4):
                rid.append(i)
                rchunk.append(c)
                rval.append((h >> (16 * c)) & 0xFFFF)
                rh.append(h)
        return pa.table(
            {
                "chunk_id": pa.array(rchunk, type=pa.int32()),
                "chunk_val": pa.array(rval, type=pa.int32()),
                "doc_id": pa.array(rid, type=pa.int64()),
                "simhash": pa.array(rh, type=pa.uint64()),
            }
        )

    def coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cb"] = (stable_hash(df, ["chunk_id", "chunk_val"]) % 8).astype("int64")
        return df

    def per_coarse(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby(["chunk_id", "chunk_val"], sort=False):
            sub = sub.drop_duplicates("doc_id")
            if len(sub) < 2:
                continue
            ids = sub["doc_id"].to_numpy()
            hs = sub["simhash"].to_numpy().astype(np.uint64)
            x = hs[:, None] ^ hs[None, :]
            ham = np.zeros_like(x, dtype=np.int64)
            for _ in range(64):
                ham += (x & 1).astype(np.int64)
                x >>= 1
            iu = np.triu_indices(len(ids), k=1)
            hv = ham[iu]
            keep = hv <= max_hamming
            if keep.any():
                outs.append(pd.DataFrame(
                    {"a": ids[iu[0][keep]], "b": ids[iu[1][keep]], "hamming": hv[keep]}
                ))
        if not outs:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
                {"a": "int64", "b": "int64", "hamming": "int64"}
            )
        return pd.concat(outs, ignore_index=True)

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .map_batches(coarse, batch_format="pandas")
        .groupby("_cb")
        .map_groups(per_coarse, batch_format="pandas")
    )
    return dedup_exact(pairs, ["a", "b"], num_buckets=8,
                       keep_cols=["a", "b", "hamming"])


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard verification
# ---------------------------------------------------------------------------

def verify_pairs_exact(
    docs: Dataset,
    pairs: pd.DataFrame,
    shingle_n: int = 5,
    threshold: float = 0.7,
    max_pairs: int = 100_000,
) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs. Pulls ONLY the candidate
    docs' texts (filtered at the read) — bounded by ``max_pairs``."""
    if len(pairs) > max_pairs:
        raise ValueError(f"pair set too large to verify exactly: {len(pairs)}")
    need = set(pairs["a"]) | set(pairs["b"])

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["doc_id"], value_set=pa.array(sorted(need))))

    texts = {
        r["doc_id"]: r["text"]
        for r in docs.map_batches(keep, batch_format="pyarrow").take_all()
    }
    sets = {d: ngram_set(texts.get(d, ""), shingle_n) for d in need}
    out = pairs.copy()
    out["jaccard"] = [
        jaccard(sets[a], sets[b]) for a, b in pairs[["a", "b"]].itertuples(index=False)
    ]
    out["is_dup"] = out["jaccard"] >= threshold
    return out
