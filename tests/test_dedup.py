"""Near-dup family: MinHash-LSH, SimHash, exact-Jaccard verify, CC."""

import pandas as pd
import pytest

from guac_ray.functions.dedup import (
    connected_components,
    jaccard,
    ngram_set,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest where nobody can find it anymore at all"
)


def _docs():
    rows = [
        (0, BASE),
        (1, BASE.replace("quick", "swift")),            # near-dup of 0
        (2, BASE),                                       # exact dup of 0
        (3, "completely different text about ray data pipelines and arrow batches"),
        (4, "yet another unrelated document mentioning nothing in common whatsoever"),
        (5, BASE.replace("dog", "cat").replace("forest", "meadow")),  # near-dup
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


class TestPure:
    def test_ngram_jaccard_sanity(self):
        a, b = ngram_set(BASE), ngram_set(BASE.replace("quick", "swift"))
        assert jaccard(a, a) == 1.0
        assert 0.7 < jaccard(a, b) < 1.0
        assert jaccard(a, ngram_set("zzz")) < 0.05

    def test_connected_components(self):
        pairs = pd.DataFrame({"a": [1, 2, 10], "b": [2, 3, 11]})
        label = connected_components(pairs)
        assert label[1] == label[2] == label[3] == 1
        assert label[10] == label[11] == 10

    def test_simhash_vectorized_matches_reference_loop(self):
        import hashlib

        import numpy as np

        from guac_ray.functions.dedup import SimHasher

        def ref(text):  # the original per-token/per-bit loop
            tokens = (text or "").lower().split()
            if not tokens:
                return 0
            votes = np.zeros(64, dtype=np.int64)
            for tok in tokens:
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for bit in range(64):
                    votes[bit] += 1 if (h >> bit) & 1 else -1
            return sum(1 << b for b in range(64) if votes[b] > 0)

        sh = SimHasher()
        for t in [BASE, "", "one", "a a a b", BASE.replace("dog", "cat")]:
            assert sh.simhash(t) == ref(t)


class TestDistributedCC:
    def test_matches_pandas_cc_on_random_graph(self, ray_session, tmp_path):
        import numpy as np
        import ray.data as rd

        from guac_ray.functions.dedup import connected_components_ds

        rng = np.random.default_rng(11)
        pairs = pd.DataFrame({
            "a": rng.integers(0, 60, size=80).astype("int64"),
            "b": rng.integers(0, 60, size=80).astype("int64"),
        })
        pairs = pairs[pairs.a != pairs.b].reset_index(drop=True)
        want = connected_components(pairs)
        got = connected_components_ds(
            rd.from_pandas(pairs).repartition(3),
            exchange_dir=str(tmp_path / "cc"), num_buckets=4,
        ).to_pandas()
        got_map = dict(zip(got.doc_id, got.root))
        assert got_map == want

    def test_chain_converges(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.dedup import connected_components_ds

        # a 10-node path: min label must travel the full diameter
        pairs = pd.DataFrame({"a": list(range(9)), "b": list(range(1, 10))})
        got = connected_components_ds(
            rd.from_pandas(pairs), exchange_dir=str(tmp_path / "cc2"),
            num_buckets=2,
        ).to_pandas()
        assert set(got.root) == {0}
        assert len(got) == 10


class TestMinhash:
    def test_pipeline_finds_planted_dups(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.dedup import minhash_dedup, verify_pairs_exact

        ds = rd.from_pandas(_docs()).repartition(3)
        out = minhash_dedup(ds, num_perm=64, num_bands=16, threshold=0.6,
                            concurrency=(1, 2))
        pairs = set(map(tuple, out["pairs"][["a", "b"]].itertuples(index=False)))
        assert (0, 2) in pairs          # exact dup
        assert (0, 1) in pairs          # near dup
        assert not any({3, 4} & {a, b} for a, b in pairs)
        # survivor = min id per component → 1,2,5 dropped
        assert out["drop"] == {1, 2, 5}
        verified = verify_pairs_exact(ds, out["pairs"], threshold=0.6)
        assert verified.is_dup.all()

    def test_distributed_verify_path_matches_broadcast(self, ray_session, tmp_path):
        """Force the fs-exchange join verify (broadcast_row_limit=0) and
        check it yields the same verified pairs as the broadcast plan."""
        import ray.data as rd

        from guac_ray.functions.dedup import (
            MinHasher,
            lsh_candidate_pairs,
            minhash_bands,
            verify_pairs_sigs,
        )

        ds = rd.from_pandas(_docs()).repartition(3)
        sigs = ds.map_batches(
            MinHasher, fn_constructor_kwargs={"num_perm": 64, "shingle_n": 5},
            batch_format="pyarrow", concurrency=(1, 2),
        ).materialize()
        cands = lsh_candidate_pairs(minhash_bands(sigs, 16), sigs=None).materialize()
        bcast = verify_pairs_sigs(cands, sigs, 0.6).to_pandas()
        joined = verify_pairs_sigs(
            cands, sigs, 0.6, exchange_dir=str(tmp_path / "vx"),
            broadcast_row_limit=0,
        ).to_pandas()
        key = lambda df: sorted(map(tuple, df[["a", "b"]].itertuples(index=False)))
        assert key(bcast) == key(joined)
        assert (0, 2) in key(joined)

    def test_signature_deterministic_across_actors(self):
        from guac_ray.functions.dedup import MinHasher

        a, b = MinHasher(num_perm=32), MinHasher(num_perm=32)
        assert (a.signature(BASE) == b.signature(BASE)).all()


class TestSimhash:
    def test_finds_planted_dups(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.dedup import simhash_pairs

        ds = rd.from_pandas(_docs()).repartition(2)
        pairs = simhash_pairs(ds, max_hamming=6, concurrency=(1, 2)).to_pandas()
        got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
        assert (0, 2) in got
        assert (0, 1) in got
        # canonical orientation: never both (a,b) and (b,a)
        assert (pairs.a < pairs.b).all()
        assert not pairs.duplicated(["a", "b"]).any()

    def test_pair_set_matches_bruteforce(self, ray_session):
        """Pipeline pair set == brute-force 64-bit hamming pair set on a
        real-ish corpus (regression: unsorted groups once emitted the
        same pair in both orientations, inflating counts run to run)."""
        import numpy as np
        import ray.data as rd

        from guac_ray.functions.dedup import SimHasher, simhash_pairs

        df = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "text"])
        hs = SimHasher()._batch_simhash(df.text.tolist())
        ids = df.doc_id.to_numpy()
        x = hs[:, None] ^ hs[None, :]
        ham = np.zeros(x.shape, dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        iu = np.triu_indices(len(ids), k=1)
        keep = ham[iu] <= 3
        truth = {(int(min(a, b)), int(max(a, b)))
                 for a, b in zip(ids[iu[0][keep]], ids[iu[1][keep]])}

        got = simhash_pairs(rd.from_pandas(df).repartition(3),
                            max_hamming=3, concurrency=(1, 2)).to_pandas()
        gset = {(int(a), int(b)) for a, b in zip(got.a, got.b)}
        assert gset == truth
        assert len(got) == len(gset)


class TestBatchedSignatureIdentity:
    """r5: the across-doc batched MinHash/SimHash paths must be
    bit-identical to the per-doc reference implementations."""

    def test_minhash_matrix_matches_reference(self):
        import numpy as np
        import pyarrow as pa

        from guac_ray.functions.dedup import MinHasher

        mh = MinHasher(num_perm=32, shingle_n=5)
        texts = ["The quick  brown FOX jumps", "", None, "ab", "abcde",
                 "  spaced   out ", "repeat repeat repeat",
                 "unicode héllo wörld test", "a" * 500 + " tail"]
        mat = mh._signatures(pa.array(texts))
        for i, t in enumerate(texts):
            assert np.array_equal(mat[i], mh.signature(t or "")), (i, t)

    def test_minhash_blob_column(self):
        import pyarrow as pa

        from guac_ray.functions.dedup import MinHasher

        mh = MinHasher(num_perm=16, shingle_n=3)
        texts = ["alpha beta gamma", "x", ""]
        tbl = mh(pa.table({"doc_id": pa.array([5, 6, 7], pa.int64()),
                           "text": pa.array(texts)}))
        assert tbl.schema.field("sig").type == pa.binary()
        for blob, t in zip(tbl["sig"].to_pylist(), texts):
            assert blob == mh.signature(t).tobytes()

    def test_simhash_arrow_tokenize_matches_python_split(self):
        import pyarrow as pa

        from guac_ray.functions.dedup import SimHasher

        sh = SimHasher()
        texts = ["The quick  brown FOX", "", None, "  edge  spaces  ",
                 "a\xa0b nbsp", "one", "repeat repeat xyz"]
        got = sh._batch_simhash(pa.array(texts))
        # reference: per-doc python tokenization through the same vote
        import hashlib

        import numpy as np
        for g, t in zip(got, texts):
            toks = (t or "").lower().split()
            votes = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "big")
                for b in range(64):
                    votes[b] += 1 if (h >> b) & 1 else -1
            want = sum(1 << b for b in range(64) if votes[b] > 0)
            assert int(g) == want, t


class TestContractHardening:
    """Round-5 hardening: degenerate banding and stale pair lists fail
    loudly (or drop consistently) instead of silently corrupting."""

    def test_minhash_bands_rejects_excess_bands(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.dedup import MinHasher, minhash_bands

        docs = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2], "text": ["alpha beta gamma", "delta epsilon"]}))
        sigs = docs.map_batches(MinHasher, fn_constructor_kwargs={"num_perm": 16},
                                batch_format="pyarrow", concurrency=1)
        with pytest.raises(Exception, match="num_bands"):
            minhash_bands(sigs, num_bands=64).materialize()

    def test_verify_pairs_exact_missing_id_raises(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.dedup import verify_pairs_exact

        docs = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2], "text": ["same text here", "same text here"]}))
        stale = pd.DataFrame({"a": [1, 10], "b": [2, 11]})
        with pytest.raises(KeyError, match="absent"):
            verify_pairs_exact(docs, stale)

    def test_verify_pairs_sigs_drops_missing_ids_consistently(
            self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.dedup import MinHasher, verify_pairs_sigs

        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["the quick brown fox jumps over the lazy dog",
                     "the quick brown fox jumps over the lazy dog",
                     "a completely different document body"]}))
        sigs = docs.map_batches(MinHasher, batch_format="pyarrow",
                                concurrency=1).materialize()
        pairs = rd.from_pandas(pd.DataFrame(
            {"a": [1, 1, 98], "b": [2, 99, 99]}))  # two rows reference ghosts
        # broadcast plan: must DROP the ghost pairs (inner-join
        # semantics), not KeyError mid-actor
        bcast = verify_pairs_sigs(pairs, sigs, 0.5).to_pandas()
        assert bcast[["a", "b"]].values.tolist() == [[1, 2]]
        # join plan (force it with a zero broadcast limit): same answer
        joined = verify_pairs_sigs(
            pairs, sigs, 0.5, exchange_dir=str(tmp_path / "vx"),
            broadcast_row_limit=0).to_pandas()
        assert joined[["a", "b"]].values.tolist() == [[1, 2]]
