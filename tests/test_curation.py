"""End-to-end corpus curation (pipelines/curation.py): quality filter,
exact dedup, exact near-dup removal, split assignment."""

import numpy as np
import pandas as pd
import pytest


def _corpus():
    good = ("the quick brown fox jumps over the lazy dog near the quiet "
            "river bank every single morning before sunrise with friends")
    near = good + " ok"  # tiny suffix: Jaccard ≈ 0.97 → near-dup of `good`
    rows = [
        (0, good),                      # cluster min — kept
        (1, good),                      # exact dup of 0 — dropped
        (2, near),                      # near-dup of 0 — dropped
        (3, "1234 5678 !!! ???"),       # low alpha ratio — dropped
        (4, "too few words"),           # too few tokens — dropped
        (5, "completely different verbose sentence about distributed "
            "dataflow engines busily shuffling arrow record batches "
            "through filesystem exchanges forever and ever amen today"),  # kept (21 tokens)
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"})


class TestCurate:
    def test_stages_and_determinism(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.pipelines.curation import curate

        df = _corpus()
        out = curate(rd.from_pandas(df).repartition(2),
                     neardup_threshold=0.8, shingle_n=10,
                     exchange_base=str(tmp_path / "c1"),
                     num_buckets=2).to_pandas()
        assert sorted(out.doc_id) == [0, 5]
        # rerun → identical output (deterministic end to end)
        out2 = curate(rd.from_pandas(df).repartition(3),
                      neardup_threshold=0.8, shingle_n=10,
                      exchange_base=str(tmp_path / "c2"),
                      num_buckets=2).to_pandas()
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = out2.sort_values("doc_id").reset_index(drop=True)
        assert (a.values == b.values).all()
        assert set(out.split) <= {"train", "test"}

    def test_exchange_components_path_matches_driver_path(
            self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.pipelines.curation import curate

        df = _corpus()
        driver = curate(rd.from_pandas(df), shingle_n=10,
                        exchange_base=str(tmp_path / "d"),
                        num_buckets=2).to_pandas()
        exchange = curate(rd.from_pandas(df), shingle_n=10,
                          exchange_base=str(tmp_path / "e"),
                          num_buckets=2,
                          components_driver_limit=0).to_pandas()
        assert sorted(driver.doc_id) == sorted(exchange.doc_id)

    def test_no_neardups_all_kept(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.pipelines.curation import curate

        rng = np.random.default_rng(5)
        words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
                 "golf", "hotel", "india", "juliet", "kilo", "lima"]
        df = pd.DataFrame({
            "doc_id": np.arange(30, dtype="int64"),
            "text": [" ".join(rng.choice(words, 30, replace=True))
                     for _ in range(30)],
        })
        out = curate(rd.from_pandas(df), neardup_threshold=0.95,
                     exchange_base=str(tmp_path / "n"),
                     num_buckets=2).to_pandas()
        assert len(out) == 30


class TestDecontaminate:
    def _ref(self, train_texts, test_docs, n=3):
        def sh(t):
            w = (t or "").lower().split()
            return {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}

        pool = set()
        for t in train_texts:
            pool |= sh(t)
        out = {}
        for i, t in test_docs:
            s = sh(t)
            if s:
                out[i] = (len(s), len(s & pool))
        return out

    def test_matches_reference(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import decontaminate

        train_texts = [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "completely unrelated training material here",
        ]
        test_docs = [
            (1, "the quick brown fox went home"),          # partial overlap
            (2, "pack my box with five dozen liquor jugs"),  # full overlap
            (3, "no shared trigrams in this one at all"),  # clean
            (4, "too short"),                              # < 3 tokens: no row
            (5, "the the the quick brown fox the the"),    # repeated tokens
        ]
        train = rd.from_pandas(pd.DataFrame(
            {"doc_id": range(100, 103), "text": train_texts}))
        test = rd.from_pandas(pd.DataFrame(
            test_docs, columns=["doc_id", "text"]))
        got = decontaminate(train, test).to_pandas().set_index("doc_id")
        want = self._ref(train_texts, test_docs)
        assert set(got.index) == set(want)
        for i, (ns, nc) in want.items():
            assert (got.loc[i].n_shingles, got.loc[i].n_contaminated) == (ns, nc), i
        assert got.loc[3].n_contaminated == 0
        assert got.loc[2].n_contaminated == got.loc[2].n_shingles

    def test_empty_train_means_clean(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import decontaminate

        train = rd.from_pandas(pd.DataFrame({"doc_id": [], "text": []}, dtype=object))
        test = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1], "text": ["alpha beta gamma delta"]}))
        got = decontaminate(train, test).to_pandas()
        assert got.n_contaminated.tolist() == [0]
        assert got.n_shingles.tolist() == [2]


class TestDupPassages:
    def _ref(self, docs, L=3, min_count=2):
        """The obvious loop: global window counts, then per-doc
        interval-union coverage of flagged windows."""
        toks = {i: (t or "").lower().split() for i, t in docs}
        from collections import Counter

        cnt = Counter(" ".join(w[j:j + L])
                      for w in toks.values()
                      for j in range(len(w) - L + 1))
        out = {}
        for i, w in toks.items():
            starts = [j for j in range(len(w) - L + 1)
                      if cnt[" ".join(w[j:j + L])] >= min_count]
            if len(w) >= L:
                covered = set()
                for j in starts:
                    covered.update(range(j, j + L))
                out[i] = (len(w), len(covered))
        return out

    DOCS = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "prefix words alpha beta gamma delta other stuff"),  # shared 4-run
        (3, "totally unique content with no repeats anywhere"),
        (4, "loop loop loop loop loop loop"),     # within-doc repeats count
        (5, "hi there"),                          # < L tokens: no row
        (6, "alpha beta gamma delta epsilon zeta"),  # exact dup of doc 1
    ]

    def test_matches_reference(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import dup_passage_stats

        docs = rd.from_pandas(pd.DataFrame(
            self.DOCS, columns=["doc_id", "text"]))
        got = dup_passage_stats(docs, window=3).to_pandas().set_index(
            "doc_id")
        want = self._ref(self.DOCS, L=3)
        assert set(got.index) == set(want)
        for i, (nt, dt) in want.items():
            assert (got.loc[i].n_tokens, got.loc[i].dup_tokens) == (nt, dt), i
        # the rule's semantics, asserted explicitly:
        assert got.loc[4].dup_tokens == got.loc[4].n_tokens  # within-doc
        assert got.loc[1].dup_tokens == got.loc[1].n_tokens  # exact pair
        assert got.loc[3].dup_tokens == 0
        assert 5 not in got.index

    def test_layout_invariance(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import dup_passage_stats

        df = pd.DataFrame(self.DOCS, columns=["doc_id", "text"])
        a = dup_passage_stats(rd.from_pandas(df).repartition(1),
                              window=3).to_pandas()
        b = dup_passage_stats(rd.from_pandas(df).repartition(5),
                              window=3).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id").reset_index(drop=True),
            b.sort_values("doc_id").reset_index(drop=True))

    def test_all_short_docs_empty_output(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import dup_passage_stats

        docs = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2], "text": ["one two", "three"]}))
        got = dup_passage_stats(docs, window=5)
        assert got.count() == 0
        # typed empty shape survives (Ray's to_pandas drops columns on a
        # fully-empty Dataset, so assert on the Dataset schema)
        assert got.schema().names == ["doc_id", "n_tokens", "dup_tokens"]


class TestRemoveDupPassages:
    def test_removes_all_occurrences(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import remove_dup_passages

        docs = rd.from_pandas(pd.DataFrame(
            TestDupPassages.DOCS, columns=["doc_id", "text"])
        ).repartition(3)
        got = remove_dup_passages(docs, window=3).to_pandas().set_index(
            "doc_id")
        assert len(got) == 6  # EVERY doc comes back, incl. short ones
        # exact-dup pair: both fully removed (all-drop rule)
        assert got.loc[1].clean_text == "" and got.loc[6].clean_text == ""
        # partial overlap: shared 4-token run gone, unique flanks kept
        assert got.loc[2].clean_text == "prefix words other stuff"
        assert got.loc[2].n_removed == 4
        # within-doc repeats removed entirely
        assert got.loc[4].clean_text == "" and got.loc[4].n_removed == 6
        # clean + short docs intact (normalized token stream)
        assert got.loc[3].n_removed == 0
        assert got.loc[5].clean_text == "hi there"

    def test_consistent_with_stats(self, ray_session):
        """n_removed must equal dup_passage_stats' dup_tokens on every
        doc the stats op covers."""
        import ray.data as rd

        from guac_ray.pipelines.curation import (dup_passage_stats,
                                                 remove_dup_passages)

        df = pd.DataFrame(TestDupPassages.DOCS, columns=["doc_id", "text"])
        stats = dup_passage_stats(
            rd.from_pandas(df), window=3).to_pandas().set_index("doc_id")
        rem = remove_dup_passages(
            rd.from_pandas(df), window=3).to_pandas().set_index("doc_id")
        for i in stats.index:
            assert rem.loc[i].n_removed == stats.loc[i].dup_tokens, i

    def test_no_duplicates_is_identity(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import remove_dup_passages

        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["Each Document Totally unique words",
                     "another set of different tokens here"]}))
        got = remove_dup_passages(docs, window=3).to_pandas().set_index(
            "doc_id")
        assert got.loc[1].clean_text == "each document totally unique words"
        assert got.n_removed.sum() == 0


class TestDsirImportance:
    def _ref(self, target_texts, raw_docs, scale=1_000_000):
        """The contract as the obvious loop: Laplace-smoothed unigram
        LMs over the union vocab, per-side micro-nat quantization,
        int sum over token occurrences."""
        import math
        from collections import Counter

        ct, cr = Counter(), Counter()
        for t in target_texts:
            ct.update((t or "").lower().split())
        for _, t in raw_docs:
            cr.update((t or "").lower().split())
        union = set(ct) | set(cr)
        nt, nr = float(sum(ct.values()) + len(union)), \
            float(sum(cr.values()) + len(union))
        w = {t: (math.floor(scale * (math.log(nr)
                                     - math.log(cr.get(t, 0) + 1)) + 0.5)
                 - math.floor(scale * (math.log(nt)
                                       - math.log(ct.get(t, 0) + 1)) + 0.5))
             for t in union}
        out = {}
        for i, t in raw_docs:
            toks = (t or "").lower().split()
            if toks:
                out[i] = (len(toks), int(sum(w[tk] for tk in toks)))
        return out

    def test_matches_reference_and_ranks_target_like_docs(
            self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import dsir_importance

        target_texts = ["medical trial results for the new drug",
                        "clinical drug dosage and trial outcomes"]
        raw_docs = [
            (1, "drug trial outcomes in the clinical setting"),  # target-y
            (2, "cheap flights hotel deals book now"),           # spammy
            (3, "the results for the new schedule"),             # middling
            (4, ""),                                             # no tokens
        ]
        target = rd.from_pandas(pd.DataFrame(
            {"doc_id": [100, 101], "text": target_texts}))
        raw = rd.from_pandas(pd.DataFrame(
            raw_docs, columns=["doc_id", "text"]))
        got = dsir_importance(target, raw).to_pandas().set_index("doc_id")
        want = self._ref(target_texts, raw_docs)
        assert set(got.index) == set(want)
        for i, (nt, lw) in want.items():
            assert (got.loc[i].n_tokens, got.loc[i].logw_micronats) \
                == (nt, lw), i
        # the semantics: the target-like doc outranks the spam
        per_tok = {i: got.loc[i].logw_micronats / got.loc[i].n_tokens
                   for i in (1, 2)}
        assert per_tok[1] > per_tok[2]
        assert 4 not in got.index


class TestSourceMixture:
    def test_weight_semantics(self, ray_session):
        import numpy as np
        import ray.data as rd

        from guac_ray.pipelines.curation import md5_first_byte, source_mixture

        n = 256
        df = pd.DataFrame({
            "doc_id": range(4 * n),
            "source": ["a"] * n + ["b"] * n + ["c"] * n + ["d"] * n,
        })
        out = source_mixture(
            rd.from_pandas(df).repartition(5),
            {"a": 2.0, "b": 0.5, "c": 0.0}, default=1.0,
        ).to_pandas()
        by_src = out.groupby("source").size()
        assert by_src.get("a", 0) == 2 * n          # exactly 2 copies each
        assert by_src.get("c", 0) == 0              # dropped
        assert by_src.get("d", 0) == n              # default 1.0
        # b: kept iff md5 byte < 128 — exact count from the same rule
        ids_b = df[df.source == "b"]["doc_id"].to_numpy()
        want_b = int((md5_first_byte(ids_b) < 128).sum())
        assert by_src.get("b", 0) == want_b
        assert 0 < want_b < n
        # copy indices are 0..k-1 per doc
        a0 = out[(out.source == "a")].groupby("doc_id")["copy"].agg(list)
        assert all(sorted(v) == [0, 1] for v in a0)

    def test_batch_layout_invariance(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import source_mixture

        df = pd.DataFrame({"doc_id": range(300),
                           "source": ["x", "y", "z"] * 100})
        w = {"x": 1.5, "y": 0.25}
        a = source_mixture(rd.from_pandas(df).repartition(1), w).to_pandas()
        b = source_mixture(rd.from_pandas(df).repartition(7), w).to_pandas()
        key = ["doc_id", "source", "copy"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))


class TestNgramNovelty:
    def test_duplicate_scores_zero_and_orderfree_owner(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import ngram_novelty

        base = "a b c d e f g h"          # 4 distinct 5-gram shingles
        df = pd.DataFrame({
            "doc_id": [10, 20, 30],
            "text": [base,                  # owner of all its shingles
                     base,                  # exact dup -> novelty 0
                     base + " x y z"],      # adds 3 novel windows
        })
        out = ngram_novelty(rd.from_pandas(df).repartition(3), ngram=5
                            ).to_pandas().set_index("doc_id")
        assert out.loc[10, "novelty_fp"] == 1_000_000
        assert out.loc[20, "novelty_fp"] == 0
        # doc 30: 7 windows, 3 novel ('d e f g x' ... 'f g x y z'
        # overlap the added tail)
        assert out.loc[30, "n_shingles"] == 7
        assert out.loc[30, "n_novel"] == 3
        assert out.loc[30, "novelty_fp"] == 1_000_000 * 3 // 7

    def test_within_doc_repeat_counts_once(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import ngram_novelty

        # the same shingle twice in ONE doc: distinct-per-doc -> one row
        df = pd.DataFrame({"doc_id": [1],
                           "text": ["p q r s t p q r s t"]})
        out = ngram_novelty(rd.from_pandas(df), ngram=5).to_pandas()
        # windows: 6 total, distinct = 5 ('p q r s t' repeats)
        assert out.n_shingles.tolist() == [5]
        assert out.novelty_fp.tolist() == [1_000_000]

    def test_short_docs_drop_typed(self, ray_session):
        import ray.data as rd

        from guac_ray.pipelines.curation import ngram_novelty

        import pyarrow as pa

        df = pd.DataFrame({"doc_id": [1, 2], "text": ["too short", ""]})
        out = ngram_novelty(rd.from_pandas(df), ngram=5)
        tbl = out if isinstance(out, pa.Table) else out.to_pandas()
        assert len(tbl) == 0
