"""BPE tokenizer training: the vectorized merge engine must be
bit-identical to the pure-Python Sennrich reference (greedy
left-to-right application, (count DESC, left ASC, right ASC)
tie-break), and the Dataset entry point must be deterministic under
any partitioning."""

import numpy as np
import pandas as pd
import pytest

from guac_ray.functions.bpe import (_merge_loop, bpe_merges_naive,
                                    bpe_train_merges)


def _engine(wc: dict, n: int, mpc: int = 2) -> list:
    df = _merge_loop(np.array(list(wc.keys())), np.array(list(wc.values())),
                     n, mpc)
    return list(df.itertuples(index=False, name=None))


class TestMergeLoopParity:
    def test_textbook_corpus(self):
        wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        assert _engine(wc, 10) == bpe_merges_naive(wc, 10)

    def test_overlapping_runs_and_ties(self):
        # aaaa exercises the greedy even-offset rule (the middle (a,a)
        # pair must NOT merge); ab/ba counts tie at several ranks so
        # the lexicographic tie-break is load-bearing
        wc = {"aaaa": 4, "aaa": 3, "ab": 7, "ba": 7, "abab": 2,
              "baba": 2}
        assert _engine(wc, 12) == bpe_merges_naive(wc, 12)

    def test_random_words_parity(self):
        rng = np.random.RandomState(7)
        words = ["".join(rng.choice(list("abcde"), size=rng.randint(1, 9)))
                 for _ in range(200)]
        wc = {}
        for w in words:
            wc[w] = wc.get(w, 0) + int(rng.randint(1, 6))
        assert _engine(wc, 30) == bpe_merges_naive(wc, 30)

    def test_early_stop_min_pair_count(self):
        # every pair unique → best count 1 < min_pair_count=2 → zero
        # merges from both engines
        wc = {"abc": 1, "def": 1}
        assert _engine(wc, 5) == [] == bpe_merges_naive(wc, 5)
        # with min_pair_count=1 merging proceeds and still agrees
        assert _engine(wc, 5, mpc=1) == bpe_merges_naive(
            wc, 5, min_pair_count=1)

    def test_exhaustion_stops_before_n(self):
        wc = {"aa": 3}
        got = _engine(wc, 50, mpc=1)
        assert got == bpe_merges_naive(wc, 50, min_pair_count=1)
        assert 0 < len(got) < 50  # word collapses to one symbol


class TestBpeDataset:
    def test_end_to_end_matches_naive_and_partitioning(
            self, ray_session):
        import ray.data as rd

        from collections import Counter

        from guac_ray.functions.text import sql_ws_tokens

        docs = pd.DataFrame({"text": [
            "the cat sat on the mat",
            "the cat ate the rat",
            "low lower lowest newest",
            None,
            "the the the cat",
        ]})
        wc = Counter()
        for t in docs.text:
            wc.update(sql_ws_tokens(t))
        want = bpe_merges_naive(dict(wc), 15)
        for parts in (1, 4):
            got = bpe_train_merges(
                rd.from_pandas(docs).repartition(parts), n_merges=15
            ).to_pandas()
            assert list(got.itertuples(index=False, name=None)) == want

    def test_max_words_cap_and_empty(self, ray_session):
        import ray.data as rd

        # cap=1 keeps only the most frequent word ("zz" x3) — merges
        # must then be exactly the naive run over that single word
        docs = pd.DataFrame({"text": ["zz zz zz qqq qqq xx"]})
        got = bpe_train_merges(rd.from_pandas(docs), n_merges=5,
                               max_words=1, min_pair_count=1).to_pandas()
        want = bpe_merges_naive({"zz": 3}, 5, min_pair_count=1)
        assert list(got.itertuples(index=False, name=None)) == want
        out = bpe_train_merges(
            rd.from_pandas(pd.DataFrame({"text": pd.Series([], dtype="object")})),
            n_merges=5)
        assert out.count() == 0
        assert set(["rank", "left", "right", "merged", "pair_count"]) \
            <= set(out.schema().names)


class TestBpeEncode:
    """Apply side: reference encode parity + memoized actor counting."""

    def test_encode_word_reference_semantics(self):
        from guac_ray.functions.bpe import bpe_encode_word, bpe_merges_naive

        wc = {"lower": 4, "low": 5, "newest": 6, "wider": 3, "aaaa": 2}
        merges = [(l, r) for _, l, r, _, _ in
                  bpe_merges_naive(wc, 10, min_pair_count=1)]
        ranks = {m: i for i, m in enumerate(merges)}
        for w in list(wc) + ["unseen", "aaa", "aaaaa"]:
            toks = bpe_encode_word(w, ranks)
            # lossless segmentation, end marker preserved
            assert "".join(toks) == w + "</w>"
            # re-encoding any produced token decomposes no further when
            # encoded in isolation is NOT required (context-free BPE),
            # but no adjacent pair in the output may still be mergeable:
            for a, b in zip(toks, toks[1:]):
                assert (a, b) not in ranks
        assert bpe_encode_word("low", ranks) != ["l", "o", "w", "</w>"]

    def test_token_counts_dataset(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from collections import Counter

        from guac_ray.functions.bpe import (bpe_encode_word,
                                            bpe_merges_naive,
                                            bpe_token_counts)
        from guac_ray.functions.text import sql_ws_tokens

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["the cat sat on the mat",
                     "lower and lower the newest cat",
                     None],
        })
        wc = Counter()
        for t in docs.text:
            wc.update(sql_ws_tokens(t))
        merges = [(l, r) for _, l, r, _, _ in
                  bpe_merges_naive(dict(wc), 12, min_pair_count=1)]
        ranks = {m: i for i, m in enumerate(merges)}
        want = {}
        for did, t in zip(docs.doc_id, docs.text):
            toks = sql_ws_tokens(t)
            want[did] = (len(toks), sum(
                len(bpe_encode_word(w, ranks)) for w in toks))
        got = bpe_token_counts(
            rd.from_pandas(docs).repartition(2), merges
        ).to_pandas().sort_values("doc_id")
        assert {r.doc_id: (r.n_words, r.n_bpe_tokens)
                for r in got.itertuples()} == want
