"""Exact prefix-filtered Jaccard similarity join (functions/simjoin.py)
vs a brute-force local reference."""

import numpy as np
import pandas as pd
import pytest

from guac_ray.functions.simjoin import jaccard_similarity_join, shingle_strings


def _brute(df, threshold, n=5):
    sets = {r.doc_id: set(shingle_strings(r.text, n)) for r in df.itertuples()}
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = len(sets[a] & sets[b])
            u = len(sets[a]) + len(sets[b]) - c
            j = c / u if u else 1.0
            if j >= threshold:
                out.append((a, b, j))
    return set(out)


def _corpus(seed=17, n=120):
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    texts = [" ".join(rng.choice(words, 25)) for _ in range(n)]
    # plant near-dups: light edits of earlier docs
    for i in range(0, n, 10):
        base = texts[i].split()
        base[3] = "zulu"
        texts[min(i + 5, n - 1)] = " ".join(base)
    return pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                         "text": texts})


class TestShingles:
    def test_matches_sql_substr_semantics(self):
        assert shingle_strings("AB  cd\te", 5) == sorted({"ab cd", "b cd ", " cd e"})
        assert shingle_strings("ab", 5) == ["ab"]
        assert shingle_strings("", 5) == [""]


class TestJaccardSimilarityJoin:
    def test_matches_bruteforce(self, ray_session, tmp_path):
        import ray.data as rd

        df = _corpus()
        got = jaccard_similarity_join(
            rd.from_pandas(df).repartition(4), threshold=0.6,
            exchange_base=str(tmp_path / "sj"), num_buckets=4).to_pandas()
        want = _brute(df, 0.6)
        assert set(zip(got.da, got.db, got.j)) == want
        assert len(want) >= 10  # the planted near-dups actually exist

    def test_exchange_paths_match_broadcast(self, ray_session, tmp_path):
        """Force the huge-vocabulary hash-join df path AND the joined
        verify path; results must equal the fused broadcast plan."""
        import ray.data as rd

        df = _corpus(seed=23, n=60)
        got = jaccard_similarity_join(
            rd.from_pandas(df).repartition(3), threshold=0.55,
            exchange_base=str(tmp_path / "sj2"), num_buckets=4,
            broadcast_df_limit=0, broadcast_sets_limit=0).to_pandas()
        want = _brute(df, 0.55)
        assert set(zip(got.da, got.db, got.j)) == want

    def test_no_pairs_above_threshold(self, ray_session, tmp_path):
        import ray.data as rd

        df = pd.DataFrame({
            "doc_id": np.arange(4, dtype="int64"),
            "text": ["entirely different words here",
                     "quantum flux capacitor array",
                     "seventeen purple elephants dancing",
                     "mundane tuesday afternoon meeting"],
        })
        got = jaccard_similarity_join(
            rd.from_pandas(df), threshold=0.9,
            exchange_base=str(tmp_path / "sj3"), num_buckets=2).to_pandas()
        assert len(got) == 0


def test_empty_corpus(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                       "text": pd.Series([], dtype=str)})
    out = jaccard_similarity_join(
        rd.from_pandas(df), threshold=0.8,
        exchange_base=str(tmp_path / "sje"))
    # Dataset-level schema stays typed (Ray's to_pandas drops columns on
    # a fully-empty Dataset, so assert on the Dataset itself)
    assert out.count() == 0
    assert out.schema().names == ["da", "db", "j"]


class TestEdit1Join:
    def test_lev_le1_cases(self):
        from guac_ray.functions.simjoin import _lev_le1

        assert _lev_le1("abc", "abc")          # d = 0
        assert _lev_le1("abc", "abd")          # substitution
        assert _lev_le1("abc", "ab")           # deletion
        assert _lev_le1("abc", "xabc")         # insertion
        assert not _lev_le1("ab", "ba")        # transposition = 2 edits
        assert not _lev_le1("abc", "adc" "x")  # sub + insert
        assert not _lev_le1("abcd", "ab")      # length gap 2

    def test_matches_brute_force(self, ray_session):
        import itertools

        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.simjoin import _lev_le1, edit1_join

        names = ["node-001", "node-002", "node-01", "node-001",  # dup
                 "gateway", "gateway2", "gatway", "unrelated",
                 "ab", "ba", "a", ""]
        df = pd.DataFrame({"id": range(len(names)), "s": names})
        got = edit1_join(rd.from_pandas(df).repartition(3),
                         col="s", id_col="id").to_pandas()
        got_pairs = set(zip(got["a"], got["b"]))
        want = set()
        for (i, x), (j, y) in itertools.combinations(
                enumerate(names), 2):
            if _lev_le1(x, y):
                want.add((i, j))
        assert got_pairs == want
        # the transposition pair must NOT appear (candidate but d=2)
        assert (8, 9) not in got_pairs
        # the exact-dup pair carries d = 0
        d0 = got[(got["a"] == 0) & (got["b"] == 3)]["d"]
        assert d0.tolist() == [0]

    def test_long_string_guard(self, ray_session):
        import pandas as pd
        import ray.data as rd
        import pytest

        from guac_ray.functions.simjoin import edit1_join

        df = pd.DataFrame({"id": [1], "s": ["x" * 600]})
        with pytest.raises(Exception, match="max_len"):
            edit1_join(rd.from_pandas(df), col="s",
                       id_col="id").to_pandas()
