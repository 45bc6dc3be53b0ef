"""Text analysis operators: tokens, quality, lang-id, fingerprints."""

import pyarrow as pa
import pandas as pd

from guac_ray.functions.text import (
    Fingerprinter,
    LangId,
    QualityScorer,
    TokenCounter,
)


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


class TestTokens:
    def test_counts(self):
        out = TokenCounter()(_batch(["a b c", "", "x_1 y-2", "中文 words here"]))
        assert out["n_tokens"].to_pylist() == [3, 0, 3, 2]


class TestQuality:
    def test_fields(self):
        out = QualityScorer()(_batch(["abc 123!", ""]))
        d = out.to_pandas().iloc[0]
        assert d.n_chars == 8 and d.n_tokens == 2
        assert abs(d.alpha_ratio - 3 / 8) < 1e-9


class TestLangId:
    def test_crafted_languages(self):
        texts = [
            "the cat and the dog sat in the house that was for sale",
            "der hund und die katze sind nicht mit dem mann von hier",
            "le chat et le chien sont dans la maison pour un moment",
            "el perro y el gato en la casa que es de un hombre",
            "",
        ]
        out = LangId()(_batch(texts)).to_pandas()
        assert out.lang_pred.tolist() == ["en", "de", "fr", "es", "und"]


class TestFingerprint:
    def test_whitespace_and_case_invariant(self):
        fp = Fingerprinter()
        out = fp(_batch(["Hello   World", "hello world", " hello\tworld "]))
        vals = out["fingerprint"].to_pylist()
        assert vals[0] == vals[1] == vals[2]

    def test_distinct_content_distinct_fp(self):
        fp = Fingerprinter()
        out = fp(_batch(["abc", "abd"]))
        a, b = out["fingerprint"].to_pylist()
        assert a != b


class TestUtf8Stats:
    """The zero-copy byte scanner must match the regex definitions
    exactly — including unicode, empties, nulls, chunk slices, and
    token runs touching string boundaries."""

    def _reference(self, texts):
        import re

        tok = re.compile(r"[A-Za-z0-9_]+")
        alpha = re.compile(r"[^A-Za-z]")
        ntok = [len(tok.findall(t or "")) for t in texts]
        nalpha = [len(alpha.sub("", t or "")) for t in texts]
        nchars = [len(t or "") for t in texts]
        return ntok, nalpha, nchars

    def _check(self, texts, col):
        from guac_ray.functions.text import utf8_stats

        got = utf8_stats(col)
        want = self._reference(texts)
        for g, w in zip(got, want):
            assert g.tolist() == w

    def test_handwritten_edges(self):
        import pyarrow as pa

        texts = ["", None, "a", "_", "  ", "ab cd_ef", "tok", "a b",
                 "héllo wörld", "日本語 text", "x" * 5000, "1+2=3",
                 "ends_with_word", "word starts", "\n\t ok\n", "émoji 🎉 mix",
                 "UPPER lower 123_456", "...", "_ _ _"]
        self._check(texts, pa.chunked_array([pa.array(texts[:7], type=pa.string()),
                                             pa.array(texts[7:], type=pa.string())]))
        self._check(texts, pa.array(texts, type=pa.large_string()))
        # sliced chunk (nonzero array offset into shared buffers)
        arr = pa.array(texts)
        self._check(texts[3:15], arr.slice(3, 12))

    def test_boundary_runs_and_random(self):
        import random

        import pyarrow as pa

        rng = random.Random(7)
        alphabet = "ab_ 9.éß日🎉\t-"
        texts = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
                 for _ in range(500)]
        # adjacent word-final / word-initial strings (run across boundary)
        texts += ["abc", "def", "ab ", " cd", "xy", "", "z"]
        self._check(texts, pa.array(texts))

    def test_quality_scorer_matches_old_loop(self, ray_session):
        import pyarrow as pa

        from guac_ray.functions.text import QualityScorer

        texts = ["The quick brown fox", "", "1234 5678", "mixed é chars here",
                 "a" * 300]
        batch = pa.table({"doc_id": pa.array(range(len(texts))),
                          "text": pa.array(texts)})
        out = QualityScorer()(batch).to_pydict()
        want = self._reference(texts)
        assert out["n_tokens"] == want[0]
        assert out["n_chars"] == want[2]
        assert out["alpha_ratio"] == [
            round(a / c, 4) if c else 0.0 for a, c in zip(want[1], want[2])]


class TestBm25:
    def test_matches_naive_and_ranks_sensibly(self, ray_session):
        """The fixed-point contract written as the obvious loop, plus
        the semantic check: the doc where the query terms are dense
        outranks the doc where they are diluted."""
        import math
        from collections import Counter

        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.text import bm25_topk, sql_ws_tokens

        texts = [
            "hash join hash join probe",                      # dense
            "hash join appears once in a long long long long "
            "long long long long long document body here",    # diluted
            "no relevant terms at all whatsoever",
            "join",                                           # short hit
            "",                                               # empty
        ]
        docs = rd.from_pandas(pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts})).repartition(2)
        queries = {7: ["hash", "join"]}
        got = bm25_topk(docs, queries, k=3).to_pandas()

        toks = [sql_ws_tokens(t) for t in texts]
        dls = [len(t) for t in toks if t]
        N, total = len(dls), sum(dls)
        dfs = {q: sum(1 for t in toks if q in t) for q in ("hash", "join")}
        idf = {q: math.floor(1e6 * math.log(
            (2 * (N - d) + 1) / (2 * d + 1) + 1.0) + 0.5)
            for q, d in dfs.items()}
        scores = {}
        for i, tk in enumerate(toks):
            c = Counter(tk)
            dl = len(tk)
            if not dl:
                continue
            kd = (1200 * (250 + (750 * dl * N) // total)) // 1000
            s = sum((idf[q] * c[q] * 2200) // (c[q] * 1000 + kd)
                    for q in ("hash", "join") if c[q])
            if s > 0:
                scores[i] = s
        want = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:3]
        assert list(zip(got["doc_id"], got["score_fp"])) == want
        assert got["rank"].tolist() == [1, 2, 3]
        # dense doc beats the diluted one
        r = dict(zip(got["doc_id"], got["rank"]))
        assert r[0] < r[1]

    def test_unknown_terms_and_empty_corpus(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.text import bm25_topk

        docs = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1], "text": ["alpha beta"]}))
        out = bm25_topk(docs, {1: ["zzz_notthere"]}, k=5).to_pandas()
        assert len(out) == 0
        empty = rd.from_pandas(pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "text": pd.Series(dtype="object")}))
        out2 = bm25_topk(empty, {1: ["alpha"]}, k=5).to_pandas()
        assert len(out2) == 0


class TestTfidf:
    def _reference(self, docs):
        """Plain-Python tf-idf reference: score = tf*1e6 // df, top-3 by
        (score desc, term asc)."""
        from collections import Counter

        tfs = {i: Counter((t or "").lower().split()) for i, t in docs}
        df = Counter()
        for c in tfs.values():
            df.update(c.keys())
        rows = []
        for i, c in tfs.items():
            scored = sorted(
                ((-(tf * 1_000_000 // df[w]), w, tf) for w, tf in c.items()))
            for s, w, tf in scored[:3]:
                rows.append((i, w, tf, df[w], -s))
        return sorted(rows)

    def test_matches_reference(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.text import tfidf_top_terms

        docs = [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "cats and dogs and cats"),
            (4, "  The THE the  unique-token  "),
            (5, ""),
            (6, "solo"),
        ]
        ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = tfidf_top_terms(ds.repartition(3)).to_pandas()
        got_rows = sorted(map(tuple, got.to_numpy()))
        assert got_rows == self._reference(docs)
        # empty doc contributes no rows; rare terms outrank common ones
        assert 5 not in set(got.doc_id)
        top_of_1 = got[got.doc_id == 1].sort_values("score_fp", ascending=False)
        assert top_of_1.iloc[0].term in ("cat", "mat")  # df=1 terms beat 'the'

    def test_vocab_cap(self, ray_session):
        import pytest
        import ray.data as rd

        from guac_ray.functions.text import tfidf_top_terms

        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1], "text": ["a b c d e f"]}))
        with pytest.raises(ValueError):
            tfidf_top_terms(ds, vocab_cap=3).to_pandas()


class TestUtf8StatsEdges:
    """Regression: the reduceat-clamp formulation stole the final byte
    of the last non-empty string whenever a chunk ENDED with empty/null
    strings — batch-layout-dependent corruption of the hot-path stats."""

    def _ref(self, texts):
        import re

        nt = [len(re.findall(r"[A-Za-z0-9_]+", s or "")) for s in texts]
        na = [len(re.sub(r"[^A-Za-z]", "", s or "")) for s in texts]
        nc = [len(s or "") for s in texts]
        return nt, na, nc

    def test_trailing_empty_and_null(self):
        from guac_ray.functions.text import utf8_stats

        for texts in (["a b", ""], ["hello", None], ["café", ""],
                      ["", "", ""], ["a b", "", "c", None, "", "x_y z9"],
                      [""], [None], []):
            got = utf8_stats(pa.array(texts, type=pa.string()))
            for g, w in zip(got, self._ref(texts)):
                assert list(g) == list(w), texts

    def test_chunk_layout_invariance(self):
        import random

        from guac_ray.functions.text import utf8_stats

        random.seed(3)
        texts = [random.choice(
            ["a b", "", "hello world_9", None, "café ü", "x"])
            for _ in range(400)]
        whole = utf8_stats(pa.array(texts, type=pa.string()))
        ch = pa.chunked_array(
            [pa.array(texts[i:i + 23], type=pa.string())
             for i in range(0, 400, 23)])
        for g, w in zip(utf8_stats(ch), whole):
            assert list(g) == list(w)


class TestScrubPii:
    """scrub_pii (functions/text.py): RE2 parity with DuckDB's
    regexp_replace — the oracle contract — plus redaction semantics."""

    TEXTS = [
        "mail me at john.doe+x@example.co.uk or https://ex.com/a?b=c now",
        "server at 10.0.255.1 port 80, call +1 (555) 123-4567 or "
        "555-123-4567",
        "no pii here", "", None,
        "a@b.io x 1.2.3.4 http://t.co",
        "edge 999.999.999.999 and @not.an.email",
        "tel: 0049 171 1234567, ip=192.168.0.1.",
        "url with email https://a.b/c?mail=x@y.zz trailing",
    ]

    def _run(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.text import scrub_pii

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(self.TEXTS)), type=pa.int64()),
            "text": pa.array(self.TEXTS, type=pa.string()),
        }))
        return scrub_pii(ds).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)

    def test_duckdb_parity(self, ray_session):
        import duckdb

        from guac_ray.functions.text import PII_PATTERNS

        got = self._run(ray_session)
        con = duckdb.connect()
        red = "coalesce(t,'')"
        for cat, pat in PII_PATTERNS.items():
            esc = pat.replace("'", "''")
            red = f"regexp_replace({red}, '{esc}', '[{cat.upper()}]', 'g')"
        counts = ", ".join(
            f"len(regexp_extract_all(coalesce(t,''), '{p}')) AS n_{c}"
            for c, p in PII_PATTERNS.items())
        want = con.execute(
            f"SELECT {red} AS text, {counts} FROM (SELECT unnest(?) AS t)",
            [list(self.TEXTS)]).df()
        assert got["text"].tolist() == want["text"].tolist()
        for c in PII_PATTERNS:
            assert got[f"n_{c}"].tolist() == want[f"n_{c}"].tolist(), c

    def test_redaction_semantics(self, ray_session):
        got = self._run(ray_session)
        # row 0: email + url both redacted
        assert "[EMAIL]" in got.loc[0, "text"]
        assert "[URL]" in got.loc[0, "text"]
        assert "john.doe" not in got.loc[0, "text"]
        # row 1: ip + two phones
        assert got.loc[1, "n_ipv4"] == 1
        assert got.loc[1, "n_phone"] == 2
        # clean row untouched
        assert got.loc[2, "text"] == "no pii here"
        assert got.loc[2, ["n_url", "n_email", "n_ipv4", "n_phone"]].sum() == 0
        # null → empty
        assert got.loc[4, "text"] == ""
        # URL containing an email: email redacted as part of the URL
        # (sequential order), but counted independently on the raw text
        assert got.loc[8, "text"].count("[URL]") == 1
        assert "x@y.zz" not in got.loc[8, "text"]
        assert got.loc[8, "n_email"] == 1


class TestRepetitionScorer:
    def test_signals_and_sql_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        from guac_ray.functions.text import repetition_scores

        texts = [
            "a b a b a",            # max bigram 'a b' x2 (tie with 'b a')
            "x",                    # no bigrams
            "",                     # empty
            "one  two one two",     # double space collapses
            "A\xa0B a b",      # NBSP/LS are NOT RE2 whitespace:
                                    # one token 'a\xa0b a b'? no —
                                    # plain space splits: 2 tokens
            "t t t t t t",          # pathological repetition
        ]
        ds = rd.from_arrow(__import__("pyarrow").table({
            "doc_id": list(range(len(texts))), "text": texts}))
        got = repetition_scores(ds).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)

        con = duckdb.connect()
        want = con.execute(r"""
WITH d AS (SELECT unnest(range(len(?::VARCHAR[]))) AS doc_id,
                  unnest(?::VARCHAR[]) AS text),
w AS (SELECT doc_id, list_filter(
        regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS w
      FROM d),
base AS (
  SELECT doc_id, len(w) AS n_tokens,
         len(list_distinct(w)) AS n_distinct_tokens,
         CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END AS n_bigrams,
         list_transform(range(greatest(len(w) - 1, 0)),
                        i -> w[i+1] || ' ' || w[i+2]) AS bg
  FROM w),
bgc AS (SELECT doc_id, b, count(*) AS n
        FROM (SELECT doc_id, unnest(bg) AS b FROM base) GROUP BY doc_id, b),
top AS (SELECT doc_id, n AS max_bigram_n, b AS top_bigram FROM bgc
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n DESC, b) = 1)
SELECT base.doc_id, n_tokens, n_distinct_tokens, n_bigrams,
       coalesce(top.max_bigram_n, 0) AS max_bigram_n,
       coalesce(top.top_bigram, '') AS top_bigram
FROM base LEFT JOIN top USING (doc_id) ORDER BY doc_id
""", [texts, texts]).df()
        for c in ("n_tokens", "n_distinct_tokens", "n_bigrams",
                  "max_bigram_n", "top_bigram"):
            assert got[c].tolist() == want[c].tolist(), c

        # spot-check semantics
        assert got.loc[0, "max_bigram_n"] == 2
        assert got.loc[0, "top_bigram"] == "a b"   # lexicographic tie-break
        assert got.loc[1].tolist()[1:] == [1, 1, 0, 0, ""]
        assert got.loc[2].tolist()[1:] == [0, 0, 0, 0, ""]
        assert got.loc[5, "n_distinct_tokens"] == 1
        assert got.loc[5, "max_bigram_n"] == 5
        # NBSP row: 2 tokens under the RE2 grammar (str.split() would
        # produce 4 — the sql_ws_tokens contract is what keeps parity)
        assert got.loc[4, "n_tokens"] == 2


class TestUnigramSurprisal:
    DOCS = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs and cats"),
        (4, "  The THE the  unique-token  "),
        (5, ""),            # zero tokens -> dropped
        (6, "solo"),
        (7, "café naïve café"),  # multibyte
    ]

    def test_matches_duckdb(self, ray_session):
        """Bit parity with the SQL oracle expression on a corpus with
        repeats, case folding, multibyte tokens and an empty doc."""
        import duckdb
        import ray.data as rd

        from guac_ray.functions.text import unigram_surprisal

        docs = pd.DataFrame(self.DOCS, columns=["doc_id", "text"])
        got = unigram_surprisal(
            rd.from_pandas(docs).repartition(3)).to_pandas()
        want = duckdb.sql(r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\s+')) AS term
              FROM docs
            ), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
            vocab AS (
              SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok2 GROUP BY 1
            ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab),
            q AS (
              SELECT term,
                     CAST(floor(1000000.0 * (ln(CAST(n AS DOUBLE)) -
                                             ln(CAST(c AS DOUBLE))) + 0.5)
                          AS BIGINT) AS q
              FROM vocab, tot)
            SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(q.q) AS BIGINT) AS surprisal_micronats,
                   CAST(sum(q.q) // count(*) AS BIGINT) AS mean_surprisal
            FROM tok2 t JOIN q USING (term) GROUP BY 1 ORDER BY 1
        """).df()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert 5 not in set(got.doc_id)  # empty doc dropped like SQL

    def test_rare_scores_higher(self, ray_session):
        """A rare-token doc must out-surprise a common-token doc of the
        same length (the property curation filters rely on)."""
        import ray.data as rd

        from guac_ray.functions.text import unigram_surprisal

        docs = pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["common common common common",
                      "common common common common",
                      "rare1 rare2 rare3 rare4"]})
        out = unigram_surprisal(rd.from_pandas(docs)).to_pandas()
        out = out.set_index("doc_id")
        assert out.loc[3, "mean_surprisal"] > out.loc[1, "mean_surprisal"]
        assert out.loc[1, "surprisal_micronats"] == out.loc[2, "surprisal_micronats"]

    def test_vocab_cap_and_empty(self, ray_session):
        import pytest
        import ray.data as rd

        from guac_ray.functions.text import unigram_surprisal

        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1], "text": ["a b c d e f"]}))
        with pytest.raises(ValueError):
            unigram_surprisal(ds, vocab_cap=3)
        empty = unigram_surprisal(rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["", "   "]})))
        # typed empty DATASET — same contract as the non-empty path
        assert empty.count() == 0
        assert empty.schema().names == [
            "doc_id", "n_tokens", "surprisal_micronats", "mean_surprisal"]


class TestDocTokenEntropy:
    def test_matches_duckdb_and_properties(self, ray_session):
        import duckdb
        import math
        import ray.data as rd

        from guac_ray.functions.text import doc_token_entropy

        docs = pd.DataFrame(
            {"doc_id": [1, 2, 3, 4, 5],
             "text": ["same same same same",          # repetitive -> 0
                      "all four tokens differ",        # ln(4)*1e6
                      "café naïve café  NAÏVE",        # multibyte + case fold
                      "",                               # dropped
                      "x"]})
        got = doc_token_entropy(
            rd.from_pandas(docs).repartition(2)).to_pandas()
        want = duckdb.sql(r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\s+')) AS term
              FROM docs
            ), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
            c AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
                  FROM tok2 GROUP BY 1, 2),
            t AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                         CAST(count(*) AS BIGINT) AS n_distinct
                  FROM c GROUP BY 1)
            SELECT c.doc_id, t.n AS n_tokens, t.n_distinct,
                   CAST(sum(c.c * CAST(floor(1000000.0 *
                        (ln(CAST(t.n AS DOUBLE)) - ln(CAST(c.c AS DOUBLE)))
                        + 0.5) AS BIGINT)) // t.n AS BIGINT)
                       AS entropy_micronats
            FROM c JOIN t USING (doc_id) GROUP BY 1, t.n, t.n_distinct
        """).df()
        g = got.sort_values("doc_id").reset_index(drop=True)
        w = want.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)
        g = g.set_index("doc_id")
        assert g.loc[1, "entropy_micronats"] == 0          # pure repetition
        assert abs(g.loc[2, "entropy_micronats"]
                   - round(math.log(4) * 1e6)) <= 1        # uniform 4
        assert 4 not in g.index                            # empty dropped
        assert g.loc[5, "entropy_micronats"] == 0          # single token


class TestWsShingles:
    """Vectorized shingler parity with the sql_ws_tokens loop grammar."""

    def test_parity_with_token_loop(self):
        import numpy as np
        import pyarrow as pa

        from guac_ray.functions.text import sql_ws_tokens, ws_shingles

        texts = ["the quick brown fox", "  a  b ", "", None, "one two",
                 "x y z x y z", "Hé LLO wörld Hé LLO", "a\vb c d"]
        for ngram in (1, 2, 3, 5):
            ridx, sh = ws_shingles(pa.array(texts), ngram)
            got: dict[int, list] = {}
            for r, s in zip(ridx.tolist(), sh.to_pylist()):
                got.setdefault(r, []).append(s)
            for i, t in enumerate(texts):
                w = sql_ws_tokens(t)
                want = [" ".join(w[j:j + ngram])
                        for j in range(len(w) - ngram + 1)]
                assert got.get(i, []) == want, (ngram, i)

    def test_all_short_batch(self):
        import pyarrow as pa

        from guac_ray.functions.text import ws_shingles

        ridx, sh = ws_shingles(pa.array([None, "", "one two"]), 3)
        assert len(sh) == 0 and len(ridx) == 0
        assert sh.type == pa.string()


class TestPmiBigrams:
    def test_matches_naive_reference(self, ray_session):
        """Parity with a direct Counter-based PMI computation (same
        quantization expression) on a mixed fixture, across a 3-block
        partitioning."""
        import math
        from collections import Counter

        import ray.data as rd

        from guac_ray.functions.text import pmi_bigrams, sql_ws_tokens

        texts = [
            "strong coffee strong coffee strong coffee strong coffee",
            "strong tea weak tea strong coffee weak coffee",
            "new york new york new york stock exchange",
            "the the the the the the the the",
            "  spaced   out  tokens ",
            "",
        ] * 3
        got = pmi_bigrams(
            rd.from_pandas(pd.DataFrame({"text": texts})).repartition(3),
            min_count=3, top_k=10)

        uni: Counter = Counter()
        big: Counter = Counter()
        for txt in texts:
            w = sql_ws_tokens(txt)
            uni.update(w)
            big.update(zip(w, w[1:]))
        n = sum(uni.values())
        rows = []
        for (w1, w2), cxy in big.items():
            if cxy < 3:
                continue
            pmi = math.floor(1_000_000 * (
                math.log(float(cxy)) + math.log(float(n))
                - math.log(float(uni[w1])) - math.log(float(uni[w2]))) + 0.5)
            rows.append((f"{w1} {w2}", cxy, pmi))
        want = pd.DataFrame(rows, columns=["bigram", "cnt", "pmi_fp"])
        want = (want.sort_values(["pmi_fp", "bigram"],
                                 ascending=[False, True])
                .head(10).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_collocation_beats_frequent_pair(self, ray_session):
        """PMI must rank an exclusive pair above a merely frequent pair
        of promiscuous words — the property that distinguishes it from
        raw bigram counts (doc_top_bigrams)."""
        import ray.data as rd

        from guac_ray.functions.text import pmi_bigrams

        texts = (
            # 'hong kong': exclusive collocation, 5 occurrences
            ["hong kong"] * 5
            # 'the cat' is frequent (8x) but both words roam widely
            + ["the cat"] * 8
            + ["the dog", "the fish", "a cat", "my cat"] * 6
        )
        out = pmi_bigrams(rd.from_pandas(pd.DataFrame({"text": texts})),
                          min_count=5, top_k=10).set_index("bigram")
        assert out.loc["hong kong", "pmi_fp"] > out.loc["the cat", "pmi_fp"]

    def test_min_count_and_empty(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.text import pmi_bigrams

        out = pmi_bigrams(rd.from_pandas(
            pd.DataFrame({"text": ["a b", "a b", "c d"]})), min_count=2)
        assert out.bigram.tolist() == ["a b"]  # 'c d' below min_count
        empty = pmi_bigrams(rd.from_pandas(
            pd.DataFrame({"text": ["", "   "]})))
        assert len(empty) == 0 and list(empty.columns) == [
            "bigram", "cnt", "pmi_fp"]


class TestBigramLmXent:
    def test_matches_naive_reference(self, ray_session):
        """Bit parity with a Counter-based reference of the exact
        quantization rule on a corpus with repeats, multibyte tokens,
        an empty doc and a one-token doc (no bigram events)."""
        import math
        from collections import Counter

        import ray.data as rd

        from guac_ray.functions.text import bigram_lm_xent, sql_ws_tokens

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "the cat sat on the mat",
                "the cat sat on the mat",
                "café naïve café naïve café",
                "one two three four five six seven",
                "solo",          # 1 token → dropped
                "",              # empty → dropped
            ]})
        got = (bigram_lm_xent(rd.from_pandas(docs).repartition(3))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))

        uni: Counter = Counter()
        big: Counter = Counter()
        toks = {}
        for did, txt in zip(docs.doc_id, docs.text):
            w = sql_ws_tokens(txt)
            toks[did] = w
            uni.update(w)
            big.update(zip(w, w[1:]))
        v = len(uni)
        q = {bg: math.floor(1_000_000 * (
                math.log(float(uni[bg[0]] + v))
                - math.log(float(c + 1))) + 0.5)
             for bg, c in big.items()}
        rows = []
        for did, w in toks.items():
            bgs = list(zip(w, w[1:]))
            if not bgs:
                continue
            s = sum(q[bg] for bg in bgs)
            rows.append((did, len(bgs), s, s // len(bgs)))
        want = pd.DataFrame(
            rows, columns=["doc_id", "n_bigrams",
                           "xent_micronats", "mean_xent"]
        ).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert set(got.doc_id) == {1, 2, 3, 4}

    def test_repetition_scores_lower(self, ray_session):
        """A doc whose bigrams the LM has seen many times must score
        lower mean cross-entropy than a doc of corpus-unique bigrams —
        the fluency/perplexity-filter property."""
        import ray.data as rd

        from guac_ray.functions.text import bigram_lm_xent

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5],
            "text": (["the quick brown fox jumps"] * 4
                     + ["zebra quantum mango violin cactus"])})
        out = (bigram_lm_xent(rd.from_pandas(docs))
               .to_pandas().set_index("doc_id"))
        assert out.loc[5, "mean_xent"] > out.loc[1, "mean_xent"]
        # the four identical docs score identically
        assert out.loc[1, "xent_micronats"] == out.loc[4, "xent_micronats"]

    def test_empty_corpus_and_cap(self, ray_session):
        import pytest
        import ray.data as rd

        from guac_ray.functions.text import bigram_lm_xent

        empty = bigram_lm_xent(rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["", "  "]})))
        # typed empty DATASET — same contract as the non-empty path
        assert empty.count() == 0
        assert empty.schema().names == [
            "doc_id", "n_bigrams", "xent_micronats", "mean_xent"]
        with pytest.raises(ValueError):
            bigram_lm_xent(rd.from_pandas(pd.DataFrame(
                {"doc_id": [1], "text": ["a b c d e f g"]})), vocab_cap=3)


class TestBuildPostings:
    """Inverted-index build: exact (term, doc, tf, df) postings."""

    def test_hand_computed_index(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.text import build_postings

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["the cat sat\tthe  cat", "the dog", "", "naïve cat"],
        })
        got = build_postings(
            rd.from_pandas(docs).repartition(3),
            exchange_base=str(tmp_path / "px"), num_buckets=4,
        ).to_pandas().sort_values(["term", "doc_id"]).reset_index(drop=True)
        # tf: within-doc counts; doc_freq: docs containing the term.
        assert got[["term", "doc_id", "tf", "doc_freq"]].values.tolist() == [
            ["cat", 1, 2, 2], ["cat", 4, 1, 2],
            ["dog", 2, 1, 1],
            ["naïve", 4, 1, 1],
            ["sat", 1, 1, 1],
            ["the", 1, 2, 2], ["the", 2, 1, 2],
        ]

    def test_df_consistency_random(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.text import build_postings

        import numpy as np

        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(40)]
        docs = pd.DataFrame({
            "doc_id": range(60),
            "text": [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
                     for _ in range(60)],
        })
        got = build_postings(
            rd.from_pandas(docs).repartition(5),
            exchange_base=str(tmp_path / "pr"), num_buckets=4).to_pandas()
        # (term, doc) unique; df == number of postings rows per term;
        # per-doc tf sums == doc token counts
        assert not got.duplicated(["term", "doc_id"]).any()
        per_term = got.groupby("term").agg(n=("doc_id", "size"),
                                           df=("doc_freq", "first"))
        assert (per_term["n"] == per_term["df"]).all()
        toks = docs.set_index("doc_id")["text"].str.split().map(len)
        sums = got.groupby("doc_id")["tf"].sum()
        assert (sums == toks.loc[sums.index]).all()


class TestDomainLogOdds:
    """Monroe-style smoothed log-odds discriminative terms."""

    def test_matches_naive_reference(self, ray_session):
        import math
        from collections import Counter

        import ray.data as rd

        from guac_ray.functions.text import domain_log_odds

        tgt_texts = ["quantum flux capacitor " * 3 + "the and of"] * 4 \
            + ["quantum entanglement the"] * 3
        raw_texts = ["the and of stock market report"] * 6 \
            + ["weather report the and"] * 5
        tgt = pd.DataFrame({"doc_id": range(len(tgt_texts)),
                            "text": tgt_texts})
        raw = pd.DataFrame({"doc_id": range(len(raw_texts)),
                            "text": raw_texts})
        got = domain_log_odds(
            rd.from_pandas(tgt).repartition(2),
            rd.from_pandas(raw).repartition(3), min_count=2, top_k=10)
        # naive reference
        ct = Counter(w for t in tgt_texts for w in t.lower().split())
        cr = Counter(w for t in raw_texts for w in t.lower().split())
        nt, nr = sum(ct.values()), sum(cr.values())
        rows = []
        for term, c in ct.items():
            if c < 2:
                continue
            e = ((math.log(c + 1) - math.log(nt - c + 1))
                 - math.log(cr.get(term, 0) + 1)) \
                + math.log(nr - cr.get(term, 0) + 1)
            rows.append((term, c, cr.get(term, 0),
                         math.floor(1e6 * e + 0.5)))
        rows.sort(key=lambda r: (-r[3], r[0]))
        assert got[["term", "ct", "cr", "score_fp"]].values.tolist() \
            == [list(r) for r in rows[:10]]
        # the target-exclusive content word outranks shared stopwords
        assert got["term"].iloc[0] in ("quantum", "flux", "capacitor")
        assert got[got["term"] == "the"].index[0] > 0

    def test_min_count_and_empty(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.text import domain_log_odds

        tgt = pd.DataFrame({"doc_id": [1], "text": ["rare rare"]})
        raw = pd.DataFrame({"doc_id": [1], "text": ["common words here"]})
        got = domain_log_odds(rd.from_pandas(tgt), rd.from_pandas(raw),
                              min_count=5, top_k=10)
        assert len(got) == 0
        assert list(got.columns) == ["term", "ct", "cr", "score_fp"]
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "text": pd.Series([], dtype="object")})
        got2 = domain_log_odds(rd.from_pandas(empty),
                               rd.from_pandas(raw), top_k=5)
        assert len(got2) == 0


class TestPatternInventory:
    """Token-anchored pattern extraction (PII inventory explode)."""

    def test_hand_computed_inventory(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.text import PII_PATTERNS, pattern_inventory

        pats = {k: PII_PATTERNS[k] for k in ("email", "url", "ipv4")}
        docs = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [
                # a@b.co twice (count 2), one url; the parenthesised
                # token (a@b.co) must NOT match (anchored ^pat$ —
                # unanchored substring search WOULD hit it), nor the
                # 5-octet 999.1.2.3.4
                "a@b.co hello a@b.co see https://x.io/p (a@b.co)",
                "ip 10.1.2.3 and bad 999.1.2.3.4 end",
                "nothing here",
            ],
        })
        got = pattern_inventory(rd.from_pandas(docs).repartition(2), pats) \
            .to_pandas().sort_values(["doc_id", "kind", "pii"]) \
            .reset_index(drop=True)
        assert got[["doc_id", "kind", "pii", "n"]].values.tolist() == [
            [1, "email", "a@b.co", 2],
            [1, "url", "https://x.io/p", 1],
            [2, "ipv4", "10.1.2.3", 1],
        ]

    def test_null_text_and_empty(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.text import PII_PATTERNS, pattern_inventory

        pats = {"email": PII_PATTERNS["email"]}
        docs = pd.DataFrame({"doc_id": [1, 2],
                             "text": [None, "plain words only"]})
        out = pattern_inventory(rd.from_pandas(docs), pats)
        assert out.count() == 0
        assert set(["doc_id", "kind", "pii", "n"]) \
            <= set(out.schema().names)


class TestWave3Hardening:
    """Round-5 session-11 review wave over the text family."""

    def test_tfidf_empty_corpus_typed(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.text import tfidf_top_terms

        out = tfidf_top_terms(rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["", "   "]})))
        assert out.count() == 0
        assert out.schema().names == [
            "doc_id", "term", "tf", "doc_freq", "score_fp"]

    def test_domain_log_odds_empty_raw_pool(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.text import domain_log_odds

        tgt = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2], "text": ["alpha beta alpha", "beta gamma"]}))
        raw = rd.from_pandas(pd.DataFrame(
            {"doc_id": [9], "text": [""]}))
        out = domain_log_odds(tgt, raw, min_count=1)
        # degenerate but legal: every target term scores with cr=0
        assert list(out.columns) == ["term", "ct", "cr", "score_fp"]
        assert set(out["term"]) == {"alpha", "beta", "gamma"}
        assert (out["cr"] == 0).all()

    def test_scrub_pii_rejects_count_column_shadow(self, ray_session):
        import pytest
        import ray.data as rd

        from guac_ray.functions.text import scrub_pii

        ds = rd.from_pandas(pd.DataFrame(
            {"text": ["go to http://x.example now"],
             "n_url": [99]}))  # pre-existing column the scrub would clobber
        with pytest.raises(Exception, match="n_url"):
            scrub_pii(ds).materialize()


class TestWave14Hardening:
    """Round-5 session-12 focused pass: arbitrary id types, SQL-RE2
    whitespace parity, NULL-key inventories, shadow guards."""

    def test_bm25_and_postings_string_ids(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.text import bm25_topk, build_postings

        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": ["alpha", "beta"],
            "text": ["hash join probe", "hash only"]}))
        out = bm25_topk(docs, {1: ["hash", "join"]}, k=2).to_pandas()
        assert out["doc_id"].tolist() == ["alpha", "beta"]
        assert out["rank"].tolist() == [1, 2]
        post = build_postings(
            docs, exchange_base=str(tmp_path / "px")).to_pandas()
        assert set(post["doc_id"]) == {"alpha", "beta"}

    def test_fingerprint_sql_whitespace_parity(self):
        import hashlib

        from guac_ray.functions.text import Fingerprinter

        fp = Fingerprinter()
        # NBSP is NOT SQL-RE2 whitespace: it must survive, matching the
        # oracle's [ \t\n\r\f\v]+ collapse (module \s+ rule)
        assert fp.fp("a b") == hashlib.md5(
            "a b".encode()).hexdigest()
        assert fp.fp("a  \t b") == hashlib.md5(b"a b").hexdigest()

    def test_pii_inventory_keeps_null_doc_id(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.text import pattern_inventory

        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": pd.array([1, None], dtype="Int64"),
            "text": ["mail x@y.co", "mail z@w.co"]}))
        out = pattern_inventory(
            docs, {"email": r"[\w.+-]+@[\w.-]+"}).to_pandas()
        # the NULL-id doc's match must SURVIVE a compliance audit
        assert len(out) == 2
        assert "z@w.co" in set(out["pii"])

    def test_scrub_out_col_cannot_shadow_count(self, ray_session):
        import pytest
        import ray.data as rd

        from guac_ray.functions.text import scrub_pii

        ds = rd.from_pandas(pd.DataFrame(
            {"text": ["see http://x.example now"]}))
        with pytest.raises(Exception, match="n_url"):
            scrub_pii(ds, out_col="n_url").materialize()
