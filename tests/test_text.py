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
