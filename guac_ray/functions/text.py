"""Text-analysis operators for large-scale training-data pipelines:
language-ID (n-gram heuristic), quality scoring, token counting,
document fingerprinting. All are vectorized ``map_batches`` stages; the
stateful ones (compiled regexes, ngram profiles) are callable classes →
actor pools.

The regex token grammar ``[A-Za-z0-9_]+`` is chosen to be expressible in
DuckDB's RE2 (`regexp_extract_all`) so the driver's SQL oracle can check
token counts exactly.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from ray.data import Dataset

__all__ = [
    "TOKEN_RE",
    "TokenCounter",
    "QualityScorer",
    "LangId",
    "Fingerprinter",
    "token_counts",
    "quality_scores",
    "lang_id",
    "fingerprints",
]

TOKEN_RE = r"[A-Za-z0-9_]+"

# tiny per-language trigram + stopword profiles for the heuristic
# language-ID (public-knowledge frequency tables, hand-abridged)
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "una", "por"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "per", "con", "del"},
}


class TokenCounter:
    """doc batch → (doc_id, n_tokens). Regex compiled once per actor."""

    def __init__(self, pattern: str = TOKEN_RE):
        self.pat = re.compile(pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = [len(self.pat.findall(t or "")) for t in texts]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(n, type=pa.int64())}
        )


class QualityScorer:
    """doc batch → (doc_id, n_chars, n_tokens, alpha_ratio).

    alpha_ratio = alphabetic chars / n_chars (0 for empty docs), rounded
    to 4 so the float matches the SQL oracle bit-for-bit.
    """

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)
        self.alpha = re.compile(r"[^A-Za-z]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tok, alpha_ratio = [], []
        for t in texts:
            t = t or ""
            n_tok.append(len(self.tok.findall(t)))
            alpha_ratio.append(
                round(len(self.alpha.sub("", t)) / len(t), 4) if t else 0.0
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array([len(t or "") for t in texts], type=pa.int64()),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "alpha_ratio": pa.array(alpha_ratio, type=pa.float64()),
            }
        )


class LangId:
    """Stopword-overlap language guesser (n-gram heuristic). Profiles are
    the per-actor state. Emits (doc_id, lang_pred, confidence)."""

    def __init__(self, profiles: dict[str, set[str]] | None = None):
        self.profiles = profiles or _LANG_PROFILES
        self.tok = re.compile(TOKEN_RE)

    def _guess(self, text: str) -> tuple[str, float]:
        words = [w.lower() for w in self.tok.findall(text or "")]
        if not words:
            return "und", 0.0
        ws = words if len(words) <= 400 else words[:400]
        scores = {
            lang: sum(1 for w in ws if w in prof) / len(ws)
            for lang, prof in self.profiles.items()
        }
        best = max(scores, key=lambda k: (scores[k], k))
        return (best if scores[best] > 0 else "und"), round(scores[best], 4)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._guess(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array([p[0] for p in preds], type=pa.string()),
                "confidence": pa.array([p[1] for p in preds], type=pa.float64()),
            }
        )


class Fingerprinter:
    """Whitespace-normalized md5 fingerprint (rolling-hash analog with an
    oracle-friendly definition): fp = md5(lower(ws-collapsed text))."""

    def __init__(self):
        self.ws = re.compile(r"\s+")

    def fp(self, text: str) -> str:
        norm = self.ws.sub(" ", (text or "").lower()).strip()
        return hashlib.md5(norm.encode("utf-8")).hexdigest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fp(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, type=pa.string())}
        )


def token_counts(docs: Dataset, concurrency: int = 2) -> Dataset:
    return docs.map_batches(TokenCounter, batch_format="pyarrow", concurrency=concurrency)


def quality_scores(docs: Dataset, concurrency: int = 2) -> Dataset:
    return docs.map_batches(QualityScorer, batch_format="pyarrow", concurrency=concurrency)


def lang_id(docs: Dataset, concurrency: int = 2) -> Dataset:
    return docs.map_batches(LangId, batch_format="pyarrow", concurrency=concurrency)


def fingerprints(docs: Dataset, concurrency: int = 2) -> Dataset:
    return docs.map_batches(Fingerprinter, batch_format="pyarrow", concurrency=concurrency)
