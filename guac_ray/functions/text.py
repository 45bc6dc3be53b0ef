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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
    "utf8_stats",
    "tfidf_top_terms",
    "bm25_topk",
    "unigram_surprisal",
    "bigram_lm_xent",
    "doc_token_entropy",
    "PII_PATTERNS",
    "scrub_pii",
    "pattern_inventory",
    "RepetitionScorer",
    "repetition_scores",
]

TOKEN_RE = r"[A-Za-z0-9_]+"

# RE2 '\s' is exactly [\t\n\f\r ] (verified against DuckDB's
# regexp_split_to_array: \v, \xa0 and U+2028 do NOT split). Python
# str.split() splits on every Unicode whitespace, so any operator whose
# oracle tokenizes with '\s+' must use THIS splitter or the "exact SQL
# oracle" contract silently breaks on non-ASCII-whitespace corpora.
_SQL_WS_RE = re.compile(r"[\t\n\f\r ]+")


def sql_ws_tokens(text: str | None) -> list[str]:
    """Lowercased tokens split on RE2-'\\s+' whitespace, empties
    dropped — byte-for-byte the token stream DuckDB's
    ``regexp_split_to_array(lower(text), '\\s+')`` (+ empty filter)
    produces."""
    return [t for t in _SQL_WS_RE.split((text or "").lower()) if t]


def ws_token_stream(col) -> tuple[pa.Array, np.ndarray]:
    """The ``sql_ws_tokens`` grammar over a whole Arrow string column:
    returns ``(flat_tokens, counts)`` — one flat token array for the
    batch plus per-row token counts — via one ``split_pattern_regex``
    pass and numpy segment arithmetic, no per-row Python. The shared
    tokenizer under ``ws_shingles`` and the passage-rewrite ops."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(col, "")), pattern=r"[\t\n\f\r ]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    off = toks.offsets.to_numpy().astype(np.int64)
    # drop the empty tokens a leading/trailing separator produces, via a
    # cumulative-sum segment count (reduceat misbehaves on empty docs)
    keep = pc.greater(pc.binary_length(flat), 0)
    kn = keep.to_numpy(zero_copy_only=False).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(kn)])
    cnt = csum[off[1:]] - csum[off[:-1]]  # tokens per row
    return flat.filter(keep), cnt


def ws_shingles(col, ngram: int, with_pos: bool = False):
    """Vectorized word-``ngram`` shingling over an Arrow string column —
    the whole batch runs through three Arrow kernels plus numpy index
    arithmetic, with NO per-row Python (the r4 verdict's fix for the
    decontamination shingle loop): one ``split_pattern_regex`` pass
    (the explicit ``[\\t\\n\\f\\r ]+`` class — RE2's ``\\s`` would also
    split on ``\\v``, which neither ``sql_ws_tokens`` nor DuckDB's
    ``regexp_split_to_array('\\s+')`` does), numpy window-start
    assembly, ``ngram`` zero-copy takes, and one
    ``binary_join_element_wise`` to build the space-joined shingle
    strings. Token grammar is byte-identical to ``sql_ws_tokens``.

    Returns ``(row_idx, shingles)``: for every token window, the
    0-based batch row it came from and the joined shingle string —
    NOT deduped (callers dedup with an Arrow ``group_by``, per doc or
    per batch as their semantics need). Null text = no tokens.
    With ``with_pos=True`` returns ``(row_idx, pos, shingles)`` where
    ``pos`` is the window's 0-based starting TOKEN index within its row
    (after empty-token dropping) — the coordinate passage-level ops
    need to turn flagged windows back into token coverage.
    """
    ft, cnt = ws_token_stream(col)
    w = np.maximum(cnt - ngram + 1, 0)  # windows per row
    total = int(w.sum())
    if total == 0:
        if with_pos:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    pa.array([], pa.string()))
        return np.empty(0, np.int64), pa.array([], pa.string())
    row_idx = np.repeat(np.arange(len(w), dtype=np.int64), w)
    fstart = np.concatenate([[0], np.cumsum(cnt)])[:-1]  # row starts in ft
    cw = np.concatenate([[0], np.cumsum(w)])[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(cw, w)
    starts = np.repeat(fstart, w) + pos
    parts = [ft.take(pa.array(starts + j)) for j in range(ngram)]
    sh = (pc.binary_join_element_wise(*parts, " ")
          if ngram > 1 else parts[0])
    if with_pos:
        return row_idx, pos, sh
    return row_idx, sh


# byte-class lookup tables for the zero-copy text scanner below
_WORD_LUT = np.zeros(256, dtype=bool)
for _c in (b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
           b"abcdefghijklmnopqrstuvwxyz0123456789_"):
    _WORD_LUT[_c] = True
_ALPHA_LUT = np.zeros(256, dtype=bool)
for _c in b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _ALPHA_LUT[_c] = True


def _chunk_stats(a: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = len(a)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    odt = np.int64 if pa.types.is_large_string(a.type) else np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=odt)[
        a.offset:a.offset + n + 1].astype(np.int64)
    dbuf = a.buffers()[2]
    if dbuf is None or int(offs[-1]) == int(offs[0]):  # all-empty chunk
        z = np.zeros(n, dtype=np.int64)
        return z, z.copy(), z.copy()
    data = np.frombuffer(dbuf, dtype=np.uint8)
    lo = int(offs[0])
    d = data[lo:int(offs[-1])]
    offs = offs - lo
    w = _WORD_LUT[d]
    starts = np.empty_like(w)
    starts[0] = w[0]
    np.logical_and(w[1:], ~w[:-1], out=starts[1:])
    b, e = offs[:-1], offs[1:]

    # segment sums as prefix-sum differences cs[e]-cs[b]: exact for
    # EVERY segment layout including empty strings anywhere (b == e →
    # 0) — the previous reduceat formulation clamped indices to
    # len(d)-1, which stole the final byte of the last non-empty string
    # whenever the chunk ended in empties. int64 astype BEFORE cumsum:
    # numpy's bool-input reductions with a dtype= conversion run an
    # unbuffered casting inner loop ~100x slower than astype + native
    # accumulate (measured on this host).
    def seg(x: np.ndarray) -> np.ndarray:
        cs = np.empty(len(x) + 1, dtype=np.int64)
        cs[0] = 0
        np.cumsum(x.astype(np.int64), out=cs[1:])
        return cs[e] - cs[b]

    ntok = seg(starts)
    nalpha = seg(_ALPHA_LUT[d])
    ncont = seg((d & 0xC0) == 0x80)
    # a string that BEGINS inside a global word run still starts a token
    # of its own: global run-starts missed position offs[i] when the
    # previous string's last byte was also a word byte
    ii = np.flatnonzero((b < e) & (b > 0))
    if len(ii):
        ntok[ii] += (w[b[ii]] & w[b[ii] - 1]).astype(np.int64)
    nchars = (e - b) - ncont  # bytes minus UTF-8 continuations
    return ntok, nalpha, nchars


def utf8_stats(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n_tokens, n_alpha_chars, n_chars) int64 arrays for a string
    column, computed by byte-class lookup + cumulative sums DIRECTLY on
    the Arrow UTF-8 buffers — no Python-object conversion, no regex.

    Exact parity with the regex definitions (nulls count as empty):
      n_tokens = len(re.findall(r"[A-Za-z0-9_]+", s))  — word bytes are
        ASCII-only, and UTF-8 continuation/lead bytes are ≥ 0x80, so
        byte runs == character runs;
      n_alpha  = len(re.sub(r"[^A-Za-z]", "", s));
      n_chars  = len(s)  — codepoints = non-continuation bytes.
    """
    if isinstance(col, pa.ChunkedArray):
        chunks = pc.fill_null(col, "").chunks
    else:
        chunks = [pc.fill_null(col, "")]
    parts = [_chunk_stats(c) for c in chunks] or [_chunk_stats(
        pa.array([], type=pa.string()))]
    return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))

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
    """doc batch → (doc_id, n_tokens). The default grammar takes the
    zero-copy byte scanner (:func:`utf8_stats`); a custom pattern
    compiles once per actor and falls back to the regex loop."""

    def __init__(self, pattern: str = TOKEN_RE):
        self.default = pattern == TOKEN_RE
        self.pat = re.compile(pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.default:
            n = pa.array(utf8_stats(batch["text"])[0], type=pa.int64())
        else:
            texts = batch["text"].to_pylist()
            n = pa.array([len(self.pat.findall(t or "")) for t in texts],
                         type=pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})


class QualityScorer:
    """doc batch → (doc_id, n_chars, n_tokens, alpha_ratio).

    alpha_ratio = alphabetic chars / n_chars (0 for empty docs), rounded
    to 4 so the float matches the SQL oracle bit-for-bit.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ntok, nalpha, nchars = utf8_stats(batch["text"])
        # counts are zero-copy-vectorized; the final round() stays
        # Python's correctly-rounded decimal rounding (np.round's
        # scale-round-unscale can differ at half-even boundaries, and
        # the SQL oracle is pinned to the Python semantics)
        alpha_ratio = [
            round(a / c, 4) if c else 0.0
            for a, c in zip(nalpha.tolist(), nchars.tolist())
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(nchars, type=pa.int64()),
                "n_tokens": pa.array(ntok, type=pa.int64()),
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
        # the module's \s+ rule (lines 48-53): the oracle collapses
        # ONLY RE2-ASCII whitespace — Python \s+ would also collapse
        # NBSP/U+2028, silently forking the fingerprint from any SQL
        # reimplementation on non-ASCII-whitespace corpora
        self.ws = _SQL_WS_RE

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


class RepetitionScorer:
    """Gopher-style repetition signals per document — the quality
    filters of Rae et al. 2021 §A1.1 (duplicate-token and repeated
    n-gram fractions flag template/spam text): token count, distinct
    token count, bigram count, the max bigram multiplicity, and the
    lexicographically-smallest bigram attaining it. All counts are
    int64 so any engine reproduces them exactly; callers derive the
    fractions (the thresholds live with the caller, not the operator).

    Tokens are ``sql_ws_tokens`` — the RE2-'\\s+' grammar shared with
    tfidf/bigrams/decontaminate, so one DuckDB oracle checks all of
    them.
    """

    def __call__(self, t: pa.Table) -> pa.Table:
        from collections import Counter

        ids = t.column(0)
        n_tok, n_dis, n_bg, max_bg, top_bg = [], [], [], [], []
        for txt in t.column(1).to_pylist():
            w = sql_ws_tokens(txt)
            n_tok.append(len(w))
            n_dis.append(len(set(w)))
            if len(w) >= 2:
                c = Counter(map(" ".join, zip(w, w[1:])))
                m = max(c.values())
                n_bg.append(len(w) - 1)
                max_bg.append(m)
                top_bg.append(min(b for b, n in c.items() if n == m))
            else:
                n_bg.append(0)
                max_bg.append(0)
                top_bg.append("")
        return pa.table({
            t.column_names[0]: ids,
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_distinct_tokens": pa.array(n_dis, type=pa.int64()),
            "n_bigrams": pa.array(n_bg, type=pa.int64()),
            "max_bigram_n": pa.array(max_bg, type=pa.int64()),
            "top_bigram": pa.array(top_bg, type=pa.string()),
        })


def repetition_scores(
    docs: Dataset, id_col: str = "doc_id", text_col: str = "text",
    concurrency=(1, 4),
) -> Dataset:
    return docs.select_columns([id_col, text_col]).map_batches(
        RepetitionScorer, batch_format="pyarrow", concurrency=concurrency)


# PII scrub patterns, applied in THIS insertion order (a URL is redacted
# before the email/host inside it can match). Every pattern is plain RE2
# so DuckDB's regexp_replace(..., 'g') produces byte-identical output —
# the parity is pinned by tests/test_text.py::TestScrubPii.
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
}


def scrub_pii(
    docs: Dataset,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> Dataset:
    """Redact PII-shaped spans (URLs, emails, IPv4s, phone numbers) and
    count matches per category — the standard scrub stage of a
    training-data curation pipeline (reference analog: the sanitize step
    of pkg/ingestor/parser's identity handling, generalized to text).

    Vectorized end to end: one ``pc.count_substring_regex`` +
    ``pc.replace_substring_regex`` (RE2, zero-copy Arrow in/out) per
    category per batch — no Python row loop, nothing stateful, so a
    plain task pool streams it at any scale. Counts are measured on the
    ORIGINAL text per category (independent, so the SQL oracle is one
    flat ``len(regexp_extract_all(text, pat))`` per category);
    replacement is sequential in ``PII_PATTERNS`` order on both engines.

    Adds ``n_<category>`` int64 columns and writes the redacted text to
    ``out_col`` (default: replaces ``text_col``).
    """
    pats = patterns or PII_PATTERNS
    dest = out_col or text_col

    def scrub(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        cols = {name: t[name] for name in t.column_names}
        # output-name shadow guard (the windowed()/nth_value class): an
        # input column named n_<category> would be silently overwritten
        clash = [f"n_{cat}" for cat in pats
                 if f"n_{cat}" in cols or f"n_{cat}" == dest]
        if clash:
            raise ValueError(
                f"scrub_pii: input already carries column(s) {clash} — "
                "rename them or pass a patterns dict with different "
                "category names")
        red = txt
        for cat, pat in pats.items():
            cols[f"n_{cat}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64())
            red = pc.replace_substring_regex(
                red, pat, replacement=f"[{cat.upper()}]")
        cols[dest] = red
        return pa.table(cols)

    return docs.map_batches(scrub, batch_format="pyarrow")


def pattern_inventory(
    docs: Dataset,
    patterns: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> Dataset:
    """Token-anchored pattern EXTRACTION — the inventory complement of
    ``scrub_pii`` (that one redacts and counts; this EMITS the matched
    values): one row per (doc, kind, matched token) with its occurrence
    count, the table a compliance/PII-audit pipeline joins back against
    identity stores. Restricted by design to TOKEN-shaped patterns
    (emails, URLs, IPv4s — things whitespace delimits): Arrow has no
    extract-all kernel, so free-span extraction would force a per-row
    Python loop; tokenizing first keeps the whole stage in RE2 C++
    kernels (``split_pattern_regex`` → ``list_flatten`` →
    ``match_substring_regex`` with the pattern anchored ``^(?:pat)$``)
    AND keeps it oracle-exact (DuckDB splits with the same RE2 class —
    the ``sql_ws_tokens`` whitespace contract, WITHOUT lowercasing:
    extracted PII must stay verbatim).

    Per-batch (doc, kind, token) counts are the combiner — a doc lives
    in one row, so partials are already global, but they still route
    through ONE key-hash fs exchange + per-bucket sum so re-blocked
    inputs stay correct. Output: (id_col, kind, pii, n), n int64."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from guac_ray.arrowutil import table_from_pandas
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    anchored = {kind: f"^(?:{pat})$" for kind, pat in patterns.items()}

    def extract(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(t[text_col], ""), pattern=r"[\t\n\f\r ]+")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False), lens)
        outs = []
        for kind, pat in anchored.items():
            mask = pc.match_substring_regex(flat, pat).to_numpy(
                zero_copy_only=False)
            if not mask.any():
                continue
            outs.append(pd.DataFrame({
                id_col: ids[mask],
                "kind": np.full(int(mask.sum()), kind),
                "pii": flat.filter(pa.array(mask)).to_numpy(
                    zero_copy_only=False),
            }))
        if not outs:
            # id type follows THIS batch's schema — an int64 guess would
            # mix schemas in the exchange against string-id batches
            return pa.table({id_col: pa.array(
                                 [], t.schema.field(id_col).type),
                             "kind": pa.array([], pa.string()),
                             "pii": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_bucket": pa.array([], pa.int64())})
        # dropna=False: a NULL doc id must not silently remove its
        # matches from a COMPLIANCE inventory (SQL GROUP BY keeps it)
        df = (pd.concat(outs, ignore_index=True)
              .groupby([id_col, "kind", "pii"], sort=False,
                       dropna=False)
              .size().rename("n").reset_index())
        df["n"] = df["n"].astype("int64")
        df["_bucket"] = (stable_hash(df, [id_col])
                         % num_buckets).astype("int64")
        return table_from_pandas(df, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        g = (t.to_pandas().groupby([id_col, "kind", "pii"], sort=False,
                                   dropna=False)
             ["n"].sum().astype("int64").reset_index())
        return table_from_pandas(g, preserve_index=False)

    out = fs_exchange_reduce(
        docs.map_batches(extract, batch_format="pyarrow"),
        default_exchange("piiinv"), reduce_fn)
    if out is None:
        return rd.from_arrow(pa.schema(
            [(id_col, _id_arrow_type(docs, id_col)),
             ("kind", pa.string()),
             ("pii", pa.string()), ("n", pa.int64())]).empty_table())
    return out


class _RevOrd:
    """Reverse-ordering wrapper: lets a MIN-heap keep the k best rows
    under (score DESC, id ASC) for ids of ANY orderable type (ints,
    strings) — the unary-minus trick only works for numbers."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def _id_arrow_type(ds: Dataset, id_col: str) -> pa.DataType:
    """Arrow type of ``id_col`` for typed-empty results (int64 when the
    schema is unrecoverable)."""
    from guac_ray.arrowutil import arrow_type_of

    sch = ds.schema()
    if sch is not None and id_col in sch.names:
        t = arrow_type_of(dict(zip(sch.names, sch.types))[id_col])
        if t is not None:
            return t
    return pa.int64()


def _vocab_counts(docs: Dataset, text_col: str, per_doc_distinct: bool,
                  num_buckets: int, vocab_cap: int, out_col: str):
    """Pass-1 vocabulary table shared by tfidf_top_terms and
    unigram_surprisal: per-batch Counter partials over the SQL-parity
    token stream (distinct-per-doc for document frequency, full
    occurrence counts otherwise) → ``grouped_agg`` → one driver pandas
    frame (term, out_col). The cap check necessarily runs after
    materialization — the vocabulary IS the driver-side product here;
    beyond ``vocab_cap`` callers must route tokens ⋈ vocab through
    ``hash_join`` on term instead."""
    from collections import Counter

    from guac_ray.stages.groupagg import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t[text_col].to_pylist():
            toks = sql_ws_tokens(txt)
            c.update(set(toks) if per_doc_distinct else toks)
        return pa.table({
            "term": pa.array(list(c.keys()), type=pa.string()),
            "cnt": pa.array(list(c.values()), type=pa.int64()),
        })

    tab = grouped_agg(
        docs.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["term"], {out_col: ("cnt", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    if len(tab) > vocab_cap:
        raise ValueError(
            f"vocabulary ({len(tab)}) exceeds vocab_cap ({vocab_cap}); "
            "use the hash_join-on-term path for ultra-wide vocabularies")
    return tab


def _require_known_tokens(counter, vocab, what: str) -> None:
    """Both scoring passes re-scan the docs AFTER the vocabulary pass;
    a token absent from the vocabulary means the input re-executed
    non-deterministically between the two scans (non-replay-stable
    lineage). Fail with the contract named instead of a bare KeyError
    deep in a Ray worker."""
    missing = counter.keys() - vocab.keys()
    if missing:
        raise ValueError(
            f"{what}: token {next(iter(missing))!r} absent from the "
            "vocabulary pass — the input Dataset must be replay-stable "
            "between the vocabulary scan and the scoring scan")



def tfidf_top_terms(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    scale: int = 1_000_000,
    vocab_cap: int = 20_000_000,
    num_buckets: int = 8,
    concurrency=2,
) -> Dataset:
    """Per-document top-k terms by FIXED-POINT tf-idf.

    Scoring is integer-exact so any engine reproduces it bit-for-bit:
    ``score_fp = tf * scale // df`` (tf = term count in the doc, df =
    number of docs containing the term) — floor division on int64, no
    float log/division anywhere. Ranking is (score_fp DESC, term ASC).
    Tokens are lowercased whitespace splits (same grammar as the bigram
    oracle — expressible in DuckDB for exact checking).

    Shape: pass 1 computes the document-frequency table — per-batch
    (term, partial-df) rows (one per DISTINCT term per doc, so the
    shuffle is vocabulary×blocks, never token-scale) → ``grouped_agg``
    → one vocabulary-sized dict broadcast via ``ray.put``
    (size-guarded by ``vocab_cap``; beyond it, route through
    ``hash_join`` on term + a doc-keyed regroup instead). Pass 2
    re-scans the docs: a document is ONE ROW, so its whole term
    multiset is batch-local and the per-doc top-k needs NO shuffle —
    each batch emits ≤ top_k rows per doc directly.
    """
    import heapq
    from collections import Counter

    import ray

    df_tab = _vocab_counts(docs, text_col, per_doc_distinct=True,
                           num_buckets=num_buckets, vocab_cap=vocab_cap,
                           out_col="df")
    if df_tab.empty:
        # empty/all-empty-text corpus: the zero-row vocab frame has no
        # 'term' column — the sibling ops' guard, as a typed Dataset
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=_id_arrow_type(docs, id_col)),
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "doc_freq": pa.array([], type=pa.int64()),
            "score_fp": pa.array([], type=pa.int64()),
        }))
    dref = ray.put(dict(zip(df_tab["term"], df_tab["df"].astype(int))))

    class Scorer:
        def __init__(self):
            self.df = ray.get(dref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, terms, tfs, dfs, scores = [], [], [], [], []
            for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
                c = Counter(sql_ws_tokens(txt))
                if not c:
                    continue
                _require_known_tokens(c, self.df, "tfidf_top_terms")
                best = heapq.nsmallest(
                    top_k,
                    ((-(tf * scale // self.df[w]), w, tf) for w, tf in c.items()),
                )
                for negscore, w, tf in best:
                    ids.append(did)
                    terms.append(w)
                    tfs.append(tf)
                    dfs.append(self.df[w])
                    scores.append(-negscore)
            return pa.table({
                id_col: pa.array(ids, type=t.schema.field(id_col).type),
                "term": pa.array(terms, type=pa.string()),
                "tf": pa.array(tfs, type=pa.int64()),
                "doc_freq": pa.array(dfs, type=pa.int64()),
                "score_fp": pa.array(scores, type=pa.int64()),
            })

    return docs.select_columns([id_col, text_col]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency)


def bm25_topk(
    docs: Dataset,
    queries: dict[int, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    scale: int = 1_000_000,
    concurrency=2,
) -> pa.Table:
    """FIXED-POINT BM25 top-k retrieval (Robertson/Spärck Jones; k1=1.2,
    b=0.75) — the lexical-search complement of the vector k-NN family:
    for each query (a bag of terms) return the ``k`` highest-scoring
    documents. Every quantity is integer-exact so any engine reproduces
    the ranking bit-for-bit:

      idf_unt(t) = floor(scale·ln((2(N−df)+1)/(2df+1) + 1) + 0.5)
                   (one double division + ln, the surprisal discipline)
      u_d  = (750·dl·N) // total          (b/avgdl in 1/1000 units)
      k_d  = (1200·(250 + u_d)) // 1000   (k1·(1−b+b·dl/avgdl) ×1000)
      s(q,d) = Σ_t (idf_unt(t)·tf·2200) // (tf·1000 + k_d)

    ties break (score DESC, id ASC). N counts docs with ≥ 1 token.

    Shape: pass 1 is one streamed scan emitting ≤ (2+|terms|) stat
    partials per batch (df per QUERY term only, N, total) — the driver
    reduce is bounded by parallelism, never data; the tiny idf table
    broadcasts via ``ray.put``; pass 2 re-scans docs (a doc is one
    row → scoring is batch-local) and emits ≤ k rows per query per
    batch; the final top-k merges k·|Q|·blocks rows. Returns an
    in-memory ``pa.Table`` (qid, doc_id, score_fp, rank) — top-k
    results are driver-sized by definition.
    """
    import heapq
    import math
    from collections import Counter

    import ray

    terms = sorted({t for ts in queries.values() for t in ts})

    terms_set = set(terms)

    def stat_partial(t: pa.Table) -> pa.Table:
        kinds, keys, vals = [], [], []
        n = tot = 0
        dfc: Counter = Counter()
        for txt in t[text_col].to_pylist():
            toks = sql_ws_tokens(txt)
            if not toks:
                continue
            n += 1
            tot += len(toks)
            # intersect with the (usually smaller) query-term set:
            # O(min(|doc vocab|, |terms|)) instead of |terms| probes
            # per document
            for q in set(toks) & terms_set:
                dfc[q] += 1
        kinds += ["n", "tot"]
        keys += ["", ""]
        vals += [n, tot]
        for q, c in dfc.items():
            kinds.append("df")
            keys.append(q)
            vals.append(c)
        return pa.table({
            "kind": pa.array(kinds, type=pa.string()),
            "key": pa.array(keys, type=pa.string()),
            "val": pa.array(vals, type=pa.int64()),
        })

    parts = docs.select_columns([text_col]).map_batches(
        stat_partial, batch_format="pyarrow").take_all()
    N = sum(r["val"] for r in parts if r["kind"] == "n")
    total = sum(r["val"] for r in parts if r["kind"] == "tot")
    df: Counter = Counter()
    for r in parts:
        if r["kind"] == "df":
            df[r["key"]] += r["val"]
    if N == 0:
        return pa.table({
            "qid": pa.array([], pa.int64()),
            id_col: pa.array([], _id_arrow_type(docs, id_col)),
            "score_fp": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())})
    idf = {
        t: int(math.floor(scale * math.log(
            float(2 * (N - df[t]) + 1) / float(2 * df[t] + 1) + 1.0) + 0.5))
        for t in terms if df[t] > 0
    }
    sref = ray.put((idf, N, total, {int(q): list(ts)
                                    for q, ts in queries.items()}))

    class Scorer:
        def __init__(self):
            self.idf, self.N, self.total, self.queries = ray.get(sref)

        def __call__(self, t: pa.Table) -> pa.Table:
            tops: dict[int, list] = {q: [] for q in self.queries}
            for did, txt in zip(t[id_col].to_pylist(),
                                t[text_col].to_pylist()):
                c = Counter(sql_ws_tokens(txt))
                dl = sum(c.values())
                if not dl:
                    continue
                u = (750 * dl * self.N) // self.total
                kd = (1200 * (250 + u)) // 1000
                for q, ts in self.queries.items():
                    s = 0
                    for tk in ts:
                        tf = c.get(tk, 0)
                        if tf and tk in self.idf:
                            s += (self.idf[tk] * tf * 2200) // (
                                tf * 1000 + kd)
                    if s > 0:
                        # heap on (score, _RevOrd(id)): keeps the k
                        # best under (score DESC, id ASC) for ANY
                        # orderable id type — unary minus would crash
                        # on string ids
                        heapq.heappush(tops[q], (s, _RevOrd(did)))
                        if len(tops[q]) > k:
                            heapq.heappop(tops[q])
            qs, ids, ss = [], [], []
            for q, h in tops.items():
                for s, rid in h:
                    qs.append(q)
                    ids.append(rid.v)
                    ss.append(s)
            return pa.table({
                "qid": pa.array(qs, type=pa.int64()),
                id_col: pa.array(ids, type=t.schema.field(id_col).type),
                "score_fp": pa.array(ss, type=pa.int64()),
            })

    rows = docs.select_columns([id_col, text_col]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency).take_all()
    out = {"qid": [], id_col: [], "score_fp": [], "rank": []}
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["score_fp"], r[id_col]))
    for q in sorted(by_q):
        ranked = sorted(by_q[q], key=lambda x: (-x[0], x[1]))[:k]
        for i, (s, d) in enumerate(ranked, 1):
            out["qid"].append(q)
            out[id_col].append(d)
            out["score_fp"].append(s)
            out["rank"].append(i)
    return pa.table({
        "qid": pa.array(out["qid"], type=pa.int64()),
        id_col: pa.array(out[id_col],
                         type=_id_arrow_type(docs, id_col)),
        "score_fp": pa.array(out["score_fp"], type=pa.int64()),
        "rank": pa.array(out["rank"], type=pa.int64()),
    })


def unigram_surprisal(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
    vocab_cap: int = 20_000_000,
    num_buckets: int = 8,
    concurrency=2,
) -> Dataset:
    """Corpus-unigram surprisal per document — the LM-style quality
    signal (rare-token-heavy documents score high, common-language
    documents low; the classic cheap stand-in for model perplexity in
    training-data curation).

    Exactness: per-token surprisal is quantized ONCE per DISTINCT
    vocabulary term to integer micro-nats,
    ``q(t) = floor(scale*(ln(N) - ln(c_t)) + 0.5)``, evaluated in libm
    doubles with the same expression tree DuckDB's ``ln``/``floor``
    use — so the quantized table is bit-identical across engines — and
    a document's score is an int64 SUM of q over its token occurrences:
    integer addition is order-independent, so the distributed sum is
    exact regardless of batching. ``mean_surprisal`` is the int64 floor
    quotient (both operands positive).

    Shape: pass 1 builds the vocabulary count table — per-batch Counter
    partials (the shuffle carries vocab × blocks rows, never
    token-scale) → ``grouped_agg`` → total N as the scalar sum of the
    small per-term count column; the quantized q-table broadcasts once
    via ``ray.put`` (size-guarded by ``vocab_cap``; beyond it, route
    tokens ⋈ vocab through ``hash_join`` on term plus a doc-keyed
    grouped sum instead). Pass 2 re-scans the docs: a document is one
    row, so its token multiset is batch-local and the per-doc sum needs
    NO shuffle. Zero-token documents are dropped (the SQL inner join
    drops them too).
    """
    import math
    from collections import Counter

    import ray

    vocab = _vocab_counts(docs, text_col, per_doc_distinct=False,
                          num_buckets=num_buckets, vocab_cap=vocab_cap,
                          out_col="c")
    if vocab.empty:
        # typed empty DATASET (the non-empty path returns one), id type
        # from the input schema — not an int64 guess
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=_id_arrow_type(docs, id_col)),
            "n_tokens": pa.array([], type=pa.int64()),
            "surprisal_micronats": pa.array([], type=pa.int64()),
            "mean_surprisal": pa.array([], type=pa.int64()),
        }))
    n_total = float(int(vocab["c"].sum()))
    ln_n = math.log(n_total)
    qtab = {
        t: int(math.floor(scale * (ln_n - math.log(float(c))) + 0.5))
        for t, c in zip(vocab["term"], vocab["c"].astype(int))
    }
    qref = ray.put(qtab)

    class Scorer:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, ntok, surp, mean = [], [], [], []
            for did, txt in zip(t[id_col].to_pylist(),
                                t[text_col].to_pylist()):
                c = Counter(sql_ws_tokens(txt))
                if not c:
                    continue
                _require_known_tokens(c, self.q, "unigram_surprisal")
                n = sum(c.values())
                s = sum(self.q[w] * k for w, k in c.items())
                ids.append(did)
                ntok.append(n)
                surp.append(s)
                mean.append(s // n)
            return pa.table({
                id_col: pa.array(ids, type=t.schema.field(id_col).type),
                "n_tokens": pa.array(ntok, type=pa.int64()),
                "surprisal_micronats": pa.array(surp, type=pa.int64()),
                "mean_surprisal": pa.array(mean, type=pa.int64()),
            })

    return docs.select_columns([id_col, text_col]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency)


def doc_token_entropy(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
    concurrency=2,
) -> Dataset:
    """Per-document Shannon entropy of the token distribution in exact
    integer micro-nats — the repetitiveness signal (a doc that repeats
    one token reads 0; a doc of all-distinct tokens reads ln(n)·scale):
    ``H_fp = Σ c_t·q_t // n`` with ``q_t = floor(scale·(ln n − ln c_t)
    + 0.5)`` over SCALAR libm logs (one dict LUT per batch over the
    distinct integer counts — numpy's vectorized log can differ from
    the oracle's libm in the last ulp).

    Entirely BATCH-LOCAL: a document is one row, so there is no
    vocabulary pass, no broadcast and no shuffle — the cheapest member
    of the quantized-entropy family (cf. unigram_surprisal, which needs
    the corpus vocabulary). Zero-token documents are dropped (the SQL
    inner join drops them too)."""
    import math
    from collections import Counter

    def score(t: pa.Table) -> pa.Table:
        ids, ntok, ndis, ent = [], [], [], []
        docs_counts = []
        distinct_ints: set[int] = set()
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            c = Counter(sql_ws_tokens(txt))
            if not c:
                continue
            n = sum(c.values())
            docs_counts.append((did, n, c))
            distinct_ints.add(n)
            distinct_ints.update(c.values())
        lut = {v: math.log(float(v)) for v in distinct_ints}
        for did, n, c in docs_counts:
            ln_n = lut[n]
            s = sum(k * int(math.floor(scale * (ln_n - lut[k]) + 0.5))
                    for k in c.values())
            ids.append(did)
            ntok.append(n)
            ndis.append(len(c))
            ent.append(s // n)
        return pa.table({
            id_col: pa.array(ids, type=t.schema.field(id_col).type),
            "n_tokens": pa.array(ntok, type=pa.int64()),
            "n_distinct": pa.array(ndis, type=pa.int64()),
            "entropy_micronats": pa.array(ent, type=pa.int64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", concurrency=concurrency)


def _bigram_counts(docs: Dataset, text_col: str, num_buckets: int):
    """Distributed word-bigram occurrence table ``(w1, w2, cnt)`` over
    the SQL-parity token stream — the shared pass-2 of ``pmi_bigrams``
    and ``bigram_lm_xent``. Fully vectorized per batch
    (``ws_token_stream`` + numpy window arithmetic + one Arrow
    ``group_by``), so the ``grouped_agg`` exchange carries
    bigram-vocab × blocks partial rows, never token-scale."""
    from guac_ray.stages.groupagg import grouped_agg

    def bigram_partial(t: pa.Table) -> pa.Table:
        ft, cnt = ws_token_stream(t[text_col])
        w = np.maximum(cnt - 1, 0)
        total = int(w.sum())
        if total == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        fstart = np.concatenate([[0], np.cumsum(cnt)])[:-1]
        cw = np.concatenate([[0], np.cumsum(w)])[:-1]
        pos = np.arange(total, dtype=np.int64) - np.repeat(cw, w)
        starts = np.repeat(fstart, w) + pos
        g = pa.table({"w1": ft.take(pa.array(starts)),
                      "w2": ft.take(pa.array(starts + 1))}
                     ).group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": g["w1"], "w2": g["w2"],
                         "cnt": g["count_all"].cast(pa.int64())})

    return grouped_agg(
        docs.select_columns([text_col]).map_batches(
            bigram_partial, batch_format="pyarrow"),
        ["w1", "w2"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets)


def pmi_bigrams(
    docs: Dataset,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 30,
    scale: int = 1_000_000,
    vocab_cap: int = 20_000_000,
    num_buckets: int = 8,
):
    """Top-``top_k`` word-bigram collocations by FIXED-POINT pointwise
    mutual information — the classic collocation-mining statistic
    (Church & Hanks 1990) a corpus-analysis pipeline runs to surface
    multi-word expressions before tokenizer training or phrase mining.

    Exactness: PMI is quantized to integer micro-nats with the proven
    surprisal expression-tree discipline —
    ``pmi_fp = floor(scale*(ln(c_xy) + ln(N) - ln(c_x) - ln(c_y)) + 0.5)``
    with every ``ln`` a SCALAR libm log over an exact-integer-valued
    double (vectorized numpy logs can differ from DuckDB's libm in the
    last ulp), the additions left-associated exactly as the SQL oracle
    writes them, and N = total token occurrences. Ranking is
    (pmi_fp DESC, bigram ASC) — bigram strings are unique, so the
    top-k cut is deterministic on any engine.

    Shape: pass 1 is the shared unigram vocabulary table
    (``_vocab_counts`` — vocab × blocks partials, never token-scale);
    pass 2 shingle-counts bigrams fully vectorized (``ws_token_stream``
    + numpy window arithmetic + one Arrow ``group_by`` per batch) into
    ``grouped_agg``, so the exchange carries bigram-vocab × blocks
    partial rows; scoring maps over the aggregated bigram table with
    the unigram counts broadcast ONCE as two sorted parallel arrays
    (the searchsorted discipline — the lookup table is vocabulary-
    sized, same order as the data). Each scoring batch emits only its
    own top-k, so the driver merges ≤ k × blocks rows. At 100 TB the
    only driver-side product is the vocabulary itself (size-guarded by
    ``vocab_cap``; beyond it, route bigrams ⋈ unigrams through
    ``hash_join`` on the word instead)."""
    import math

    import pandas as pd
    import ray

    empty = pd.DataFrame({"bigram": pd.Series(dtype="object"),
                          "cnt": pd.Series(dtype="int64"),
                          "pmi_fp": pd.Series(dtype="int64")})

    vocab = _vocab_counts(docs, text_col, per_doc_distinct=False,
                          num_buckets=num_buckets, vocab_cap=vocab_cap,
                          out_col="c")
    if vocab.empty:
        return empty
    ln_n = math.log(float(int(vocab["c"].sum())))
    order = np.argsort(vocab["term"].to_numpy())
    terms = vocab["term"].to_numpy()[order]
    counts = vocab["c"].to_numpy().astype("int64")[order]
    bref = ray.put((terms, counts))

    big = _bigram_counts(docs, text_col, num_buckets)

    class Scorer:
        def __init__(self):
            self.terms, self.counts = ray.get(bref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["cnt"].to_numpy() >= min_count]
            if df.empty:
                return empty
            w1 = df["w1"].to_numpy()
            w2 = df["w2"].to_numpy()
            i1 = np.searchsorted(self.terms, w1)
            i2 = np.searchsorted(self.terms, w2)
            if (not np.array_equal(self.terms[np.clip(i1, 0, len(self.terms) - 1)], w1)
                    or not np.array_equal(self.terms[np.clip(i2, 0, len(self.terms) - 1)], w2)):
                raise ValueError(
                    "pmi_bigrams: bigram word absent from the unigram "
                    "vocabulary pass — the input Dataset must be "
                    "replay-stable between the two scans")
            cxy = df["cnt"].to_numpy().astype("int64")
            c1 = self.counts[i1]
            c2 = self.counts[i2]
            # scalar libm logs over the DISTINCT count values only
            lut = {int(v): math.log(float(v))
                   for v in np.unique(np.concatenate([cxy, c1, c2]))}
            lg = np.vectorize(lut.__getitem__, otypes=[np.float64])
            expr = ((lg(cxy) + ln_n) - lg(c1)) - lg(c2)
            pmi = np.floor(scale * expr + 0.5).astype("int64")
            out = pd.DataFrame({
                "bigram": pd.Series(w1, dtype="object") + " " + pd.Series(w2, dtype="object"),
                "cnt": cxy,
                "pmi_fp": pmi,
            })
            return out.sort_values(["pmi_fp", "bigram"],
                                   ascending=[False, True]).head(top_k)

    cand = big.map_batches(Scorer, batch_format="pandas",
                           concurrency=2).to_pandas()
    if cand.empty:
        return empty
    return (cand.sort_values(["pmi_fp", "bigram"], ascending=[False, True])
            .head(top_k).reset_index(drop=True)
            .astype({"cnt": "int64", "pmi_fp": "int64"}))


def bigram_lm_xent(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
    vocab_cap: int = 20_000_000,
    num_buckets: int = 8,
    concurrency=2,
):
    """Per-document bigram-LM cross-entropy in exact integer
    micro-nats — the CCNet/KenLM-style perplexity quality filter
    (Wenzek et al. 2020) that training-data curation ranks crawl text
    with: a Laplace-smoothed bigram language model is trained on the
    corpus and every document is scored by its total/mean conditional
    surprisal under it (perplexity = exp(mean) is monotone in
    ``mean_xent``, so filtering on the integer column IS the
    perplexity filter).

    Exactness: each DISTINCT bigram's conditional surprisal is
    quantized ONCE with the proven expression-tree discipline —
    ``q(w1 w2) = floor(scale·(ln(c(w1)+V) − ln(c(w1 w2)+1)) + 0.5)``
    (V = unigram vocabulary size; every ``ln`` a SCALAR libm log over
    an exact-integer-valued double, the subtraction/multiply/floor
    associated exactly as the SQL oracle writes them) — and a
    document's score is an int64 SUM of q over its bigram occurrences,
    order-independent under any batching. ``mean_xent`` is the int64
    floor quotient (both operands positive).

    Shape: pass 1a is the shared unigram vocabulary table
    (``_vocab_counts``); pass 1b the shared distributed bigram count
    table (``_bigram_counts`` — the exchange carries bigram-vocab ×
    blocks partials, never token-scale). The q-table is materialized
    once (the vocabulary IS the driver-side product here, size-guarded
    by ``vocab_cap``; beyond it, route doc-bigrams ⋈ q through
    ``hash_join`` on the bigram plus a doc-keyed grouped sum instead)
    and broadcast as two sorted parallel arrays (the searchsorted
    discipline). Pass 2 re-scans the docs fully vectorized: one
    ``ws_shingles`` pass per batch, one searchsorted, one
    ``np.add.at`` per-row sum — a document is one row, so the per-doc
    sum is batch-local and NO token-scale data moves. Documents with
    fewer than 2 tokens are dropped (no bigram events — the SQL inner
    join drops them too).
    """
    import math

    import ray
    import ray.data as rd

    def empty():
        # typed empty DATASET (the non-empty path returns one), id type
        # from the input schema — not an int64 guess; lazy so the
        # common path never pays the schema probe
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=_id_arrow_type(docs, id_col)),
            "n_bigrams": pa.array([], type=pa.int64()),
            "xent_micronats": pa.array([], type=pa.int64()),
            "mean_xent": pa.array([], type=pa.int64()),
        }))

    vocab = _vocab_counts(docs, text_col, per_doc_distinct=False,
                          num_buckets=num_buckets, vocab_cap=vocab_cap,
                          out_col="c")
    if vocab.empty:
        return empty()
    v_size = int(len(vocab))
    big = _bigram_counts(docs, text_col, num_buckets).to_pandas()
    if len(big) > vocab_cap:
        raise ValueError(
            f"bigram vocabulary ({len(big)}) exceeds vocab_cap "
            f"({vocab_cap}); route doc-bigrams ⋈ q through hash_join "
            "on the bigram plus a doc-keyed grouped sum instead")
    if big.empty:
        return empty()

    # q per distinct bigram: c(w1) via searchsorted into the sorted
    # unigram table; scalar libm logs over DISTINCT operand values only
    uorder = np.argsort(vocab["term"].to_numpy())
    uterms = vocab["term"].to_numpy()[uorder]
    ucounts = vocab["c"].to_numpy().astype("int64")[uorder]
    w1 = big["w1"].to_numpy()
    i1 = np.searchsorted(uterms, w1)
    if not np.array_equal(uterms[np.clip(i1, 0, len(uterms) - 1)], w1):
        raise ValueError(
            "bigram_lm_xent: bigram word absent from the unigram "
            "vocabulary pass — the input Dataset must be replay-stable "
            "between the two scans")
    c1v = ucounts[i1] + v_size          # ln(c(w1) + V)
    cxy1 = big["cnt"].to_numpy().astype("int64") + 1  # ln(c_xy + 1)
    lut = {int(v): math.log(float(v))
           for v in np.unique(np.concatenate([c1v, cxy1]))}
    lg = np.vectorize(lut.__getitem__, otypes=[np.float64])
    q = np.floor(scale * (lg(c1v) - lg(cxy1)) + 0.5).astype("int64")

    bgrams = (big["w1"].astype("object") + " "
              + big["w2"].astype("object")).to_numpy()
    border = np.argsort(bgrams)
    bref = ray.put((bgrams[border], q[border]))

    class Scorer:
        def __init__(self):
            self.bgrams, self.q = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            row_idx, sh = ws_shingles(t[text_col], 2)
            if len(row_idx) == 0:
                return pa.schema([
                    (id_col, t.schema.field(id_col).type),
                    ("n_bigrams", pa.int64()),
                    ("xent_micronats", pa.int64()),
                    ("mean_xent", pa.int64()),
                ]).empty_table()
            shv = sh.to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.bgrams, shv)
            if not np.array_equal(
                    self.bgrams[np.clip(idx, 0, len(self.bgrams) - 1)], shv):
                raise ValueError(
                    "bigram_lm_xent: document bigram absent from the "
                    "count pass — the input Dataset must be "
                    "replay-stable between the two scans")
            n_rows = t.num_rows
            sums = np.zeros(n_rows, dtype=np.int64)
            np.add.at(sums, row_idx, self.q[idx])
            nb = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
            keep = nb > 0
            return pa.table({
                id_col: t[id_col].filter(pa.array(keep)),
                "n_bigrams": pa.array(nb[keep], type=pa.int64()),
                "xent_micronats": pa.array(sums[keep], type=pa.int64()),
                "mean_xent": pa.array(sums[keep] // nb[keep],
                                      type=pa.int64()),
            })

    return docs.select_columns([id_col, text_col]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency)


def build_postings(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Inverted-index BUILD — the materialized artifact a retrieval
    stack serves BM25/boolean queries from: one posting row per
    distinct (term, doc) pair carrying the within-doc term frequency
    and the term's document frequency, ``(term, doc_id, tf,
    doc_freq)``, all exact int64 counts under the ``sql_ws_tokens``
    grammar. ``tfidf_top_terms``/``bm25_topk`` recompute df per run
    and keep only top-k; this op emits the full index as data, the
    write-once path when the index itself is the product.

    Shape: the tf pass is BATCH-LOCAL (a doc is one row, so the
    in-batch (term, doc) Arrow group_by IS the global tf — one
    vectorized ``ws_token_stream`` + ``group_by`` per batch, no
    token-scale shuffle); df is the standard vocabulary-scale
    ``grouped_agg`` (term × blocks partials); df attaches back by the
    co-partitioned ``hash_join`` on term — the honest scale path when
    the vocabulary exceeds broadcast budget (contrast tfidf's
    broadcast df, fine for top-k but not for a full-index emit).
    Ray's lazy plan re-tokenizes for the df pass; at 100 TB you'd
    point both consumers at the join's own left partition files —
    the partition write IS the materialization."""
    from guac_ray.functions.joins import default_exchange, hash_join
    from guac_ray.stages.groupagg import grouped_agg

    def tf_fn(t: pa.Table) -> pa.Table:
        flat, cnt = ws_token_stream(t[text_col])
        ids = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False), cnt)
        ity = t.schema.field(id_col).type  # arbitrary id types, like
        if len(ids) == 0:                  # every sibling op
            return pa.table({
                "term": pa.array([], type=pa.string()),
                id_col: pa.array([], type=ity),
                "tf": pa.array([], type=pa.int64()),
            })
        g = (pa.table({"term": flat.cast(pa.string()),
                       id_col: pa.array(ids, type=ity)})
             .group_by(["term", id_col])
             .aggregate([(id_col, "count")]))
        return pa.table({
            "term": g["term"],
            id_col: g[id_col],
            "tf": g[f"{id_col}_count"].cast(pa.int64()),
        })

    base = exchange_base or default_exchange("postings")
    postings = docs.select_columns([id_col, text_col]).map_batches(
        tf_fn, batch_format="pyarrow")
    df = grouped_agg(postings, ["term"],
                     {"doc_freq": ("tf", "count")},
                     num_buckets=num_buckets)
    return hash_join(postings, df, on="term",
                     exchange_dir=f"{base}_join",
                     how="inner", num_buckets=num_buckets)


def domain_log_odds(
    target_docs: Dataset,
    raw_docs: Dataset,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 30,
    scale: int = 1_000_000,
    vocab_cap: int = 20_000_000,
    num_buckets: int = 8,
):
    """Top-``top_k`` domain-DISCRIMINATIVE terms by fixed-point
    smoothed log-odds ratio (the Monroe et al. 2008 "fightin' words"
    statistic with a +1 Laplace prior) — the feature-selection step
    quality-classifier pipelines (fastText-style CCNet filters) run
    to learn what separates a target domain from the raw pool. DSIR
    weights score DOCUMENTS with these per-term quantities; this op
    emits the per-TERM table itself.

    Exactness: ``score_fp = floor(scale·(((ln(ct+1) − ln(Nt−ct+1))
    − ln(cr+1)) + ln(Nr−cr+1)) + 0.5)`` with every ``ln`` a SCALAR
    libm log over an exact-integer-valued double (the proven
    surprisal expression-tree discipline, associated exactly as the
    SQL oracle writes it). Ranking is (score_fp DESC, term ASC) over
    terms with ``ct ≥ min_count`` — deterministic on any engine.

    Shape: two ``_vocab_counts`` passes (each a vocab × blocks
    exchange over its side — together ONE scan of the corpus, never
    token-scale in the exchange); the scoring itself runs over the
    union vocabulary, the engine's one accepted driver-side product
    (size-guarded by ``vocab_cap``; beyond it route the two vocab
    tables through ``hash_join`` on term and per-block top-k heaps
    instead). Returns a ``top_k``-row pandas DataFrame
    (term, ct, cr, score_fp)."""
    import math

    import pandas as pd

    empty = pd.DataFrame({"term": pd.Series(dtype="object"),
                          "ct": pd.Series(dtype="int64"),
                          "cr": pd.Series(dtype="int64"),
                          "score_fp": pd.Series(dtype="int64")})
    vt = _vocab_counts(target_docs, text_col, per_doc_distinct=False,
                       num_buckets=num_buckets, vocab_cap=vocab_cap,
                       out_col="ct")
    vr = _vocab_counts(raw_docs, text_col, per_doc_distinct=False,
                       num_buckets=num_buckets, vocab_cap=vocab_cap,
                       out_col="cr")
    if vt.empty:
        return empty
    if vr.empty:
        # the zero-row vocab frame has NO 'term' column (the lazy
        # grouped_agg fallback) — type it so the outer merge works and
        # the log-odds degenerate to the +1-smoothed target-only form
        vr = pd.DataFrame({"term": pd.Series(dtype="object"),
                           "cr": pd.Series(dtype="int64")})
    both = vt.merge(vr, on="term", how="outer")
    for c in ("ct", "cr"):
        both[c] = both[c].fillna(0).astype("int64")
    nt = int(both["ct"].sum())
    nr = int(both["cr"].sum())
    both = both[both["ct"].to_numpy() >= min_count]
    if both.empty:
        return empty
    ct1 = both["ct"].to_numpy() + 1
    dt1 = nt - both["ct"].to_numpy() + 1
    cr1 = both["cr"].to_numpy() + 1
    dr1 = nr - both["cr"].to_numpy() + 1
    lut = {int(v): math.log(float(v))
           for v in np.unique(np.concatenate([ct1, dt1, cr1, dr1]))}
    lg = np.vectorize(lut.__getitem__, otypes=[np.float64])
    expr = ((lg(ct1) - lg(dt1)) - lg(cr1)) + lg(dr1)
    both = both.assign(
        score_fp=np.floor(scale * expr + 0.5).astype("int64"))
    return (both.sort_values(["score_fp", "term"],
                             ascending=[False, True])
            .head(top_k)[["term", "ct", "cr", "score_fp"]]
            .reset_index(drop=True))
