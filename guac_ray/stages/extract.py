"""Triple extraction — the parser family (SURVEY.md §2.3) as ONE
``map_batches`` stage over zero-copy Arrow transcript batches.

The reference registers one ``DocumentParser`` per document type
(pkg/ingestor/parser/parser.go:43-56); here mention grammars play that
role: each compiled pattern recovers one entity family from raw turn
text, canonicalization maps surfaces to node keys (canonical.py), and
the shared rule table (rules.py) stamps predicates + lineage — the
GraphBuilder analog (parser/common/graph_builder.go:61-110).

Use as an actor pool so patterns compile once per actor:

    ds.map_batches(TranscriptExtractor, batch_format="pyarrow",
                   batch_size=4096, concurrency=N)
"""

from __future__ import annotations

import re

import pyarrow as pa

from guac_ray.canonical import (
    artifact_key,
    package_key,
    vcs_source_key,
    vuln_key,
)
from guac_ray.schemas import EDGE_SCHEMA, REJECT_SCHEMA, VALID_ROLES
from guac_ray.stages.rules import TurnFacts, derive, edge_cols

__all__ = ["TranscriptExtractor", "RejectRouter", "parse_turn_facts",
           "register_mention_parser", "unregister_mention_parser"]

# §2.11 plugin surface: extra mention parsers run after the built-in
# grammars, mutating TurnFacts in place — the reference's per-type
# DocumentParser registry (parser.go:43-56 RegisterDocumentParser, with
# overwrite-error semantics like collector.go:62-71)
_EXTRA_PARSERS: dict[str, "callable"] = {}


def register_mention_parser(name: str, fn) -> None:
    """``fn(text: str, facts: TurnFacts) -> None`` — appends canonical
    keys to the facts it recognizes. Errors on name conflict."""
    if name in _EXTRA_PARSERS:
        raise ValueError(f"mention parser already registered: {name!r}")
    _EXTRA_PARSERS[name] = fn


def unregister_mention_parser(name: str) -> None:
    _EXTRA_PARSERS.pop(name, None)

_PATTERNS = {
    "artifact": r"\b(sha256|sha1|sha512|md5):([0-9a-fA-F]{32,128})\b",
    "purl": r"\bpkg:[A-Za-z0-9.+-]+/[^\s]+",
    "repo": r"\bgit\+https?://[^\s]+",
    "vuln": r"\b(?:[Cc][Vv][Ee]-\d{4}-\d{4,}|[Gg][Hh][Ss][Aa]-[0-9a-zA-Z]{4}-[0-9a-zA-Z]{4}-[0-9a-zA-Z]{4,})\b",
    "scorecard": r"\bscorecard score (\d+(?:\.\d+)?)/10 for (git\+\S+)",
    # expression runs to the ';' terminator ('.' is inside license names);
    # LicenseRef statements carry their inline text in quotes
    "legal": r"(pkg:\S+) is licensed under ([^;\"]+);",
    "legal_ref": r"(pkg:\S+) is licensed under (LicenseRef-[\w.-]+) "
                 r"where \2 reads \"([^\"]*)\";",
    "slsa": r"artifact ((?:sha256|sha1|sha512|md5):[0-9a-fA-F]+) was built by (https?://\S+)",
    "good": r"\bendorsed: (pkg:\S+)",
    "bad": r"\bflagged: (pkg:\S+)",
    "contact": r"\bcontact ([\w.+-]+@[\w.-]+) for (pkg:\S+)",
    # BOUNDED vuln id (the same grammar as the "vuln" mention pattern):
    # an unbounded \S+ would capture trailing punctuation ('CVE-1-2.'),
    # hanging the vuln_metadata edge off a phantom key disconnected
    # from the mentions_vuln node
    "severity": r"\bseverity (\d+(?:\.\d+)?) for "
                r"((?:[Cc][Vv][Ee]-\d{4}-\d{4,}|"
                r"[Gg][Hh][Ss][Aa]-[0-9a-zA-Z]{4}-[0-9a-zA-Z]{4}-"
                r"[0-9a-zA-Z]{4,}))\b",
    # IsDependency / PkgEqual analogs (SPDX relationship statements →
    # parse_spdx.go:263-304 DEPENDS_ON; assembler.go:181-186 PkgEqual)
    "dep": r"(pkg:[A-Za-z0-9.+-]+/[^\s]+) depends on (pkg:[A-Za-z0-9.+-]+/[^\s]+)",
    "pkg_eq": r"(pkg:[A-Za-z0-9.+-]+/[^\s]+) is the same as (pkg:[A-Za-z0-9.+-]+/[^\s]+)",
}


def _compile():
    return {k: re.compile(v) for k, v in _PATTERNS.items()}


def parse_turn_facts(
    pats: dict[str, re.Pattern],
    conv_id: str,
    turn_idx: int,
    role: str,
    text: str,
    tool: str,
) -> TurnFacts:
    """Raw turn → canonical TurnFacts. Pure; unparseable surfaces are
    silently skipped (the reference logs-and-continues per document —
    parser.go:100-121).

    Cheap substring guards gate each regex scan — most turns contain no
    mentions, and each guard is an order of magnitude cheaper than its
    pattern (same first-match-wins sniffing idea as the reference's
    guesser chain — guesser.go:25-51).
    """
    from guac_ray.canonical import license_key

    f = TurnFacts(conv_id=conv_id, turn_idx=turn_idx, role=role, tool_surface=tool)
    if (
        "sha256:" in text or "sha1:" in text
        or "sha512:" in text or "md5:" in text
    ):
        for alg, digest in pats["artifact"].findall(text):
            f.artifacts.append(artifact_key(alg, digest))
        if " was built by http" in text:
            for raw_art, builder in pats["slsa"].findall(text):
                f.builders.append(builder)
    if "pkg:" in text:
        for raw in pats["purl"].findall(text):
            k = package_key(raw)
            if k:
                f.packages.append(k)
        if " is licensed under " in text:
            from guac_ray.canonical import hash_license, parse_license_expression

            if "LicenseRef-" in text:
                # document-local ref: FNV-hash the inline text
                # (fixLicense — parse_spdx.go:410-432)
                for raw, _ref, inline in pats["legal_ref"].findall(text):
                    pk = package_key(raw)
                    if pk:
                        f.legals.append((pk, license_key(hash_license(inline))))
            # compound SPDX expression → component licenses
            # (ParseLicenses — license.go:72-88); LicenseRef statements
            # carry quotes so the plain pattern cannot reach their ';',
            # but guard anyway
            for raw, exp in pats["legal"].findall(text):
                if "LicenseRef-" in exp:
                    continue
                pk = package_key(raw)
                if pk:
                    for name in parse_license_expression(exp):
                        f.legals.append((pk, license_key(name)))
        if "endorsed: pkg:" in text:
            for raw in pats["good"].findall(text):
                k = package_key(raw)
                if k:
                    f.endorsements.append(("package", k))
        if "flagged: pkg:" in text:
            for raw in pats["bad"].findall(text):
                k = package_key(raw)
                if k:
                    f.flags.append(("package", k))
        if "contact " in text:
            for email, raw in pats["contact"].findall(text):
                f.contacts.append(email)
        if " depends on pkg:" in text:
            for raw_a, raw_b in pats["dep"].findall(text):
                ka, kb = package_key(raw_a), package_key(raw_b)
                if ka and kb and ka != kb:
                    f.dependencies.append((ka, kb))
        if " is the same as pkg:" in text:
            for raw_a, raw_b in pats["pkg_eq"].findall(text):
                ka, kb = package_key(raw_a), package_key(raw_b)
                if ka and kb and ka != kb:
                    f.equal_pkgs.append((ka, kb))
    if "git+" in text:
        for raw in pats["repo"].findall(text):
            k = vcs_source_key(raw)
            if k:
                f.repos.append(k)
        if "scorecard score " in text:
            for score, raw in pats["scorecard"].findall(text):
                k = vcs_source_key(raw)
                if k:
                    f.scorecards.append((k, round(float(score), 1)))
    lower = text.lower()
    if "cve-" in lower or "ghsa-" in lower:
        for raw in pats["vuln"].findall(text):
            f.vulns.append(vuln_key(raw))
        if "severity " in text:
            for score, raw in pats["severity"].findall(text):
                f.severities.append((vuln_key(raw), round(float(score), 1)))
    for extra in _EXTRA_PARSERS.values():
        extra(text, f)
    return f


class TranscriptExtractor:
    """Actor-pool batch UDF: transcript batch (Arrow) → edge batch (Arrow).

    Invalid rows (empty text / unknown role) emit nothing here; route them
    with :class:`RejectRouter`.

    The per-actor ``seen`` cache drops cross-batch duplicate edges before
    they enter the shuffle — with the stable (conv_id, turn_idx) sort
    upstream, a conversation's repeated edges (participates_in, uses_tool,
    has_metadata…) arrive consecutively at one actor, so the cache removes
    most duplicate mass locally (the two-phase combine's partial phase;
    the reference's parser-level maps do the same — parse_spdx.go:41-63).
    Bounded: cleared at ``cache_limit`` to cap memory; correctness never
    depends on it (global dedup happens in assemble).
    """

    def __init__(self, cache_limit: int = 500_000, dedup: bool = True,
                 link_ref=None) -> None:
        self.pats = _compile()
        self.seen: set[tuple] = set()
        self.cache_limit = cache_limit
        self.dedup = dedup
        # fused entity linking: {tool surface: canonical key}, broadcast
        # once via ray.put (None ⇒ identity keys)
        if link_ref is None:
            self.link: dict[str, str] = {}
        else:
            import ray

            self.link = (
                ray.get(link_ref) if isinstance(link_ref, ray.ObjectRef) else dict(link_ref)
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        tidx = batch["turn_idx"].to_pylist()
        role = batch["role"].to_pylist()
        text = batch["text"].to_pylist()
        tool = batch["tool"].to_pylist()
        out: list[tuple] = []
        seen = self.seen
        if len(seen) > self.cache_limit:
            seen.clear()
        for c, ti, r, tx, tl in zip(conv, tidx, role, text, tool):
            if not tx or r not in VALID_ROLES:
                continue
            facts = parse_turn_facts(self.pats, c, ti, r, tx, tl or "")
            if tl and self.link:
                facts.tool_key = self.link.get(tl, "")
            kept = []
            for e in derive(facts):
                if self.dedup:
                    if e in seen:
                        continue
                    seen.add(e)
                kept.append(e)
            # lineage append through the SHARED helper (rules.edge_cols)
            # so the extractor and the fixture generator cannot diverge
            out.extend(edge_cols(kept, c, ti))
        if not out:
            return EDGE_SCHEMA.empty_table()
        cols = list(zip(*out))
        return pa.Table.from_arrays(
            [pa.array(col, type=EDGE_SCHEMA.field(i).type) for i, col in enumerate(cols)],
            schema=EDGE_SCHEMA,
        )


class RejectRouter:
    """Batch UDF: transcript batch → reject rows with a reason column
    (the reference routes invalid docs to error handlers instead of
    crashing — process/process.go:200-207)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        tidx = batch["turn_idx"].to_pylist()
        role = batch["role"].to_pylist()
        text = batch["text"].to_pylist()
        out = []
        for c, ti, r, tx in zip(conv, tidx, role, text):
            if not tx:
                out.append((c, ti, r, tx or "", "empty text"))
            elif r not in VALID_ROLES:
                out.append((c, ti, r, tx, f"invalid role: {r}"))
        if not out:
            return REJECT_SCHEMA.empty_table()
        cols = list(zip(*out))
        return pa.Table.from_arrays(
            [pa.array(col, type=REJECT_SCHEMA.field(i).type) for i, col in enumerate(cols)],
            schema=REJECT_SCHEMA,
        )
