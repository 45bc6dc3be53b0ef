"""Turn-level triple-derivation rules — pure, shared by the fixture
generator (ground truth from known mention specs) and the extractor
(mentions parsed from raw text). Keeping the co-occurrence rules in ONE
place mirrors the reference's single GraphBuilder that stamps predicates
from parsed facts (pkg/ingestor/parser/common/graph_builder.go:61-110);
the tested surface is mention *parsing*, *canonicalization*, *linking*
and *dedup*, not the rule table itself.

Rules (FIXTURES.md §F6 coverage map):
  - every package × artifact in a turn   → is_occurrence
  - every package × repo in a turn       → has_source_at
  - every package × vuln in a turn       → affected_by  (Vex analog)
  - artifact pairs in a turn (sorted)    → hash_equal
  - vuln pairs in a turn (sorted)        → vuln_equal
  - each mention → conversation-level mentions_* edge
  - each package → has_metadata(conversation) ("topLevelPackage" analog,
    reference parser_cyclonedx.go:316-346 stamps topLevelPackage on deps)
  - tool column non-empty                → speaker uses_tool tool
  - turn_idx == 0                        → conversation has_sbom manifest
  - template facts (scorecard, legal, slsa, contact, good/bad, severity)
    → their dedicated predicates
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from itertools import combinations

from guac_ray.canonical import entity_key

__all__ = ["TurnFacts", "derive", "make_edge", "edge_cols",
           "nodes_from_edges"]

JUSTIFICATION = {
    "has_sbom": "conversation manifest",
    "uses_tool": "tool column",
    "mentions_package": "mention in transcript",
    "mentions_artifact": "mention in transcript",
    "mentions_repo": "mention in transcript",
    "mentions_vuln": "mention in transcript",
    "is_occurrence": "package and digest co-mentioned in turn",
    "has_source_at": "package and repo co-mentioned in turn",
    "hash_equal": "digests co-mentioned in turn",
    "vuln_equal": "vulnerability ids co-mentioned in turn",
    "affected_by": "package and vulnerability co-mentioned in turn",
    "certify_scorecard": "scorecard statement in transcript",
    "certify_legal": "license statement in transcript",
    "has_slsa": "build statement in transcript",
    "certify_good": "endorsement in transcript",
    "certify_bad": "flag in transcript",
    "point_of_contact": "contact statement in transcript",
    "vuln_metadata": "severity statement in transcript",
    "has_metadata": "package mentioned in conversation",
    "certify_vuln": "vulnerability scan",
    "participates_in": "turn row",
    "version_of": "package version trie (AllVersions attach)",
    # IsDependency analog (assembler.go:58-63; emitted by the transcript
    # grammar AND the deps.dev-style certifier — origin distinguishes)
    "depends_on": "dependency statement",
    # PkgEqual analog (assembler.go:181-186): sorted pair like hash_equal
    "pkg_equal": "package equivalence statement",
}

ORIGIN = "guac_ray/transcripts"
COLLECTOR = "file-collector"
ENRICH_ORIGIN = "guac_ray/vulndb"
ENRICH_COLLECTOR = "vuln-certifier"
DEP_ORIGIN = "guac_ray/depdb"
DEP_COLLECTOR = "deps-dev-certifier"


@dataclass
class TurnFacts:
    """Canonical mention keys found in (or generated into) one turn."""

    conv_id: str
    turn_idx: int
    role: str
    tool_surface: str = ""                 # raw tool column value
    tool_key: str = ""                     # pre-linked canonical key (optional)
    packages: list[str] = field(default_factory=list)    # canonical purls
    artifacts: list[str] = field(default_factory=list)   # alg:digest keys
    repos: list[str] = field(default_factory=list)       # src: keys
    vulns: list[str] = field(default_factory=list)       # vuln:// keys
    # template facts
    scorecards: list[tuple[str, float]] = field(default_factory=list)  # (src_key, score)
    legals: list[tuple[str, str]] = field(default_factory=list)  # (pkg_key, license_key)
    builders: list[str] = field(default_factory=list)    # builder URIs (pairs w/ artifacts)
    contacts: list[str] = field(default_factory=list)    # emails (pairs w/ pkgs)
    severities: list[tuple[str, float]] = field(default_factory=list)  # (vuln_key, score)
    endorsements: list[tuple[str, str]] = field(default_factory=list)  # (type, key)
    flags: list[tuple[str, str]] = field(default_factory=list)         # (type, key)
    dependencies: list[tuple[str, str]] = field(default_factory=list)  # (pkg, dep)
    equal_pkgs: list[tuple[str, str]] = field(default_factory=list)    # pkg pairs


def make_edge(
    subj_type: str,
    subj_key: str,
    pred: str,
    obj_type: str,
    obj_key: str,
    props: dict | None = None,
    origin: str = ORIGIN,
    collector: str = COLLECTOR,
) -> tuple:
    from guac_ray.sources.docreader import props_json as _pj

    pj = _pj(props)  # ONE props serialization (edge identity keys on it)
    return (
        subj_type,
        subj_key,
        pred,
        obj_type,
        obj_key,
        pj,
        JUSTIFICATION[pred],
        origin,
        collector,
    )


def derive(f: TurnFacts) -> list[tuple]:
    """facts → edges (lineage cols appended by caller).

    Every referenced node appears as an edge endpoint — the speaker
    participates_in edge guarantees it for otherwise-quiet turns — so the
    node table is derived purely from edge endpoints (the reference's bulk
    ingest also materializes nouns from the predicate set —
    pkg/assembler/assembler.go:198-578).
    """
    conv_key = entity_key("conv", f.conv_id)
    speaker_key = entity_key("speaker", f.role)
    edges: list[tuple] = [
        make_edge("speaker", speaker_key, "participates_in", "conversation", conv_key)
    ]

    if f.turn_idx == 0:
        man_key = entity_key("manifest", f.conv_id)
        edges.append(make_edge("conversation", conv_key, "has_sbom", "manifest", man_key))

    if f.tool_surface:
        tool_key = f.tool_key or entity_key("tool", f.tool_surface)
        edges.append(make_edge("speaker", speaker_key, "uses_tool", "tool", tool_key))

    for p in f.packages:
        edges.append(make_edge("conversation", conv_key, "mentions_package", "package", p))
        edges.append(
            make_edge(
                "package", p, "has_metadata", "conversation", conv_key,
                {"key": "conversation", "value": f.conv_id},
            )
        )
        # two-key-forms design (MatchFlags — helpers.go:125-131): a
        # version-level key also materializes its AllVersions (name-level)
        # node via the trie edge; in canonical form '@' appears ONLY as
        # the version separator (names escape it as %40)
        if "@" in p:
            edges.append(make_edge("package", p, "version_of", "package",
                                   p.split("@", 1)[0]))
    for a in f.artifacts:
        edges.append(make_edge("conversation", conv_key, "mentions_artifact", "artifact", a))
    for r in f.repos:
        edges.append(make_edge("conversation", conv_key, "mentions_repo", "source", r))
    for v in f.vulns:
        edges.append(make_edge("conversation", conv_key, "mentions_vuln", "vulnerability", v))

    for p in f.packages:
        for a in f.artifacts:
            edges.append(make_edge("package", p, "is_occurrence", "artifact", a))
        for r in f.repos:
            edges.append(make_edge("package", p, "has_source_at", "source", r))
        for v in f.vulns:
            edges.append(make_edge("package", p, "affected_by", "vulnerability", v))
    for a1, a2 in combinations(sorted(set(f.artifacts)), 2):
        edges.append(make_edge("artifact", a1, "hash_equal", "artifact", a2))
    for v1, v2 in combinations(sorted(set(f.vulns)), 2):
        edges.append(make_edge("vulnerability", v1, "vuln_equal", "vulnerability", v2))

    for src, score in f.scorecards:
        sc_key = f"scorecard:{src}"
        edges.append(
            make_edge("source", src, "certify_scorecard", "scorecard", sc_key,
                      {"score": score})
        )
    # license attaches to the package DECLARING it (subject-specific, not
    # a turn-wide cross product — certifyLegal binds statement→package)
    for pk, lic in f.legals:
        edges.append(make_edge("package", pk, "certify_legal", "license", lic))
    for b in f.builders:
        b_key = entity_key("builder", b)
        for a in f.artifacts:
            edges.append(make_edge("artifact", a, "has_slsa", "builder", b_key))
    for c in f.contacts:
        c_key = entity_key("contact", c)
        for p in f.packages:
            edges.append(make_edge("package", p, "point_of_contact", "contact", c_key))
    for vk, score in f.severities:
        m_key = entity_key("metric", "cvss")
        edges.append(
            make_edge("vulnerability", vk, "vuln_metadata", "metric", m_key,
                      {"score": score})
        )
    for t, k in f.endorsements:
        edges.append(make_edge(t, k, "certify_good", "speaker", speaker_key))
    for t, k in f.flags:
        edges.append(make_edge(t, k, "certify_bad", "speaker", speaker_key))
    # statement-bound (not a turn-wide cross product): each dependency /
    # equivalence pairs exactly the two packages its statement names
    for p, d in f.dependencies:
        edges.append(make_edge("package", p, "depends_on", "package", d))
    for x, y in f.equal_pkgs:
        a, b = sorted((x, y))
        edges.append(make_edge("package", a, "pkg_equal", "package", b))

    return edges


def edge_cols(edges: list[tuple], conv_id: str, turn_idx: int) -> list[tuple]:
    """Append lineage columns to derived edge tuples."""
    return [e + (conv_id, turn_idx) for e in edges]


def nodes_from_edges(edges) -> set[tuple]:
    """(node_type, node_key, attrs) set from edge endpoints."""
    out = set()
    for e in edges:
        out.add((e[0], e[1], "{}"))
        out.add((e[3], e[4], "{}"))
    return out
