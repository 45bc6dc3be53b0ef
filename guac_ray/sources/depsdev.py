"""OSSF Scorecard + deps.dev collector-document parsers.

Ports, field-level:
* ``pkg/ingestor/parser/scorecard/parser_scorecard.go`` — the ossf
  scorecard JSON result (JSONScorecardResultV2): ``repo.name`` splits
  at the LAST '/' into source namespace/name (:90-98), the repo is
  assumed git (:121-123), the scan date parses RFC3339 with the
  scorecard date-only fallback ``YYYY-MM-DD`` (:108-118 — ossf issue
  2711), checks become (name, score) pairs, and one
  ``certify_scorecard`` edge binds the source to its scorecard node.
* ``pkg/ingestor/parser/deps_dev/deps_dev.go`` — the deps.dev
  collector's PackageComponent envelope (handler/collector/deps_dev/
  deps_dev.go:53-66: Go-field-named keys ``CurrentPackage / Source /
  Scorecard / IsDepPackages / DepPackages / UpdateTime`` wrapping
  lowercase-tagged model specs): the top package AND every dep
  package contribute ``has_source_at`` (justification "collected via
  deps.dev", known_since = the component's UpdateTime, name-level
  ALL_VERSIONS match — :95-110) and ``certify_scorecard`` when source
  / scorecard are present (:112-121 — nil-guarded, never fatal), and
  each IsDepPackages entry is one ``depends_on`` edge carrying the
  embedded version range / dependency type (:71-79).

Both register in the content guesser: scorecard documents key on the
``scorecard.version/commit`` block (guesser/type_scorecard.go:25-31),
deps.dev on a ``CurrentPackage`` object (type_deps_dev.go:25-31).
"""

from __future__ import annotations

import json

from guac_ray.canonical import (PackageSpec, SourceSpec, canonical_purl,
                                source_key)

__all__ = ["ScorecardError", "DepsDevError", "parse_scorecard_document",
           "parse_deps_dev_document", "read_scorecard", "read_deps_dev"]

COLLECTOR = "guac_ray/depsdev"


class ScorecardError(ValueError):
    """Malformed scorecard document (callers route to rejects)."""


class DepsDevError(ValueError):
    """Malformed deps.dev document (callers route to rejects)."""


from guac_ray.sources.docreader import props_json as _props  # one copy


_RFC3339 = None  # lazy regex


def _scan_time(date: str) -> str:
    """RFC3339 passthrough, else the scorecard date-only heuristic
    (parser_scorecard.go:108-118) → midnight UTC."""
    global _RFC3339
    if _RFC3339 is None:
        import re
        _RFC3339 = re.compile(
            r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$")
    if _RFC3339.match(date or ""):
        return date
    import re
    if re.match(r"^\d{4}-\d{2}-\d{2}$", date or ""):
        return f"{date}T00:00:00Z"
    raise ScorecardError(f"unparseable scorecard date: {date!r}")


def _split_repo(repo_name: str) -> tuple[str, str]:
    idx = repo_name.rfind("/")
    if idx < 0:
        return "", repo_name
    return repo_name[:idx], repo_name[idx + 1:]


def parse_scorecard_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """One ossf-scorecard JSON result → EDGE_IDENTITY 9-tuples."""
    raw = blob.encode() if isinstance(blob, str) else blob
    try:
        doc = json.loads(raw)
    except (json.JSONDecodeError, UnicodeDecodeError) as ex:
        raise ScorecardError(f"not valid JSON: {ex}") from ex
    if not isinstance(doc, dict):
        raise ScorecardError("scorecard document must be a JSON object")
    sc = doc.get("scorecard") or {}
    if not (sc.get("version") or sc.get("commit")):
        raise ScorecardError("missing scorecard.version/commit block")
    repo = doc.get("repo") or {}
    ns, name = _split_repo(repo.get("name", "") or "")
    src_key = source_key(SourceSpec("git", ns, name,
                                    commit=repo.get("commit", "") or ""))
    checks = {c.get("name", "") or "": int(c.get("score", 0) or 0)
              for c in doc.get("checks", []) or []}
    props = _props({
        "aggregate_score": float(doc.get("score", 0) or 0),
        "checks": checks,
        "scorecard_version": sc.get("version", "") or "",
        "scorecard_commit": sc.get("commit", "") or "",
        "time_scanned": _scan_time(doc.get("date", "") or ""),
    })
    origin = source or repo.get("name", "") or "scorecard"
    return [("source", src_key, "certify_scorecard", "scorecard",
             f"scorecard:{src_key}", props, "ossf scorecard", origin,
             collector)]


# ---------------------------------------------------------------------------
# deps.dev PackageComponent
# ---------------------------------------------------------------------------

def _pkg_key_from_spec(spec: dict | None) -> str | None:
    """model.PkgInputSpec (lowercase json tags) → canonical purl key."""
    if not isinstance(spec, dict) or not spec.get("type") \
            or not spec.get("name"):
        return None
    quals = {q.get("key", ""): q.get("value", "")
             for q in spec.get("qualifiers") or [] if q.get("key")}
    return canonical_purl(PackageSpec(
        spec["type"], spec.get("namespace") or "", spec["name"],
        spec.get("version") or "", quals, spec.get("subpath") or ""))


def _src_key_from_spec(spec: dict | None) -> str | None:
    if not isinstance(spec, dict) or not spec.get("type") \
            or not spec.get("name"):
        return None
    return source_key(SourceSpec(
        spec["type"], spec.get("namespace") or "", spec["name"],
        spec.get("tag") or "", spec.get("commit") or ""))


def _scorecard_props_from_spec(spec: dict) -> dict:
    return {
        "aggregate_score": float(spec.get("aggregateScore", 0) or 0),
        "checks": {c.get("check", "") or "": int(c.get("score", 0) or 0)
                   for c in spec.get("checks") or []},
        "scorecard_version": spec.get("scorecardVersion", "") or "",
        "scorecard_commit": spec.get("scorecardCommit", "") or "",
        "time_scanned": spec.get("timeScanned", "") or "",
    }


def _component_edges(comp: dict, origin: str, collector: str,
                     edges: list[tuple]) -> None:
    """appendPredicates (deps_dev.go:85-96): has_source_at when both
    package and source exist, certify_scorecard when both source and
    scorecard exist."""
    pk = _pkg_key_from_spec(comp.get("CurrentPackage"))
    sk = _src_key_from_spec(comp.get("Source"))
    update_time = comp.get("UpdateTime", "") or ""
    if pk and sk:
        edges.append(("package", pk, "has_source_at", "source", sk,
                      _props({"known_since": update_time,
                              "pkg_match": "ALL_VERSIONS"}),
                      "collected via deps.dev", origin, collector))
    scd = comp.get("Scorecard")
    if sk and isinstance(scd, dict):
        edges.append(("source", sk, "certify_scorecard", "scorecard",
                      f"scorecard:{sk}",
                      _props(_scorecard_props_from_spec(scd)),
                      "collected via deps.dev", origin, collector))


def parse_deps_dev_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """One deps.dev PackageComponent JSON → EDGE_IDENTITY 9-tuples."""
    raw = blob.encode() if isinstance(blob, str) else blob
    try:
        doc = json.loads(raw)
    except (json.JSONDecodeError, UnicodeDecodeError) as ex:
        raise DepsDevError(f"not valid JSON: {ex}") from ex
    if not isinstance(doc, dict) \
            or not isinstance(doc.get("CurrentPackage"), dict):
        raise DepsDevError("missing CurrentPackage component")
    origin = source or "deps.dev"

    edges: list[tuple] = []
    _component_edges(doc, origin, collector, edges)
    for dep in doc.get("DepPackages") or []:
        if isinstance(dep, dict):
            _component_edges(dep, origin, collector, edges)
    for idp in doc.get("IsDepPackages") or []:
        if not isinstance(idp, dict):
            continue
        cur = _pkg_key_from_spec(idp.get("CurrentPackageInput"))
        dep = _pkg_key_from_spec(idp.get("DepPackageInput"))
        if not cur or not dep:
            raise DepsDevError("IsDepPackages entry missing package input")
        spec = idp.get("IsDependency") or {}
        edges.append(("package", cur, "depends_on", "package", dep,
                      _props({"version_range":
                                  spec.get("versionRange", "") or "",
                              "dependency_type":
                                  spec.get("dependencyType", "") or "UNKNOWN",
                              "pkg_match": "ALL_VERSIONS"}),
                      spec.get("justification", "") or
                      "dependency collected via deps.dev",
                      origin, collector))
    return edges


from guac_ray.sources.spdx import register_document_parser  # noqa: E402

register_document_parser("scorecard", parse_scorecard_document)
register_document_parser("deps-dev", parse_deps_dev_document)


def read_scorecard(paths: str | list[str], strict: bool = False):
    """Scorecard JSON files → Dataset of EDGE_IDENTITY rows."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_scorecard_document,
                               ScorecardError, strict=strict, batch_size=32)


def read_deps_dev(paths: str | list[str], strict: bool = False):
    """deps.dev PackageComponent files → Dataset of EDGE_IDENTITY rows."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_deps_dev_document, DepsDevError,
                               strict=strict, batch_size=32)
