"""IngestPredicates JSON documents — the reference's trusted triple
import (pkg/ingestor/parser/ingest_predicates/parser_ingest_predicates.go
+ guesser/type_ingest_predicates.go: a JSON object in the
assembler.IngestPredicates shape — assembler.go:33-51 — whose 17
per-family lists carry PRE-DERIVED GraphQL input specs that bypass
extraction entirely).

This parser re-expresses each family into the long edge schema with
the same canonical keys the per-format parsers emit, so a trusted
import and a fresh parse of the same facts collapse in the assemble
dedup (full-payload identity). Family → edge mapping follows
schemas.PREDICATES; the subject of the pkg|src|artifact union
families is whichever spec is present (the backends require exactly
one — nodes missing every subject are document errors, matching the
reference backend's ingestion failure).

Note ``hasSlsa`` entries use Go's DEFAULT (capitalized) field names —
assembler.go:76-80 tags are bare ``json:",omitempty"`` — so lookups
here are case-insensitive like encoding/json.

Engine-native trusted import of Parquet edge rows (the fast path at
scale) lives in pipelines/kg.py ``ingest_predicates``; this module is
the JSON-document compatibility route through the content guesser.
"""

from __future__ import annotations

import json

from guac_ray.canonical import (NO_VULN_KEY, PackageSpec, SourceSpec,
                                artifact_key, canonical_purl, entity_key,
                                hash_license, license_key, sanitize,
                                source_key)
from guac_ray.sources.ite6 import _get

__all__ = ["IngestPredicatesError", "parse_ingest_predicates_document",
           "read_ingest_predicates"]

COLLECTOR = "guac_ray/ingest_predicates"

_FAMILIES = ("certifyScorecard", "isDependency", "isOccurrence", "hasSlsa",
             "certifyVuln", "vulnEqual", "hasSourceAt", "certifyBad",
             "certifyGood", "hasSBOM", "hashEqual", "pkgEqual", "vex",
             "contact", "vulnMetadata", "hasMetadata", "certifyLegal")


class IngestPredicatesError(ValueError):
    """Malformed IngestPredicates document (callers route to rejects)."""


from guac_ray.sources.docreader import props_json as _props  # one copy


def _pkg(spec) -> str | None:
    if not isinstance(spec, dict):
        return None
    t, n = _get(spec, "type"), _get(spec, "name")
    if not t or not n:
        return None
    quals = {q.get("key", ""): q.get("value", "")
             for q in _get(spec, "qualifiers") or [] if q.get("key")}
    return canonical_purl(PackageSpec(t, _get(spec, "namespace") or "", n,
                                      _get(spec, "version") or "", quals,
                                      _get(spec, "subpath") or ""))


def _src(spec) -> str | None:
    if not isinstance(spec, dict):
        return None
    t, n = _get(spec, "type"), _get(spec, "name")
    if not t or not n:
        return None
    return source_key(SourceSpec(t, _get(spec, "namespace") or "", n,
                                 _get(spec, "tag") or "",
                                 _get(spec, "commit") or ""))


def _art(spec) -> str | None:
    if not isinstance(spec, dict) or not _get(spec, "algorithm"):
        return None
    return artifact_key(_get(spec, "algorithm"), _get(spec, "digest") or "")


def _vuln(spec) -> str | None:
    if not isinstance(spec, dict):
        return None
    t = (_get(spec, "type") or "").strip().lower()
    vid = (_get(spec, "vulnerabilityID") or "").strip().lower()
    if not t:
        return None
    if t == "novuln":
        return NO_VULN_KEY
    return f"vuln://{t}/{sanitize(vid)}"


def _lic(spec) -> str | None:
    if not isinstance(spec, dict):
        return None
    name = _get(spec, "name") or ""
    inline = _get(spec, "inline")
    if name.startswith("LicenseRef-") and inline:
        name = hash_license(inline)
    if not name:
        return None
    return license_key(name, _get(spec, "listVersion") or "")


def _subject(entry) -> tuple[str, str] | None:
    """pkg | src | artifact union subject (first present wins)."""
    pk = _pkg(_get(entry, "pkg"))
    if pk:
        return "package", pk
    sk = _src(_get(entry, "src"))
    if sk:
        return "source", sk
    ak = _art(_get(entry, "artifact"))
    if ak:
        return "artifact", ak
    return None


def parse_ingest_predicates_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """One IngestPredicates JSON → EDGE_IDENTITY 9-tuples."""
    raw = blob.encode() if isinstance(blob, str) else blob
    try:
        doc = json.loads(raw)
    except (json.JSONDecodeError, UnicodeDecodeError) as ex:
        raise IngestPredicatesError(f"not valid JSON: {ex}") from ex
    if not isinstance(doc, dict) or not any(doc.get(f) for f in _FAMILIES):
        raise IngestPredicatesError("no IngestPredicates families present")
    origin = source or "ingest_predicates"
    edges: list[tuple] = []

    def emit(st, sk, pred, ot, ok, props, just):
        edges.append((st, sk, pred, ot, ok, _props(props),
                      just or "ingest_predicates", origin, collector))

    def fam(name):
        lst = doc.get(name)
        if not isinstance(lst, list):
            return
        for e in lst:
            if isinstance(e, dict):
                yield e

    for e in fam("certifyScorecard"):
        sk = _src(_get(e, "source"))
        sc = _get(e, "scorecard")
        if not sk or not isinstance(sc, dict):
            raise IngestPredicatesError("certifyScorecard needs source+scorecard")
        emit("source", sk, "certify_scorecard", "scorecard",
             f"scorecard:{sk}",
             {"aggregate_score": float(_get(sc, "aggregateScore") or 0),
              "checks": {c.get("check", ""): int(c.get("score", 0) or 0)
                         for c in _get(sc, "checks") or []},
              "scorecard_version": _get(sc, "scorecardVersion") or "",
              "scorecard_commit": _get(sc, "scorecardCommit") or "",
              "time_scanned": _get(sc, "timeScanned") or ""}, "")

    for e in fam("isDependency"):
        pk, dk = _pkg(_get(e, "pkg")), _pkg(_get(e, "depPkg"))
        if not pk or not dk:
            raise IngestPredicatesError("isDependency needs pkg+depPkg")
        spec = _get(e, "isDependency") or {}
        emit("package", pk, "depends_on", "package", dk,
             {"version_range": _get(spec, "versionRange") or "",
              "dependency_type": _get(spec, "dependencyType") or "UNKNOWN"},
             _get(spec, "justification"))

    for e in fam("isOccurrence"):
        sub = _subject(e)
        ak = _art(_get(e, "artifact"))
        if sub is None or not ak or sub[0] == "artifact":
            raise IngestPredicatesError("isOccurrence needs pkg|src + artifact")
        spec = _get(e, "isOccurrence") or {}
        emit(sub[0], sub[1], "is_occurrence", "artifact", ak, {},
             _get(spec, "justification"))

    for e in fam("hasSlsa"):  # capitalized Go-default field names
        ak = _art(_get(e, "Artifact"))
        slsa = _get(e, "HasSlsa") or {}
        builder = _get(e, "Builder") or {}
        if not ak:
            raise IngestPredicatesError("hasSlsa needs an artifact subject")
        mats = sorted(filter(None, (_art(m) for m in
                                    _get(e, "Materials") or [])))
        emit("artifact", ak, "has_slsa", "builder",
             entity_key("builder", _get(builder, "uri") or ""),
             {"slsa_version": _get(slsa, "slsaVersion") or "",
              "build_type": _get(slsa, "buildType") or "",
              "started_on": _get(slsa, "startedOn") or "",
              "finished_on": _get(slsa, "finishedOn") or "",
              "slsa_predicate": {p.get("key", ""): p.get("value", "")
                                 for p in _get(slsa, "slsaPredicate") or []},
              "materials": mats,
              "builder_uri": _get(builder, "uri") or ""},
             "ite6 slsa provenance")

    for e in fam("certifyVuln"):
        pk, vk = _pkg(_get(e, "pkg")), _vuln(_get(e, "vulnerability"))
        if not pk or not vk:
            raise IngestPredicatesError("certifyVuln needs pkg+vulnerability")
        vd = _get(e, "vulnData") or {}
        emit("package", pk, "certify_vuln", "vulnerability", vk,
             {"time_scanned": _get(vd, "timeScanned") or "",
              "db_uri": _get(vd, "dbUri") or "",
              "db_version": _get(vd, "dbVersion") or "",
              "scanner_uri": _get(vd, "scannerUri") or "",
              "scanner_version": _get(vd, "scannerVersion") or ""}, "")

    for e in fam("vulnEqual"):
        a = _vuln(_get(e, "vulnerability"))
        b = _vuln(_get(e, "equalVulnerability"))
        if not a or not b:
            raise IngestPredicatesError("vulnEqual needs two vulnerabilities")
        emit("vulnerability", a, "vuln_equal", "vulnerability", b, {},
             _get(_get(e, "vulnEqual") or {}, "justification"))

    for e in fam("hasSourceAt"):
        pk, sk = _pkg(_get(e, "pkg")), _src(_get(e, "src"))
        if not pk or not sk:
            raise IngestPredicatesError("hasSourceAt needs pkg+src")
        spec = _get(e, "hasSourceAt") or {}
        emit("package", pk, "has_source_at", "source", sk,
             {"known_since": _get(spec, "knownSince") or ""},
             _get(spec, "justification"))

    for pred, field in (("certify_bad", "certifyBad"),
                        ("certify_good", "certifyGood")):
        for e in fam(field):
            sub = _subject(e)
            if sub is None:
                raise IngestPredicatesError(f"{field} needs a subject")
            spec = _get(e, field) or {}
            just = _get(spec, "justification") or ""
            emit(sub[0], sub[1], pred, "statement",
                 entity_key("statement", just or field),
                 {"known_since": _get(spec, "knownSince") or ""}, just)

    for e in fam("hasSBOM"):
        sub = _subject(e)
        if sub is None or sub[0] == "source":
            raise IngestPredicatesError("hasSBOM needs pkg|artifact")
        spec = _get(e, "hasSbom") or {}
        uri = _get(spec, "uri") or ""
        key = uri or artifact_key(_get(spec, "algorithm") or "sha256",
                                  _get(spec, "digest") or "")
        emit(sub[0], sub[1], "has_sbom", "manifest", key,
             {"algorithm": _get(spec, "algorithm") or "",
              "digest": _get(spec, "digest") or "",
              "download_location": _get(spec, "downloadLocation") or "",
              "known_since": _get(spec, "knownSince") or ""}, "")

    for e in fam("hashEqual"):
        a, b = _art(_get(e, "artifact")), _art(_get(e, "equalArtifact"))
        if not a or not b:
            raise IngestPredicatesError("hashEqual needs two artifacts")
        emit("artifact", a, "hash_equal", "artifact", b, {},
             _get(_get(e, "hashEqual") or {}, "justification"))

    for e in fam("pkgEqual"):
        a, b = _pkg(_get(e, "pkg")), _pkg(_get(e, "equalPkg"))
        if not a or not b:
            raise IngestPredicatesError("pkgEqual needs two packages")
        emit("package", a, "pkg_equal", "package", b, {},
             _get(_get(e, "pkgEqual") or {}, "justification"))

    for e in fam("vex"):
        sub = _subject(e)
        vk = _vuln(_get(e, "vulnerability"))
        if sub is None or sub[0] == "source" or not vk:
            raise IngestPredicatesError("vex needs pkg|artifact + vulnerability")
        spec = _get(e, "vexData") or {}
        emit(sub[0], sub[1], "affected_by", "vulnerability", vk,
             {"status": _get(spec, "status") or "",
              "vex_justification": _get(spec, "vexJustification") or "",
              "statement": _get(spec, "statement") or "",
              "status_notes": _get(spec, "statusNotes") or "",
              "known_since": _get(spec, "knownSince") or ""},
             "ingested vex statement")

    for e in fam("contact"):
        sub = _subject(e)
        if sub is None:
            raise IngestPredicatesError("contact needs a subject")
        spec = _get(e, "pointOfContact") or {}
        who = _get(spec, "email") or _get(spec, "info") or "unknown"
        emit(sub[0], sub[1], "point_of_contact", "contact",
             entity_key("contact", who),
             {"email": _get(spec, "email") or "",
              "info": _get(spec, "info") or "",
              "since": _get(spec, "since") or ""},
             _get(spec, "justification"))

    for e in fam("vulnMetadata"):
        vk = _vuln(_get(e, "vulnerability"))
        spec = _get(e, "vulnData") or {}
        if not vk or vk == NO_VULN_KEY:
            raise IngestPredicatesError("vulnMetadata needs a vulnerability")
        st = _get(spec, "scoreType") or ""
        emit("vulnerability", vk, "vuln_metadata", "metric",
             entity_key("metric", st or "unknown"),
             {"score_type": st,
              "score_value": float(_get(spec, "scoreValue") or 0),
              "timestamp": _get(spec, "timestamp") or ""}, "")

    for e in fam("hasMetadata"):
        sub = _subject(e)
        if sub is None:
            raise IngestPredicatesError("hasMetadata needs a subject")
        spec = _get(e, "hasMetadata") or {}
        k, v = _get(spec, "key") or "", _get(spec, "value") or ""
        emit(sub[0], sub[1], "has_metadata", "metadata", f"{k}:{v}",
             {"key": k, "value": v,
              "timestamp": _get(spec, "timestamp") or ""},
             _get(spec, "justification"))

    for e in fam("certifyLegal"):
        sub = _subject(e)
        if sub is None or sub[0] == "artifact":
            raise IngestPredicatesError("certifyLegal needs pkg|src")
        spec = _get(e, "certifyLegal") or {}
        for role, field in (("declared", "declared"),
                            ("discovered", "discovered")):
            for lic in _get(e, field) or []:
                lk = _lic(lic)
                if not lk:
                    continue
                emit(sub[0], sub[1], "certify_legal", "license", lk,
                     {"role": role,
                      "declared_license": _get(spec, "declaredLicense") or "",
                      "discovered_license":
                          _get(spec, "discoveredLicense") or "",
                      "attribution": _get(spec, "attribution") or "",
                      "time_scanned": _get(spec, "timeScanned") or ""},
                     _get(spec, "justification"))

    return edges


from guac_ray.sources.spdx import register_document_parser  # noqa: E402

register_document_parser("ingest-predicates", parse_ingest_predicates_document)


def read_ingest_predicates(paths: str | list[str], strict: bool = False):
    """IngestPredicates JSON files → Dataset of EDGE_IDENTITY rows."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_ingest_predicates_document,
                               IngestPredicatesError, strict=strict,
                               batch_size=16)
