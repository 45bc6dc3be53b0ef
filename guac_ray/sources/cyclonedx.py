"""CycloneDX (JSON) SBOM reader → edge rows — the second real-format
parser plugin (reference: pkg/ingestor/parser/cyclonedx/
parser_cyclonedx.go), sibling of :mod:`guac_ray.sources.spdx`.

Semantics ported (file:line provenance):

* ``metadata.component`` is REQUIRED (guac issue #976 —
  parser_cyclonedx.go:142-146); its purl (or the synthesized one, see
  below) is the single top-level package.
* purl synthesis when ``packageURL`` is empty —
  parser_cyclonedx.go:108-121 / 184-193 and the two helpers at
  :503-543:
  - container components: image name split into registry/repo:tag —
    ``parseContainerType`` (:149-174): up to three path segments form
    the repository URL, a trailing ``:tag`` becomes the ``?tag=``
    qualifier; top-level containers use the ``pkg:guac/cdx/``
    namespace, nested ones ``pkg:guac/pkg/``.
  - file components: a ``version`` of the form ``alg:digest`` becomes
    ``pkg:guac/files/alg:digest#name`` (top level:
    ``pkg:guac/cdx/alg:digest#name``); otherwise the bare name purl.
  - anything else: ``pkg:guac/pkg/<name>[@version]`` (top:
    ``pkg:guac/cdx/…``).
* components of type ``operating-system`` are SKIPPED entirely —
  parser_cyclonedx.go:179-182.
* component hashes → artifacts; is_occurrence per (package, artifact)
  with justification "cdx package with checksum" — :292-304.
* the top-level package unconditionally links to EVERY component
  (``CreateTopLevelIsDeps`` with the heuristic justification) — the
  reference's own TODO notes this predates real dependency
  relationships (:247-252) — plus has_sbom (uri = BOM serialNumber,
  sha256 of the raw blob, ``metadata.timestamp`` or the zero time) and
  a "CycloneDX top level package self reference" has_metadata row.
* the ``dependencies`` graph adds one depends_on edge per
  (ref → dependsOn) pair where BOTH refs resolve and the ref is not
  the top-level package ("CDX BOM Dependency"), and a
  "CycloneDX top level package reference" has_metadata row per
  dependent — :309-346.
* ``vulnerabilities`` → VEX: analysis.state maps through
  vexStatusMap (:44-49; unknown state = document error), justification
  through justificationsMap (:51-54; default NOT_PROVIDED), statement
  = analysis.detail else comma-joined analysis.response, status_notes
  = "STATUS:JUSTIFICATION"; affects refs are ``urn#identifier`` where
  the identifier is either a purl or a name resolved against the
  ``versions`` list (range entries skipped, empty version = error) —
  getAffectedPackages:441-495.  AFFECTED / UNDER_INVESTIGATION
  additionally emit certify_vuln; every rating emits vuln_metadata
  (score type = the rating's method verbatim) — :352-438.
  DIVERGENCE: has_metadata timestamps use the BOM timestamp, not
  wall clock (replay stability), as in the SPDX reader.

Scale shape: identical to the SPDX reader — documents parse as units,
``read_cyclonedx`` is a shuffle-free flat-map over a path table, and
``cdx_ingest`` flows into the standard full-identity assemble dedup.
"""

from __future__ import annotations

import hashlib
import json

from guac_ray.canonical import (artifact_key, entity_key, package_key,
                                sanitize, vuln_key)

__all__ = ["CdxError", "parse_cyclonedx_document", "read_cyclonedx",
           "cdx_ingest"]

COLLECTOR = "guac_ray/cdx"
_ZERO_TIME = "1970-01-01T00:00:00Z"

# parser_cyclonedx.go:44-49
_VEX_STATUS = {
    "resolved": "FIXED",
    "exploitable": "AFFECTED",
    "in_triage": "UNDER_INVESTIGATION",
    "not_affected": "NOT_AFFECTED",
}
# parser_cyclonedx.go:51-54
_VEX_JUSTIFICATION = {
    "code_not_present": "VULNERABLE_CODE_NOT_PRESENT",
    "code_not_reachable": "VULNERABLE_CODE_NOT_IN_EXECUTE_PATH",
}


class CdxError(ValueError):
    """Malformed CycloneDX document (callers route to rejects)."""


from guac_ray.sources.docreader import props_json as _props  # one copy


def _san(name: str) -> str:
    """SanitizeString analog: escape each path segment, keep '/'."""
    return "/".join(sanitize(p) for p in name.split("/"))


def _cdx_pkg_purl(name: str, version: str, tag: str, top: bool) -> str:
    """guacCDXPkgPurl (parser_cyclonedx.go:523-543)."""
    base = ("pkg:guac/cdx/" if top else "pkg:guac/pkg/") + _san(name)
    if version and tag:
        return f"{base}@{version}?tag={tag}"
    if version:
        return f"{base}@{version}"
    if tag:
        return f"{base}?tag={tag}"
    return base


def _cdx_file_purl(name: str, version: str, top: bool) -> str:
    """guacCDXFilePurl (parser_cyclonedx.go:503-521): an ``alg:digest``
    version keys the file by content, the name rides in the subpath."""
    esc = _san(name)
    sv = version.split(":") if version else []
    if len(sv) == 2:
        base = "pkg:guac/cdx/" if top else "pkg:guac/files/"
        return f"{base}{sv[0].lower()}:{sv[1]}#{esc}"
    return ("pkg:guac/cdx/" if top else "pkg:guac/files/") + esc


def _container_purl(name: str, version: str, top: bool) -> str:
    """parseContainerType (parser_cyclonedx.go:149-174)."""
    split_image = name.split("/")
    split_tag = split_image[-1].split(":")
    if len(split_image) == 3:
        repo = f"{split_image[0]}/{split_image[1]}/{split_tag[0]}"
    elif len(split_image) == 2:
        repo = f"{split_image[0]}/{split_tag[0]}"
    elif len(split_image) == 1:
        repo = split_image[0]
    else:
        repo = ""
    tag = split_tag[1] if len(split_tag) == 2 else ""
    return _cdx_pkg_purl(repo or name, version, tag, top)


def _component_purl(comp: dict, top: bool) -> str:
    purl = comp.get("purl", "") or ""
    if purl:
        return purl
    name = comp.get("name", "") or ""
    version = comp.get("version", "") or ""
    ctype = comp.get("type", "")
    if ctype == "container":
        return _container_purl(name, version, top)
    if ctype == "file":
        return _cdx_file_purl(name, version, top)
    if top:
        return _cdx_pkg_purl(name, version, "", True)
    # GuacPkgPurl analog for nested components (purl.go:211-217)
    base = "pkg:guac/pkg/" + _san(name)
    return f"{base}@{sanitize(version)}" if version else base


def _timestamp(doc: dict) -> str:
    ts = (doc.get("metadata") or {}).get("timestamp", "") or ""
    if not ts:
        return _ZERO_TIME
    from datetime import datetime

    try:
        datetime.fromisoformat(ts.replace("Z", "+00:00"))
    except ValueError as ex:
        raise CdxError(f"invalid metadata timestamp {ts!r}") from ex
    return ts


def _lname(el) -> str:
    return el.tag.rsplit("}", 1)[-1]


def _xml_text(el, name: str) -> str:
    for ch in el:
        if _lname(ch) == name:
            return (ch.text or "").strip()
    return ""


def _xml_child(el, name: str):
    for ch in el:
        if _lname(ch) == name:
            return ch
    return None


def _xml_comp(el) -> dict:
    comp = {"bom-ref": el.get("bom-ref", ""), "type": el.get("type", "")}
    for f in ("name", "version", "purl"):
        v = _xml_text(el, f)
        if v:
            comp[f] = v
    hs = _xml_child(el, "hashes")
    if hs is not None:
        comp["hashes"] = [{"alg": h.get("alg", ""),
                           "content": (h.text or "").strip()}
                          for h in hs if _lname(h) == "hash"]
    return comp


def cyclonedx_xml_to_dict(raw: bytes) -> dict:
    """CycloneDX XML → the JSON BOM dict shape ``parse_cyclonedx_document``
    consumes (the reference routes FormatXML through the same cyclonedx-go
    BOM struct — parser_cyclonedx.go:219-230; this converter covers the
    fields the parser reads: metadata.component / components / hashes /
    dependencies / vulnerabilities incl. analysis, affects targets,
    versions and ratings). Namespace-agnostic across schema versions."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(raw)
    except ET.ParseError as ex:
        raise CdxError(f"not valid XML: {ex}") from ex
    if _lname(root) != "bom":
        raise CdxError(f"not a CycloneDX BOM element: {root.tag!r}")
    doc: dict = {"bomFormat": "CycloneDX"}
    if root.get("serialNumber"):
        doc["serialNumber"] = root.get("serialNumber")
    md = _xml_child(root, "metadata")
    if md is not None:
        meta: dict = {}
        if _xml_text(md, "timestamp"):
            meta["timestamp"] = _xml_text(md, "timestamp")
        tc = _xml_child(md, "component")
        if tc is not None:
            meta["component"] = _xml_comp(tc)
        doc["metadata"] = meta
    comps = _xml_child(root, "components")
    if comps is not None:
        doc["components"] = [_xml_comp(c) for c in comps
                             if _lname(c) == "component"]
    deps = _xml_child(root, "dependencies")
    if deps is not None:
        doc["dependencies"] = [
            {"ref": d.get("ref", ""),
             "dependsOn": [x.get("ref", "") for x in d
                           if _lname(x) == "dependency"]}
            for d in deps if _lname(d) == "dependency"]
    vulns = _xml_child(root, "vulnerabilities")
    if vulns is not None:
        out = []
        for v in vulns:
            if _lname(v) != "vulnerability":
                continue
            jv: dict = {"id": _xml_text(v, "id")}
            if _xml_text(v, "published"):
                jv["published"] = _xml_text(v, "published")
            an = _xml_child(v, "analysis")
            if an is not None:
                ja = {"state": _xml_text(an, "state"),
                      "justification": _xml_text(an, "justification"),
                      "detail": _xml_text(an, "detail")}
                resp = _xml_child(an, "responses")
                if resp is not None:
                    ja["response"] = [(r.text or "").strip() for r in resp
                                      if _lname(r) == "response"]
                jv["analysis"] = ja
            aff = _xml_child(v, "affects")
            if aff is not None:
                ta = []
                for t in aff:
                    if _lname(t) != "target":
                        continue
                    entry: dict = {"ref": _xml_text(t, "ref")}
                    vers = _xml_child(t, "versions")
                    if vers is not None:
                        entry["versions"] = [
                            {"version": _xml_text(w, "version"),
                             "range": _xml_text(w, "range")}
                            for w in vers if _lname(w) == "version"]
                    ta.append(entry)
                jv["affects"] = ta
            rats = _xml_child(v, "ratings")
            if rats is not None:
                jr = []
                for r in rats:
                    if _lname(r) != "rating":
                        continue
                    entry = {"method": _xml_text(r, "method")}
                    if _xml_text(r, "score"):
                        try:
                            entry["score"] = float(_xml_text(r, "score"))
                        except ValueError as ex:
                            # must surface as CdxError so the non-strict
                            # read's reject route catches it
                            raise CdxError(
                                f"bad rating score: {ex}") from ex
                    jr.append(entry)
                jv["ratings"] = jr
            out.append(jv)
        doc["vulnerabilities"] = out
    return doc


def parse_cyclonedx_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """One CycloneDX blob (JSON, or XML via the same field mapping) →
    EDGE_IDENTITY 9-tuples."""
    raw = blob.encode() if isinstance(blob, str) else blob
    if raw.lstrip()[:1] == b"<":
        doc = cyclonedx_xml_to_dict(raw)
    else:
        try:
            doc = json.loads(raw)
        except json.JSONDecodeError as ex:
            raise CdxError(f"not valid JSON: {ex}") from ex
    if not isinstance(doc, dict):
        # a top-level JSON array would AttributeError past the reject
        # route (report-not-crash: the error CLASS is the contract)
        raise CdxError("CycloneDX document must be a JSON object")
    # metadata ABSENT → a VEX-only BOM with no top-level package (the
    # reference's unaffected-vex fixture parses fine —
    # getTopLevelPackage:106-108 returns early); metadata PRESENT but
    # component missing → error (guac issue #976, :142-146)
    meta = doc.get("metadata")
    if meta is not None and not isinstance(meta, dict):
        raise CdxError("CycloneDX metadata must be a JSON object")
    top_comp = meta.get("component") if meta is not None else None
    if meta is not None and not top_comp:
        raise CdxError(
            "CycloneDX metadata.component is required (guac issue #976)")
    ts = _timestamp(doc)
    origin = source or doc.get("serialNumber", "") or "cyclonedx"

    def edge(st, sk, pred, ot, ok, props, just):
        return (st, sk, pred, ot, ok, _props(props), just, origin, collector)

    # ---- packages per BOM ref (top + components) ----
    pkg_keys: dict[str, list[str]] = {}
    pkg_arts: dict[str, list[str]] = {}

    def add(ref: str, comp: dict, top: bool) -> str | None:
        k = package_key(_component_purl(comp, top))
        if k is None:
            return None
        pkg_keys.setdefault(ref, []).append(k)
        for h in comp.get("hashes", []) or []:
            if h.get("content"):
                pkg_arts.setdefault(ref, []).append(
                    artifact_key(h.get("alg", ""), h["content"]))
        return k

    top_key = None
    if top_comp:
        top_ref = top_comp.get("bom-ref", "") or ""
        top_key = add(top_ref, top_comp, top=True)
        if top_key is None:
            raise CdxError("unparseable top-level component purl")
    for comp in doc.get("components", []) or []:
        # operating-system components carry no purl identity — skipped
        # (parser_cyclonedx.go:179-182)
        if comp.get("type") == "operating-system":
            continue
        add(comp.get("bom-ref", "") or "", comp, top=False)

    edges: list[tuple] = []

    # ---- has_sbom + self-reference metadata + top-level fan-out ----
    if top_key is not None:
        edges.append(edge(
            "package", top_key, "has_sbom", "manifest",
            doc.get("serialNumber", "") or "",
            {"algorithm": "sha256", "digest": hashlib.sha256(raw).hexdigest(),
             "download_location": source, "known_since": ts,
             "uri": doc.get("serialNumber", "") or ""},
            "cdx document manifest"))
        edges.append(edge(
            "package", top_key, "has_metadata", "metadata",
            f"topLevelPackage:{top_key}",
            {"key": "topLevelPackage", "value": top_key, "timestamp": ts},
            "CycloneDX top level package self reference"))
        just_top = ("top-level package GUAC heuristic connecting to each "
                    "file/package")
        for ref, keys in pkg_keys.items():
            for k in keys:
                if k != top_key:
                    edges.append(edge(
                        "package", top_key, "depends_on", "package", k,
                        {"dependency_type": "UNKNOWN"}, just_top))

    # ---- is_occurrence ----
    for ref, arts in pkg_arts.items():
        for k in pkg_keys.get(ref, []):
            for a in arts:
                edges.append(edge("package", k, "is_occurrence",
                                  "artifact", a, {},
                                  "cdx package with checksum"))

    # ---- explicit dependency graph — parser_cyclonedx.go:309-346 ----
    for dep in doc.get("dependencies", []) or []:
        cur = pkg_keys.get(dep.get("ref", ""))
        if not cur:
            continue
        for dref in dep.get("dependsOn", []) or []:
            dks = pkg_keys.get(dref)
            if not dks:
                continue
            for ck in cur:
                if cur != [top_key]:
                    # GetIsDep over package nodes: first dep only
                    edges.append(edge("package", ck, "depends_on",
                                      "package", dks[0],
                                      {"dependency_type": "UNKNOWN"},
                                      "CDX BOM Dependency"))
                if top_key is None:
                    continue  # no toplevel → no reference rows (nil loop)
                for dk in dks:
                    edges.append(edge(
                        "package", dk, "has_metadata", "metadata",
                        f"topLevelPackage:{top_key}",
                        {"key": "topLevelPackage", "value": top_key,
                         "timestamp": ts},
                        "CycloneDX top level package reference"))

    # ---- vulnerabilities → vex / certify_vuln / vuln_metadata ----
    for vuln in doc.get("vulnerabilities", []) or []:
        vid = vuln.get("id", "")
        if "-" not in vid:
            raise CdxError(f"malformed vulnerability identifier: {vid!r}")
        vk = vuln_key(vid)
        analysis = vuln.get("analysis") or {}
        state = analysis.get("state", "")
        if state not in _VEX_STATUS:
            raise CdxError(f"unknown vulnerability status {state!r}")
        status = _VEX_STATUS[state]
        justification = _VEX_JUSTIFICATION.get(
            analysis.get("justification", ""), "NOT_PROVIDED")
        published = vuln.get("published", "") or _ZERO_TIME
        statement = analysis.get("detail", "") or ",".join(
            analysis.get("response", []) or [])
        vex_props = {"status": status, "vex_justification": justification,
                     "known_since": published, "statement": statement,
                     "status_notes": f"{status}:{justification}"}

        affected: list[str] = []
        for aff in vuln.get("affects", []) or []:
            ref = aff.get("ref", "")
            parts = ref.split("#")
            if len(parts) != 2:
                raise CdxError(f"malformed affected-package reference: {ref!r}")
            ident = parts[1]
            if "pkg:" in ident:
                k = package_key(ident)
                if k is None:
                    raise CdxError(f"unparseable affected purl: {ident!r}")
                affected.append(k)
                continue
            versions = aff.get("versions")
            if not versions:
                raise CdxError(
                    f"no vulnerable components found for ref {ref!r}")
            for v in versions:
                if v.get("range"):
                    continue  # version ranges unsupported (reference TODO)
                ver = v.get("version", "")
                if not ver:
                    raise CdxError(f"no version found for package ref {ref!r}")
                k = package_key(_cdx_pkg_purl(ident, ver, "", False))
                if k is not None:
                    affected.append(k)
        for k in affected:
            edges.append(edge("package", k, "affected_by", "vulnerability",
                              vk, vex_props, "cdx vulnerability analysis"))
            if status in ("AFFECTED", "UNDER_INVESTIGATION"):
                edges.append(edge("package", k, "certify_vuln",
                                  "vulnerability", vk,
                                  {"time_scanned": published},
                                  "cdx vulnerability scan"))
        for rating in vuln.get("ratings", []) or []:
            score = rating.get("score")
            if score is None:
                continue
            edges.append(edge(
                "vulnerability", vk, "vuln_metadata", "metric",
                entity_key("metric", rating.get("method", "") or "unknown"),
                {"score_type": rating.get("method", "") or "",
                 "score_value": float(score), "timestamp": published},
                "cdx vulnerability rating"))
    return edges


# same per-documentType registry the SPDX reader seeds (the reference's
# RegisterDocumentParser pattern — pkg/ingestor/parser/parser.go)
from guac_ray.sources.spdx import register_document_parser  # noqa: E402

register_document_parser("cyclonedx-json", parse_cyclonedx_document)


def read_cyclonedx(paths: str | list[str], strict: bool = False):
    """CycloneDX-JSON files → Dataset of EDGE_IDENTITY rows (shared
    flat-map reader — sources/docreader.py)."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_cyclonedx_document, CdxError,
                               strict=strict)


def cdx_ingest(paths: str | list[str], num_buckets: int = 16) -> dict:
    """SBOM directory → assembled {'edges', 'nodes'} (same discipline
    as spdx_ingest)."""
    from guac_ray.stages.assemble import assemble_edges, nodes_from_edges

    edges = assemble_edges(read_cyclonedx(paths), num_buckets=num_buckets)
    return {"edges": edges,
            "nodes": nodes_from_edges(edges,
                                      num_buckets=max(8, num_buckets // 2))}
