"""SPDX-2.x JSON SBOM reader → edge rows (the real-format parser
plugin; reference: pkg/ingestor/parser/spdx/parse_spdx.go).

This is the field-level re-expression of the reference's SPDX parser
into the engine's long edge schema (schemas.py EDGE_IDENTITY) — the
largest remaining semantic delta called out by the round-4 review.
Semantics ported (with file:line provenance):

* required ``creationInfo.created`` (RFC3339) — parse_spdx.go:74-81;
  a missing/invalid time raises ``SpdxError`` (callers route rejects).
* top-level packages from DOCUMENT DESCRIBES / DESCRIBED_BY
  relationships, skipping self-relations — parse_spdx.go:93-112; when
  none resolve, the heuristic top-level ``pkg:guac/spdx/<docname>``
  plus synthetic depends_on edges to every package/file —
  parse_spdx.go:173-185, common/helpers.go:71-108.
* package identity: every ``externalRefs`` purl, else the guac purl
  ``pkg:guac/pkg/<name>[@version]`` — parse_spdx.go:119-128,
  helpers/purl.go:211-217.  Keys go through ``canonical.package_key``
  (qualifier-order-insensitive canonical purl).
* package checksums → artifacts (``alg:digest`` lowercased) —
  parse_spdx.go:144-152; file checksums likewise but EMPTY-file /
  all-zero digests are skipped — parse_spdx.go:188-212, the
  isEmptyChecksum table at parse_spdx.go:471-486.
* relationship → dependency direction table — parse_spdx.go:434-453:
  CONTAINS / DEPENDS_ON read forward (found=RefA), CONTAINED_BY /
  DEPENDENCY_OF / PACKAGE_OF read reversed (found=RefB).  Per found
  node ONE edge is emitted, preferring the first related FILE node
  over the first related package node — common/helpers.go:36-69
  (GetIsDep returns inside the loop; that single-edge quirk is pinned
  by tests).
* is_occurrence: file-package → file-artifact ("spdx file with
  checksum") and package → package-artifact ("spdx package with
  checksum") — parse_spdx.go:305-332.
* certify_legal per package from licenseDeclared / licenseConcluded /
  copyrightText, expressions split by ``parse_license_expression``
  (license.go:72-88), document-local ``LicenseRef-`` names rewritten
  to content-addressed ``hash_license`` names with inline text pulled
  from ``hasExtractedLicensingInfos`` ("Not found" fallback) —
  parse_spdx.go:334-362 + fixLicense:410-432.
* has_metadata: one edge per SECURITY external reference (key "cpe")
  and one per package pointing at the top-level purl (key
  "topLevelPackage") — parse_spdx.go:364-405.  DIVERGENCE: the
  reference stamps these with ``time.Now()``; we stamp the document's
  created time so replays are bit-identical (replay-stability
  contract).
* has_sbom on each top-level package, carrying the sha256 of the raw
  blob + the documentNamespace — common/helpers.go:110-123.

Scale shape: one SBOM document is KB–MB and parses as a unit; the
distribution axis is ACROSS documents.  ``read_spdx`` is a flat-map
over a path table (one task per group of docs, pure map work, no
shuffle); the output flows into the same ``assemble_edges`` full-
identity dedup every other edge source uses, so trusted-triple import
(`ingest_predicates`) and SPDX ingest compose for free.
"""

from __future__ import annotations

import hashlib
import json

from guac_ray.canonical import (artifact_key, hash_license, license_key,
                                package_key, parse_license_expression,
                                sanitize)

__all__ = ["SpdxError", "parse_spdx_document", "read_spdx", "spdx_ingest",
           "register_document_parser", "DOCUMENT_PARSERS",
           "guess_document_type", "read_documents_any"]

COLLECTOR = "guac_ray/spdx"

# direction table — parse_spdx.go:434-453
_DEP_FORWARD = frozenset({"CONTAINS", "DEPENDS_ON"})
_DEP_REVERSE = frozenset({"CONTAINED_BY", "DEPENDENCY_OF", "PACKAGE_OF"})

# empty / all-zero digests that carry no identity — parse_spdx.go:471-486
_EMPTY_DIGESTS = frozenset({
    "0000000000000000000000000000000000000000",
    "0000000000000000000000000000000000000000000000000000000000000000",
    "da39a3ee5e6b4b0d3255bfef95601890afd80709",                          # sha1("")
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",  # sha256("")
    "d14a028c2a3a2bc9476102bb288234c415a2b01f828ea62ac5b3e42f",          # sha224("")
    "38b060a751ac96384cd9327eb1b1e36a21fdb71114be07434c0cc7bf63f6e1da"
    "274edebfe76f65fbd51ad2f14898b95b",                                  # sha384("")
    "cf83e1357eefb8bdf1542850d66d8007d620e4050b5715dc83f4a921d36ce9ce"
    "47d0d13c5d85f2b0ff8318d2877eec2f63b931bd47417a81a538327af927da3e",  # sha512("")
    "d41d8cd98f00b204e9800998ecf8427e",                                  # md5("")
})


class SpdxError(ValueError):
    """Malformed SPDX document (callers route to the reject channel)."""


from guac_ray.sources.docreader import props_json as _props  # one copy


def _guac_pkg_purl(name: str, version: str) -> str:
    """GuacPkgPurl analog (helpers/purl.go:211-217). The Go helper
    always appends ``@version`` (possibly empty); we omit an empty
    version because ``canonical_purl`` cannot round-trip a bare ``@``."""
    s = "pkg:guac/pkg/" + "/".join(sanitize(p) for p in name.split("/"))
    return f"{s}@{sanitize(version)}" if version else s


def _guac_file_purl(alg: str, digest: str, filename: str) -> str:
    """GuacFilePurl analog (helpers/purl.go:219-225)."""
    s = f"pkg:guac/files/{alg.lower()}:{digest}"
    if filename:
        s += "#" + "/".join(sanitize(p) for p in filename.split("/"))
    return s


def _require_created(doc: dict) -> str:
    ci = doc.get("creationInfo")
    if not isinstance(ci, dict):
        raise SpdxError("SPDX document missing required 'creationInfo'")
    created = ci.get("created", "")
    from datetime import datetime

    try:
        datetime.fromisoformat(created.replace("Z", "+00:00"))
    except (ValueError, AttributeError) as ex:
        raise SpdxError(
            f"SPDX document had invalid created time {created!r}") from ex
    return created


def parse_spdx_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """One SPDX-JSON blob → EDGE_IDENTITY 9-tuples (see module doc)."""
    raw = blob.encode() if isinstance(blob, str) else blob
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError as ex:
        raise SpdxError(f"not valid JSON: {ex}") from ex
    if not isinstance(doc, dict):
        # a top-level JSON array would AttributeError past the reject
        # route (report-not-crash: the error CLASS is the contract)
        raise SpdxError("SPDX document must be a JSON object")
    created = _require_created(doc)
    lv = doc.get("creationInfo", {}).get("licenseListVersion", "") or ""
    origin = source or doc.get("documentNamespace", "") or "spdx"

    def edge(st, sk, pred, ot, ok, props, just):
        return (st, sk, pred, ot, ok, _props(props), just, origin, collector)

    # ---- packages: spdxid → [purl keys], artifacts, legal ----
    pkg_keys: dict[str, list[str]] = {}
    pkg_arts: dict[str, list[str]] = {}
    pkg_raw: dict[str, dict] = {}
    for pac in doc.get("packages", []) or []:
        sid = pac.get("SPDXID", "")
        purls = [r.get("referenceLocator", "")
                 for r in pac.get("externalRefs", []) or []
                 if r.get("referenceType") == "purl"]
        if not purls:
            purls = [_guac_pkg_purl(pac.get("name", ""),
                                    pac.get("versionInfo", "") or "")]
        keys = []
        for purl in purls:
            k = package_key(purl)
            # unparseable purl: fall back to the guac purl (the
            # reference errors the whole document — purl.go:36-43; we
            # degrade per-package so one bad ref cannot drop an SBOM)
            if k is None:
                k = package_key(_guac_pkg_purl(pac.get("name", ""),
                                               pac.get("versionInfo", "") or ""))
            if k is not None:
                keys.append(k)
        pkg_keys[sid] = keys
        pkg_arts[sid] = [
            artifact_key(c.get("algorithm", ""), c.get("checksumValue", ""))
            for c in pac.get("checksums", []) or []
            if c.get("checksumValue")]
        pkg_raw[sid] = pac

    # ---- files: spdxid → [file purls], artifacts (skip empty digests) --
    file_keys: dict[str, list[str]] = {}
    file_arts: dict[str, list[str]] = {}
    for fl in doc.get("files", []) or []:
        sid = fl.get("SPDXID", "")
        for c in fl.get("checksums", []) or []:
            dv = (c.get("checksumValue") or "").lower()
            if not dv or dv in _EMPTY_DIGESTS:
                continue
            alg = c.get("algorithm", "")
            k = package_key(_guac_file_purl(alg, dv, fl.get("fileName", "")))
            if k is None:
                continue
            file_keys.setdefault(sid, []).append(k)
            file_arts.setdefault(sid, []).append(artifact_key(alg, dv))

    # ---- top level — parse_spdx.go:93-112 / 173-185 ----
    top_ids: list[str] = []
    for rel in doc.get("relationships", []) or []:
        a, b = rel.get("spdxElementId", ""), rel.get("relatedSpdxElement", "")
        a_ref = a.removeprefix("SPDXRef-")
        b_ref = b.removeprefix("SPDXRef-")
        if a_ref == b_ref:
            continue  # self DESCRIBES is not a valid top-level marker
        if a_ref == "DOCUMENT" and rel.get("relationshipType") == "DESCRIBES":
            top_ids.append(b)
        elif rel.get("relationshipType") == "DESCRIBED_BY" and b_ref == "DOCUMENT":
            top_ids.append(a)
    top_keys: list[str] = []
    for tid in top_ids:
        top_keys.extend(pkg_keys.get(tid, []))
    heuristic = not top_keys
    if heuristic:
        hk = package_key("pkg:guac/spdx/"
                         + "/".join(sanitize(p) for p in
                                    (doc.get("name", "") or "spdx").split("/")))
        top_keys = [hk] if hk else []

    edges: list[tuple] = []

    # ---- has_sbom — common/helpers.go:110-123 ----
    ns = doc.get("documentNamespace", "")
    sbom_props = {
        "algorithm": "sha256",
        "digest": hashlib.sha256(raw).hexdigest(),
        "download_location": source,
        "known_since": created,
        "uri": ns,
    }
    for tk in top_keys:
        edges.append(edge("package", tk, "has_sbom", "manifest", ns,
                          sbom_props, "spdx document manifest"))

    # ---- heuristic top-level depends_on — helpers.go:71-108 ----
    if heuristic and top_keys:
        just = ("top-level package GUAC heuristic connecting to each "
                "file/package")
        tk = top_keys[0]
        for sid in pkg_keys:
            for k in pkg_keys[sid]:
                if k != tk:
                    edges.append(edge(
                        "package", tk, "depends_on", "package", k,
                        {"dependency_type": "UNKNOWN"}, just))
        for sid in file_keys:
            for k in file_keys[sid]:
                edges.append(edge(
                    "package", tk, "depends_on", "package", k,
                    {"dependency_type": "UNKNOWN"}, just))

    # ---- relationship depends_on — parse_spdx.go:267-305 ----
    for rel in doc.get("relationships", []) or []:
        rtype = rel.get("relationshipType", "")
        if rtype in _DEP_FORWARD:
            found, related = (rel.get("spdxElementId", ""),
                              rel.get("relatedSpdxElement", ""))
        elif rtype in _DEP_REVERSE:
            found, related = (rel.get("relatedSpdxElement", ""),
                              rel.get("spdxElementId", ""))
        else:
            continue
        just = f"Derived from SPDX {rtype} relationship"
        if rel.get("comment"):
            just += f"; comment: {rel['comment']}"
        # GetIsDep quirk (helpers.go:36-69): ONE edge per found node —
        # the FIRST related file node wins, else the first package node
        rel_first = (file_keys.get(related) or pkg_keys.get(related) or [None])[0]
        if rel_first is None:
            continue
        for fk in (pkg_keys.get(found, []) + file_keys.get(found, [])):
            edges.append(edge("package", fk, "depends_on", "package",
                              rel_first,
                              {"dependency_type": "UNKNOWN"}, just))

    # ---- is_occurrence — parse_spdx.go:305-332 ----
    for sid, arts in file_arts.items():
        for k in file_keys.get(sid, []):
            for a in arts:
                edges.append(edge("package", k, "is_occurrence",
                                  "artifact", a, {},
                                  "spdx file with checksum"))
    for sid, arts in pkg_arts.items():
        for k in pkg_keys.get(sid, []):
            for a in arts:
                edges.append(edge("package", k, "is_occurrence",
                                  "artifact", a, {},
                                  "spdx package with checksum"))

    # ---- certify_legal — parse_spdx.go:334-362 + fixLicense ----
    other = {o.get("licenseId", ""): o.get("extractedText", "")
             for o in doc.get("hasExtractedLicensingInfos", []) or []}

    def fix(names: list[str], expr: str) -> tuple[list[tuple[str, str]], str]:
        """LicenseRef- names → content-addressed (fixLicense:410-432);
        returns [(name, list_version)] + the rewritten expression."""
        out = []
        for n in names:
            if n.startswith("LicenseRef-"):
                inline = other.get(n, "Not found")
                new = hash_license(inline)
                # plain substring replace is BUG-COMPATIBLE with the
                # reference (parse_spdx.go:342,349 strings.ReplaceAll):
                # a LicenseRef id that prefixes another in the same
                # expression gets mangled there too — kept for golden
                # parity, not an accident
                expr = expr.replace(n, new)
                out.append((new, ""))  # LicenseRef: no list version
            else:
                out.append((n, lv))
        return out, expr

    for sid, pac in pkg_raw.items():
        dec_x = pac.get("licenseDeclared", "") or ""
        dis_x = pac.get("licenseConcluded", "") or ""
        attrib = pac.get("copyrightText", "") or ""
        if not (dec_x or dis_x or attrib):
            continue
        just = "Found in SPDX document."
        if pac.get("licenseComments"):
            just += f" : {pac['licenseComments']}"
        dec, dec_x = fix(parse_license_expression(dec_x), dec_x)
        dis, dis_x = fix(parse_license_expression(dis_x), dis_x)
        props = {"declared": dec_x, "discovered": dis_x,
                 "attribution": attrib, "time_scanned": created}
        seen = set()
        for name, ver in dec + dis:
            key = license_key(name, ver)
            if key in seen:
                continue
            seen.add(key)
            for k in pkg_keys.get(sid, []):
                edges.append(edge("package", k, "certify_legal",
                                  "license", key, props, just))

    # ---- has_metadata (cpe + topLevelPackage) — parse_spdx.go:364-405 --
    for sid, pac in pkg_raw.items():
        cpes = [r.get("referenceLocator", "")
                for r in pac.get("externalRefs", []) or []
                if r.get("referenceCategory") == "SECURITY"]
        for k in pkg_keys.get(sid, []):
            for loc in cpes:
                edges.append(edge(
                    "package", k, "has_metadata", "metadata", f"cpe:{loc}",
                    {"key": "cpe", "value": loc, "timestamp": created},
                    "spdx cpe external reference"))
            for tk in top_keys:
                edges.append(edge(
                    "package", k, "has_metadata", "metadata",
                    f"topLevelPackage:{tk}",
                    {"key": "topLevelPackage", "value": tk,
                     "timestamp": created},
                    "spdx top level package reference"))
    return edges


# --------------------------------------------------------------------------
# document-parser registry (the reference's per-documentType parser
# registration — pkg/ingestor/parser/parser.go RegisterDocumentParser)
# --------------------------------------------------------------------------

DOCUMENT_PARSERS: dict[str, callable] = {}


def register_document_parser(doc_type: str, fn) -> None:
    if doc_type in DOCUMENT_PARSERS:
        raise ValueError(f"document parser already registered: {doc_type!r}")
    DOCUMENT_PARSERS[doc_type] = fn


register_document_parser("spdx-json", parse_spdx_document)


def parse_jsonlines_document(
    blob: bytes | str,
    source: str = "",
    collector: str = "",
) -> list[tuple]:
    """JSON Lines document → each line re-enters the content guesser
    and routes to its own parser (the reference's JsonLinesProcessor
    unpacks every line into an unknown-typed sub-document —
    processor/jsonlines/jsonlines.go:45-66). Any unroutable or
    malformed line fails the WHOLE document (line granularity is the
    reject unit upstream, document granularity here)."""
    _register_all_parsers()
    raw = blob.encode() if isinstance(blob, str) else blob
    edges: list[tuple] = []
    for i, ln in enumerate(raw.splitlines()):
        if not ln.strip():
            continue
        dt = guess_document_type(ln)
        if dt is None or dt == "json-lines":
            raise SpdxError(f"jsonlines: unroutable line {i} in {source}")
        edges.extend(DOCUMENT_PARSERS[dt](ln, source=source))
    return edges


def _register_all_parsers() -> None:
    """Importing the sibling modules registers every family in
    DOCUMENT_PARSERS (the reference's RegisterDocumentParser init chain
    — parser.go:44-54)."""
    import guac_ray.sources.csaf  # noqa: F401
    import guac_ray.sources.cyclonedx  # noqa: F401
    import guac_ray.sources.depsdev  # noqa: F401
    import guac_ray.sources.ingestpreds  # noqa: F401
    import guac_ray.sources.ite6  # noqa: F401
    import guac_ray.sources.openvex  # noqa: F401


register_document_parser("json-lines", parse_jsonlines_document)


def guess_document_type(blob: bytes) -> str | None:
    """Content-based document-type guess, first-match-wins — the
    reference's guesser chain for these formats
    (pkg/handler/processor/guesser/type_spdx.go / type_cyclonedx.go /
    type_openvex.go / type_csaf.go): each sniffer keys on the format's
    self-identifying field.  Returns a DOCUMENT_PARSERS key or None."""
    try:
        doc = json.loads(blob)
    except (json.JSONDecodeError, UnicodeDecodeError):
        if blob.lstrip()[:1] == b"<":
            # XML: CycloneDX is the only XML family the reference
            # parses (guesser/type_cyclonedx.go FormatXML branch)
            try:
                import xml.etree.ElementTree as ET

                root = ET.fromstring(blob)
                if root.tag.rsplit("}", 1)[-1] == "bom":
                    return "cyclonedx-json"  # same parser, XML branch
            except ET.ParseError:
                return None
            return None
        # JSON Lines: every non-empty line is itself valid JSON
        # (processor/guesser/format_jsonlines.go) — each line re-enters
        # this guesser via the json-lines parser
        lines = [ln for ln in blob.splitlines() if ln.strip()]
        if len(lines) > 1:
            try:
                if all(isinstance(json.loads(ln), dict) for ln in lines):
                    return "json-lines"
            except (json.JSONDecodeError, UnicodeDecodeError):
                return None
        return None
    if not isinstance(doc, dict):
        return None
    if doc.get("spdxVersion", ""):
        return "spdx-json"
    if doc.get("bomFormat") == "CycloneDX":
        return "cyclonedx-json"
    if doc.get("payload") and doc.get("payloadType") \
            and doc.get("signatures"):
        return "dsse"  # guesser/type_dsse.go:42-49
    if str(doc.get("_type", "")).startswith("https://in-toto.io/Statement"):
        return "ite6"  # guesser/type_ite6.go:30-47
    if isinstance(doc.get("CurrentPackage"), dict):
        return "deps-dev"  # guesser/type_deps_dev.go:25-31
    if isinstance(doc.get("scorecard"), dict) and (
            doc["scorecard"].get("version")
            or doc["scorecard"].get("commit")):
        return "scorecard"  # guesser/type_scorecard.go:25-31
    if any(doc.get(f) for f in (
            "certifyScorecard", "isDependency", "isOccurrence", "hasSlsa",
            "certifyVuln", "vulnEqual", "hasSourceAt", "certifyBad",
            "certifyGood", "hasSBOM", "hashEqual", "pkgEqual", "vex",
            "contact", "vulnMetadata", "hasMetadata", "certifyLegal")):
        return "ingest-predicates"  # guesser/type_ingest_predicates.go
    if "statements" in doc and ("@context" in doc or "@id" in doc):
        return "open-vex"  # self-identifying JSON-LD envelope
    if (doc.get("document") or {}).get("csaf_version") or (
            "csaf" in ((doc.get("document") or {}).get("category", "") or "")
            or ("vulnerabilities" in doc and "product_tree" in doc)):
        return "csaf"
    return None


def read_documents_any(paths: str | list[str], strict: bool = False):
    """Mixed SBOM/VEX directory → Dataset of EDGE_IDENTITY rows: each
    document is content-sniffed (``guess_document_type``) and routed to
    its registered parser — the collector-fan-in story for real
    formats. Unrecognized or malformed documents are skipped
    (``strict=True`` raises). One flat-map over the path table, no
    shuffle; importing the sibling parser modules here registers them."""
    _register_all_parsers()

    from guac_ray.sources.docreader import read_edge_documents

    def parse_any(blob, source=""):
        dt = guess_document_type(blob)
        if dt is None:
            raise SpdxError(f"unrecognized document type: {source}")
        try:
            return DOCUMENT_PARSERS[dt](blob, source=source)
        except ValueError as ex:  # any family's parse error
            raise SpdxError(str(ex)) from ex

    return read_edge_documents(paths, parse_any, SpdxError, strict=strict)


def read_spdx(paths: str | list[str], strict: bool = False):
    """SPDX-JSON files → Dataset of EDGE_IDENTITY rows (shared
    flat-map reader — see sources/docreader.py for the scale shape)."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_spdx_document, SpdxError,
                               strict=strict)


def spdx_ingest(paths: str | list[str], num_buckets: int = 16) -> dict:
    """SBOM directory → assembled {'edges', 'nodes'} through the same
    full-identity dedup every other edge source uses (pipelines/kg.py
    ingest_predicates discipline)."""
    from guac_ray.stages.assemble import assemble_edges, nodes_from_edges

    edges = assemble_edges(read_spdx(paths), num_buckets=num_buckets)
    return {"edges": edges,
            "nodes": nodes_from_edges(edges,
                                      num_buckets=max(8, num_buckets // 2))}
