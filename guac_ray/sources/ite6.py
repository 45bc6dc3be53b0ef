"""ITE-6 (in-toto attestation) parsers + DSSE envelope unwrap.

Ports, field-level (reference files, for parity checks):
* ``pkg/ingestor/parser/vuln/vuln.go`` — the vuln certifier
  attestation (predicate ``https://in-toto.io/attestation/vuln/v0.1``,
  the cosign vuln-attestation spec): subject purls → packages, each
  scanner result → an OSV-typed vulnerability, a ``vuln_equal`` edge
  between that OSV id and the id-prefix-typed vulnerability
  (helpers/vuln.go:30-39 ``CreateVulnInput``), and a ``certify_vuln``
  per (package × vulnerability) carrying the scan metadata; an EMPTY
  result list emits the ``noVuln`` negative fact (vuln.go:156-163).
* ``pkg/ingestor/parser/slsa/parser_slsa.go`` — SLSA provenance
  v0.1 / v0.2 / v1: subjects and materials become (package | source |
  guac-generic-purl package) entities (helpers/purl.go:227
  ``GuacGenericPurl``, helpers/vcs.go:37-96 ``VcsToSrc``) with one
  ``is_occurrence`` per (entity × digest artifact), and every subject
  artifact gets a ``has_slsa`` edge to the builder with the FLATTENED
  predicate key/value list (parser_slsa.go:239-281 — the jeremywohl/
  flatten "slsa."-prefixed dot style over the Go-typed predicate
  round-trip, values rendered with Go ``%v`` semantics including the
  float64 shortest-'g' form, so ``123456768`` renders ``1.23456768e+08``
  exactly as the reference's golden).
* ``pkg/handler/processor/dsse/dsse.go`` + ``guesser/type_dsse.go`` —
  DSSE envelopes (payload / payloadType / signatures) unwrap to their
  base64 payload which re-enters the type guesser (the reference's
  dsse parser itself emits no predicates — parser_dsse.go:91-93 —
  signature verification lives in ``stages/verifier.py`` here).
* ``pkg/handler/processor/guesser/type_ite6.go`` — statements whose
  ``_type`` starts with ``https://in-toto.io/Statement`` route by
  predicate-type prefix: slsa.dev/provenance → SLSA, attestation/vuln
  → vuln; crev / certify / other predicates are ITE6-generic, which
  the reference registers NO parser for (parser.go:44-54) — we
  likewise reject them.

Go-struct round-trip fidelity: the reference unmarshals the predicate
into the in-toto-golang TYPED structs and re-marshals before
flattening (parser_slsa.go:259-276), so unknown JSON keys are DROPPED
and non-omitempty zero fields MATERIALIZE (e.g. ``completeness.
materials = "false"`` appears even when absent from the document).
``_norm`` replicates that with a declarative copy of the public
in-toto-golang v0.1/v0.2/v1 provenance schemas.

Scale shape: documents are the unit of work; ``read_ite6`` /
``read_dsse`` are shuffle-free flat-maps over a path table
(sources/docreader.py) feeding the standard assemble dedup.
"""

from __future__ import annotations

import base64
import binascii
import json
from decimal import Decimal

from guac_ray.canonical import (NO_VULN_KEY, SourceSpec, artifact_key,
                                entity_key, package_key, sanitize,
                                source_key, vuln_key)

__all__ = ["Ite6Error", "parse_ite6_document", "parse_dsse_document",
           "read_ite6", "read_dsse", "vcs_to_src_key"]

COLLECTOR = "guac_ray/ite6"

PREDICATE_VULN = "https://in-toto.io/attestation/vuln/v0.1"
PREDICATE_SLSA01 = "https://slsa.dev/provenance/v0.1"
PREDICATE_SLSA02 = "https://slsa.dev/provenance/v0.2"
PREDICATE_SLSA1 = "https://slsa.dev/provenance/v1"

_OCCURRENCE_JUST = "from SLSA definition of checksums for subject/materials"


class Ite6Error(ValueError):
    """Malformed ITE-6 / DSSE document (callers route to rejects)."""


from guac_ray.sources.docreader import props_json as _props  # one copy


# ---------------------------------------------------------------------------
# Go `%v` value rendering (fmt.Sprintf("%v", v) over encoding/json types)
# ---------------------------------------------------------------------------

def _go_float_str(f: float) -> str:
    """strconv.FormatFloat(f, 'g', -1, 64): shortest round-trip digits,
    scientific when exponent < -4 or >= 6 (shortest mode pins eprec=6 —
    strconv/ftoa.go), minimum-2-digit exponent."""
    if f != f:
        return "NaN"
    if f == float("inf"):
        return "+Inf"
    if f == float("-inf"):
        return "-Inf"
    sign, digits, exp = Decimal(repr(float(f))).as_tuple()
    ds = "".join(map(str, digits)).rstrip("0")
    if not ds:
        return "-0" if sign else "0"
    dp = len(digits) + exp          # decimal point offset into ds
    e = dp - 1
    pre = "-" if sign else ""
    if e < -4 or e >= 6:
        mant = ds[0] + ("." + ds[1:] if len(ds) > 1 else "")
        return f"{pre}{mant}e{'+' if e >= 0 else '-'}{abs(e):02d}"
    if dp <= 0:
        return f"{pre}0.{'0' * -dp}{ds}"
    if dp >= len(ds):
        return pre + ds + "0" * (dp - len(ds))
    return f"{pre}{ds[:dp]}.{ds[dp:]}"


def _go_value(v) -> str:
    """Leaf rendering: JSON numbers are float64 in Go, bools lowercase,
    nil prints ``<nil>``."""
    if v is None:
        return "<nil>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _go_float_str(float(v))
    return str(v)


def _flatten(obj, prefix: str, out: dict) -> None:
    """jeremywohl/flatten with Middle-'.' style: dict keys and list
    indices join with '.'; empty containers contribute no leaves."""
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(v, f"{prefix}.{k}" if prefix else k, out)
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            _flatten(v, f"{prefix}.{i}", out)
    else:
        out[prefix] = _go_value(obj)


# ---------------------------------------------------------------------------
# Declarative Go-struct marshal normalization (in-toto-golang schemas)
# ---------------------------------------------------------------------------
# spec node forms:
#   ("str", om)     string; om=True ⇒ omitempty (skip when empty)
#   ("bool",)       bool, never omitted (zero value "false" materializes)
#   ("time", )      *time.Time,omitempty — RFC3339 string kept verbatim
#   ("any", om)     interface{} passthrough; om skips ONLY missing/None
#   ("digest",)     DigestSet (map[string]string),omitempty
#   ("struct", spec, ptr)  nested struct; ptr=True ⇒ *T,omitempty (skip
#                   when missing), else value struct (recurse, {} default)
#   ("list", spec)  []T,omitempty — skip when missing/empty

def _get(raw: dict, key: str):
    """encoding/json field match: exact key wins, else the first
    case-insensitive match (the reference's v1 golden keeps a document
    ``invocationId`` under the struct's ``invocationID`` tag)."""
    if key in raw:
        return raw[key]
    lk = key.lower()
    for k, v in raw.items():
        if isinstance(k, str) and k.lower() == lk:
            return v
    return None


def _norm(spec: dict, raw) -> dict:
    raw = raw if isinstance(raw, dict) else {}
    out: dict = {}
    for key, node in spec.items():
        kind = node[0]
        v = _get(raw, key)
        if kind == "str":
            s = v if isinstance(v, str) else ("" if v is None else str(v))
            if s or not node[1]:
                out[key] = s
        elif kind == "bool":
            out[key] = bool(v)
        elif kind == "time":
            if v is not None:
                out[key] = v
        elif kind == "any":
            if v is not None or (not node[1] and key in spec):
                if v is not None:
                    out[key] = v
                elif not node[1]:
                    out[key] = None
        elif kind == "digest":
            if isinstance(v, dict) and v:
                out[key] = dict(v)
        elif kind == "struct":
            if v is None and node[2]:
                continue
            out[key] = _norm(node[1], v)
        elif kind == "list":
            if isinstance(v, list) and v:
                out[key] = [_norm(node[1], e) for e in v]
    return out


_MATERIAL = {"uri": ("str", True), "digest": ("digest",)}

_SLSA01_PRED = {
    "builder": ("struct", {"id": ("str", False)}, False),
    "recipe": ("struct", {
        "type": ("str", False),
        "definedInMaterial": ("any", True),
        "entryPoint": ("str", True),
        "arguments": ("any", True),
        "environment": ("any", True),
    }, False),
    "metadata": ("struct", {
        "buildInvocationId": ("str", True),
        "buildStartedOn": ("time",),
        "buildFinishedOn": ("time",),
        "completeness": ("struct", {
            "arguments": ("bool",),
            "environment": ("bool",),
            "materials": ("bool",),
        }, False),
        "reproducible": ("bool",),
    }, True),
    "materials": ("list", _MATERIAL),
}

_SLSA02_PRED = {
    "builder": ("struct", {"id": ("str", False)}, False),
    "buildType": ("str", False),
    "invocation": ("struct", {
        "configSource": ("struct", {
            "uri": ("str", True),
            "digest": ("digest",),
            "entryPoint": ("str", True),
        }, False),
        "parameters": ("any", True),
        "environment": ("any", True),
    }, False),
    "buildConfig": ("any", True),
    "metadata": ("struct", {
        "buildInvocationID": ("str", True),
        "buildStartedOn": ("time",),
        "buildFinishedOn": ("time",),
        "completeness": ("struct", {
            "parameters": ("bool",),
            "environment": ("bool",),
            "materials": ("bool",),
        }, False),
        "reproducible": ("bool",),
    }, True),
    "materials": ("list", _MATERIAL),
}

_RESOURCE_DESCRIPTOR = {
    "uri": ("str", True),
    "digest": ("digest",),
    "name": ("str", True),
    "downloadLocation": ("str", True),
    "mediaType": ("str", True),
    "content": ("str", True),
    "annotations": ("any", True),
}

_SLSA1_PRED = {
    "buildDefinition": ("struct", {
        "buildType": ("str", False),
        "externalParameters": ("any", False),
        "internalParameters": ("any", True),
        "resolvedDependencies": ("list", _RESOURCE_DESCRIPTOR),
    }, False),
    "runDetails": ("struct", {
        "builder": ("struct", {
            "id": ("str", False),
            "builderDependencies": ("list", _RESOURCE_DESCRIPTOR),
            "version": ("any", True),
        }, False),
        "metadata": ("struct", {
            "invocationID": ("str", True),
            "startedOn": ("time",),
            "finishedOn": ("time",),
        }, False),
        "byproducts": ("list", _RESOURCE_DESCRIPTOR),
    }, False),
}


# ---------------------------------------------------------------------------
# VcsToSrc parity (helpers/vcs.go:37-96)
# ---------------------------------------------------------------------------

_GIT_HTTPS_HOSTS = ("go.googlesource.com", "github.com", "gitlab.com")


def vcs_to_src_key(uri: str) -> str | None:
    """``<tool>+<transport>://host/path[@rev]`` (or https:// on a known
    git host) → source key; None when the string is not a VCS uri (the
    caller then falls back to a guac-generic purl, parser_slsa.go:
    183-198). rev is a commit when 40-hex, else a tag; >1 '@' in the
    final path segment is a reject (vcs.go:71-74)."""
    from urllib.parse import urlsplit

    try:
        u = urlsplit(uri)
    except ValueError:
        return None
    if u.scheme == "https":
        host = u.netloc
        if not (host in _GIT_HTTPS_HOSTS or "bitbucket" in host):
            return None
        tool = "git"
        path = u.path
    else:
        parts = u.scheme.split("+")
        if len(parts) != 2 or not parts[0]:
            return None
        tool = parts[0]
        path = u.path
    namespace = u.netloc
    idx = path.rfind("/")
    if idx > 0:
        name = path[idx + 1:]
        namespace += path[:idx]
    else:
        name = path.lstrip("/")
    sp = name.split("@")
    if len(sp) > 2:
        return None
    name = sp[0]
    tag = commit = ""
    if len(sp) == 2:
        rev = sp[1]
        try:
            is_hex = len(rev) == 40 and bytes.fromhex(rev) is not None
        except ValueError:
            is_hex = False
        if is_hex:
            commit = rev
        else:
            tag = rev
    if not name and not namespace:
        return None
    return source_key(SourceSpec(tool, namespace, name, tag, commit))


def _guac_generic_purl(name: str) -> str:
    """helpers/purl.go:227 + SanitizeString:196-210 (QueryEscape each
    '/'-segment)."""
    from urllib.parse import quote_plus

    esc = "/".join(quote_plus(seg) for seg in name.split("/"))
    return f"pkg:guac/generic/{esc}"


def _slsa_entity(name: str, digests: dict) -> tuple[str, str, list[str]]:
    """(entity_type, entity_key, [artifact keys]) for one subject or
    material — purl, else VCS source, else guac-generic package
    (parser_slsa.go:174-201). Digest values shed stray quotes (:168)."""
    arts = [artifact_key(alg, str(d).strip("'"))
            for alg, d in (digests or {}).items()]
    k = package_key(name) if name.startswith("pkg:") else None
    if k is not None:
        return "package", k, arts
    sk = vcs_to_src_key(name)
    if sk is not None:
        return "source", sk, arts
    gk = package_key(_guac_generic_purl(name))
    if gk is None:
        raise Ite6Error(f"unable to derive a guac generic purl: {name!r}")
    return "package", gk, arts


# ---------------------------------------------------------------------------
# vuln attestation (vuln.go)
# ---------------------------------------------------------------------------

def _parse_vuln(doc: dict, origin: str, collector: str) -> list[tuple]:
    pkgs: list[str] = []
    for sub in doc.get("subject", []) or []:
        name = (sub or {}).get("name", "")
        k = package_key(name)
        if k is None:
            raise Ite6Error(f"bad purl in statement header: {name!r}")
        pkgs.append(k)
    pred = doc.get("predicate") or {}
    meta = pred.get("metadata") or {}
    scanned = meta.get("scannedOn")
    if not scanned:
        raise Ite6Error("vuln attestation missing metadata.scannedOn")
    scanner = pred.get("scanner") or {}
    db = scanner.get("db") or {}
    scan_props = _props({
        "time_scanned": scanned,
        "db_uri": db.get("uri", "") or "",
        "db_version": db.get("version", "") or "",
        "scanner_uri": scanner.get("uri", "") or "",
        "scanner_version": scanner.get("version", "") or "",
    })

    edges: list[tuple] = []
    vulns: list[str] = []
    for res in scanner.get("result", []) or []:
        vid = (res or {}).get("vulnerability_id", "") or ""
        if "-" not in vid:
            raise Ite6Error(f"malformed vulnerability identifier: {vid!r}")
        lid = vid.strip().lower()
        osv_key = f"vuln://osv/{sanitize(lid)}"   # treated as OSV, vuln.go:122
        vulns.append(osv_key)
        edges.append(("vulnerability", osv_key, "vuln_equal",
                      "vulnerability", vuln_key(vid), "{}",
                      "Decoded OSV data", origin, collector))
    for pk in pkgs:
        if vulns:
            for vk in vulns:
                edges.append(("package", pk, "certify_vuln", "vulnerability",
                              vk, scan_props, "ite6 vulnerability attestation",
                              origin, collector))
        else:
            edges.append(("package", pk, "certify_vuln", "vulnerability",
                          NO_VULN_KEY, scan_props,
                          "ite6 vulnerability attestation", origin, collector))
    return edges


# ---------------------------------------------------------------------------
# SLSA provenance (parser_slsa.go)
# ---------------------------------------------------------------------------

def _parse_slsa(doc: dict, ptype: str, origin: str,
                collector: str) -> list[tuple]:
    pred = doc.get("predicate")
    if not isinstance(pred, dict):
        raise Ite6Error("SLSA statement missing predicate")

    subjects = [
        _slsa_entity((s or {}).get("name", "") or "",
                     (s or {}).get("digest") or {})
        for s in doc.get("subject", []) or []
    ]

    bare_materials: list[str] = []
    started = finished = ""
    if ptype == PREDICATE_SLSA01:
        if _get(pred, "metadata") is None:
            raise Ite6Error("SLSA01 Metadata is nil")
        norm = _norm(_SLSA01_PRED, pred)
        meta = norm.get("metadata", {})
        build_type = norm["recipe"]["type"]
        started = meta.get("buildStartedOn") or ""
        finished = meta.get("buildFinishedOn") or ""
        builder_uri = norm["builder"]["id"]
        mats = norm.get("materials", [])
    elif ptype == PREDICATE_SLSA02:
        norm = _norm(_SLSA02_PRED, pred)
        meta = norm.get("metadata", {})
        build_type = norm["buildType"]
        started = meta.get("buildStartedOn") or ""
        # bug-compatible with parser_slsa.go:225: FinishedOn is
        # assigned from BuildStartedOn when buildFinishedOn is set
        finished = started if meta.get("buildFinishedOn") else ""
        builder_uri = norm["builder"]["id"]
        mats = norm.get("materials", [])
    else:  # PREDICATE_SLSA1
        norm = _norm(_SLSA1_PRED, pred)
        bd, rd = norm["buildDefinition"], norm["runDetails"]
        build_type = bd["buildType"]
        started = rd["metadata"].get("startedOn") or ""
        finished = rd["metadata"].get("finishedOn") or ""
        builder_uri = rd["builder"]["id"]
        mats = []
        for rdep in bd.get("resolvedDependencies", []):
            if not rdep.get("digest"):
                continue              # digest-less deps skipped (:130-133)
            if not rdep.get("uri"):
                bare_materials.extend(   # artifact-only material (:134-137)
                    artifact_key(a, str(d).strip("'"))
                    for a, d in rdep["digest"].items())
                continue
            mats.append(rdep)

    materials = [
        _slsa_entity(m.get("uri", "") or "", m.get("digest") or {})
        for m in mats
    ]

    flat: dict[str, str] = {}
    _flatten(norm, "slsa", flat)

    material_arts = sorted(
        {a for _, _, arts in materials for a in arts} | set(bare_materials))
    slsa_props = _props({
        "slsa_version": ptype,
        "build_type": build_type,
        "started_on": started,
        "finished_on": finished,
        "slsa_predicate": dict(sorted(flat.items())),
        "materials": material_arts,
        "builder_uri": builder_uri,
    })
    builder_key = entity_key("builder", builder_uri)

    edges: list[tuple] = []
    for etype, ekey, arts in subjects + materials:
        for a in arts:
            edges.append((etype, ekey, "is_occurrence", "artifact", a, "{}",
                          _OCCURRENCE_JUST, origin, collector))
    for _, _, arts in subjects:
        for a in arts:
            edges.append(("artifact", a, "has_slsa", "builder", builder_key,
                          slsa_props, "ite6 slsa provenance", origin,
                          collector))
    return edges


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def parse_ite6_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """One ITE-6 statement → EDGE_IDENTITY 9-tuples, routed by
    predicate type (guesser/type_ite6.go:30-47)."""
    raw = blob.encode() if isinstance(blob, str) else blob
    try:
        doc = json.loads(raw)
    except (json.JSONDecodeError, UnicodeDecodeError) as ex:
        raise Ite6Error(f"not valid JSON: {ex}") from ex
    if not isinstance(doc, dict):
        raise Ite6Error("ITE-6 statement must be a JSON object")
    stype = doc.get("_type", "") or ""
    if not stype.startswith("https://in-toto.io/Statement"):
        raise Ite6Error(f"not an in-toto statement: {stype!r}")
    ptype = doc.get("predicateType", "") or ""
    origin = source or "ite6"
    if ptype.startswith(PREDICATE_VULN):
        return _parse_vuln(doc, origin, collector)
    if ptype in (PREDICATE_SLSA01, PREDICATE_SLSA02, PREDICATE_SLSA1):
        return _parse_slsa(doc, ptype, origin, collector)
    raise Ite6Error(f"Unknown SLSA PredicateType: {ptype!r}")


def parse_dsse_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """DSSE envelope → decode the base64 payload and re-route it through
    the content guesser (processor/dsse/dsse.go:64-93 unpacks to an
    unknown-typed document that re-enters the guesser chain)."""
    raw = blob.encode() if isinstance(blob, str) else blob
    try:
        env = json.loads(raw)
    except (json.JSONDecodeError, UnicodeDecodeError) as ex:
        raise Ite6Error(f"not valid JSON: {ex}") from ex
    if not isinstance(env, dict) or not env.get("payload") \
            or not env.get("payloadType") or not env.get("signatures"):
        raise Ite6Error("not a DSSE envelope")
    try:
        payload = base64.standard_b64decode(env["payload"])
    except (binascii.Error, ValueError):
        try:
            payload = base64.urlsafe_b64decode(env["payload"])
        except (binascii.Error, ValueError) as ex:
            raise Ite6Error(f"failed to decode payload: {ex}") from ex

    from guac_ray.sources.spdx import (DOCUMENT_PARSERS,
                                       _register_all_parsers,
                                       guess_document_type)

    # a fresh Ray worker importing only ite6→spdx has just spdx-json /
    # json-lines registered — a DSSE-wrapped CycloneDX/CSAF payload
    # would KeyError (not Ite6Error) past the reject route otherwise
    # (the same guard parse_jsonlines_document carries)
    _register_all_parsers()
    dt = guess_document_type(payload)
    if dt is None or dt == "dsse":
        raise Ite6Error("unrecognized DSSE payload type")
    parser = DOCUMENT_PARSERS.get(dt)
    if parser is None:
        raise Ite6Error(f"no parser registered for DSSE payload {dt!r}")
    try:
        return parser(payload, source=source)
    except ValueError as ex:
        raise Ite6Error(str(ex)) from ex


from guac_ray.sources.spdx import register_document_parser  # noqa: E402

register_document_parser("ite6", parse_ite6_document)
register_document_parser("dsse", parse_dsse_document)


def read_ite6(paths: str | list[str], strict: bool = False):
    """ITE-6 statement files → Dataset of EDGE_IDENTITY rows (shared
    flat-map reader — sources/docreader.py)."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_ite6_document, Ite6Error,
                               strict=strict, batch_size=16)


def read_dsse(paths: str | list[str], strict: bool = False):
    """DSSE envelope files → Dataset of EDGE_IDENTITY rows."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_dsse_document, Ite6Error,
                               strict=strict, batch_size=16)
