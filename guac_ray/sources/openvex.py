"""OpenVEX reader → vex / certify_vuln edge rows (reference:
pkg/ingestor/parser/open_vex/parser_open_vex.go:62-158).

Semantics ported:
* per statement × product one vex edge; the product purl is the
  package key (PurlToPkg — unparseable purl = document error).
* status map (:41-46): not_affected / affected / fixed /
  under_investigation → the model enums; any other status is a
  document error.
* statement text (:126-130): impact_statement when NOT_AFFECTED,
  action_statement when AFFECTED, empty otherwise.
* justification map (:33-39) with NOT_PROVIDED default.
* known_since = the document's metadata timestamp; the VEX origin
  field carries the document ``@id`` (:115-116).
* AFFECTED / UNDER_INVESTIGATION additionally emit certify_vuln with
  time_scanned = the same timestamp (:82-93).

Format tolerance: OpenVEX v0.1 spells ``vulnerability`` as a string
and products as plain purl strings; v0.2 uses ``{"name": …}`` /
``{"@id": …}`` objects.  Both are accepted (go-vex does the same
normalization upstream of the reference parser).
"""

from __future__ import annotations

import json

from guac_ray.canonical import package_key, vuln_key

__all__ = ["OpenVexError", "parse_openvex_document", "read_openvex"]

COLLECTOR = "guac_ray/openvex"

_STATUS = {
    "not_affected": "NOT_AFFECTED",
    "affected": "AFFECTED",
    "fixed": "FIXED",
    "under_investigation": "UNDER_INVESTIGATION",
}
_JUSTIFICATION = {
    "component_not_present": "COMPONENT_NOT_PRESENT",
    "vulnerable_code_not_present": "VULNERABLE_CODE_NOT_PRESENT",
    "vulnerable_code_not_in_execute_path":
        "VULNERABLE_CODE_NOT_IN_EXECUTE_PATH",
    "vulnerable_code_cannot_be_controlled_by_adversary":
        "VULNERABLE_CODE_CANNOT_BE_CONTROLLED_BY_ADVERSARY",
    "inline_mitigations_already_exist": "INLINE_MITIGATIONS_ALREADY_EXIST",
}


class OpenVexError(ValueError):
    """Malformed OpenVEX document (callers route to rejects)."""


from guac_ray.sources.docreader import props_json as _props  # one copy


def parse_openvex_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """One OpenVEX JSON blob → EDGE_IDENTITY 9-tuples."""
    raw = blob.encode() if isinstance(blob, str) else blob
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError as ex:
        raise OpenVexError(f"not valid JSON: {ex}") from ex
    ts = doc.get("timestamp", "")
    if not ts:
        raise OpenVexError("OpenVEX document missing metadata timestamp")
    doc_id = doc.get("@id", "") or ""
    origin = source or doc_id or "openvex"

    edges: list[tuple] = []
    for stmt in doc.get("statements", []) or []:
        v = stmt.get("vulnerability", "")
        vid = v.get("name", "") if isinstance(v, dict) else v
        if "-" not in vid:
            raise OpenVexError(f"malformed vulnerability identifier: {vid!r}")
        vk = vuln_key(vid)
        status_raw = stmt.get("status", "")
        if status_raw not in _STATUS:
            raise OpenVexError(f"invalid status for openVEX: {status_raw}")
        status = _STATUS[status_raw]
        if status == "NOT_AFFECTED":
            statement = stmt.get("impact_statement", "") or ""
        elif status == "AFFECTED":
            statement = stmt.get("action_statement", "") or ""
        else:
            statement = ""
        justification = _JUSTIFICATION.get(
            stmt.get("justification", ""), "NOT_PROVIDED")
        props = {"status": status, "vex_justification": justification,
                 "known_since": ts, "statement": statement,
                 "document_id": doc_id}
        for prod in stmt.get("products", []) or []:
            pid = prod.get("@id", "") if isinstance(prod, dict) else prod
            k = package_key(pid)
            if k is None:
                raise OpenVexError(f"unparseable product purl: {pid!r}")
            edges.append(("package", k, "affected_by", "vulnerability", vk,
                          _props(props), "openvex statement", origin,
                          collector))
            if status in ("AFFECTED", "UNDER_INVESTIGATION"):
                edges.append(("package", k, "certify_vuln", "vulnerability",
                              vk, _props({"time_scanned": ts}),
                              "openvex vulnerability scan", origin,
                              collector))
    return edges


from guac_ray.sources.spdx import register_document_parser  # noqa: E402

register_document_parser("open-vex", parse_openvex_document)


def read_openvex(paths: str | list[str], strict: bool = False):
    """OpenVEX JSON files → Dataset of EDGE_IDENTITY rows (shared
    flat-map reader — sources/docreader.py)."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_openvex_document, OpenVexError,
                               strict=strict, batch_size=16)
