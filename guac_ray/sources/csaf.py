"""CSAF 2.0 VEX reader → vex edge rows (reference:
pkg/ingestor/parser/csaf/parser_csaf.go).

Semantics ported:
* per vulnerability (``cve``) × per status (the fixed 8-status list at
  parser_csaf.go:300 — fixed / known_not_affected / known_affected /
  first_affected / first_fixed / last_affected / recommended /
  under_investigation, in that order) × per product id in
  ``product_status[status]`` one vex edge.
* product id → purl resolution is a TWO-HOP product-tree walk
  (:99-178): first the relationship table maps the full-product id to
  its ``product_reference``, then a depth-first branch walk (with a
  visited set against cyclic trees) finds the branch whose name or
  product id equals that reference and reads
  ``product_identification_helper.purl``.  An unresolvable product is
  SKIPPED with a warning, never a document error (:277-280).
* status map (:43-53) — note ``recommended`` counts as AFFECTED;
  statement text: NOT_AFFECTED reads the ``threats`` entries of
  category "impact" covering the product, anything else reads the
  matching ``remediations`` details (:183-209, 246-254).
* justification from ``flags`` whose ``product_ids`` cover the
  product, label mapped through the OpenVEX justification table,
  default NOT_PROVIDED (:257-269).
* known_since = ``document.tracking.current_release_date``; the VEX
  origin carries ``document.tracking.id`` (:238-240).
* the base CSAF parser emits ONLY Vex rows (GetPredicates:285-313);
  the Red Hat variant's GraphQL-backed CPE→package search
  (parser_csaf_red_hat.go:49-146) is a backend-query enrichment, out
  of scope for a document parser — its per-purl dedup is subsumed by
  the engine's full-identity edge dedup.
"""

from __future__ import annotations

import json

from guac_ray.canonical import package_key, vuln_key

__all__ = ["CsafError", "parse_csaf_document", "read_csaf"]

COLLECTOR = "guac_ray/csaf"

# parser_csaf.go:43-53
_STATUS = {
    "known_not_affected": "NOT_AFFECTED",
    "known_affected": "AFFECTED",
    "fixed": "FIXED",
    "first_fixed": "FIXED",
    "under_investigation": "UNDER_INVESTIGATION",
    "first_affected": "AFFECTED",
    "last_affected": "AFFECTED",
    "recommended": "AFFECTED",
}
# iteration order is part of the contract (parser_csaf.go:300)
_STATUS_ORDER = ("fixed", "known_not_affected", "known_affected",
                 "first_affected", "first_fixed", "last_affected",
                 "recommended", "under_investigation")
# shared with OpenVEX (parser_csaf.go:35-41)
from guac_ray.sources.openvex import _JUSTIFICATION  # noqa: E402


class CsafError(ValueError):
    """Malformed CSAF document (callers route to rejects)."""


from guac_ray.sources.docreader import props_json as _props  # one copy


def _find_product_ref(tree: dict, product_id: str,
                      _seen: set | None = None) -> str | None:
    """Relationship walk (findProductsRef — parser_csaf.go:144-178)."""
    if _seen is None:
        _seen = set()
    key = id(tree)
    if key in _seen:
        return None
    _seen.add(key)
    for r in tree.get("relationships", []) or []:
        if (r.get("full_product_name") or {}).get("product_id") == product_id:
            return r.get("product_reference", "")
    for b in tree.get("branches", []) or []:
        got = _find_product_ref(b, product_id, _seen)
        if got is not None:
            return got
    return None


def _find_ident_helper(tree: dict, product_ref: str, helper: str,
                       _seen: set | None = None) -> str | None:
    """Branch walk (findIdentificationHelperSearch —
    parser_csaf.go:121-141): branch name OR product id matches."""
    if _seen is None:
        _seen = set()
    key = id(tree)
    if key in _seen:
        return None
    _seen.add(key)
    prod = tree.get("product") or {}
    if tree.get("name") == product_ref or prod.get("product_id") == product_ref:
        return (prod.get("product_identification_helper") or {}).get(helper, "")
    for b in tree.get("branches", []) or []:
        got = _find_ident_helper(b, product_ref, helper, _seen)
        if got is not None:
            return got
    return None


def parse_csaf_document(
    blob: bytes | str,
    source: str = "",
    collector: str = COLLECTOR,
) -> list[tuple]:
    """One CSAF-VEX JSON blob → EDGE_IDENTITY 9-tuples."""
    raw = blob.encode() if isinstance(blob, str) else blob
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError as ex:
        raise CsafError(f"not valid JSON: {ex}") from ex
    tracking = (doc.get("document") or {}).get("tracking") or {}
    ts = tracking.get("current_release_date", "") or ""
    doc_id = tracking.get("id", "") or ""
    origin = source or doc_id or "csaf"
    tree = doc.get("product_tree") or {}

    edges: list[tuple] = []
    for v in doc.get("vulnerabilities", []) or []:
        vid = v.get("cve", "")
        if "-" not in vid:
            raise CsafError(f"malformed vulnerability identifier: {vid!r}")
        vk = vuln_key(vid)
        pstatus = v.get("product_status") or {}
        for status_raw in _STATUS_ORDER:
            status = _STATUS[status_raw]
            for product_id in pstatus.get(status_raw, []) or []:
                pref = _find_product_ref(tree, product_id)
                if pref is None:
                    continue  # unresolvable product: skip, never error
                purl = _find_ident_helper(tree, pref, "purl")
                if not purl:
                    continue
                k = package_key(purl)
                if k is None:
                    continue
                if status == "NOT_AFFECTED":
                    statement = next(
                        (t.get("details", "")
                         for t in v.get("threats", []) or []
                         if t.get("category") == "impact"
                         and product_id in (t.get("product_ids") or [])), "")
                else:
                    statement = next(
                        (r.get("details", "")
                         for r in v.get("remediations", []) or []
                         if product_id in (r.get("product_ids") or [])), "")
                justification = "NOT_PROVIDED"
                for flag in v.get("flags", []) or []:
                    if product_id in (flag.get("product_ids") or []):
                        justification = _JUSTIFICATION.get(
                            flag.get("label", ""), justification)
                props = {"status": status,
                         "vex_justification": justification,
                         "known_since": ts, "statement": statement,
                         "document_id": doc_id}
                edges.append(("package", k, "affected_by", "vulnerability",
                              vk, _props(props), "csaf vex statement",
                              origin, collector))
    return edges


from guac_ray.sources.spdx import register_document_parser  # noqa: E402

register_document_parser("csaf", parse_csaf_document)


def read_csaf(paths: str | list[str], strict: bool = False):
    """CSAF JSON files → Dataset of EDGE_IDENTITY rows (shared
    flat-map reader — sources/docreader.py)."""
    from guac_ray.sources.docreader import read_edge_documents

    return read_edge_documents(paths, parse_csaf_document, CsafError,
                               strict=strict, batch_size=16)
