"""Arrow schemas for the engine's tables (SURVEY.md §1.6).

One long-format edge table replaces the reference's 17 per-predicate slices
(pkg/assembler/assembler.go:33-51): per-predicate payloads are serialized
into a ``props`` JSON column; edge identity = every payload field
(inmem/isDependency.go:117-121 — duplicate edge means equality on subject,
object AND all payload fields).
"""

from __future__ import annotations

import pyarrow as pa

# primary input (driver input_hint, exact)
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# edge identity columns — full-payload equality dedup
EDGE_IDENTITY = [
    "subj_type",
    "subj_key",
    "pred",
    "obj_type",
    "obj_key",
    "props",
    "justification",
    "origin",
    "collector",
]

EDGE_SCHEMA = pa.schema(
    [
        ("subj_type", pa.string()),
        ("subj_key", pa.string()),
        ("pred", pa.string()),
        ("obj_type", pa.string()),
        ("obj_key", pa.string()),
        ("props", pa.string()),          # JSON, sorted keys
        ("justification", pa.string()),
        ("origin", pa.string()),
        ("collector", pa.string()),
        # lineage (stripped before golden compare, like the reference's e2e
        # jq-strips ids/timestamps — internal/testing/e2e/e2e:66-78)
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)

NODE_SCHEMA = pa.schema(
    [
        ("node_type", pa.string()),
        ("node_key", pa.string()),
        ("attrs", pa.string()),          # JSON, sorted keys
    ]
)

REJECT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("reason", pa.string()),
    ]
)

VALID_ROLES = ("user", "assistant", "system", "tool")

# the 17 reference predicate families' transcript analogs (FIXTURES.md §F6)
PREDICATES = (
    "has_sbom",          # conversation → manifest        (HasSBOM)
    "uses_tool",         # speaker → tool                 (IsDependency)
    "mentions_package",  # conversation → package
    "mentions_artifact", # conversation → artifact
    "mentions_repo",     # conversation → source          (HasSourceAt, conv level)
    "mentions_vuln",     # conversation → vulnerability
    "is_occurrence",     # package → artifact             (IsOccurrence)
    "has_source_at",     # package → source               (HasSourceAt)
    "hash_equal",        # artifact ↔ artifact            (HashEqual)
    "vuln_equal",        # vulnerability ↔ vulnerability  (VulnEqual)
    "affected_by",       # package → vulnerability        (Vex)
    "certify_vuln",      # package → vulnerability|noVuln (CertifyVuln, enrichment)
    "certify_scorecard", # source → scorecard             (CertifyScorecard)
    "certify_legal",     # package → license              (CertifyLegal)
    "has_slsa",          # artifact → builder             (HasSlsa)
    "certify_good",      # entity → speaker               (CertifyGood)
    "certify_bad",       # entity → speaker               (CertifyBad)
    "point_of_contact",  # package → contact              (PointOfContact)
    "vuln_metadata",     # vulnerability → metric         (VulnMetadata)
    "has_metadata",      # package → conversation         (HasMetadata)
    "participates_in",   # speaker → conversation         (node-coverage edge)
)
