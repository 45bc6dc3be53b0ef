"""Extractor unit tests on crafted turns (no Ray) — model: the
reference's table-driven parser goldens (parse_spdx_test.go etc.)."""

import pyarrow as pa
import pytest

from guac_ray.schemas import EDGE_SCHEMA
from guac_ray.stages.extract import (
    RejectRouter,
    TranscriptExtractor,
    parse_turn_facts,
    _compile,
)


def facts(text, tool="", role="user", conv="c1", ti=1):
    return parse_turn_facts(_compile(), conv, ti, role, text, tool)


class TestMentionParsing:
    def test_package_canonicalized(self):
        f = facts("we installed pkg:npm/@scope/lib1@1.0.0?os=linux&arch=amd64 today")
        assert f.packages == ["pkg:npm/%40scope/lib1@1.0.0?arch=amd64&os=linux"]

    def test_artifact_case_folded(self):
        f = facts("produced artifact sha256:" + "AB" * 32)
        assert f.artifacts == ["sha256:" + "ab" * 32]

    def test_repo_tag_and_commit(self):
        f = facts("see git+https://github.com/org/repo.git@v1.0.0 for details")
        assert f.repos == ["src:git/github.com/org/repo/tag=v1.0.0"]

    def test_vuln_mixed_case(self):
        f = facts("this relates to CVE-2024-1234 and cve-2024-1234")
        assert f.vulns == ["vuln://cve/cve-2024-1234"] * 2

    def test_scorecard(self):
        f = facts("scorecard score 7.5/10 for git+https://github.com/org/r@v1.0.0")
        assert f.scorecards == [("src:git/github.com/org/r/tag=v1.0.0", 7.5)]
        assert f.repos == ["src:git/github.com/org/r/tag=v1.0.0"]

    def test_legal_slsa_contact_severity(self):
        PK = "pkg:pypi/req@1.0.0"
        f = facts(f"{PK} is licensed under MIT;")
        assert f.legals == [(PK, "license:MIT")] and f.packages

        f = facts(f"{PK} is licensed under (MIT OR Apache-2.0) "
                  "WITH Classpath-exception-2.0;")
        assert f.legals == [(PK, "license:MIT"), (PK, "license:Apache-2.0"),
                            (PK, "license:Classpath-exception-2.0")]

        from guac_ray.canonical import hash_license, license_key

        inline = "Custom license text 3 for internal use."
        f = facts(f'{PK} is licensed under LicenseRef-custom3 '
                  f'where LicenseRef-custom3 reads "{inline}";')
        assert f.legals == [(PK, license_key(hash_license(inline)))]

        f = facts("artifact sha256:" + "ab" * 32 + " was built by https://b.example/v1")
        assert f.builders == ["https://b.example/v1"] and f.artifacts

        f = facts("contact dev1@example.org for pkg:pypi/req@1.0.0")
        assert f.contacts == ["dev1@example.org"]

        f = facts("severity 9.8 for CVE-2020-1000")
        assert f.severities == [("vuln://cve/cve-2020-1000", 9.8)]

    def test_good_bad(self):
        assert facts("endorsed: pkg:pypi/a@1.0.0").endorsements == [
            ("package", "pkg:pypi/a@1.0.0")
        ]
        assert facts("flagged: pkg:pypi/a@1.0.0").flags == [("package", "pkg:pypi/a@1.0.0")]

    def test_mention_parser_registry(self):
        from guac_ray.stages.extract import (
            register_mention_parser,
            unregister_mention_parser,
        )

        def ticket_parser(text, f):
            import re

            for m in re.findall(r"\bTICKET-\d+\b", text):
                f.artifacts.append(f"ticket:{m.lower()}")

        register_mention_parser("tickets", ticket_parser)
        try:
            with pytest.raises(ValueError):
                register_mention_parser("tickets", ticket_parser)
            f = facts("resolved TICKET-42 yesterday")
            assert "ticket:ticket-42" in f.artifacts
        finally:
            unregister_mention_parser("tickets")
        assert "ticket:ticket-42" not in facts("resolved TICKET-42").artifacts

    def test_depends_on(self):
        f = facts("pkg:pypi/app@1.0.0 depends on pkg:pypi/libz@0.2.0")
        assert f.dependencies == [("pkg:pypi/app@1.0.0", "pkg:pypi/libz@0.2.0")]
        # both sides are also plain mentions (purl scan runs first)
        assert set(f.packages) == {"pkg:pypi/app@1.0.0", "pkg:pypi/libz@0.2.0"}

    def test_depends_on_self_pair_skipped(self):
        f = facts("pkg:pypi/app@1.0.0 depends on pkg:pypi/app@1.0.0")
        assert f.dependencies == []

    def test_pkg_equal_sorted_in_derive(self):
        from guac_ray.stages.rules import derive

        f = facts("pkg:pypi/zlib@2.0.0 is the same as pkg:pypi/alib@1.0.0")
        assert f.equal_pkgs == [("pkg:pypi/zlib@2.0.0", "pkg:pypi/alib@1.0.0")]
        eq = [e for e in derive(f) if e[2] == "pkg_equal"]
        assert len(eq) == 1
        assert (eq[0][1], eq[0][4]) == ("pkg:pypi/alib@1.0.0", "pkg:pypi/zlib@2.0.0")

    def test_no_mentions(self):
        f = facts("Let me check that.")
        assert not (f.packages or f.artifacts or f.repos or f.vulns)


def _batch(rows):
    cols = list(zip(*rows))
    names = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    types = [pa.string(), pa.int32(), pa.string(), pa.string(), pa.string(), pa.int64()]
    return pa.Table.from_arrays(
        [pa.array(c, type=t) for c, t in zip(cols, types)], names=names
    )


class TestBatchUdfs:
    def test_extractor_emits_edges_and_skips_invalid(self):
        b = _batch(
            [
                ("c1", 0, "user", "we installed pkg:pypi/x@1.0.0 today", "bash", 0),
                ("c1", 1, "robot", "we installed pkg:pypi/y@1.0.0 today", "", 0),
                ("c1", 2, "assistant", "", "", 0),
            ]
        )
        out = TranscriptExtractor()(b)
        assert out.schema.equals(EDGE_SCHEMA)
        preds = set(out["pred"].to_pylist())
        # valid turn 0: participates_in + has_sbom + uses_tool + pkg edges
        assert {"participates_in", "has_sbom", "uses_tool",
                "mentions_package", "has_metadata"} <= preds
        assert "pkg:pypi/y@1.0.0" not in set(out["obj_key"].to_pylist())

    def test_reject_router(self):
        b = _batch(
            [
                ("c1", 1, "robot", "hello", "", 0),
                ("c1", 2, "user", "", "", 0),
                ("c1", 3, "user", "fine", "", 0),
            ]
        )
        out = RejectRouter()(b)
        assert out.num_rows == 2
        assert set(out["reason"].to_pylist()) == {"invalid role: robot", "empty text"}
