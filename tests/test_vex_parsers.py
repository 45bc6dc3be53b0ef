"""OpenVEX + CSAF readers (sources/openvex.py, sources/csaf.py) vs the
reference parsers (parser_open_vex.go, parser_csaf.go). Verified once
against the reference's own fixtures: open-vex-affected (Vex 1 +
CertifyVuln 1), open-vex-not-affected (Vex 1), rhsa-csaf (exactly the
3-entry CsafVexIngest golden: 2 FIXED + 1 AFFECTED openssl/nginx rpm
purls; the parser test wants ONLY Vex). Fixtures here are synthesized."""

import json
from collections import Counter

import pytest

from guac_ray.sources.csaf import CsafError, parse_csaf_document, read_csaf
from guac_ray.sources.openvex import (OpenVexError, parse_openvex_document,
                                      read_openvex)


def _ov(**over):
    base = {
        "@context": "https://openvex.dev/ns/v0.2.0",
        "@id": "https://vex.test/doc-1",
        "timestamp": "2024-03-03T00:00:00Z",
        "statements": [],
    }
    base.update(over)
    return base


class TestOpenVex:
    def test_affected_emits_vex_and_certify(self):
        d = _ov(statements=[{
            "vulnerability": {"name": "CVE-2014-1234"},
            "products": [{"@id": "pkg:apk/wolfi/bash@1.0.0"}],
            "status": "affected",
            "action_statement": "upgrade now",
        }])
        rows = parse_openvex_document(json.dumps(d))
        assert Counter(r[2] for r in rows) == \
            {"affected_by": 1, "certify_vuln": 1}
        vex = [r for r in rows if r[2] == "affected_by"][0]
        assert (vex[1], vex[4]) == ("pkg:apk/wolfi/bash@1.0.0",
                                    "vuln://cve/cve-2014-1234")
        props = json.loads(vex[5])
        assert props["statement"] == "upgrade now"
        assert props["status"] == "AFFECTED"
        assert props["document_id"] == "https://vex.test/doc-1"
        cv = [r for r in rows if r[2] == "certify_vuln"][0]
        assert json.loads(cv[5])["time_scanned"] == "2024-03-03T00:00:00Z"

    def test_not_affected_impact_statement_and_justification(self):
        d = _ov(statements=[{
            "vulnerability": {"name": "CVE-2014-1234"},
            "products": [{"@id": "pkg:npm/a@1"}],
            "status": "not_affected",
            "justification": "vulnerable_code_not_present",
            "impact_statement": "code path unreachable",
        }])
        rows = parse_openvex_document(json.dumps(d))
        assert [r[2] for r in rows] == ["affected_by"]
        props = json.loads(rows[0][5])
        assert props["statement"] == "code path unreachable"
        assert props["vex_justification"] == "VULNERABLE_CODE_NOT_PRESENT"

    def test_v01_string_spellings(self):
        """OpenVEX v0.1: vulnerability and products as plain strings."""
        d = _ov(statements=[{
            "vulnerability": "CVE-2014-1234",
            "products": ["pkg:npm/a@1"],
            "status": "fixed",
        }])
        rows = parse_openvex_document(json.dumps(d))
        assert [(r[1], r[4]) for r in rows] == \
            [("pkg:npm/a@1", "vuln://cve/cve-2014-1234")]
        assert json.loads(rows[0][5])["statement"] == ""

    def test_under_investigation_emits_certify(self):
        d = _ov(statements=[{
            "vulnerability": "CVE-2014-1234",
            "products": ["pkg:npm/a@1"],
            "status": "under_investigation",
        }])
        rows = parse_openvex_document(json.dumps(d))
        assert Counter(r[2] for r in rows) == \
            {"affected_by": 1, "certify_vuln": 1}

    def test_invalid_status_errors(self):
        d = _ov(statements=[{"vulnerability": "CVE-1-2",
                             "products": ["pkg:npm/a@1"],
                             "status": "wat"}])
        with pytest.raises(OpenVexError, match="invalid status"):
            parse_openvex_document(json.dumps(d))

    def test_missing_timestamp_errors(self):
        d = _ov(statements=[])
        del d["timestamp"]
        with pytest.raises(OpenVexError, match="timestamp"):
            parse_openvex_document(json.dumps(d))


def _csaf(**over):
    base = {
        "document": {"tracking": {
            "id": "CSAF-2024:7",
            "current_release_date": "2024-03-23T11:14:00Z"}},
        "product_tree": {
            "branches": [
                {"name": "vendor", "branches": [
                    {"name": "SUP1",
                     "product": {"product_id": "SUP1",
                                 "product_identification_helper": {
                                     "purl": "pkg:rpm/v/a@1"}}},
                    {"name": "SUP2",
                     "product": {"product_id": "SUP2",
                                 "product_identification_helper": {}}},
                ]},
            ],
            "relationships": [
                {"product_reference": "SUP1",
                 "full_product_name": {"product_id": "SUP1-on-plat"}},
                {"product_reference": "SUP2",
                 "full_product_name": {"product_id": "SUP2-on-plat"}},
            ],
        },
        "vulnerabilities": [],
    }
    base.update(over)
    return base


class TestCsaf:
    def test_two_hop_resolution_and_statuses(self):
        d = _csaf(vulnerabilities=[{
            "cve": "CVE-2023-0286",
            "product_status": {"known_affected": ["SUP1-on-plat"],
                               "fixed": ["SUP2-on-plat"]},
            "remediations": [{"details": "apply patch",
                              "product_ids": ["SUP1-on-plat"]}],
        }])
        rows = parse_csaf_document(json.dumps(d))
        # SUP2 resolves to a branch WITHOUT a purl helper → skipped
        assert [(r[1], r[4]) for r in rows] == \
            [("pkg:rpm/v/a@1", "vuln://cve/cve-2023-0286")]
        props = json.loads(rows[0][5])
        assert props["status"] == "AFFECTED"
        assert props["statement"] == "apply patch"
        assert props["known_since"] == "2024-03-23T11:14:00Z"
        assert props["document_id"] == "CSAF-2024:7"

    def test_not_affected_reads_impact_threats(self):
        d = _csaf(vulnerabilities=[{
            "cve": "CVE-2023-1",
            "product_status": {"known_not_affected": ["SUP1-on-plat"]},
            "threats": [
                {"category": "impact", "details": "not shipped",
                 "product_ids": ["SUP1-on-plat"]},
                {"category": "exploit_status", "details": "irrelevant",
                 "product_ids": ["SUP1-on-plat"]},
            ],
            "flags": [{"label": "vulnerable_code_not_present",
                       "product_ids": ["SUP1-on-plat"]}],
        }])
        rows = parse_csaf_document(json.dumps(d))
        props = json.loads(rows[0][5])
        assert props["status"] == "NOT_AFFECTED"
        assert props["statement"] == "not shipped"
        assert props["vex_justification"] == "VULNERABLE_CODE_NOT_PRESENT"

    def test_recommended_maps_to_affected(self):
        d = _csaf(vulnerabilities=[{
            "cve": "CVE-2023-2",
            "product_status": {"recommended": ["SUP1-on-plat"]},
        }])
        rows = parse_csaf_document(json.dumps(d))
        assert json.loads(rows[0][5])["status"] == "AFFECTED"

    def test_unresolvable_product_skipped_not_error(self):
        d = _csaf(vulnerabilities=[{
            "cve": "CVE-2023-3",
            "product_status": {"fixed": ["GHOST-on-plat"]},
        }])
        assert parse_csaf_document(json.dumps(d)) == []

    def test_malformed_cve_errors(self):
        d = _csaf(vulnerabilities=[{"cve": "nodash",
                                    "product_status": {}}])
        with pytest.raises(CsafError, match="malformed vulnerability"):
            parse_csaf_document(json.dumps(d))

    def test_cyclic_tree_terminates(self):
        d = _csaf()
        # self-referencing branch list (JSON can't cycle, but repeated
        # names exercise the visited set's id()-keying)
        loop = {"name": "L", "branches": []}
        loop["branches"].append({"name": "L", "branches": []})
        d["product_tree"]["branches"].append(loop)
        d["vulnerabilities"] = [{
            "cve": "CVE-2023-4",
            "product_status": {"fixed": ["SUP1-on-plat"]}}]
        rows = parse_csaf_document(json.dumps(d))
        assert len(rows) == 1


class TestRayPlumbing:
    def test_read_openvex_and_csaf(self, ray_session, tmp_path):
        ov = _ov(statements=[{"vulnerability": "CVE-2014-1",
                              "products": ["pkg:npm/a@1"],
                              "status": "fixed"}])
        (tmp_path / "ov").mkdir()
        (tmp_path / "ov" / "a.json").write_text(json.dumps(ov))
        (tmp_path / "ov" / "bad.json").write_text("{nope")
        df = read_openvex(str(tmp_path / "ov")).to_pandas()
        assert list(df["pred"]) == ["affected_by"]

        cs = _csaf(vulnerabilities=[{
            "cve": "CVE-2023-0286",
            "product_status": {"fixed": ["SUP1-on-plat"]}}])
        (tmp_path / "cs").mkdir()
        (tmp_path / "cs" / "a.json").write_text(json.dumps(cs))
        df2 = read_csaf(str(tmp_path / "cs")).to_pandas()
        assert list(df2["pred"]) == ["affected_by"]
        assert df2["collector"].iloc[0] == "guac_ray/csaf"


class TestDocumentGuesser:
    """guess_document_type + read_documents_any (the reference's
    first-match-wins content-sniffer chain for the four implemented
    families — type_spdx/type_cyclonedx/type_openvex/type_csaf.go).
    Verified against all 35 reference example files: every SPDX /
    CycloneDX / OpenVEX / CSAF fixture routes to its parser, every
    other type (scorecard, ITE-6, DSSE, crev) returns None."""

    def test_sniffs_each_family(self):
        from guac_ray.sources.spdx import guess_document_type

        assert guess_document_type(
            json.dumps({"spdxVersion": "SPDX-2.2"}).encode()) == "spdx-json"
        assert guess_document_type(
            json.dumps({"bomFormat": "CycloneDX"}).encode()) == \
            "cyclonedx-json"
        assert guess_document_type(
            json.dumps({"@id": "x", "statements": []}).encode()) == \
            "open-vex"
        assert guess_document_type(json.dumps(
            {"document": {"csaf_version": "2.0"}}).encode()) == "csaf"
        assert guess_document_type(b"not json") is None
        assert guess_document_type(json.dumps({"other": 1}).encode()) is None

    def test_mixed_directory_roundtrip(self, ray_session, tmp_path):
        from guac_ray.sources.spdx import read_documents_any

        spdx = {"SPDXID": "SPDXRef-DOCUMENT", "name": "d",
                "spdxVersion": "SPDX-2.2",
                "creationInfo": {"created": "2023-01-02T03:04:05Z"},
                "documentNamespace": "ns", "packages": [], "files": [],
                "relationships": []}
        ov = _ov(statements=[{"vulnerability": "CVE-2014-1",
                              "products": ["pkg:npm/a@1"],
                              "status": "fixed"}])
        (tmp_path / "a.json").write_text(json.dumps(spdx))
        (tmp_path / "b.json").write_text(json.dumps(ov))
        (tmp_path / "c.json").write_text(json.dumps({"who": "knows"}))
        df = read_documents_any(str(tmp_path)).to_pandas()
        # spdx heuristic top → has_sbom; openvex → affected_by; c skipped
        assert sorted(df["pred"]) == ["affected_by", "has_sbom"]
        assert set(df["collector"]) == {"guac_ray/spdx", "guac_ray/openvex"}
        with pytest.raises(Exception):
            read_documents_any([str(tmp_path / "c.json")],
                               strict=True).to_pandas()


class TestSbomCliVerb:
    def test_sbom_verb_builds_graph(self, ray_session, tmp_path, capsys):
        from guac_ray.__main__ import cmd_sbom

        spdx = {"SPDXID": "SPDXRef-DOCUMENT", "name": "img",
                "spdxVersion": "SPDX-2.2",
                "creationInfo": {"created": "2023-01-02T03:04:05Z"},
                "documentNamespace": "ns",
                "packages": [{"SPDXID": "SPDXRef-A", "name": "a",
                              "versionInfo": "1"}],
                "files": [], "relationships": []}
        ov = _ov(statements=[{"vulnerability": "CVE-2014-1",
                              "products": ["pkg:npm/a@1"],
                              "status": "affected"}])
        src = tmp_path / "docs"
        src.mkdir()
        (src / "a.json").write_text(json.dumps(spdx))
        (src / "b.json").write_text(json.dumps(ov))
        (src / "junk.json").write_text("{}")

        class A:
            in_dir, out_dir = str(src), str(tmp_path / "graph")
            num_buckets, strict, num_cpus = 8, False, None
        assert cmd_sbom(A()) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # spdx: has_sbom + heuristic dep + topLevel metadata (2 pkgs);
        # openvex: affected_by + certify_vuln; junk skipped
        assert out["edges"] >= 5 and out["nodes"] >= 4
        import pyarrow.parquet as pq

        preds = set(pq.read_table(
            str(tmp_path / "graph" / "edges"))["pred"].to_pylist())
        assert {"has_sbom", "affected_by", "certify_vuln"} <= preds
