"""CycloneDX-JSON reader (sources/cyclonedx.py) vs the reference
parser's semantics (parser_cyclonedx.go + parser_cyclonedx_test.go
scenarios). Verified once against the reference's own fixtures:
alpine-cyclonedx (14 top-level deps), distroless (3 — the CdxDeps
golden), quarkus (299 deps / 752 occurrences), the unaffected-VEX
document (Vex 1 + VulnMetadata 3, exactly the
CycloneDXUnAffectedPredicates golden) and the affected-VEX document
(2 affected + 2 certify_vuln + 1 rating). Fixtures here are
synthesized, never copied."""

import gzip
import json
from collections import Counter

import pytest

from guac_ray.sources.cyclonedx import (CdxError, cdx_ingest,
                                        parse_cyclonedx_document,
                                        read_cyclonedx)


def _doc(**over):
    base = {
        "bomFormat": "CycloneDX",
        "specVersion": "1.4",
        "serialNumber": "urn:uuid:0000-demo",
        "metadata": {
            "timestamp": "2023-03-04T05:06:07Z",
            "component": {"bom-ref": "top", "type": "container",
                          "name": "reg.test/org/img:v2", "version": "sha256:99ff"},
        },
        "components": [],
    }
    base.update(over)
    return base


def _comp(ref, name, ver, purl=None, ctype="library", **over):
    c = {"bom-ref": ref, "type": ctype, "name": name, "version": ver}
    if purl:
        c["purl"] = purl
    c.update(over)
    return c


class TestTopLevel:
    def test_container_purl_synthesis(self):
        """parseContainerType: registry/repo:tag → repository URL +
        ?tag qualifier under pkg:guac/cdx/ (parser_cyclonedx.go:149-174)."""
        rows = parse_cyclonedx_document(json.dumps(_doc()))
        top = [r[1] for r in rows if r[2] == "has_sbom"]
        assert top == ["pkg:guac/cdx/reg.test/org/img@sha256%3A99ff?tag=v2"]
        # self-reference metadata row (parser_cyclonedx.go:271-286)
        md = [(r[1], r[4], r[6]) for r in rows if r[2] == "has_metadata"]
        assert md == [(top[0], f"topLevelPackage:{top[0]}",
                       "CycloneDX top level package self reference")]

    def test_file_type_top_level(self):
        d = _doc(metadata={"timestamp": "2023-03-04T05:06:07Z",
                           "component": {"bom-ref": "top", "type": "file",
                                         "name": "/build/webserver",
                                         "version": "sha256:abcd"}})
        rows = parse_cyclonedx_document(json.dumps(d))
        assert [r[1] for r in rows if r[2] == "has_sbom"] == \
            ["pkg:guac/cdx/sha256%3Aabcd#%2Fbuild%2Fwebserver"]

    def test_metadata_without_component_errors(self):
        d = _doc(metadata={"timestamp": "2023-03-04T05:06:07Z"})
        with pytest.raises(CdxError, match="issue #976"):
            parse_cyclonedx_document(json.dumps(d))

    def test_vex_only_doc_without_metadata_parses(self):
        """No metadata at all = VEX-only BOM: no top-level, vulnerability
        rows still emitted (the unaffected-vex fixture shape)."""
        d = _doc(vulnerabilities=[{
            "id": "CVE-2020-1", "analysis": {"state": "not_affected",
                                             "justification": "code_not_present"},
            "affects": [{"ref": "urn:x#pkg:npm/a@1"}],
            "ratings": [{"method": "CVSSv31", "score": 5.5}],
        }])
        del d["metadata"]
        rows = parse_cyclonedx_document(json.dumps(d))
        c = Counter(r[2] for r in rows)
        assert c == {"affected_by": 1, "vuln_metadata": 1}
        vex = [r for r in rows if r[2] == "affected_by"][0]
        assert vex[1] == "pkg:npm/a@1"
        assert vex[4] == "vuln://cve/cve-2020-1"
        props = json.loads(vex[5])
        assert props["status"] == "NOT_AFFECTED"
        assert props["vex_justification"] == "VULNERABLE_CODE_NOT_PRESENT"
        assert props["status_notes"] == \
            "NOT_AFFECTED:VULNERABLE_CODE_NOT_PRESENT"

    def test_zero_time_when_no_timestamp(self):
        d = _doc()
        del d["metadata"]["timestamp"]
        rows = parse_cyclonedx_document(json.dumps(d))
        props = json.loads([r for r in rows if r[2] == "has_sbom"][0][5])
        assert props["known_since"] == "1970-01-01T00:00:00Z"


class TestComponents:
    def test_os_components_skipped(self):
        d = _doc(components=[
            _comp("c1", "alpine", "3.16", ctype="operating-system"),
            _comp("c2", "liba", "1", purl="pkg:npm/liba@1"),
        ])
        rows = parse_cyclonedx_document(json.dumps(d))
        deps = [r[4] for r in rows if r[2] == "depends_on"]
        assert deps == ["pkg:npm/liba@1"]

    def test_top_level_links_every_component(self):
        """CreateTopLevelIsDeps runs UNCONDITIONALLY for CycloneDX
        (parser_cyclonedx.go:247-252) — unlike SPDX's heuristic gate."""
        d = _doc(components=[_comp("c1", "a", "1", purl="pkg:npm/a@1"),
                             _comp("c2", "b", "2", purl="pkg:npm/b@2")])
        rows = parse_cyclonedx_document(json.dumps(d))
        deps = sorted((r[4], r[6]) for r in rows if r[2] == "depends_on")
        just = "top-level package GUAC heuristic connecting to each file/package"
        assert deps == [("pkg:npm/a@1", just), ("pkg:npm/b@2", just)]

    def test_hashes_become_occurrences(self):
        d = _doc(components=[_comp(
            "c1", "a", "1", purl="pkg:npm/a@1",
            hashes=[{"alg": "SHA-256", "content": "AB12"}])])
        rows = parse_cyclonedx_document(json.dumps(d))
        occ = [(r[1], r[4], r[6]) for r in rows if r[2] == "is_occurrence"]
        assert occ == [("pkg:npm/a@1", "sha-256:ab12",
                        "cdx package with checksum")]

    def test_purl_fallback_without_purl(self):
        d = _doc(components=[_comp("c1", "tool b", "2")])
        rows = parse_cyclonedx_document(json.dumps(d))
        assert "pkg:guac/pkg/tool%20b@2" in {r[4] for r in rows
                                             if r[2] == "depends_on"}


class TestDependencyGraph:
    def test_graph_edges_and_metadata(self):
        d = _doc(components=[_comp("c1", "a", "1", purl="pkg:npm/a@1"),
                             _comp("c2", "b", "2", purl="pkg:npm/b@2")],
                 dependencies=[
                     {"ref": "top", "dependsOn": ["c1"]},
                     {"ref": "c1", "dependsOn": ["c2"]},
                     {"ref": "ghost", "dependsOn": ["c2"]},  # unresolvable
                     {"ref": "c2", "dependsOn": ["ghost"]},  # dep missing
                 ])
        rows = parse_cyclonedx_document(json.dumps(d))
        graph = [(r[1], r[4]) for r in rows
                 if r[2] == "depends_on" and r[6] == "CDX BOM Dependency"]
        # top→c1 is SKIPPED for depends_on (already in the fan-out);
        # unresolvable refs are ignored (parser_cyclonedx.go:309-346)
        assert graph == [("pkg:npm/a@1", "pkg:npm/b@2")]
        refs = [(r[1], r[6]) for r in rows if r[2] == "has_metadata"
                and r[6] == "CycloneDX top level package reference"]
        assert sorted(refs) == [("pkg:npm/a@1",
                                 "CycloneDX top level package reference"),
                                ("pkg:npm/b@2",
                                 "CycloneDX top level package reference")]


class TestVulnerabilities:
    def _vuln(self, **over):
        v = {"id": "GHSA-abcd-1234", "analysis": {"state": "exploitable"},
             "affects": [{"ref": "urn:x#pkg:npm/a@1"}],
             "published": "2022-05-06T07:08:09Z",
             "ratings": [{"method": "CVSSv3", "score": 7.1}]}
        v.update(over)
        return v

    def test_affected_emits_vex_and_certify(self):
        d = _doc(vulnerabilities=[self._vuln()])
        rows = parse_cyclonedx_document(json.dumps(d))
        c = Counter(r[2] for r in rows)
        assert c["affected_by"] == 1 and c["certify_vuln"] == 1
        assert c["vuln_metadata"] == 1
        vm = [r for r in rows if r[2] == "vuln_metadata"][0]
        assert vm[1] == "vuln://ghsa/ghsa-abcd-1234"
        assert vm[4] == "ent:metric/cvssv3"
        assert json.loads(vm[5])["score_value"] == 7.1

    def test_not_affected_skips_certify(self):
        d = _doc(vulnerabilities=[self._vuln(
            analysis={"state": "not_affected"})])
        rows = parse_cyclonedx_document(json.dumps(d))
        c = Counter(r[2] for r in rows)
        assert c["affected_by"] == 1 and "certify_vuln" not in c

    def test_statement_from_response_join(self):
        d = _doc(vulnerabilities=[self._vuln(
            analysis={"state": "resolved",
                      "response": ["will_not_fix", "update"]})])
        rows = parse_cyclonedx_document(json.dumps(d))
        props = json.loads([r for r in rows if r[2] == "affected_by"][0][5])
        assert props["statement"] == "will_not_fix,update"
        assert props["status"] == "FIXED"

    def test_unknown_state_errors(self):
        d = _doc(vulnerabilities=[self._vuln(analysis={"state": "wat"})])
        with pytest.raises(CdxError, match="unknown vulnerability status"):
            parse_cyclonedx_document(json.dumps(d))

    def test_name_version_affects_resolution(self):
        d = _doc(vulnerabilities=[self._vuln(affects=[{
            "ref": "urn:x#libwidget",
            "versions": [{"version": "2.5"},
                         {"range": ">=3.0", "status": "affected"}]}])])
        rows = parse_cyclonedx_document(json.dumps(d))
        vex = [r[1] for r in rows if r[2] == "affected_by"]
        # range entries skipped; version entries become guac purls
        assert vex == ["pkg:guac/pkg/libwidget@2.5"]

    def test_malformed_affects_ref_errors(self):
        d = _doc(vulnerabilities=[self._vuln(affects=[{"ref": "no-hash"}])])
        with pytest.raises(CdxError, match="malformed affected-package"):
            parse_cyclonedx_document(json.dumps(d))

    def test_malformed_vuln_id_errors(self):
        d = _doc(vulnerabilities=[self._vuln(id="nodash")])
        with pytest.raises(CdxError, match="malformed vulnerability"):
            parse_cyclonedx_document(json.dumps(d))


class TestRayPlumbing:
    def test_read_and_ingest(self, ray_session, tmp_path):
        d = _doc(components=[_comp("c1", "a", "1", purl="pkg:npm/a@1")])
        blob = json.dumps(d).encode()
        (tmp_path / "a.json").write_bytes(blob)
        (tmp_path / "b.json.gz").write_bytes(gzip.compress(blob))
        (tmp_path / "bad.json").write_bytes(b"nope")
        df = read_cyclonedx(str(tmp_path)).to_pandas()
        assert len(df) == 2 * 3  # has_sbom + self-md + 1 fan-out dep, 2 docs
        g = cdx_ingest(str(tmp_path), num_buckets=4)
        edges = g["edges"].to_pandas()
        sem = edges.drop(columns=["origin", "props"]).drop_duplicates()
        assert len(sem) == 3
        with pytest.raises(Exception):
            read_cyclonedx([str(tmp_path / "bad.json")],
                           strict=True).to_pandas()
