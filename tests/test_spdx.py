"""SPDX-JSON reader (sources/spdx.py) vs the reference parser's
semantics (pkg/ingestor/parser/spdx/parse_spdx.go + the conformance
scenarios of parse_spdx_test.go). Verified once against the reference's
own alpine-small golden: predicate counts match exactly
(IsDependency 11 / IsOccurrence 4 / HasSBOM 1 / HasMetadata 11 /
CertifyLegal 3) including the heuristic top-level purl
``pkg:guac/spdx/gcr.io/google-containers/alpine-latest``; the fixtures
here are synthesized (never copied) in the same syft shape."""

import gzip
import json
from collections import Counter

import pytest

from guac_ray.sources.spdx import (SpdxError, parse_spdx_document,
                                   read_spdx, spdx_ingest)


def _doc(**over):
    base = {
        "SPDXID": "SPDXRef-DOCUMENT",
        "name": "registry.test/org/img-latest",
        "spdxVersion": "SPDX-2.2",
        "creationInfo": {"created": "2023-01-02T03:04:05Z",
                         "licenseListVersion": "3.18"},
        "documentNamespace": "https://sbom.test/spdx/img",
        "packages": [],
        "files": [],
        "relationships": [],
    }
    base.update(over)
    return base


def _pkg(sid, name, ver, purl=None, **over):
    p = {"SPDXID": sid, "name": name, "versionInfo": ver}
    if purl:
        p["externalRefs"] = [{"referenceCategory": "PACKAGE_MANAGER",
                              "referenceType": "purl",
                              "referenceLocator": purl}]
    p.update(over)
    return p


def _rel(a, t, b, **over):
    r = {"spdxElementId": a, "relationshipType": t, "relatedSpdxElement": b}
    r.update(over)
    return r


class TestRequiredFields:
    def test_missing_creation_info(self):
        with pytest.raises(SpdxError, match="creationInfo"):
            parse_spdx_document(json.dumps({"SPDXID": "SPDXRef-DOCUMENT"}))

    def test_invalid_created_time(self):
        d = _doc(creationInfo={"created": "yesterday-ish"})
        with pytest.raises(SpdxError, match="invalid created time"):
            parse_spdx_document(json.dumps(d))

    def test_not_json(self):
        with pytest.raises(SpdxError, match="not valid JSON"):
            parse_spdx_document(b"\x00\x01not-json")


class TestTopLevelResolution:
    """The DESCRIBES family conformance scenarios
    (parse_spdx_test.go:71-446)."""

    def _top_keys(self, rows):
        return sorted(r[1] for r in rows if r[2] == "has_sbom")

    def test_describes_populates_top_level(self):
        d = _doc(packages=[_pkg("SPDXRef-T", "top", "1",
                                purl="pkg:oci/top@sha256:11?tag=x")],
                 relationships=[_rel("SPDXRef-DOCUMENT", "DESCRIBES",
                                     "SPDXRef-T")])
        rows = parse_spdx_document(json.dumps(d))
        assert self._top_keys(rows) == ["pkg:oci/top@sha256%3A11?tag=x"]

    def test_described_by_populates_top_level(self):
        d = _doc(packages=[_pkg("SPDXRef-T", "top", "1",
                                purl="pkg:oci/top@sha256:11?tag=x")],
                 relationships=[_rel("SPDXRef-T", "DESCRIBED_BY",
                                     "SPDXRef-DOCUMENT")])
        rows = parse_spdx_document(json.dumps(d))
        assert self._top_keys(rows) == ["pkg:oci/top@sha256%3A11?tag=x"]

    def test_multiple_describes(self):
        d = _doc(packages=[_pkg("SPDXRef-A", "a", "1", purl="pkg:npm/a@1"),
                           _pkg("SPDXRef-B", "b", "2", purl="pkg:npm/b@2")],
                 relationships=[
                     _rel("SPDXRef-DOCUMENT", "DESCRIBES", "SPDXRef-A"),
                     _rel("SPDXRef-DOCUMENT", "DESCRIBES", "SPDXRef-B")])
        rows = parse_spdx_document(json.dumps(d))
        assert self._top_keys(rows) == ["pkg:npm/a@1", "pkg:npm/b@2"]

    def test_self_describes_is_ignored(self):
        d = _doc(relationships=[_rel("SPDXRef-DOCUMENT", "DESCRIBES",
                                     "SPDXRef-DOCUMENT")])
        rows = parse_spdx_document(json.dumps(d))
        # falls back to the heuristic purl from the document name
        assert self._top_keys(rows) == \
            ["pkg:guac/spdx/registry.test/org/img-latest"]

    def test_heuristic_adds_depends_on_to_every_node(self):
        """DESCRIBED_BY without a matching package reverts to the
        heuristic AND links top → every package/file
        (parse_spdx_test.go:418, common/helpers.go:71-108)."""
        d = _doc(packages=[_pkg("SPDXRef-A", "a", "1", purl="pkg:npm/a@1"),
                           _pkg("SPDXRef-B", "b", "2", purl="pkg:npm/b@2")],
                 files=[{"SPDXID": "SPDXRef-F", "fileName": "x/y.so",
                         "checksums": [{"algorithm": "SHA1",
                                        "checksumValue": "beef01"}]}],
                 relationships=[_rel("SPDXRef-GHOST", "DESCRIBED_BY",
                                     "SPDXRef-DOCUMENT")])
        rows = parse_spdx_document(json.dumps(d))
        top = "pkg:guac/spdx/registry.test/org/img-latest"
        deps = sorted((r[1], r[4]) for r in rows if r[2] == "depends_on")
        assert deps == [
            (top, "pkg:guac/files/sha1%3Abeef01#x%2Fy.so"),
            (top, "pkg:npm/a@1"),
            (top, "pkg:npm/b@2"),
        ]


class TestRelationshipDirectionTable:
    """parse_spdx.go:434-453: CONTAINS/DEPENDS_ON forward,
    CONTAINED_BY/DEPENDENCY_OF/PACKAGE_OF reversed; others ignored."""

    def _deps(self, rels):
        d = _doc(packages=[_pkg("SPDXRef-T", "top", "1", purl="pkg:npm/top@1"),
                           _pkg("SPDXRef-A", "a", "2", purl="pkg:npm/a@2")],
                 relationships=[_rel("SPDXRef-DOCUMENT", "DESCRIBES",
                                     "SPDXRef-T")] + rels)
        rows = parse_spdx_document(json.dumps(d))
        return sorted((r[1], r[4]) for r in rows if r[2] == "depends_on")

    def test_forward_and_reverse_agree(self):
        fwd = [_rel("SPDXRef-T", "CONTAINS", "SPDXRef-A")]
        assert self._deps(fwd) == [("pkg:npm/top@1", "pkg:npm/a@2")]
        assert self._deps([_rel("SPDXRef-T", "DEPENDS_ON", "SPDXRef-A")]) == \
            self._deps(fwd)
        # reversed spellings of the same fact: "A CONTAINED_BY T" ≡
        # "T CONTAINS A" → the found node is RefB (parse_spdx.go:441-447)
        for rev in ("CONTAINED_BY", "DEPENDENCY_OF", "PACKAGE_OF"):
            assert self._deps([_rel("SPDXRef-A", rev, "SPDXRef-T")]) == \
                [("pkg:npm/top@1", "pkg:npm/a@2")], rev

    def test_other_relationships_ignored(self):
        assert self._deps([_rel("SPDXRef-T", "BUILD_TOOL_OF", "SPDXRef-A"),
                           _rel("SPDXRef-T", "OTHER", "SPDXRef-A")]) == []

    def test_file_node_preferred_over_package(self):
        """GetIsDep quirk (common/helpers.go:36-69): one edge per found
        node, first related FILE wins when the related id has both."""
        d = _doc(packages=[_pkg("SPDXRef-T", "top", "1", purl="pkg:npm/top@1"),
                           _pkg("SPDXRef-X", "x", "2", purl="pkg:npm/x@2")],
                 files=[{"SPDXID": "SPDXRef-X", "fileName": "a.so",
                         "checksums": [{"algorithm": "SHA1",
                                        "checksumValue": "beef01"}]}],
                 relationships=[_rel("SPDXRef-DOCUMENT", "DESCRIBES",
                                     "SPDXRef-T"),
                                _rel("SPDXRef-T", "CONTAINS", "SPDXRef-X")])
        rows = parse_spdx_document(json.dumps(d))
        deps = [(r[1], r[4]) for r in rows if r[2] == "depends_on"]
        assert deps == [("pkg:npm/top@1",
                         "pkg:guac/files/sha1%3Abeef01#a.so")]

    def test_relationship_comment_lands_in_justification(self):
        d = _doc(packages=[_pkg("SPDXRef-T", "top", "1", purl="pkg:npm/top@1"),
                           _pkg("SPDXRef-A", "a", "2", purl="pkg:npm/a@2")],
                 relationships=[_rel("SPDXRef-DOCUMENT", "DESCRIBES",
                                     "SPDXRef-T"),
                                _rel("SPDXRef-T", "CONTAINS", "SPDXRef-A",
                                     comment="vendored")])
        rows = parse_spdx_document(json.dumps(d))
        just = [r[6] for r in rows if r[2] == "depends_on"]
        assert just == ["Derived from SPDX CONTAINS relationship; "
                        "comment: vendored"]


class TestChecksumsAndOccurrence:
    def test_package_checksums_become_artifacts(self):
        d = _doc(packages=[_pkg("SPDXRef-A", "a", "1", purl="pkg:npm/a@1",
                                checksums=[{"algorithm": "SHA256",
                                            "checksumValue": "AB12"}])])
        rows = parse_spdx_document(json.dumps(d))
        occ = [(r[1], r[4], r[6]) for r in rows if r[2] == "is_occurrence"]
        assert occ == [("pkg:npm/a@1", "sha256:ab12",
                        "spdx package with checksum")]

    def test_empty_file_digests_skipped(self):
        """isEmptyChecksum (parse_spdx.go:471-486): all-zero and
        empty-input digests carry no identity."""
        d = _doc(files=[{
            "SPDXID": "SPDXRef-F", "fileName": "a.so",
            "checksums": [
                {"algorithm": "SHA1",
                 "checksumValue": "da39a3ee5e6b4b0d3255bfef95601890afd80709"},
                {"algorithm": "SHA256",
                 "checksumValue": "0" * 64},
                {"algorithm": "SHA1", "checksumValue": "beef01"},
            ]}])
        rows = parse_spdx_document(json.dumps(d))
        occ = [(r[1], r[4]) for r in rows if r[2] == "is_occurrence"]
        assert occ == [("pkg:guac/files/sha1%3Abeef01#a.so", "sha1:beef01")]

    def test_purl_fallback_when_no_external_ref(self):
        d = _doc(packages=[_pkg("SPDXRef-A", "tool b", "")])
        rows = parse_spdx_document(json.dumps(d))
        keys = {r[1] for r in rows if r[0] == "package"}
        assert "pkg:guac/pkg/tool%20b" in keys


class TestCertifyLegal:
    def test_license_expressions_and_licenseref(self):
        d = _doc(
            packages=[_pkg(
                "SPDXRef-A", "a", "1", purl="pkg:npm/a@1",
                licenseDeclared="Apache-2.0 AND LicenseRef-Custom",
                licenseConcluded="MIT",
                copyrightText="(c) corp",
                licenseComments="scanner output")],
            hasExtractedLicensingInfos=[
                {"licenseId": "LicenseRef-Custom",
                 "extractedText": "do what you want"}])
        rows = parse_spdx_document(json.dumps(d))
        legal = sorted(r[4] for r in rows if r[2] == "certify_legal")
        from guac_ray.canonical import hash_license

        hashed = hash_license("do what you want")
        assert legal == [f"license:Apache-2.0:3.18", f"license:{hashed}",
                         "license:MIT:3.18"]
        props = json.loads(
            [r for r in rows if r[2] == "certify_legal"][0][5])
        # the expression string itself is rewritten to the hashed name
        assert props["declared"] == f"Apache-2.0 AND {hashed}"
        assert props["discovered"] == "MIT"
        assert props["attribution"] == "(c) corp"
        just = {r[6] for r in rows if r[2] == "certify_legal"}
        assert just == {"Found in SPDX document. : scanner output"}

    def test_licenseref_not_found_fallback(self):
        d = _doc(packages=[_pkg("SPDXRef-A", "a", "1", purl="pkg:npm/a@1",
                                licenseConcluded="LicenseRef-Ghost")])
        rows = parse_spdx_document(json.dumps(d))
        from guac_ray.canonical import hash_license

        legal = [r[4] for r in rows if r[2] == "certify_legal"]
        assert legal == [f"license:{hash_license('Not found')}"]


class TestHasMetadata:
    def test_cpe_and_top_level_refs(self):
        d = _doc(
            packages=[
                _pkg("SPDXRef-T", "top", "1", purl="pkg:npm/top@1"),
                {"SPDXID": "SPDXRef-A", "name": "a", "versionInfo": "2",
                 "externalRefs": [
                     {"referenceCategory": "SECURITY",
                      "referenceType": "cpe23Type",
                      "referenceLocator": "cpe:2.3:a:corp:a:2:*"},
                     {"referenceCategory": "PACKAGE_MANAGER",
                      "referenceType": "purl",
                      "referenceLocator": "pkg:npm/a@2"}]}],
            relationships=[_rel("SPDXRef-DOCUMENT", "DESCRIBES",
                                "SPDXRef-T")])
        rows = parse_spdx_document(json.dumps(d))
        md = sorted((r[1], r[4]) for r in rows if r[2] == "has_metadata")
        assert md == [
            ("pkg:npm/a@2", "cpe:cpe:2.3:a:corp:a:2:*"),
            ("pkg:npm/a@2", "topLevelPackage:pkg:npm/top@1"),
            ("pkg:npm/top@1", "topLevelPackage:pkg:npm/top@1"),
        ]
        # replay-stability divergence: timestamps come from the doc's
        # created time, never wall clock
        for r in rows:
            if r[2] == "has_metadata":
                assert json.loads(r[5])["timestamp"] == \
                    "2023-01-02T03:04:05Z"


class TestAlpineShapedGolden:
    """A synthesized syft-shaped SBOM (2 packages with purl+cpe refs +
    hasFiles, 2 files, no DESCRIBES → heuristic top) pinned end to end —
    the same shape as the reference's alpine-small golden, whose counts
    this parser reproduces exactly (see module docstring)."""

    def _sbom(self):
        return _doc(
            name="registry.test/org/img-latest",
            packages=[
                _pkg("SPDXRef-P1", "baselib", "3.2-r1",
                     purl="pkg:alpine/baselib@3.2-r1?arch=x86_64&distro=alp-3",
                     licenseConcluded="GPL-2.0-only",
                     licenseDeclared="GPL-2.0-only",
                     externalRefs=[
                         {"referenceCategory": "SECURITY",
                          "referenceType": "cpe23Type",
                          "referenceLocator": "cpe:2.3:a:x:baselib:3.2-r1:*"},
                         {"referenceCategory": "PACKAGE_MANAGER",
                          "referenceType": "purl",
                          "referenceLocator":
                              "pkg:alpine/baselib@3.2-r1?arch=x86_64&distro=alp-3"}]),
                _pkg("SPDXRef-P2", "keys", "2.4-r1",
                     purl="pkg:alpine/keys@2.4-r1?arch=x86_64&distro=alp-3"),
            ],
            files=[
                {"SPDXID": "SPDXRef-F1", "fileName": "etc/motd",
                 "checksums": [{"algorithm": "SHA1",
                                "checksumValue": "11aa"},
                               {"algorithm": "SHA256",
                                "checksumValue": "22bb"}]},
                {"SPDXID": "SPDXRef-F2", "fileName": "usr/bin/k",
                 "checksums": [{"algorithm": "SHA1",
                                "checksumValue": "33cc"}]},
            ],
            relationships=[
                _rel("SPDXRef-P1", "CONTAINS", "SPDXRef-F1"),
                _rel("SPDXRef-P2", "CONTAINS", "SPDXRef-F2"),
            ],
        )

    def test_predicate_counts(self):
        rows = parse_spdx_document(json.dumps(self._sbom()))
        c = Counter(r[2] for r in rows)
        assert c == {
            # heuristic top → 2 packages + 3 file purls, plus the two
            # CONTAINS edges
            "depends_on": 7,
            # per file id the reference CROSS-products purls × artifacts
            # (parse_spdx.go:305-317): F1 has 2 checksums → 2×2, F2 → 1
            "is_occurrence": 5,
            "has_sbom": 1,
            # 1 cpe + 2 topLevelPackage
            "has_metadata": 3,
            "certify_legal": 1,
        }
        top = "pkg:guac/spdx/registry.test/org/img-latest"
        assert [r[1] for r in rows if r[2] == "has_sbom"] == [top]

    def test_deterministic(self):
        blob = json.dumps(self._sbom())
        assert parse_spdx_document(blob) == parse_spdx_document(blob)


class TestRayPlumbing:
    def test_read_spdx_gz_and_reject_routing(self, ray_session, tmp_path):
        blob = json.dumps(TestAlpineShapedGolden()._sbom()).encode()
        (tmp_path / "a.json").write_bytes(blob)
        (tmp_path / "b.json.gz").write_bytes(gzip.compress(blob))
        (tmp_path / "bad.json").write_bytes(b"{not json")
        ds = read_spdx(str(tmp_path))
        df = ds.to_pandas()
        # both readable docs parsed (identical → 2x rows pre-dedup),
        # the malformed one skipped
        assert len(df) == 2 * 17
        assert set(df.columns) == {
            "subj_type", "subj_key", "pred", "obj_type", "obj_key",
            "props", "justification", "origin", "collector"}
        with pytest.raises(Exception):
            read_spdx([str(tmp_path / "bad.json")], strict=True).to_pandas()

    def test_spdx_ingest_dedups_identical_docs(self, ray_session, tmp_path):
        blob = json.dumps(TestAlpineShapedGolden()._sbom()).encode()
        for n in ("a.json", "b.json"):
            (tmp_path / n).write_bytes(blob)
        g = spdx_ingest(str(tmp_path), num_buckets=4)
        edges = g["edges"].to_pandas()
        # origin (source path) and has_sbom's download_location prop
        # differ per document, so full-identity dedup keeps one copy
        # PER DOCUMENT — drop both to see semantic identity
        sem = edges.drop(columns=["origin", "props"]).drop_duplicates()
        assert len(sem) == 17
        nodes = g["nodes"].to_pandas()
        assert {"package", "artifact", "license", "manifest",
                "metadata"} <= set(nodes["node_type"])
