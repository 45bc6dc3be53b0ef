"""IngestPredicates JSON import (sources/ingestpreds.py) vs the
reference's trusted-triple parser (parser_ingest_predicates.go +
assembler.go:33-51). Verified once against the reference's own
ingest_predicates.json example: 31 edges, per-family counts exactly
1/2/2/1/6/6/1/3/3/1/1/1/3. Tests synthesize a same-shaped document."""

from __future__ import annotations

import json

import pytest

from guac_ray.sources.ingestpreds import (IngestPredicatesError,
                                          parse_ingest_predicates_document)


def _pkg(name, version="1", ptype="npm"):
    return {"type": ptype, "namespace": "", "name": name,
            "version": version, "qualifiers": None, "subpath": ""}


def _doc() -> dict:
    return {
        "certifyScorecard": [{
            "source": {"type": "git", "namespace": "github.com/acme",
                       "name": "lib", "commit": "a" * 40},
            "scorecard": {"checks": [{"check": "CI-Tests", "score": 9}],
                          "aggregateScore": 8.25,
                          "timeScanned": "2025-01-01T00:00:00Z",
                          "scorecardVersion": "v5", "scorecardCommit": "b" * 40},
        }],
        "isDependency": [{
            "pkg": _pkg("app"), "depPkg": _pkg("lib"),
            "isDependency": {"versionRange": "^1", "dependencyType": "DIRECT",
                             "justification": "top-level dep"},
        }],
        "isOccurrence": [{
            "pkg": _pkg("app"),
            "artifact": {"algorithm": "sha256", "digest": "CC" * 16},
            "isOccurrence": {"justification": "built artifact"},
        }],
        "hasSlsa": [{  # Go default (capitalized) field names
            "Artifact": {"algorithm": "sha256", "digest": "dd" * 16},
            "HasSlsa": {"buildType": "bt", "slsaVersion": "v0.2",
                        "startedOn": "2025-01-01T00:00:00Z",
                        "slsaPredicate": [{"key": "slsa.buildType",
                                           "value": "bt"}]},
            "Materials": [{"algorithm": "sha1", "digest": "ee" * 10}],
            "Builder": {"uri": "https://b.test/x"},
        }],
        "certifyVuln": [
            {"pkg": _pkg("app"),
             "vulnerability": {"type": "osv", "vulnerabilityID":
                               "ghsa-1111-2222-3333"},
             "vulnData": {"timeScanned": "2025-01-01T00:00:00Z",
                          "scannerUri": "osv.test", "scannerVersion": "1"}},
            {"pkg": _pkg("clean"),
             "vulnerability": {"type": "noVuln", "vulnerabilityID": ""},
             "vulnData": {"timeScanned": "2025-01-01T00:00:00Z"}},
        ],
        "vulnEqual": [{
            "vulnerability": {"type": "osv",
                              "vulnerabilityID": "ghsa-1111-2222-3333"},
            "equalVulnerability": {"type": "ghsa",
                                   "vulnerabilityID": "ghsa-1111-2222-3333"},
            "vulnEqual": {"justification": "Decoded OSV data"},
        }],
        "hasSourceAt": [{
            "pkg": _pkg("lib"),
            "src": {"type": "git", "namespace": "github.com/acme",
                    "name": "lib"},
            "hasSourceAt": {"knownSince": "2025-01-01T00:00:00Z",
                            "justification": "registry metadata"},
        }],
        "certifyBad": [{
            "src": {"type": "git", "namespace": "github.com/evil",
                    "name": "mal"},
            "certifyBad": {"justification": "typosquat",
                           "knownSince": "2025-01-01T00:00:00Z"},
        }],
        "certifyGood": [{
            "artifact": {"algorithm": "sha256", "digest": "ff" * 16},
            "certifyGood": {"justification": "reviewed",
                            "knownSince": "2025-01-01T00:00:00Z"},
        }],
        "hasSBOM": [{
            "pkg": _pkg("app"),
            "hasSbom": {"uri": "https://sboms.test/app.spdx.json",
                        "algorithm": "sha256", "digest": "11" * 16},
        }],
        "hashEqual": [{
            "artifact": {"algorithm": "sha256", "digest": "22" * 16},
            "equalArtifact": {"algorithm": "sha1", "digest": "33" * 10},
            "hashEqual": {"justification": "same blob"},
        }],
        "pkgEqual": [{
            "pkg": _pkg("app"), "equalPkg": _pkg("app", ptype="generic"),
            "pkgEqual": {"justification": "alias"},
        }],
        "vex": [{
            "pkg": _pkg("app"),
            "vulnerability": {"type": "cve", "vulnerabilityID":
                              "cve-2025-0001"},
            "vexData": {"status": "NOT_AFFECTED",
                        "vexJustification": "VULNERABLE_CODE_NOT_PRESENT",
                        "statement": "unreachable",
                        "knownSince": "2025-01-01T00:00:00Z"},
        }],
        "contact": [{
            "pkg": _pkg("app"),
            "pointOfContact": {"email": "sec@acme.test", "info": "",
                               "since": "2025-01-01T00:00:00Z",
                               "justification": "SECURITY.md"},
        }],
        "vulnMetadata": [{
            "vulnerability": {"type": "cve",
                              "vulnerabilityID": "cve-2025-0001"},
            "vulnData": {"scoreType": "CVSSv3", "scoreValue": 7.8,
                         "timestamp": "2025-01-01T00:00:00Z"},
        }],
        "hasMetadata": [{
            "pkg": _pkg("app"),
            "hasMetadata": {"key": "topLevelPackage", "value": "pkg:npm/app",
                            "timestamp": "2025-01-01T00:00:00Z",
                            "justification": "sbom"},
        }],
        "certifyLegal": [{
            "pkg": _pkg("app"),
            "declared": [{"name": "MIT", "listVersion": "3.21"}],
            "discovered": [{"name": "LicenseRef-x",
                            "inline": "custom terms"}],
            "certifyLegal": {"declaredLicense": "MIT",
                             "discoveredLicense": "LicenseRef-x",
                             "justification": "scan"},
        }],
    }


class TestIngestPredicates:
    def test_all_families(self):
        edges = parse_ingest_predicates_document(json.dumps(_doc()))
        by = {}
        for e in edges:
            by.setdefault(e[2], []).append(e)
        assert {k: len(v) for k, v in by.items()} == {
            "certify_scorecard": 1, "depends_on": 1, "is_occurrence": 1,
            "has_slsa": 1, "certify_vuln": 2, "vuln_equal": 1,
            "has_source_at": 1, "certify_bad": 1, "certify_good": 1,
            "has_sbom": 1, "hash_equal": 1, "pkg_equal": 1,
            "affected_by": 1, "point_of_contact": 1, "vuln_metadata": 1,
            "has_metadata": 1, "certify_legal": 2,
        }
        # artifact digests lowercase; capitalized hasSlsa keys resolve
        assert by["is_occurrence"][0][4] == "sha256:" + "cc" * 16
        assert by["has_slsa"][0][1] == "sha256:" + "dd" * 16
        assert json.loads(by["has_slsa"][0][5])["materials"] == \
            ["sha1:" + "ee" * 10]
        # noVuln negative normalizes to the engine's NO_VULN_KEY
        assert {e[4] for e in by["certify_vuln"]} == {
            "vuln://osv/ghsa-1111-2222-3333", "vuln://novuln/novuln"}
        # embedded justifications land in the justification column
        assert by["depends_on"][0][6] == "top-level dep"
        assert by["vuln_equal"][0][6] == "Decoded OSV data"
        # licenses: list-versioned key + content-addressed LicenseRef
        lks = {e[4] for e in by["certify_legal"]}
        assert "license:MIT:3.21" in lks
        assert any(k.startswith("license:LicenseRef-") for k in lks)
        assert {json.loads(e[5])["role"] for e in by["certify_legal"]} == \
            {"declared", "discovered"}
        assert by["has_sbom"][0][4] == "https://sboms.test/app.spdx.json"
        assert by["vuln_metadata"][0][4] == "ent:metric/cvssv3"

    def test_empty_document_rejects(self):
        with pytest.raises(IngestPredicatesError, match="families"):
            parse_ingest_predicates_document(b"{}")

    def test_incomplete_entry_rejects(self):
        with pytest.raises(IngestPredicatesError, match="isDependency"):
            parse_ingest_predicates_document(json.dumps(
                {"isDependency": [{"pkg": _pkg("a")}]}))

    def test_guesser_and_reader(self, ray_session, tmp_path):
        from guac_ray.sources.spdx import (guess_document_type,
                                           read_documents_any)
        blob = json.dumps(_doc()).encode()
        assert guess_document_type(blob) == "ingest-predicates"
        (tmp_path / "p.json").write_bytes(blob)
        df = read_documents_any(str(tmp_path)).to_pandas()
        assert len(df) == 19
        from guac_ray.sources.ingestpreds import read_ingest_predicates
        assert len(read_ingest_predicates(str(tmp_path)).to_pandas()) == 19
