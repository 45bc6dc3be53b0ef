"""ITE-6 vuln/SLSA + DSSE + scorecard + deps.dev parsers vs the
reference semantics (vuln.go, parser_slsa.go, dsse.go,
parser_scorecard.go, deps_dev.go). Verified once against the
reference's own fixtures/goldens: certify-vuln (6 CertifyVuln +
6 VulnEqual), certify-novuln (1 noVuln), the SlsaPreds v0.2 golden
(14 flattened predicate keys incl. materialized completeness
defaults), the SlsaPreds1 v1 golden (16 keys incl. the Go-%v float
``1.23456768e+08`` and the case-insensitive ``invocationID``),
oci-dsse-att (DSSE→SLSA 1+1), kubernetes-scorecard (9 checks,
date-only→midnight), and CollectedNPMReact (3 HasSourceAt +
3 IsDependency). Tests below synthesize same-shaped documents."""

from __future__ import annotations

import base64
import json

import pytest

from guac_ray.sources.depsdev import (DepsDevError, ScorecardError,
                                      parse_deps_dev_document,
                                      parse_scorecard_document)
from guac_ray.sources.ite6 import (Ite6Error, _go_float_str,
                                   parse_dsse_document,
                                   parse_ite6_document, vcs_to_src_key)


def _vuln_doc(**over) -> dict:
    d = {
        "_type": "https://in-toto.io/Statement/v0.1",
        "predicateType": "https://in-toto.io/attestation/vuln/v0.1",
        "subject": [{"name": "pkg:npm/leftpad@1.3.0"}],
        "predicate": {
            "scanner": {
                "uri": "scanner.test", "version": "9.9",
                "db": {"uri": "db.test", "version": "v1"},
                "result": [{"vulnerability_id": "GHSA-aaaa-bbbb-cccc"},
                           {"vulnerability_id": "CVE-2024-1111"}],
            },
            "metadata": {"scannedOn": "2024-02-02T10:00:00Z"},
        },
    }
    d.update(over)
    return d


def _slsa02_doc() -> dict:
    return {
        "_type": "https://in-toto.io/Statement/v0.1",
        "predicateType": "https://slsa.dev/provenance/v0.2",
        "subject": [{"name": "widgetizer",
                     "digest": {"sha256": "ab" * 16}}],
        "predicate": {
            "builder": {"id": "https://builders.test/pool@v2"},
            "buildType": "https://build.test/Workflow@v1",
            "invocation": {
                "configSource": {
                    "uri": "git+https://github.com/acme/widgetizer@main",
                    "digest": {"sha1": "11" * 10},
                    "entryPoint": "ci.yaml:release"},
            },
            "metadata": {
                "buildStartedOn": "2024-01-05T08:00:00Z",
                "completeness": {"environment": True},
            },
            "materials": [
                {"uri": "git+https://github.com/acme/widgetizer@main",
                 "digest": {"sha1": "22" * 10}},
                {"uri": "builder_vm:debian-12:20240101.2",
                 "digest": {"sha1": "33" * 10}},
            ],
        },
    }


class TestVulnAttestation:
    def test_edges(self):
        edges = parse_ite6_document(json.dumps(_vuln_doc()), source="s1")
        ve = [e for e in edges if e[2] == "vuln_equal"]
        cv = [e for e in edges if e[2] == "certify_vuln"]
        assert len(ve) == 2 and len(cv) == 2
        # every scanner result is OSV-typed; the equal side re-types
        # by id prefix (CreateVulnInput)
        assert {(e[1], e[4]) for e in ve} == {
            ("vuln://osv/ghsa-aaaa-bbbb-cccc", "vuln://ghsa/ghsa-aaaa-bbbb-cccc"),
            ("vuln://osv/cve-2024-1111", "vuln://cve/cve-2024-1111"),
        }
        assert all(e[6] == "Decoded OSV data" for e in ve)
        assert {e[4] for e in cv} == {"vuln://osv/ghsa-aaaa-bbbb-cccc",
                                      "vuln://osv/cve-2024-1111"}
        props = json.loads(cv[0][5])
        assert props == {"time_scanned": "2024-02-02T10:00:00Z",
                         "db_uri": "db.test", "db_version": "v1",
                         "scanner_uri": "scanner.test",
                         "scanner_version": "9.9"}
        assert all(e[1] == "pkg:npm/leftpad@1.3.0" for e in cv)

    def test_novuln_negative(self):
        d = _vuln_doc()
        d["predicate"]["scanner"]["result"] = []
        edges = parse_ite6_document(json.dumps(d))
        assert [(e[2], e[4]) for e in edges] == [
            ("certify_vuln", "vuln://novuln/novuln")]

    def test_bad_subject_purl_rejects(self):
        with pytest.raises(Ite6Error, match="bad purl"):
            parse_ite6_document(json.dumps(
                _vuln_doc(subject=[{"name": "not-a-purl"}])))

    def test_malformed_vuln_id_rejects(self):
        d = _vuln_doc()
        d["predicate"]["scanner"]["result"] = [{"vulnerability_id": "nodash"}]
        with pytest.raises(Ite6Error, match="malformed vulnerability"):
            parse_ite6_document(json.dumps(d))

    def test_missing_scan_time_rejects(self):
        d = _vuln_doc()
        del d["predicate"]["metadata"]
        with pytest.raises(Ite6Error, match="scannedOn"):
            parse_ite6_document(json.dumps(d))


class TestSlsa02:
    def test_occurrences_and_has_slsa(self):
        edges = parse_ite6_document(json.dumps(_slsa02_doc()))
        occ = {(e[0], e[1], e[4]) for e in edges if e[2] == "is_occurrence"}
        # subject name is not a purl/VCS uri → guac generic purl;
        # material 1 is a VCS source; material 2 generic (colons escape)
        assert occ == {
            ("package", "pkg:guac/generic/widgetizer", "sha256:" + "ab" * 16),
            ("source", "src:git/github.com/acme/widgetizer/tag=main",
             "sha1:" + "22" * 10),
            ("package",
             "pkg:guac/generic/builder_vm%3Adebian-12%3A20240101.2",
             "sha1:" + "33" * 10),
        }
        hs = [e for e in edges if e[2] == "has_slsa"]
        assert len(hs) == 1 and hs[0][1] == "sha256:" + "ab" * 16
        p = json.loads(hs[0][5])
        assert p["slsa_version"] == "https://slsa.dev/provenance/v0.2"
        assert p["build_type"] == "https://build.test/Workflow@v1"
        assert p["materials"] == ["sha1:" + "22" * 10, "sha1:" + "33" * 10]
        assert p["builder_uri"] == "https://builders.test/pool@v2"

    def test_flatten_materializes_struct_defaults(self):
        # the Go-typed round trip materializes non-omitempty zero values
        edges = parse_ite6_document(json.dumps(_slsa02_doc()))
        p = json.loads([e for e in edges if e[2] == "has_slsa"][0][5])
        sp = p["slsa_predicate"]
        assert sp["slsa.metadata.completeness.environment"] == "true"
        assert sp["slsa.metadata.completeness.materials"] == "false"
        assert sp["slsa.metadata.completeness.parameters"] == "false"
        assert sp["slsa.metadata.reproducible"] == "false"
        assert sp["slsa.invocation.configSource.entryPoint"] == \
            "ci.yaml:release"
        assert sp["slsa.materials.1.uri"] == "builder_vm:debian-12:20240101.2"
        # unknown keys are dropped by the struct schema
        d = _slsa02_doc()
        d["predicate"]["unknownField"] = {"x": 1}
        p2 = json.loads([e for e in parse_ite6_document(json.dumps(d))
                         if e[2] == "has_slsa"][0][5])
        assert not any("unknownField" in k for k in p2["slsa_predicate"])

    def test_finished_on_bug_compat(self):
        # parser_slsa.go:225 assigns FinishedOn from BuildStartedOn
        d = _slsa02_doc()
        d["predicate"]["metadata"]["buildFinishedOn"] = \
            "2024-01-05T09:00:00Z"
        edges = parse_ite6_document(json.dumps(d))
        p = json.loads([e for e in edges if e[2] == "has_slsa"][0][5])
        assert p["finished_on"] == "2024-01-05T08:00:00Z"
        assert p["started_on"] == "2024-01-05T08:00:00Z"

    def test_quoted_digest_trimmed(self):
        d = _slsa02_doc()
        d["subject"][0]["digest"] = {"sha256": "'" + "cd" * 16 + "'"}
        edges = parse_ite6_document(json.dumps(d))
        assert any(e[4] == "sha256:" + "cd" * 16 for e in edges)

    def test_unknown_predicate_type_rejects(self):
        d = _slsa02_doc()
        d["predicateType"] = "https://slsa.dev/provenance/v9"
        with pytest.raises(Ite6Error, match="Unknown SLSA PredicateType"):
            parse_ite6_document(json.dumps(d))

    def test_v01_metadata_required(self):
        d = {"_type": "https://in-toto.io/Statement/v0.1",
             "predicateType": "https://slsa.dev/provenance/v0.1",
             "subject": [],
             "predicate": {"builder": {"id": "b"},
                           "recipe": {"type": "make"}}}
        with pytest.raises(Ite6Error, match="Metadata is nil"):
            parse_ite6_document(json.dumps(d))


class TestSlsa1:
    def _doc(self) -> dict:
        return {
            "_type": "https://in-toto.io/Statement/v1",
            "predicateType": "https://slsa.dev/provenance/v1",
            "subject": [{"name": "_",
                         "digest": {"sha256": "ef" * 16}}],
            "predicate": {
                "buildDefinition": {
                    "buildType": "https://build.test/workflow/v1",
                    "externalParameters": {
                        "inputs": {"build_id": 123456768,
                                   "flag": True, "ratio": 0.5}},
                    "resolvedDependencies": [
                        {"uri": "git+https://github.com/acme/app@refs/heads/main",
                         "digest": {"gitCommit": "44" * 20}},
                        {"uri": "https://vm.test/images/2024"},
                        {"digest": {"sha256": "55" * 16}},
                    ],
                },
                "runDetails": {
                    "builder": {"id": "https://builders.test/go@v1"},
                    "metadata": {
                        "invocationId": "https://runs.test/1",
                        "startedOn": "2024-03-03T03:03:03Z"},
                },
            },
        }

    def test_materials_and_flatten(self):
        edges = parse_ite6_document(json.dumps(self._doc()))
        occ = {(e[0], e[4]) for e in edges if e[2] == "is_occurrence"}
        # digest-less dep skipped; uri-less dep is a bare material
        # (artifact only — no occurrence edge)
        assert occ == {("package", "sha256:" + "ef" * 16),
                       ("source", "gitcommit:" + "44" * 20)}
        src = [e for e in edges
               if e[2] == "is_occurrence" and e[0] == "source"][0]
        assert src[1] == "src:git/github.com/acme/app@refs/heads/main"
        p = json.loads([e for e in edges if e[2] == "has_slsa"][0][5])
        assert p["materials"] == ["gitcommit:" + "44" * 20,
                                  "sha256:" + "55" * 16]
        sp = p["slsa_predicate"]
        # Go %v float64 rendering of JSON numbers + bool lowering
        assert sp["slsa.buildDefinition.externalParameters.inputs.build_id"] \
            == "1.23456768e+08"
        assert sp["slsa.buildDefinition.externalParameters.inputs.flag"] \
            == "true"
        assert sp["slsa.buildDefinition.externalParameters.inputs.ratio"] \
            == "0.5"
        # encoding/json case-insensitive field match normalizes the
        # document's invocationId to the struct tag invocationID
        assert sp["slsa.runDetails.metadata.invocationID"] == \
            "https://runs.test/1"
        assert "slsa.runDetails.metadata.invocationId" not in sp
        # uri-only dep survives the FLATTEN even though it is not a
        # material (the reference's v1 golden pins the same)
        assert sp["slsa.buildDefinition.resolvedDependencies.1.uri"] == \
            "https://vm.test/images/2024"
        assert p["started_on"] == "2024-03-03T03:03:03Z"


class TestGoFloatFmt:
    @pytest.mark.parametrize("f,want", [
        (123456768.0, "1.23456768e+08"), (0.5, "0.5"), (100000.0, "100000"),
        (1000000.0, "1e+06"), (0.0001, "0.0001"), (0.00001, "1e-05"),
        (-2.5, "-2.5"), (0.0, "0"), (10.0, "10"), (8.9, "8.9"),
        (1234.5678, "1234.5678"), (1e21, "1e+21"),
    ])
    def test_table(self, f, want):
        assert _go_float_str(f) == want


class TestVcsToSrc:
    def test_tool_transport(self):
        assert vcs_to_src_key("git+https://github.com/acme/lib@v1.2") == \
            "src:git/github.com/acme/lib/tag=v1.2"

    def test_commit_rev(self):
        sha = "a" * 40
        assert vcs_to_src_key(f"git+https://github.com/acme/lib@{sha}") == \
            f"src:git/github.com/acme/lib/commit={sha}"

    def test_https_known_host(self):
        assert vcs_to_src_key("https://gitlab.com/acme/lib") == \
            "src:git/gitlab.com/acme/lib"

    def test_https_unknown_host_rejects(self):
        assert vcs_to_src_key("https://example.com/acme/lib") is None

    def test_plain_scheme_rejects(self):
        assert vcs_to_src_key("builder_vm:debian-12:20240101.2") is None

    def test_double_at_rejects(self):
        assert vcs_to_src_key("git+https://github.com/a/b@x@y") is None


class TestDsse:
    def _envelope(self, inner: dict) -> str:
        return json.dumps({
            "payloadType": "application/vnd.in-toto+json",
            "payload": base64.standard_b64encode(
                json.dumps(inner).encode()).decode(),
            "signatures": [{"keyid": "k1", "sig": "zz"}],
        })

    def test_unwraps_to_inner_parser(self):
        direct = parse_ite6_document(json.dumps(_vuln_doc()), source="d")
        wrapped = parse_dsse_document(self._envelope(_vuln_doc()), source="d")
        assert sorted(direct) == sorted(wrapped)

    def test_bad_base64_rejects(self):
        env = json.loads(self._envelope(_vuln_doc()))
        env["payload"] = "!!!not-base64!!!"
        with pytest.raises(Ite6Error):
            parse_dsse_document(json.dumps(env))

    def test_non_envelope_rejects(self):
        with pytest.raises(Ite6Error, match="not a DSSE envelope"):
            parse_dsse_document(json.dumps({"payload": "eHg=",
                                            "signatures": []}))

    def test_unrecognized_payload_rejects(self):
        env = json.loads(self._envelope({"hello": "world"}))
        with pytest.raises(Ite6Error, match="unrecognized DSSE payload"):
            parse_dsse_document(json.dumps(env))


def _scorecard_doc(**over) -> dict:
    d = {
        "date": "2024-04-04",
        "repo": {"name": "github.com/acme/gadget", "commit": "f" * 40},
        "scorecard": {"version": "v4.9.9", "commit": "e" * 40},
        "score": 7.5,
        "checks": [{"name": "Binary-Artifacts", "score": 10},
                   {"name": "CI-Tests", "score": 3}],
    }
    d.update(over)
    return d


class TestScorecard:
    def test_edge(self):
        edges = parse_scorecard_document(json.dumps(_scorecard_doc()))
        assert len(edges) == 1
        e = edges[0]
        assert (e[0], e[2], e[3]) == ("source", "certify_scorecard",
                                      "scorecard")
        assert e[1] == f"src:git/github.com/acme/gadget/commit={'f' * 40}"
        assert e[4] == "scorecard:" + e[1]
        p = json.loads(e[5])
        assert p["aggregate_score"] == 7.5
        assert p["checks"] == {"Binary-Artifacts": 10, "CI-Tests": 3}
        assert p["scorecard_version"] == "v4.9.9"
        # date-only scorecard timestamps become midnight UTC
        assert p["time_scanned"] == "2024-04-04T00:00:00Z"

    def test_rfc3339_passthrough(self):
        edges = parse_scorecard_document(json.dumps(
            _scorecard_doc(date="2024-04-04T12:30:00Z")))
        assert json.loads(edges[0][5])["time_scanned"] == \
            "2024-04-04T12:30:00Z"

    def test_bad_date_rejects(self):
        with pytest.raises(ScorecardError, match="date"):
            parse_scorecard_document(json.dumps(_scorecard_doc(date="xx")))

    def test_repo_without_slash(self):
        edges = parse_scorecard_document(json.dumps(
            _scorecard_doc(repo={"name": "standalone", "commit": ""})))
        assert edges[0][1] == "src:git//standalone"


def _pkg(name, version, ptype="npm", ns=""):
    return {"type": ptype, "namespace": ns, "name": name,
            "version": version, "qualifiers": None, "subpath": ""}


def _depsdev_doc() -> dict:
    return {
        "CurrentPackage": _pkg("rocket", "2.0.0"),
        "Source": {"type": "git", "namespace": "github.com/acme",
                   "name": "rocket.git", "tag": None, "commit": None},
        "Scorecard": {
            "checks": [{"check": "Maintained", "score": 9}],
            "aggregateScore": 6.25, "timeScanned": "2024-05-05T00:00:00Z",
            "scorecardVersion": "v4.8.0", "scorecardCommit": "d" * 40},
        "DepPackages": [
            {"CurrentPackage": _pkg("fuel", "1.1.0"),
             "Source": {"type": "git", "namespace": "github.com/acme",
                        "name": "fuel.git", "tag": None, "commit": None},
             "Scorecard": None, "DepPackages": None, "IsDepPackages": None,
             "UpdateTime": "2024-05-05T01:00:00Z"},
            {"CurrentPackage": _pkg("oxygen", "3.0.1"),
             "Source": None, "Scorecard": None, "DepPackages": None,
             "IsDepPackages": None, "UpdateTime": "2024-05-05T01:00:00Z"},
        ],
        "IsDepPackages": [
            {"CurrentPackageInput": _pkg("rocket", "2.0.0"),
             "DepPackageInput": _pkg("fuel", "1.1.0"),
             "IsDependency": {"versionRange": "^1.0.0",
                              "dependencyType": "DIRECT",
                              "justification": "dependency of rocket",
                              "origin": "", "collector": ""}},
        ],
        "UpdateTime": "2024-05-05T02:00:00Z",
    }


class TestDepsDev:
    def test_edges(self):
        edges = parse_deps_dev_document(json.dumps(_depsdev_doc()))
        hs = [e for e in edges if e[2] == "has_source_at"]
        sc = [e for e in edges if e[2] == "certify_scorecard"]
        dp = [e for e in edges if e[2] == "depends_on"]
        # top + fuel have sources; oxygen has none
        assert {(e[1], e[4]) for e in hs} == {
            ("pkg:npm/rocket@2.0.0", "src:git/github.com/acme/rocket.git"),
            ("pkg:npm/fuel@1.1.0", "src:git/github.com/acme/fuel.git"),
        }
        assert all(e[6] == "collected via deps.dev" for e in hs)
        # each component's OWN UpdateTime is its known_since
        by_pkg = {e[1]: json.loads(e[5])["known_since"] for e in hs}
        assert by_pkg["pkg:npm/rocket@2.0.0"] == "2024-05-05T02:00:00Z"
        assert by_pkg["pkg:npm/fuel@1.1.0"] == "2024-05-05T01:00:00Z"
        # scorecard only where present (top)
        assert len(sc) == 1 and sc[0][1] == "src:git/github.com/acme/rocket.git"
        assert json.loads(sc[0][5])["aggregate_score"] == 6.25
        assert [(e[1], e[4]) for e in dp] == [
            ("pkg:npm/rocket@2.0.0", "pkg:npm/fuel@1.1.0")]
        assert json.loads(dp[0][5])["version_range"] == "^1.0.0"

    def test_missing_current_package_rejects(self):
        with pytest.raises(DepsDevError, match="CurrentPackage"):
            parse_deps_dev_document(json.dumps({"DepPackages": []}))


class TestGuesserRouting:
    def test_routes(self):
        from guac_ray.sources.spdx import guess_document_type
        assert guess_document_type(
            json.dumps(_vuln_doc()).encode()) == "ite6"
        assert guess_document_type(
            json.dumps(_slsa02_doc()).encode()) == "ite6"
        assert guess_document_type(
            json.dumps(_scorecard_doc()).encode()) == "scorecard"
        assert guess_document_type(
            json.dumps(_depsdev_doc()).encode()) == "deps-dev"
        env = TestDsse()._envelope(_vuln_doc())
        assert guess_document_type(env.encode()) == "dsse"

    def test_read_documents_any_mixed(self, ray_session, tmp_path):
        from guac_ray.sources.spdx import read_documents_any
        (tmp_path / "a.json").write_text(json.dumps(_vuln_doc()))
        (tmp_path / "b.json").write_text(json.dumps(_scorecard_doc()))
        (tmp_path / "c.json").write_text(json.dumps(_depsdev_doc()))
        (tmp_path / "d.json").write_text(
            TestDsse()._envelope(_slsa02_doc()))
        df = read_documents_any(str(tmp_path)).to_pandas()
        preds = set(df["pred"])
        assert {"certify_vuln", "vuln_equal", "certify_scorecard",
                "has_source_at", "depends_on", "is_occurrence",
                "has_slsa"} <= preds


class TestReaders:
    def test_read_ite6(self, ray_session, tmp_path):
        from guac_ray.sources.ite6 import read_ite6
        (tmp_path / "v.json").write_text(json.dumps(_vuln_doc()))
        (tmp_path / "s.json").write_text(json.dumps(_slsa02_doc()))
        (tmp_path / "bad.json").write_text("{}")
        df = read_ite6(str(tmp_path)).to_pandas()
        assert len(df) == 8  # 2+2 vuln edges, 3 occ + 1 has_slsa
        with pytest.raises(Exception):
            read_ite6([str(tmp_path / "bad.json")],
                      strict=True).to_pandas()

    def test_read_depsdev_and_scorecard(self, ray_session, tmp_path):
        from guac_ray.sources.depsdev import read_deps_dev, read_scorecard
        (tmp_path / "d.json").write_text(json.dumps(_depsdev_doc()))
        (tmp_path / "s.json").write_text(json.dumps(_scorecard_doc()))
        assert len(read_deps_dev([str(tmp_path / "d.json")]).to_pandas()) == 4
        assert len(read_scorecard([str(tmp_path / "s.json")]).to_pandas()) == 1
