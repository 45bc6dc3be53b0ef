"""Canonical-key conformance (model: reference purl_test.go round-trip
tables — pkg/assembler/helpers/purl_test.go)."""

import pytest

from guac_ray.canonical import (
    artifact_key,
    entity_key,
    is_commit_sha,
    license_key,
    package_key,
    package_name_key,
    parse_purl,
    parse_vcs,
    sanitize,
    source_key,
    vuln_key,
    vuln_type,
)


class TestPurl:
    def test_qualifier_order_insensitive(self):
        a = package_key("pkg:npm/@scope/lib1@1.2.3?os=linux&arch=amd64")
        b = package_key("pkg:npm/@scope/lib1@1.2.3?arch=amd64&os=linux")
        assert a == b
        assert "arch=amd64&os=linux" in a

    def test_roundtrip_idempotent(self):
        raw = "pkg:pypi/requests@2.31.0"
        assert package_key(package_key(raw)) == package_key(raw)

    def test_name_key_strips_version(self):
        k = package_name_key("pkg:golang/github.com/org/mod@v1.0.0?a=b")
        assert k == "pkg:golang/github.com/org/mod"

    def test_type_lowercased(self):
        assert package_key("pkg:NPM/left-pad@1.0.0") == "pkg:npm/left-pad@1.0.0"

    def test_escaped_name_roundtrip(self):
        k = package_key("pkg:pypi/we%20ird7@1.0.0")
        assert k == "pkg:pypi/we%20ird7@1.0.0"

    def test_oci_repository_url_to_namespace(self):
        spec = parse_purl("pkg:oci/debian@sha256%3Aabc?repository_url=docker.io/library")
        assert spec.namespace == "docker.io/library"
        assert "repository_url" not in spec.qualifiers

    def test_malformed_returns_none(self):
        assert parse_purl("not-a-purl") is None
        assert package_key("pkg:") is None

    def test_versionless_scoped_name(self):
        # '@' starting a path segment is part of the name, not a version
        # separator (unencoded npm scope)
        spec = parse_purl("pkg:npm/@scope/lib")
        assert spec is not None
        assert (spec.namespace, spec.name, spec.version) == ("@scope", "lib", "")
        assert package_key("pkg:npm/@scope/lib") == "pkg:npm/%40scope/lib"

    def test_versioned_scoped_name(self):
        spec = parse_purl("pkg:npm/@scope/lib@1.2.3")
        assert (spec.namespace, spec.name, spec.version) == ("@scope", "lib", "1.2.3")


class TestLicense:
    def test_expression_split_drops_combinators(self):
        from guac_ray.canonical import parse_license_expression

        assert parse_license_expression("MIT OR Apache-2.0") == ["MIT", "Apache-2.0"]
        assert parse_license_expression("(MIT AND GPL-3.0-only)") == ["MIT", "GPL-3.0-only"]
        assert parse_license_expression(
            "GPL-3.0-only WITH Classpath-exception-2.0"
        ) == ["GPL-3.0-only", "Classpath-exception-2.0"]
        assert parse_license_expression("GPL-2.0+") == ["GPL-2.0"]
        assert parse_license_expression("") == []

    def test_hash_license_fnv32a(self):
        from guac_ray.canonical import hash_license

        # FNV-32a known vectors: fnv32a("") = 0x811c9dc5, fnv32a("a") = 0xe40c292c
        assert hash_license("") == "LicenseRef-811c9dc5"
        assert hash_license("a") == "LicenseRef-e40c292c"
        # deterministic + content-addressed: same text, same ref
        assert hash_license("custom text") == hash_license("custom text")


class TestVcs:
    def test_tag_vs_commit_heuristic(self):
        assert is_commit_sha("a" * 40)
        assert not is_commit_sha("v1.2.3")
        assert not is_commit_sha("A" * 40)  # uppercase hex is a tag

        tagged = parse_vcs("git+https://github.com/org/repo@v1.2.3")
        assert tagged.tag == "v1.2.3" and tagged.commit == ""
        pinned = parse_vcs("git+https://github.com/org/repo@" + "ab" * 20)
        assert pinned.commit == "ab" * 20 and pinned.tag == ""

    def test_git_suffix_stripped(self):
        s = parse_vcs("git+https://github.com/org/repo.git@v1.0.0")
        assert s.name == "repo"

    def test_source_key_shape(self):
        s = parse_vcs("git+https://github.com/org/repo@v1.0.0")
        assert source_key(s) == "src:git/github.com/org/repo/tag=v1.0.0"


class TestVuln:
    def test_lowercase_and_type(self):
        assert vuln_key("CVE-2024-1234") == vuln_key("cve-2024-1234")
        assert vuln_key("CVE-2024-1234") == "vuln://cve/cve-2024-1234"
        assert vuln_type("GHSA-abcd-efgh-ijkl") == "ghsa"


class TestMisc:
    def test_artifact_key_lowercases(self):
        assert artifact_key("SHA256", "ABCDEF") == "sha256:abcdef"

    def test_sanitize_escapes_slash_space(self):
        assert sanitize("a/b c") == "a%2Fb%20c"

    def test_license_key(self):
        assert license_key("MIT") == "license:MIT"
        assert license_key("MIT", "3.21") == "license:MIT:3.21"

    def test_entity_key_lowercases(self):
        assert entity_key("Tool", "Google Search") == "ent:tool/google%20search"
