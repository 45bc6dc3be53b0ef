"""Canonical entity keys — pure functions, no Ray dependency.

Mirrors the *semantics* of the reference's canonicalizers (SURVEY.md §1.4):
  - purl-style package keys with sorted qualifiers
    (reference: pkg/assembler/helpers/purl.go:45-95)
  - artifact keys ``algorithm:digest`` with lowercased algorithm+digest
    (reference: pkg/assembler/assembler.go:394)
  - VCS URIs split into source specs, ``@rev`` classified tag-vs-commit by the
    40-hex-char heuristic (reference: pkg/assembler/helpers/vcs.go:37-96)
  - vulnerability ids lowercased, type = prefix before the first ``-``
    (reference: pkg/assembler/helpers/vuln.go:25-39)
  - free-text path segments URL-escaped (reference: purl.go:197-209)

Every entity in the graph gets exactly one canonical string key; identical
key ⇒ identical node. That string key IS the "purl trie": the trie nesting
(type → namespace → name → version) is a presentation of the key's
segments, not separate storage.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache
from urllib.parse import quote, unquote

__all__ = [
    "sanitize",
    "PackageSpec",
    "parse_purl",
    "canonical_purl",
    "package_key",
    "package_name_key",
    "artifact_key",
    "SourceSpec",
    "parse_vcs",
    "source_key",
    "vuln_key",
    "vuln_type",
    "license_key",
    "entity_key",
    "vcs_source_key",
    "is_commit_sha",
]

# URL-escape a free-text path segment so it can never collide with key
# structure characters. safe="" escapes '/' too.
# Hot path: most segments contain no character needing escape — a single
# C-regex check skips urllib entirely; lru_cache amortizes repeated
# surfaces (entity pools repeat heavily in any real corpus).
# \Z, not $: $ also matches BEFORE a trailing newline, so a
# segment ending in '\n' would skip escaping and put a RAW
# newline into a canonical key (an invisible distinct node)
_NO_ESCAPE = re.compile(r"^[A-Za-z0-9_.~-]*\Z")


@lru_cache(maxsize=65536)
def sanitize(s: str) -> str:
    if _NO_ESCAPE.match(s):
        return s
    return quote(s, safe="")


_HEX40 = re.compile(r"^[0-9a-f]{40}\Z")  # \Z: no trailing-newline pass


def is_commit_sha(rev: str) -> bool:
    """40 lowercase-hex chars ⇒ a git commit sha (tag otherwise)."""
    return bool(_HEX40.match(rev.lower())) and rev == rev.lower()


# ---------------------------------------------------------------------------
# Packages (purl-style)
# ---------------------------------------------------------------------------

@dataclass
class PackageSpec:
    type: str
    namespace: str = ""
    name: str = ""
    version: str = ""
    qualifiers: dict[str, str] = field(default_factory=dict)
    subpath: str = ""


_PURL_RE = re.compile(
    r"""^pkg:(?P<type>[A-Za-z0-9.+-]+)/
        (?P<rest>[^?\#]+)
        (?:\?(?P<quals>[^\#]*))?
        (?:\#(?P<subpath>.*))?$""",
    re.X,
)


def parse_purl(purl: str) -> PackageSpec | None:
    """Parse a purl-style string into a PackageSpec; None if malformed.

    Unknown-structure strings return None (the reference errors on unknown
    purl types — purl.go:36-43; here the caller routes them to rejects).
    """
    m = _PURL_RE.match(purl.strip())
    if not m:
        return None
    ptype = m.group("type").lower()
    rest = m.group("rest")
    version = ""
    # '@' is the version separator ONLY when it does not start a path
    # segment: npm scoped names like pkg:npm/@scope/lib are versionless
    # (the reference's purl parser accepts unencoded scoped names)
    at = rest.rfind("@")
    if at > 0 and rest[at - 1] != "/":
        rest, version = rest[:at], unquote(rest[at + 1 :])
    parts = [p for p in rest.split("/") if p]
    if not parts:
        return None
    name = unquote(parts[-1])
    namespace = "/".join(unquote(p) for p in parts[:-1])
    quals: dict[str, str] = {}
    if m.group("quals"):
        for kv in m.group("quals").split("&"):
            if not kv:
                continue
            if "=" in kv:
                k, v = kv.split("=", 1)
            else:
                k, v = kv, ""
            quals[k.lower()] = unquote(v)
    subpath = unquote(m.group("subpath") or "")
    # per-type normalization mirroring the reference's OCI/Docker special
    # case (repository_url qualifier becomes the namespace — purl.go:97-174)
    if ptype in ("oci", "docker") and "repository_url" in quals:
        namespace = quals.pop("repository_url")
    return PackageSpec(ptype, namespace, name, version, quals, subpath)


def canonical_purl(spec: PackageSpec, with_version: bool = True) -> str:
    """Serialize back to a purl with SORTED qualifier keys so the string key
    is qualifier-order-insensitive (reference: purl.go:45-72)."""
    out = ["pkg:", spec.type.lower(), "/"]
    if spec.namespace:
        out.append("/".join(sanitize(p) for p in spec.namespace.split("/")))
        out.append("/")
    out.append(sanitize(spec.name))
    if with_version and spec.version:
        out.append("@")
        out.append(sanitize(spec.version))
    if with_version and spec.qualifiers:
        out.append("?")
        out.append(
            "&".join(
                f"{k.lower()}={sanitize(v)}"
                for k, v in sorted(spec.qualifiers.items())
            )
        )
    if with_version and spec.subpath:
        out.append("#")
        out.append(sanitize(spec.subpath))
    return "".join(out)


@lru_cache(maxsize=65536)
def package_key(purl: str) -> str | None:
    """Version-level canonical key (PkgMatchTypeSpecificVersion analog)."""
    spec = parse_purl(purl)
    return canonical_purl(spec) if spec else None


@lru_cache(maxsize=65536)
def package_name_key(purl: str) -> str | None:
    """Name-level canonical key (PkgMatchTypeAllVersions analog): the purl
    without version/qualifiers/subpath."""
    spec = parse_purl(purl)
    return canonical_purl(spec, with_version=False) if spec else None


# ---------------------------------------------------------------------------
# Artifacts
# ---------------------------------------------------------------------------

def artifact_key(algorithm: str, digest: str) -> str:
    """``algorithm:digest``, both lowercased (assembler.go:394)."""
    return f"{algorithm.strip().lower()}:{digest.strip().lower()}"


# ---------------------------------------------------------------------------
# Sources (VCS)
# ---------------------------------------------------------------------------

@dataclass
class SourceSpec:
    type: str          # e.g. "git"
    namespace: str     # host[/org...]
    name: str          # repo name
    tag: str = ""
    commit: str = ""


_VCS_RE = re.compile(
    r"""^(?:(?P<tool>[a-z]+)\+)?
        (?P<transport>[a-z][a-z0-9+]*)://
        (?P<host>[^/\s]+)
        /(?P<path>[^@\s]+?)
        (?:@(?P<rev>[^\s]+?))?/?$""",
    re.X,
)


def parse_vcs(uri: str) -> SourceSpec | None:
    """``git+https://host/org/repo@rev`` → SourceSpec.

    rev of 40 hex chars ⇒ commit, else tag (vcs.go:88-96).
    """
    m = _VCS_RE.match(uri.strip())
    if not m:
        return None
    tool = m.group("tool") or "git"
    path = m.group("path").rstrip("/")
    if path.endswith(".git"):
        path = path[: -len(".git")]
    parts = [p for p in path.split("/") if p]
    if not parts:
        return None
    name = parts[-1]
    namespace = "/".join([m.group("host")] + parts[:-1])
    rev = m.group("rev") or ""
    tag, commit = "", ""
    if rev:
        if is_commit_sha(rev):
            commit = rev.lower()
        else:
            tag = rev
    return SourceSpec(tool, namespace, name, tag, commit)


def source_key(spec: SourceSpec) -> str:
    """``type/namespace/name[/tag=..][/commit=..]`` join (assembler.go:580-590
    uses the same positional join)."""
    out = [spec.type, spec.namespace, sanitize(spec.name)]
    if spec.tag:
        out.append(f"tag={sanitize(spec.tag)}")
    if spec.commit:
        out.append(f"commit={spec.commit}")
    return "src:" + "/".join(out)


# ---------------------------------------------------------------------------
# Vulnerabilities
# ---------------------------------------------------------------------------

def vuln_type(vuln_id: str) -> str:
    """Type = lowercased prefix before the first '-' (vuln.go:30-39)."""
    vid = vuln_id.strip().lower()
    return vid.split("-", 1)[0] if "-" in vid else vid


@lru_cache(maxsize=65536)
def vuln_key(vuln_id: str) -> str:
    """VURI ``vuln://type/id`` with the whole id lowercased."""
    vid = vuln_id.strip().lower()
    return f"vuln://{vuln_type(vid)}/{sanitize(vid)}"


NO_VULN_KEY = "vuln://novuln/novuln"  # negative-fact object (vuln.go:57)


# ---------------------------------------------------------------------------
# Licenses
# ---------------------------------------------------------------------------

def license_key(name: str, list_version: str = "") -> str:
    """``name[:listVersion]`` (assembler.go:592-597)."""
    k = f"license:{sanitize(name.strip())}"
    return f"{k}:{sanitize(list_version)}" if list_version else k


# SPDX combinators are NOT licenses (license.go:27-31; the reference
# leaves exception names in — so do we)
_LICENSE_IGNORE = frozenset({"AND", "OR", "WITH"})


def parse_license_expression(exp: str) -> list[str]:
    """License expression → component license names, mirroring
    ``ParseLicenses`` (pkg/ingestor/parser/common/license.go:72-88):
    split on single spaces, trim ``()+`` from each part, drop the
    AND/OR/WITH combinators (empty parts are skipped too)."""
    out: list[str] = []
    for part in exp.split(" "):
        p = part.strip("()+")
        if not p or p in _LICENSE_IGNORE:
            continue
        out.append(p)
    return out


def hash_license(inline: str) -> str:
    """``LicenseRef-<fnv32a(inline):x>`` — a document-local LicenseRef
    becomes a content-addressed name so identical inline texts converge
    across documents (HashLicense, license.go:90-95; applied to SPDX
    OtherLicenses in parse_spdx.go:410-432)."""
    h = 2166136261
    for b in inline.encode("utf-8"):
        h ^= b
        h = (h * 16777619) & 0xFFFFFFFF
    return f"LicenseRef-{h:x}"


# ---------------------------------------------------------------------------
# Generic transcript entities (speakers, tools, conversations, contacts…)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=65536)
def entity_key(ent_type: str, name: str) -> str:
    """``ent:<type>/<sanitized name>`` for identity-less transcript entities
    (analog of GUAC's synthesized ``pkg:guac/...`` purls — purl.go:29-33)."""
    return f"ent:{ent_type.strip().lower()}/{sanitize(name.strip().lower())}"


@lru_cache(maxsize=65536)
def vcs_source_key(uri: str) -> str | None:
    """Cached ``parse_vcs`` + ``source_key`` composition (hot path)."""
    spec = parse_vcs(uri)
    return source_key(spec) if spec else None
