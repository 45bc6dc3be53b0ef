"""Version-range matching (reference: pkg/misc/depversion/depversion.go
— semver ranges with heuristic parsing of wildcards, dash ranges,
maven brackets, OR-sets, and almost-semver fixups). Pure scalar library
used inside query stages; no Ray dependency.

Conformance: tests/test_depversion.py carries the reference's full
test tables (depversion_test.go Test_VersionRangeParse /
Test_ParseVersionValue / Test_WhichVersionMatches /
Test_DoesRangeInclude) ported case-for-case, including the
reference-specific behaviors a clean-room semver library would get
wrong:
  - ``^0.11`` → ``>=0.11,<1.0.0`` (caret ALWAYS bumps major — no
    semver-style ^0.x minor pinning);
  - ``^1.3.x`` → ``>=1.0.0,<2.0.0`` (caret with any x part collapses
    to the major);
  - ``1.2.3rc8`` normalizes to ``1.2.3-rc8`` (almost-semver fixup) on
    both the range and the version side;
  - a prerelease version only matches a comparator whose own bound has
    a prerelease (Masterminds/semver v1 rule, applied per comparator);
  - unparseable ranges (``http://…``, ``file:../dyl``, bare words)
    become EXACT raw-string matchers;
  - ``""`` and ``latest`` match everything.
"""

from __future__ import annotations

import re
from itertools import zip_longest

__all__ = [
    "parse_version",
    "parse_version_value",
    "parse_version_range",
    "in_range",
    "which_version_matches",
    "does_range_include",
    "VersionMatchObject",
]

# strict semver (optional v prefix; minor/patch optional) — mirrors the
# reference's exactSvR (depversion.go:157)
_SEMVER_RE = re.compile(
    r"^v?(?P<semver>(?P<major>0|[1-9]\d*)(\.(?P<minor>0|[1-9]\d*))?"
    r"(\.(?P<patch>0|[1-9]\d*))?"
    r"(?:-(?P<prerelease>(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*)"
    r"(?:\.(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*))*))?"
    r"(?:\+(?P<metadata>[0-9a-zA-Z-]+(?:\.[0-9a-zA-Z-]+)*))?)$"
)
# like _SEMVER_RE but minor/patch may be the wildcard 'x'
# (exactSvRWithWildcard, depversion.go:160)
_WILDCARD_RE = re.compile(
    r"^v?(?P<semver>(?P<major>0|[1-9]\d*)(\.(?P<minor>x|0|[1-9]\d*))?"
    r"(\.(?P<patch>0|x|[1-9]\d*))?)$"
)
# v1.0.0rc8-style: full major.minor.patch then a prerelease with no dash
# (almostExactSvR, depversion.go:163)
_ALMOST_RE = re.compile(
    r"^v?(?P<base>(0|[1-9]\d*)\.(0|[1-9]\d*)\.(0|[1-9]\d*))"
    r"(?P<prerelease>(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*)"
    r"(?:\.(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*))*)$"
)
# maven-style [a,b] / [a,) / (a,b] ranges (rangeRegexp, depversion.go:154)
_BRACKET_RE = re.compile(
    r"^[\[\(]\s*(?P<lo>v?[0-9][\w.+-]*)?\s*,\s*(?P<hi>v?[0-9][\w.+-]*)?\s*[\]\)]$"
)
# comparator conjunction, comma or space separated (validConstraint-ish)
_CMP_TOKEN = re.compile(r"^(>=|<=|==|>|<|=)\s*(?P<ver>[\w.+-]+)$")
_DASH_RE = re.compile(r"^(?P<lo>[\w.+-]+)\s+-\s+(?P<hi>[\w.+-]+)$")


def _fix_almost(s: str) -> str | None:
    m = _ALMOST_RE.match(s)
    if not m:
        return None
    return f"{m.group('base')}-{m.group('prerelease')}"


def parse_version_value(s: str) -> tuple[str | None, str]:
    """→ (normalized semver string or None, raw) — ParseVersionValue
    analog (depversion.go:92-121): strict semver passes through
    (v-prefix stripped), almost-semver gets the dash inserted,
    everything else is raw-only."""
    s = s.strip()
    m = _SEMVER_RE.match(s)
    if m and m.group("semver"):
        return m.group("semver"), s
    fixed = _fix_almost(s)
    if fixed is not None:
        return fixed, s
    return None, s


def parse_version(v: str):
    """→ (major, minor, patch, prerelease) with None for missing parts;
    None if unparseable (after almost-semver normalization)."""
    sem, _raw = parse_version_value(v)
    if sem is None:
        return None
    m = _SEMVER_RE.match(sem)
    g = m.groupdict()
    return (
        int(g["major"]),
        int(g["minor"]) if g["minor"] is not None else None,
        int(g["patch"]) if g["patch"] is not None else None,
        g["prerelease"] or "",
    )


def _cmp_prerelease(a: str, b: str) -> int:
    """Semver §11 prerelease precedence: release > prerelease; numeric
    identifiers compare numerically and rank below alphanumeric;
    fewer identifiers rank lower when all shared ones are equal."""
    if a == b:
        return 0
    if not a:
        return 1
    if not b:
        return -1
    for x, y in zip_longest(a.split("."), b.split(".")):
        if x is None:
            return -1
        if y is None:
            return 1
        xd, yd = x.isdigit(), y.isdigit()
        if xd and yd:
            if int(x) != int(y):
                return -1 if int(x) < int(y) else 1
        elif xd:
            return -1
        elif yd:
            return 1
        elif x != y:
            return -1 if x < y else 1
    return 0


def _cmp(a, b) -> int:
    ka = (a[0], a[1] or 0, a[2] or 0)
    kb = (b[0], b[1] or 0, b[2] or 0)
    if ka != kb:
        return -1 if ka < kb else 1
    return _cmp_prerelease(a[3], b[3])


class VersionMatchObject:
    """ParseVersionRange result: exactly one of ``all``, ``exact``, or
    ``vr_set`` (a list of comparator-conjunction lists — OR of ANDs)."""

    __slots__ = ("all", "exact", "vr_set")

    def __init__(self, all=False, exact=None, vr_set=None):
        self.all = all
        self.exact = exact
        self.vr_set = vr_set or []

    def constraints(self) -> list[str]:
        """Canonical constraint strings (mirrors the reference's
        VersionRange.Constraint rendering — used by the conformance
        table)."""
        return [",".join(op + v for op, v in conj) for conj in self.vr_set]

    def match(self, version: str) -> bool:
        if self.all:
            return True
        raw = version.strip()
        if self.exact is not None:
            return raw == self.exact
        sem, _ = parse_version_value(raw)
        if sem is None:
            return False
        v = parse_version(sem)
        for conj in self.vr_set:
            ok = True
            for op, bound_s in conj:
                bound = parse_version(bound_s)
                if bound is None:
                    ok = False
                    break
                # Masterminds v1 rule, per comparator: a prerelease
                # version only matches a bound that has a prerelease
                if v[3] and not bound[3]:
                    ok = False
                    break
                c = _cmp(v, bound)
                ok = {">=": c >= 0, ">": c > 0, "<=": c <= 0, "<": c < 0,
                      "=": c == 0, "==": c == 0}[op]
                if not ok:
                    break
            if ok:
                return True
        return False


def _plus_one(n: str) -> str:
    return str(int(n) + 1)


def _constraint_of(s: str) -> list[tuple[str, str]] | None:
    """One range token (no ``||``) → comparator conjunction, or None if
    no heuristic applies (getConstraint analog, depversion.go:318-470;
    same precedence order)."""
    m = _SEMVER_RE.match(s)
    if m and m.group("semver"):
        return [("=", m.group("semver"))]
    fixed = _fix_almost(s)
    if fixed is not None:
        return [("=", fixed)]

    # wildcard check ignores a leading ~ or ^; a caret with all three
    # parts drops the MIDDLE part first (the reference's quirk that
    # sends ^1.3.x to >=1.0.0,<2.0.0)
    wild = s.removeprefix("~").removeprefix("^") if s[:1] in "~^" else s
    wild = wild.replace("*", "x")  # engine extension: 1.2.* ≡ 1.2.x
    if "x" in wild and _WILDCARD_RE.match(wild):
        if s.startswith("^"):
            parts = wild.split(".")
            if len(parts) == 3:
                wild = f"{parts[0]}.{parts[2]}"
        wm = _WILDCARD_RE.match(wild)
        major, minor = wm.group("major"), wm.group("minor")
        if minor == "x" or minor is None:
            return [(">=", f"{major}.0.0"), ("<", f"{_plus_one(major)}.0.0")]
        return [(">=", f"{major}.{minor}.0"),
                ("<", f"{major}.{_plus_one(minor)}.0")]

    if s.startswith("^"):
        m = _SEMVER_RE.match(s[1:])
        if not m or not m.group("semver"):
            return None
        # caret ALWAYS bumps the major (no semver ^0.x pinning)
        return [(">=", m.group("semver")),
                ("<", f"{_plus_one(m.group('major'))}.0.0")]
    if s.startswith("~"):
        m = _SEMVER_RE.match(s[1:])
        if not m or not m.group("semver"):
            return None
        minor = m.group("minor") or "0"
        return [(">=", m.group("semver")),
                ("<", f"{m.group('major')}.{_plus_one(minor)}.0")]

    bm = _BRACKET_RE.match(s)
    if bm:
        conj = [(">=" if s.startswith("[") else ">",
                 (bm.group("lo") or "0").removeprefix("v"))]
        if bm.group("hi"):
            conj.append(("<=" if s.endswith("]") else "<",
                         bm.group("hi").removeprefix("v")))
        return conj

    # comparator conjunction: comma- or space-separated ops; each bound
    # may itself be almost-semver (">=1.0.0rc8")
    tokens = [t for t in re.split(r"[,\s]+", s) if t]
    if tokens and all(_CMP_TOKEN.match(t) for t in tokens):
        conj = []
        for t in tokens:
            tm = _CMP_TOKEN.match(t)
            op = t[: len(t) - len(tm.group("ver"))].strip()
            # strict-semver-first normalization (isSemver before
            # almostSemVer, like the reference) — a bare _fix_almost
            # here would corrupt "1.2.3-rc8" into "1.2.3--rc8"
            sem, raw = parse_version_value(tm.group("ver"))
            conj.append((op, sem if sem is not None else raw))
        return conj

    dm = _DASH_RE.match(s)
    if dm:
        return [(">=", dm.group("lo").removeprefix("v")),
                ("<=", dm.group("hi").removeprefix("v"))]
    return None


def parse_version_range(s: str) -> VersionMatchObject:
    """ParseVersionRange analog (depversion.go:206-240)."""
    s = s.strip()
    if s in ("", "latest", "*", "x"):
        # "*"/"x" are this engine's extension (common in the transcript
        # corpus); the reference maps only ""/"latest" to All
        return VersionMatchObject(all=True)
    parts = [p.strip() for p in s.split("||")]
    vr_set = []
    for part in parts:
        if not part:
            continue
        conj = _constraint_of(part)
        if conj is None:
            if len(parts) == 1:
                return VersionMatchObject(exact=part)
            return VersionMatchObject()  # unparseable OR-set: match nothing
        vr_set.append(conj)
    return VersionMatchObject(vr_set=vr_set)


def in_range(version: str, rng: str) -> bool:
    """True iff ``version`` satisfies ``rng`` per the grammar above."""
    return parse_version_range(rng).match(version)


def which_version_matches(versions: list[str], rng: str) -> list[str]:
    """All versions satisfying the range (WhichVersionMatches analog,
    depversion.go:43-58)."""
    vmo = parse_version_range(rng)
    return [v for v in versions if vmo.match(v)]


def does_range_include(versions: list[str], rng: str) -> bool:
    """DoesRangeInclude analog (depversion.go:120-132)."""
    vmo = parse_version_range(rng)
    return any(vmo.match(v) for v in versions)
