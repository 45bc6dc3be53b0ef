"""Version-range matching (reference: pkg/misc/depversion/depversion.go
— semver ranges with heuristic parsing of wildcards and dash ranges).
Pure scalar library used inside query stages; no Ray dependency.

Supported range grammars (the reference's heuristics, depversion.go:206-315):
  exact        "1.2.3"
  wildcards    "1.2.*", "1.x", "*"
  comparators  ">=1.2.0 <2.0.0", ">1.0", "<=3"
  caret        "^1.2.3"  (>=1.2.3 <2.0.0; ^0.x pins the first nonzero)
  tilde        "~1.2.3"  (>=1.2.3 <1.3.0)
  dash         "1.2.3 - 2.0.0" (inclusive)
"""

from __future__ import annotations

import re

__all__ = ["parse_version", "in_range", "which_version_matches"]

_VER_RE = re.compile(
    r"^v?(\d+)(?:\.(\d+|x|\*))?(?:\.(\d+|x|\*))?(?:[-+](.*))?$"
)


def parse_version(v: str):
    """→ (major, minor, patch, prerelease) with None for wildcard parts;
    None if unparseable."""
    m = _VER_RE.match(v.strip())
    if not m:
        return None
    def num(x):
        if x is None or x in ("x", "*"):
            return None
        return int(x)
    return (int(m.group(1)), num(m.group(2)), num(m.group(3)), m.group(4) or "")


def _cmp_key(t):
    return (t[0], t[1] or 0, t[2] or 0)


def _cmp(a, b) -> int:
    ka, kb = _cmp_key(a), _cmp_key(b)
    if ka != kb:
        return -1 if ka < kb else 1
    # release > prerelease (semver)
    pa_, pb = a[3], b[3]
    if pa_ == pb:
        return 0
    if not pa_:
        return 1
    if not pb:
        return -1
    return -1 if pa_ < pb else 1


def _match_comparator(op: str, bound, v) -> bool:
    c = _cmp(v, bound)
    return {
        ">=": c >= 0, ">": c > 0, "<=": c <= 0, "<": c < 0,
        "=": c == 0, "==": c == 0,
    }[op]


_CMP_RE = re.compile(r"(>=|<=|>|<|==|=)\s*([\w.\-+*]+)")


def in_range(version: str, rng: str) -> bool:
    """True iff ``version`` satisfies ``rng`` per the grammar above.
    Unparseable version or range → False (reference logs-and-skips)."""
    v = parse_version(version)
    if v is None:
        return False
    rng = rng.strip()
    if rng in ("", "*", "x"):
        return True

    # dash range
    if " - " in rng:
        lo_s, hi_s = rng.split(" - ", 1)
        lo, hi = parse_version(lo_s), parse_version(hi_s)
        return bool(lo and hi and _cmp(v, lo) >= 0 and _cmp(v, hi) <= 0)

    # caret / tilde
    if rng.startswith("^"):
        base = parse_version(rng[1:])
        if not base:
            return False
        if base[0] > 0:
            hi = (base[0] + 1, 0, 0, "")
        elif base[1]:
            hi = (0, (base[1] or 0) + 1, 0, "")
        else:
            hi = (0, 0, (base[2] or 0) + 1, "")
        return _cmp(v, base) >= 0 and _cmp_key(v) < _cmp_key(hi)
    if rng.startswith("~"):
        base = parse_version(rng[1:])
        if not base:
            return False
        hi = (base[0], (base[1] or 0) + 1, 0, "")
        return _cmp(v, base) >= 0 and _cmp_key(v) < _cmp_key(hi)

    # comparator conjunction
    comps = _CMP_RE.findall(rng)
    if comps:
        for op, bound_s in comps:
            bound = parse_version(bound_s)
            if not bound or not _match_comparator(op, bound, v):
                return False
        return True

    # exact or wildcard version
    pat = parse_version(rng)
    if not pat:
        return False
    if pat[1] is None:                 # "1", "1.x"
        return v[0] == pat[0]
    if pat[2] is None:                 # "1.2.*"
        return v[0] == pat[0] and v[1] == pat[1]
    return _cmp(v, pat) == 0


def which_version_matches(versions: list[str], rng: str) -> list[str]:
    """All versions satisfying the range (WhichVersionMatches analog,
    depversion.go:43-58)."""
    return [v for v in versions if in_range(v, rng)]
