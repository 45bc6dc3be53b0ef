"""Version-range conformance: the reference's FULL test tables
(pkg/misc/depversion/depversion_test.go — Test_VersionRangeParse,
Test_ParseVersionValue, Test_WhichVersionMatches, Test_DoesRangeInclude)
ported case-for-case, plus this engine's documented extensions
('*'/'x' as match-all, '1.2.*' wildcards)."""

import pytest

from guac_ray.functions.depversion import (
    does_range_include,
    in_range,
    parse_version,
    parse_version_range,
    parse_version_value,
    which_version_matches,
)

# --- Test_VersionRangeParse (depversion_test.go:27-300) ---------------
PARSE_CASES = [
    ("", "ALL"),
    ("1.7.21", ["=1.7.21"]),
    ("3.0.3", ["=3.0.3"]),
    ("<2.0,>=0.12", ["<2.0,>=0.12"]),
    (">=1.0.0", [">=1.0.0"]),
    (">=1.0.0rc8", [">=1.0.0-rc8"]),
    (">=v1.0.0rc8", [">=1.0.0-rc8"]),
    ("[1.5.0,1.7.0]", [">=1.5.0,<=1.7.0"]),
    ("[1.5.0,)", [">=1.5.0"]),
    ("[3.0,)", [">=3.0"]),
    # caret ALWAYS bumps major — the reference has no semver ^0.x pinning
    ("^0.11", [">=0.11,<1.0.0"]),
    ("^1", [">=1,<2.0.0"]),
    ("^1.0.25", [">=1.0.25,<2.0.0"]),
    ("^3.0.0 || ^4.0.0", [">=3.0.0,<4.0.0", ">=4.0.0,<5.0.0"]),
    # caret with ANY x part collapses to the major (reference quirk)
    ("^1.0.x", [">=1.0.0,<2.0.0"]),
    ("^1.x", [">=1.0.0,<2.0.0"]),
    ("^1.3.x", [">=1.0.0,<2.0.0"]),
    ("v0.0.0-20190603091049-60506f45cf65",
     ["=0.0.0-20190603091049-60506f45cf65"]),
    ("v1.1.2", ["=1.1.2"]),
    ("1.0.0 - 2.9999.9999", [">=1.0.0,<=2.9999.9999"]),
    (">=1.0.2 <2.1.2", [">=1.0.2,<2.1.2"]),
    (">1.0.2 <=2.3.4", [">1.0.2,<=2.3.4"]),
    ("2.0.1", ["=2.0.1"]),
    ("<1.0.0 || >=2.3.1 <2.4.5 || >=2.5.2 <3.0.0",
     ["<1.0.0", ">=2.3.1,<2.4.5", ">=2.5.2,<3.0.0"]),
    ("http://asdf.com/asdf.tar.gz", "EXACT"),
    ("~1.2", [">=1.2,<1.3.0"]),
    ("~1.2.3", [">=1.2.3,<1.3.0"]),
    ("2.x", [">=2.0.0,<3.0.0"]),
    ("3.3.x", [">=3.3.0,<3.4.0"]),
    ("~0.10.x", [">=0.10.0,<0.11.0"]),
    ("latest", "ALL"),
    ("file:../dyl", "EXACT"),
]


@pytest.mark.parametrize("inp,want", PARSE_CASES,
                         ids=[c[0] or "<empty>" for c in PARSE_CASES])
def test_version_range_parse(inp, want):
    vmo = parse_version_range(inp)
    if want == "ALL":
        assert vmo.all
    elif want == "EXACT":
        assert vmo.exact == inp
    else:
        assert not vmo.all and vmo.exact is None
        assert vmo.constraints() == want


# --- Test_ParseVersionValue (depversion_test.go:305-372) --------------
VALUE_CASES = [
    ("", None),
    ("1.2.3", "1.2.3"),
    ("v1.2.3", "1.2.3"),
    ("v1.2", "1.2"),  # "should be 1.2.0 to be precise" — reference keeps 1.2
    ("v1.2.3-rc8", "1.2.3-rc8"),
    ("v1.2.3rc8", "1.2.3-rc8"),
    ("1.2.3rc8", "1.2.3-rc8"),
]


@pytest.mark.parametrize("inp,want", VALUE_CASES,
                         ids=[c[0] or "<empty>" for c in VALUE_CASES])
def test_parse_version_value(inp, want):
    sem, raw = parse_version_value(inp)
    assert sem == want
    assert raw == inp


# --- Test_WhichVersionMatches (depversion_test.go:375-470) ------------
VS1 = ["0.0.0", "0.5", "1.0.0", "1.2.3", "1.2.3-rc8", "1.2.3rc8", "1.2",
       "anythingflies"]
VS2 = ["0.0.0", "0.5", "1.0.0", "1.2.3", "1.2.4", "2.0", "1.2",
       "anythingflies"]
WHICH_CASES = [
    ("", VS1, set(VS1)),
    # a bound WITH a prerelease admits prerelease versions...
    ("<1.2.4-rc9", VS1,
     {"0.0.0", "0.5", "1.0.0", "1.2.3", "1.2", "1.2.3-rc8", "1.2.3rc8"}),
    # ...a bound WITHOUT one excludes them (Masterminds v1 rule)
    ("<1.2.3", VS2, {"0.0.0", "0.5", "1.0.0", "1.2"}),
    (">=0.5,<1.2.4", VS2, {"0.5", "1.0.0", "1.2", "1.2.3"}),
    ("<1.0 || >1.2.3", VS2, {"0.0.0", "0.5", "1.2.4", "2.0"}),
    ("anythingflies", VS1, {"anythingflies"}),
    ("=1.2.3-rc8", VS1, {"1.2.3-rc8", "1.2.3rc8"}),
    ("=1.2.3rc8", VS1, {"1.2.3-rc8", "1.2.3rc8"}),
]


@pytest.mark.parametrize("rng,vs,want", WHICH_CASES,
                         ids=[c[0] or "<empty>" for c in WHICH_CASES])
def test_which_version_matches(rng, vs, want):
    assert set(which_version_matches(vs, rng)) == want


# --- Test_DoesRangeInclude (depversion_test.go:473-519) ---------------
INCLUDE_CASES = [
    (">=1.0,<=2.0", ["1.5"], True),
    (">=1.0,<=2.0", ["1.0", "2.0", "3.0"], True),
    (">=1.0,<=2.0", ["3.0", "2.1"], False),
    (">1.0,<2.0", ["3.0", "1.0", "2.0"], False),
]


@pytest.mark.parametrize("rng,vs,want", INCLUDE_CASES)
def test_does_range_include(rng, vs, want):
    assert does_range_include(vs, rng) is want


# --- engine extensions + regression cases -----------------------------
EXT_CASES = [
    ("1.2.3", "1.2.3", True),
    ("1.2.3", "1.2.4", False),
    ("v1.2.3", "1.2.3", True),
    ("1.2.3", "*", True),          # extension: * ≡ match-all
    ("not-a-version", "*", True),  # match-all admits raw strings (like "")
    ("1.2.3", "1.2.*", True),      # extension: * wildcard ≡ x
    ("1.3.0", "1.2.*", False),
    ("1.9.9", "1.x", True),
    ("2.0.0", "1.x", False),
    ("1.5.0", ">=1.2.0 <2.0.0", True),
    ("2.0.0", ">=1.2.0 <2.0.0", False),
    ("1.2.0", ">1.2.0", False),
    ("1.2.1", ">1.2.0", True),
    ("1.4.0", "^1.2.3", True),
    ("2.0.0", "^1.2.3", False),
    ("0.2.5", "^0.2.3", True),
    ("0.9.0", "^0.2.3", True),     # reference caret: ^0.2.3 → <1.0.0
    ("1.0.0", "^0.2.3", False),
    ("1.2.9", "~1.2.3", True),
    ("1.3.0", "~1.2.3", False),
    ("1.5.0", "1.2.3 - 2.0.0", True),
    ("2.0.1", "1.2.3 - 2.0.0", False),
    ("1.0.0-alpha", "1.0.0", False),
]


@pytest.mark.parametrize("version,rng,expect", EXT_CASES)
def test_in_range(version, rng, expect):
    assert in_range(version, rng) is expect, (version, rng)


def test_which_version_matches_order():
    vs = ["1.0.0", "1.2.0", "1.2.5", "2.0.0"]
    assert which_version_matches(vs, "~1.2.0") == ["1.2.0", "1.2.5"]


def test_parse_version_prerelease():
    assert parse_version("1.2.3-rc.1") == (1, 2, 3, "rc.1")
