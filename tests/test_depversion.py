"""Version-range tables (model: reference depversion_test.go)."""

import pytest

from guac_ray.functions.depversion import in_range, parse_version, which_version_matches

CASES = [
    ("1.2.3", "1.2.3", True),
    ("1.2.3", "1.2.4", False),
    ("v1.2.3", "1.2.3", True),
    ("1.2.3", "*", True),
    ("1.2.3", "1.2.*", True),
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
    ("0.3.0", "^0.2.3", False),
    ("1.2.9", "~1.2.3", True),
    ("1.3.0", "~1.2.3", False),
    ("1.5.0", "1.2.3 - 2.0.0", True),
    ("2.0.1", "1.2.3 - 2.0.0", False),
    ("1.0.0-alpha", "1.0.0", False),
    ("not-a-version", "*", False),
]


@pytest.mark.parametrize("version,rng,expect", CASES)
def test_in_range(version, rng, expect):
    assert in_range(version, rng) is expect, (version, rng)


def test_which_version_matches():
    vs = ["1.0.0", "1.2.0", "1.2.5", "2.0.0"]
    assert which_version_matches(vs, "^1.2.0") == ["1.2.0", "1.2.5"]


def test_parse_version_prerelease():
    assert parse_version("1.2.3-rc.1") == (1, 2, 3, "rc.1")
