"""Property-based invariants for the round-3 operators (pure-function
parts — no Ray session needed): prefix-filter safety for ALL (n, t),
quantile rank parity with DuckDB for random (n, p), and shingle
normalization equivalence with the SQL oracle's regexp."""

import math
import re
import string
from fractions import Fraction

import numpy as np
from hypothesis import given, settings, strategies as st

from guac_ray.functions.simjoin import _prefix_len, shingle_strings


@settings(max_examples=300, deadline=None)
@given(n=st.integers(1, 2000),
       t=st.decimals(min_value="0.01", max_value="0.99", places=2))
def test_prefix_len_never_shorter_than_exact_requirement(n, t):
    """Losslessness bound: two sets with Jaccard >= t must share a
    prefix gram when prefixes have length n - ceil(t*n) + 1 (exact
    arithmetic). The float implementation must never go BELOW that."""
    tf = float(t)
    required = n - math.ceil(Fraction(t) * n) + 1
    got = _prefix_len(n, tf)
    assert got >= required
    assert got <= required + 1  # floor rule costs at most one extra gram


@settings(max_examples=60, deadline=None)
@given(n=st.integers(1, 400),
       p=st.decimals(min_value="0.00", max_value="1.00", places=2))
def test_quantile_rank_matches_duckdb(n, p):
    import duckdb

    from fractions import Fraction as F

    want = duckdb.sql(
        f"SELECT quantile_disc(x, {p}) FROM "
        f"(SELECT unnest(range({n}))::DOUBLE x)").fetchone()[0]
    r = int(math.ceil(F(str(float(p))) * n)) - 1
    r = min(max(r, 0), n - 1)
    assert float(r) == want, (n, p)


_ws_re = re.compile(r"\s+")


@settings(max_examples=300, deadline=None)
@given(text=st.text(alphabet=string.printable, max_size=120),
       n=st.sampled_from([3, 5, 10]))
def test_shingles_match_sql_substr_spec(text, n):
    """shingle_strings must equal the SQL oracle's formulation:
    distinct substr(s, i, n) for i in 1..max(len(s)-n+1, 1) over the
    trimmed, lowercased, whitespace-collapsed text."""
    s = _ws_re.sub(" ", text.lower()).strip()
    want = sorted({s[i:i + n] for i in range(max(len(s) - n + 1, 1))})
    assert shingle_strings(text, n) == want
