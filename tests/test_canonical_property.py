"""Property-based canonical-key invariants (hypothesis) — goes beyond
the reference's table-driven purl tests: idempotence, order-insensitivity
and determinism hold for ALL generated inputs, not just curated rows."""

import string

from hypothesis import given, settings, strategies as st

from guac_ray.canonical import (
    artifact_key,
    entity_key,
    package_key,
    parse_purl,
    sanitize,
    vuln_key,
)

name_st = st.text(
    alphabet=string.ascii_letters + string.digits + "._-", min_size=1, max_size=20
)
seg_st = st.text(
    alphabet=string.ascii_letters + string.digits + "._- /@#", min_size=0, max_size=24
)
qual_st = st.dictionaries(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
    name_st, min_size=0, max_size=4,
)


@settings(max_examples=200, deadline=None)
@given(t=name_st, name=name_st, ver=name_st, quals=qual_st)
def test_purl_canonical_idempotent_and_order_insensitive(t, name, ver, quals):
    items = list(quals.items())
    q1 = "&".join(f"{k}={v}" for k, v in items)
    q2 = "&".join(f"{k}={v}" for k, v in reversed(items))
    raw1 = f"pkg:{t}/{name}@{ver}" + (f"?{q1}" if q1 else "")
    raw2 = f"pkg:{t}/{name}@{ver}" + (f"?{q2}" if q2 else "")
    k1, k2 = package_key(raw1), package_key(raw2)
    assert k1 == k2                       # qualifier order never matters
    if k1 is not None:
        assert package_key(k1) == k1      # canonical form is a fixpoint


@settings(max_examples=200, deadline=None)
@given(s=seg_st)
def test_sanitize_deterministic_and_reserved_free(s):
    out = sanitize(s)
    assert out == sanitize(s)
    # no raw structural characters survive
    assert "/" not in out and " " not in out and "?" not in out


@settings(max_examples=200, deadline=None)
@given(vid=st.text(alphabet=string.ascii_letters + string.digits + "-",
                   min_size=1, max_size=24))
def test_vuln_key_case_insensitive(vid):
    assert vuln_key(vid) == vuln_key(vid.upper()) == vuln_key(vid.lower())


@settings(max_examples=100, deadline=None)
@given(alg=name_st, digest=st.text(alphabet="0123456789abcdefABCDEF",
                                   min_size=8, max_size=64))
def test_artifact_key_case_folded(alg, digest):
    assert artifact_key(alg, digest) == artifact_key(alg.upper(), digest.upper())


@settings(max_examples=100, deadline=None)
@given(t=name_st, n=seg_st.filter(lambda s: s.strip()))
def test_entity_key_stable(t, n):
    assert entity_key(t, n) == entity_key(t, n)
    assert entity_key(t, n).startswith(f"ent:{t.strip().lower()}/")


@settings(max_examples=200, deadline=None)
@given(junk=st.text(max_size=40))
def test_parse_purl_never_raises(junk):
    parse_purl(junk)  # malformed input → None, never an exception
