"""The committed goldens (fixtures/smoke/golden) must match what the
generator produces today — guards against silent generator drift that
would weaken every downstream oracle (FIXTURES.md F5: goldens are
committed artifacts, not just derived ones)."""

import os

import pandas as pd
import pytest

REPO_GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures", "smoke", "golden")


class TestGoldenStability:
    def test_doc_lang_id_matches_committed_golden(self, ray_session):
        """doc_lang_id has no SQL oracle (heuristic scoring) and the
        testdata ``lang`` label is independent of the text content (the
        synthetic docs are English-ish regardless of label), so the
        committed golden IS the correctness contract: exact predictions
        at sf0.001, drift-guarded like the smoke goldens."""
        import os

        import pytest

        sf_dir = "/root/testdata/sf0.001"
        if not os.path.isdir(sf_dir):
            pytest.skip("driver testdata not present")
        from guac_ray.pipelines.suite import doc_lang_id

        got = (doc_lang_id(sf_dir).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        fixtures_root = os.path.dirname(os.path.dirname(REPO_GOLDEN))
        want = pd.read_parquet(os.path.join(
            fixtures_root, "golden", "doc_lang_id_sf0.001.parquet"))
        pd.testing.assert_frame_equal(got, want)

    @pytest.mark.parametrize("name", [
        "neardup_docs_minhash",
        "neardup_docs_simhash",
        "events_user_approx",
        "media_decode",
        "media_neardup",
        "media_audio",
        "media_video",
        "doc_bpe_merges",
        "kg_ktruss",
        "doc_bpe_tokens",
    ])
    def test_no_oracle_query_matches_committed_golden(self, name, ray_session):
        """The four no-SQL-oracle queries (LSH pair lists, HLL sketch,
        stubbed media decode) are deterministic functions of the fixed
        testdata, so a committed sf0.001 golden pins them exactly —
        array columns are md5-normalized so the golden stays a flat
        table. Any behavior drift in banding, hashing, register layout,
        or the decode stub fails here."""
        import hashlib

        import numpy as np
        import pytest

        if not os.path.isdir("/root/testdata/sf0.001"):
            pytest.skip("driver testdata not present")
        from guac_ray.pipelines.suite import SUITE

        fn, _ = SUITE[name]
        res = fn("/root/testdata/sf0.001")
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        for c in df.columns:
            if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                df[c] = df[c].map(
                    lambda v: hashlib.md5(np.asarray(v).tobytes()).hexdigest())
        cols = sorted(df.columns)
        got = df[cols].sort_values(cols).reset_index(drop=True)
        fixtures_root = os.path.dirname(os.path.dirname(REPO_GOLDEN))
        want = pd.read_parquet(os.path.join(
            fixtures_root, "golden", f"{name}_sf0.001.parquet"))
        pd.testing.assert_frame_equal(got, want)

    def test_generator_reproduces_committed_goldens(self, smoke_corpus):
        for name, key_cols in [
            ("edges.parquet", None),
            ("nodes.parquet", None),
            ("enrich_edges.parquet", None),
            ("turn_text.parquet", None),
        ]:
            committed = pd.read_parquet(os.path.join(REPO_GOLDEN, name))
            generated = pd.read_parquet(
                os.path.join(os.path.dirname(smoke_corpus["golden_edges"]), name)
            )
            pd.testing.assert_frame_equal(committed, generated), name
