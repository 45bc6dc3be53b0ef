"""The committed goldens (fixtures/smoke/golden) must match what the
generator produces today — guards against silent generator drift that
would weaken every downstream oracle (FIXTURES.md F5: goldens are
committed artifacts, not just derived ones)."""

import os

import pandas as pd

REPO_GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures", "smoke", "golden")


class TestGoldenStability:
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
