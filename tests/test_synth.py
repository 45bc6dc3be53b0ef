"""Fixture-generator checks: determinism, skew profile, edge cases."""

import json

import pandas as pd

from guac_ray.synth import HOT_TOOL, generate_corpus


def _load_all(paths):
    import glob

    files = sorted(glob.glob(paths["transcripts"] + "/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


class TestSynth:
    def test_deterministic(self, smoke_corpus, tmp_path):
        p2 = generate_corpus(str(tmp_path / "again"), n_convs=200, n_shards=2)
        a = pd.read_parquet(smoke_corpus["golden_edges"])
        b = pd.read_parquet(p2["golden_edges"])
        pd.testing.assert_frame_equal(a, b)
        ta = _load_all(smoke_corpus).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        tb = _load_all(p2).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(ta, tb)

    def test_schema_and_edge_cases(self, smoke_corpus):
        df = _load_all(smoke_corpus)
        assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        assert str(df.turn_idx.dtype) == "int32"
        sizes = df.groupby("conv_id").size()
        assert sizes.min() == 1 and sizes.max() == 16      # single + max-length convs
        # byte-identical duplicate conversation exists
        texts = df.sort_values("turn_idx").groupby("conv_id")["text"].apply(tuple)
        assert texts.duplicated().any()
        # ~1% invalid rows
        invalid = (df.text == "") | (~df.role.isin(["user", "assistant", "system", "tool"]))
        assert 0 < invalid.mean() < 0.05
        # turn 0 never invalid (has_sbom anchor)
        t0 = df[df.turn_idx == 0]
        assert (t0.text != "").all()

    def test_skew_profile(self, smoke_corpus):
        df = _load_all(smoke_corpus)
        share = (df.tool == HOT_TOOL).mean()
        assert 0.30 < share < 0.50                          # F2: ~40% hot tool

    def test_goldens_nonempty_and_cover_predicates(self, smoke_corpus):
        edges = pd.read_parquet(smoke_corpus["golden_edges"])
        nodes = pd.read_parquet(smoke_corpus["golden_nodes"])
        assert len(edges) > 1000 and len(nodes) > 100
        preds = set(edges.pred)
        for p in [
            "has_sbom", "uses_tool", "mentions_package", "mentions_artifact",
            "mentions_repo", "mentions_vuln", "is_occurrence", "has_source_at",
            "hash_equal", "vuln_equal", "affected_by", "certify_scorecard",
            "certify_legal", "has_slsa", "certify_good", "certify_bad",
            "point_of_contact", "vuln_metadata", "has_metadata", "participates_in",
        ]:
            assert p in preds, p
        # linked hot tool uses canonical key, not a raw alias surface
        tools = set(edges[edges.pred == "uses_tool"].obj_key)
        assert "ent:tool/search" in tools
        assert "ent:tool/google%20search" not in tools       # alias linked
        assert "ent:tool/searcher" in tools                  # near-miss NOT linked

    def test_enrich_golden_has_novuln_negatives(self, smoke_corpus):
        enrich = pd.read_parquet(smoke_corpus["golden_enrich"])
        assert (enrich.obj_key == "vuln://novuln/novuln").sum() > 0
        assert (enrich.obj_key != "vuln://novuln/novuln").sum() > 0

    def test_stats_written(self, smoke_corpus):
        with open(smoke_corpus["dir"] + "/stats.json") as f:
            stats = json.load(f)
        assert stats["n_turns"] > 1000
