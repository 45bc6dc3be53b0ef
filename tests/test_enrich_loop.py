"""Multi-round collection loop (collectsub analog, SURVEY §2.1):
round k's identifiers output feeds round k+1's enrichment, and the new
triples assemble into the graph without disturbing dedup."""

import pandas as pd
import pytest

from guac_ray.schemas import EDGE_IDENTITY


class TestEnrichLoop:
    def test_identifiers_roundtrip(self, ray_session, smoke_corpus, tmp_path):
        import ray.data as rd

        from guac_ray.stages.enrich import certify_vulns
        from guac_ray.state.checkpoint import run_graph_job

        out = str(tmp_path / "loop")
        r1 = run_graph_job(
            smoke_corpus["transcripts"], out,
            catalog_path=smoke_corpus["catalog"], num_partitions=2, num_buckets=16,
        )
        idents = pd.read_parquet(r1["identifiers_dir"])
        assert set(idents.kind) <= {"package", "source", "artifact"}
        assert len(idents) == len(idents.drop_duplicates())

        # round 2: enrich the discovered packages (certifier analog)
        nodes = rd.read_parquet(r1["nodes_dir"])
        enrich = certify_vulns(nodes, smoke_corpus["vulndb"]).to_pandas()
        pkg_idents = set(idents[idents.kind == "package"].identifier)
        assert set(enrich.subj_key) == pkg_idents

        # merged graph: base + enrichment edges stay distinct as a set
        base = pd.read_parquet(r1["edges_dir"])
        merged = pd.concat(
            [base[EDGE_IDENTITY], enrich[EDGE_IDENTITY]], ignore_index=True
        )
        assert not merged.duplicated().any()

        golden = pd.read_parquet(smoke_corpus["golden_enrich"])
        got = set(map(tuple, enrich[EDGE_IDENTITY].itertuples(index=False)))
        want = set(map(tuple, golden[EDGE_IDENTITY].itertuples(index=False)))
        assert got == want
