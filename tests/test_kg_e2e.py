"""End-to-end KG construction vs goldens: triple P/R ≥ 0.95 (negatives
included) and the per-turn text-equality invariant under stable ordering
(BASELINE.md targets; reference e2e model: sort-normalize-diff)."""

import pandas as pd
import pytest

from guac_ray.schemas import EDGE_IDENTITY


def _pr(result: set, golden: set):
    tp = len(result & golden)
    precision = tp / len(result) if result else 0.0
    recall = tp / len(golden) if golden else 0.0
    return precision, recall


@pytest.fixture(scope="module")
def graph(ray_session, smoke_corpus):
    from guac_ray.pipelines.kg import build_graph

    g = build_graph(
        smoke_corpus["transcripts"],
        catalog_path=smoke_corpus["catalog"],
        sort=True,
        num_buckets=16,
        extract_concurrency=(1, 2),
    )
    return {
        "edges": g["edges"].to_pandas(),
        "nodes": g["nodes"].to_pandas(),
    }


class TestKgE2e:
    def test_edge_pr(self, graph, smoke_corpus):
        golden = pd.read_parquet(smoke_corpus["golden_edges"])
        got = set(map(tuple, graph["edges"][EDGE_IDENTITY].itertuples(index=False)))
        want = set(map(tuple, golden[EDGE_IDENTITY].itertuples(index=False)))
        p, r = _pr(got, want)
        assert p >= 0.95, f"precision {p:.4f}"
        assert r >= 0.95, f"recall {r:.4f}"
        # this corpus is fully parseable → expect exact parity
        assert p == 1.0 and r == 1.0, (
            f"p={p:.4f} r={r:.4f} extra={list(got - want)[:3]} missing={list(want - got)[:3]}"
        )

    def test_edges_are_distinct(self, graph):
        e = graph["edges"][EDGE_IDENTITY]
        assert not e.duplicated().any()

    def test_node_pr(self, graph, smoke_corpus):
        golden = pd.read_parquet(smoke_corpus["golden_nodes"])
        got = set(map(tuple, graph["nodes"][["node_type", "node_key"]].itertuples(index=False)))
        want = set(map(tuple, golden[["node_type", "node_key"]].itertuples(index=False)))
        p, r = _pr(got, want)
        assert p == 1.0 and r == 1.0, (
            f"p={p:.4f} r={r:.4f} extra={list(got - want)[:3]} missing={list(want - got)[:3]}"
        )

    def test_turn_text_invariant(self, ray_session, smoke_corpus):
        from guac_ray.pipelines.kg import turn_text

        got = turn_text(smoke_corpus["transcripts"]).to_pandas().reset_index(drop=True)
        want = pd.read_parquet(smoke_corpus["golden_turn_text"])
        pd.testing.assert_frame_equal(got, want)

    def test_rejects_routed(self, ray_session, smoke_corpus):
        from guac_ray.pipelines.kg import read_transcripts, rejects

        rej = rejects(read_transcripts(smoke_corpus["transcripts"])).to_pandas()
        assert len(rej) > 0
        assert set(rej.columns) == {"conv_id", "turn_idx", "role", "text", "reason"}
        assert (rej.turn_idx > 0).all()


class TestIngestPredicates:
    def test_trusted_import_unions_and_dedups(self, ray_session, smoke_corpus):
        """ingest_predicates: pre-derived edges import directly; identical
        edges imported twice (or also present in `extra`) collapse."""
        from guac_ray.pipelines.kg import ingest_predicates

        golden = pd.read_parquet(smoke_corpus["golden_enrich"])
        g = ingest_predicates(smoke_corpus["golden_enrich"])
        edges = g["edges"].to_pandas()
        assert len(edges) == len(golden[EDGE_IDENTITY].drop_duplicates())

        # import the same file as BOTH path and extra → still deduped
        import ray.data as rd

        g2 = ingest_predicates(
            smoke_corpus["golden_enrich"],
            extra=rd.read_parquet(smoke_corpus["golden_enrich"]),
        )
        assert g2["edges"].count() == len(edges)
        nodes = g2["nodes"].to_pandas()
        assert set(nodes.node_type) >= {"package", "vulnerability"}


class TestEnrichment:
    def test_certify_vuln_with_novuln_negatives(self, ray_session, graph, smoke_corpus, tmp_path):
        import ray.data as rd

        from guac_ray.stages.enrich import certify_vulns

        nodes = rd.from_pandas(graph["nodes"])
        got_df = certify_vulns(nodes, smoke_corpus["vulndb"]).to_pandas()
        golden = pd.read_parquet(smoke_corpus["golden_enrich"])
        got = set(map(tuple, got_df[EDGE_IDENTITY].itertuples(index=False)))
        want = set(map(tuple, golden[EDGE_IDENTITY].itertuples(index=False)))
        p, r = _pr(got, want)
        assert p == 1.0 and r == 1.0, (
            f"p={p:.4f} r={r:.4f} extra={list(got - want)[:3]} missing={list(want - got)[:3]}"
        )

    def test_anti_join_skips_scanned(self, ray_session, graph, smoke_corpus):
        import ray.data as rd

        from guac_ray.stages.enrich import certify_vulns

        nodes = rd.from_pandas(graph["nodes"])
        all_pkgs = set(graph["nodes"].query("node_type == 'package'").node_key)
        scanned = set(sorted(all_pkgs)[: len(all_pkgs) // 2])
        out = certify_vulns(nodes, smoke_corpus["vulndb"], scanned=scanned).to_pandas()
        assert set(out.subj_key).isdisjoint(scanned)
        assert set(out.subj_key) == all_pkgs - scanned

    def test_certify_deps_matches_depdb(self, ray_session, graph, smoke_corpus):
        """deps.dev-style enrichment: every package node's NAME-level
        lookup emits exactly its depdb adjacency with the requirement
        range in props."""
        import json

        import ray.data as rd

        from guac_ray.stages.enrich import certify_deps, load_depdb

        nodes = rd.from_pandas(graph["nodes"])
        got = certify_deps(nodes, smoke_corpus["depdb"]).to_pandas()
        dmap = load_depdb(smoke_corpus["depdb"])
        want = {
            (k, dep, req)
            for k in graph["nodes"].query("node_type == 'package'").node_key
            for dep, req in dmap.get(k.split("@", 1)[0], ())
        }
        got_set = {
            (r.subj_key, r.obj_key, json.loads(r.props)["requirement"])
            for r in got.itertuples(index=False)
        }
        assert want and got_set == want
        assert (got.origin == "guac_ray/depdb").all()
        assert (got.pred == "depends_on").all()

    def test_patch_plan_blast_radius_over_dependencies(
        self, ray_session, graph, smoke_corpus
    ):
        """The reference's flagship patch workload (patchPlanning.go:
        56-115): patch a package, BFS REVERSE over real depends_on edges
        (grammar + depdb enrichment) for the dependents closure."""
        import ray.data as rd

        from guac_ray.query.cli import patch_plan

        from guac_ray.stages.enrich import certify_deps

        nodes = rd.from_pandas(graph["nodes"])
        enriched = certify_deps(nodes, smoke_corpus["depdb"]).to_pandas()
        extracted = graph["edges"].query("pred == 'depends_on'")
        dep_edges = pd.concat(
            [enriched[EDGE_IDENTITY], extracted[EDGE_IDENTITY]],
            ignore_index=True,
        ).drop_duplicates()
        edges = rd.from_pandas(dep_edges).repartition(2)

        # most-depended-on name-level package: guaranteed dependents
        target = dep_edges.obj_key.value_counts().idxmax()
        plan = patch_plan(edges, target, preds=["depends_on"], direction="in")
        assert plan["reached"][target] == 0
        assert plan["n_nodes"] > 1, "blast radius must traverse real dep edges"
        direct = set(dep_edges[dep_edges.obj_key == target].subj_key) - {target}
        got_d1 = {k for k, d in plan["reached"].items() if d == 1}
        assert got_d1 == direct
        flat = {n for lvl in plan["levels"] for n in lvl}
        assert plan["has_cycle"] or flat == set(plan["reached"])
