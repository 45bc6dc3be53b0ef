"""Multi-format readers + CLI-style graph queries."""

import json

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def mixed_sources(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "we installed pkg:pypi/x@1.0.0 today", "tool": "bash",
         "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "done", "tool": "", "ts": "2026-01-01T00:00:07"},
    ]
    pq = d / "a.parquet"
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df.ts).astype("datetime64[us]")
    df["turn_idx"] = df.turn_idx.astype("int32")
    df.to_parquet(pq, index=False)
    jl = d / "b.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            r2 = dict(r, conv_id="c2")
            f.write(json.dumps(r2) + "\n")
    cs = d / "c.csv"
    pd.DataFrame([dict(r, conv_id="c3") for r in rows]).to_csv(cs, index=False)
    # compressed shards: gz jsonl + gz csv (Arrow codec stream path)
    import gzip

    with gzip.open(d / "d.jsonl.gz", "wt") as f:
        for r in rows:
            f.write(json.dumps(dict(r, conv_id="c4")) + "\n")
    with gzip.open(d / "e.csv.gz", "wt") as f:
        pd.DataFrame([dict(r, conv_id="c5") for r in rows]).to_csv(f, index=False)
    return str(d)


class TestMainCli:
    def test_build_and_query_subprocess(self, smoke_corpus, tmp_path):
        """python -m guac_ray build/query end-to-end in fresh processes
        (the CLI owns its own Ray session)."""
        import subprocess
        import sys

        out_dir = str(tmp_path / "cli_graph")
        r = subprocess.run(
            [sys.executable, "-m", "guac_ray", "--num-cpus", "4", "build",
             smoke_corpus["transcripts"], out_dir,
             "--catalog", smoke_corpus["catalog"], "--partitions", "2"],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        info = json.loads(r.stdout.strip().splitlines()[-1])
        assert info["partitions"] == 2

        import pandas as pd

        edges = pd.read_parquet(info["edges_dir"])
        pkg = edges[edges.pred == "mentions_package"].obj_key.iloc[0]
        r2 = subprocess.run(
            [sys.executable, "-m", "guac_ray", "--num-cpus", "4", "query",
             out_dir, "neighbors", pkg, "--direction", "both", "--limit", "5"],
            capture_output=True, text=True, timeout=300,
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
        lines = [json.loads(x) for x in r2.stdout.strip().splitlines() if x]
        assert 0 < len(lines) <= 5
        assert all(pkg in (e["subj_key"], e["obj_key"]) for e in lines)


class TestReaders:
    def test_sniff(self, mixed_sources):
        from guac_ray.sources.readers import sniff_format

        assert sniff_format(mixed_sources + "/a.parquet") == "parquet"
        assert sniff_format(mixed_sources + "/b.jsonl") == "jsonl"
        assert sniff_format(mixed_sources + "/c.csv") == "csv"

        from guac_ray.sources.readers import sniff_compression

        assert sniff_format(mixed_sources + "/d.jsonl.gz") == "jsonl"
        assert sniff_compression(mixed_sources + "/d.jsonl.gz") == "gzip"
        assert sniff_compression("x.csv.zst") == "zstd"
        assert sniff_compression(mixed_sources + "/c.csv") is None

    def test_mixed_dir_normalizes_and_unions(self, ray_session, mixed_sources):
        from guac_ray.schemas import TRANSCRIPT_SCHEMA
        from guac_ray.sources.readers import read_transcripts_any

        ds = read_transcripts_any(mixed_sources)
        df = ds.to_pandas()
        assert len(df) == 10
        assert sorted(df.conv_id.unique()) == ["c1", "c2", "c3", "c4", "c5"]
        assert [f.name for f in TRANSCRIPT_SCHEMA] == list(df.columns)

    def test_extraction_works_on_any_source(self, ray_session, mixed_sources):
        from guac_ray.pipelines.kg import extract_triples
        from guac_ray.sources.readers import read_transcripts_any

        edges = extract_triples(read_transcripts_any(mixed_sources)).to_pandas()
        pkgs = edges[edges.pred == "mentions_package"]
        assert set(pkgs.conv_id) == {"c1", "c2", "c3", "c4", "c5"}

    def test_register_reader_conflict(self):
        from guac_ray.sources.readers import register_reader

        register_reader("xyz-test", lambda ps: ps)
        with pytest.raises(ValueError):
            register_reader("xyz-test", lambda ps: ps)


@pytest.fixture(scope="module")
def cli_edges(ray_session):
    import ray.data as rd

    rows = [
        ("package", "pkg:a", "affected_by", "vulnerability", "vuln://cve/cve-1"),
        ("package", "pkg:a", "certify_vuln", "vulnerability", "vuln://cve/cve-1"),
        ("package", "pkg:b", "certify_vuln", "vulnerability", "vuln://novuln/novuln"),
        ("package", "pkg:a", "depends_on", "package", "pkg:b"),
        ("package", "pkg:b", "depends_on", "package", "pkg:c"),
        ("conversation", "c:1", "mentions_package", "package", "pkg:a"),
    ]
    df = pd.DataFrame(rows, columns=["subj_type", "subj_key", "pred", "obj_type", "obj_key"])
    return rd.from_pandas(df).repartition(2)


class TestCliQueries:
    def test_known(self, cli_edges):
        from guac_ray.query.cli import known

        out = known(cli_edges, "pkg:a")
        assert set(out.pred) == {"affected_by", "certify_vuln", "depends_on",
                                 "mentions_package"}
        inbound = out[out.direction == "in"]
        assert list(inbound.other_key) == ["c:1"]

    def test_vulnerabilities_with_novuln(self, cli_edges):
        from guac_ray.query.cli import vulnerabilities

        v = vulnerabilities(cli_edges, "pkg:b")
        assert v.is_novuln.all()
        v = vulnerabilities(cli_edges, "pkg:a")
        assert not v.is_novuln.any()
        assert set(v.vuln_key) == {"vuln://cve/cve-1"}

    def test_patch_plan(self, cli_edges):
        from guac_ray.query.cli import patch_plan

        plan = patch_plan(cli_edges, "pkg:a", preds=["depends_on"])
        assert plan["reached"] == {"pkg:a": 0, "pkg:b": 1, "pkg:c": 2}
        flat = [n for lvl in plan["levels"] for n in lvl]
        assert flat.index("pkg:a") < flat.index("pkg:b") < flat.index("pkg:c")
        assert not plan["has_cycle"]


class TestCliNewVerbs:
    def test_query_requires_key_for_node_verbs(self, tmp_path):
        # cmd_query directly (main() owns ray.shutdown, which would kill
        # the shared test session); the key check fires before any Ray use
        from guac_ray.__main__ import cmd_query

        class A:
            what, key, graph = "vulns", None, str(tmp_path)
            num_cpus = None

        assert cmd_query(A()) == 2

    def test_pagerank_verb(self, ray_session, cli_edges, tmp_path):
        # write the fixture edges out as a graph dir and run the verb path
        import json

        from guac_ray.__main__ import cmd_query

        gdir = tmp_path / "graph"
        cli_edges.write_parquet(str(gdir / "edges"))

        class A:
            what, key, graph = "pagerank", None, str(gdir)
            num_cpus = None
            depth, direction, preds = 10, "out", None
            offset, limit, iters = 0, 3, 20

        rc = cmd_query(A())
        assert rc == 0

    def test_triangles_verb(self, ray_session, cli_edges, tmp_path, capsys):
        import json

        from guac_ray.__main__ import cmd_query

        gdir = tmp_path / "graph"
        cli_edges.write_parquet(str(gdir / "edges"))

        class A:
            what, key, graph = "triangles", None, str(gdir)
            num_cpus = None
            depth, direction, preds = 10, "out", None
            offset, limit, iters = 0, 3, 20

        assert cmd_query(A()) == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out["n_triangles"] >= 0

    def test_simjoin_cli_empty_result_is_clean(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_simjoin

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["completely different words here",
                     "nothing shared with the other"],
        }), str(p))

        class A:
            documents = str(p)
            id_col, text_col = "doc_id", "text"
            threshold, ngram = 0.95, 10
            num_cpus = None

        rc = cmd_simjoin(A())
        assert rc == 0


class TestCliRound4Verbs:
    def test_hh_verb(self, ray_session, tmp_path, capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_hh

        p = tmp_path / "t.parquet"
        pq.write_table(pa.table({"c": ["hot"] * 90 + [f"x{i}" for i in range(10)]}),
                       str(p))

        class A:
            table, col, k, num_cpus = str(p), "c", 4, None

        assert cmd_hh(A()) == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1 and '"hot"' in out[0] and '"n":90' in out[0]

    def test_tfidf_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_tfidf

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["alpha alpha shared", "beta shared"],
        }), str(p))

        class A:
            documents, id_col, text_col, top_k = str(p), "doc_id", "text", 2
            num_cpus = None

        assert cmd_tfidf(A()) == 0
        rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        # rare 'alpha' (tf=2, df=1) outranks 'shared' (df=2) in doc 1
        d1 = [r for r in rows if r["doc_id"] == 1]
        assert d1[0]["term"] == "alpha" and d1[0]["score_fp"] == 2_000_000

    def test_decontaminate_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_decontaminate

        tr = tmp_path / "train.parquet"
        te = tmp_path / "test.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([10], type=pa.int64()),
            "text": ["the quick brown fox jumps"],
        }), str(tr))
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["the quick brown cat sat", "nothing shared here at all"],
        }), str(te))

        class A:
            train, test = str(tr), str(te)
            id_col, text_col, ngram, num_cpus = "doc_id", "text", 3, None

        assert cmd_decontaminate(A()) == 0
        rows = {r["doc_id"]: r for r in map(
            json.loads, capsys.readouterr().out.strip().splitlines())}
        assert rows[1]["n_contaminated"] == 1  # 'the quick brown'
        assert rows[2]["n_contaminated"] == 0


class TestRound4CliVerbs2:
    def test_pii_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_pii

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["mail a@b.io now", "clean"],
        }), str(p))
        out_dir = str(tmp_path / "out")

        class A:
            table, out = str(p), out_dir
            id_col, text_col, num_cpus = "doc_id", "text", None

        assert cmd_pii(A()) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res["scrubbed"] == 2
        got = pq.read_table(out_dir).to_pandas().sort_values("doc_id")
        assert got["text"].tolist() == ["mail [EMAIL] now", "clean"]
        assert got["n_email"].tolist() == [1, 0]

    def test_kmeans_verb(self, ray_session, tmp_path, capsys):
        import json

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_kmeans

        rng = np.random.RandomState(0)
        vecs = np.concatenate([
            rng.uniform(-0.4, -0.2, (20, 4)),
            rng.uniform(0.2, 0.4, (20, 4)),
        ]).astype(np.float32)
        p = tmp_path / "emb.parquet"
        pq.write_table(pa.table({
            "vec_id": pa.array(range(40), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float32())),
        }), str(p))

        class A:
            table = str(p)
            id_col, vec_col, k, iters, out, num_cpus = (
                "vec_id", "embedding", 2, 3, None, None)

        assert cmd_kmeans(A()) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert sum(res["cluster_sizes"].values()) == 40

    def test_semdedup_verb(self, ray_session, tmp_path, capsys):
        import json

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_semdedup

        rng = np.random.RandomState(1)
        base = rng.uniform(-0.4, 0.4, (10, 4)).astype(np.float32)
        vecs = np.concatenate([base, base + 1e-4])  # 10 near-dup pairs
        p = tmp_path / "emb.parquet"
        pq.write_table(pa.table({
            "vec_id": pa.array(range(20), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float32())),
        }), str(p))

        class A:
            table = str(p)
            id_col, vec_col, k, iters = "vec_id", "embedding", 2, 2
            dist2, out, num_cpus = 100, None, None

        assert cmd_semdedup(A()) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res["rows"] == 20
        assert res["dropped"] == 10  # each jittered copy has a witness

    def test_passages_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_passages

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": ["alpha beta gamma delta shared tail",
                     "other intro alpha beta gamma delta shared tail",
                     "nothing repeated in this document at all"],
        }), str(p))

        class A:
            table = str(p)
            id_col, text_col = "doc_id", "text"
            window, min_count, out, num_cpus = 3, 2, None, None
            remove = False

        assert cmd_passages(A()) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res["docs"] == 3
        assert res["docs_with_dup"] == 2
        assert res["dup_tokens"] > 0

    def test_passages_remove_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_passages

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["one two three tail", "zero one two three end"],
        }), str(p))

        class A:
            table = str(p)
            id_col, text_col = "doc_id", "text"
            window, min_count, out, num_cpus = 3, 2, None, None
            remove = True

        assert cmd_passages(A()) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res["docs"] == 2 and res["docs_rewritten"] == 2
        assert res["tokens_removed"] == 6  # "one two three" gone twice

    def test_dsir_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_dsir

        tp = tmp_path / "target.parquet"
        rp = tmp_path / "raw.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([100], type=pa.int64()),
            "text": ["clinical drug trial outcomes"]}), str(tp))
        # doc 1 is fully target-covered (every token in the target LM →
        # all per-token ratios positive); doc 2 shares nothing
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["drug trial outcomes clinical",
                     "cheap flights hotel deals"]}), str(rp))

        class A:
            target, raw = str(tp), str(rp)
            id_col, text_col, out, num_cpus = "doc_id", "text", None, None

        assert cmd_dsir(A()) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res["raw_docs"] == 2 and res["target_like"] == 1

    def test_boiler_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_boiler

        p = tmp_path / "turns.parquet"
        pq.write_table(pa.table({
            "conv": pa.array([0, 0, 1, 1, 2, 2], type=pa.int64()),
            "text": ["HI", "a", "HI", "b", "HI", "c"],
            # payload column NOT named in the verb args: must survive
            "turn_idx": pa.array([0, 1, 0, 1, 0, 1], type=pa.int64()),
        }), str(p))
        out_dir = str(tmp_path / "out")

        class A:
            table, out = str(p), out_dir
            group_col, text_col, min_groups, num_cpus = "conv", "text", 3, None

        assert cmd_boiler(A()) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res == {"kept": 3, "total": 6, "out": out_dir}
        got = pq.read_table(out_dir).to_pandas()
        assert sorted(got["text"]) == ["a", "b", "c"]
        assert set(got.columns) == {"conv", "text", "turn_idx"}
        assert got.sort_values("text")["turn_idx"].tolist() == [1, 1, 1]

    def test_export_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_export

        p = tmp_path / "t.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": ["a", "b", "c"],
            "extra": [1.0, 2.0, 3.0],
        }), str(p))
        out_dir = str(tmp_path / "out")

        class A:
            table, out = str(p), out_dir
            format, columns, num_cpus = "jsonl", "doc_id,text", None

        assert cmd_export(A()) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res["rows"] == 3
        import glob
        rows = []
        for f in sorted(glob.glob(out_dir + "/*.json")):
            rows += [json.loads(line) for line in open(f) if line.strip()]
        assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
        assert all(set(r) == {"doc_id", "text"} for r in rows)


class TestGraphDecompositionVerbs:
    def test_kcore_verb(self, ray_session, cli_edges, tmp_path, capsys):
        import json

        from guac_ray.__main__ import cmd_query

        gdir = tmp_path / "graph"
        cli_edges.write_parquet(str(gdir / "edges"))

        class A:
            what, key, graph = "kcore", None, str(gdir)
            num_cpus = None
            depth, direction, preds = 10, "out", None
            offset, limit, iters, k = 0, 3, 20, 1
        assert cmd_query(A()) == 0
        rows = [json.loads(ln) for ln in
                capsys.readouterr().out.strip().splitlines() if ln]
        # 1-core = every non-isolated node, each with degree >= 1
        assert rows and all(r["deg"] >= 1 for r in rows)

    def test_components_verb(self, ray_session, cli_edges, tmp_path, capsys):
        import json

        from guac_ray.__main__ import cmd_query

        gdir = tmp_path / "graph"
        cli_edges.write_parquet(str(gdir / "edges"))

        class A:
            what, key, graph = "components", None, str(gdir)
            num_cpus = None
            depth, direction, preds = 10, "out", None
            offset, limit, iters, k = 0, 3, 20, 3
        assert cmd_query(A()) == 0
        rows = [json.loads(ln) for ln in
                capsys.readouterr().out.strip().splitlines() if ln]
        assert rows and {"node_key", "root"} <= set(rows[0])
        # every root is itself a node and the min of its member keys
        roots = {}
        for r in rows:
            roots.setdefault(r["root"], []).append(r["node_key"])
        for root, members in roots.items():
            assert root == min(members)

    def test_striplines_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_striplines

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["HDR\na", "HDR\nb", "HDR\nc"]),
        }), str(p))

        class A:
            table, out = str(p), str(tmp_path / "out")
            id_col, text_col, min_docs = "doc_id", "text", 3
            num_cpus = None
        assert cmd_striplines(A()) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["docs"] == 3 and rep["lines_dropped"] == 3
        got = pq.read_table(str(tmp_path / "out")).to_pandas()
        assert sorted(got["text"]) == ["a", "b", "c"]


class TestCliFourthWaveVerbs:
    def test_chunk_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_chunk

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["abcdefghij", "xy"],
        }), str(p))

        class A:
            table, out, text_col = str(p), str(tmp_path / "chunks"), "text"
            size, stride, num_cpus = 4, 3, None

        assert cmd_chunk(A()) == 0
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["chunks"] == 4  # doc1: 0,3,6 → 3 chunks; doc2: 1
        got = pq.read_table(str(tmp_path / "chunks")).to_pandas()
        assert sorted(got[got.doc_id == 1].chunk) == ["abcd", "defg", "ghij"]

    def test_funnel_verb(self, ray_session, tmp_path, capsys):
        import json

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_funnel

        p = tmp_path / "ev.parquet"
        ts = pd.to_datetime([10, 20, 30, 40], unit="s").astype("datetime64[us]")
        pq.write_table(pa.table({
            "user_id": pa.array([1, 1, 2, 2], type=pa.int64()),
            "ts": pa.array(ts),
            "event_type": ["a", "b", "a", "x"],
        }), str(p))

        class A:
            table, out = str(p), str(tmp_path / "fun")
            key, order, step_col = "user_id", "ts", "event_type"
            steps, within, num_cpus = "a,b", None, None

        assert cmd_funnel(A()) == 0
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["keys"] == 2
        assert rec["levels"] == {"1": 1, "2": 1}

    def test_spath_verb(self, ray_session, cli_edges, tmp_path, capsys):
        import json

        from guac_ray.__main__ import cmd_query

        gdir = tmp_path / "graph"
        cli_edges.write_parquet(str(gdir / "edges"))

        class A:
            graph, what, key = str(gdir), "spath", "pkg:a"
            depth, direction, preds = 3, "out", None
            offset, limit, k, iters, num_cpus = 0, 100, 2, 5, None

        assert cmd_query(A()) == 0
        rows = [json.loads(l)
                for l in capsys.readouterr().out.strip().splitlines()]
        d = {r["node_key"]: r["dist"] for r in rows}
        # unit weights over the fixture: pkg:a →1 hop→ {pkg:b, cve-1} …
        assert d["pkg:a"] == 0 and d["pkg:b"] == 1 and d["pkg:c"] == 2

    def test_diff_verb(self, ray_session, tmp_path, capsys):
        import json

        import pandas as pd
        import ray.data as rd

        from guac_ray.__main__ import cmd_diff

        ea = pd.DataFrame({
            "subj_key": ["a", "b", "c"], "pred": ["p"] * 3,
            "obj_key": ["x", "y", "z"]})
        # b: drop (c,p,z), add (d,p,w), and a duplicate of (a,p,x)
        eb = pd.DataFrame({
            "subj_key": ["a", "a", "b", "d"], "pred": ["p"] * 4,
            "obj_key": ["x", "x", "y", "w"]})
        ga, gb = tmp_path / "ga", tmp_path / "gb"
        rd.from_pandas(ea).write_parquet(str(ga / "edges"))
        rd.from_pandas(eb).write_parquet(str(gb / "edges"))

        class A:
            graph_a, graph_b, out = str(ga), str(gb), str(tmp_path / "d")
            num_cpus = None

        assert cmd_diff(A()) == 0
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["added"] == 1 and rec["removed"] == 1
        import pyarrow.parquet as pq
        add = pq.read_table(str(tmp_path / "d" / "added")).to_pandas()
        assert add.subj_key.tolist() == ["d"]


class TestCliSession5Verbs:
    """engagement (streaks/cohort/dauwau) + index verbs."""

    def test_engagement_verb_all_ops(self, ray_session, tmp_path, capsys):
        import json

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_engagement

        p = tmp_path / "ev.parquet"
        base = pd.Timestamp("2024-05-01")
        ts = pd.Series([base, base + pd.Timedelta(days=1),
                        base + pd.Timedelta(days=5),
                        base]).astype("datetime64[us]")
        pq.write_table(pa.table({
            "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
            "ts": pa.array(ts),
        }), str(p))

        class A:
            table = str(p)
            user_col, ts_col, num_cpus = "user_id", "ts", None
            period_days, window_days = 1, 7

        for op, nrows in (("streaks", 2), ("cohort", 3), ("dauwau", 3)):
            A.op, A.out = op, str(tmp_path / op)
            assert cmd_engagement(A()) == 0
            rec = json.loads(capsys.readouterr().out.strip())
            assert rec["rows"] == nrows
        st = pq.read_table(str(tmp_path / "streaks")).to_pandas() \
            .set_index("user_id")
        # u1 days {0,1,5}: 2 streaks, longest 2; u2 one day
        assert st.loc[1, ["active_days", "longest_streak", "n_streaks"]] \
            .tolist() == [3, 2, 2]
        dw = pq.read_table(str(tmp_path / "dauwau")).to_pandas() \
            .sort_values("epoch_day")
        assert dw["dau"].tolist() == [2, 1, 1]
        assert dw["wau"].tolist() == [2, 2, 2]  # day5: u1 covers via day1+6

    def test_index_verb(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_index

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["the cat the", "the dog"],
        }), str(p))

        class A:
            documents, out = str(p), str(tmp_path / "ix")
            id_col, text_col, num_cpus = "doc_id", "text", None

        assert cmd_index(A()) == 0
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["postings"] == 4
        got = pq.read_table(str(tmp_path / "ix")).to_pandas() \
            .sort_values(["term", "doc_id"])
        assert got[["term", "doc_id", "tf", "doc_freq"]].values.tolist() \
            == [["cat", 1, 1, 1], ["dog", 2, 1, 1],
                ["the", 1, 2, 2], ["the", 2, 1, 2]]


class TestCliSession6Verbs:
    """engagement gaps/twap ops, pii --inventory, bpe, concat verbs."""

    def test_engagement_gaps_and_twap(self, ray_session, tmp_path,
                                      capsys):
        import json

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_engagement

        p = tmp_path / "ev.parquet"
        base = pd.Timestamp("2024-05-01")
        us = pd.Timedelta(microseconds=1)
        ts = pd.Series([base, base + 10 * us, base + 30 * us]) \
            .astype("datetime64[us]")
        pq.write_table(pa.table({
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "user_id": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array(ts),
            "value": pa.array([1.0, 3.0, 2.0]),
        }), str(p))

        class A:
            table = str(p)
            user_col, ts_col, num_cpus = "user_id", "ts", None
            order_col, value_col = "event_id", "value"
            period_days, window_days = 1, 7

        A.op, A.out = "gaps", str(tmp_path / "gaps")
        assert cmd_engagement(A()) == 0
        assert json.loads(capsys.readouterr().out.strip())["rows"] == 1
        g = pq.read_table(str(tmp_path / "gaps")).to_pandas()
        # gaps [10, 20]: p50=10 (ceil(1)-1=0? n=2: ceil(2/2)-1=0 → 10),
        # p90 = idx ceil(1.8)-1=1 → 20
        assert g[["n_gaps", "p50_gap_us", "p90_gap_us", "max_gap_us"]] \
            .values.tolist() == [[2, 10, 20, 20]]
        A.op, A.out = "twap", str(tmp_path / "twap")
        assert cmd_engagement(A()) == 0
        assert json.loads(capsys.readouterr().out.strip())["rows"] == 1
        t = pq.read_table(str(tmp_path / "twap")).to_pandas()
        # (100¢×10)+(300¢×20)=7000 over 30µs → 233
        assert t[["n_spans", "dur_us", "vw_sum", "twap_cents"]] \
            .values.tolist() == [[2, 30, 7000, 233]]

    def test_pii_inventory_flag(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_pii

        p = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([1], type=pa.int64()),
            "text": ["mail a@b.co twice a@b.co and 10.0.0.1"],
        }), str(p))

        class A:
            table, out = str(p), str(tmp_path / "inv")
            id_col, text_col, num_cpus = "doc_id", "text", None
            inventory = True

        assert cmd_pii(A()) == 0
        assert json.loads(
            capsys.readouterr().out.strip())["inventory_rows"] == 2
        got = pq.read_table(str(tmp_path / "inv")).to_pandas() \
            .sort_values("kind")
        assert got[["kind", "pii", "n"]].values.tolist() == [
            ["email", "a@b.co", 2], ["ipv4", "10.0.0.1", 1]]

    def test_bpe_and_concat_verbs(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_bpe, cmd_concat
        from guac_ray.functions.bpe import bpe_merges_naive

        docs = tmp_path / "docs.parquet"
        pq.write_table(pa.table({
            "text": ["low low lower newest newest newest"]}), str(docs))

        class B:
            documents, out = str(docs), str(tmp_path / "merges")
            merges, max_words, min_pair_count = 6, 100, 2
            text_col, num_cpus = "text", None

        assert cmd_bpe(B()) == 0
        n = json.loads(capsys.readouterr().out.strip())["merges"]
        want = bpe_merges_naive({"low": 2, "lower": 1, "newest": 3}, 6)
        got = pq.read_table(str(tmp_path / "merges")).to_pandas() \
            .sort_values("rank")
        assert n == len(want)
        assert list(got.itertuples(index=False, name=None)) == want

        tab = tmp_path / "li.parquet"
        pq.write_table(pa.table({
            "k": pa.array([1, 1, 1, 2], type=pa.int64()),
            "v": ["b", "a", "b", "c"],
        }), str(tab))

        class C:
            table, out = str(tab), str(tmp_path / "sig")
            keys, val, sep = "k", "v", "|"
            keep_dups, num_cpus = False, None

        assert cmd_concat(C()) == 0
        assert json.loads(capsys.readouterr().out.strip())["groups"] == 2
        got = pq.read_table(str(tmp_path / "sig")).to_pandas() \
            .sort_values("k")
        assert got[["k", "n_items", "concat"]].values.tolist() == [
            [1, 2, "a|b"], [2, 1, "c"]]


class TestCliSession8Verbs:
    """merge / debounce / mode verbs drive the session-8 operators
    through the real argv surface."""

    def test_merge_verb(self, ray_session, tmp_path, capsys):
        import json

        import pandas as pd
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_merge

        pd.DataFrame({"user_id": [1, 2], "value_cents": [10, 20],
                      "updated_us": [100, 100]}).to_parquet(
            tmp_path / "base.parquet")
        pd.DataFrame({
            "user_id": [1, 2], "ts": pd.to_datetime([200, 200], unit="us"),
            "event_id": [0, 1], "op": [0, 1], "value_cents": [15, 0],
        }).to_parquet(tmp_path / "chg.parquet")

        class A:
            base = str(tmp_path / "base.parquet")
            changelog = str(tmp_path / "chg.parquet")
            out = str(tmp_path / "merged")
            key, ts, order, op = "user_id", "ts", "event_id", "op"
            value = "value_cents"
            num_cpus = None
        assert cmd_merge(A()) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 1  # u1 upserted, u2 deleted
        got = pq.read_table(str(tmp_path / "merged")).to_pandas()
        assert got.values.tolist() == [[1, 15, 200, 1]]

    def test_debounce_and_mode_verbs(self, ray_session, tmp_path, capsys):
        import json

        import pandas as pd
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_debounce, cmd_mode

        p = tmp_path / "ev.parquet"
        pd.DataFrame({
            "event_id": [0, 1, 2],
            "user_id": [7, 7, 7],
            "event_type": ["a", "a", "b"],
            "ts": pd.to_datetime([0, 500_000, 2_000_000], unit="us"),
        }).to_parquet(p)

        class D:
            table, out = str(p), str(tmp_path / "kept")
            gap_seconds = 1.0
            key, ts, order = "user_id", "ts", "event_id"
            num_cpus = None
        assert cmd_debounce(D()) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 2  # id1 is 0.5s after id0 -> dropped
        got = pq.read_table(str(tmp_path / "kept")).to_pandas()
        assert sorted(got["event_id"].tolist()) == [0, 2]

        class M:
            table = str(p)
            by, val = "user_id", "event_type"
            num_cpus = None
        assert cmd_mode(M()) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == [{"user_id": 7, "mode": "a", "n_mode": 2}]


class TestClusteredLayout:
    """Zone-map clustered write + pruned read: pruning really skips
    ranges, and the pruned result equals the full-scan filter."""

    def test_pivot_verb(self, ray_session, tmp_path, capsys):
        import json

        import pandas as pd
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_pivot

        p = tmp_path / "long.parquet"
        pd.DataFrame({
            "user_id": [1, 1, 2],
            "event_type": ["a", "b", "a"],
            "value": [5, 7, 9],
        }).to_parquet(p)

        class P:
            table = str(p)
            by, label = "user_id", "event_type"
            val, out, num_cpus = None, None, None
        assert cmd_pivot(P()) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert sorted(rep["rows"], key=lambda r: r["user_id"]) == [
            {"user_id": 1, "n_a": 1, "n_b": 1},
            {"user_id": 2, "n_a": 1, "n_b": 0}]

        class P2:
            table = str(p)
            by, label = "user_id", "event_type"
            val = "value"
            out = str(tmp_path / "wide")
            num_cpus = None
        assert cmd_pivot(P2()) == 0
        got = (pq.read_table(str(tmp_path / "wide")).to_pandas()
               .sort_values("user_id"))
        assert got.values.tolist() == [[1, 5, 7], [2, 9, 0]]

    def test_cluster_prune_roundtrip(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.sources.layout import (prune_plan, read_pruned,
                                             write_clustered)

        rng = np.random.RandomState(3)
        vals = rng.randint(0, 10_000, 20_000).astype("int64")
        df = pd.DataFrame({"id": np.arange(20_000, dtype="int64"),
                           "v": vals})
        out = str(tmp_path / "clustered")
        m = write_clustered(rd.from_pandas(df).repartition(6), out,
                            "v", num_ranges=16)
        assert len(m["ranges"]) == 16
        assert sum(r["rows"] for r in m["ranges"]) == 20_000
        # ranges tile the value space in order
        mins = [r["min"] for r in m["ranges"]]
        assert mins == sorted(mins)

        lo, hi = 4_000, 4_500  # ~5% of the value space
        plan = prune_plan(out, lo, hi)
        assert plan["skipped"] > 0  # the zone map actually pruned
        assert plan["rows_read_bound"] < 20_000

        got = read_pruned(out, lo, hi).to_pandas().sort_values(
            "id").reset_index(drop=True)
        want = df[(df.v >= lo) & (df.v <= hi)].sort_values(
            "id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["id", "v"]], want[["id", "v"]])

        # empty intersection: typed empty, zero ranges read
        plan0 = prune_plan(out, 100_000, 200_000)
        assert plan0["read"] == []
        empty = read_pruned(out, 100_000, 200_000)
        assert empty.count() == 0
        assert "v" in (empty.schema().names or [])

    def test_float_col_rejected(self, ray_session, tmp_path):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.sources.layout import write_clustered

        df = pd.DataFrame({"v": [1.5, 2.5]})
        with pytest.raises(Exception, match="must be int64"):
            write_clustered(rd.from_pandas(df),
                            str(tmp_path / "x"), "v", num_ranges=2)


class TestCliSession12Verbs:
    """abtest (ttest/mw/ks), refresh (incremental MV), engagement
    --op ewma, query hits/communities."""

    def _events_parquet(self, tmp_path):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(71)
        n = 400
        p = tmp_path / "ev12.parquet"
        base = pd.Timestamp("2024-05-01")
        ts = pd.Series([base + pd.Timedelta(seconds=int(s))
                        for s in rng.integers(0, 86400, n)]) \
            .astype("datetime64[us]")
        pq.write_table(pa.table({
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "user_id": pa.array(rng.integers(0, 10, n), type=pa.int64()),
            "ts": pa.array(ts),
            "event_type": pa.array(
                rng.choice(["purchase", "view", "click"], n)),
            "value": pa.array(rng.uniform(0, 50, n)),
        }), str(p))
        return str(p)

    def test_abtest_all_three(self, ray_session, tmp_path, capsys):
        import json

        from guac_ray.__main__ import cmd_abtest

        table = self._events_parquet(tmp_path)

        class A:
            num_cpus = None
            group_col, value_col = "event_type", "value"
            group_a, group_b = "purchase", "view"

        A.table = table
        for test in ("ttest", "mw", "ks"):
            A.test = test
            assert cmd_abtest(A()) == 0
            lines = [json.loads(x) for x in
                     capsys.readouterr().out.strip().splitlines()]
            assert lines, test
            if test == "ttest":
                assert {"t_stat", "df"} <= set(lines[0])
            elif test == "mw":
                assert {"u_a_x2", "z_stat"} <= set(lines[0])
            else:
                assert {"d_num", "d_stat"} <= set(lines[0])

    def test_refresh_verb(self, ray_session, tmp_path, capsys):
        import json

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_refresh

        basep = tmp_path / "mv.parquet"
        chp = tmp_path / "chg.parquet"
        pq.write_table(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "n": pa.array([2, 1], pa.int64()),
            "s": pa.array([30, 10], pa.int64())}), str(basep))
        pq.write_table(pa.table({
            "k": pa.array([1, 3], pa.int64()),
            "v": pa.array([5, 7], pa.int64()),
            "sign": pa.array([1, 1], pa.int64())}), str(chp))

        class A:
            num_cpus = None
            base_mv, changes = str(basep), str(chp)
            out = str(tmp_path / "mv_out")
            keys, count_col, sums, sign_col = "k", "n", "s:v", "sign"

        assert cmd_refresh(A()) == 0
        assert json.loads(capsys.readouterr().out.strip())["rows"] == 3
        got = (pq.read_table(A.out).to_pandas()
               .sort_values("k").reset_index(drop=True))
        assert got["n"].tolist() == [3, 1, 1]
        assert got["s"].tolist() == [35, 10, 7]

    def test_engagement_ewma(self, ray_session, tmp_path, capsys):
        import json

        import pyarrow.parquet as pq

        from guac_ray.__main__ import cmd_engagement

        table = self._events_parquet(tmp_path)

        class A:
            num_cpus = None
            user_col, ts_col = "user_id", "ts"
            order_col, value_col = "event_id", "value"
            period_days, window_days = 1, 7

        A.table, A.op = table, "ewma"
        A.out = str(tmp_path / "ewma_out")
        assert cmd_engagement(A()) == 0
        assert json.loads(capsys.readouterr().out.strip())["rows"] == 10
        g = pq.read_table(A.out).to_pandas()
        assert {"user_id", "n_events", "ewma_fp"} <= set(g.columns)
        assert (g["ewma_fp"] >= 0).all()
