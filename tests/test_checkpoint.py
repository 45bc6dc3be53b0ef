"""Checkpoint/resume: kill-and-rerun skips completed partitions and the
assembled graph still matches the golden set (north rule)."""

import json
import os

import pandas as pd
import pytest

from guac_ray.schemas import EDGE_IDENTITY


class TestCheckpoint:
    def test_run_resume_and_correctness(self, ray_session, smoke_corpus, tmp_path):
        from guac_ray.state.checkpoint import resume_status, run_graph_job

        out = str(tmp_path / "ckpt_out")
        r1 = run_graph_job(
            smoke_corpus["transcripts"], out,
            catalog_path=smoke_corpus["catalog"], num_partitions=2, num_buckets=16,
        )
        assert r1["skipped"] == 0
        st = resume_status(out)
        assert st["completed_partitions"] == 2

        # manifests carry lineage + metrics
        with open(os.path.join(out, "_ckpt", "part-0000.json")) as f:
            m = json.load(f)
        assert m["inputs"] and m["input_digest"] and m["rows_in"] > 0
        assert os.path.exists(os.path.join(out, "metrics", "part-0000.json"))

        # rerun: everything skips ("kill after completion" case)
        r2 = run_graph_job(
            smoke_corpus["transcripts"], out,
            catalog_path=smoke_corpus["catalog"], num_partitions=2, num_buckets=16,
        )
        assert r2["skipped"] == 2

        # simulate mid-job death: lose one partition's manifest → only
        # that partition re-runs
        os.remove(os.path.join(out, "_ckpt", "part-0001.json"))
        r3 = run_graph_job(
            smoke_corpus["transcripts"], out,
            catalog_path=smoke_corpus["catalog"], num_partitions=2, num_buckets=16,
        )
        assert r3["skipped"] == 1

        # assembled output matches the golden edge set exactly
        got = pd.read_parquet(r3["edges_dir"])
        golden = pd.read_parquet(smoke_corpus["golden_edges"])
        g = set(map(tuple, got[EDGE_IDENTITY].itertuples(index=False)))
        w = set(map(tuple, golden[EDGE_IDENTITY].itertuples(index=False)))
        assert g == w

    def test_concurrent_partitions_match_sequential(self, ray_session, smoke_corpus, tmp_path):
        """max_concurrent=2 submits stage-A partitions from a thread
        pool; the assembled graph is identical to the sequential run."""
        from guac_ray.state.checkpoint import run_graph_job

        out = str(tmp_path / "conc_out")
        r = run_graph_job(
            smoke_corpus["transcripts"], out,
            catalog_path=smoke_corpus["catalog"], num_partitions=2,
            num_buckets=16, max_concurrent=2,
        )
        # smoke corpus has 2 shards → 2 partitions, both run concurrently
        assert len(r["partitions"]) == 2 and r["skipped"] == 0
        got = pd.read_parquet(r["edges_dir"])
        golden = pd.read_parquet(smoke_corpus["golden_edges"])
        g = set(map(tuple, got[EDGE_IDENTITY].itertuples(index=False)))
        w = set(map(tuple, golden[EDGE_IDENTITY].itertuples(index=False)))
        assert g == w

    def test_incremental_growth_runs_only_new_partitions(
        self, ray_session, tmp_path
    ):
        """Steady-state collection (reference file.go:81-83 mod-time
        skip): grow the input dir, rerun with ``incremental=True`` —
        existing partitions skip on their manifests (stable file →
        partition assignment), only the new shard extracts, and the
        incremental graph equals a from-scratch full rebuild."""
        import shutil

        from guac_ray.state.checkpoint import run_graph_job
        from guac_ray.synth import generate_corpus

        src = generate_corpus(str(tmp_path / "corpus"), n_convs=120, n_shards=3)
        shards = sorted(
            os.path.join(src["transcripts"], f)
            for f in os.listdir(src["transcripts"])
            if f.endswith(".parquet")
        )
        assert len(shards) == 3
        grow_dir = str(tmp_path / "grow")
        os.makedirs(grow_dir)
        for s in shards[:2]:                      # wave 1: two shards
            shutil.copy2(s, grow_dir)

        out = str(tmp_path / "inc_out")
        r1 = run_graph_job(grow_dir, out, catalog_path=src["catalog"],
                           num_partitions=2, num_buckets=16, incremental=True)
        assert len(r1["partitions"]) == 2 and r1["skipped"] == 0

        shutil.copy2(shards[2], grow_dir)         # wave 2: one new shard
        r2 = run_graph_job(grow_dir, out, catalog_path=src["catalog"],
                           num_partitions=2, num_buckets=16, incremental=True)
        # the two wave-1 partitions skip; exactly one NEW partition runs
        assert r2["skipped"] == 2
        ran = [m for m in r2["partitions"] if not m.get("skipped")]
        assert len(ran) == 1
        assert ran[0]["inputs"] == [os.path.join(grow_dir,
                                                 os.path.basename(shards[2]))]

        full = run_graph_job(grow_dir, str(tmp_path / "full_out"),
                             catalog_path=src["catalog"],
                             num_partitions=3, num_buckets=16)
        got = pd.read_parquet(r2["edges_dir"])
        want = pd.read_parquet(full["edges_dir"])
        g = set(map(tuple, got[EDGE_IDENTITY].itertuples(index=False)))
        w = set(map(tuple, want[EDGE_IDENTITY].itertuples(index=False)))
        assert g == w and len(g) > 0

        # third run with no growth: everything skips
        r3 = run_graph_job(grow_dir, out, catalog_path=src["catalog"],
                           num_partitions=2, num_buckets=16, incremental=True)
        assert r3["skipped"] == 3

    def test_input_change_invalidates(self, ray_session, smoke_corpus, tmp_path):
        from guac_ray.state.checkpoint import run_extract_partition, partition_inputs

        out = str(tmp_path / "inval")
        parts = partition_inputs(smoke_corpus["transcripts"], 2)
        m1 = run_extract_partition(0, parts[0], out)
        assert not m1["skipped"]
        m2 = run_extract_partition(0, parts[0], out)
        assert m2["skipped"]
        # touch an input → digest change → re-run
        os.utime(parts[0][0], (0, 0))
        m3 = run_extract_partition(0, parts[0], out)
        assert not m3["skipped"]


class TestPollLoop:
    def test_poll_extracts_new_shards_and_skips_idle(self, ray_session, tmp_path):
        """Steady-state poll mode (reference file.go:105-119): the poll
        sequence idle → grow → idle must (1) assemble on the first poll,
        (2) no-op on an unchanged poll via the graph-digest fast path,
        (3) extract ONLY the new shard when the dir grows, and (4) end
        with a graph equal to a from-scratch rebuild."""
        import shutil

        from guac_ray.state.checkpoint import poll_graph_job, run_graph_job
        from guac_ray.synth import generate_corpus

        src = generate_corpus(str(tmp_path / "corpus"), n_convs=120, n_shards=3)
        shards = sorted(
            os.path.join(src["transcripts"], f)
            for f in os.listdir(src["transcripts"])
            if f.endswith(".parquet")
        )
        grow_dir = str(tmp_path / "grow")
        os.makedirs(grow_dir)
        for s in shards[:2]:
            shutil.copy2(s, grow_dir)
        out = str(tmp_path / "poll_out")

        # the sleep hook doubles as the "external writer": the new shard
        # lands between poll 2 (idle) and poll 3
        polls_seen = []

        def grower(_interval):
            polls_seen.append(1)
            if len(polls_seen) == 2:
                shutil.copy2(shards[2], grow_dir)

        res = poll_graph_job(
            grow_dir, out, catalog_path=src["catalog"], num_partitions=2,
            num_buckets=16, interval_sec=0, max_polls=4, sleep_fn=grower,
        )
        assert res["polls"] == 4
        # poll 1 assembles (fresh), poll 2 no-ops, poll 3 assembles the
        # grown dir, poll 4 no-ops again
        assert res["assemblies"] == 2
        assert res["idle_streak"] == 1
        last = res["last"]
        assert last["assembled"] is False and last["skipped"] == 3

        full = run_graph_job(grow_dir, str(tmp_path / "full_out"),
                             catalog_path=src["catalog"],
                             num_partitions=3, num_buckets=16)
        got = pd.read_parquet(last["edges_dir"])
        want = pd.read_parquet(full["edges_dir"])
        g = set(map(tuple, got[EDGE_IDENTITY].itertuples(index=False)))
        w = set(map(tuple, want[EDGE_IDENTITY].itertuples(index=False)))
        assert g == w and len(g) > 0

    def test_poll_idle_stop(self, ray_session, tmp_path):
        from guac_ray.state.checkpoint import poll_graph_job
        from guac_ray.synth import generate_corpus

        src = generate_corpus(str(tmp_path / "corpus2"), n_convs=40, n_shards=2)
        out = str(tmp_path / "poll_out2")
        res = poll_graph_job(
            src["transcripts"], out, catalog_path=src["catalog"],
            num_partitions=2, num_buckets=16, interval_sec=0,
            idle_stop=2, sleep_fn=lambda _s: None,
        )
        # 1 assembling poll + 2 idle polls, then stop
        assert res["polls"] == 3
        assert res["assemblies"] == 1
        assert res["idle_streak"] == 2


class TestPollEmptyDir:
    def test_poll_idles_on_empty_dir_then_picks_up_first_shard(
            self, ray_session, tmp_path):
        """Review finding: a poller started before the upstream collector
        writes its first shard must idle, not crash — and must build the
        graph once shards land."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.state.checkpoint import poll_graph_job
        from guac_ray.synth import generate_corpus

        tdir = tmp_path / "transcripts"
        tdir.mkdir()
        out = str(tmp_path / "out")

        corpus = generate_corpus(str(tmp_path / "seed"), n_convs=20, n_shards=2)

        polls = {"n": 0}

        def fake_sleep(_s):
            # drop the first real shard after two empty polls
            polls["n"] += 1
            if polls["n"] == 2:
                import glob as g
                import shutil

                src = sorted(g.glob(corpus["transcripts"] + "/*.parquet"))[0]
                shutil.copy(src, str(tdir / "part-0000.parquet"))

        res = poll_graph_job(str(tdir), out,
                             catalog_path=corpus["catalog"],
                             interval_sec=0, max_polls=4,
                             sleep_fn=fake_sleep)
        assert res["polls"] == 4
        assert res["assemblies"] >= 1  # first shard got built
        assert res["last"]["assembled"] is False or res["assemblies"] >= 1


class TestWave5Hardening:
    """Round-5 session-11: empty partitions, stale-catalog skips,
    hostile DSSE containers, schema-preserving pagination."""

    def test_all_rejected_partition_commits_typed_empty(
            self, ray_session, tmp_path):
        """A shard whose every row is invalid must commit an EMPTY
        edge part (not crash os.replace and not poison later polls)."""
        import pandas as pd
        import pyarrow.parquet as pq

        from guac_ray.state.checkpoint import run_extract_partition

        shard = tmp_path / "t.parquet"
        pd.DataFrame({
            "conv_id": ["c1", "c1"],
            "turn_idx": pd.array([0, 1], dtype="int32"),
            "role": ["alien", "alien"],      # invalid role → all rejected
            "text": ["", ""],
            "tool": ["", ""],
            "ts": pd.to_datetime([0, 1], unit="s").astype("datetime64[us]"),
        }).to_parquet(shard, index=False)
        out = str(tmp_path / "out")
        m = run_extract_partition(0, [str(shard)], out)
        assert m["edges_out"] == 0 and not m["skipped"]
        dest = f"{out}/raw_edges/part-0000"
        t = pq.read_table(dest)
        assert t.num_rows == 0 and "subj_key" in t.schema.names
        # second run skips cleanly off the manifest
        m2 = run_extract_partition(0, [str(shard)], out)
        assert m2["skipped"]

    def test_catalog_change_invalidates_skip(self, ray_session, tmp_path):
        import pandas as pd

        from guac_ray.state.checkpoint import run_extract_partition

        shard = tmp_path / "t.parquet"
        pd.DataFrame({
            "conv_id": ["c1"],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["assistant"],
            "text": ["uses pkg:npm/leftpad@1.0.0 today"],
            "tool": ["grep"],
            "ts": pd.to_datetime([5], unit="s").astype("datetime64[us]"),
        }).to_parquet(shard, index=False)
        cat1 = tmp_path / "cat1.parquet"
        pd.DataFrame({"surface": ["grep"], "ent_type": ["tool"],
                      "ent_key": ["tool://grep"]}).to_parquet(cat1)
        out = str(tmp_path / "out")
        m1 = run_extract_partition(0, [str(shard)], out,
                                   catalog_path=str(cat1))
        assert not m1["skipped"]
        # same catalog → skip
        assert run_extract_partition(
            0, [str(shard)], out, catalog_path=str(cat1))["skipped"]
        # CHANGED catalog bytes → must re-extract, not serve stale links
        import time
        time.sleep(1.1)  # mtime granularity
        pd.DataFrame({"surface": ["grep", "rg"],
                      "ent_type": ["tool", "tool"],
                      "ent_key": ["tool://grep", "tool://rg"]}
                     ).to_parquet(cat1)
        assert not run_extract_partition(
            0, [str(shard)], out, catalog_path=str(cat1))["skipped"]

    def test_dsse_hostile_containers_report_not_crash(self, ray_session):
        import json

        import pandas as pd
        import ray.data as rd

        from guac_ray.stages.verifier import verify_envelopes

        rows = pd.DataFrame({
            "doc_id": ["a", "b", "c"],
            "envelope": [
                json.dumps({"payloadType": "t", "payload": "",
                            "signatures": "abc"}),     # str, iters chars
                json.dumps({"payloadType": "t", "payload": "",
                            "signatures": 5}),          # not iterable
                json.dumps({"payloadType": 7, "payload": "",
                            "signatures": []}),         # non-str ptype
            ]})
        out = verify_envelopes(rd.from_pandas(rows), {}).to_pandas()
        assert len(out) == 3
        assert (~out["verified"]).all()
        assert out["error"].str.contains("bad envelope").all()

    def test_paginate_preserves_schema_and_empty_page(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from guac_ray.query.graph import paginate

        df = pd.DataFrame({"k": ["a", "b", "c"],
                           "i": pd.array([1, 2, 3], dtype="int32")})
        ds = rd.from_pandas(df)
        page = paginate(ds, ["k"], offset=1, limit=1)
        pdf = page.to_pandas()
        assert pdf["k"].tolist() == ["b"]
        # input Arrow types survive (from_items would re-infer int64)
        assert dict(zip(page.schema().names,
                        page.schema().types))["i"] == pa.int32()
        # past-the-end page: typed empty, not a schema-less from_items
        last = paginate(ds, ["k"], offset=10, limit=5)
        assert last.count() == 0
        assert last.schema().names == ["k", "i"]
