"""Pluggable EXCHANGE filesystem (guac_ray/exfs.py): every fs-exchange
stage must do ALL its shuffle IO through the injected ``pyarrow.fs``
filesystem — the single switch between the sandbox's node-local
``/dev/shm`` and the shared store (NFS/S3/MinIO) a multi-node cluster
needs (r4 verdict "what's wrong #2").

Strategy (the ``test_cloud.py`` pattern): install a
``SubTreeFileSystem`` rooted at a tmp dir, run each exchange consumer,
then assert (a) the results are right, (b) the exchange artifacts exist
INSIDE the subtree, and (c) the default local exchange root gained no
new entries — proving no code path fell back to the local filesystem.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.fs as pafs
import pytest
import ray.data as rd

from guac_ray.exfs import (default_exchange, exchange_fs,
                           fresh_exchange_dir, fs_bucket_ids,
                           fs_list_files, set_exchange_filesystem)

LOCAL_ROOT = "/dev/shm/guac_ray_exchange" \
    if os.path.isdir("/dev/shm") else "/tmp/guac_ray_exchange"


def _local_entries() -> set[str]:
    try:
        return set(os.listdir(LOCAL_ROOT))
    except FileNotFoundError:
        return set()


@pytest.fixture
def injected_exchange(tmp_path):
    """SubTreeFileSystem-rooted exchange + local-leak watchdog."""
    before = _local_entries()
    sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    set_exchange_filesystem(sub, base="exroot")
    try:
        yield tmp_path
    finally:
        set_exchange_filesystem()  # reset to the node-local default
    after = _local_entries()
    assert after - before == set(), \
        "exchange stage leaked onto the LOCAL filesystem under injection"


def _subtree_has_exchange(tmp_path, name: str) -> bool:
    root = tmp_path / "exroot" / "guac_ray_exchange" / name
    return root.is_dir() and any(root.iterdir())


class TestResolution:
    def test_default_is_local(self):
        f, base = exchange_fs()
        assert isinstance(f, pafs.LocalFileSystem)
        assert base in ("/dev/shm", "/tmp")

    def test_injection_wins(self, tmp_path):
        sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
        set_exchange_filesystem(sub, base="x")
        try:
            f, base = exchange_fs()
            assert f is sub and base == "x"
        finally:
            set_exchange_filesystem()

    def test_env_uri_routing(self, monkeypatch, tmp_path):
        monkeypatch.setenv("GUAC_RAY_EXCHANGE_URI", f"file://{tmp_path}")
        f, base = exchange_fs()
        assert isinstance(f, pafs.LocalFileSystem)
        assert base == str(tmp_path)

    def test_fresh_dir_and_listing_on_injected_fs(self, injected_exchange):
        tmp_path = injected_exchange
        d = fresh_exchange_dir(default_exchange("probe"))
        f, _ = exchange_fs()
        f.create_dir(f"{d}/_bucket=3", recursive=True)
        assert fs_bucket_ids(f, d) == [3]
        host = tmp_path / d.lstrip("/")  # d already starts with the base
        assert (host / "_bucket=3").is_dir()
        assert fs_list_files(f, f"{d}/_bucket=3") == []


def _events(n=400):
    rng = np.random.RandomState(7)
    return pd.DataFrame({
        "user": [f"u{i % 37}" for i in range(n)],
        "ts": np.arange(n, dtype="int64") * 3,
        "value": rng.randint(0, 1000, n).astype("int64"),
    })


class TestJoinsInjected:
    def test_hash_join_inner_and_mark(self, ray_session, injected_exchange):
        tmp_path = injected_exchange
        left = _events()
        right = pd.DataFrame({"user": [f"u{i}" for i in range(20)],
                              "seg": [f"s{i % 3}" for i in range(20)]})
        from guac_ray.functions.joins import hash_join

        out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="user",
                        exchange_dir=default_exchange("t_hj")).to_pandas()
        exp = left.merge(right, on="user")
        assert len(out) == len(exp)
        assert int(out["value"].sum()) == int(exp["value"].sum())
        assert _subtree_has_exchange(tmp_path, "t_hj")

        mark = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                         on="user", how="mark",
                         exchange_dir=default_exchange("t_mk")).to_pandas()
        assert int(mark["_mark"].sum()) == \
            int(left["user"].isin(set(right["user"])).sum())

    def test_asof_range_interval(self, ray_session, injected_exchange):
        from guac_ray.functions.joins import (asof_join, interval_join,
                                              range_join)

        left = _events(120)
        quotes = pd.DataFrame({
            "user": [f"u{i % 37}" for i in range(60)],
            "ts": np.arange(60, dtype="int64") * 5,
            "px": np.arange(60, dtype="int64"),
        })
        a = asof_join(rd.from_pandas(left), rd.from_pandas(quotes),
                      by="user", on="ts",
                      exchange_dir=default_exchange("t_asof")).to_pandas()
        m = pd.merge_asof(left.sort_values("ts"), quotes.sort_values("ts"),
                          on="ts", by="user", suffixes=("", "_r"))
        assert len(a) == int(m["px"].notna().sum())

        r = range_join(rd.from_pandas(left), rd.from_pandas(quotes),
                       by="user", on="ts", lower=0, upper=10,
                       exchange_dir=default_exchange("t_rng")).to_pandas()
        lw = left.merge(quotes, on="user", suffixes=("", "_r"))
        exp_n = int(((lw["ts_r"] >= lw["ts"]) & (lw["ts_r"] <= lw["ts"] + 10)
                     ).sum())
        assert len(r) == exp_n

        li = left.assign(s=left["ts"], e=left["ts"] + 4)
        ri = quotes.assign(s=quotes["ts"], e=quotes["ts"] + 4)
        iv = interval_join(rd.from_pandas(li), rd.from_pandas(ri),
                           by="user", left_start="s", left_end="e",
                           right_start="s", right_end="e",
                           exchange_dir=default_exchange("t_iv")).to_pandas()
        lr = li.merge(ri, on="user", suffixes=("", "_r"))
        exp_iv = int(((lr["s"] <= lr["e_r"]) & (lr["s_r"] <= lr["e"])).sum())
        assert len(iv) == exp_iv


class TestExchangeReduceInjected:
    def test_grouped_agg_and_dedup(self, ray_session, injected_exchange):
        tmp_path = injected_exchange
        from guac_ray.stages.assemble import dedup_exact_fs
        from guac_ray.stages.groupagg import grouped_agg

        df = _events()
        agg = grouped_agg(rd.from_pandas(df), ["user"],
                          {"total": ("value", "sum"), "n": ("user", "count")},
                          num_buckets=8).to_pandas()
        exp = df.groupby("user")["value"].sum()
        assert dict(zip(agg["user"], agg["total"])) == exp.to_dict()
        assert _subtree_has_exchange(tmp_path, "groupagg")

        dd = dedup_exact_fs(rd.from_pandas(df[["user"]]), ["user"],
                            exchange_dir=default_exchange("t_dd"),
                            num_buckets=4).to_pandas()
        assert sorted(dd["user"]) == sorted(df["user"].unique())


class TestRound5OpsInjected:
    def test_semdedup(self, ray_session, injected_exchange):
        tmp_path = injected_exchange
        from guac_ray.functions.kmeans import semdedup_embeddings

        rng = np.random.RandomState(2)
        base = rng.uniform(-0.4, 0.4, (12, 4)).astype(np.float32)
        X = np.concatenate([base, base + 1e-4])
        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": np.arange(24, dtype=np.int64),
            "embedding": list(X)})).repartition(3)
        out = semdedup_embeddings(ds, k=2, iters=2,
                                  dist2_max=100).to_pandas()
        assert int((out["kept"] == 0).sum()) == 12
        assert _subtree_has_exchange(tmp_path, "semdedup")

    def test_passage_stats_and_removal(self, ray_session,
                                       injected_exchange):
        tmp_path = injected_exchange
        from guac_ray.pipelines.curation import (dup_passage_stats,
                                                 remove_dup_passages)

        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a b c d e", "x a b c d y", "unique words only here"],
        })
        st = dup_passage_stats(rd.from_pandas(df).repartition(2),
                               window=3).to_pandas().set_index("doc_id")
        assert st.loc[1].dup_tokens == 4 and st.loc[3].dup_tokens == 0
        assert _subtree_has_exchange(tmp_path, "passages")
        rm = remove_dup_passages(rd.from_pandas(df).repartition(2),
                                 window=3).to_pandas().set_index("doc_id")
        assert rm.loc[1].clean_text == "e" and rm.loc[2].clean_text == "x y"
        assert _subtree_has_exchange(tmp_path, "passages_rm")


class TestIterativeInjected:
    def test_connected_components(self, ray_session, injected_exchange):
        from guac_ray.functions.dedup import connected_components_ds

        pairs = pd.DataFrame({"a": [1, 2, 10, 11], "b": [2, 3, 11, 12]})
        out = connected_components_ds(
            rd.from_pandas(pairs), num_buckets=4).to_pandas()
        roots = dict(zip(out["doc_id"], out["root"]))
        assert roots[1] == roots[2] == roots[3] == 1
        assert roots[10] == roots[11] == roots[12] == 10

    def test_pagerank_and_paths(self, ray_session, injected_exchange):
        from guac_ray.functions.pagerank import pagerank
        from guac_ray.functions.paths import shortest_paths

        edges = pd.DataFrame({
            "subj_key": ["a", "a", "b", "c"],
            "obj_key": ["b", "c", "c", "a"],
        })
        pr = pagerank(rd.from_pandas(edges), max_iters=5,
                      num_buckets=4,
                      quantize_scale=10**12).to_pandas()
        assert set(pr["node_key"]) == {"a", "b", "c"}
        assert pr["rank"].min() > 0

        # the seeded (personalized) path shares the bucket IO but adds
        # the |S| scalar pass — route it through the injection too
        ppr = pagerank(rd.from_pandas(edges), max_iters=5,
                       num_buckets=4, quantize_scale=10**12,
                       seed_prefix="a").to_pandas()
        assert set(ppr["node_key"]) == {"a", "b", "c"}
        assert int(ppr.set_index("node_key").loc["a", "rank"]) > 0

        we = edges.assign(w=np.array([1, 5, 1, 1], dtype="int64"))
        sp = shortest_paths(rd.from_pandas(we), "a",
                            src_col="subj_key", dst_col="obj_key",
                            weight_col="w", k=3,
                            num_buckets=4).to_pandas()
        d = dict(zip(sp["node_key"], sp["dist"]))
        assert d == {"a": 0, "b": 1, "c": 2}

    def test_triangles(self, ray_session, injected_exchange):
        from guac_ray.functions.triangles import triangle_count

        edges = pd.DataFrame({
            "subj_key": ["a", "b", "c", "c"],
            "obj_key": ["b", "c", "a", "d"],
        })
        out = triangle_count(rd.from_pandas(edges), num_buckets=4).to_pandas()
        assert int(out["n_triangles"].iloc[0]) == 1


class TestKgBuildInjected:
    def test_cluster_by_conversation(self, ray_session, injected_exchange):
        from guac_ray.pipelines.kg import cluster_by_conversation

        df = pd.DataFrame({
            "conv_id": ["c2", "c1", "c2", "c1"],
            "turn_idx": np.array([1, 0, 0, 1], dtype="int32"),
            "role": ["user"] * 4,
            "text": ["w", "x", "y", "z"],
            "tool": [None] * 4,
            "ts": np.array([0, 1, 2, 3], dtype="int64"),
        })
        out = cluster_by_conversation(
            rd.from_pandas(df), default_exchange("t_cbc"),
            num_buckets=4).to_pandas()
        # per-conversation contiguity + (conv_id, turn_idx) order
        for _, g in out.groupby("conv_id"):
            idx = g.index.to_numpy()
            assert (np.diff(idx) == 1).all()
            assert list(g["turn_idx"]) == sorted(g["turn_idx"])


class TestSession6OpsInjected:
    """Every session-6 exchange consumer routes through the injected
    filesystem — the cluster-portability contract, CI-locked."""

    def test_stream_reductions(self, ray_session, injected_exchange):
        tmp_path = injected_exchange
        from guac_ray.functions.streams import (gap_quantiles,
                                                running_distinct,
                                                time_weighted_mean)

        base = pd.Timestamp("2024-06-01")
        us = pd.Timedelta(microseconds=1)
        df = pd.DataFrame({
            "event_id": [1, 2, 3], "user_id": [1, 1, 1],
            "ts": [base, base + 10 * us, base + 30 * us],
            "value": [1.0, 3.0, 2.0],
            "event_type": ["a", "b", "a"],
        })
        g = gap_quantiles(rd.from_pandas(df)).to_pandas()
        assert g[["n_gaps", "p50_gap_us"]].values.tolist() == [[2, 10]]
        assert _subtree_has_exchange(tmp_path, "gapq")
        t = time_weighted_mean(rd.from_pandas(df)).to_pandas()
        assert t["twap_cents"].tolist() == [233]
        assert _subtree_has_exchange(tmp_path, "twap")
        r = running_distinct(rd.from_pandas(df)).to_pandas() \
            .sort_values("event_id")
        assert r["n_distinct"].tolist() == [1, 2, 2]
        assert _subtree_has_exchange(tmp_path, "rundist")

    def test_concat_inventory_truss(self, ray_session, injected_exchange):
        tmp_path = injected_exchange
        from guac_ray.functions.text import PII_PATTERNS, pattern_inventory
        from guac_ray.functions.triangles import k_truss
        from guac_ray.stages.groupagg import grouped_sorted_concat

        sig = grouped_sorted_concat(
            rd.from_pandas(pd.DataFrame({"k": [1, 1], "v": ["b", "a"]})),
            keys=["k"], val_col="v").to_pandas()
        assert sig["concat"].tolist() == ["a|b"]
        assert _subtree_has_exchange(tmp_path, "sconcat")

        inv = pattern_inventory(
            rd.from_pandas(pd.DataFrame(
                {"doc_id": [1], "text": ["mail a@b.co end"]})),
            {"email": PII_PATTERNS["email"]}).to_pandas()
        assert inv[["pii", "n"]].values.tolist() == [["a@b.co", 1]]
        assert _subtree_has_exchange(tmp_path, "piiinv")

        k4 = pd.DataFrame(
            [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]],
            columns=["subj_key", "obj_key"])
        tr = k_truss(rd.from_pandas(k4), 4).to_pandas()
        assert len(tr) == 6 and set(tr.support) == {2}
        assert _subtree_has_exchange(tmp_path, "ktruss")


class TestSession8OpsInjected:
    """The session-8 multi-input-exchange consumers (cdc_merge,
    reconcile — fs_exchange_reduce_multi writes SEVERAL datasets into
    one exchange dir) and grouped_mode route through the injected
    filesystem, with the fixture's watchdog proving no local-fs leak."""

    def test_cdc_merge_and_reconcile(self, ray_session,
                                     injected_exchange):
        tmp_path = injected_exchange
        from guac_ray.functions.setops import reconcile
        from guac_ray.functions.streams import cdc_merge

        base = pd.DataFrame({"user_id": [1, 2],
                             "value_cents": [10, 20],
                             "updated_us": [100, 100]})
        chg = pd.DataFrame({
            "user_id": [1, 2],
            "ts": pd.to_datetime([200, 200], unit="us"),
            "event_id": [0, 1], "op": [0, 1],
            "value_cents": [15, 0]})
        got = cdc_merge(rd.from_pandas(base),
                        rd.from_pandas(chg)).to_pandas()
        assert got.values.tolist() == [[1, 15, 200, 1]]
        assert _subtree_has_exchange(tmp_path, "cdcmerge")

        t = reconcile(rd.from_pandas(pd.DataFrame({"k": [1], "v": [1]})),
                      rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]})),
                      "k", ["v"])
        assert t["status"].to_pylist() == ["differs"]
        assert _subtree_has_exchange(tmp_path, "reconcile")

    def test_grouped_mode_and_debounce(self, ray_session,
                                       injected_exchange):
        tmp_path = injected_exchange
        from guac_ray.functions.streams import debounce
        from guac_ray.stages.groupagg import grouped_mode

        m = grouped_mode(
            rd.from_pandas(pd.DataFrame({"k": [1, 1], "v": ["a", "a"]})),
            ["k"], "v").to_pandas()
        assert m.values.tolist() == [[1, "a", 2]]
        assert _subtree_has_exchange(tmp_path, "gmode")

        d = debounce(rd.from_pandas(pd.DataFrame({
            "event_id": [0, 1], "user_id": [1, 1],
            "ts": pd.to_datetime([0, 5], unit="us")})),
            gap_us=10).to_pandas()
        assert d["event_id"].tolist() == [0]
        assert _subtree_has_exchange(tmp_path, "debounce")
