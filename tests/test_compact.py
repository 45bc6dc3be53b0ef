"""Parquet small-file compaction (sources/compact.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from guac_ray.sources.compact import compact_parquet, plan_groups


def _write_small_files(d, n_files=12, rows=200, seed=3):
    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    total = 0
    for i in range(n_files):
        df = pd.DataFrame({"k": rng.integers(0, 50, rows),
                           "v": rng.random(rows)})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(d, f"part-{i:04d}.parquet"))
        total += rows
    return total


class TestPlanGroups:
    def test_deterministic_packing(self):
        files = [(f"f{i}", 40) for i in range(10)]
        groups = plan_groups(files, 100)
        assert [len(g) for g in groups] == [2, 2, 2, 2, 2]
        assert groups == plan_groups(files, 100)

    def test_oversize_file_gets_own_group(self):
        groups = plan_groups([("big", 500), ("a", 10), ("b", 10)], 100)
        assert groups[0] == ["big"]
        assert groups[1] == ["a", "b"]


class TestCompactParquet:
    def test_rows_preserved_and_fewer_files(self, ray_session, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        total = _write_small_files(src)
        res = compact_parquet(src, dst, target_mb=1)
        outs = sorted(os.listdir(dst))
        assert res["rows"] == total
        assert 1 <= len(outs) < 12
        got = pq.read_table(dst)
        assert got.num_rows == total

    def test_rerun_skips_completed_groups(self, ray_session, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        _write_small_files(src)
        first = compact_parquet(src, dst, target_mb=1)
        again = compact_parquet(src, dst, target_mb=1)
        assert first["skipped"] == 0
        assert again["skipped"] == again["groups"] == first["groups"]

    def test_delete_inputs(self, ray_session, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        total = _write_small_files(src, n_files=4)
        compact_parquet(src, dst, target_mb=1, delete_inputs=True)
        assert not [f for f in os.listdir(src) if f.endswith(".parquet")]
        assert pq.read_table(dst).num_rows == total

    def test_empty_dir_raises(self, ray_session, tmp_path):
        os.makedirs(tmp_path / "empty_src")
        with pytest.raises(ValueError, match="no parquet files"):
            compact_parquet(str(tmp_path / "empty_src"), str(tmp_path / "o"))

    def test_out_dir_inside_in_dir_rejected(self, ray_session, tmp_path):
        src = str(tmp_path / "src")
        _write_small_files(src, n_files=2)
        with pytest.raises(ValueError, match="inside in_dir"):
            compact_parquet(src, os.path.join(src, "compacted"))

    def test_crash_mid_delete_does_not_duplicate_rows(self, ray_session, tmp_path):
        """The ADVICE scenario: group [A, B] committed, A removed, crash
        before B's removal. The rerun must resume the persisted plan
        (digest-skip the group) rather than re-pack the surviving B into
        a new group and duplicate its rows."""
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        total = _write_small_files(src, n_files=6)
        compact_parquet(src, dst, target_mb=1)
        # simulate the partial post-commit deletion of a crashed
        # delete_inputs run: some inputs gone, some survive
        survivors = sorted(os.listdir(src))
        for f in survivors[::2]:
            os.remove(os.path.join(src, f))
        res = compact_parquet(src, dst, target_mb=1, delete_inputs=True)
        assert res["skipped"] == res["groups"]  # plan resumed, no rewrites
        assert pq.read_table(dst).num_rows == total  # no duplicated rows
        assert not [f for f in os.listdir(src) if f.endswith(".parquet")]

    def test_new_files_extend_manifest(self, ray_session, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        total = _write_small_files(src, n_files=4)
        first = compact_parquet(src, dst, target_mb=1)
        # new shards arrive; rerun compacts only them, old groups skip
        extra = _write_small_files(os.path.join(src, "late"), n_files=3, seed=9)
        res = compact_parquet(src, dst, target_mb=1)
        assert res["skipped"] == first["groups"]
        assert res["groups"] > first["groups"]
        assert pq.read_table(dst).num_rows == total + extra

    def test_recreated_input_is_not_deleted_unread(self, ray_session, tmp_path):
        """Review finding: a path compacted+deleted in run 1, then
        RECREATED by a producer, must not be deleted by run 2's deferred
        cleanup without being read — and its new rows must land in the
        output on the next compaction."""
        import time

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        total = _write_small_files(src, n_files=3)
        first_file = sorted(
            os.path.join(src, f) for f in os.listdir(src)
            if f.endswith(".parquet"))[0]
        compact_parquet(src, dst, target_mb=1, delete_inputs=True)
        assert not os.path.exists(first_file)
        # producer re-creates the same path with NEW data (same schema)
        t_new = pa.table({"k": pa.array([7, 8], type=pa.int64()),
                          "v": pa.array([0.5, 0.25], type=pa.float64())})
        pq.write_table(t_new, first_file)
        res2 = compact_parquet(src, dst, target_mb=1, delete_inputs=True)
        # the recreated file was planned as a new group and compacted
        assert res2["rows"] == 2
        assert pq.read_table(dst).num_rows == total + 2
        # and only then deleted (by its own matching member)
        assert not os.path.exists(first_file)

    def test_recreated_during_run_survives_delete(self, ray_session, tmp_path):
        """A file recreated AFTER planning but BEFORE the delete pass
        (mid-run race) must survive the cleanup."""
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        _write_small_files(src, n_files=2)
        f0 = sorted(os.path.join(src, f) for f in os.listdir(src)
                    if f.endswith(".parquet"))[0]
        compact_parquet(src, dst, target_mb=1)  # plan + outputs, no delete
        # recreate f0 with new content (stat changes)
        pq.write_table(pa.table({"k": pa.array([9], type=pa.int64()),
                                 "v": pa.array([0.125], type=pa.float64())}),
                       f0)
        res = compact_parquet(src, dst, target_mb=1, delete_inputs=True)
        # new generation compacted; the recreated file deleted by ITS member
        assert pq.read_table(dst).num_rows >= 1
        assert res["groups"] > 1


class TestWave9Hardening:
    """Round-5 session-11: recreated-file integrity in compaction and
    unpack truncation/reject accounting."""

    def _write(self, path, vals):
        import pandas as pd

        pd.DataFrame({"x": vals}).to_parquet(path, index=False)

    def test_recreated_input_not_duplicated(self, ray_session, tmp_path):
        """A file recreated between planning and work() must NOT have
        its new bytes read into the OLD group's output (they belong to
        the appended group that replans the path)."""
        import json
        import os

        import pandas as pd

        from guac_ray.sources.compact import (_load_or_extend_manifest,
                                              compact_parquet)

        ind = tmp_path / "in"
        outd = tmp_path / "out"
        ind.mkdir()
        outd.mkdir()
        a = str(ind / "a.parquet")
        self._write(a, [1, 2, 3])
        # plan only (simulate a crash between plan and work)
        _load_or_extend_manifest(str(ind), str(outd), 1 << 30)
        # producer recreates the file with NEW content
        os.remove(a)
        self._write(a, [10, 20, 30])
        os.utime(a, ns=(1, 1))  # force a distinct mtime_ns
        res = compact_parquet(str(ind), str(outd))
        import glob

        rows = []
        for f in glob.glob(str(outd / "*.parquet")):
            rows.extend(pd.read_parquet(f)["x"].tolist())
        # exactly ONE generation of the new bytes — never six rows
        assert sorted(rows) == [10, 20, 30], (rows, res)

    def test_v1_member_of_completed_group_never_deleted(
            self, ray_session, tmp_path):
        import json
        import os

        import pandas as pd

        from guac_ray.sources.compact import compact_parquet

        ind = tmp_path / "in"
        outd = tmp_path / "out"
        ind.mkdir()
        outd.mkdir()
        a = str(ind / "a.parquet")
        self._write(a, [1])
        # build a COMPLETED v1 world: run once, then rewrite a v1 manifest
        compact_parquet(str(ind), str(outd))
        import hashlib

        dig = hashlib.sha256(a.encode()).hexdigest()[:16]
        # the v2 output name differs; create the v1-digest output so the
        # legacy group reads as completed
        open(str(outd / f"compact-{dig}.parquet"), "wb").write(
            open(next(iter(__import__("glob").glob(str(outd / "compact-*.parquet")))), "rb").read())
        with open(str(outd / "_compact_manifest.json"), "w") as f:
            json.dump({"groups": [[a]]}, f)  # v1 format
        # producer recreates the input with data never compacted
        os.remove(a)
        self._write(a, [999])
        compact_parquet(str(ind), str(outd), delete_inputs=True)
        # the recreated file must SURVIVE (unverifiable v1 member)
        assert os.path.exists(a)
        assert pd.read_parquet(a)["x"].tolist() == [999]

    def test_unpack_truncation_and_reject_markers(self, ray_session):
        import json

        import pandas as pd
        import ray.data as rd

        from guac_ray.sources.unpack import unpack_documents

        deep: dict = {"format": "leafish", "blob": "DEEP"}
        for _ in range(4):
            deep = {"format": "bundle", "children": [deep]}
        mixed = {"format": "bundle",
                 "children": ["just-a-string",
                              {"format": "f", "blob": "B"}]}
        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": ["deep", "mixed"],
            "payload": [json.dumps(deep), json.dumps(mixed)]}))
        out = unpack_documents(ds, max_depth=2).to_pandas()
        d = out[out.root_id == "deep"]
        # the capped subtree surfaces as a MARKER, not an empty 'leaf'
        assert (d.status == "depth_truncated").sum() == 1
        assert (d.status == "leaf").sum() == 0
        m = out[out.root_id == "mixed"]
        assert (m.status == "reject").sum() == 1   # the malformed child
        assert (m.status == "leaf").sum() == 1
