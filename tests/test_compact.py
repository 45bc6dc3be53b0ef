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
        with pytest.raises(ValueError, match="no parquet files"):
            compact_parquet(str(tmp_path), str(tmp_path / "o"))
