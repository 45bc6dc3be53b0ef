"""Column profiler (functions/profile.py): exact distinct through the
pair exchange, typed min/max, null accounting, long-format contract."""

import numpy as np
import pandas as pd
import pytest


class TestTableProfile:
    def test_hand_profile_with_nulls(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.profile import table_profile

        base = pd.Timestamp("2024-06-01")
        df = pd.DataFrame({
            "k": [1, 2, 2, 3, None],
            "price": [1.005, 2.0, 2.0, None, 9.99],
            "tag": ["b", None, "a", "a", "c"],
            "when": [base, base, None,
                     base + pd.Timedelta(days=1), base],
        })
        got = table_profile(
            rd.from_pandas(df).repartition(3),
            {"k": "int", "price": "cents", "tag": "str",
             "when": "ts_us"},
            exchange_base=str(tmp_path / "p"), num_buckets=4,
        ).to_pylist()
        by = {r["col"]: r for r in got}
        assert [r["col"] for r in got] == ["k", "price", "tag", "when"]
        # k: nullable float column of ints — 3 distinct non-null
        assert (by["k"]["n_rows"], by["k"]["n_null"],
                by["k"]["n_distinct"]) == (5, 1, 3)
        assert (by["k"]["min_num"], by["k"]["max_num"]) == (1, 3)
        # price: cents map — 1.005 is stored as 1.00499…, so
        # floor(100.49…+0.5) = 100 (the identical IEEE result in
        # DuckDB — that agreement is the whole point of the cents
        # contract); the two 2.0 rows collapse to ONE distinct value
        assert by["price"]["n_distinct"] == 3
        assert (by["price"]["min_num"], by["price"]["max_num"]) == (100, 999)
        # tag: lexicographic min/max over non-nulls, numerics NULL
        assert (by["tag"]["min_str"], by["tag"]["max_str"]) == ("a", "c")
        assert by["tag"]["min_num"] is None
        # when: epoch-µs bounds
        us = base.value // 1000
        assert (by["when"]["min_num"], by["when"]["max_num"]) == (
            us, us + 86400_000_000)
        assert by["when"]["n_null"] == 1

    def test_distinct_exact_across_partitions(self, ray_session,
                                              tmp_path):
        import ray.data as rd

        from guac_ray.functions.profile import table_profile

        # 600 rows over 8 blocks, 150 distinct values each appearing in
        # several blocks: in-batch distinct alone would overcount
        # without the pair exchange co-locating equal (col, val) pairs.
        df = pd.DataFrame({"v": np.arange(600, dtype=np.int64) % 150})
        got = table_profile(
            rd.from_pandas(df).repartition(8), {"v": "int"},
            exchange_base=str(tmp_path / "d"), num_buckets=4).to_pylist()
        assert got[0]["n_distinct"] == 150
        assert (got[0]["n_rows"], got[0]["n_null"]) == (600, 0)

    def test_unknown_kind_raises_and_empty(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.profile import table_profile

        df = pd.DataFrame({"v": pd.Series([], dtype="int64")})
        with pytest.raises(ValueError):
            table_profile(rd.from_pandas(df), {"v": "decimal"})
        got = table_profile(rd.from_pandas(df), {"v": "int"},
                            exchange_base=str(tmp_path / "e")).to_pylist()
        assert got == [{"col": "v", "n_rows": 0, "n_null": 0,
                        "n_distinct": 0, "min_num": None,
                        "max_num": None, "min_str": None,
                        "max_str": None}]
