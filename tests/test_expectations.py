"""Data-quality expectations (functions/expectations.py): each check
kind caught on a hand-planted violation, cross-partition uniqueness,
and the check-order / passed-flag contract."""

import numpy as np
import pandas as pd
import pytest


class TestCheckTable:
    def test_each_kind_catches_planted_violation(self, ray_session,
                                                 tmp_path):
        import ray.data as rd

        from guac_ray.functions.expectations import check_table

        df = pd.DataFrame({
            "id": [1, 2, 2, 3, 4],          # one duplicate pair
            "tag": ["a", "a", None, "b", "z"],  # one null, one 'z'
            "price": [1.0, 2.0, 3.0, 350.0, -0.5],  # 2 out of range
            "ref": [10, 10, 11, 12, 99],    # 99 has no parent
        })
        parent = pd.DataFrame({"pk": [10, 11, 12]})
        got = check_table(
            rd.from_pandas(df).repartition(3),
            [
                {"kind": "unique", "col": "id"},
                {"kind": "not_null", "col": "tag"},
                {"kind": "accepted_values", "col": "tag",
                 "values": ["a", "b"]},
                {"kind": "range_cents", "col": "price",
                 "lo": 1, "hi": 30000},
                {"kind": "fk", "col": "ref",
                 "parent": rd.from_pandas(parent), "parent_col": "pk"},
            ],
            exchange_base=str(tmp_path / "e"), num_buckets=4,
        ).to_pylist()
        assert [r["check_name"] for r in got] == [
            "unique:id", "not_null:tag", "accepted_values:tag",
            "range_cents:price", "fk:ref"]
        assert [r["n_violations"] for r in got] == [1, 1, 1, 2, 1]
        assert all(r["n_checked"] == 5 for r in got)
        assert [r["passed"] for r in got] == [0] * 5

    def test_unique_across_partitions_and_all_pass(self, ray_session,
                                                   tmp_path):
        import ray.data as rd

        from guac_ray.functions.expectations import check_table

        # the duplicate pair lands in DIFFERENT blocks — per-block
        # distinct alone would miss it without the key exchange
        df = pd.DataFrame({"id": [1, 2, 3, 4, 5, 6, 7, 1]})
        got = check_table(
            rd.from_pandas(df).repartition(8),
            [{"kind": "unique", "col": "id"}],
            exchange_base=str(tmp_path / "u"), num_buckets=2).to_pylist()
        assert got[0]["n_violations"] == 1 and got[0]["passed"] == 0

        clean = check_table(
            rd.from_pandas(pd.DataFrame({"id": [1, 2, 3]})),
            [{"kind": "unique", "col": "id"},
             {"kind": "not_null", "col": "id"}],
            exchange_base=str(tmp_path / "c")).to_pylist()
        assert [r["passed"] for r in clean] == [1, 1]

    def test_unknown_kind_raises(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.expectations import check_table

        with pytest.raises(ValueError):
            check_table(rd.from_pandas(pd.DataFrame({"x": [1]})),
                        [{"kind": "regex", "col": "x"}])
