"""INTERSECT/EXCEPT distinct semantics: duplicates collapse, null keys,
multi-column tuples, SQL parity."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _ops(a, b, cols):
    import ray.data as rd

    from guac_ray.functions.setops import except_distinct, intersect_distinct

    da, db = rd.from_pandas(a), rd.from_pandas(b)
    i = intersect_distinct(da, db, cols, num_buckets=2).to_pandas()
    e = except_distinct(da, db, cols, num_buckets=2).to_pandas()

    def norm(df):
        # Ray's to_pandas drops columns for an all-empty Dataset
        return (df.sort_values(cols).reset_index(drop=True)
                if len(df) else df)

    return norm(i), norm(e)


class TestSetOps:
    def test_distinct_semantics_and_duplicates(self, ray_session):
        a = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3]})
        b = pd.DataFrame({"k": [2, 2, 3, 9]})
        i, e = _ops(a, b, ["k"])
        assert i.k.tolist() == [2, 3]   # duplicates collapse
        assert e.k.tolist() == [1]      # EXCEPT is distinct too

    def test_multi_column_sql_parity(self, ray_session):
        rng = np.random.default_rng(5)
        a = pd.DataFrame({"u": rng.integers(0, 30, 500),
                          "d": rng.integers(0, 10, 500)})
        b = pd.DataFrame({"u": rng.integers(0, 30, 500),
                          "d": rng.integers(0, 10, 500)})
        i, e = _ops(a, b, ["u", "d"])
        wi = duckdb.sql("SELECT * FROM a INTERSECT SELECT * FROM b") \
            .df().sort_values(["u", "d"]).reset_index(drop=True)
        we = duckdb.sql("SELECT * FROM a EXCEPT SELECT * FROM b") \
            .df().sort_values(["u", "d"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(i, wi, check_dtype=False)
        pd.testing.assert_frame_equal(e, we, check_dtype=False)

    def test_disjoint_and_empty_sides(self, ray_session):
        a = pd.DataFrame({"k": [1, 2]})
        b = pd.DataFrame({"k": [3]})
        i, e = _ops(a, b, ["k"])
        assert len(i) == 0 and e.k.tolist() == [1, 2]


class TestReconcile:
    """Keyed reconciliation: four statuses, NULL==NULL compare, detail
    mode, and the unique-key contract."""

    def test_hand_case_and_detail(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.setops import reconcile

        left = pd.DataFrame({
            "k": [1, 2, 3, 4],
            "v": [10.0, 20.0, None, 40.0],
            "s": ["a", "b", "c", "d"]})
        right = pd.DataFrame({
            "k": [1, 3, 4, 5],
            "v": [10.0, None, 41.0, 50.0],
            "s": ["a", "c", "d", "e"]})
        # k1 equal; k2 only_left; k3 equal (NULL == NULL); k4 differs
        # (v 40 vs 41); k5 only_right.
        t = reconcile(rd.from_pandas(left).repartition(2),
                      rd.from_pandas(right).repartition(2),
                      "k", ["v", "s"],
                      exchange_base=str(tmp_path / "r"), num_buckets=2)
        got = dict(zip(t["status"].to_pylist(), t["n_keys"].to_pylist()))
        assert got == {"equal": 2, "only_left": 1, "only_right": 1,
                       "differs": 1}

        d = reconcile(rd.from_pandas(left), rd.from_pandas(right),
                      "k", ["v", "s"], detail=True,
                      exchange_base=str(tmp_path / "d"),
                      num_buckets=2).to_pandas().set_index("k")["status"]
        assert d.to_dict() == {1: "equal", 2: "only_left", 3: "equal",
                               4: "differs", 5: "only_right"}

    def test_duplicate_key_contract(self, ray_session, tmp_path):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.setops import reconcile

        dup = pd.DataFrame({"k": [1, 1], "v": [1.0, 2.0]})
        ok = pd.DataFrame({"k": [1], "v": [1.0]})
        with pytest.raises(Exception, match="unique per side"):
            reconcile(rd.from_pandas(dup), rd.from_pandas(ok), "k",
                      ["v"], exchange_base=str(tmp_path / "x"))


def test_reconcile_cli_verb(ray_session, tmp_path, capsys):
    import json

    import pandas as pd

    from guac_ray.__main__ import cmd_reconcile

    pd.DataFrame({"k": [1, 2], "v": [10, 20]}).to_parquet(
        tmp_path / "l.parquet")
    pd.DataFrame({"k": [1, 2], "v": [10, 21]}).to_parquet(
        tmp_path / "r.parquet")

    class A:
        left = str(tmp_path / "l.parquet")
        right = str(tmp_path / "r.parquet")
        key, compare, detail = "k", None, str(tmp_path / "d")
        num_cpus = None
    assert cmd_reconcile(A()) == 1  # k2 differs -> migration gate fails
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {r["status"]: r["n_keys"] for r in rep["summary"]}
    assert got == {"equal": 1, "differs": 1}
    import pyarrow.parquet as pq
    d = pq.read_table(str(tmp_path / "d")).to_pandas().set_index("k")
    assert d.loc[2, "status"] == "differs"
