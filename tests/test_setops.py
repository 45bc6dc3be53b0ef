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
