"""Weighted WOR sampling: determinism, weight bias, edge cases."""

import numpy as np
import pandas as pd
import pytest


def _sample(df, k, **kw):
    import ray.data as rd

    from guac_ray.functions.sampling import weighted_sample_k

    return weighted_sample_k(rd.from_pandas(df).repartition(3), k,
                             "w", "i", **kw)


class TestWeightedSample:
    def test_deterministic_and_partition_invariant(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.sampling import weighted_sample_k

        df = pd.DataFrame({"i": np.arange(1000),
                           "w": np.arange(1, 1001).astype("int64")})
        a = _sample(df, 50)
        b = weighted_sample_k(rd.from_pandas(df).repartition(7), 50,
                              "w", "i")
        assert a.i.tolist() == b.i.tolist()

    def test_weight_bias(self, ray_session):
        # ids 0..499 weight 1, ids 500..999 weight 100: the heavy half
        # must dominate a k=100 sample
        df = pd.DataFrame({
            "i": np.arange(1000),
            "w": np.array([1] * 500 + [100] * 500, dtype="int64")})
        got = _sample(df, 100)
        assert (got.i >= 500).mean() > 0.8

    def test_without_replacement_and_kcap(self, ray_session):
        df = pd.DataFrame({"i": [1, 2, 3], "w": [5, 5, 5]})
        got = _sample(df, 10)
        assert sorted(got.i) == [1, 2, 3]  # k > population → everything
        assert got.i.is_unique

    def test_nonpositive_weights_excluded(self, ray_session):
        df = pd.DataFrame({"i": [1, 2, 3, 4], "w": [0, -2, 7, 7]})
        got = _sample(df, 4)
        assert sorted(got.i) == [3, 4]

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            _sample(pd.DataFrame({"i": [1], "w": [1]}), 0)
