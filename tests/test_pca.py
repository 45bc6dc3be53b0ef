"""PCA top component: numpy eigensolver parity (up to sign and
quantization), planted-direction recovery, partitioning invariance,
guards."""

import numpy as np
import pandas as pd
import pytest


def _run(X, nblocks=1, **kw):
    import ray.data as rd

    from guac_ray.functions.pca import pca_top_component

    df = pd.DataFrame({"embedding": [row for row in X]})
    out = pca_top_component(rd.from_pandas(df).repartition(nblocks),
                            "embedding", **kw).to_pandas()
    return out.sort_values("dim").reset_index(drop=True)


class TestPcaTopComponent:
    def test_matches_numpy_eigenvector(self, ray_session):
        rng = np.random.default_rng(111)
        # anisotropic Gaussian: a clear principal direction
        d = 16
        A = rng.normal(size=(d, d))
        X = rng.normal(size=(800, d)) @ A
        # iters=30: convergence rate is the eigen-gap ratio, and a
        # random Gram matrix can have a small gap — the default 12 is
        # the ORACLE-matched constant, not a convergence guarantee
        out = _run(X.astype("float32"), nblocks=4, iters=30)
        v = out["component_fp"].to_numpy().astype("float64")
        v = v / np.linalg.norm(v)
        C = np.cov(X.T, bias=True)
        w, V = np.linalg.eigh(C)
        top = V[:, -1]
        # direction match up to sign and fixed-point quantization
        assert abs(abs(v @ top) - 1.0) < 1e-3

    def test_planted_direction_recovery(self, ray_session):
        rng = np.random.default_rng(112)
        d = 8
        u = np.zeros(d)
        u[3] = 1.0  # variance concentrated on dim 3
        X = (rng.normal(size=(500, 1)) * 10) @ u[None, :] \
            + rng.normal(scale=0.1, size=(500, d))
        out = _run(X.astype("float32"))
        v = out["component_fp"].to_numpy().astype("float64")
        assert np.argmax(np.abs(v)) == 3
        assert abs(v[3]) == (1 << 20)  # the max-norm component is +-Q

    def test_partitioning_bit_exact(self, ray_session):
        rng = np.random.default_rng(113)
        X = rng.normal(size=(300, 12)).astype("float32")
        a = _run(X, nblocks=1)
        b = _run(X, nblocks=7)
        pd.testing.assert_frame_equal(a, b, check_exact=True)

    def test_zero_variance_and_guards(self, ray_session):
        X = np.ones((10, 4), dtype="float32")  # constant -> Cn = 0
        out = _run(X)
        assert (out["component_fp"] == 0).all()
        with pytest.raises(ValueError, match="iters"):
            _run(X, iters=0)
        with pytest.raises(Exception, match="non-finite"):
            bad = np.ones((5, 4), dtype="float32")
            bad[0, 0] = np.nan
            _run(bad)
        with pytest.raises(Exception, match="max_dim"):
            _run(np.ones((3, 9), dtype="float32"), max_dim=8)
