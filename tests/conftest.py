import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus(tmp_path_factory):
    """Deterministic smoke-size corpus (FIXTURES.md sf_smoke)."""
    from guac_ray.synth import generate_corpus

    out = tmp_path_factory.mktemp("corpus") / "smoke"
    return generate_corpus(str(out), n_convs=200, n_shards=2)
