import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    from entity_resolution_ray.tuning import apply_context_defaults

    apply_context_defaults()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_1k():
    from entity_resolution_ray.fixtures.generator import fixture_dir_for

    return fixture_dir_for(1000)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
