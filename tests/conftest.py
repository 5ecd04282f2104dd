import os

import pytest
import ray

# see bench.py / longqc_ray.__init__._tune_malloc: raylet-spawned
# workers inherit this env; must be set before ray.init
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(64 * 1024 * 1024))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(64 * 1024 * 1024))


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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture_dir():
    from longqc_ray.fixtures import fixture_dir

    return fixture_dir("tiny")
