import os

import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver requirement)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir():
    return FIXTURE_DIR


@pytest.fixture(scope="session")
def pages_path():
    return os.path.join(FIXTURE_DIR, "pages.parquet")


@pytest.fixture(scope="session")
def golden_path():
    return os.path.join(FIXTURE_DIR, "golden.parquet")
