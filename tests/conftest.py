import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (per driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # reuse-friendly glibc arenas: this sandbox faults fresh
            # mmap pages at ~30 MB/s, so keep big numpy buffers on the heap
            runtime_env={"env_vars": {
                "MALLOC_MMAP_THRESHOLD_": "268435456",
                "MALLOC_TRIM_THRESHOLD_": "268435456",
            }},
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
