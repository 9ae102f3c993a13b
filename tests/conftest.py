import os

import pytest

try:  # deterministic property tests for unattended gates: hypothesis
    # otherwise explores NEW random examples every run, so a green
    # suite can flake later on a fresh falsifying example (exactly how
    # the selection-quantile pass-budget bug surfaced).  Exploration
    # stays available via HYPOTHESIS_PROFILE=explore.
    from hypothesis import settings as _hsettings

    _hsettings.register_profile("ci", derandomize=True)
    _hsettings.register_profile("explore", derandomize=False)
    _hsettings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "ci"))
except ImportError:  # pragma: no cover
    pass


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (per driver contract)."""
    import ray

    from archbloom_ray.proc_cache import ray_data_logging_config_path

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pythonpath = repo_root + (
        ":" + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else "")
    if not ray.is_initialized():
        # reuse-friendly glibc arenas: this sandbox faults fresh mmap
        # pages at ~30 MB/s, so keep big numpy buffers on the heap.
        # The logging config pins ray.data's noisy schema-hash warning
        # at ERROR in driver and workers alike.
        env_vars = {
            "MALLOC_MMAP_THRESHOLD_": "268435456",
            "MALLOC_TRIM_THRESHOLD_": "268435456",
            "PYTHONPATH": pythonpath,
        }
        log_cfg = ray_data_logging_config_path()
        if log_cfg:
            os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", log_cfg)
            env_vars["RAY_DATA_LOGGING_CONFIG"] = log_cfg
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            runtime_env={"env_vars": env_vars},
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
