import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_df():
    """t1 fixture as pandas (ground-truth input)."""
    from abslog_ray.fixtures import generate_transcripts
    return generate_transcripts(seed=42, n_turns=2000).to_pandas()


@pytest.fixture(scope="session")
def t1_path():
    from abslog_ray.fixtures import fixture_parquet
    return fixture_parquet("t1")


@pytest.fixture(scope="session")
def t2_path():
    from abslog_ray.fixtures import fixture_parquet
    return fixture_parquet("t2")


@pytest.fixture(scope="session")
def default_cfg():
    from abslog_ray.config import PipelineConfig
    from abslog_ray.fixtures import TOOL_CATS, ROLE_SINKS
    # small pools/buckets: the test session has only 4 CPUs, and a (2,16)
    # autoscaling actor pool churns pending actors there (observed flaky
    # actor startup under churn)
    return PipelineConfig(tool_lookup=dict(TOOL_CATS),
                          role_lookup=dict(ROLE_SINKS),
                          gap_buckets=8, agg_buckets=8,
                          enrich_concurrency=(1, 2))
