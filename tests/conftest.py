"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

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
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_tiny() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def frontier_tiny(tmp_path_factory) -> str:
    """Deterministic tiny synthetic frontier parquet (FIXTURES.md F1)."""
    from don_crawler_ray.sources.frontier import generate_frontier_parquet

    out = tmp_path_factory.mktemp("frontier") / "frontier_tiny.parquet"
    generate_frontier_parquet(str(out), scale="tiny", seed=42)
    return str(out)
