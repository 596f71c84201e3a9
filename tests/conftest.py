"""Session-scoped Ray fixture: one local Ray per pytest session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

# repo root on sys.path so `aumos_drift_detector_ray` imports without install
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()
