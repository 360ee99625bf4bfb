"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def models_dir():
    """All-75-language model tables (built once, cached in /tmp)."""
    from tiny_lingua_ray.models.train import ensure_models

    return ensure_models(use_ray=False)


@pytest.fixture(scope="session")
def small_models_dir():
    """Five-language model subset for fast unit tests."""
    from tiny_lingua_ray.models.train import ensure_models

    return ensure_models(languages=("en", "de", "es", "fr", "zh"), use_ray=False)
