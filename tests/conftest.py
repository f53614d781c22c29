"""Shared pytest fixtures. Ray is initialised ONCE per session."""

from __future__ import annotations

import os

import pytest

# worker thread-pool caps must be in the env BEFORE ray.init so Ray's own
# read tasks get them too (see gpml2pvjson_js_ray._cap_native_thread_pools)
for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
             "POLARS_MAX_THREADS"):
    os.environ.setdefault(_var, "2")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield ray
    ray.shutdown()
