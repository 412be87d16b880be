"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU via
--xla_force_host_platform_device_count (the JAX-idiomatic fake backend for
distributed tests, SURVEY.md section 4); bench.py runs on the real TPU.

Note: this sandbox pre-imports jax with JAX_PLATFORMS=axon (TPU tunnel) from
sitecustomize, so the env var is already consumed -- we must switch platforms
via jax.config.update instead.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: end-to-end pipeline/scene tests (~40-90 s each). The quick "
        "development run is `pytest -m 'not slow'` (< 5 min); CI / the "
        "driver run the full suite.")


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Drop compiled executables between test modules.

    The suite compiles dozens of large CPU programs (wavefront engine,
    batched optimizer, pallas-interpret kernels); keeping them all loaded
    eventually aborts the process inside XLA:CPU's JIT (observed as a fatal
    abort/segfault in backend_compile after ~50 tests). Scenes differ per
    module anyway, so cross-module cache hits are rare."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def plane_scene():
    from hpmvs_tpu.testing import make_plane_scene
    return make_plane_scene(n_cams=7, imgsize=512, n_points=200, seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
