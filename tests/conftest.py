"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere, so this file avoids
importing jax at module scope until after the env is set.
"""

import os

# NOTE: the axon TPU plugin in this image ignores JAX_PLATFORMS; set
# JAX_PLATFORM_NAME as well (that one is honored).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A pytest plugin may have imported jax before this conftest ran, in which
# case the env vars above came too late; the config update still works as
# long as no backend has been initialized yet.
jax.config.update("jax_platform_name", "cpu")
# The axon plugin's register() (sitecustomize) sets jax_platforms="axon,cpu"
# via jax.config, which OVERRIDES the env vars above — and when the TPU
# tunnel is down, initializing the axon backend blocks forever inside
# make_c_api_client, hanging every jax.devices() call. Force the config
# itself back to cpu so CPU test runs never touch the tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavy fused front-end graphs take minutes
# to compile even on CPU; cache them across test runs. The CPU cache is a
# SEPARATE directory from the TPU one (.jax_cache): CPU AOT executables are
# machine-specific, and entries written by a different host (earlier rounds
# ran on other machine types; every load warns "could lead to execution
# errors such as SIGILL") eventually DID segfault mid-suite in
# jax compilation_cache.get_executable_and_time. A per-machine CPU cache
# avoids loading foreign executables; TPU artifacts are device-targeted and
# unaffected.
from sindslam_tpu.utils import cpu_cache_dirname  # noqa: E402

# SINDSLAM_TEST_CACHE_DIR overrides the cache location (used by cache-state
# experiments; jax's own JAX_COMPILATION_CACHE_DIR env var would lose to
# these config updates).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SINDSLAM_TEST_CACHE_DIR") or
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), cpu_cache_dirname()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)


@pytest.fixture(autouse=True, scope="module")
def _bound_llvm_jit_state():
    """Drop jax's in-process executable caches after every test module.

    A full single-process suite run deterministically segfaults (SIGSEGV in
    an XLA:CPU LLVM compile, ~test #90, tests/test_homography_mask.py) once
    enough compiled executables are resident — the accumulated JIT code
    eventually lands a compile outside the small code model's reach. Each
    module's tests share compiles; across modules the persistent disk cache
    (above) makes the post-clear reloads cheap, so bounding live LLVM state
    at module granularity costs seconds and removes the crash."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def synthetic_frames():
    """A short deterministic synthetic RGB-D sequence shared across tests."""
    from sindslam_tpu.datasets.synthetic import generate_sequence

    return list(generate_sequence(n_frames=8, seed=0, with_dynamic=True))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
