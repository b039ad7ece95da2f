"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set flags before jax initializes, hence the env mutation at import time.
"""

import os
import resource

# The XLA CPU compiler has segfaulted mid-suite (twice, always late in the
# run, inside backend_compile_and_load on a compile that passes in
# isolation) — consistent with main-thread stack exhaustion on a deep
# LLVM pass after ~200 prior compiles. The soft stack limit is 8 MB with
# an unlimited hard cap; raise it before jax loads.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (_want if _hard == resource.RLIM_INFINITY
                        else min(_want, _hard), _hard))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The container's sitecustomize registers the axon TPU backend and overrides
# jax_platforms; force unit tests back onto the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


REFERENCE_ROOT = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_ROOT)
