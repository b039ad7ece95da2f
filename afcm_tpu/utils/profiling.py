"""Profiling / tracing helpers.

TPU equivalent of the reference's `misc.profiled_function` +
`torch.autograd.profiler.record_function` scopes (reference:
torch_utils/misc.py:100-105): `named_scope` annotations show up in XLA/HLO
and in `jax.profiler` traces; `trace` captures a TensorBoard-loadable trace
directory; `hlo_dump` writes the optimized HLO of a jitted function for
fusion inspection.
"""

from __future__ import annotations

import contextlib
import functools
import os
import time
from typing import Optional

import jax


def profiled_function(fn):
    """Wrap a function in a jax named scope carrying its name."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)
    return wrapper


named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/afcm_trace"):
    """Capture a profiler trace around a block (view with TensorBoard)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def hlo_dump(fn, *example_args, optimized: bool = True) -> str:
    """Return the (optionally compiler-optimized) HLO text of jit(fn)."""
    lowered = jax.jit(fn).lower(*example_args)
    if optimized:
        return lowered.compile().as_text()
    return lowered.as_text()


class StepTimer:
    """Wall-clock step timing with device sync via host fetch.

    Note: on the axon backend `block_until_ready` returns before execution
    completes; a host fetch is the reliable sync (see
    .claude/skills/verify/SKILL.md).
    """

    def __init__(self):
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result) -> float:
        import numpy as np
        import jax.numpy as jnp
        leaves = jax.tree.leaves(result)
        if leaves:
            np.asarray(jnp.sum(leaves[0]))
        dt = time.time() - self._t0
        self._t0 = None
        return dt
