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


def host_sync(x) -> None:
    """Reliable device-sync for timing: fetch a scalar reduction to host.

    On the axon remote backend `jax.block_until_ready` returns early; a
    host fetch is the only dependable sync point (see CLAUDE.md). Works on
    arrays and pytrees.
    """
    import numpy as np
    import jax.numpy as jnp

    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jnp.sum(jnp.asarray(leaf, jnp.float32))))


def bench_rates(fn, args, iters: int = 20, repeats: int = 3):
    """Median items/sec over `repeats` timing windows of `iters` calls.

    The canonical A/B methodology for this repo (docs/performance.md):
    host-fetch-synced, one process, median-of-N windows — isolated per-op
    timings on the tunneled chip swing up to 2.4x and must not be trusted.
    Returns (median_rate, last_output); rate divides by args[1].shape[0]
    treated as the batch dimension when present, else counts calls/sec.
    """
    import numpy as np

    out = fn(*args)
    host_sync(out)
    batch = getattr(args[1], "shape", [1])[0] if len(args) > 1 else 1
    rates = []
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        host_sync(out)
        rates.append(batch / ((time.time() - t0) / iters))
    return float(np.median(rates)), out
