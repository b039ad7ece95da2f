"""Shared tunnel-health guards for chip-touching scripts.

The axon tunnel can wedge indefinitely on any compile (CLAUDE.md; docs/
performance.md round-4 ops note). Scripts that compile over the tunnel
should (a) run `tiny_probe()` first so a pre-wedged tunnel fails in
seconds, and (b) hold a `start_watchdog(...)` so a wedge mid-compile
aborts the process instead of hanging forever.

The watchdog is a daemon thread, NOT signal.alarm: during a wedge the
main thread is blocked inside the tunnel's C call, so a Python SIGALRM
handler never runs; a daemon thread fires because the RPC releases the
GIL (same construction as bench.py).
"""

import os
import sys
import threading


def start_watchdog(secs, label="chip work"):
    """Abort the process with exit code 2 if not cancelled within `secs`.

    Returns the Timer; call .cancel() once past the risky region.
    """
    def _fire():
        print(f"WATCHDOG: {label} did not complete within {secs}s — "
              f"axon tunnel wedge suspected (docs/performance.md); "
              f"aborting.", file=sys.stderr, flush=True)
        os._exit(2)

    t = threading.Timer(secs, _fire)
    t.daemon = True
    t.start()
    return t


def tiny_probe(secs=600, retries=1):
    """Compile+run a trivial jit under its own watchdog.

    Cheap (~seconds on a healthy warm tunnel, but measured up to ~220 s on
    a cold session, round 5 — hence the generous default) and fails fast
    when the tunnel is already wedged, before a script sinks minutes into
    a big compile it can never finish.

    Retries once on JaxRuntimeError: a FAILED_PRECONDITION right after
    another chip process exits is transient (observed round 5 — the same
    probe passed seconds later); a wedge, by contrast, hangs rather than
    erroring, which the watchdog handles.
    """
    t = start_watchdog(secs, "tiny jit probe")
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        for attempt in range(retries + 1):
            try:
                x = jnp.ones((128, 128))
                val = float(np.asarray(jnp.sum(jax.jit(lambda a: a @ a)(x))))
                return val
            except jax.errors.JaxRuntimeError as exc:
                if attempt == retries:
                    raise
                print(f"tiny probe attempt {attempt + 1} failed "
                      f"({exc!r}); retrying in 30 s", file=sys.stderr,
                      flush=True)
                time.sleep(30)
    finally:
        t.cancel()
