"""Benchmark: CMSR inference throughput of the flagship alias-free generator.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: 256^2 MR slices/sec/chip for the full-size AFCM CMSR generator
(G_ema forward: 8-layer mapping + 14 encoder + 15 synthesis alias-free
layers, 58.5M params), fp32, on the attached TPU chip.

Baseline (see BASELINE.md "A100 anchor derivation"): the reference repo
publishes no numbers and no GPU exists in this environment, so the A100
anchor is FLOP-derived rather than measured. The generator forward costs
1.088 TFLOP/slice (XLA cost analysis, batch 16 — see BASELINE.md for the
command). On A100 the reference (PyTorch 1.9, TF32 convs on by default)
peaks at 156 TF/s; this model's realistic utilization band is 30-50%
(small-channel 256-612^2 convs + the bandwidth-bound FIR chain), giving
43-72 slices/s. Anchor = 50 slices/s (mid-band), so the 5x north-star
target is 250 and vs_baseline = value / 250.
"""

import json
import os
import sys
import threading
import time

A100_ESTIMATE_SLICES_PER_SEC = 50.0  # FLOP-derived band 43-72; BASELINE.md
TARGET = 5.0 * A100_ESTIMATE_SLICES_PER_SEC

# The axon tunnel can wedge (jit dispatches hang indefinitely — observed
# round 3, docs/performance.md). A hung benchmark records nothing; fail
# loudly with a diagnostic JSON instead. 30 min >> the ~5 min a healthy
# full run takes including cold compiles.
#
# The watchdog is a daemon thread, NOT signal.alarm: during a real wedge
# the main thread is blocked inside the tunnel's C call, so a Python-level
# SIGALRM handler never runs (verified against a live wedge); a daemon
# thread fires because the blocking RPC releases the GIL.
WATCHDOG_SECS = int(os.environ.get("AFCM_BENCH_WATCHDOG", "1800"))


def _watchdog(signum=None, frame=None):
    print(json.dumps({
        "metric": "256^2 MR slices/sec/chip (CMSR G_ema forward)",
        "value": 0.0, "unit": "slices/sec/chip", "vs_baseline": 0.0,
        "detail": {"error": f"TPU unresponsive: no completion within "
                            f"{WATCHDOG_SECS}s (axon tunnel wedge; see "
                            f"docs/performance.md round-3 ops note)",
                   "last_measured": {"bfloat16_b16": 73.74,
                                     "float32_b16": 61.0,
                                     "when": "2026-08-19 round-4 bench.py, "
                                             "median-of-3 spread 73.3-74.0"
                                             " (BASELINE.md measured table)"}},
    }), flush=True)
    os._exit(2)


def _make_gen(compute_dtype):
    from afcm_tpu.nn import Stylegan3Generator
    return Stylegan3Generator(
        z_dim=512, c_dim=1, w_dim=512, img_resolution=256,
        img_channels_in=4, img_channels_out=1,
        mapping_kwargs=dict(num_layers=8),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512,
                              num_layers=14, skip_resolution=128,
                              lrelu_upsampling=2, conv_clamp=256,
                              compute_dtype=compute_dtype))


def main():
    timer = None
    if WATCHDOG_SECS > 0:
        timer = threading.Timer(WATCHDOG_SECS, _watchdog)
        timer.daemon = True
        timer.start()
    import numpy as np
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    results = {}
    cost = {}
    variables = None
    for dtype, batches in (("bfloat16", (32, 16)), ("float32", (16,))):
        gen = _make_gen(dtype)
        for batch in batches:
            z = jnp.asarray(rng.randn(batch, 512), jnp.float32)
            c = jnp.asarray(rng.rand(batch, 1), jnp.float32)
            cond = jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                               jnp.float32)
            try:
                if variables is None:
                    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z, c,
                                                  cond)
                jitted = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
                # One explicit compile serves both the cost analysis and the
                # timing loop (a second jit compile of the same graph would
                # cost another ~20-40 s over the tunnel).
                fwd = jitted.lower(variables, z, c, cond).compile()
                try:
                    ca = fwd.cost_analysis()
                    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                    cost[f"{dtype}_b{batch}"] = (
                        float(ca.get("flops", 0.0)) / batch,
                        float(ca.get("bytes accessed", 0.0)) / batch)
                except Exception:
                    pass
                out = fwd(variables, z, c, cond)
                np.asarray(out)  # warm; host fetch = reliable sync on axon
                # Median of 3 timing windows: the axon tunnel shows ~±10%
                # session noise; the median is the scoreboard number and the
                # spread is recorded so BASELINE.md and BENCH_r* agree.
                iters = 20
                rates = []
                for _ in range(3):
                    t0 = time.time()
                    for _ in range(iters):
                        out = fwd(variables, z, c, cond)
                    np.asarray(out)
                    rates.append(batch / ((time.time() - t0) / iters))
                results[f"{dtype}_b{batch}"] = round(float(np.median(rates)), 2)
                results[f"{dtype}_b{batch}_spread"] = [round(r, 1)
                                                       for r in sorted(rates)]
            except Exception as exc:
                print(f"{dtype} batch {batch} failed: {exc!r}", file=sys.stderr)

    # Headline: bf16 (output drift vs fp32 measured at 56 dB PSNR — far
    # inside the 0.1 dB parity budget; see BASELINE.md).
    if timer is not None:
        timer.cancel()
    best_key, best = None, 0.0
    for key, val in results.items():
        if isinstance(val, float) and not key.endswith("_spread") \
                and val > best:
            best_key, best = key, val
    detail = {"per_config": results,
              "baseline": f"5x A100-estimate = {TARGET} slices/sec"}
    # Falsifiability fields (VERDICT r3 item 5): forward MFU against the
    # 197 TF/s v5e bf16 peak, and achieved HBM bandwidth (XLA cost-analysis
    # bytes / wall time) against the MEASURED practical streaming ceiling
    # (~490 GB/s: XLA elementwise == aligned Pallas, scripts/
    # probe_stream_diag.py round 4 — not the 819 GB/s paper number).
    if best_key in cost:
        flops_per_slice, bytes_per_slice = cost[best_key]
        peak = 197e12 if best_key.startswith("bfloat16") else 99e12
        detail["mfu"] = round(best * flops_per_slice / peak, 4)
        detail["achieved_gbps"] = round(best * bytes_per_slice / 1e9, 1)
        detail["bw_ceiling_gbps_measured"] = 490.0
        detail["bw_frac_of_ceiling"] = round(
            best * bytes_per_slice / 1e9 / 490.0, 3)
        detail["flops_per_slice"] = flops_per_slice
    print(json.dumps({
        "metric": "256^2 MR slices/sec/chip (CMSR G_ema forward)",
        "value": round(best, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(best / TARGET, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
