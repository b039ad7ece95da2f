"""Benchmark: CMSR throughput of the flagship alias-free generator.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline metric: 256^2 MR slices/sec/chip for the full-size AFCM CMSR
generator (G_ema forward: 8-layer mapping + 14 encoder + 15 synthesis
alias-free layers, 58.5M params) on the attached TPU chip. Extra fields
(VERDICT r4 items 2 and 7):
  - train_ms_per_step / train_img_per_sec: the full training step (D with
    R1 + G + EMA, shipped config: bf16 both nets, impl xla, upfirdn custom
    VJP, shared G forward, every-step R1) — the reference's hot loop
    (train.py:53, models/comodgan_model.py:163-183).
  - drift: the headline forward config re-measured at the END of the run;
    (end - start) / start. Cross-session tunnel variance is ~±4-10%, the
    same size as a round's progress — this bounds how much of the session's
    own drift is inside the headline number.

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
# rounds 3 and 4, docs/performance.md). A hung benchmark records nothing;
# dump whatever was measured before the wedge instead. 45 min >> the
# ~10 min a healthy full run takes including cold compiles (the train-step
# compile alone is 2-3 min over the tunnel).
#
# The watchdog is a daemon thread, NOT signal.alarm: during a real wedge
# the main thread is blocked inside the tunnel's C call, so a Python-level
# SIGALRM handler never runs (verified against a live wedge); a daemon
# thread fires because the blocking RPC releases the GIL.
WATCHDOG_SECS = int(os.environ.get("AFCM_BENCH_WATCHDOG", "2700"))

# Shared mutable state so the watchdog can report partial results.
_RESULTS = {}
_COST = {}
_EXTRA = {}
_STAGE = ["startup"]


def _emit(error=None):
    best_key, best = None, 0.0
    for key, val in _RESULTS.items():
        if isinstance(val, float) and not key.endswith("_spread") \
                and val > best:
            best_key, best = key, val
    detail = {"per_config": dict(_RESULTS),
              "baseline": f"5x A100-estimate = {TARGET} slices/sec"}
    detail.update(_EXTRA)
    if error:
        detail["error"] = error
        if not _RESULTS:
            detail["last_measured"] = {
                "bfloat16_b16": 74.57, "float32_b16": 61.76,
                "train_ms_per_step": 761.2, "train_img_per_sec": 21.02,
                "when": "2026-08-21 round-5 final bench.py, median-of-3 "
                        "spread 74.5-74.6, drift -0.07% (BASELINE.md "
                        "measured table)"}
    # Falsifiability fields (VERDICT r3 item 5): forward MFU against the
    # 197 TF/s v5e bf16 peak, and achieved HBM bandwidth (XLA cost-analysis
    # bytes / wall time) against the MEASURED practical streaming ceiling
    # (~490 GB/s: XLA elementwise == aligned Pallas, scripts/
    # probe_stream_diag.py round 4 — not the 819 GB/s paper number).
    if best_key in _COST:
        flops_per_slice, bytes_per_slice = _COST[best_key]
        peak = 197e12 if best_key.startswith("bfloat16") else 99e12
        detail["mfu"] = round(best * flops_per_slice / peak, 4)
        detail["achieved_gbps"] = round(best * bytes_per_slice / 1e9, 1)
        detail["bw_ceiling_gbps_measured"] = 490.0
        detail["bw_frac_of_ceiling"] = round(
            best * bytes_per_slice / 1e9 / 490.0, 3)
        detail["flops_per_slice"] = flops_per_slice
    out = {
        "metric": "256^2 MR slices/sec/chip (CMSR G_ema forward)",
        "value": round(best, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(best / TARGET, 4),
    }
    for k in ("train_ms_per_step", "train_img_per_sec", "drift"):
        if k in _EXTRA:
            out[k] = _EXTRA[k]
    out["detail"] = detail
    print(json.dumps(out), flush=True)


def _watchdog():
    _emit(error=f"TPU unresponsive during '{_STAGE[0]}': no completion "
                f"within {WATCHDOG_SECS}s (axon tunnel wedge; see "
                f"docs/performance.md round-3/4 ops notes). Fields present "
                f"are real measurements taken before the wedge.")
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


def _time_forward(fwd, variables, z, c, cond, iters=20, windows=3):
    """Median slices/s over `windows` timing windows (+ the sorted spread).

    One host fetch per window: on the axon backend block_until_ready
    returns early, so np.asarray is the only reliable sync.
    """
    import numpy as np
    batch = z.shape[0]
    rates = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            out = fwd(variables, z, c, cond)
        np.asarray(out)
        rates.append(batch / ((time.time() - t0) / iters))
    return float(np.median(rates)), [round(r, 1) for r in sorted(rates)]


def _forward_legs(rng):
    """Measure the forward configs; returns the best config's compiled
    callable + args so the drift leg can re-time it at the end."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    keep = {}
    variables = None
    for dtype, batches in (("bfloat16", (32, 16)), ("float32", (16,))):
        gen = _make_gen(dtype)
        for batch in batches:
            key = f"{dtype}_b{batch}"
            _STAGE[0] = f"forward {key} compile"
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
                    _COST[key] = (
                        float(ca.get("flops", 0.0)) / batch,
                        float(ca.get("bytes accessed", 0.0)) / batch)
                except Exception:
                    pass
                out = fwd(variables, z, c, cond)
                np.asarray(out)  # warm; host fetch = reliable sync on axon
                _STAGE[0] = f"forward {key} timing"
                med, spread = _time_forward(fwd, variables, z, c, cond)
                _RESULTS[key] = round(med, 2)
                _RESULTS[f"{key}_spread"] = spread
                keep[key] = (fwd, variables, z, c, cond)
            except Exception as exc:
                print(f"{dtype} batch {batch} failed: {exc!r}",
                      file=sys.stderr)
    best_key = max((k for k in _RESULTS if not k.endswith("_spread")),
                   key=lambda k: _RESULTS[k], default=None)
    return keep.get(best_key), best_key


def _train_leg(rng):
    """The shipped-config training step (VERDICT r4 item 2). Lands
    train_ms_per_step / train_img_per_sec in the artifact."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_train_impl import make_model

    batch = 16
    model = make_model(batch, remat_min=140, shared_g_fwd=True, r1_interval=1)
    batch_data = {
        "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                         jnp.float32),
        "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                         jnp.float32),
        "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}
    _STAGE[0] = "train-step init_state compile"
    state = model.init_state(jax.random.PRNGKey(0), batch_data)
    _STAGE[0] = "train-step compile (2-3 min; the known wedge-risk step)"
    state, m = model.train_step(state, batch_data, jax.random.PRNGKey(1),
                                jnp.asarray(0.0), with_r1=True)
    np.asarray(m["G_L1"])  # compile + warm
    _STAGE[0] = "train-step timing"
    iters = 10
    ts = []
    for w in range(3):
        t0 = time.time()
        for i in range(iters):
            state, m = model.train_step(state, batch_data,
                                        jax.random.PRNGKey(7 + i),
                                        jnp.asarray(0.0), with_r1=True)
        np.asarray(m["G_L1"])
        ts.append((time.time() - t0) / iters * 1e3)
    ms = float(np.median(ts))
    _EXTRA["train_ms_per_step"] = round(ms, 1)
    _EXTRA["train_img_per_sec"] = round(batch / ms * 1e3, 2)
    _EXTRA["train_spread_ms"] = [round(t, 1) for t in sorted(ts)]
    _EXTRA["train_config"] = ("b16 bf16-both-nets remat>=140 impl=xla "
                              "upfirdn-custom-vjp shared_g_fwd R1-every-step")
    del state, model, m


def main():
    timer = None
    if WATCHDOG_SECS > 0:
        timer = threading.Timer(WATCHDOG_SECS, _watchdog)
        timer.daemon = True
        timer.start()
    import numpy as np

    rng = np.random.RandomState(0)
    best, best_key = _forward_legs(rng)

    # Headline: bf16 (output drift vs fp32 measured at 56 dB PSNR — far
    # inside the 0.1 dB parity budget; see BASELINE.md).
    try:
        _train_leg(rng)
    except Exception as exc:
        print(f"train leg failed: {exc!r}", file=sys.stderr)
        _EXTRA["train_error"] = repr(exc)
    # Release the train state's device buffers before the drift re-measure
    # so HBM pressure from this leg can't masquerade as session drift.
    import gc
    gc.collect()

    # Drift leg (VERDICT r4 item 7): re-measure the headline forward config
    # after everything else so session drift over the run is visible.
    if best is not None:
        try:
            _STAGE[0] = f"drift re-measure of {best_key}"
            fwd, variables, z, c, cond = best
            end_med, end_spread = _time_forward(fwd, variables, z, c, cond,
                                                windows=2)
            start = _RESULTS[best_key]
            _EXTRA["drift"] = round((end_med - start) / start, 4)
            _EXTRA["drift_end_rate"] = round(end_med, 2)
            _EXTRA["drift_end_spread"] = end_spread
        except Exception as exc:
            print(f"drift leg failed: {exc!r}", file=sys.stderr)

    if timer is not None:
        timer.cancel()
    _emit()


if __name__ == "__main__":
    main()
