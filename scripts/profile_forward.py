"""Device-time bucket profile of the full-size G forward (bf16, batch 16).

Captures a jax.profiler trace, parses the trace-viewer JSON, and groups
device-stream op time into the buckets docs/performance.md tracks
(FIR depthwise / dense convs / pallas / copy-layout / misc).

Run: python scripts/profile_forward.py [xla|auto|int8] [batch]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.device_get(jnp.sum(jnp.asarray(x, jnp.float32))))


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from afcm_tpu.nn import Stylegan3Generator
    import importlib
    fl = importlib.import_module('afcm_tpu.ops.filtered_lrelu')
    import afcm_tpu.ops.modulated_conv as mc

    if impl == "int8":
        mc.set_conv_impl("int8")
        fl.set_default_impl("auto")
    else:
        fl.set_default_impl(impl)

    gen = Stylegan3Generator(
        z_dim=512, c_dim=1, w_dim=512, img_resolution=256,
        img_channels_in=4, img_channels_out=1,
        mapping_kwargs=dict(num_layers=8),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512,
                              num_layers=14, skip_resolution=128,
                              lrelu_upsampling=2, conv_clamp=256,
                              compute_dtype="bfloat16"))
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(batch, 512), jnp.float32)
    c = jnp.asarray(rng.rand(batch, 1), jnp.float32)
    cond = jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1), jnp.float32)
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z, c, cond)
    fwd = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
    sync(fwd(variables, z, c, cond))

    trace_dir = "/tmp/fwd_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = fwd(variables, z, c, cond)
    sync(out)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace captured (axon tunnel may not export device traces)")
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Per-op rows live on the '/device:TPU:*' process's "XLA Ops" thread and
    # carry args.hlo_category + args.long_name (with the HLO text incl. the
    # output shape). The whole-module rows are on "XLA Modules".
    tids = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tids[(ev["pid"], ev["tid"])] = ev["args"]["name"]
    import re
    buckets = {}
    names = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if tids.get((ev["pid"], ev.get("tid"))) != "XLA Ops":
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category", "?")
        ln = args.get("long_name", "")
        shape = re.search(r"= (\w+\[[0-9,]*\])", ln)
        dur = ev["dur"] / 1e3 / 3  # us -> ms, per-iter (3 traced iters)
        buckets[cat] = buckets.get(cat, 0.0) + dur
        key = (cat, ev["name"].split(".")[0],
               shape.group(1) if shape else "?")
        names[key] = names.get(key, 0.0) + dur
        total += dur
    print(f"impl={impl} total device {total:.1f} ms/iter")
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:28s} {ms:7.2f} ms")
    top = sorted(names.items(), key=lambda kv: -kv[1])[:25]
    print("top ops (category, op, out shape):")
    for (b, name, shape), ms in top:
        print(f"  {ms:7.2f} ms  [{b}] {name} {shape}")


if __name__ == "__main__":
    main()
