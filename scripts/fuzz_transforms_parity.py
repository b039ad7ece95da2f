"""Exact-seed parity fuzz of the augmentation transforms vs the reference.

Both sides draw from ``np.random.RandomState`` (reference:
data/augment/transforms.py), so constructing each pair with the same seed
must reproduce the reference bit-for-bit — including the RNG consumption
order, execution-probability gates, and boundary modes.  This is the
oracle for the per-transform randomness the dataset fuzz
(fuzz_data_parity.py) cannot reach (it only runs deterministic pipelines).

GaussianBlur3D is excluded: the reference imports skimage.filters.gaussian,
which is absent here and shimmed BY OUR OWN implementation's semantics
(tests/_torch_ref.py) — comparing would be circular.

Usage: python scripts/fuzz_transforms_parity.py [n_configs] [seed]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from afcm_tpu.data import transforms as ours  # noqa: E402
from tests._torch_ref import load_reference_ops  # noqa: E402


def _sample_case(rng, name):
    """(kwargs, input builder) for one transform draw."""
    shape3 = (int(rng.randint(3, 7)), int(rng.choice([12, 16])),
              int(rng.choice([12, 16])))
    ndim4 = rng.rand() < 0.4
    shape = ((int(rng.choice([1, 2])),) + shape3) if ndim4 else shape3
    m = rng.randn(*shape).astype(np.float64)

    if name == "RandomFlip":
        kw = dict(axis_prob=float(rng.choice([0.3, 0.5, 1.0])))
        if rng.rand() < 0.4:
            kw["axes"] = (0, 2)
    elif name == "RandomRotate90":
        kw = {}
    elif name == "RandomRotate":
        kw = dict(angle_spectrum=int(rng.choice([15, 30, 45])),
                  order=int(rng.choice([0, 1, 3])),
                  mode=str(rng.choice(["reflect", "constant", "nearest"])))
    elif name == "RandomContrast":
        kw = dict(alpha=(0.3, 1.7), mean=float(rng.choice([0.0, 0.1])),
                  execution_probability=float(rng.choice([0.5, 1.0])))
    elif name == "ElasticDeformation":
        kw = dict(spline_order=int(rng.choice([0, 1, 3])),
                  alpha=float(rng.choice([200.0, 2000.0])),
                  sigma=float(rng.choice([10.0, 50.0])),
                  execution_probability=1.0)
        if not ndim4 and rng.rand() < 0.3:
            # apply_3d=False on 4D input is broken in the reference
            # (dz = zeros_like(m) is 4D, transforms.py:170)
            kw["apply_3d"] = False
    elif name == "ResizeCrop":
        size = int(rng.choice([12, 16]))
        # reference writes the crop back in place -> original == target only
        m = rng.randn(*(shape[:-2] + (size, size))).astype(np.float32)
        kw = dict(inter_size=(size + int(rng.choice([4, 8])),) * 2,
                  target_size=(size, size),
                  is_label=bool(rng.rand() < 0.5))
    elif name == "CropToFixed":
        kw = dict(size=(int(rng.choice([8, 12, 20])),
                        int(rng.choice([8, 12, 20]))),
                  centered=bool(rng.rand() < 0.3),
                  mode=str(rng.choice(["reflect", "constant"])))
    elif name == "AdditiveGaussianNoise":
        kw = dict(scale=(0.0, float(rng.choice([0.5, 1.0]))),
                  execution_probability=float(rng.choice([0.5, 1.0])))
    elif name == "AdditivePoissonNoise":
        kw = dict(lam=(0.0, float(rng.choice([0.5, 1.0]))),
                  execution_probability=float(rng.choice([0.5, 1.0])))
    elif name == "Standardize":
        kw = dict(channelwise=bool(ndim4 and rng.rand() < 0.5))
        if rng.rand() < 0.4:
            kw.update(mean=float(rng.uniform(-1, 1)),
                      std=float(rng.uniform(0.5, 2.0)), channelwise=False)
    elif name == "PercentileNormalizer":
        kw = dict(pmin=float(rng.choice([1.0, 5.0])),
                  pmax=float(rng.choice([95.0, 99.6])),
                  channelwise=bool(ndim4 and rng.rand() < 0.5))
    elif name == "Normalize":
        kw = dict(min_value=float(rng.choice([-1.0, 0.0])),
                  max_value=float(rng.choice([1.0, 255.0])))
    else:
        raise KeyError(name)
    return kw, m


PAIRS = ["RandomFlip", "RandomRotate90", "RandomRotate", "RandomContrast",
         "ElasticDeformation", "ResizeCrop", "CropToFixed",
         "AdditiveGaussianNoise", "AdditivePoissonNoise", "Standardize",
         "PercentileNormalizer", "Normalize"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.RandomState(seed)
    load_reference_ops()
    import importlib
    ref_transforms = importlib.import_module("data.augment.transforms")

    failures = []
    ok = skipped = 0
    for name in PAIRS:
        ours_cls = getattr(ours, name)
        ref_cls = getattr(ref_transforms, name)
        for i in range(n):
            kw, m = _sample_case(rng, name)
            tseed = int(rng.randint(10_000_000))
            label = dict(name=name, seed=tseed, shape=m.shape, **{
                k: v for k, v in kw.items() if not isinstance(v, np.ndarray)})
            try:
                want = ref_cls(random_state=np.random.RandomState(tseed),
                               **kw)(m.copy())
            except Exception as exc:
                try:
                    ours_cls(random_state=np.random.RandomState(tseed),
                             **kw)(m.copy())
                except Exception:
                    skipped += 1
                    continue
                failures.append((label, f"reference raised {exc!r}, "
                                        "ours did not"))
                continue
            got = ours_cls(random_state=np.random.RandomState(tseed),
                           **kw)(m.copy())
            got, want = np.asarray(got), np.asarray(want)
            if got.shape != want.shape:
                failures.append((label,
                                 f"shape {got.shape} vs {want.shape}"))
                continue
            if not np.allclose(got, want, atol=1e-12, rtol=1e-12):
                failures.append(
                    (label, f"max abs {np.abs(got - want).max():.3e}"))
                continue
            ok += 1
        print(f"[{name}] ok={ok} skipped={skipped} failed={len(failures)}",
              flush=True)

    print(f"\ntransforms parity fuzz: {ok} ok / {skipped} skipped / "
          f"{len(failures)} failed")
    for label, msg in failures[:15]:
        print(f"  FAIL {msg}\n    {label}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
