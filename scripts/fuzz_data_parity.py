"""Randomized data-layer parity fuzz vs the reference CmsrDataset oracle.

Sweeps the volume/dataset constructor space the pinned oracle test
(tests/test_data.py::test_window_matches_reference_dataset) covers at a
single point: thickness schedules (incl. odd -> fractional slice_idx),
slice_num 1/4, multi-modality in/out with cat_inputs, patch/stride shapes,
val + test phases, and deterministic transform pipelines
(Normalize / explicit-stats Standardize / PercentileNormalizer).

Reference: data/cmsr_dataset.py:20-155 (window assembly + slice_idx),
data/augment/transforms.py:552-616.  Only deterministic paths are fuzzed:
train-phase thickness/modality draws use python `random` on the reference
side and an injected rng on ours, so val/test (+ single-choice train
schedules) are the comparable surface.

Usage: python scripts/fuzz_data_parity.py [n_configs] [seed]
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from afcm_tpu.data import CmsrDataset  # noqa: E402
from tests._torch_ref import load_reference_ops  # noqa: E402

MODALITY_POOL = ["flair", "t1", "t2", "pd"]


def _write_subject(path, rng, modalities, depth, size):
    import h5py
    with h5py.File(path, "w") as f:
        for m in modalities:
            vol = rng.randint(0, 256, size=(depth, size, size)).astype(np.uint8)
            f.create_dataset(m, data=vol)


def _sample_config(rng):
    depth = int(rng.randint(8, 25))
    size = int(rng.choice([64, 64, 96]))
    n_mod = int(rng.choice([1, 2, 3]))
    modalities = list(rng.choice(MODALITY_POOL, size=n_mod, replace=False))
    in_paths = list(rng.choice(modalities,
                               size=int(rng.randint(1, n_mod + 1)),
                               replace=False))
    out_paths = list(rng.choice(modalities,
                                size=int(rng.randint(1, n_mod + 1)),
                                replace=False))
    slice_num = int(rng.choice([1, 4, 4, 4]))
    thickness = sorted(rng.choice([1, 2, 3, 4, 5],
                                  size=int(rng.randint(1, 4)),
                                  replace=False).tolist())
    # patch >= 64 is a shared constraint (reference data/utils.py:129; a
    # rare smaller draw probes that both sides reject it)
    patch = int(rng.choice([64, 64, 64, size, 32]))
    patch = min(patch, size)
    stride = int(rng.choice([patch, max(patch // 2, 8)]))
    phase = str(rng.choice(["val", "test", "val"]))

    t_kind = rng.choice(["normalize", "standardize", "percentile"])
    if t_kind == "normalize":
        lo = float(rng.choice([0.0, -10.0]))
        hi = float(rng.choice([255.0, 300.0]))
        pre = {"Normalize": {"enabled": True, "min_value": lo,
                             "max_value": hi}}
    elif t_kind == "standardize":
        pre = {"Standardize": {"enabled": True,
                               "mean": float(rng.uniform(100, 150)),
                               "std": float(rng.uniform(40, 80))}}
    else:
        pre = {"PercentileNormalizer": {"enabled": True,
                                        "pmin": 1.0, "pmax": 99.0}}
    transformer = {"raw": dict(pre, ToTensor={"enabled": True,
                                              "expand_dims": False})}
    return dict(depth=depth, size=size, modalities=modalities,
                in_paths=in_paths, out_paths=out_paths, slice_num=slice_num,
                thickness=thickness, patch=patch, stride=stride, phase=phase,
                transformer=transformer,
                cat_inputs=bool(rng.rand() < 0.4))


def _loaders_config(root, cfg):
    sb = {"name": "SliceBuilder",
          "patch_shape": [1, cfg["patch"], cfg["patch"]],
          "stride_shape": [1, cfg["stride"], cfg["stride"]]}
    phase_cfg = {"file_paths": [root], "slice_builder": sb,
                 "transformer": cfg["transformer"]}
    return {
        "dataset_mode": "cmsr", "batch_size": 2, "serial_batches": True,
        "raw_internal_path_in": cfg["in_paths"],
        "raw_internal_path_out": cfg["out_paths"],
        "rand_output": False, "cat_inputs": cfg["cat_inputs"],
        "thickness": cfg["thickness"], "slice_num": cfg["slice_num"],
        "global_normalization": None,
        "train": phase_cfg, "val": phase_cfg, "test": phase_cfg,
    }


def _compare(cfg, ref_ds, ours, failures, label):
    n = len(ours)
    if len(ref_ds) != n:
        failures.append((label, f"len {n} vs {len(ref_ds)}"))
        return False
    idxs = sorted({0, 1, n // 2, n - 2, n - 1} & set(range(n)))
    for idx in idxs:
        ref_item = ref_ds[idx]
        our_item = ours.get_item(idx)
        if cfg["phase"] == "test":
            a_ref, sidx_ref, raw_idx_ref = ref_item
            a_our, sidx_our, raw_idx_our = our_item
            pairs = [("A", a_our, a_ref.numpy()),
                     ("slice_idx", sidx_our, sidx_ref.numpy())]
            if tuple(raw_idx_our) != tuple(raw_idx_ref):
                failures.append((label, f"raw_idx {raw_idx_our} vs "
                                        f"{raw_idx_ref} @ {idx}"))
                return False
        else:
            pairs = [("A", our_item["A"], ref_item["A"].numpy()),
                     ("B", our_item["B"], ref_item["B"].numpy()),
                     ("slice_idx", our_item["slice_idx"],
                      np.asarray(ref_item["slice_idx"])),
                     ("B_class", our_item["B_class"],
                      np.asarray(ref_item["B_class"])),
                     ("B_idx", our_item["B_idx"], ref_item["B_idx"].numpy())]
        for name, got, want in pairs:
            got, want = np.asarray(got), np.asarray(want)
            if got.shape != want.shape:
                failures.append(
                    (label, f"{name} shape {got.shape} vs {want.shape} @ {idx}"))
                return False
            if not np.allclose(got, want, atol=1e-6):
                failures.append(
                    (label, f"{name} max abs "
                            f"{np.abs(got - want).max():.3e} @ {idx}"))
                return False
    return True


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.RandomState(seed)
    load_reference_ops()  # sys.path + dependency shims
    from data.cmsr_dataset import StandardHDF5Dataset as RefDS

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

    failures = []
    ok = skipped = 0
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(n):
            cfg = _sample_config(rng)
            root = os.path.join(tmp, f"case{i}")
            os.makedirs(root)
            h5path = os.path.join(root, "subject.h5")
            _write_subject(h5path, rng, cfg["modalities"], cfg["depth"],
                           cfg["size"])
            lcfg = _loaders_config(root, cfg)
            label = {k: v for k, v in cfg.items() if k != "transformer"}
            label["transform"] = list(cfg["transformer"]["raw"])[0]
            try:
                ref_ds = RefDS(
                    file_path=h5path, phase=cfg["phase"],
                    slice_builder_config=_Cfg(
                        lcfg[cfg["phase"]]["slice_builder"]),
                    transformer_config=cfg["transformer"],
                    raw_internal_path_in=cfg["in_paths"],
                    raw_internal_path_out=cfg["out_paths"],
                    thickness=cfg["thickness"], slice_num=cfg["slice_num"],
                    cat_inputs=cfg["cat_inputs"], global_normalization=None)
                _ = ref_ds[0]
            except Exception:
                try:
                    CmsrDataset(lcfg, phase=cfg["phase"])
                except Exception:
                    skipped += 1
                    continue
                # both sides must agree on what is constructible
                ours = CmsrDataset(lcfg, phase=cfg["phase"]).datasets[0]
                try:
                    ours.get_item(0)
                except Exception:
                    skipped += 1
                    continue
                failures.append((label, "reference raised, ours did not"))
                continue

            ours = CmsrDataset(lcfg, phase=cfg["phase"]).datasets[0]
            if _compare(cfg, ref_ds, ours, failures, label):
                ok += 1
            print(f"[data {i + 1}/{n}] ok={ok} skipped={skipped} "
                  f"failed={len(failures)}", flush=True)

    print(f"\ndata parity fuzz: {ok} ok / {skipped} skipped / "
          f"{len(failures)} failed")
    for label, msg in failures[:10]:
        print(f"  FAIL {msg}\n    {label}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
