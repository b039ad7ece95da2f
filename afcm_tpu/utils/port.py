"""Port reference PyTorch checkpoints into afcm_tpu variable collections.

The reference saves per-network ``state_dict``s ({epoch}_net_{G,D,G_ema}.pth,
reference: models/base_model.py:144-160).  Module names in this framework
mirror the reference exactly (``mapping.fc0``, ``synthesis.encoder_3``,
``synthesis.L7_148_362.affine`` ...), so porting is a mechanical key split:

* trainable tensors          -> the ``params`` collection
* statistics buffers         -> the ``moments`` collection
  (``w_avg``, ``magnitude_ema``)
* filter/grid buffers        -> dropped (recomputed at construction:
  ``up_filter``, ``down_filter``, ``resample_filter``, ``noise_const`` ...)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

_MOMENT_LEAVES = {"w_avg", "magnitude_ema"}
_CONSTANT_LEAVES = {"noise_const", "freqs", "phases", "transform"}
_DROP_LEAVES = {"up_filter", "down_filter", "resample_filter",
                # time-encoder buffers recomputed at construction
                # (reference: CoModGAN/layers.py:692, motion.py:189,196)
                "fourier_coefs", "phase_scales"}

# Torch submodule names that flatten into a different flax leaf layout.
_CA_RENAMES = {
    ("conv_du", "0", "weight"): ("down", "kernel"),
    ("conv_du", "0", "bias"): ("down", "bias"),
    ("conv_du", "2", "weight"): ("up", "kernel"),
    ("conv_du", "2", "bias"): ("up", "bias"),
}


def state_dict_to_variables(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert a reference state_dict (torch tensors or numpy) to
    ``{"params": ..., "moments": ...}`` nested dicts."""
    params: Dict = {}
    moments: Dict = {}
    constants: Dict = {}

    for key, value in state_dict.items():
        value = np.asarray(getattr(value, "numpy", lambda: value)())
        parts = key.split(".")
        leaf = parts[-1]
        if leaf in _DROP_LEAVES:
            continue
        # CALayer: torch 1x1 convs -> flax Dense kernels.
        if len(parts) >= 3 and tuple(parts[-3:]) in _CA_RENAMES:
            new_tail = _CA_RENAMES[tuple(parts[-3:])]
            if new_tail[1] == "kernel":
                value = value[:, :, 0, 0].T  # [out,in,1,1] -> [in,out]
            parts = parts[:-3] + list(new_tail)
            leaf = parts[-1]
        if leaf in _MOMENT_LEAVES:
            tree = moments
        elif leaf in _CONSTANT_LEAVES:
            tree = constants
        else:
            tree = params
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    out = {"params": params, "moments": moments}
    if constants:
        out["constants"] = constants
    return out


# Inverse of _CA_RENAMES, keyed on the flax path tail under the (always
# "ca"-named) CALayer module so the plain ConvNorm also named "down" in RCAB
# (leaves weight/bias, not kernel/bias under "ca") cannot collide.
_CA_UNRENAMES = {
    ("ca", "down", "kernel"): ("ca", "conv_du", "0", "weight"),
    ("ca", "down", "bias"): ("ca", "conv_du", "0", "bias"),
    ("ca", "up", "kernel"): ("ca", "conv_du", "2", "weight"),
    ("ca", "up", "bias"): ("ca", "conv_du", "2", "bias"),
}


def variables_to_state_dict(variables: Mapping) -> Dict[str, np.ndarray]:
    """Flatten afcm_tpu variables back into a reference-style state_dict
    (inverse of `state_dict_to_variables`: CALayer Dense kernels transpose
    back to [out,in,1,1] conv_du weights, constants are emitted; the
    construction-time filters that the forward direction drops are the only
    keys that do not round-trip — the reference recomputes them too)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        for k, v in node.items():
            parts = prefix + [k]
            if isinstance(v, Mapping):
                walk(v, parts)
                continue
            v = np.asarray(v)
            tail = tuple(parts[-3:])
            if tail in _CA_UNRENAMES:
                if parts[-1] == "kernel":
                    v = v.T[:, :, None, None]  # [in,out] -> [out,in,1,1]
                parts = parts[:-3] + list(_CA_UNRENAMES[tail])
            out[".".join(parts)] = v

    walk(variables.get("params", {}), [])
    walk(variables.get("moments", {}), [])
    walk(variables.get("constants", {}), [])
    return out


def main():
    """CLI: convert a reference .pth state_dict into a variables msgpack.

        python -m afcm_tpu.utils.port G_ema.pth G_ema.msgpack
    """
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("src", help="reference torch .pth state_dict")
    parser.add_argument("dst", help="output .msgpack variables file")
    args = parser.parse_args()

    import torch
    from flax import serialization

    state_dict = torch.load(args.src, map_location="cpu")
    if not isinstance(state_dict, dict):
        state_dict = state_dict.state_dict()
    variables = state_dict_to_variables(state_dict)
    with open(args.dst, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {k: v for k, v in variables.items()}))
    n = len([1 for _ in _iter_leaves(variables)])
    print(f"wrote {args.dst} ({n} tensors)")


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
