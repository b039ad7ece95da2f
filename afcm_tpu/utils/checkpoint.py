"""Checkpoint save/load for GANTrainState.

Improves on the reference (which saves per-network state_dicts and *drops*
optimizer state, reference: models/base_model.py:144-199): one msgpack file
per tag holds params_G / params_D / params_G_ema, the moment collections and
both optimizer states, so resume continues optimization exactly.  Tags follow
the reference naming ('latest', 'best', epoch numbers, 'iter_N').
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_state(state, checkpoint_dir: str, tag: str) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"{tag}_state.msgpack")
    data = serialization.to_bytes(_to_host(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_state(template_state, checkpoint_dir: str, tag: str):
    """Restore into the structure of `template_state` (from init_state)."""
    path = os.path.join(checkpoint_dir, f"{tag}_state.msgpack")
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template_state, data)


def checkpoint_exists(checkpoint_dir: str, tag: str) -> bool:
    return os.path.exists(os.path.join(checkpoint_dir, f"{tag}_state.msgpack"))


def save_generator_only(state, checkpoint_dir: str, tag: str) -> str:
    """Export just the EMA generator variables (for inference deployment)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"{tag}_net_G_ema.msgpack")
    payload = {"params": _to_host(state.params_G_ema),
               "moments": _to_host(state.moments_G_ema),
               "constants": _to_host(state.constants_G)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


def load_generator_only(checkpoint_dir: str, tag: str):
    path = os.path.join(checkpoint_dir, f"{tag}_net_G_ema.msgpack")
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
