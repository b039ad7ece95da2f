"""Template model: the minimal plugin contract
(reference: models/template_model.py — an L1 regression example).

To add a model family:
  1. Build flax modules in afcm_tpu/nn/.
  2. Implement a model class with `init_state`, a jitted `train_step`
     returning (new_state, metrics), and `eval_step`.
  3. Register a builder in afcm_tpu/models/__init__.py and (optionally) a
     defaults subtree in afcm_tpu/config/defaults.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from .train_state import make_optimizer


class _TemplateNet(nn.Module):
    features: int = 16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME")(
            jnp.transpose(x, (0, 2, 3, 1)))
        h = jax.nn.relu(h)
        h = nn.Conv(x.shape[1], (3, 3), padding="SAME")(h)
        return jnp.transpose(h, (0, 3, 1, 2))


class TemplateState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: dict


@dataclasses.dataclass(frozen=True)
class TemplateConfig:
    lr: float = 1e-3


class TemplateModel:
    """Direct L1 regression from A to B."""

    def __init__(self, config: TemplateConfig = TemplateConfig()):
        self.net = _TemplateNet()
        self.config = config

    def init_state(self, rng, batch) -> TemplateState:
        params = self.net.init(rng, batch["A"])["params"]
        tx = make_optimizer(self.config.lr, 0.9, 0.999)
        return TemplateState(step=jnp.zeros((), jnp.int32), params=params,
                             opt_state=tx.init(params))

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TemplateState, batch
                   ) -> Tuple[TemplateState, Dict[str, jnp.ndarray]]:
        tx = make_optimizer(self.config.lr, 0.9, 0.999)

        def loss_fn(params):
            pred = self.net.apply({"params": params}, batch["A"])
            return jnp.mean(jnp.abs(pred - batch["B"]))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state), {"loss_G": loss})

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TemplateState, a, slice_idx=None, rng=None,
                  ref_img=None):
        del slice_idx, rng, ref_img  # accepted for the shared validate() API
        return self.net.apply({"params": state.params}, a)
