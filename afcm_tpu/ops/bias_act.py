"""Fused bias + activation + gain + clamp.

The reference ships a CUDA plugin with analytic 1st/2nd-order gradients
(reference: torch_utils/ops/bias_act.{cpp,cu,h}, wrapper bias_act.py:21-120).
Under XLA this is a pure elementwise chain the compiler fuses into whatever
producer precedes it, and arbitrary-order autodiff is native — so no custom
kernel or VJP is needed for either performance or gradient parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ActivationSpec:
    fn: callable
    def_alpha: float = 0.0
    def_gain: float = 1.0


_SQRT2 = float(np.sqrt(2.0))

activation_funcs = {
    "linear":   ActivationSpec(lambda x, alpha: x),
    "relu":     ActivationSpec(lambda x, alpha: jax.nn.relu(x), def_gain=_SQRT2),
    # Strict x > 0: the subgradient at exactly 0 is then alpha, matching
    # torch.nn.functional.leaky_relu. This is measure-zero for trained
    # weights but NOT at init: zero biases + zero margin padding put large
    # constant-zero regions at the lrelu input, and the at-zero convention
    # visibly changes the first bias gradients (tests/test_train_parity.py).
    "lrelu":    ActivationSpec(lambda x, alpha: jnp.where(x > 0, x, x * alpha),
                               def_alpha=0.2, def_gain=_SQRT2),
    "tanh":     ActivationSpec(lambda x, alpha: jnp.tanh(x)),
    "sigmoid":  ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x)),
    "elu":      ActivationSpec(lambda x, alpha: jax.nn.elu(x)),
    "selu":     ActivationSpec(lambda x, alpha: jax.nn.selu(x)),
    "softplus": ActivationSpec(lambda x, alpha: jax.nn.softplus(x)),
    "swish":    ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, def_gain=_SQRT2),
}


def bias_act(x, b=None, dim: int = 1, act: str = "linear", alpha=None,
             gain=None, clamp=None):
    """Add per-channel bias, apply activation, scale by gain, clamp.

    Args:
      x: input array of any rank.
      b: optional 1-D bias whose length matches ``x.shape[dim]``.
      dim: channel dimension for the bias broadcast.
      act: activation name from ``activation_funcs``.
      alpha: activation shape parameter (lrelu slope), None = default.
      gain: output scale, None = the activation's default gain.
      clamp: clamp output to [-clamp, clamp]; None disables.
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.fn(x, alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
