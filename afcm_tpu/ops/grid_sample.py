"""2-D bilinear grid sampling, arbitrarily differentiable.

TPU-native replacement for the reference's ``grid_sample_gradfix``
(reference: models/networks/stylegan3/torch_utils/ops/grid_sample_gradfix.py:28-40),
which patches ``torch.nn.functional.grid_sample`` to allow 2nd-order
gradients (needed under the R1 penalty when an augmentation pipe warps D's
inputs; enabled at reference comodgan_model.py:30 though no shipped model
exercises it).

Under JAX no patching is needed: the sampler below is built from gathers and
arithmetic, so every-order gradient exists by construction. Semantics match
``mode='bilinear'``, ``padding_mode='zeros'``, ``align_corners=False``:

- ``input``  [N, C, H, W]
- ``grid``   [N, H_out, W_out, 2], normalized (x, y) in [-1, 1]
- pixel-center mapping ``p = ((g + 1) * size - 1) / 2``
- out-of-bounds taps contribute zero.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(input, grid):
    """Bilinear zero-padded grid sample, torch-compatible (see module doc)."""
    assert input.ndim == 4, f"input must be [N,C,H,W], got {input.shape}"
    assert grid.ndim == 4 and grid.shape[-1] == 2, \
        f"grid must be [N,Ho,Wo,2], got {grid.shape}"
    n, c, h, w = input.shape

    # Normalized -> (float) pixel coordinates; align_corners=False.
    # Coordinates stay in the grid dtype; the bilinear weights are cast to
    # the input dtype so the output keeps the input's dtype (torch contract).
    x = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5          # [N, Ho, Wo]
    y = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0                                          # bilinear weights
    ty = y - y0

    out = 0.0
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            ix = x0 + dx
            iy = y0 + dy
            valid = ((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h))
            ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
            # Gather per batch: input [N,C,H,W] indexed at [N,1,Ho,Wo].
            bidx = jnp.arange(n)[:, None, None, None]
            tap = input[bidx, jnp.arange(c)[None, :, None, None],
                        iyc[:, None], ixc[:, None]]      # [N, C, Ho, Wo]
            weight = ((wx * wy).astype(input.dtype) *
                      valid.astype(input.dtype))[:, None]
            out = out + tap * weight
    return out
