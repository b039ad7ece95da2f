"""grid_sample parity vs torch and arbitrary-order differentiability.

Reference: models/networks/stylegan3/torch_utils/ops/grid_sample_gradfix.py
(bilinear / zeros / align_corners=False, 2nd-order differentiable).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from afcm_tpu.ops import grid_sample


@pytest.mark.parametrize("shape,out_hw", [((2, 3, 8, 8), (5, 7)),
                                          ((1, 1, 16, 12), (16, 12))])
def test_matches_torch(shape, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    # include well out-of-bounds coordinates to exercise zero padding
    grid = rng.uniform(-1.5, 1.5,
                       (shape[0], *out_hw, 2)).astype(np.float32)

    want = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
        padding_mode="zeros", align_corners=False).numpy()
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_second_order_grad():
    """R1-style double grad through the sampler (the reason the reference
    needs its gradfix patch at comodgan_model.py:30)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 6, 6).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 4, 4, 2)).astype(np.float32))

    def loss(x):
        return jnp.sum(grid_sample(x, grid) ** 2)

    def grad_norm(x):
        g = jax.grad(loss)(x)
        return jnp.sum(g ** 2)

    gg = jax.grad(grad_norm)(x)   # 2nd order w.r.t. input
    assert np.isfinite(np.asarray(gg)).all()

    # and w.r.t. the grid (both paths are differentiable)
    gg2 = jax.grad(lambda g: jnp.sum(jax.grad(
        lambda gr: jnp.sum(grid_sample(x, gr) ** 2))(g) ** 2))(grid)
    assert np.isfinite(np.asarray(gg2)).all()


def test_grad_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 2, 7, 9).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (2, 5, 5, 2)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    gt = torch.from_numpy(grid).requires_grad_(True)
    torch.nn.functional.grid_sample(
        xt, gt, mode="bilinear", padding_mode="zeros",
        align_corners=False).pow(2).sum().backward()

    gx, gg = jax.grad(
        lambda x, g: jnp.sum(grid_sample(x, g) ** 2), argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), gt.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
