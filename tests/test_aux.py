"""Aux subsystems: training stats, profiling scopes, losses, image utils."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.models import losses  # noqa: E402
from afcm_tpu.utils.image import ImagePool, tensor2im  # noqa: E402
from afcm_tpu.utils.profiling import hlo_dump, profiled_function  # noqa: E402
from afcm_tpu.utils.training_stats import Collector, report_moments  # noqa: E402


def test_training_stats_moments(rng):
    values = rng.randn(100).astype(np.float32)
    triple = np.asarray(report_moments(jnp.asarray(values)))
    collector = Collector()
    collector.update({"loss": triple})
    assert collector.num("loss") == 100
    assert collector.mean("loss") == pytest.approx(values.mean(), abs=1e-5)
    assert collector.std("loss") == pytest.approx(values.std(), abs=1e-4)

    # accumulation over windows
    collector.update({"loss": np.asarray(report_moments(jnp.asarray(values)))})
    assert collector.num("loss") == 200
    collector.reset()
    assert collector.names() == []


def test_collector_accepts_scalars():
    c = Collector()
    c.update({"x": np.asarray(3.0)})
    c.update({"x": np.asarray(5.0)})
    assert c.mean("x") == pytest.approx(4.0)


def test_profiled_function_preserves_semantics():
    @profiled_function
    def f(x):
        return x * 2

    out = jax.jit(f)(jnp.ones((4,)))
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((4,)))


def test_hlo_dump_contains_fusion():
    text = hlo_dump(lambda x: jnp.tanh(x) + 1, jnp.ones((8, 128)))
    assert "tanh" in text or "fusion" in text


def test_wgangp_penalty(rng):
    d = lambda x: jnp.sum(x ** 2, axis=(1, 2, 3), keepdims=False)[:, None]
    real = jnp.asarray(rng.randn(4, 1, 8, 8).astype(np.float32))
    fake = jnp.asarray(rng.randn(4, 1, 8, 8).astype(np.float32))
    penalty, grads = losses.cal_gradient_penalty(
        d, real, fake, jax.random.PRNGKey(0), lambda_gp=10.0)
    assert np.isfinite(float(penalty)) and float(penalty) >= 0
    zero, none = losses.cal_gradient_penalty(d, real, fake,
                                             jax.random.PRNGKey(0),
                                             lambda_gp=0.0)
    assert float(zero) == 0.0 and none is None


def test_dice_losses(rng):
    logits = jnp.asarray(rng.randn(2, 1, 8, 8).astype(np.float32)) * 10
    target = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    # perfect prediction -> dice loss ~ 0
    assert float(losses.dice_loss_1class(logits, target)) == pytest.approx(0, abs=1e-3)
    assert np.isfinite(float(losses.bce_dice_loss(logits, target)))


def test_tensor2im(rng):
    x = rng.rand(2, 1, 8, 8).astype(np.float32) * 2 - 1
    img = tensor2im(x)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_image_pool(rng):
    pool = ImagePool(pool_size=4)
    imgs = rng.randn(8, 1, 4, 4).astype(np.float32)
    out1 = pool.query(imgs[:4])
    np.testing.assert_array_equal(out1, imgs[:4])  # fills the pool verbatim
    out2 = pool.query(imgs[4:])
    assert out2.shape == (4, 1, 4, 4)

    passthrough = ImagePool(pool_size=0)
    np.testing.assert_array_equal(passthrough.query(imgs), imgs)


def test_visualizer_html_gallery(tmp_path):
    """display_current_results writes web/images PNGs + an index.html gallery
    (reference: util/visualizer.py:191-212)."""
    import numpy as np
    from afcm_tpu.config import get_cfg
    from afcm_tpu.utils.visualizer import Visualizer

    cfg = get_cfg()
    cfg.checkpoints_dir = str(tmp_path)
    cfg.name = "viz_test"
    viz = Visualizer(cfg)
    visuals = {"real_A": np.zeros((1, 1, 8, 8)),
               "fake_B": np.ones((1, 1, 8, 8))}
    viz.display_current_results(visuals, epoch=1)
    viz.display_current_results(visuals, epoch=2)
    web = tmp_path / "viz_test" / "web"
    assert (web / "images" / "epoch001.png").exists()
    assert (web / "images" / "epoch002.png").exists()
    index = (web / "index.html").read_text()
    assert "epoch002" in index and "epoch001" in index
    # newest first
    assert index.index("epoch002") < index.index("epoch001")
