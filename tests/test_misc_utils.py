"""misc utils: assert_shape, summary, infinite sampler, replica checks,
template model."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.utils.misc import (InfiniteSampler, assert_shape,  # noqa: E402
                                 check_replica_consistency, num_params,
                                 print_module_summary)


def test_assert_shape():
    x = jnp.zeros((2, 3, 4))
    assert_shape(x, (2, None, 4))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3, 5))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3))


def test_module_summary_and_count():
    variables = {"a": {"w": jnp.zeros((3, 4))}, "b": jnp.zeros((5,))}
    assert num_params(variables) == 17
    text = print_module_summary(variables)
    assert "Total parameters: 17" in text


def test_infinite_sampler_rank_partition():
    s0 = InfiniteSampler(10, rank=0, num_replicas=2, shuffle=False)
    s1 = InfiniteSampler(10, rank=1, num_replicas=2, shuffle=False)
    it0, it1 = iter(s0), iter(s1)
    seq0 = [next(it0) for _ in range(5)]
    seq1 = [next(it1) for _ in range(5)]
    # the two replicas interleave to cover the dataset exactly once
    assert sorted(seq0 + seq1) == list(range(10))


def test_infinite_sampler_shuffled_covers():
    s = InfiniteSampler(8, shuffle=True, seed=3)
    it = iter(s)
    seen = {next(it) for _ in range(64)}
    assert seen == set(range(8))


def test_replica_consistency_passes_on_replicated():
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]).reshape(4, 1),
                             ("data", "model"))
    x = jax.device_put(jnp.arange(8.0),
                       jax.sharding.NamedSharding(
                           mesh, jax.sharding.PartitionSpec()))
    assert check_replica_consistency({"x": x})


def test_port_round_trip():
    from afcm_tpu.utils.port import (state_dict_to_variables,
                                     variables_to_state_dict)
    rng = np.random.RandomState(0)
    sd = {"mapping.fc0.weight": np.ones((4, 3)),
          "mapping.fc0.bias": np.zeros((4,)),
          "mapping.w_avg": np.full((4,), 0.5),
          "synthesis.encoder_0.magnitude_ema": np.asarray(1.0),
          "synthesis.encoder_0.up_filter": np.ones((12,)),
          # CALayer 1x1 convs flatten to flax Dense kernels and back
          "synthesis.encoder_1.ca.conv_du.0.weight": rng.randn(2, 8, 1, 1),
          "synthesis.encoder_1.ca.conv_du.0.bias": rng.randn(2),
          "synthesis.encoder_1.ca.conv_du.2.weight": rng.randn(8, 2, 1, 1),
          "synthesis.encoder_1.ca.conv_du.2.bias": rng.randn(8),
          # per-construction constants round-trip through 'constants'
          "synthesis.input.freqs": rng.randn(32, 2),
          "synthesis.input.phases": rng.randn(32)}
    variables = state_dict_to_variables(sd)
    assert "w_avg" in variables["moments"]["mapping"]
    assert "up_filter" not in str(variables)
    assert variables["params"]["synthesis"]["encoder_1"]["ca"]["down"][
        "kernel"].shape == (8, 2)
    assert "freqs" in variables["constants"]["synthesis"]["input"]
    back = variables_to_state_dict(variables)
    assert set(back) == set(sd) - {"synthesis.encoder_0.up_filter"}
    for key in back:
        np.testing.assert_array_equal(back[key], np.asarray(sd[key]),
                                      err_msg=key)


def test_template_model_trains():
    from afcm_tpu.models.template_model import TemplateModel
    model = TemplateModel()
    rng = np.random.RandomState(0)
    batch = {"A": jnp.asarray(rng.randn(2, 1, 16, 16).astype(np.float32)),
             "B": jnp.asarray(rng.randn(2, 1, 16, 16).astype(np.float32))}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(5):
        state, metrics = model.train_step(state, batch)
        losses.append(float(metrics["loss_G"]))
    assert losses[-1] < losses[0]
