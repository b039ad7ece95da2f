"""LR schedule policies vs the reference semantics (models/utils.py:43-69).

The epoch-indexed policies are pinned against a LIVE torch oracle that
replays the reference training timeline: scheduler constructed in setup,
then stepped at the *beginning* of every loop epoch (reference:
train.py:44, base_model.py:116-123) — so the factor used while loop epoch
E trains is the post-step value. Plateau is exercised through its
stateful patience path (its wiring is deliberately fixed vs the
reference, which never assigns model.metric).
"""

import math

import pytest

from afcm_tpu.config import get_cfg
from afcm_tpu.models.schedulers import LRScheduler
from afcm_tpu.train import lr_factor


def _cfg(policy, n_epochs=10, n_epochs_decay=10, lr_decay_iters=3,
         epoch_count=1):
    cfg = get_cfg()
    cfg.scheduler.lr_policy = policy
    cfg.scheduler.n_epochs = n_epochs
    cfg.scheduler.n_epochs_decay = n_epochs_decay
    cfg.scheduler.lr_decay_iters = lr_decay_iters
    cfg.scheduler.epoch_count = epoch_count
    return cfg


def _torch_reference_factors(cfg, last_epoch):
    """lr factor per loop epoch under the reference's construction + epoch-
    start stepping (reference: models/utils.py:43-69, train.py:38-44)."""
    import torch
    import warnings
    s = cfg.scheduler
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    policy = s.lr_policy
    if policy == "linear":
        def lambda_rule(epoch):
            return 1.0 - max(0, epoch + s.epoch_count - s.n_epochs) / \
                float(s.n_epochs_decay + 1)
        sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lambda_rule)
    elif policy == "step":
        sched = torch.optim.lr_scheduler.StepLR(
            opt, step_size=s.lr_decay_iters, gamma=0.1)
    elif policy == "cosine":
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=s.n_epochs, eta_min=0)
    factors = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # step-before-optimizer warning
        for e in range(s.epoch_count, last_epoch + 1):
            sched.step()  # reference steps at the START of each loop epoch
            factors[e] = opt.param_groups[0]["lr"]
    return factors


@pytest.mark.parametrize("policy,kwargs", [
    ("linear", {}),
    ("linear", {"epoch_count": 5}),
    ("step", {"lr_decay_iters": 3}),
    ("cosine", {"n_epochs": 10}),
])
def test_epoch_policies_match_torch_reference(policy, kwargs):
    cfg = _cfg(policy, **kwargs)
    last = cfg.scheduler.n_epochs + cfg.scheduler.n_epochs_decay + \
        cfg.scheduler.epoch_count - 1
    want = _torch_reference_factors(cfg, last)
    for e, f in want.items():
        assert lr_factor(e, cfg) == pytest.approx(f, abs=1e-9), \
            f"{policy} epoch {e}: ours {lr_factor(e, cfg)} vs torch {f}"


def test_linear_endpoints():
    cfg = _cfg("linear")
    # flat until the decay begins at loop epoch n_epochs; the reference
    # trains its final loop epoch (n+decay) at factor 0 (LambdaLR stepped
    # at epoch start) — faithful, if quirky.
    assert lr_factor(1, cfg) == 1.0
    assert lr_factor(9, cfg) == 1.0
    assert lr_factor(10, cfg) == pytest.approx(1.0 - 1 / 11.0)
    assert lr_factor(20, cfg) == pytest.approx(0.0)


def test_plateau_patience():
    cfg = _cfg("plateau")
    sched = LRScheduler(cfg)
    # improving metric: factor stays 1
    assert sched.factor(1, 1.0) == 1.0
    assert sched.factor(2, 0.5) == 1.0
    # stall for patience(5)+1 epochs -> one 0.2x cut
    for e in range(3, 9):
        f = sched.factor(e, 0.5)
    assert f == pytest.approx(0.2)
    # further stall -> second cut after another 6 non-improving epochs
    for e in range(9, 15):
        f = sched.factor(e, 0.5)
    assert f == pytest.approx(0.04)
    # an improvement resets patience and keeps the reduced factor
    assert sched.factor(15, 0.1) == pytest.approx(0.04)


def test_plateau_rel_threshold():
    cfg = _cfg("plateau")
    sched = LRScheduler(cfg)
    sched.factor(1, 1.0)
    # a 0.5% improvement is below the 1% rel threshold -> counts as bad
    for e in range(2, 8):
        f = sched.factor(e, 0.995)
    assert f == pytest.approx(0.2)


def test_unknown_policy_raises():
    cfg = _cfg("warmup")
    with pytest.raises(NotImplementedError):
        LRScheduler(cfg)
