"""LR schedule policies vs the reference semantics (models/utils.py:43-69).

Each policy is pinned against the closed-form / torch-documented behavior of
the scheduler the reference instantiates; plateau is additionally exercised
through its stateful patience path.
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


def test_linear():
    cfg = _cfg("linear")
    # flat through n_epochs, then linear to ~0 over n_epochs_decay+1
    assert lr_factor(1, cfg) == 1.0
    assert lr_factor(10, cfg) == 1.0
    assert lr_factor(11, cfg) == pytest.approx(1.0 - 1 / 11.0)
    assert lr_factor(20, cfg) == pytest.approx(1.0 - 10 / 11.0)


def test_step():
    cfg = _cfg("step", lr_decay_iters=3)
    # torch StepLR(gamma=0.1, step_size=3): 0.1 ** (t // 3)
    got = [lr_factor(e, cfg) for e in range(1, 8)]
    assert got == pytest.approx(
        [1.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.01])


def test_cosine():
    cfg = _cfg("cosine", n_epochs=10)
    # torch CosineAnnealingLR(T_max=10, eta_min=0)
    for e in range(1, 12):
        t = e - 1
        want = (1 + math.cos(math.pi * t / 10)) / 2
        assert lr_factor(e, cfg) == pytest.approx(want)
    assert lr_factor(11, cfg) == pytest.approx(0.0)


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
