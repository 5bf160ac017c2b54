"""SlowMo periodic-sync DP (train/slowmo.py).

Parity target: fairscale's SlowMoDistributedDataParallel as the reference
wires it (`fairseq/models/distributed_fairseq_model.py:92-121`,
`trainer.py:914-918`): localsgd averaging every localsgd_frequency steps +
the slow momentum step buf = b*buf + (old-avg)/lr; old -= lr*buf.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from s2st_tpu.train.slowmo import (SlowMoConfig, default_slowmo_momentum,
                                   slowmo_init, slowmo_sync)


def test_default_momentum_table():
    # distributed_fairseq_model.py:101-109
    assert default_slowmo_momentum(8) == 0.0
    assert default_slowmo_momentum(16) == 0.0
    assert default_slowmo_momentum(32) == 0.2
    assert default_slowmo_momentum(64) == 0.5
    assert default_slowmo_momentum(128) == 0.6


def test_zero_momentum_is_localsgd_average():
    r = np.random.RandomState(0)
    local = r.randn(4, 6).astype(np.float32)
    state = slowmo_init({"w": jnp.zeros((6,))})
    new_p, new_state = slowmo_sync({"w": jnp.asarray(local)}, state,
                                   SlowMoConfig(slowmo_momentum=0.0),
                                   base_lr=0.1)
    np.testing.assert_allclose(np.asarray(new_p["w"]), local.mean(0),
                               atol=1e-6)
    # old_params tracks the averaged model
    np.testing.assert_allclose(np.asarray(new_state["old_params"]["w"]),
                               local.mean(0), atol=1e-6)


def test_slow_momentum_math_vs_numpy_spec():
    """Two syncs against a literal numpy transcription of fairscale's
    _global_momentum_step update."""
    r = np.random.RandomState(1)
    beta, slowmo_lr, lr = 0.6, 1.0, 0.05
    cfg = SlowMoConfig(slowmo_momentum=beta, slowmo_lr=slowmo_lr)
    w0 = r.randn(5).astype(np.float32)
    state = slowmo_init({"w": jnp.asarray(w0)})

    old = w0.copy()
    buf = np.zeros_like(w0)
    params = {"w": jnp.asarray(w0)}
    for sync in range(2):
        local = w0[None] + r.randn(3, 5).astype(np.float32) * 0.1
        params, state = slowmo_sync({"w": jnp.asarray(local)}, state, cfg,
                                    base_lr=lr)
        avg = local.mean(0)
        buf = beta * buf + (old - avg) / lr
        old = old - slowmo_lr * lr * buf
        np.testing.assert_allclose(np.asarray(params["w"]), old, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state["momentum"]["w"]), buf,
                                   atol=1e-5)


def test_slowmo_converges_on_quadratic():
    """4 workers, per-worker quadratic slices, localsgd_frequency local
    steps between syncs: the slow model reaches the joint optimum (the
    outer momentum accelerates vs plain averaging)."""
    cfg = SlowMoConfig(slowmo_momentum=0.5, localsgd_frequency=5)
    r = np.random.RandomState(0)
    targets = r.randn(4, 3).astype(np.float32)
    joint = targets.mean(0)
    w = np.zeros((3,), np.float32)
    state = slowmo_init({"w": jnp.asarray(w)})
    for sync in range(30):
        local = np.tile(w, (4, 1))
        for _ in range(cfg.localsgd_frequency):
            local = local - 0.2 * (local - targets)
        new_p, state = slowmo_sync({"w": jnp.asarray(local)}, state, cfg,
                                   base_lr=0.2)
        w = np.asarray(new_p["w"])
    assert np.abs(w - joint).max() < 0.05
