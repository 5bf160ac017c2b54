"""BMUF block-momentum sync: math parity vs the reference's own
FairseqBMUF update equations driven step-by-step, and a convergence
check (distributed tests/distributed/test_bmuf.py analogue without
process spawning — the replica axis stands in for the workers).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.train.bmuf import BMUFConfig, bmuf_init, bmuf_sync, \
    warmup_sync


def _ref_update(local_stack, global_p, m, cfg):
    """The reference equations (fairseq/optim/bmuf.py:150-199) in numpy."""
    grad = global_p[None] - local_stack
    mean_grad = grad.mean(0)
    if cfg.block_momentum == 0:
        new_p = local_stack.mean(0)
        return new_p, global_p, m
    m_new = cfg.block_momentum * m + cfg.block_lr * mean_grad
    new_p = global_p - m_new
    new_global = new_p.copy()
    if cfg.use_nbm:
        new_p = new_p - cfg.block_momentum * m_new
    return new_p, new_global, m_new


@pytest.mark.parametrize("bm,nbm", [(0.875, True), (0.875, False),
                                    (0.0, True)])
def test_bmuf_sync_math(bm, nbm):
    cfg = BMUFConfig(block_momentum=bm, use_nbm=nbm, block_lr=0.9)
    r = np.random.RandomState(0)
    p0 = {"w": r.randn(4, 3).astype(np.float32)}
    state = bmuf_init(p0)
    g_ref = p0["w"].copy()
    m_ref = np.zeros_like(p0["w"])
    for step in range(3):
        local = p0["w"][None] + r.randn(4, 4, 3).astype(np.float32) * 0.1
        new_p, state = bmuf_sync({"w": jnp.asarray(local)}, state, cfg)
        exp_p, g_ref, m_ref = _ref_update(local, g_ref, m_ref, cfg)
        np.testing.assert_allclose(np.asarray(new_p["w"]), exp_p,
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(state["global_params"]["w"]), g_ref, atol=1e-6)
        p0 = {"w": exp_p}


def test_warmup_sync():
    r = np.random.RandomState(1)
    local = {"w": jnp.asarray(r.randn(4, 3, 2).astype(np.float32))}
    state = bmuf_init({"w": local["w"][0]})
    new_p, state2 = warmup_sync(local, state, average=False)
    np.testing.assert_array_equal(np.asarray(new_p["w"]),
                                  np.asarray(local["w"][0]))
    np.testing.assert_array_equal(
        np.asarray(state2["smoothed_grads"]["w"]), 0.0)
    new_p, _ = warmup_sync(local, state, average=True)
    np.testing.assert_allclose(np.asarray(new_p["w"]),
                               np.asarray(local["w"]).mean(0), atol=1e-6)


def test_bmuf_converges_on_quadratic():
    """4 workers, local SGD on per-worker quadratic slices; BMUF syncs
    drive the global model to the joint optimum (the distributed
    test_bmuf.py analogue)."""
    cfg = BMUFConfig(block_momentum=0.5, block_lr=1.0, use_nbm=True)
    r = np.random.RandomState(0)
    targets = r.randn(4, 3).astype(np.float32)      # per-worker optimum
    joint = targets.mean(0)
    w = np.zeros((3,), np.float32)
    state = bmuf_init({"w": jnp.asarray(w)})
    for sync in range(30):
        local = np.tile(w, (4, 1))
        for _ in range(5):                           # local steps
            local = local - 0.2 * (local - targets)
        new_p, state = bmuf_sync({"w": jnp.asarray(local)}, state, cfg)
        w = np.asarray(new_p["w"])
    assert np.abs(w - joint).max() < 0.05
