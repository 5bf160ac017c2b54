"""alignment_train: parity vs a direct port of the reference CPU op's
loops (the compiled extension is absent; the C++ is the behavioral spec),
plus probability-mass sanity.
"""

import numpy as np

import jax.numpy as jnp

from s2st_tpu.ops.monotonic_align import alignment_train, exclusive_cumprod


def _oracle(p_choose, eps=1e-6):
    """Direct port of alignmentTrainCPUImpl (alignment_train_cpu.cpp
    :80-133)."""
    b, tt, ts = p_choose.shape
    cumprod_1mp = np.ones_like(p_choose)
    for bb in range(b):
        for t in range(tt):
            prod = 1.0
            for s in range(ts):
                cumprod_1mp[bb, t, s] = prod
                prod *= 1.0 - p_choose[bb, t, s]
    clamp = np.clip(cumprod_1mp, eps, 1.0)
    alpha = np.zeros_like(p_choose)
    alpha[:, 0, 0] = 1.0
    for t in range(tt):
        for bb in range(b):
            prev_scan = 0.0
            for s in range(ts):
                a_prev = alpha[bb, 0, s] if t == 0 else alpha[bb, t - 1, s]
                # at t==0 the seed row holds [1, 0, ...] before overwrite
                curr = prev_scan + a_prev / clamp[bb, t, s]
                out = curr * p_choose[bb, t, s] * cumprod_1mp[bb, t, s]
                alpha[bb, t, s] = min(max(out, 0.0), 1.0)
                prev_scan = curr
    return alpha


def test_exclusive_cumprod():
    x = np.array([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(
        np.asarray(exclusive_cumprod(jnp.asarray(x))), [[1.0, 2.0, 6.0]])


def test_alignment_train_matches_cpu_spec():
    r = np.random.RandomState(0)
    p = r.uniform(0.05, 0.95, size=(3, 5, 7)).astype(np.float32)
    ours = np.asarray(alignment_train(jnp.asarray(p)))
    ref = _oracle(p)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_alignment_mass():
    """Each target step's alpha sums to <= 1 (it is a sub-probability
    over source positions) and stays in [0, 1]."""
    r = np.random.RandomState(1)
    p = r.uniform(0.1, 0.9, size=(2, 6, 9)).astype(np.float32)
    a = np.asarray(alignment_train(jnp.asarray(p)))
    assert (a >= 0).all() and (a <= 1).all()
    assert (a.sum(-1) <= 1.0 + 1e-4).all()
