"""MCD-DTW validation metric: anti-diagonal batched DTW vs brute-force DP
(parity: tasks/s2s_translation.py:414-460 batch_dynamic_time_warping and
:520-552 batch_mel_cepstral_distortion)."""

import numpy as np
import pytest

import jax.numpy as jnp

from s2st_tpu.ops.mcd import batch_dtw, batch_mcd, rms_dist_matrix


def _brute_dtw(dist):
    m, n = dist.shape
    D = np.full((m, n), np.inf)
    D[0, 0] = dist[0, 0]
    for i in range(m):
        for j in range(n):
            if i == 0 and j == 0:
                continue
            cands = []
            if i > 0:
                cands.append(D[i - 1, j])
            if j > 0:
                cands.append(D[i, j - 1])
            if i > 0 and j > 0:
                cands.append(D[i - 1, j - 1])
            D[i, j] = dist[i, j] + min(cands)
    # backtrack for path length
    i, j, steps = m - 1, n - 1, 1
    while i > 0 or j > 0:
        opts = []
        if i > 0 and j > 0:
            opts.append((D[i - 1, j - 1], i - 1, j - 1))
        if i > 0:
            opts.append((D[i - 1, j], i - 1, j))
        if j > 0:
            opts.append((D[i, j - 1], i, j - 1))
        _, i, j = min(opts, key=lambda x: x[0])
        steps += 1
    return D[m - 1, n - 1], steps


def test_dtw_matches_bruteforce():
    r = np.random.RandomState(0)
    m_lens = np.array([7, 5, 9], np.int32)
    n_lens = np.array([6, 8, 4], np.int32)
    M, N = 9, 8
    dist = r.rand(3, M, N).astype(np.float32)
    cost, nins, ndel = batch_dtw(jnp.asarray(dist), jnp.asarray(m_lens),
                                 jnp.asarray(n_lens))
    for b in range(3):
        ref_cost, ref_steps = _brute_dtw(
            dist[b, :m_lens[b], :n_lens[b]])
        assert abs(float(cost[b]) - ref_cost) < 1e-4, b
        assert int(nins[b]) == ref_steps - m_lens[b], b
        assert int(ndel[b]) == ref_steps - n_lens[b], b


def test_rms_dist_matrix():
    x = np.array([[[0.0, 0.0], [1.0, 1.0]]], np.float32)
    y = np.array([[[0.0, 0.0], [3.0, 4.0]]], np.float32)
    d = np.asarray(rms_dist_matrix(jnp.asarray(x), jnp.asarray(y)))
    assert abs(d[0, 0, 0] - 0.0) < 1e-6
    assert abs(d[0, 0, 1] - 5.0 / np.sqrt(2)) < 1e-5


def test_batch_mcd_identical_waves_near_zero():
    r = np.random.RandomState(1)
    wave = (r.randn(2, 8000) * 0.1).astype(np.float32)
    lens = np.array([8000, 6000], np.int32)
    out = batch_mcd(jnp.asarray(wave), jnp.asarray(lens),
                    jnp.asarray(wave), jnp.asarray(lens))
    # identical waves: only the catastrophic-cancellation noise of the
    # |x|^2+|y|^2-2xy distance expansion remains (~6e-4/frame here)
    assert float(out["mcd_loss"]) < 0.1
    # path is the main diagonal: no insertions/deletions
    assert float(out["nins"]) == 0.0
    assert float(out["ndel"]) == 0.0


def test_batch_mcd_differs_for_different_audio():
    r = np.random.RandomState(2)
    w1 = (r.randn(1, 8000) * 0.1).astype(np.float32)
    w2 = (r.randn(1, 8000) * 0.1).astype(np.float32)
    lens = np.array([8000], np.int32)
    out = batch_mcd(jnp.asarray(w1), jnp.asarray(lens),
                    jnp.asarray(w2), jnp.asarray(lens))
    assert float(out["mcd_loss"]) > 0.5
