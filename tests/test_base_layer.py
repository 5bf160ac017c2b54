"""Balanced assignment (auction) + BASE layer: balance/optimality
properties, parity vs the exhaustive optimum on small instances, and the
jitted MoE forward.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.ops.balanced_assignment import (balanced_assignment,
                                              greedy_assignment)


def _total_score(scores, assignment, jpw):
    total = 0.0
    for w in range(len(assignment) // jpw):
        for j in assignment[w * jpw:(w + 1) * jpw]:
            total += scores[j, w]
    return total


def _brute_force_best(scores, num_workers):
    """Exhaustive balanced assignment optimum (tiny instances)."""
    num_jobs = scores.shape[0]
    jpw = num_jobs // num_workers
    best = -np.inf
    for perm in itertools.permutations(range(num_jobs)):
        total = sum(scores[perm[w * jpw + i], w]
                    for w in range(num_workers) for i in range(jpw))
        best = max(best, total)
    return best


def test_balanced_and_near_optimal():
    r = np.random.RandomState(0)
    for trial in range(10):
        scores = r.randn(6, 3).astype(np.float32)  # 6 jobs, 3 workers
        out = balanced_assignment(scores)
        assert sorted(out.tolist()) == list(range(6))  # perfect balance
        got = _total_score(scores, out, 2)
        best = _brute_force_best(scores, 3)
        # the auction's epsilon-optimality bound: within n*eps of optimal
        eps = max((scores.max() - scores.min()) / 50, 1e-4)
        assert got >= best - 6 * eps - 1e-5, (trial, got, best)


def test_balanced_assignment_larger():
    r = np.random.RandomState(1)
    scores = r.randn(64, 8).astype(np.float32)
    out = balanced_assignment(scores)
    assert sorted(out.tolist()) == list(range(64))
    # each worker's block beats a random block on its own scores
    jpw = 8
    for w in range(8):
        mine = scores[out[w * jpw:(w + 1) * jpw], w].sum()
        rand = scores[r.choice(64, jpw, replace=False), w].sum()
        assert mine >= rand - 1.0


def test_nan_scores_handled():
    r = np.random.RandomState(2)
    scores = r.randn(8, 2).astype(np.float32)
    scores[0, 0] = np.nan
    out = balanced_assignment(scores)
    assert sorted(out.tolist()) == list(range(8))


def test_greedy_assignment():
    scores = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 0.1], [0.1, 3.0]],
                      np.float32)
    order, counts = greedy_assignment(scores)
    assert counts.tolist() == [2, 2]
    assert set(order[:2].tolist()) == {0, 2}
    assert set(order[2:].tolist()) == {1, 3}


def test_base_layer_forward_jits():
    from s2st_tpu.nn.base_layer import (BaseLayerConfig, base_layer_forward,
                                        init_base_layer)
    cfg = BaseLayerConfig(embed_dim=8, ffn_dim=16, num_experts=4)
    p = init_base_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    out = jax.jit(lambda p, x: base_layer_forward(p, cfg, x))(p, x)
    assert out.shape == (16, 8)
    assert np.isfinite(np.asarray(out)).all()
    # every token was touched (routed back to its own position)
    assert not np.allclose(np.asarray(out), 0.0)
