"""Dynamic CRF layer (low-rank transitions + beam-approximated partition).

Parity: ``fairseq/modules/dynamic_crf_layer.py`` — transition matrix
M = E1 E2^T (low_rank), normalizer Z approximated over the per-position
top-`beam` emission tokens (training forces the gold token into the beam
via an inf-scatter), Viterbi decode over the same beam with per-position
mask freezing and the difference-of-prefix-scores positional scores.

TPU-native: the time recursions (logsumexp forward pass, Viterbi
max+backtrace) are ``lax.scan``s; the beam transition blocks are one
einsum over (B, T-1, K, R) token factors.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Params


def init_crf(key, vocab: int, low_rank: int = 32) -> Params:
    k1, k2 = jax.random.split(key)
    # nn.Embedding default init: N(0, 1)
    return {"E1": {"w": jax.random.normal(k1, (vocab, low_rank))},
            "E2": {"w": jax.random.normal(k2, (vocab, low_rank))}}


def crf_score(p: Params, emissions: jnp.ndarray, targets: jnp.ndarray,
              masks: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized path score (B,) (_compute_score :89-99)."""
    em = jnp.take_along_axis(emissions, targets[:, :, None], 2)[:, :, 0]
    e1 = p["E1"]["w"][targets[:, :-1]]
    e2 = p["E2"]["w"][targets[:, 1:]]
    trans = jnp.sum(e1 * e2, axis=-1)
    scores = em.at[:, 1:].add(trans.astype(em.dtype))
    return jnp.sum(scores * masks.astype(scores.dtype), axis=1)


def _beam_transitions(p: Params, beam_targets: jnp.ndarray) -> jnp.ndarray:
    """(B, T-1, K, K) transition blocks between consecutive beams."""
    e1 = p["E1"]["w"][beam_targets[:, :-1]]     # (B, T-1, K, R)
    e2 = p["E2"]["w"][beam_targets[:, 1:]]
    return jnp.einsum("btkr,btlr->btkl", e1, e2)


def crf_normalizer(p: Params, emissions: jnp.ndarray,
                   targets: Optional[jnp.ndarray], masks: jnp.ndarray,
                   beam: int) -> jnp.ndarray:
    """Beam-approximated log-partition (B,) (_compute_normalizer
    :101-133). With targets, the gold token is forced into the beam."""
    if targets is not None:
        # force the gold token to the top of the beam (inf-scatter probe)
        probe = emissions.at[
            jnp.arange(emissions.shape[0])[:, None],
            jnp.arange(emissions.shape[1])[None, :], targets].set(jnp.inf)
        _, beam_targets = jax.lax.top_k(probe, beam)
        beam_em = jnp.take_along_axis(emissions, beam_targets, 2)
    else:
        beam_em, beam_targets = jax.lax.top_k(emissions, beam)
    trans = _beam_transitions(p, beam_targets)

    def step(score, xs):
        tr, em_i, m_i = xs
        nxt = jax.nn.logsumexp(score[:, :, None] + tr, axis=1) + em_i
        return jnp.where(m_i[:, None], nxt, score), None

    xs = (trans.transpose(1, 0, 2, 3), beam_em.transpose(1, 0, 2)[1:],
          masks.T[1:])
    score, _ = jax.lax.scan(step, beam_em[:, 0], xs)
    return jax.nn.logsumexp(score, axis=1)


def crf_log_likelihood(p: Params, emissions: jnp.ndarray,
                       targets: jnp.ndarray, masks: jnp.ndarray,
                       beam: int) -> jnp.ndarray:
    em32 = emissions.astype(jnp.float32)
    return crf_score(p, em32, targets, masks) - \
        crf_normalizer(p, em32, targets, masks, beam)


def crf_viterbi(p: Params, emissions: jnp.ndarray, masks: jnp.ndarray,
                beam: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viterbi over the emission beam (_viterbi_decode :135-188).
    Returns (scores (B, T) — per-position prefix-score deltas, tokens
    (B, T))."""
    em32 = emissions.astype(jnp.float32)
    b, t, _ = emissions.shape
    beam_em, beam_targets = jax.lax.top_k(em32, beam)
    trans = _beam_transitions(p, beam_targets)
    dummy = jnp.broadcast_to(jnp.arange(beam)[None, :], (b, beam))

    def fwd(score, xs):
        tr, em_i, m_i = xs
        cand = score[:, :, None] + tr                  # (B, K, K)
        best = jnp.max(cand, axis=1)
        idx = jnp.argmax(cand, axis=1)
        nxt = best + em_i
        new_score = jnp.where(m_i[:, None], nxt, score)
        new_idx = jnp.where(m_i[:, None], idx, dummy)
        return new_score, (score, new_idx)

    xs = (trans.transpose(1, 0, 2, 3), beam_em.transpose(1, 0, 2)[1:],
          masks.T[1:])
    score, (traj_scores, traj_tokens) = jax.lax.scan(fwd, beam_em[:, 0], xs)

    best_score = jnp.max(score, axis=1)
    best_index = jnp.argmax(score, axis=1)

    def back(prev_idx, xs):
        idx_i, scs_i = xs                               # (B, K) each
        bi = jnp.arange(b)
        tok = idx_i[bi, prev_idx]
        sc = scs_i[bi, prev_idx]
        return tok, (tok, sc)

    _, (toks_rev, scs_rev) = jax.lax.scan(
        back, best_index, (traj_tokens[::-1], traj_scores[::-1]))
    beam_idx = jnp.concatenate(
        [toks_rev[::-1].T, best_index[:, None]], axis=1)   # (B, T)
    prefix = jnp.concatenate(
        [scs_rev[::-1].T, best_score[:, None]], axis=1)
    tokens = jnp.take_along_axis(beam_targets, beam_idx[:, :, None],
                                 2)[:, :, 0]
    scores = prefix.at[:, 1:].add(-prefix[:, :-1])
    return scores, tokens
