"""Adaptive input embeddings + adaptive softmax (Grave et al. / Baevski &
Auli) for the big-vocab LM archs (transformer_lm_wiki103 / _gbw).

Parity: ``fairseq/modules/adaptive_input.py`` (per-band embeddings at
initial_dim // factor^band projected up to output_dim),
``fairseq/modules/adaptive_softmax.py`` (head = cutoff[0] words +
one class logit per tail band; tail i = down-projection to
input_dim // factor^(i+1) then band vocabulary; full log-probs compose
head log-softmax with tail log-softmax + the band's class prior) and the
tied variants (TiedHeadModule / TiedLinear: head words reuse band-0
embeddings, tail outputs reuse band embeddings, --tie-adaptive-proj reuses
the input projections transposed), plus
``fairseq/criterions/adaptive_loss.py``.

TPU-native: the reference gathers the rows of each band
(index_select on nonzero masks — dynamic shapes); here every band
computes on ALL rows and a mask selects, keeping shapes static for XLA.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Params, embedding, xavier_uniform

PAD = 1


def _bands(cutoff: Sequence[int], vocab: int) -> List[Tuple[int, int]]:
    cutoff = list(cutoff)
    if vocab > cutoff[-1]:
        cutoff = cutoff + [vocab]
    assert vocab == cutoff[-1], "cutoff larger than vocab"
    return [(0 if i == 0 else cutoff[i - 1], cutoff[i])
            for i in range(len(cutoff))]


# ---------------------------------------------------------------------------
# adaptive input
# ---------------------------------------------------------------------------

def init_adaptive_input(key, vocab: int, cutoff: Sequence[int],
                        initial_dim: int, factor: float, output_dim: int
                        ) -> Params:
    bands = _bands(cutoff, vocab)
    p: Params = {}
    ks = jax.random.split(key, 2 * len(bands))
    for i, (lo, hi) in enumerate(bands):
        dim = int(initial_dim // (factor ** i))
        w = jax.random.normal(ks[2 * i], (hi - lo, dim)) * (dim ** -0.5)
        if i == 0:      # padding_idx only applies to the first band
            w = w.at[PAD].set(0.0)
        p[f"band{i}"] = {
            "embed": {"w": w},
            "proj": {"w": xavier_uniform(ks[2 * i + 1], (dim, output_dim),
                                         dim, output_dim)},
        }
    return p


def adaptive_input_forward(p: Params, tokens: jnp.ndarray,
                           cutoff: Sequence[int], vocab: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """(..., ) int32 -> (..., output_dim): band lookup + up-projection."""
    bands = _bands(cutoff, vocab)
    out = None
    for i, (lo, hi) in enumerate(bands):
        in_band = (tokens >= lo) & (tokens < hi)
        idx = jnp.clip(tokens - lo, 0, hi - lo - 1)
        x = embedding(p[f"band{i}"]["embed"], idx, dtype)
        x = jnp.dot(x, p[f"band{i}"]["proj"]["w"].astype(dtype))
        out = jnp.where(in_band[..., None], x,
                        0.0 if out is None else out)
    return out


# ---------------------------------------------------------------------------
# adaptive softmax
# ---------------------------------------------------------------------------

def init_adaptive_softmax(key, vocab: int, input_dim: int,
                          cutoff: Sequence[int], factor: float = 4.0
                          ) -> Params:
    bands = _bands(cutoff, vocab)
    n_tails = len(bands) - 1
    ks = jax.random.split(key, 1 + 2 * n_tails)
    head_out = bands[0][1] + n_tails
    p: Params = {"head": {"w": xavier_uniform(ks[0],
                                              (input_dim, head_out),
                                              input_dim, head_out)}}
    for i in range(n_tails):
        dim = int(input_dim // (factor ** (i + 1)))
        lo, hi = bands[i + 1]
        p[f"tail{i}"] = {
            "proj": {"w": xavier_uniform(ks[1 + 2 * i], (input_dim, dim),
                                         input_dim, dim)},
            "out": {"w": xavier_uniform(ks[2 + 2 * i], (dim, hi - lo),
                                        dim, hi - lo)},
        }
    return p


def _head_logits(p: Params, x: jnp.ndarray, tied: Optional[Params],
                 cutoff0: int, n_tails: int) -> jnp.ndarray:
    """Head logits (N, cutoff0 + n_tails). With tied adaptive input
    (TiedHeadModule): word logits = x @ band0_embed.T, class logits from
    the separate class_proj."""
    if tied is not None:
        w_words = tied["band0_embed_w"]                   # (V0, D)
        words = jnp.dot(x, w_words.astype(x.dtype).T)
        classes = jnp.dot(x, p["class_proj"]["w"].astype(x.dtype))
        return jnp.concatenate([words, classes], axis=-1)
    return jnp.dot(x, p["head"]["w"].astype(x.dtype))


def _tail_logits(p: Params, x: jnp.ndarray, i: int,
                 tied: Optional[Params]) -> jnp.ndarray:
    if tied is not None and f"band{i+1}_proj_w" in tied:
        # tie_adaptive_proj: input projection transposed (TiedLinear)
        h = jnp.dot(x, tied[f"band{i+1}_proj_w"].astype(x.dtype))
    else:
        h = jnp.dot(x, p[f"tail{i}"]["proj"]["w"].astype(x.dtype))
    if tied is not None and f"band{i+1}_embed_w" in tied:
        return jnp.dot(h, tied[f"band{i+1}_embed_w"].astype(x.dtype).T)
    return jnp.dot(h, p[f"tail{i}"]["out"]["w"].astype(x.dtype))


def tied_views(adaptive_input_p: Params, tie_proj: bool) -> Params:
    """Views of the adaptive-input tables for --tie-adaptive-weights
    (adaptive_softmax.py TiedHeadModule/_make_tail)."""
    out = {"band0_embed_w": adaptive_input_p["band0"]["embed"]["w"]}
    i = 1
    while f"band{i}" in adaptive_input_p:
        out[f"band{i}_embed_w"] = adaptive_input_p[f"band{i}"]["embed"]["w"]
        if tie_proj:
            # torch: TiedLinear(tied_proj, transpose=True) == x @ W where
            # W is the input proj's (dim, out_dim) OUR layout transposed
            out[f"band{i}_proj_w"] = \
                adaptive_input_p[f"band{i}"]["proj"]["w"].T
        i += 1
    return out


def adaptive_log_probs(p: Params, x: jnp.ndarray, cutoff: Sequence[int],
                       vocab: int, tied: Optional[Params] = None
                       ) -> jnp.ndarray:
    """Full-vocab log-probs (N, V) (get_log_prob :228-260): head bands
    0..cutoff0 direct; tail band i = tail log-softmax + class prior."""
    bands = _bands(cutoff, vocab)
    n_tails = len(bands) - 1
    c0 = bands[0][1]
    head = jax.nn.log_softmax(
        _head_logits(p, x, tied, c0, n_tails).astype(jnp.float32), axis=-1)
    parts = [head[:, :c0]]
    for i in range(n_tails):
        tail = jax.nn.log_softmax(
            _tail_logits(p, x, i, tied).astype(jnp.float32), axis=-1)
        parts.append(tail + head[:, c0 + i:c0 + i + 1])
    return jnp.concatenate(parts, axis=-1)


def adaptive_nll(p: Params, x: jnp.ndarray, target: jnp.ndarray,
                 cutoff: Sequence[int], vocab: int,
                 tied: Optional[Params] = None) -> jnp.ndarray:
    """Per-row negative log-likelihood under the hierarchical softmax —
    the adaptive_loss criterion's sum of band cross-entropies
    (adaptive_loss.py:52-70), computed with static shapes (each tail runs
    on all rows; band masks select)."""
    bands = _bands(cutoff, vocab)
    n_tails = len(bands) - 1
    c0 = bands[0][1]
    head_lp = jax.nn.log_softmax(
        _head_logits(p, x, tied, c0, n_tails).astype(jnp.float32), axis=-1)
    # adapted head target: band i>0 -> class token cutoff0 + i - 1
    head_tgt = target
    nll = jnp.zeros(target.shape, jnp.float32)
    for i in range(n_tails):
        lo, hi = bands[i + 1]
        in_band = (target >= lo) & (target < hi)
        head_tgt = jnp.where(in_band, c0 + i, head_tgt)
        tail_lp = jax.nn.log_softmax(
            _tail_logits(p, x, i, tied).astype(jnp.float32), axis=-1)
        t = jnp.clip(target - lo, 0, hi - lo - 1)
        nll = nll - jnp.where(
            in_band,
            jnp.take_along_axis(tail_lp, t[:, None], axis=1)[:, 0], 0.0)
    nll = nll - jnp.take_along_axis(
        head_lp, jnp.clip(head_tgt, 0, c0 + n_tails - 1)[:, None],
        axis=1)[:, 0]
    return nll
