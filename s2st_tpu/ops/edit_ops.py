"""Levenshtein edit-distance training targets + edit application ops.

Parity: ``fairseq/clib/libnat/edit_dist.cpp`` (edit_distance2_with_dp +
edit_distance2_backtracking: substitution cost 2, backtrace preferring
insert > delete > keep on strict improvement) and
``fairseq/models/nat/levenshtein_utils.py`` (_get_ins_targets /
_get_del_targets label construction, _apply_ins_masks / _apply_ins_words /
_apply_del_words edit application).

TPU-native design: the reference runs a per-pair C++/CUDA DP on
host/device; here the whole thing is XLA —
  * the DP fills rows with a ``lax.scan``; the in-row left-to-right
    dependency d[i][j] = min(c[j], d[i][j-1]+1) collapses to a cumulative
    minimum (d[i][j] = j + cummin(c[k]-k)), so each row is one vector op;
  * the backtrace is a batch-vectorized ``lax.scan`` of Lx+Ly steps
    emitting insert/delete/keep flags by scatter-add;
  * the edit applications are fixed-width gathers/scatters (no dynamic
    reallocation — the reference grows tensors; here a static buffer).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

PAD, EOS, UNK, BOS = 1, 2, 3, 0


def levenshtein_dp(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(B, Lx+1, Ly+1) int32 DP table: d[i][j] = edit distance between
    x[:i] and y[:j] with substitution cost 2 (edit_dist.cpp:23-43).
    Padded tails produce garbage cells that the backtrace never visits
    (it starts at the true lengths)."""
    b, lx = x.shape
    ly = y.shape[1]
    j_idx = jnp.arange(ly + 1, dtype=jnp.int32)
    row0 = jnp.broadcast_to(j_idx, (b, ly + 1))            # d[0][j] = j

    def step(prev_row, x_i):
        # c[j] = min(prev[j] + 1, prev[j-1] + 2*(x_i != y_{j-1})), c[0]=i
        i = x_i["i"]
        neq = (x_i["tok"][:, None] != y).astype(jnp.int32)  # (B, Ly)
        c_tail = jnp.minimum(prev_row[:, 1:] + 1,
                             prev_row[:, :-1] + 2 * neq)
        c = jnp.concatenate(
            [jnp.full((b, 1), i, jnp.int32), c_tail], axis=1)
        # d[i][j] = min_{k<=j} (c[k] + j - k) = j + cummin(c[k] - k)
        row = j_idx[None, :] + jax.lax.cummin(c - j_idx[None, :], axis=1)
        return row, row

    xs = {"tok": x.T, "i": jnp.arange(1, lx + 1, dtype=jnp.int32)}
    _, rows = jax.lax.scan(step, row0, xs)
    return jnp.concatenate([row0[None], rows], axis=0).transpose(1, 0, 2)


def backtrace_edit_ops(d: jnp.ndarray, lx: jnp.ndarray, ly: jnp.ndarray
                       ) -> Dict[str, jnp.ndarray]:
    """Walk the DP back from (lx, ly) with the reference's preference
    order (edit_dist.cpp:66-86: insert if d[i][j-1] < d[i][j], else delete
    if d[i-1][j] < d[i][j], else keep). Returns
      ins_count (B, Lx+1): insertions into gap g (after g source tokens),
      y_is_ins (B, Ly) bool: y tokens produced by insertions,
      x_deleted (B, Lx) bool: x tokens on delete ops."""
    b, lx1, ly1 = d.shape
    max_steps = (lx1 - 1) + (ly1 - 1)
    bi = jnp.arange(b)

    def step(s, _):
        i, j = s["i"], s["j"]
        active = (i > 0) | (j > 0)
        dij = d[bi, i, j]
        dij1 = d[bi, i, jnp.maximum(j - 1, 0)]
        di1j = d[bi, jnp.maximum(i - 1, 0), j]
        ins = active & (j > 0) & (dij1 < dij)
        dele = active & ~ins & (i > 0) & (di1j < dij)
        keep = active & ~ins & ~dele
        jm = jnp.maximum(j - 1, 0)
        s = dict(
            i=i - (dele | keep).astype(jnp.int32),
            j=j - (ins | keep).astype(jnp.int32),
            ins_count=s["ins_count"].at[bi, i].add(ins.astype(jnp.int32)),
            y_is_ins=s["y_is_ins"].at[bi, jm].max(ins),
            x_deleted=s["x_deleted"].at[bi, jnp.maximum(i - 1, 0)].max(dele),
            # per-insert bookkeeping for the insertion transformer's soft
            # labels: the gap an inserted y token lands in and its
            # reverse rank within that gap's run (the backtrace walks a
            # gap's insertions right-to-left)
            y_gap=s["y_gap"].at[bi, jm].max(
                jnp.where(ins, i, -1).astype(jnp.int32)),
            y_rev_rank=s["y_rev_rank"].at[bi, jm].max(
                jnp.where(ins, s["run"], -1).astype(jnp.int32)),
            run=jnp.where(ins, s["run"] + 1, 0),
        )
        return s, None

    state = dict(i=lx.astype(jnp.int32), j=ly.astype(jnp.int32),
                 ins_count=jnp.zeros((b, lx1), jnp.int32),
                 y_is_ins=jnp.zeros((b, ly1 - 1), bool),
                 x_deleted=jnp.zeros((b, lx1 - 1), bool),
                 y_gap=jnp.full((b, ly1 - 1), -1, jnp.int32),
                 y_rev_rank=jnp.full((b, ly1 - 1), -1, jnp.int32),
                 run=jnp.zeros((b,), jnp.int32))
    out, _ = jax.lax.scan(step, state, None, length=max_steps)
    return out


def get_ins_targets(prev_tokens: jnp.ndarray, tgt_tokens: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(masked_tgt_masks, masked_tgt_tokens, mask_ins_targets) —
    levenshtein_utils._get_ins_targets parity. prev/tgt: right-padded,
    bos-led, eos-terminated; prev is a subsequence of tgt in training
    (random_delete noise), which is the regime the reference's label
    walk assumes."""
    lx = jnp.sum(prev_tokens != PAD, axis=1)
    ly = jnp.sum(tgt_tokens != PAD, axis=1)
    d = levenshtein_dp(prev_tokens, tgt_tokens)
    ops = backtrace_edit_ops(d, lx, ly)
    in_masks_tail = prev_tokens[:, 1:] != PAD
    # mask_input[1:-1]: gaps 1..Tp-1 land at output positions 0..Tp-2
    mask_ins_targets = jnp.where(in_masks_tail,
                                 ops["ins_count"][:, 1:-1], 0)
    masked_tgt_masks = ops["y_is_ins"] & (tgt_tokens != PAD)
    masked_tgt_tokens = jnp.where(masked_tgt_masks, UNK, tgt_tokens)
    return masked_tgt_masks, masked_tgt_tokens, mask_ins_targets


def get_del_targets(in_tokens: jnp.ndarray, tgt_tokens: jnp.ndarray
                    ) -> jnp.ndarray:
    """(B, T_in) 0/1 deletion labels (levenshtein_utils._get_del_targets:
    the backtrace's per-x-token keep/delete flags)."""
    lx = jnp.sum(in_tokens != PAD, axis=1)
    ly = jnp.sum(tgt_tokens != PAD, axis=1)
    d = levenshtein_dp(in_tokens, tgt_tokens)
    ops = backtrace_edit_ops(d, lx, ly)
    return jnp.where(in_tokens != PAD,
                     ops["x_deleted"].astype(jnp.int32), 0)


def get_insertion_targets(prev_tokens: jnp.ndarray, tgt_tokens: jnp.ndarray,
                          vocab_size: int, tau: Optional[float] = None
                          ) -> jnp.ndarray:
    """Soft insertion labels (B, Tp-1, V) for the insertion transformer
    (insertion_transformer.py _get_ins_targets:56-100): for gap g the
    k-th inserted word w gets weight NegativeDistanceScore(k, L_g, tau)
    (uniform 1/L when tau is None); a gap with NO insertions puts weight
    1.0 on PAD (the libnat terminal-symbol fill — "insert nothing")."""
    b, tp = prev_tokens.shape
    ty = tgt_tokens.shape[1]
    lx = jnp.sum(prev_tokens != PAD, axis=1)
    ly = jnp.sum(tgt_tokens != PAD, axis=1)
    d = levenshtein_dp(prev_tokens, tgt_tokens)
    ops = backtrace_edit_ops(d, lx, ly)
    L_of_gap = ops["ins_count"]                              # (B, Tp+1)
    gap = ops["y_gap"]                                       # (B, Ty)
    L_j = jnp.take_along_axis(L_of_gap, jnp.maximum(gap, 0), axis=1)
    k_j = L_j - 1 - ops["y_rev_rank"]
    # weight table W[L, k] (static): softmax_i(-|L/2 - i|/tau) rows
    import numpy as np
    max_l = ty + 1
    w_tab = np.zeros((max_l, max_l), np.float32)
    if tau is None or tau > 1000:
        for L in range(1, max_l):
            w_tab[L, :L] = 1.0 / L
    else:
        for L in range(1, max_l):
            # quirk-compatible with the reference's NegativeDistanceScore:
            # for tau in {0.5, 1.0, 2.0} and L <= 50 it reads the
            # PRECOMPUTED table whose row L uses center (L-1)/2
            # (compute_score_full: arange(0, L-1)/2); the on-demand
            # compute_score centers at L/2. Both paths reproduced.
            if tau in (0.5, 1.0, 2.0) and L <= 50:
                s = -np.abs((L - 1) / 2 - np.arange(L)) / tau
            else:
                s = -np.abs(L / 2 - np.arange(L)) / tau
            s = np.exp(s - s.max())
            w_tab[L, :L] = s / s.sum()
    w_tab = jnp.asarray(w_tab)
    is_ins = gap >= 0
    weight = jnp.where(is_ins,
                       w_tab[jnp.clip(L_j, 0, max_l - 1),
                             jnp.clip(k_j, 0, max_l - 1)], 0.0)
    # only gaps 1..Tp-1 carry labels (the [1:-1] slice); column = gap - 1
    col = jnp.clip(gap - 1, 0, tp - 2)
    valid = is_ins & (gap >= 1) & (gap <= tp - 1)
    out = jnp.zeros((b, tp - 1, vocab_size), jnp.float32)
    bi = jnp.arange(b)[:, None].repeat(ty, 1)
    out = out.at[bi, jnp.where(valid, col, 0),
                 jnp.where(valid, tgt_tokens, 0)].add(
        jnp.where(valid, weight, 0.0))
    # empty in-sentence gaps -> all mass on PAD ("insert nothing")
    g_idx = jnp.arange(1, tp)[None, :]
    empty = (L_of_gap[:, 1:tp] == 0) & (g_idx < lx[:, None])
    out = out.at[:, :, PAD].add(empty.astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# edit application (decode-time; levenshtein_utils._apply_*)
# ---------------------------------------------------------------------------

def _compact(tokens: jnp.ndarray, keep: jnp.ndarray,
             values: Optional[jnp.ndarray] = None, fill=0.0):
    """Left-compact kept tokens preserving order (the gather-sort in
    _apply_del_words:215-222); dropped slots -> PAD (values -> fill)."""
    t = tokens.shape[1]
    key = jnp.where(keep, jnp.arange(t)[None, :], t + jnp.arange(t)[None, :])
    order = jnp.argsort(key, axis=1)
    out = jnp.take_along_axis(tokens, order, axis=1)
    n = jnp.sum(keep, axis=1, keepdims=True)
    in_range = jnp.arange(t)[None, :] < n
    out = jnp.where(in_range, out, PAD)
    if values is None:
        return out, None
    vals = jnp.take_along_axis(values, order, axis=1)
    return out, jnp.where(in_range, vals, fill)


def apply_del_words(tokens: jnp.ndarray, scores: jnp.ndarray,
                    del_pred: jnp.ndarray):
    """_apply_del_words parity: never delete bos/eos; compact survivors."""
    special = (tokens == BOS) | (tokens == EOS)
    del_pred = jnp.where(tokens == PAD, True, del_pred)
    del_pred = jnp.where(special, False, del_pred)
    return _compact(tokens, ~del_pred, scores, 0.0)


def apply_ins_masks(tokens: jnp.ndarray, scores: jnp.ndarray,
                    mask_ins_pred: jnp.ndarray):
    """_apply_ins_masks parity over a FIXED (B, T) buffer: insert
    ``mask_ins_pred[:, g]`` UNK placeholders after position g (pred given
    for gaps between consecutive non-pad tokens, shape (B, T-1)).
    Predictions are left-to-right clipped so the result fits the buffer
    (the reference grows the tensor instead)."""
    b, t = tokens.shape
    in_masks = tokens != PAD
    in_len = jnp.sum(in_masks, axis=1)
    pred = jnp.where(in_masks[:, 1:], mask_ins_pred, 0)
    allowed = (t - in_len)[:, None]
    prefix = jnp.cumsum(pred, axis=1) - pred
    pred = jnp.clip(pred, 0, jnp.maximum(allowed - prefix, 0))
    out_len = in_len + pred.sum(axis=1)
    # destination of token g+1 = g+1 + insertions before it
    reordering = jnp.cumsum(pred + in_masks[:, 1:].astype(jnp.int32), axis=1)
    out_masks = jnp.arange(t)[None, :] < out_len[:, None]
    out_tokens = jnp.where(out_masks, UNK, PAD).astype(tokens.dtype)
    out_tokens = out_tokens.at[:, 0].set(tokens[:, 0])
    bi = jnp.arange(b)[:, None]
    # pad positions scatter out of bounds -> dropped (the reference's
    # pad->eos refill writes land on the slot eos already occupies)
    dest = jnp.where(in_masks[:, 1:], reordering, t)
    out_tokens = out_tokens.at[bi, dest].set(tokens[:, 1:], mode="drop")
    out_scores = None
    if scores is not None:
        out_scores = jnp.zeros((b, t), scores.dtype)
        out_scores = out_scores.at[:, 0].set(scores[:, 0])
        out_scores = out_scores.at[bi, dest].set(scores[:, 1:], mode="drop")
        out_scores = jnp.where(out_masks, out_scores, 0.0)
    out_tokens = jnp.where(out_masks, out_tokens, PAD)
    return out_tokens, out_scores


def apply_ins_words(tokens: jnp.ndarray, scores: jnp.ndarray,
                    word_pred: jnp.ndarray, word_scores: jnp.ndarray):
    """_apply_ins_words parity: fill UNK placeholders with predictions."""
    m = tokens == UNK
    return (jnp.where(m, word_pred, tokens),
            None if scores is None else jnp.where(m, word_scores, scores))
