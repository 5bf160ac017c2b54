"""Iterative refinement decoding for non-autoregressive models.

Parity: ``fairseq/iterative_refinement_generator.py`` — steps 0..max_iter,
per-sentence adaptive termination when an iteration reproduces the previous
tokens (is_a_loop, :165-176), frozen finalized sentences, optional length
beam (regenerate_length_beam + best-mean-score selection), and the model
step functions: NAT re-predicts every non-pad position
(nonautoregressive_transformer.py forward_decoder), CMLM fills the UNK
positions then skeptically re-masks the lowest-scoring tokens while
iterations remain (cmlm_transformer.py forward_decoder +
_skeptical_unmasking).

TPU-native: the whole refinement runs as ONE ``lax.while_loop`` over a
fixed (B*, T) token buffer; terminated rows are frozen by select instead of
being removed from the batch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models import nat_transformer as nat
from ..models import transformer_text as tt

PAD, EOS, UNK, BOS = 1, 2, 3, 0


def _skeptical_unmask(tokens, scores, p):
    """Re-mask the lowest-scoring ~p fraction (cmlm_transformer.py:18-24):
    boundary = (nonpad_count - 2) * p tokens with the smallest scores go
    back to UNK (bos/eos/pad hold score 0.0 > any log-prob, never chosen).
    """
    b, t = tokens.shape
    nonpad = jnp.sum(tokens != PAD, axis=1, keepdims=True)
    boundary = ((nonpad - 2).astype(jnp.float32) * p).astype(jnp.int32)
    order = jnp.argsort(scores, axis=1)          # ascending: worst first
    j = jnp.arange(t)[None, :]
    remask_sorted = j < boundary                 # first `boundary` ranks
    remask = jnp.zeros_like(remask_sorted).at[
        jnp.arange(b)[:, None], order].set(remask_sorted)
    new_tokens = jnp.where(remask, UNK, tokens)
    new_scores = jnp.where(remask, 0.0, scores)
    return new_tokens, new_scores


def refine_generate(variables: Dict[str, Any], src_tokens: jnp.ndarray,
                    *, cfg, kind: str = "cmlm",
                    max_iter: int = 10, adaptive: bool = True,
                    length_beam: int = 1, max_len: int = 128,
                    eos_penalty: float = 0.0, max_ratio: float = 2.0
                    ) -> Dict[str, jnp.ndarray]:
    """``variables`` may be a list of param trees for a Levenshtein
    ensemble (fairseq EnsembleLevT, nat/nonautoregressive_ensembles.py:64
    — the only NAT family the reference ensembles; others raise there
    too)."""
    if isinstance(variables, (list, tuple)) and len(variables) > 1 \
            and kind != "levenshtein":
        raise NotImplementedError(
            "ensemble refinement decoding is only defined for the "
            "Levenshtein transformer (EnsembleLevT)")
    if kind == "levenshtein":
        return _levenshtein_generate(
            variables, src_tokens, cfg=cfg, max_iter=max_iter,
            adaptive=adaptive, max_len=max_len, eos_penalty=eos_penalty,
            max_ratio=max_ratio)
    if isinstance(variables, (list, tuple)):
        variables = variables[0]
    if kind == "insertion":
        return _insertion_generate(
            variables, src_tokens, cfg=cfg, max_iter=max_iter,
            adaptive=adaptive, max_len=max_len, eos_penalty=eos_penalty)
    return _nat_generate(variables, src_tokens, cfg=cfg, kind=kind,
                         max_iter=max_iter, adaptive=adaptive,
                         length_beam=length_beam, max_len=max_len)


def _nat_generate(variables: Dict[str, Any], src_tokens: jnp.ndarray,
                  *, cfg: nat.NATConfig, kind: str = "cmlm",
                  max_iter: int = 10, adaptive: bool = True,
                  length_beam: int = 1, max_len: int = 128
                  ) -> Dict[str, jnp.ndarray]:
    """Returns tokens (B, beam, T), scores (B, beam, T) fp32, steps
    (B, beam). Selection of the best beam (mean positional score over
    non-pad) is left to the caller (finalized_hypos parity)."""
    enc = tt.encode(variables, cfg.base, src_tokens, deterministic=True)
    src_lens = jnp.sum(src_tokens != PAD, axis=1)
    length_logits = nat.forward_length(variables, cfg, enc["encoder_out"],
                                       enc["encoder_padding_mask"])
    length_tgt = nat.predict_length(cfg, length_logits, src_lens)

    b = src_tokens.shape[0]
    k = length_beam
    if k > 1:
        # regenerate_length_beam: lengths len + delta - k//2, delta 0..k-1
        deltas = jnp.arange(k) - k // 2
        length_tgt = (length_tgt[:, None] + deltas[None, :]).reshape(-1)
        rep = lambda x: jnp.repeat(x, k, axis=0)
        enc_out = rep(enc["encoder_out"])
        enc_pad = rep(enc["encoder_padding_mask"])
        src_rep = rep(src_tokens)
    else:
        enc_out, enc_pad, src_rep = (enc["encoder_out"],
                                     enc["encoder_padding_mask"], src_tokens)
    tokens0 = nat.initialize_output_tokens(cfg, length_tgt, max_len)
    scores0 = jnp.zeros(tokens0.shape, jnp.float32)

    def decode_step(tokens, scores, step):
        logits = nat.nat_decode(
            variables, cfg, tokens, enc_out, enc_pad, deterministic=True,
            src_tokens=(src_rep if (cfg.src_embedding_copy and kind == "nat")
                        else None))
        if kind == "nacrf":
            # NAT-CRF decode (nat_crf_transformer.py:88-104): Viterbi over
            # the emission beam instead of per-position argmax
            from ..ops.crf import crf_viterbi
            mask = tokens != PAD
            v_scores, v_tokens = crf_viterbi(
                variables["params"]["crf"], logits, mask,
                cfg.crf_beam_approx)
            return (jnp.where(mask, v_tokens.astype(jnp.int32), tokens),
                    jnp.where(mask, v_scores, scores))
        lp = jax.nn.log_softmax(logits, axis=-1)
        best = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        best_score = jnp.max(lp, axis=-1)
        if kind == "cmlm":
            mask = tokens == UNK
        else:                      # vanilla NAT: every non-pad position
            mask = tokens != PAD
        new_tokens = jnp.where(mask, best, tokens)
        new_scores = jnp.where(mask, best_score, scores)
        if kind == "cmlm":
            # skeptical re-mask while iterations remain (step+1 < max_step)
            p = 1.0 - (step.astype(jnp.float32) + 1.0) / (max_iter + 1.0)
            rt, rs = _skeptical_unmask(new_tokens, new_scores, p)
            more = (step + 1) < (max_iter + 1)
            new_tokens = jnp.where(more, rt, new_tokens)
            new_scores = jnp.where(more, rs, new_scores)
        return new_tokens, new_scores

    def cond(s):
        return (s["step"] <= max_iter) & ~s["terminated"].all()

    def body(s):
        new_tokens, new_scores = decode_step(s["tokens"], s["scores"],
                                             s["step"])
        if adaptive:
            now_term = (new_tokens == s["tokens"]).all(axis=1)
        else:
            now_term = jnp.zeros((new_tokens.shape[0],), bool)
        now_term = now_term | (s["step"] >= max_iter)
        freeze = s["terminated"][:, None]
        tokens = jnp.where(freeze, s["tokens"], new_tokens)
        scores = jnp.where(freeze, s["scores"], new_scores)
        steps = jnp.where(s["terminated"], s["steps"], s["step"])
        return dict(step=s["step"] + 1, tokens=tokens, scores=scores,
                    terminated=s["terminated"] | now_term, steps=steps)

    state = dict(step=jnp.zeros((), jnp.int32), tokens=tokens0,
                 scores=scores0,
                 terminated=jnp.zeros((tokens0.shape[0],), bool),
                 steps=jnp.zeros((tokens0.shape[0],), jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    t = tokens0.shape[1]
    return {"tokens": out["tokens"].reshape(b, k, t),
            "scores": out["scores"].reshape(b, k, t),
            "steps": out["steps"].reshape(b, k)}


def _levenshtein_generate(variables: Dict[str, Any],
                          src_tokens: jnp.ndarray, *, cfg,
                          max_iter: int = 10, adaptive: bool = True,
                          max_len: int = 128, eos_penalty: float = 0.0,
                          max_ratio: float = 2.0
                          ) -> Dict[str, jnp.ndarray]:
    """LevenshteinTransformerModel.forward_decoder (:140-247) as one
    while_loop: delete words -> insert placeholders (eos-penalized,
    max_ratio-capped) -> fill words; per-row gates (can_del / can_ins /
    can_fill) replace the reference's _skip/_fill row compaction.

    ``variables`` may be a list of param trees: each of the three head
    log-softmaxes is then ensemble-averaged in probability space
    (logsumexp - log N) per pipeline stage, exactly EnsembleLevT
    (nat/nonautoregressive_ensembles.py:142-157,187-199,220-233)."""
    from ..models import levenshtein_transformer as lev

    models = list(variables) if isinstance(variables, (list, tuple)) \
        else [variables]
    encs = [tt.encode(v, cfg.base, src_tokens, deterministic=True)
            for v in models]
    enc = encs[0]
    eo, ep = enc["encoder_out"], enc["encoder_padding_mask"]

    def _avg_lp(head_fn):
        """Average a head's log-probs over the ensemble (stage-wise, because
        later stages depend on earlier averaged predictions)."""
        lps = [jax.nn.log_softmax(
            head_fn(v, e["encoder_out"], e["encoder_padding_mask"]),
            axis=-1) for v, e in zip(models, encs)]
        if len(lps) == 1:
            return lps[0]
        return (jax.scipy.special.logsumexp(jnp.stack(lps, 0), axis=0)
                - jnp.log(float(len(lps))))

    b = src_tokens.shape[0]
    src_lens = jnp.sum(src_tokens != PAD, axis=1)
    max_lens = jnp.clip((src_lens.astype(jnp.float32)
                         * max_ratio).astype(jnp.int32), 10, max_len - 1)

    tokens0 = jnp.full((b, max_len), PAD, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(BOS).at[:, 1].set(EOS)
    scores0 = jnp.zeros((b, max_len), jnp.float32)

    from ..ops.edit_ops import (apply_del_words, apply_ins_masks,
                                apply_ins_words)

    def step_fn(tokens, scores):
        # 1) delete words (rows with > 2 real tokens)
        can_del = jnp.sum(tokens != PAD, axis=1) > 2
        del_lp = _avg_lp(lambda v, e, p: lev.forward_word_del(
            v, cfg, tokens, e, p, deterministic=True))
        del_pred = jnp.argmax(del_lp, axis=-1) == 1
        dt, ds = apply_del_words(tokens, scores, del_pred)
        tokens = jnp.where(can_del[:, None], dt, tokens)
        scores = jnp.where(can_del[:, None], ds, scores)
        # 2) insert placeholders (rows under their length cap)
        can_ins = jnp.sum(tokens != PAD, axis=1) < max_lens
        ins_lp = _avg_lp(lambda v, e, p: lev.forward_mask_ins(
            v, cfg, tokens, e, p, deterministic=True))
        if eos_penalty > 0.0:
            # fairseq penalizes per model BEFORE the logsumexp average
            # (nonautoregressive_ensembles.py:192-194) — a uniform shift of
            # bin 0 across models, so penalize-after-average is identical
            ins_lp = ins_lp.at[:, :, 0].add(-eos_penalty)
        ins_pred = jnp.argmax(ins_lp, axis=-1).astype(jnp.int32)
        ins_pred = jnp.minimum(ins_pred, max_lens[:, None])
        it, isc = apply_ins_masks(tokens, scores, ins_pred)
        tokens = jnp.where(can_ins[:, None], it, tokens)
        scores = jnp.where(can_ins[:, None], isc, scores)
        # 3) fill words (rows with placeholders)
        can_fill = jnp.any(tokens == UNK, axis=1)
        word_lp = _avg_lp(lambda v, e, p: lev.forward_word_ins(
            v, cfg, tokens, e, p, deterministic=True))
        w_score = jnp.max(word_lp, axis=-1)
        w_pred = jnp.argmax(word_lp, axis=-1).astype(jnp.int32)
        wt, ws = apply_ins_words(tokens, scores, w_pred, w_score)
        tokens = jnp.where(can_fill[:, None], wt, tokens)
        scores = jnp.where(can_fill[:, None], ws, scores)
        return tokens, scores

    def cond(s):
        return (s["step"] <= max_iter) & ~s["terminated"].all()

    def body(s):
        new_tokens, new_scores = step_fn(s["tokens"], s["scores"])
        if adaptive:
            now_term = (new_tokens == s["tokens"]).all(axis=1)
        else:
            now_term = jnp.zeros((b,), bool)
        now_term = now_term | (s["step"] >= max_iter)
        freeze = s["terminated"][:, None]
        return dict(step=s["step"] + 1,
                    tokens=jnp.where(freeze, s["tokens"], new_tokens),
                    scores=jnp.where(freeze, s["scores"], new_scores),
                    terminated=s["terminated"] | now_term,
                    steps=jnp.where(s["terminated"], s["steps"], s["step"]))

    state = dict(step=jnp.zeros((), jnp.int32), tokens=tokens0,
                 scores=scores0, terminated=jnp.zeros((b,), bool),
                 steps=jnp.zeros((b,), jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    return {"tokens": out["tokens"][:, None, :],
            "scores": out["scores"][:, None, :],
            "steps": out["steps"][:, None]}


def _insertion_generate(variables: Dict[str, Any],
                        src_tokens: jnp.ndarray, *, cfg,
                        max_iter: int = 10, adaptive: bool = True,
                        max_len: int = 128, eos_penalty: float = 0.0
                        ) -> Dict[str, jnp.ndarray]:
    """InsertionTransformerModel.forward_decoder (:178-208): one predicted
    word per gap per iteration (PAD = no insert, eos-penalizable),
    coordinate-sort merge; init = [bos, eos]."""
    from ..models import insertion_transformer as ins

    enc = tt.encode(variables, cfg.base, src_tokens, deterministic=True)
    eo, ep = enc["encoder_out"], enc["encoder_padding_mask"]
    b = src_tokens.shape[0]
    tokens0 = jnp.full((b, max_len), PAD, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(BOS).at[:, 1].set(EOS)
    scores0 = jnp.zeros((b, max_len), jnp.float32)

    def step_fn(tokens, scores):
        lp = jax.nn.log_softmax(ins.forward_word_ins(
            variables, cfg, tokens, eo, ep, deterministic=True), axis=-1)
        if eos_penalty > 0.0:
            lp = lp.at[:, :, PAD].add(-eos_penalty)
        w_score = jnp.max(lp, axis=-1)
        w_pred = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        return ins.apply_ins_words_gapwise(tokens, scores, w_pred, w_score)

    def cond(s):
        return (s["step"] <= max_iter) & ~s["terminated"].all()

    def body(s):
        new_tokens, new_scores = step_fn(s["tokens"], s["scores"])
        if adaptive:
            now_term = (new_tokens == s["tokens"]).all(axis=1)
        else:
            now_term = jnp.zeros((b,), bool)
        now_term = now_term | (s["step"] >= max_iter)
        freeze = s["terminated"][:, None]
        return dict(step=s["step"] + 1,
                    tokens=jnp.where(freeze, s["tokens"], new_tokens),
                    scores=jnp.where(freeze, s["scores"], new_scores),
                    terminated=s["terminated"] | now_term,
                    steps=jnp.where(s["terminated"], s["steps"], s["step"]))

    state = dict(step=jnp.zeros((), jnp.int32), tokens=tokens0,
                 scores=scores0, terminated=jnp.zeros((b,), bool),
                 steps=jnp.zeros((b,), jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    return {"tokens": out["tokens"][:, None, :],
            "scores": out["scores"][:, None, :],
            "steps": out["steps"][:, None]}


def pick_best_beam(tokens, scores):
    """(B, K) selection by mean positional score over non-pad
    (finalized_hypos score + generate.py best-of-beam)."""
    keep = tokens != PAD
    mean = jnp.sum(jnp.where(keep, scores, 0.0), axis=-1) \
        / jnp.maximum(jnp.sum(keep, axis=-1), 1)
    best = jnp.argmax(mean, axis=-1)
    bi = jnp.arange(tokens.shape[0])
    return tokens[bi, best], mean[bi, best], best
