"""Beam search over the auxiliary text decoders, fully inside XLA.

Parity: ``fairseq/sequence_generator.py`` + ``fairseq/search.py:103-146``
(BeamSearch) as used by ``fairseq_cli/generate_for_s2st.py`` — decode text
from ``aux_asr_decoder`` / ``aux_st_decoder`` over their encoder taps, with
cumulative log-prob scoring and length-penalty-normalized finalization
(``sequence_generator.py`` finalize_hypos: score / (step+1)**len_penalty).

TPU-native design: the reference's per-step Python loop with dict-keyed
incremental_state and index_select reordering becomes one ``lax.while_loop``
with fixed-shape KV caches and gather-based beam reordering; alive/finished
hypothesis pools follow the standard XLA beam-search formulation. Greedy and
CTC argmax decoding (test/generator_score.py ScoreGenerator parity) are the
beam=1 / projection paths below.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import s2st_transformer as m
from ..nn.attention import cross_attn_precompute, self_attn_cache_init
from ..nn.core import embedding, layer_norm, linear
from ..nn.transformer import decoder_layer_step, sinusoidal_table

PAD, EOS, UNK = 1, 2, 3
NEG_INF = -1e9


@dataclass(frozen=True)
class BeamConfig:
    beam: int = 5
    max_len: int = 200
    min_len: int = 1            # fairseq: EOS banned while step < min_len
    len_penalty: float = 1.0
    no_repeat_ngram_size: int = 0


def _aux_step(p, cfg: m.S2STConfig, dim: int, n_layers: int, table,
              tokens_t, step, caches, cross_kvs, enc_pad):
    """One decode step of an aux text decoder. tokens_t: (N, 1) int32.
    Returns (lprobs fp32 (N, V), new caches)."""
    scale = 1.0 if cfg.no_scale_embedding else dim ** 0.5
    x = embedding(p["embed"], tokens_t, cfg.dtype) * jnp.asarray(scale, cfg.dtype)
    # incremental positions: all previous tokens are non-pad -> step+PAD+1
    x = x + table[step + PAD + 1].astype(cfg.dtype)[None, None, :]
    new_caches = []
    for i in range(n_layers):
        x, c, _ = decoder_layer_step(
            p[f"layer{i}"], x, caches[i], step, cross_kvs[i], enc_pad,
            cfg.decoder_attention_heads,
            normalize_before=cfg.decoder_normalize_before,
            activation=cfg.activation_fn)
        new_caches.append(c)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    logits = jnp.dot(x[:, 0], p["out_proj"]["w"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return lprobs, tuple(new_caches)


def _length_penalty(length, alpha):
    return length.astype(jnp.float32) ** alpha


def _ngram_ban_mask(tokens: jnp.ndarray, t, vocab: int, n: int) -> jnp.ndarray:
    """(B, K, V) additive mask banning tokens that would repeat an n-gram
    (NGramRepeatBlock parity, fairseq/ngram_repeat_block.py:39 — the CUDA
    kernel's job as pure vectorized XLA inside the decode loop).

    tokens[:, :, :t+1] is the generated prefix (position 0 = bos). A token v
    is banned at step t+1 if [tokens[t-n+2..t], v] already occurs in the
    prefix."""
    b, k, L = tokens.shape
    m = n - 1                                  # context length
    # trailing context: tokens at positions t-m+1 .. t  -> (B, K, m)
    ctx = jnp.stack([
        jnp.take(tokens, jnp.maximum(t - m + 1 + i, 0), axis=2)
        for i in range(m)], axis=-1)
    # all historical m-grams starting at j (j+m-1 <= t-1 so the banned token
    # j+m is within the prefix): match[b,k,j] = prefix[j..j+m-1] == ctx
    pos = jnp.arange(L)
    match = jnp.ones((b, k, L), bool)
    for i in range(m):
        shifted = jnp.roll(tokens, -i, axis=2)         # tokens[j+i] at col j
        match = match & (shifted == ctx[..., i:i + 1])
    valid = (pos[None, None, :] + m <= t) & (pos[None, None, :] + m >= 1)
    match = match & valid & (t + 1 >= n)
    # banned token for match at j is tokens[j+m]
    nxt = jnp.roll(tokens, -m, axis=2)                 # tokens[j+m] at col j
    if vocab <= 2048:
        # small (phone-level) vocab: one-hot contraction stays cheap
        onehot = jax.nn.one_hot(nxt, vocab, dtype=jnp.float32)  # (B,K,L,V)
        banned = jnp.einsum("bkl,bklv->bkv",
                            match.astype(jnp.float32), onehot)
    else:
        # large vocab: scatter-max of matched positions avoids the
        # (B,K,L,V) one-hot blowup
        bi = jnp.arange(b)[:, None, None]
        ki = jnp.arange(k)[None, :, None]
        banned = jnp.zeros((b, k, vocab), jnp.float32).at[
            bi, ki, nxt].max(match.astype(jnp.float32))
    return jnp.where(banned > 0, NEG_INF, 0.0)


def _gather_beams(tree, beam_idx, b, k):
    """Reorder the leading N=B*K axis of every leaf by (B, K) beam indices."""
    flat = (jnp.arange(b)[:, None] * k + beam_idx).reshape(-1)
    return jax.tree_util.tree_map(lambda x: x[flat], tree)


def beam_search_aux(variables, cfg: m.S2STConfig, which: str,
                    enc_tap: jnp.ndarray, enc_pad: jnp.ndarray,
                    bs_cfg: BeamConfig) -> Dict[str, jnp.ndarray]:
    """Beam-decode text from one aux decoder.

    which: "aux_asr_decoder" | "aux_st_decoder"; enc_tap (B, Ts, C) is the
    matching encoder middle-layer tap. Returns dict with tokens
    (B, K, max_len+1) (position 0 = EOS bos), scores (B, K) normalized,
    lengths (B, K) incl. the final EOS.

    Ensembles (EnsembleModel parity, sequence_generator.py:19): pass LISTS
    for `variables` and `enc_tap`/`enc_pad` — per-step log-probs are
    combined as log of the mean probability (logsumexp - log N).
    """
    ens_vars = variables if isinstance(variables, (list, tuple)) \
        else [variables]
    ens_taps = enc_tap if isinstance(enc_tap, (list, tuple)) else [enc_tap]
    ens_pads = enc_pad if isinstance(enc_pad, (list, tuple)) else [enc_pad]
    n_models = len(ens_vars)
    ps = [v["params"][which] for v in ens_vars]
    p = ps[0]
    dim = cfg.asr_decoder_embed_dim if which == "aux_asr_decoder" \
        else cfg.st_decoder_embed_dim
    n_layers = cfg.asr_decoder_layers if which == "aux_asr_decoder" \
        else cfg.st_decoder_layers
    vocab = p["out_proj"]["w"].shape[1]
    k = bs_cfg.beam
    max_len = bs_cfg.max_len
    b, ts, cdim = ens_taps[0].shape
    heads = cfg.decoder_attention_heads
    head_dim = dim // heads
    table = sinusoidal_table(max_len + PAD + 8, dim, PAD)

    # tile encoder state to B*K (per model)
    enc_pads_k = [jnp.repeat(ep, k, axis=0) for ep in ens_pads]
    cross_kvs_ens = []
    caches_ens = []
    for mi in range(n_models):
        tap_k = jnp.repeat(ens_taps[mi], k, axis=0)        # (B*K, Ts, C)
        cross_kvs_ens.append(tuple(
            cross_attn_precompute(ps[mi][f"layer{i}"]["cross_attn"],
                                  tap_k, heads)
            for i in range(n_layers)))
        caches_ens.append(tuple(
            self_attn_cache_init(b * k, max_len + 1, heads, head_dim,
                                 cfg.dtype) for _ in range(n_layers)))
    caches_ens = tuple(caches_ens)

    tokens0 = jnp.full((b, k, max_len + 2), PAD, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(EOS)                 # bos = eos
    alive_scores0 = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32)[None], (b, 1))
    state = dict(
        step=jnp.zeros((), jnp.int32),
        alive_tokens=tokens0,
        alive_scores=alive_scores0,                        # cumulative lprob
        caches=caches_ens,
        fin_tokens=tokens0,
        fin_scores=jnp.full((b, k), NEG_INF, jnp.float32), # normalized
        fin_lens=jnp.zeros((b, k), jnp.int32),
        fin_flags=jnp.zeros((b, k), bool),
    )

    def cond(s):
        t = s["step"]
        not_max = t < max_len
        # can any alive beam still beat the worst finished?
        best_alive = s["alive_scores"].max(axis=1) / _length_penalty(
            jnp.asarray(max_len + 1), bs_cfg.len_penalty)
        worst_fin = jnp.where(s["fin_flags"].all(axis=1),
                              s["fin_scores"].min(axis=1), NEG_INF)
        improving = jnp.any(best_alive > worst_fin)
        return not_max & improving

    def body(s):
        t = s["step"]
        last = jax.lax.dynamic_slice_in_dim(
            s["alive_tokens"].reshape(b * k, -1), t, 1, axis=1)  # (B*K,1)
        lps = []
        new_caches = []
        for mi in range(n_models):
            lp_m, c_m = _aux_step(ps[mi], cfg, dim, n_layers, table, last, t,
                                  s["caches"][mi], cross_kvs_ens[mi],
                                  enc_pads_k[mi])
            lps.append(lp_m)
            new_caches.append(c_m)
        new_caches = tuple(new_caches)
        if n_models == 1:
            lprobs = lps[0]
        else:
            # log of the mean probability (EnsembleModel parity)
            lprobs = jax.nn.logsumexp(jnp.stack(lps), axis=0) \
                - jnp.log(float(n_models))
        lprobs = lprobs.reshape(b, k, vocab)
        lprobs = lprobs.at[:, :, PAD].set(NEG_INF)  # never emit pad
        # min_len (sequence_generator.py:365): no EOS before min_len tokens
        lprobs = lprobs.at[:, :, EOS].add(
            jnp.where(t < bs_cfg.min_len, NEG_INF, 0.0))
        if bs_cfg.no_repeat_ngram_size > 0:
            lprobs = lprobs + _ngram_ban_mask(
                s["alive_tokens"], t, vocab, bs_cfg.no_repeat_ngram_size)
        cand = s["alive_scores"][:, :, None] + lprobs  # (B, K, V)

        # top 2K candidates over K*V
        flat = cand.reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(flat, 2 * k)  # (B, 2K)
        beam_idx = top_idx // vocab
        tok = top_idx % vocab

        # candidate token buffers
        cand_tokens = jnp.take_along_axis(
            s["alive_tokens"], beam_idx[:, :, None], axis=1)  # (B,2K,L)
        write = jax.nn.one_hot(t + 1, cand_tokens.shape[2],
                               dtype=jnp.int32)[None, None, :]
        cand_tokens = cand_tokens * (1 - write) + tok[:, :, None] * write

        is_eos = tok == EOS
        # ----- finished pool update (normalized scores) -----
        norm = top_scores / _length_penalty(t + 1, bs_cfg.len_penalty)
        eos_scores = jnp.where(is_eos, norm, NEG_INF)      # (B, 2K)
        all_fin_scores = jnp.concatenate([s["fin_scores"], eos_scores], 1)
        all_fin_tokens = jnp.concatenate([s["fin_tokens"], cand_tokens], 1)
        all_fin_lens = jnp.concatenate(
            [s["fin_lens"], jnp.full((b, 2 * k), t + 1, jnp.int32)], 1)
        all_fin_flags = jnp.concatenate(
            [s["fin_flags"], is_eos & (eos_scores > NEG_INF / 2)], 1)
        fin_top, fin_idx = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = jnp.take_along_axis(all_fin_tokens, fin_idx[:, :, None], 1)
        fin_lens = jnp.take_along_axis(all_fin_lens, fin_idx, 1)
        fin_flags = jnp.take_along_axis(all_fin_flags, fin_idx, 1)

        # ----- alive pool: top K non-eos -----
        alive_cand = jnp.where(is_eos, NEG_INF, top_scores)
        alive_top, alive_sel = jax.lax.top_k(alive_cand, k)  # over 2K
        sel_beam = jnp.take_along_axis(beam_idx, alive_sel, 1)   # (B,K)
        alive_tokens = jnp.take_along_axis(
            cand_tokens, alive_sel[:, :, None], axis=1)
        new_caches = _gather_beams(new_caches, sel_beam, b, k)

        return dict(step=t + 1, alive_tokens=alive_tokens,
                    alive_scores=alive_top, caches=new_caches,
                    fin_tokens=fin_tokens, fin_scores=fin_top,
                    fin_lens=fin_lens, fin_flags=fin_flags)

    s = jax.lax.while_loop(cond, body, state)

    # finalize leftover alive hypotheses with a forced EOS whose
    # log-probability IS scored (fairseq runs one extra step restricted to
    # EOS at max_len, sequence_generator.py:375)
    t = s["step"]
    last = jax.lax.dynamic_slice_in_dim(
        s["alive_tokens"].reshape(b * k, -1), t, 1, axis=1)
    final_lps = []
    for mi in range(n_models):
        lp_m, _ = _aux_step(ps[mi], cfg, dim, n_layers, table, last, t,
                            s["caches"][mi], cross_kvs_ens[mi],
                            enc_pads_k[mi])
        final_lps.append(lp_m)
    if n_models == 1:
        final_lp = final_lps[0]
    else:
        final_lp = jax.nn.logsumexp(jnp.stack(final_lps), axis=0) \
            - jnp.log(float(n_models))
    eos_lp = final_lp.reshape(b, k, vocab)[:, :, EOS]
    norm = (s["alive_scores"] + eos_lp) / _length_penalty(
        t + 1, bs_cfg.len_penalty)
    write = jax.nn.one_hot(t + 1, s["alive_tokens"].shape[2],
                           dtype=jnp.int32)[None, None, :]
    alive_tokens = (s["alive_tokens"] * (1 - write) + EOS * write)
    all_scores = jnp.concatenate([s["fin_scores"], norm], 1)
    all_tokens = jnp.concatenate([s["fin_tokens"], alive_tokens], 1)
    all_lens = jnp.concatenate(
        [s["fin_lens"], jnp.full((b, k), t + 1, jnp.int32)], 1)
    top, idx = jax.lax.top_k(all_scores, k)
    return {
        "tokens": jnp.take_along_axis(all_tokens, idx[:, :, None], 1),
        "scores": top,
        "lengths": jnp.take_along_axis(all_lens, idx, 1),
    }


def greedy_decode_aux(variables, cfg: m.S2STConfig, which: str,
                      enc_tap: jnp.ndarray, enc_pad: jnp.ndarray,
                      max_len: int = 200) -> Dict[str, jnp.ndarray]:
    """Greedy text decode (ScoreGenerator parity) == beam search with k=1."""
    out = beam_search_aux(variables, cfg, which, enc_tap, enc_pad,
                          BeamConfig(beam=1, max_len=max_len))
    return {"tokens": out["tokens"][:, 0], "lengths": out["lengths"][:, 0],
            "scores": out["scores"][:, 0]}


def ctc_argmax_decode(variables, cfg: m.S2STConfig, enc_tap0: jnp.ndarray,
                      enc_lens: jnp.ndarray) -> np.ndarray:
    """Best-path CTC decode over the CTC head (generator_score.py parity):
    argmax per frame -> collapse repeats -> drop blanks (blank=0).
    Host-side collapse (ragged output)."""
    logits = m.ctc_logits(variables, cfg, enc_tap0)
    ids = np.asarray(jnp.argmax(logits, axis=-1))        # (B, Ts)
    lens = np.asarray(enc_lens)
    out = []
    for row, n in zip(ids, lens):
        row = row[:n]
        collapsed = [int(t) for i, t in enumerate(row)
                     if t != 0 and (i == 0 or t != row[i - 1])]
        out.append(np.asarray(collapsed, np.int32))
    return out
