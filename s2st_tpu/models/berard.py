"""Berard speech-to-text model (Berard et al. 2018, "End-to-End Automatic
Speech Translation of Audiobooks").

Parity: ``fairseq/models/speech_to_text/berard.py`` — tanh input MLP
stack, stride-s Conv2d pyramid (padding k//2), bidirectional LSTM
encoder; LSTMCell decoder with the layer-(i-1)%L state threading, hidden
states initialized from the mean-pooled encoder output, MLP (Bahdanau)
attention after the FIRST layer whose context feeds the upper layers, and
the deep output layer tanh(W [h; ctx; emb]) before the vocabulary
projection.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Params, dropout, embedding, linear, linear_init, \
    split_rngs, uniform_fan
from .lstm import _embed_init, _lstm_params, _run_lstm, lstm_cell

PAD = 1


@dataclass(frozen=True)
class BerardConfig:
    vocab_size: int = 1000
    input_feat_per_channel: int = 80
    input_layers: Tuple[int, ...] = (256, 128)
    conv_layers: Tuple[Tuple[int, int, int], ...] = ((16, 3, 2), (16, 3, 2))
    num_blstm_layers: int = 3
    lstm_size: int = 256
    decoder_embed_dim: int = 128
    decoder_num_layers: int = 2
    decoder_hidden_dim: int = 512
    attention_dim: int = 512
    output_layer_dim: int = 128
    dropout: float = 0.2
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "BerardConfig":
        return dataclasses.replace(self, **kw)

    @property
    def context_dim(self):
        return 2 * self.lstm_size


def _conv2d_init(key, cin, cout, k):
    kw, kb = jax.random.split(key)
    fan_in = cin * k * k
    return {"w": uniform_fan(kw, (k, k, cin, cout), fan_in),
            "b": uniform_fan(kb, (cout,), fan_in)}


def init_berard(key, cfg: BerardConfig) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, 64))
    enc: Params = {}
    in_f = cfg.input_feat_per_channel
    for i, out_f in enumerate(cfg.input_layers):
        enc[f"input{i}"] = linear_init(next(ks), in_f, out_f)
        in_f = out_f
    cin = 1
    lstm_in = cfg.input_layers[-1]
    for i, (cout, k, s) in enumerate(cfg.conv_layers):
        enc[f"conv{i}"] = _conv2d_init(next(ks), cin, cout, k)
        cin = cout
        lstm_in //= s
    lstm_in *= cfg.conv_layers[-1][0]
    for i in range(cfg.num_blstm_layers):
        d = lstm_in if i == 0 else 2 * cfg.lstm_size
        enc[f"l{i}"] = _lstm_params(next(ks), d, cfg.lstm_size)
        enc[f"l{i}_rev"] = _lstm_params(next(ks), d, cfg.lstm_size)

    dec: Params = {
        "embed": _embed_init(next(ks), cfg.vocab_size,
                             cfg.decoder_embed_dim),
        "attn_encoder_proj": linear_init(next(ks), cfg.context_dim,
                                         cfg.attention_dim),
        "attn_decoder_proj": linear_init(next(ks), cfg.decoder_hidden_dim,
                                         cfg.attention_dim),
        "attn_to_scores": linear_init(next(ks), cfg.attention_dim, 1),
        "deep_output": linear_init(
            next(ks),
            cfg.decoder_hidden_dim + cfg.context_dim
            + cfg.decoder_embed_dim, cfg.output_layer_dim),
        "out_proj": linear_init(next(ks), cfg.output_layer_dim,
                                cfg.vocab_size),
    }
    for i in range(cfg.decoder_num_layers):
        in_dim = (cfg.decoder_embed_dim if i == 0 else cfg.context_dim)
        dec[f"cell{i}"] = _lstm_params(next(ks), in_dim,
                                       cfg.decoder_hidden_dim)
    return {"params": {"encoder": enc, "decoder": dec}, "stats": {}}


def encode(variables: Dict[str, Params], cfg: BerardConfig,
           src_speech: jnp.ndarray, src_lens: jnp.ndarray,
           rng=None, deterministic: bool = True) -> Dict[str, Any]:
    p = variables["params"]["encoder"]
    rngs = split_rngs(rng, len(cfg.input_layers)
                      + cfg.num_blstm_layers + 2)
    x = src_speech.astype(cfg.dtype)[:, :, None, :]   # (B, T, 1, F)
    for i in range(len(cfg.input_layers)):
        x = jnp.tanh(linear(p[f"input{i}"], x))
        x = dropout(x, cfg.dropout, rngs[i], deterministic)
    # (B, T, C, F) -> conv over (T, F) with channels C
    x = x.transpose(0, 1, 3, 2)                       # (B, T, F, C)
    lens = src_lens
    for i, (cout, k, s) in enumerate(cfg.conv_layers):
        x = jax.lax.conv_general_dilated(
            x, p[f"conv{i}"]["w"].astype(x.dtype), window_strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + p[f"conv{i}"]["b"].astype(x.dtype)
        lens = jnp.floor((lens.astype(jnp.float32)
                          + 2 * (k // 2) - k) / s + 1).astype(jnp.int32)
    b, t2 = x.shape[0], x.shape[1]
    # (B, T', F', C) -> (B, T', C*F') [torch flattens (C, feat) C-major]
    x = x.transpose(0, 1, 3, 2).reshape(b, t2, -1)
    for i in range(cfg.num_blstm_layers):
        out_f, _ = _run_lstm(p[f"l{i}"], x, lens)
        out_b, _ = _run_lstm(p[f"l{i}_rev"], x, lens, reverse=True)
        x = jnp.concatenate([out_f, out_b], axis=-1)
        # nn.LSTM inter-layer dropout applies between layers only
        if i < cfg.num_blstm_layers - 1:
            x = dropout(x, cfg.dropout, rngs[len(cfg.input_layers) + i],
                        deterministic)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)
    pad_mask = jnp.arange(t2)[None, :] >= lens[:, None]
    x = jnp.where(pad_mask[:, :, None], 0.0, x)       # packed-pad zeros
    return {"encoder_out": x, "encoder_padding_mask": pad_mask,
            "out_lengths": lens}


def _mlp_attention(dec_p, hidden, enc_out, pad_mask):
    """MLPAttention (:337-375). hidden (B, H); enc_out (B, Ts, C)."""
    enc_c = linear(dec_p["attn_encoder_proj"], enc_out)     # (B, Ts, A)
    dec_c = linear(dec_p["attn_decoder_proj"], hidden)[:, None, :]
    scores = linear(dec_p["attn_to_scores"],
                    jnp.tanh(enc_c + dec_c))[:, :, 0]       # (B, Ts)
    scores = jnp.where(pad_mask, -jnp.inf, scores.astype(jnp.float32))
    w = jax.nn.softmax(scores, axis=1).astype(enc_out.dtype)
    ctx = jnp.einsum("bt,btc->bc", w, enc_out)
    return ctx, w


def decoder_step(variables, cfg: BerardConfig, tok_embed, state, enc_out,
                 pad_mask, rng=None, deterministic=True):
    """One time step (LSTMDecoder :434-520): layer i reads the state of
    layer (i-1) % L; attention fires after layer 0 and its context is the
    upper layers' input. Returns (hidden_top, ctx, new_state)."""
    p = variables["params"]["decoder"]
    rngs = split_rngs(rng, cfg.decoder_num_layers + 2)
    inp = tok_embed
    hiddens = list(state["hiddens"])
    cells = list(state["cells"])
    ctx = None
    for i in range(cfg.decoder_num_layers):
        j = (i - 1) % cfg.decoder_num_layers
        h, c = lstm_cell(p[f"cell{i}"], inp, hiddens[j], cells[j])
        h = dropout(h, cfg.dropout, rngs[i], deterministic)
        hiddens[i] = h
        cells[i] = c
        if ctx is None:
            ctx, _ = _mlp_attention(p, h, enc_out, pad_mask)
            ctx = dropout(ctx, cfg.dropout, rngs[-1], deterministic)
        inp = ctx
    return h, ctx, {"hiddens": jnp.stack(hiddens),
                    "cells": jnp.stack(cells)}


def forward(variables: Dict[str, Params], cfg: BerardConfig,
            batch: Dict[str, Any], rng=None, deterministic=True,
            train: bool = False) -> Dict[str, Any]:
    p = variables["params"]["decoder"]
    r_enc, r_emb, r_steps, r_out = (jax.random.split(rng, 4)
                                    if rng is not None else (None,) * 4)
    enc = encode(variables, cfg, batch["src_speech"],
                 batch["src_speech_lens"], rng=r_enc,
                 deterministic=deterministic)
    prev = batch.get("prev_text_tokens")
    if prev is None:
        prev = batch.get("prev_tgt_text_tokens",
                         batch.get("prev_src_text_tokens"))
    b, tt_ = prev.shape
    emb = embedding(p["embed"], prev, cfg.dtype)
    emb = dropout(emb, cfg.dropout, r_emb, deterministic)
    # reference: mean over the PADDED time axis (pad_packed_sequence
    # leaves zeros at pads, so the zeros dilute the mean — mirror exactly)
    mean_enc = jnp.mean(enc["encoder_out"], axis=1)
    state = {"hiddens": jnp.stack([mean_enc] * cfg.decoder_num_layers),
             "cells": jnp.zeros((cfg.decoder_num_layers, b,
                                 cfg.decoder_hidden_dim), cfg.dtype)}
    # mean_enc has context_dim (2*lstm); decoder hidden dim may differ —
    # the reference requires them equal (berard arch ties 2*lstm == hidden)
    step_rngs = jax.random.split(r_steps, tt_) if r_steps is not None \
        else jnp.zeros((tt_,))

    def step(carry, xs):
        e_t, r_t = xs
        h, ctx, new_state = decoder_step(
            variables, cfg, e_t, carry, enc["encoder_out"],
            enc["encoder_padding_mask"],
            rng=(r_t if r_steps is not None else None),
            deterministic=deterministic)
        return new_state, (h, ctx)

    _, (outs, ctxs) = jax.lax.scan(step, state,
                                   (emb.transpose(1, 0, 2), step_rngs))
    h_seq = outs.transpose(1, 0, 2)
    ctx_seq = ctxs.transpose(1, 0, 2)
    x = jnp.concatenate([h_seq, ctx_seq, emb], axis=-1)
    x = jnp.tanh(linear(p["deep_output"], x))
    x = dropout(x, cfg.dropout, r_out, deterministic)
    logits = linear(p["out_proj"], x)
    return {"logits": logits, "new_stats": {}}
