"""LSTM encoder-decoder (the fairseq `lstm` model family).

Parity: ``fairseq/models/lstm.py`` — packed-sequence (bi)LSTM encoder
(final states = each sequence's last real step; padded outputs filled with
the padding index value, :307-311), Luong-style AttentionLayer
(input_proj dot scores -> softmax over source -> tanh(output_proj(cat)),
:347-380), and the input-feeding LSTMCell decoder (:469-607) with
encoder-state initialization, optional hidden/cell projections, optional
additional_fc and tied/fc_out output layer. Parameter layout mirrors the
torch naming (w_ih/w_hh 4H gate blocks in i,f,g,o order) so fairseq
checkpoints import directly.

TPU-native: every recurrence is a ``lax.scan``; variable lengths are
handled by carrying state updates under a step-validity mask (the packed-
sequence equivalent); the reverse direction pre-reverses each sample's
valid region. The beam-search step function plugs into the generic jitted
beam via its (tokens, step, cache) -> (lprobs, cache) contract.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Params, dropout, embedding

PAD, EOS = 1, 2


@dataclass(frozen=True)
class LSTMConfig:
    src_vocab_size: int = 1000
    tgt_vocab_size: int = 1000
    encoder_embed_dim: int = 512
    encoder_hidden_size: int = 512
    encoder_layers: int = 1
    encoder_bidirectional: bool = False
    encoder_dropout_in: float = 0.1
    encoder_dropout_out: float = 0.1
    decoder_embed_dim: int = 512
    decoder_hidden_size: int = 512
    decoder_layers: int = 1
    decoder_out_embed_dim: int = 512
    decoder_attention: bool = True
    decoder_dropout_in: float = 0.1
    decoder_dropout_out: float = 0.1
    share_decoder_input_output_embed: bool = False
    share_all_embeddings: bool = False
    residuals: bool = False             # lstm_lm --residuals
    is_lm: bool = False                 # decoder-only (lstm_lm.py)
    max_source_positions: int = 1024
    max_target_positions: int = 1024
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "LSTMConfig":
        return dataclasses.replace(self, **kw)

    @property
    def encoder_output_units(self):
        return self.encoder_hidden_size * (2 if self.encoder_bidirectional
                                           else 1)


def _u(key, shape):
    return jax.random.uniform(key, shape, minval=-0.1, maxval=0.1)


def _lstm_params(key, in_dim: int, hidden: int) -> Params:
    ks = jax.random.split(key, 4)
    return {"w_ih": _u(ks[0], (4 * hidden, in_dim)),
            "w_hh": _u(ks[1], (4 * hidden, hidden)),
            "b_ih": _u(ks[2], (4 * hidden,)),
            "b_hh": _u(ks[3], (4 * hidden,))}


def _embed_init(key, n, dim):
    w = _u(key, (n, dim)).at[PAD].set(0.0)
    return {"w": w}


def _lin_init(key, in_dim, out_dim, bias=True):
    ks = jax.random.split(key)
    p = {"w": _u(ks[0], (in_dim, out_dim))}
    if bias:
        p["b"] = _u(ks[1], (out_dim,))
    return p


def init_lstm(key, cfg: LSTMConfig) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, 64))
    enc: Params = {"embed": _embed_init(next(ks), cfg.src_vocab_size,
                                        cfg.encoder_embed_dim)}
    for layer in range(cfg.encoder_layers):
        in_dim = cfg.encoder_embed_dim if layer == 0 else \
            cfg.encoder_output_units
        enc[f"l{layer}"] = _lstm_params(next(ks), in_dim,
                                        cfg.encoder_hidden_size)
        if cfg.encoder_bidirectional:
            enc[f"l{layer}_rev"] = _lstm_params(next(ks), in_dim,
                                                cfg.encoder_hidden_size)
    dec: Params = {}
    if not cfg.share_all_embeddings:
        dec["embed"] = _embed_init(next(ks), cfg.tgt_vocab_size,
                                   cfg.decoder_embed_dim)
    h = cfg.decoder_hidden_size
    for layer in range(cfg.decoder_layers):
        in_dim = (h + cfg.decoder_embed_dim) if layer == 0 else h
        dec[f"cell{layer}"] = _lstm_params(next(ks), in_dim, h)
    if cfg.encoder_output_units != h:
        dec["enc_hidden_proj"] = _lin_init(next(ks),
                                           cfg.encoder_output_units, h)
        dec["enc_cell_proj"] = _lin_init(next(ks),
                                         cfg.encoder_output_units, h)
    if cfg.decoder_attention:
        dec["attn_input_proj"] = _lin_init(next(ks), h,
                                           cfg.encoder_output_units,
                                           bias=False)
        dec["attn_output_proj"] = _lin_init(
            next(ks), h + cfg.encoder_output_units, h, bias=False)
    if h != cfg.decoder_out_embed_dim:
        dec["additional_fc"] = _lin_init(next(ks), h,
                                         cfg.decoder_out_embed_dim)
    if not (cfg.share_decoder_input_output_embed or cfg.share_all_embeddings):
        dec["fc_out"] = _lin_init(next(ks), cfg.decoder_out_embed_dim,
                                  cfg.tgt_vocab_size)
    return {"params": {"encoder": enc, "decoder": dec}, "stats": {}}


def init_lstm_lm(key, cfg: LSTMConfig) -> Dict[str, Params]:
    """Decoder-only LM (fairseq/models/lstm_lm.py: LSTMDecoder with
    attention=False, encoder_output_units=0 — no input feeding, zero
    initial states)."""
    ks = iter(jax.random.split(key, 64))
    h = cfg.decoder_hidden_size
    dec: Params = {"embed": _embed_init(next(ks), cfg.tgt_vocab_size,
                                        cfg.decoder_embed_dim)}
    for layer in range(cfg.decoder_layers):
        in_dim = cfg.decoder_embed_dim if layer == 0 else h
        dec[f"cell{layer}"] = _lstm_params(next(ks), in_dim, h)
    if h != cfg.decoder_out_embed_dim:
        dec["additional_fc"] = _lin_init(next(ks), h,
                                         cfg.decoder_out_embed_dim)
    if not cfg.share_decoder_input_output_embed:
        dec["fc_out"] = _lin_init(next(ks), cfg.decoder_out_embed_dim,
                                  cfg.tgt_vocab_size)
    return {"params": {"decoder": dec}, "stats": {}}


def lm_step(variables: Dict[str, Params], cfg: LSTMConfig,
            tok_embed: jnp.ndarray, state: Dict[str, jnp.ndarray],
            rng=None, deterministic: bool = True):
    """One decoder-only step (lstm.py:545-576 with input_feed None).
    Residuals add the SAME layer's previous-step hidden to the dropped
    output (the reference reads prev_hiddens[i] before overwriting it)."""
    p = variables["params"]["decoder"]
    rngs = jax.random.split(rng, cfg.decoder_layers + 1) \
        if rng is not None else [None] * (cfg.decoder_layers + 1)
    inp = tok_embed
    hiddens, cells = [], []
    for i in range(cfg.decoder_layers):
        h, c = lstm_cell(p[f"cell{i}"], inp, state["hiddens"][i],
                         state["cells"][i])
        inp = dropout(h, cfg.decoder_dropout_out, rngs[i], deterministic)
        if cfg.residuals:
            inp = inp + state["hiddens"][i]
        hiddens.append(h)
        cells.append(c)
    out = dropout(h, cfg.decoder_dropout_out, rngs[-1], deterministic)
    return out, {"hiddens": jnp.stack(hiddens), "cells": jnp.stack(cells)}


def forward_lm(variables: Dict[str, Params], cfg: LSTMConfig,
               batch: Dict[str, Any], rng: Optional[jax.Array] = None,
               deterministic: bool = True, train: bool = False
               ) -> Dict[str, Any]:
    """LM forward over batch["src_tokens"] (the shifted input) ->
    {"logits": (B, T, V)}."""
    tokens = batch["src_tokens"]
    b, t = tokens.shape
    r_in, r_steps, r_out = (jax.random.split(rng, 3)
                            if rng is not None else (None,) * 3)
    p = variables["params"]["decoder"]
    x = embedding(p["embed"], tokens, cfg.dtype)
    x = dropout(x, cfg.decoder_dropout_in, r_in, deterministic)
    state = {"hiddens": jnp.zeros((cfg.decoder_layers, b,
                                   cfg.decoder_hidden_size), cfg.dtype),
             "cells": jnp.zeros((cfg.decoder_layers, b,
                                 cfg.decoder_hidden_size), cfg.dtype)}
    step_rngs = jax.random.split(r_steps, t) if r_steps is not None \
        else jnp.zeros((t,))

    def step(carry, xs):
        x_t, r_t = xs
        out, new_state = lm_step(variables, cfg, x_t, carry,
                                 rng=(r_t if r_steps is not None else None),
                                 deterministic=deterministic)
        return new_state, out

    _, outs = jax.lax.scan(step, state, (x.transpose(1, 0, 2), step_rngs))
    feats = outs.transpose(1, 0, 2)
    logits = output_layer(variables, cfg, feats, rng=r_out,
                          deterministic=deterministic)
    return {"logits": logits, "new_stats": {}}


def _lin(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def lstm_cell(p: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """torch LSTMCell: gate blocks [i, f, g, o] of the 4H axis."""
    gates = jnp.dot(x, p["w_ih"].astype(x.dtype).T) \
        + jnp.dot(h, p["w_hh"].astype(x.dtype).T) \
        + p["b_ih"].astype(x.dtype) + p["b_hh"].astype(x.dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _run_lstm(p: Params, x: jnp.ndarray, lens: jnp.ndarray,
              reverse: bool = False):
    """One packed-LSTM direction. x (B, T, C); returns (outs (B, T, H)
    with zeros past each length, final (h, c) = state at each sample's
    last real step)."""
    b, t, _ = x.shape
    hdim = p["w_hh"].shape[1]
    if reverse:
        # reverse each sample's valid region: x'[j] = x[len-1-j]
        j = jnp.arange(t)[None, :]
        src = jnp.clip(lens[:, None] - 1 - j, 0, t - 1)
        x = jnp.take_along_axis(x, src[:, :, None], axis=1)
    h0 = jnp.zeros((b, hdim), x.dtype)
    c0 = jnp.zeros((b, hdim), x.dtype)

    def step(carry, x_t):
        h, c = carry
        xt, tt = x_t
        h2, c2 = lstm_cell(p, xt, h, c)
        valid = (tt < lens)[:, None]
        h = jnp.where(valid, h2, h)
        c = jnp.where(valid, c2, c)
        return (h, c), jnp.where(valid, h2, 0.0)

    (hf, cf), outs = jax.lax.scan(
        step, (h0, c0), (x.transpose(1, 0, 2), jnp.arange(t)))
    outs = outs.transpose(1, 0, 2)
    if reverse:
        j = jnp.arange(t)[None, :]
        src = jnp.clip(lens[:, None] - 1 - j, 0, t - 1)
        outs = jnp.take_along_axis(outs, src[:, :, None], axis=1)
        outs = jnp.where(j[:, :, None] < lens[:, None, None], outs, 0.0)
    return outs, (hf, cf)


def encode(variables: Dict[str, Params], cfg: LSTMConfig,
           src_tokens: jnp.ndarray, rng: Optional[jax.Array] = None,
           deterministic: bool = True) -> Dict[str, Any]:
    """src_tokens (B, Ts), left- OR right-padded (left-pad is converted,
    :276-283). Returns encoder_out (B, Ts, U), final hiddens/cells
    (L, B, U), padding mask (B, Ts) for the RIGHT-padded layout."""
    p = variables["params"]["encoder"]
    b, t = src_tokens.shape
    lens = jnp.sum(src_tokens != PAD, axis=1)
    # convert left padding to right padding (convert_padding_direction)
    j = jnp.arange(t)[None, :]
    n_pad = t - lens
    src_right = jnp.where(
        j < lens[:, None],
        jnp.take_along_axis(
            src_tokens, jnp.clip(j + n_pad[:, None], 0, t - 1), axis=1),
        PAD)
    has_left_pad = jnp.any(src_tokens[:, :1] == PAD)
    src = jnp.where(has_left_pad, src_right, src_tokens)

    rngs = jax.random.split(rng, cfg.encoder_layers + 2) \
        if rng is not None else [None] * (cfg.encoder_layers + 2)
    x = embedding(p["embed"], src, cfg.dtype)
    # nn.Embedding(padding_idx=PAD) zeroes the pad row's gradient
    x = jnp.where((src == PAD)[:, :, None], jax.lax.stop_gradient(x), x)
    x = dropout(x, cfg.encoder_dropout_in, rngs[0], deterministic)
    hiddens, cells = [], []
    for layer in range(cfg.encoder_layers):
        out_f, (hf, cf) = _run_lstm(p[f"l{layer}"], x, lens)
        if cfg.encoder_bidirectional:
            out_b, (hb, cb) = _run_lstm(p[f"l{layer}_rev"], x, lens,
                                        reverse=True)
            x = jnp.concatenate([out_f, out_b], axis=-1)
            hiddens.append(jnp.concatenate([hf, hb], axis=-1))
            cells.append(jnp.concatenate([cf, cb], axis=-1))
        else:
            x = out_f
            hiddens.append(hf)
            cells.append(cf)
        if layer < cfg.encoder_layers - 1:
            # nn.LSTM inter-layer dropout (p = dropout_out)
            x = dropout(x, cfg.encoder_dropout_out, rngs[1 + layer],
                        deterministic)
    x = dropout(x, cfg.encoder_dropout_out, rngs[-1], deterministic)
    pad_mask = j >= lens[:, None]
    # pad_packed_sequence(padding_value=padding_idx): padded outs = PAD*1.0
    x = jnp.where(pad_mask[:, :, None], float(PAD), x)
    return {"encoder_out": x,
            "final_hiddens": jnp.stack(hiddens),
            "final_cells": jnp.stack(cells),
            "encoder_padding_mask": pad_mask}


def _attention(dec_p: Params, hidden: jnp.ndarray, enc_out: jnp.ndarray,
               pad_mask: jnp.ndarray):
    """AttentionLayer (:356-380). hidden (B, H); enc_out (B, Ts, U)."""
    q = _lin(dec_p["attn_input_proj"], hidden)          # (B, U)
    scores = jnp.einsum("btu,bu->bt", enc_out, q)
    scores = jnp.where(pad_mask, -jnp.inf, scores.astype(jnp.float32))
    w = jax.nn.softmax(scores, axis=1).astype(enc_out.dtype)
    ctx = jnp.einsum("bt,btu->bu", w, enc_out)
    out = jnp.tanh(_lin(dec_p["attn_output_proj"],
                        jnp.concatenate([ctx, hidden], axis=-1)))
    return out, w


def _init_decoder_state(dec_p: Params, cfg: LSTMConfig, enc):
    hiddens = enc["final_hiddens"][:cfg.decoder_layers]
    cells = enc["final_cells"][:cfg.decoder_layers]
    if "enc_hidden_proj" in dec_p:
        hiddens = _lin(dec_p["enc_hidden_proj"], hiddens)
        cells = _lin(dec_p["enc_cell_proj"], cells)
    return hiddens, cells


def decoder_step(variables: Dict[str, Params], cfg: LSTMConfig,
                 tok_embed: jnp.ndarray, state: Dict[str, jnp.ndarray],
                 enc_out: jnp.ndarray, enc_pad: jnp.ndarray,
                 rng=None, deterministic: bool = True):
    """One time step: returns (out features (B, H), new state).
    state: {"hiddens" (L, B, H), "cells" (L, B, H), "input_feed" (B, H)}.
    """
    p = variables["params"]["decoder"]
    inp = jnp.concatenate([tok_embed, state["input_feed"]], axis=-1)
    hiddens, cells = [], []
    rngs = jax.random.split(rng, cfg.decoder_layers + 1) \
        if rng is not None else [None] * (cfg.decoder_layers + 1)
    for i in range(cfg.decoder_layers):
        h, c = lstm_cell(p[f"cell{i}"], inp, state["hiddens"][i],
                         state["cells"][i])
        inp = dropout(h, cfg.decoder_dropout_out, rngs[i], deterministic)
        hiddens.append(h)
        cells.append(c)
    if cfg.decoder_attention:
        out, attn_w = _attention(p, h, enc_out, enc_pad)
    else:
        out, attn_w = h, None
    # fairseq drops the step output ONCE and feeds the SAME dropped tensor
    # back as input_feed (lstm.py:569-574) — the emitted out and the
    # recurrent input must share the dropout mask
    out = dropout(out, cfg.decoder_dropout_out, rngs[-1], deterministic)
    new_state = {"hiddens": jnp.stack(hiddens), "cells": jnp.stack(cells),
                 "input_feed": out}
    return out, attn_w, new_state


def forward(variables: Dict[str, Params], cfg: LSTMConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """Teacher-forced forward -> {"logits": (B, Tt, V)}."""
    p = variables["params"]["decoder"]
    r_enc, r_in, r_steps, r_out = (jax.random.split(rng, 4)
                                   if rng is not None else (None,) * 4)
    enc = encode(variables, cfg, batch["src_tokens"], rng=r_enc,
                 deterministic=deterministic)
    prev = batch["prev_output_tokens"]
    b, tt = prev.shape
    embed_p = p["embed"] if "embed" in p else \
        variables["params"]["encoder"]["embed"]
    x = embedding(embed_p, prev, cfg.dtype)
    x = jnp.where((prev == PAD)[:, :, None], jax.lax.stop_gradient(x), x)
    x = dropout(x, cfg.decoder_dropout_in, r_in, deterministic)
    state = {"input_feed": jnp.zeros((b, cfg.decoder_hidden_size),
                                     cfg.dtype)}
    state["hiddens"], state["cells"] = _init_decoder_state(p, cfg, enc)

    step_rngs = jax.random.split(r_steps, tt) if r_steps is not None \
        else jnp.zeros((tt,))

    def step(carry, xs):
        x_t, r_t = xs
        out, _, new_state = decoder_step(
            variables, cfg, x_t, carry, enc["encoder_out"],
            enc["encoder_padding_mask"],
            rng=(r_t if r_steps is not None else None),
            deterministic=deterministic)
        return new_state, out

    _, outs = jax.lax.scan(step, state,
                           (x.transpose(1, 0, 2), step_rngs))
    feats = outs.transpose(1, 0, 2)                     # (B, Tt, H)
    logits = output_layer(variables, cfg, feats, rng=r_out,
                          deterministic=deterministic)
    return {"logits": logits, "new_stats": {}}


def output_layer(variables: Dict[str, Params], cfg: LSTMConfig,
                 feats: jnp.ndarray, rng=None, deterministic=True
                 ) -> jnp.ndarray:
    p = variables["params"]["decoder"]
    x = feats
    if "additional_fc" in p:
        x = _lin(p["additional_fc"], x)
        x = dropout(x, cfg.decoder_dropout_out, rng, deterministic)
    if "fc_out" in p:
        return _lin(p["fc_out"], x)
    embed_p = p["embed"] if "embed" in p else \
        variables["params"]["encoder"]["embed"]
    return jnp.dot(x, embed_p["w"].astype(x.dtype).T)


def make_beam_step(variables: Dict[str, Params], cfg: LSTMConfig,
                   enc_out: jnp.ndarray, enc_pad: jnp.ndarray):
    """(tokens_t (N,1), step, cache) -> (lprobs (N,V) fp32, cache) for the
    generic jitted beam search; cache leaves lead with N = B*K."""
    p = variables["params"]["decoder"]
    embed_p = p["embed"] if "embed" in p else \
        variables["params"]["encoder"]["embed"]

    def step_fn(tokens_t, step, cache):
        x = embedding(embed_p, tokens_t[:, 0], cfg.dtype)
        state = {"hiddens": cache["hiddens"].transpose(1, 0, 2),
                 "cells": cache["cells"].transpose(1, 0, 2),
                 "input_feed": cache["input_feed"]}
        out, _, new_state = decoder_step(variables, cfg, x, state,
                                         enc_out, enc_pad,
                                         deterministic=True)
        logits = output_layer(variables, cfg, out[:, None, :])[:, 0]
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cache = {"hiddens": new_state["hiddens"].transpose(1, 0, 2),
                 "cells": new_state["cells"].transpose(1, 0, 2),
                 "input_feed": new_state["input_feed"]}
        return lprobs, cache

    return step_fn


def init_beam_cache(variables: Dict[str, Params], cfg: LSTMConfig, enc,
                    beam: int) -> Dict[str, jnp.ndarray]:
    """Initial decode state tiled to B*K, cache leaves (N, L, H)."""
    p = variables["params"]["decoder"]
    hiddens, cells = _init_decoder_state(p, cfg, enc)
    rep = lambda x: jnp.repeat(x.transpose(1, 0, 2), beam, axis=0)
    b = enc["encoder_out"].shape[0]
    return {"hiddens": rep(hiddens), "cells": rep(cells),
            "input_feed": jnp.zeros((b * beam, cfg.decoder_hidden_size),
                                    cfg.dtype)}
