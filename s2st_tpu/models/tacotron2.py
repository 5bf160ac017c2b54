"""Tacotron2 TTS model (Shen et al. 2018), TPU-native.

Parity: ``fairseq/models/text_to_speech/tacotron2.py`` —
``Tacotron2Encoder`` (:26-82): padding-idx embedding -> N x (same-pad
Conv1d + BatchNorm1d + ReLU + dropout) -> packed biLSTM (hidden =
embed_dim/2 per direction, zeros past each length) -> optional speaker
concat + projection; ``Tacotron2Decoder`` (:134-271): always-dropout
Prenet, zoneout attention-LSTM, LocationAttention
(``fairseq/modules/location_attention.py``: conv over the (1|2)-channel
attention-state image, tanh MLP scores, softmax(2.0 * s)), a zoneout
LSTM stack whose every layer reads [attn_ctx; lower hidden], linear
feat/eos heads on [attn_ctx; top hidden], and a BN conv Postnet residual.

TPU design notes (not a translation):
  * the teacher-forced time loop is one ``lax.scan`` whose carry holds
    the two LSTM states, the attention weights/cumulative weights and the
    running context — XLA pipelines the per-step GEMMs onto the MXU;
  * the packed-sequence machinery collapses to length-masked scans
    (``models/lstm._run_lstm``) with zeros past each row's length;
  * zoneout draws its Bernoulli masks from the per-step scan rng.

Reference quirks preserved:
  * incremental decoding re-initializes ``attn_ctx`` EVERY step (the
    reference only carries LSTM states + attention weights in
    ``incremental_state``, :182-232 — the previous step's context is
    recomputed as the zero/avg init), so step-by-step decoding is NOT
    numerically the teacher-forced loop. ``decode_step`` mirrors this.
  * the AR speech generator collects PRE-postnet frames and applies the
    postnet once over the finished sequence (speech_generator.py:85-87);
    ``generate_features`` does the same.
  * ``ctc_proj`` is intentionally NOT built: the reference defines it
    (:176-178) but never applies it — its criterion log-softmaxes the
    80-dim POST-POSTNET features as "CTC lprobs" (tacotron2_loss.py:
    134-143 via the base ``get_normalized_probs``), which faults for any
    real vocab; a dead/broken path we do not reproduce.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import (Params, batch_norm, batch_norm_init,
                       batch_norm_stats_init, calculate_gain, conv1d,
                       conv1d_init, dropout, embedding, embedding_init,
                       linear, linear_init, split_rngs)
from ..nn.tacotron import postnet, postnet_init, prenet, prenet_init
from .lstm import _lstm_params, _run_lstm, lstm_cell

PAD = 1


@dataclass(frozen=True)
class Tacotron2Config:
    vocab_size: int = 1000
    encoder_dropout: float = 0.5
    encoder_embed_dim: int = 512
    encoder_conv_layers: int = 3
    encoder_conv_kernel_size: int = 5
    encoder_lstm_layers: int = 1
    attention_dim: int = 128
    attention_conv_dim: int = 32
    attention_conv_kernel_size: int = 15
    prenet_dropout: float = 0.5
    prenet_layers: int = 2
    prenet_dim: int = 256
    postnet_dropout: float = 0.5
    postnet_layers: int = 5
    postnet_conv_dim: int = 512
    postnet_conv_kernel_size: int = 5
    init_attn_c: str = "zero"             # "zero" | "avg"
    attention_use_cumprob: bool = True
    zoneout: float = 0.1
    decoder_lstm_layers: int = 2
    decoder_lstm_dim: int = 1024
    output_frame_dim: int = 80
    n_frames_per_step: int = 1
    num_speakers: int = 0
    speaker_embed_dim: int = 64
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "Tacotron2Config":
        return dataclasses.replace(self, **kw)

    @property
    def out_dim(self) -> int:
        return self.output_frame_dim * self.n_frames_per_step


def init_tacotron2(key, cfg: Tacotron2Config) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, 64))
    d = cfg.encoder_embed_dim
    enc: Params = {
        "embed_tokens": embedding_init(next(ks), cfg.vocab_size, d,
                                       padding_idx=PAD),
    }
    stats: Params = {}
    relu_gain = calculate_gain("relu")
    for i in range(cfg.encoder_conv_layers):
        enc[f"conv{i}"] = conv1d_init(next(ks), d, d,
                                      cfg.encoder_conv_kernel_size,
                                      init="xavier", gain=relu_gain)
        enc[f"bn{i}"] = batch_norm_init(d)
        stats[f"enc_bn{i}"] = batch_norm_stats_init(d)
    half = d // 2
    for i in range(cfg.encoder_lstm_layers):
        in_d = d if i == 0 else 2 * half
        enc[f"l{i}"] = _lstm_params(next(ks), in_d, half)
        enc[f"l{i}_rev"] = _lstm_params(next(ks), in_d, half)
    if cfg.num_speakers > 0:
        enc["embed_speaker"] = embedding_init(next(ks), cfg.num_speakers,
                                              cfg.speaker_embed_dim)
        enc["spk_emb_proj"] = linear_init(next(ks),
                                          d + cfg.speaker_embed_dim, d)

    out_dim = cfg.out_dim
    tanh_gain = calculate_gain("tanh")
    n_state_ch = 2 if cfg.attention_use_cumprob else 1
    dec: Params = {
        "prenet": prenet_init(next(ks), out_dim, cfg.prenet_layers,
                              cfg.prenet_dim),
        "attention_lstm": _lstm_params(next(ks), cfg.prenet_dim + d,
                                       cfg.decoder_lstm_dim),
        # LocationAttention (location_attention.py:27-38)
        "attn_proj_enc": linear_init(next(ks), d, cfg.attention_dim),
        "attn_proj_dec": {"w": linear_init(next(ks), cfg.decoder_lstm_dim,
                                           cfg.attention_dim)["w"]},
        "attn_proj_attn": {"w": linear_init(next(ks), cfg.attention_conv_dim,
                                            cfg.attention_dim)["w"]},
        "attn_conv": conv1d_init(next(ks), n_state_ch,
                                 cfg.attention_conv_dim,
                                 2 * cfg.attention_conv_kernel_size + 1,
                                 bias=False, init="xavier", gain=tanh_gain),
        "attn_proj_out": linear_init(next(ks), cfg.attention_dim, 1),
        "feat_proj": linear_init(next(ks), d + cfg.decoder_lstm_dim, out_dim),
        "eos_proj": linear_init(next(ks), d + cfg.decoder_lstm_dim, 1),
    }
    for i in range(cfg.decoder_lstm_layers):
        dec[f"lstm{i}"] = _lstm_params(next(ks), d + cfg.decoder_lstm_dim,
                                       cfg.decoder_lstm_dim)
    dec["postnet"], stats["postnet"] = postnet_init(
        next(ks), out_dim, cfg.postnet_conv_dim,
        cfg.postnet_conv_kernel_size, cfg.postnet_layers)
    return {"params": {"encoder": enc, "decoder": dec}, "stats": stats}


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode(variables: Dict[str, Params], cfg: Tacotron2Config,
           src_tokens: jnp.ndarray, src_lens: jnp.ndarray,
           speaker: Optional[jnp.ndarray] = None, rng=None,
           deterministic: bool = True, train: bool = False
           ) -> Dict[str, Any]:
    """tacotron2.py:60-82. BN stats are computed over ALL positions
    (padding included), like torch BatchNorm1d on the padded batch."""
    p = variables["params"]["encoder"]
    stats = variables["stats"]
    rngs = split_rngs(rng, cfg.encoder_conv_layers)
    x = embedding(p["embed_tokens"], src_tokens, cfg.dtype)
    new_stats: Dict[str, Any] = {}
    pad = (cfg.encoder_conv_kernel_size - 1) // 2
    for i in range(cfg.encoder_conv_layers):
        x = conv1d(p[f"conv{i}"], x, padding=pad)
        x, new_stats[f"enc_bn{i}"] = batch_norm(
            p[f"bn{i}"], stats[f"enc_bn{i}"], x, train=train)
        x = jax.nn.relu(x)
        x = dropout(x, cfg.encoder_dropout, rngs[i], deterministic)
    for i in range(cfg.encoder_lstm_layers):
        out_f, _ = _run_lstm(p[f"l{i}"], x, src_lens)
        out_b, _ = _run_lstm(p[f"l{i}_rev"], x, src_lens, reverse=True)
        x = jnp.concatenate([out_f, out_b], axis=-1)
    pad_mask = src_tokens == PAD
    if cfg.num_speakers > 0 and speaker is not None:
        emb = embedding(p["embed_speaker"], speaker, cfg.dtype)  # (B,1,S)
        emb = jnp.broadcast_to(emb, (x.shape[0], x.shape[1], emb.shape[-1]))
        x = linear(p["spk_emb_proj"], jnp.concatenate([x, emb], axis=-1))
    return {"encoder_out": x, "encoder_padding_mask": pad_mask,
            "new_stats": new_stats}


# ---------------------------------------------------------------------------
# decoder pieces
# ---------------------------------------------------------------------------

def _zoneout_cell(p: Params, x, h, c, prob: float, rng,
                  deterministic: bool):
    """LSTMCellWithZoneOut (lstm_cell_with_zoneout.py:25-37): train keeps
    each unit's OLD state w.p. ``prob``; eval interpolates."""
    h_new, c_new = lstm_cell(p, x, h, c)
    if prob <= 0.0:
        return h_new, c_new
    if deterministic or rng is None:
        return (prob * h + (1 - prob) * h_new,
                prob * c + (1 - prob) * c_new)
    kh, kc = jax.random.split(rng)
    mh = jax.random.bernoulli(kh, prob, h.shape)
    mc = jax.random.bernoulli(kc, prob, c.shape)
    return (jnp.where(mh, h, h_new), jnp.where(mc, c, c_new))


def _location_attention(p: Params, cfg: Tacotron2Config, enc_out, proj_enc,
                        pad_mask, dec_h, attn_state):
    """location_attention.py:44-74. attn_state (B, K, T)."""
    conv_in = attn_state.transpose(0, 2, 1)                  # (B, T, K)
    a = conv1d(p["attn_conv"], conv_in,
               padding=cfg.attention_conv_kernel_size)       # (B, T, C)
    a = jnp.dot(a, p["attn_proj_attn"]["w"].astype(a.dtype))
    dec_c = jnp.dot(dec_h, p["attn_proj_dec"]["w"].astype(dec_h.dtype))
    s = jnp.tanh(a + proj_enc + dec_c[:, None, :])
    s = linear(p["attn_proj_out"], s)[:, :, 0]               # (B, T)
    # -1e9 instead of the reference's -inf: batch-fill rows are ALL pad
    # (length 0), and softmax(all -inf) = NaN would poison shared-param
    # gradients even under a zero cotangent (house rule, nn/attention.py:21)
    s = jnp.where(pad_mask, -1e9, s.astype(jnp.float32))
    w = jax.nn.softmax(2.0 * s, axis=1).astype(enc_out.dtype)
    ctx = jnp.einsum("bt,btc->bc", w, enc_out)
    return ctx, w


def _init_attn_ctx(cfg: Tacotron2Config, enc_out, pad_mask):
    """tacotron2.py:208-217."""
    b = enc_out.shape[0]
    if cfg.init_attn_c == "zero":
        return jnp.zeros((b, cfg.encoder_embed_dim), enc_out.dtype)
    w = (~pad_mask).astype(enc_out.dtype)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.sum(enc_out * w[:, :, None], axis=1)


def init_decoder_state(cfg: Tacotron2Config, bsz: int, in_len: int,
                       dtype=None) -> Dict[str, jnp.ndarray]:
    """Zero LSTM/attention state (tacotron2.py:182-206)."""
    dt = dtype or cfg.dtype
    h = cfg.decoder_lstm_dim
    return {
        "alstm_h": jnp.zeros((bsz, h), dt),
        "alstm_c": jnp.zeros((bsz, h), dt),
        "lstm_h": jnp.zeros((cfg.decoder_lstm_layers, bsz, h), dt),
        "lstm_c": jnp.zeros((cfg.decoder_lstm_layers, bsz, h), dt),
        "attn_w": jnp.zeros((bsz, in_len), dt),
        "attn_w_cum": jnp.zeros((bsz, in_len), dt),
    }


def _decoder_step(p: Params, cfg: Tacotron2Config, prenet_t, state,
                  attn_ctx, enc_out, proj_enc, pad_mask, rng,
                  deterministic: bool):
    """One decoder time step (tacotron2.py:237-259). Returns
    (feat, eos, attn_w, new_state, new_ctx)."""
    rngs = split_rngs(rng, cfg.decoder_lstm_layers + 1)
    alstm_in = jnp.concatenate([attn_ctx, prenet_t], axis=1)
    alstm_h, alstm_c = _zoneout_cell(
        p["attention_lstm"], alstm_in, state["alstm_h"], state["alstm_c"],
        cfg.zoneout, rngs[0], deterministic)
    if cfg.attention_use_cumprob:
        attn_state = jnp.stack([state["attn_w"], state["attn_w_cum"]], 1)
    else:
        attn_state = state["attn_w"][:, None, :]
    ctx, w = _location_attention(p, cfg, enc_out, proj_enc, pad_mask,
                                 alstm_h, attn_state)
    attn_w_cum = state["attn_w_cum"] + w
    hs, cs = [], []
    lower = alstm_h
    for i in range(cfg.decoder_lstm_layers):
        lstm_in = jnp.concatenate([ctx, lower], axis=1)
        h_i, c_i = _zoneout_cell(p[f"lstm{i}"], lstm_in,
                                 state["lstm_h"][i], state["lstm_c"][i],
                                 cfg.zoneout, rngs[i + 1], deterministic)
        hs.append(h_i)
        cs.append(c_i)
        lower = h_i
    proj_in = jnp.concatenate([ctx, hs[-1]], axis=1)
    feat = linear(p["feat_proj"], proj_in)
    eos = linear(p["eos_proj"], proj_in)[:, 0]
    new_state = {"alstm_h": alstm_h, "alstm_c": alstm_c,
                 "lstm_h": jnp.stack(hs), "lstm_c": jnp.stack(cs),
                 "attn_w": w, "attn_w_cum": attn_w_cum}
    return feat, eos, w, new_state, ctx


# ---------------------------------------------------------------------------
# teacher-forced forward
# ---------------------------------------------------------------------------

def forward(variables: Dict[str, Params], cfg: Tacotron2Config,
            batch: Dict[str, Any], rng=None, deterministic: bool = True,
            train: bool = False) -> Dict[str, Any]:
    """Teacher-forced forward over ``prev_output_tokens`` (B, Tt, out_dim)
    with text inputs ``src_text``/``src_text_len`` (the shared S2ST/TTS
    collate's key names). Returns feat_out / post_feat_out / eos_out /
    attn (B, Ts, Tt) — the reference's (post_feat_out, eos_out, extra)
    triple (:219-271)."""
    p = variables["params"]["decoder"]
    r_enc, r_pre, r_steps, r_post = (jax.random.split(rng, 4)
                                     if rng is not None else (None,) * 4)
    enc = encode(variables, cfg, batch["src_text"], batch["src_text_len"],
                 speaker=batch.get("speaker"), rng=r_enc,
                 deterministic=deterministic, train=train)
    enc_out, pad_mask = enc["encoder_out"], enc["encoder_padding_mask"]
    prev = batch["prev_output_tokens"].astype(cfg.dtype)
    b, out_len, _ = prev.shape

    # prenet dropout is ALWAYS on (information bottleneck); deterministic
    # only when no rng is supplied (tests)
    pre = prenet(p["prenet"], prev, cfg.prenet_dropout, r_pre)
    proj_enc = linear(p["attn_proj_enc"], enc_out)
    state = init_decoder_state(cfg, b, enc_out.shape[1], enc_out.dtype)
    ctx0 = _init_attn_ctx(cfg, enc_out, pad_mask)
    step_rngs = (jax.random.split(r_steps, out_len)
                 if r_steps is not None else jnp.zeros((out_len,)))

    def step(carry, xs):
        st, ctx = carry
        pre_t, r_t = xs
        feat, eos, w, st2, ctx2 = _decoder_step(
            p, cfg, pre_t, st, ctx, enc_out, proj_enc, pad_mask,
            r_t if r_steps is not None and not deterministic else None,
            deterministic)
        return (st2, ctx2), (feat, eos, w)

    (_, _), (feats, eoss, ws) = jax.lax.scan(
        step, (state, ctx0), (pre.transpose(1, 0, 2), step_rngs))
    feat_out = feats.transpose(1, 0, 2)                      # (B, Tt, D)
    eos_out = eoss.transpose(1, 0)[:, :, None]               # (B, Tt, 1)
    attn = ws.transpose(1, 2, 0)                             # (B, Ts, Tt)

    post, post_stats = postnet(
        p["postnet"], variables["stats"]["postnet"], feat_out,
        kernel_size=cfg.postnet_conv_kernel_size,
        dropout_rate=cfg.postnet_dropout, train=train, rng=r_post)
    new_stats = dict(enc["new_stats"])
    new_stats["postnet"] = post_stats
    return {"feat_out": feat_out, "post_feat_out": feat_out + post,
            "eos_out": eos_out, "attn": attn,
            "encoder_padding_mask": pad_mask,
            "encoder_out_lengths": batch["src_text_len"],
            "new_stats": new_stats}


# ---------------------------------------------------------------------------
# AR generation (speech_generator.py:45-107 semantics)
# ---------------------------------------------------------------------------

def generate_features(variables: Dict[str, Params], cfg: Tacotron2Config,
                      src_tokens: jnp.ndarray, src_lens: jnp.ndarray,
                      max_iter: int = 600, eos_prob_threshold: float = 0.5,
                      speaker: Optional[jnp.ndarray] = None,
                      prenet_rng: Optional[jax.Array] = None
                      ) -> Dict[str, Any]:
    """Greedy AR decode: collects PRE-postnet frames, applies the postnet
    once over the whole sequence, mirrors the reference's re-initialized
    per-step attention context (see module docstring quirks)."""
    p = variables["params"]["decoder"]
    enc = encode(variables, cfg, src_tokens, src_lens, speaker=speaker,
                 deterministic=True, train=False)
    enc_out, pad_mask = enc["encoder_out"], enc["encoder_padding_mask"]
    b = enc_out.shape[0]
    proj_enc = linear(p["attn_proj_enc"], enc_out)
    ctx0 = _init_attn_ctx(cfg, enc_out, pad_mask)
    state0 = init_decoder_state(cfg, b, enc_out.shape[1], enc_out.dtype)
    prev0 = jnp.zeros((b, cfg.out_dim), enc_out.dtype)
    pre_rngs = (jax.random.split(prenet_rng, max_iter)
                if prenet_rng is not None else jnp.zeros((max_iter,)))

    def step(carry, r_t):
        st, prev, finished, out_len, t = carry
        pre_t = prenet(p["prenet"], prev, cfg.prenet_dropout,
                       r_t if prenet_rng is not None else None)
        # quirk: incremental decode feeds the INIT context each step
        feat, eos, w, st2, _ = _decoder_step(
            p, cfg, pre_t, st, ctx0, enc_out, proj_enc, pad_mask,
            None, True)
        eos_prob = jax.nn.sigmoid(eos.astype(jnp.float32))
        cur_fin = eos_prob > eos_prob_threshold
        out_len = jnp.where((~finished) & cur_fin, t + 1, out_len)
        return ((st2, feat, finished | cur_fin, out_len, t + 1),
                (feat, eos_prob, w))

    carry0 = (state0, prev0, jnp.zeros((b,), bool),
              jnp.full((b,), max_iter, jnp.int32), jnp.int32(0))
    (_, _, _, out_lens, _), (feats, eos_probs, ws) = jax.lax.scan(
        step, carry0, pre_rngs)
    feat = feats.transpose(1, 0, 2)                           # (B, T, D)
    post, _ = postnet(p["postnet"], variables["stats"]["postnet"], feat,
                      kernel_size=cfg.postnet_conv_kernel_size,
                      dropout_rate=cfg.postnet_dropout, train=False)
    return {"feature": feat + post, "eos_prob": eos_probs.transpose(1, 0),
            "attn": ws.transpose(1, 2, 0), "out_lens": out_lens}
