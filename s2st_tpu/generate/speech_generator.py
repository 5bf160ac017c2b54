"""Autoregressive spectrogram generation, fully inside one XLA program.

Parity: ``fairseq/speech_generator_for_s2st.py:36-134``
(AutoRegressiveSpeechGenerator): encoder once per batch, per-step decoder with
KV caching, sigmoid(eos) > threshold per-sample termination, postnet residual
applied over the whole sequence at the end, GCMVN denormalization,
n_frames_per_step un-packing, per-utterance waveforms via the vocoder.

TPU-native design: the reference's Python decode loop over
``incremental_state`` dicts becomes a ``lax.while_loop`` with fixed-shape
per-layer KV caches (``nn.attention.mha_self_step``) and buffer writes via
``dynamic_update_slice`` — one compile, zero host round-trips per step.
The always-on prenet dropout (Tacotron2 trick) is preserved via a per-step
folded rng.
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
from ..nn.tacotron import postnet, prenet
from ..nn.transformer import (decoder_layer_step_fused,
                              fuse_decoder_layer_params, position_at_step,
                              sinusoidal_table)


@dataclass(frozen=True)
class GenerationConfig:
    max_iter: int = 1500               # decode steps at the packed frame rate
    eos_prob_threshold: float = 0.5
    prenet_dropout_at_inference: bool = True  # reference quirk (always-on)
    collect_attn: bool = True  # accumulate the (B, T, Ts) alignment buffer
    #   (needed for --dump-attentions / plots; skipping it saves one fp32
    #   buffer rewrite per decode step on the serving path)
    kv_cache_dtype: str = "bf16"  # "int8": per-(token, head) absmax
    #   quantization halves KV-cache MEMORY (long-utterance / big-batch
    #   serving headroom). Measured on v5e it does NOT speed decoding up —
    #   XLA's single-query attention is compute-bound (106 us/call at
    #   B=64 T=150 ~ 186 GB/s, far under HBM bandwidth), and the naive
    #   dequant materializes copies (2.4x slower end-to-end); custom
    #   Pallas kernels also measured slower than XLA here (ROADMAP)


def _decode_loop(variables, cfg: m.S2STConfig, gen_cfg: GenerationConfig,
                 enc: Dict[str, Any], speaker, rng):
    """Runs the AR loop. Returns (feats (B,T,out), eos_prob (B,T),
    attn (B,T,Ts), out_lens (B,))."""
    p = variables["params"]["decoder"]
    b = enc["encoder_out"].shape[0]
    ts = enc["encoder_out"].shape[1]
    heads = cfg.decoder_attention_heads
    head_dim = cfg.decoder_embed_dim // heads
    max_iter = gen_cfg.max_iter
    table = sinusoidal_table(cfg.max_target_positions + m.PAD + 1,
                             cfg.decoder_embed_dim, m.PAD)

    # unrolled per-layer decode with fused qkv projections (done once,
    # outside the loop; see nn.transformer.fuse_decoder_layer_params).
    # Matmul weights are pre-cast to the compute dtype so the loop body
    # reads bf16 from HBM instead of casting fp32 masters every step
    # (layer-norm params stay fp32 — they are applied in fp32).
    def _precast(lp):
        return {k: (v if k.endswith("_ln") or k == "final_ln"
                    else jax.tree_util.tree_map(
                        lambda a: a.astype(cfg.dtype), v))
                for k, v in lp.items()}
    fused = tuple(_precast(fuse_decoder_layer_params(p[f"layer{i}"]))
                  for i in range(cfg.decoder_layers))
    if gen_cfg.kv_cache_dtype == "int8":
        from ..nn.attention import (cross_attn_precompute_int8,
                                    self_attn_cache_init_int8)
        cross_kv = tuple(
            cross_attn_precompute_int8(p[f"layer{i}"]["cross_attn"],
                                       enc["encoder_out"], heads)
            for i in range(cfg.decoder_layers))
        caches = tuple(
            self_attn_cache_init_int8(b, max_iter, heads, head_dim)
            for _ in range(cfg.decoder_layers))
    else:
        cross_kv = tuple(
            cross_attn_precompute(p[f"layer{i}"]["cross_attn"],
                                  enc["encoder_out"], heads)
            for i in range(cfg.decoder_layers))
        caches = tuple(
            self_attn_cache_init(b, max_iter, heads, head_dim, cfg.dtype)
            for _ in range(cfg.decoder_layers))

    enc_pad = enc["encoder_padding_mask"]
    alignment_layer = cfg.decoder_layers - 1

    prev0 = jnp.zeros((b, 1, cfg.out_dim), cfg.dtype)
    if speaker is not None and "embed_speaker" in p:
        prev0 = embedding(p["embed_speaker"], speaker.reshape(-1),
                          cfg.dtype)[:, None, :]

    state = dict(
        step=jnp.zeros((), jnp.int32),
        prev=prev0,
        caches=caches,
        finished=jnp.zeros((b,), bool),
        out_lens=jnp.full((b,), max_iter, jnp.int32),
        # accumulated in the compute dtype (the decoder emits cfg.dtype;
        # storing fp32 would only add HBM traffic), upcast after the loop
        feats=jnp.zeros((b, max_iter, cfg.out_dim), cfg.dtype),
        eos_prob=jnp.zeros((b, max_iter), jnp.float32),
        attn=jnp.zeros((b, max_iter if gen_cfg.collect_attn else 1, ts),
                       jnp.float32),
    )

    def cond(s):
        return (s["step"] < max_iter) & ~jnp.all(s["finished"])

    def body(s):
        step = s["step"]
        r = (jax.random.fold_in(rng, step)
             if gen_cfg.prenet_dropout_at_inference and rng is not None else None)
        x = prenet(p["prenet"], s["prev"], cfg.prenet_dropout, r,
                   always_dropout=r is not None)
        x = linear(p["prenet_proj"], x)
        pos = position_at_step(table, step, m.PAD, x.dtype)
        x = x + p["pos_emb_alpha"].astype(x.dtype) * pos[None, None, :]

        new_caches = []
        attn_w = None
        for i in range(cfg.decoder_layers):
            x, c, w = decoder_layer_step_fused(
                fused[i], x, s["caches"][i], step, cross_kv[i], enc_pad,
                heads, normalize_before=cfg.decoder_normalize_before,
                activation=cfg.activation_fn,
                need_attn=(gen_cfg.collect_attn and i == alignment_layer))
            new_caches.append(c)
            if w is not None:
                attn_w = jnp.mean(w, axis=1)[:, 0, :]  # (B, Ts) fp32

        if "final_ln" in p:
            x = layer_norm(p["final_ln"], x)
        feat = linear(p["feat_proj"], x)                    # (B, 1, out)
        eos_logit = linear(p["eos_proj"], x).astype(jnp.float32)[:, 0, 0]
        eos_p = jax.nn.sigmoid(eos_logit)

        cur_finished = eos_p > gen_cfg.eos_prob_threshold
        out_lens = jnp.where(~s["finished"] & cur_finished, step + 1,
                             s["out_lens"])
        return dict(
            step=step + 1,
            prev=feat,
            caches=tuple(new_caches),
            finished=s["finished"] | cur_finished,
            out_lens=out_lens,
            feats=jax.lax.dynamic_update_slice(
                s["feats"], feat.astype(s["feats"].dtype), (0, step, 0)),
            eos_prob=s["eos_prob"].at[:, step].set(eos_p),
            attn=(jax.lax.dynamic_update_slice(
                s["attn"], attn_w[:, None, :], (0, step, 0))
                if gen_cfg.collect_attn else s["attn"]),
        )

    final = jax.lax.while_loop(cond, body, state)
    return (final["feats"].astype(jnp.float32), final["eos_prob"],
            final["attn"], final["out_lens"])


def generate_features(variables, cfg: m.S2STConfig, gen_cfg: GenerationConfig,
                      src_speech, src_speech_lens, speaker=None, rng=None,
                      gcmvn_mean=None, gcmvn_std=None):
    """Jittable end-to-end: fbank -> encoder -> AR decode -> postnet ->
    gcmvn-denorm -> unpacked raw mel frames.

    Returns dict: feats (B, max_iter*r, raw_dim) fp32 denormalized,
    raw_out_lens (B,), eos_prob (B, max_iter*r), attn (B, max_iter, Ts),
    enc_lens (B,)."""
    enc = m.encode(variables, cfg, src_speech, src_speech_lens,
                   speaker=speaker, rng=None, deterministic=True)
    return generate_from_encoder_out(variables, cfg, gen_cfg, enc,
                                     speaker=speaker, rng=rng,
                                     gcmvn_mean=gcmvn_mean,
                                     gcmvn_std=gcmvn_std)


def generate_from_encoder_out(variables, cfg, gen_cfg: GenerationConfig, enc,
                              speaker=None, rng=None, gcmvn_mean=None,
                              gcmvn_std=None):
    """AR decode + postnet + denorm from any encoder output dict with
    encoder_out/encoder_padding_mask/out_lengths (shared by the S2ST and
    T2S models — both use the same spectrogram decoder)."""
    feats, eos_prob, attn, out_lens = _decode_loop(
        variables, cfg, gen_cfg, enc, speaker, rng)
    # postnet residual over the whole sequence (speech_generator:101-102)
    res, _ = postnet(variables["params"]["decoder"]["postnet"],
                     variables["stats"]["postnet"], feats.astype(cfg.dtype),
                     kernel_size=cfg.postnet_conv_kernel_size,
                     dropout_rate=0.0, train=False)
    feats = feats + res.astype(jnp.float32)

    b = feats.shape[0]
    r = cfg.n_frames_per_step
    raw_dim = cfg.output_frame_dim
    feats = feats.reshape(b, -1, raw_dim)
    if gcmvn_mean is not None:
        feats = feats * jnp.asarray(gcmvn_std) + jnp.asarray(gcmvn_mean)
    eos_prob = jnp.repeat(eos_prob, r, axis=1)
    return {
        "feats": feats,
        "raw_out_lens": out_lens * r,
        "out_lens": out_lens,
        "eos_prob": eos_prob,
        "attn": attn,
        "enc_lens": enc["out_lengths"],
    }


def teacher_forcing_features(variables, cfg: m.S2STConfig, batch,
                             gcmvn_mean=None, gcmvn_std=None, rng=None):
    """TeacherForcingAutoRegressiveSpeechGenerator parity
    (speech_generator_for_s2st.py:193-247): full teacher-forced forward,
    lengths from the target."""
    out = m.forward(variables, cfg, batch, rng=rng, deterministic=True,
                    train=False)
    b = out["post_feat_out"].shape[0]
    r = cfg.n_frames_per_step
    feats = out["post_feat_out"].astype(jnp.float32).reshape(
        b, -1, cfg.output_frame_dim)
    if gcmvn_mean is not None:
        feats = feats * jnp.asarray(gcmvn_std) + jnp.asarray(gcmvn_mean)
    eos_prob = jax.nn.sigmoid(out["eos_out"].astype(jnp.float32))[:, :, 0]
    return {
        "feats": feats,
        "raw_out_lens": batch["target_lengths"] * r,
        "out_lens": batch["target_lengths"],
        "eos_prob": jnp.repeat(eos_prob, r, axis=1),
        "attn": out["attn"],
    }
