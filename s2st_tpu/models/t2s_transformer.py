"""Text-to-speech transformer (pseudo-label TTS / "input-text" mode).

Parity: ``examples/s2s_trans/models/t2s_transformer.py`` —
``T2STransformerEncoder`` (:37-118): token embedding -> conv-BN-ReLU prenet
xN -> prenet_proj -> pad-aware sinusoidal positions scaled by a learned
``pos_emb_alpha`` -> transformer layers -> final LN -> optional speaker
concat+proj; ``T2STransformerDecoder`` (:128) is the same AR spectrogram
decoder as the S2ST model, so decoding reuses
``s2st_transformer.decode`` / the shared AR generator.

The decoder/postnet/prenet hyper-parameters live in the embedded
``S2STConfig`` (``base``); this module adds only the text-encoder knobs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import (Params, batch_norm, batch_norm_init,
                       batch_norm_stats_init, conv1d, conv1d_init, dropout,
                       embedding, embedding_init, layer_norm, layer_norm_init,
                       linear, linear_init, split_rngs)
from ..nn.transformer import (encoder_layer, encoder_layer_init,
                              sinusoidal_table)
from . import s2st_transformer as s2st

PAD = s2st.PAD


@dataclass(frozen=True)
class T2SConfig:
    base: s2st.S2STConfig = dataclasses.field(
        default_factory=s2st.S2STConfig)
    encoder_conv_layers: int = 3
    encoder_conv_kernel_size: int = 5
    encoder_dropout: float = 0.5
    encoder_transformer_layers: int = 6

    def replace(self, **kw) -> "T2SConfig":
        return dataclasses.replace(self, **kw)


def init_t2s(key, cfg: T2SConfig) -> Dict[str, Params]:
    """{"params", "stats"}; decoder comes from the shared S2ST init."""
    base = cfg.base
    k_enc, k_base = jax.random.split(key)
    base_vars = s2st.init_s2st(k_base, base)

    keys = iter(jax.random.split(k_enc, cfg.encoder_conv_layers
                                 + cfg.encoder_transformer_layers + 8))
    d = base.encoder_embed_dim
    enc: Params = {
        "embed_tokens": embedding_init(next(keys), base.src_vocab_size, d,
                                       padding_idx=PAD),
        "prenet_proj": linear_init(next(keys), d, d),
        "pos_emb_alpha": jnp.ones((1,)),
    }
    stats: Params = {}
    for i in range(cfg.encoder_conv_layers):
        enc[f"conv{i}"] = conv1d_init(next(keys), d, d,
                                      cfg.encoder_conv_kernel_size)
        enc[f"bn{i}"] = batch_norm_init(d)
        stats[f"bn{i}"] = batch_norm_stats_init(d)
    for i in range(cfg.encoder_transformer_layers):
        enc[f"layer{i}"] = encoder_layer_init(
            next(keys), d, base.encoder_ffn_embed_dim,
            base.encoder_attention_heads)
    if base.encoder_normalize_before:
        enc["final_ln"] = layer_norm_init(d)
    if base.num_speakers > 0:
        enc["embed_speaker"] = embedding_init(next(keys), base.num_speakers,
                                              base.speaker_embed_dim)
        enc["spk_proj"] = linear_init(next(keys),
                                      d + base.speaker_embed_dim, d)
    return {
        "params": {"encoder": enc, "decoder": base_vars["params"]["decoder"]},
        "stats": {"encoder": stats, "postnet": base_vars["stats"]["postnet"]},
    }


def encode(variables: Dict[str, Params], cfg: T2SConfig,
           src_tokens: jnp.ndarray, speaker: Optional[jnp.ndarray] = None,
           rng: Optional[jax.Array] = None, deterministic: bool = True,
           train: bool = False) -> Dict[str, Any]:
    """src_tokens: (B, T) int32 (PAD-padded). Returns the standard encoder
    dict (+ new_stats with batch-norm updates)."""
    base = cfg.base
    p = variables["params"]["encoder"]
    stats = variables["stats"]["encoder"]
    b, t = src_tokens.shape
    d = base.encoder_embed_dim

    x = embedding(p["embed_tokens"], src_tokens, base.dtype)
    rngs = split_rngs(rng, cfg.encoder_conv_layers
                      + cfg.encoder_transformer_layers + 2)
    new_stats = {}
    pad_k = (cfg.encoder_conv_kernel_size - 1) // 2
    for i in range(cfg.encoder_conv_layers):
        x = conv1d(p[f"conv{i}"], x, stride=1, padding=pad_k)
        x, new_stats[f"bn{i}"] = batch_norm(
            p[f"bn{i}"], stats[f"bn{i}"], x, train=train)
        x = jax.nn.relu(x)
        x = dropout(x, cfg.encoder_dropout, rngs[i], deterministic)
    x = linear(p["prenet_proj"], x)

    padding_mask = src_tokens == PAD
    table = sinusoidal_table(base.max_source_positions + PAD + 1, d, PAD)
    cum = jnp.cumsum((~padding_mask).astype(jnp.int32), axis=1)
    pos_idx = jnp.where(padding_mask, PAD, cum + PAD)
    x = x + p["pos_emb_alpha"].astype(x.dtype) * table[pos_idx].astype(x.dtype)
    x = dropout(x, base.dropout, rngs[-1], deterministic)

    for i in range(cfg.encoder_transformer_layers):
        x = encoder_layer(
            p[f"layer{i}"], x, padding_mask, base.encoder_attention_heads,
            normalize_before=base.encoder_normalize_before,
            activation=base.activation_fn, dropout_rate=base.dropout,
            attn_dropout=base.attention_dropout,
            act_dropout=base.activation_dropout,
            rng=rngs[cfg.encoder_conv_layers + i],
            deterministic=deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)

    if speaker is not None and "embed_speaker" in p:
        emb = embedding(p["embed_speaker"], speaker.reshape(-1), x.dtype)
        emb = jnp.broadcast_to(emb[:, None, :], (b, t, emb.shape[-1]))
        x = linear(p["spk_proj"], jnp.concatenate([x, emb], axis=-1))

    out_lengths = jnp.sum((~padding_mask).astype(jnp.int32), axis=1)
    return {
        "encoder_out": x,
        "encoder_padding_mask": padding_mask,
        "out_middle_layers": [],
        "out_lengths": out_lengths,
        "new_stats": new_stats,
    }


def forward(variables: Dict[str, Params], cfg: T2SConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False) -> Dict[str, Any]:
    """Teacher-forced forward. batch: src_text (B,T) int32, prev_output_tokens
    (B,Tt,out_dim), target_lengths (B,), optional speaker."""
    r_enc, r_dec = split_rngs(rng, 2)
    speaker = batch.get("speaker")
    enc = encode(variables, cfg, batch["src_text"], speaker=speaker,
                 rng=r_enc, deterministic=deterministic, train=train)
    dec_vars = {"params": variables["params"],
                "stats": {"postnet": variables["stats"]["postnet"]}}
    dec = s2st.decode(dec_vars, cfg.base, batch["prev_output_tokens"],
                      batch["target_lengths"], enc, speaker=speaker,
                      rng=r_dec, deterministic=deterministic, train=train)
    return {
        "feat_out": dec["feat_out"],
        "post_feat_out": dec["post_feat_out"],
        "eos_out": dec["eos_out"],
        "attn": dec["attn"],
        "encoder_padding_mask": enc["encoder_padding_mask"],
        "encoder_out_lengths": enc["out_lengths"],
        "new_stats": {"encoder": enc["new_stats"],
                      "postnet": dec["new_stats"]["postnet"]},
    }
