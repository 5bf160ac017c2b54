"""ConvTransformer speech-to-text model (Espnet-style 2D-conv frontend).

Parity: ``fairseq/models/speech_to_text/convtransformer.py`` — two
stride-2 3x3 Conv2d+ReLU blocks over the (1, T, F) feature image, a
linear projection to the embed dim, embed_scale, mask-derived sinusoidal
positions, transformer encoder layers, and a standard text decoder; the
subsampled lengths follow the reference's
ceil(len / round(T/T')) min T' arithmetic (:305-311).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.core import Params, dropout, linear, linear_init, split_rngs, \
    uniform_fan
from ..nn.transformer import (encoder_layer, encoder_layer_init,
                              positions_for_lengths, sinusoidal_table)
from . import s2st_transformer as s2st

PAD = 1


@dataclass(frozen=True)
class ConvTransformerConfig:
    base: s2st.S2STConfig = dataclasses.field(
        default_factory=s2st.S2STConfig)
    conv_out_channels: int = 256
    decoder_layers: int = 6
    decoder_embed_dim: int = 256

    def replace(self, **kw) -> "ConvTransformerConfig":
        return dataclasses.replace(self, **kw)


def _conv2d_init(key, cin, cout):
    kw, kb = jax.random.split(key)
    fan_in = cin * 9
    return {"w": uniform_fan(kw, (3, 3, cin, cout), fan_in),
            "b": uniform_fan(kb, (cout,), fan_in)}


def _conv_out_len(t: int) -> int:
    return (t - 1) // 2 + 1          # 3x3, stride 2, pad 1


def init_convtransformer(key, cfg: ConvTransformerConfig,
                         vocab_size: Optional[int] = None
                         ) -> Dict[str, Params]:
    b = cfg.base
    ks = iter(jax.random.split(key, b.encoder_layers + 8))
    feat = b.input_feat_per_channel
    f_out = _conv_out_len(_conv_out_len(feat))
    enc: Params = {
        "conv1": _conv2d_init(next(ks), 1, cfg.conv_out_channels),
        "conv2": _conv2d_init(next(ks), cfg.conv_out_channels,
                              cfg.conv_out_channels),
        "out": linear_init(next(ks), cfg.conv_out_channels * f_out,
                           b.encoder_embed_dim),
    }
    for i in range(b.encoder_layers):
        enc[f"layer{i}"] = encoder_layer_init(
            next(ks), b.encoder_embed_dim, b.encoder_ffn_embed_dim,
            b.encoder_attention_heads)
    vocab = vocab_size or b.tgt_vocab_size
    params: Params = {
        "encoder": enc,
        "decoder": s2st._aux_decoder_init(next(ks), b, vocab,
                                          cfg.decoder_embed_dim,
                                          cfg.decoder_layers),
    }
    return {"params": params, "stats": {}}


def _conv2d(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, T, F, C) -> stride-2 3x3 conv, padding 1."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(x.dtype)


def encode(variables: Dict[str, Params], cfg: ConvTransformerConfig,
           src_speech: jnp.ndarray, src_lens: jnp.ndarray,
           rng: Optional[jax.Array] = None, deterministic: bool = True
           ) -> Dict[str, Any]:
    b_cfg = cfg.base
    p = variables["params"]["encoder"]
    bsz, t, feat = src_speech.shape
    x = src_speech.astype(b_cfg.dtype)[:, :, :, None]       # (B, T, F, 1)
    x = jax.nn.relu(_conv2d(p["conv1"], x))
    x = jax.nn.relu(_conv2d(p["conv2"], x))
    bt = x.shape[1]
    x = x.transpose(0, 1, 3, 2).reshape(bsz, bt, -1)        # (B,T',C*F')
    x = linear(p["out"], x)
    x = x * jnp.asarray(b_cfg.encoder_embed_dim ** 0.5, b_cfg.dtype)
    # subsampled lengths (reference :305-311)
    factor = int(t / bt + 0.5)
    out_lens = jnp.minimum(jnp.ceil(src_lens / factor).astype(jnp.int32),
                           bt)
    table = sinusoidal_table(bt + PAD + 1, b_cfg.encoder_embed_dim, PAD)
    x = x + positions_for_lengths(table, out_lens, bt, PAD, b_cfg.dtype)
    rngs = split_rngs(rng, b_cfg.encoder_layers + 1)
    x = dropout(x, b_cfg.dropout, rngs[-1], deterministic)
    pad_mask = jnp.arange(bt)[None, :] >= out_lens[:, None]
    for i in range(b_cfg.encoder_layers):
        x = encoder_layer(
            p[f"layer{i}"], x, pad_mask, b_cfg.encoder_attention_heads,
            normalize_before=b_cfg.encoder_normalize_before,
            activation=b_cfg.activation_fn, dropout_rate=b_cfg.dropout,
            attn_dropout=b_cfg.attention_dropout,
            act_dropout=b_cfg.activation_dropout,
            rng=rngs[i], deterministic=deterministic)
    return {"encoder_out": x, "encoder_padding_mask": pad_mask,
            "out_lengths": out_lens}


def forward(variables: Dict[str, Params], cfg: ConvTransformerConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    r_enc, r_dec = split_rngs(rng, 2)
    enc = encode(variables, cfg, batch["src_speech"],
                 batch["src_speech_lens"], rng=r_enc,
                 deterministic=deterministic)
    prev = batch.get("prev_text_tokens")
    if prev is None:
        prev = batch.get("prev_tgt_text_tokens",
                         batch.get("prev_src_text_tokens"))
    logits = s2st.aux_decode(
        variables["params"]["decoder"], cfg.base, cfg.decoder_embed_dim,
        cfg.decoder_layers, prev, enc["encoder_out"],
        enc["encoder_padding_mask"], rng=r_dec,
        deterministic=deterministic)
    return {"logits": logits,
            "encoder_out": enc["encoder_out"],
            "encoder_padding_mask": enc["encoder_padding_mask"],
            "encoder_out_lengths": enc["out_lengths"],
            "new_stats": {}}
