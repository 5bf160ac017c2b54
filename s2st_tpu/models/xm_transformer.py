"""xm_transformer: wav2vec 2.0 speech encoder + mBART text decoder.

Parity: ``fairseq/models/speech_to_text/xm_transformer.py`` — a frozen
wav2vec2 trunk (Wav2VecEncoder without masking = extract_features), the
Conv1dAdaptor (n stride-2 GLU Conv1d layers projecting to the decoder
dim, out_len = floor((len-1)/stride)+1 per layer, :26-70), and an
mBART-style TransformerDecoder (learned positions, embedding layernorm,
pre-norm) — here the shared learned-position decoder from
``transformer_text``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Params, embedding_init, layer_norm_init, split_rngs, \
    uniform_fan
from ..nn.transformer import decoder_layer_init
from . import transformer_text as tt
from .hubert import HubertConfig, extract_features, init_hubert

PAD = 1


@dataclass(frozen=True)
class XMConfig:
    trunk: HubertConfig = dataclasses.field(default_factory=HubertConfig)
    vocab_size: int = 1000
    decoder_layers: int = 12
    decoder_embed_dim: int = 1024
    decoder_ffn_embed_dim: int = 4096
    decoder_attention_heads: int = 16
    decoder_normalize_before: bool = True
    layernorm_embedding: bool = True
    adaptor_n_layers: int = 3
    adaptor_kernel_size: int = 3
    adaptor_stride: int = 2
    adaptor_layernorm: bool = False
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation_fn: str = "gelu"
    freeze_w2v: bool = True
    max_target_positions: int = 1024
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "XMConfig":
        return dataclasses.replace(self, **kw)

    def _decoder_shim(self) -> tt.TransformerTextConfig:
        return tt.TransformerTextConfig(
            tgt_vocab_size=self.vocab_size,
            decoder_layers=self.decoder_layers,
            decoder_embed_dim=self.decoder_embed_dim,
            decoder_ffn_embed_dim=self.decoder_ffn_embed_dim,
            decoder_attention_heads=self.decoder_attention_heads,
            decoder_normalize_before=self.decoder_normalize_before,
            layernorm_embedding=self.layernorm_embedding,
            decoder_learned_pos=True,
            encoder_embed_dim=self.decoder_embed_dim,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            activation_fn=self.activation_fn,
            max_target_positions=self.max_target_positions,
            dtype=self.dtype)


def _conv1d_init(key, cin, cout, k):
    kw, kb = jax.random.split(key)
    fan_in = cin * k
    return {"w": uniform_fan(kw, (k, cin, cout), fan_in),
            "b": uniform_fan(kb, (cout,), fan_in)}


def init_xm(key, cfg: XMConfig) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, cfg.decoder_layers
                               + cfg.adaptor_n_layers + 8))
    params: Params = {"w2v": init_hubert(next(ks), cfg.trunk)}
    adaptor: Params = {}
    in_dim = cfg.trunk.encoder_embed_dim
    for i in range(cfg.adaptor_n_layers):
        adaptor[f"conv{i}"] = _conv1d_init(
            next(ks), in_dim, 2 * cfg.decoder_embed_dim,
            cfg.adaptor_kernel_size)
        if cfg.adaptor_layernorm:
            adaptor[f"ln{i}"] = layer_norm_init(cfg.decoder_embed_dim)
        in_dim = cfg.decoder_embed_dim
    params["adaptor"] = adaptor
    dec: Params = {
        "embed": embedding_init(next(ks), cfg.vocab_size,
                                cfg.decoder_embed_dim, padding_idx=PAD),
        "embed_positions": embedding_init(
            next(ks), cfg.max_target_positions + PAD + 1,
            cfg.decoder_embed_dim, padding_idx=PAD),
        "out_proj": {"w": jax.random.normal(
            next(ks), (cfg.decoder_embed_dim, cfg.vocab_size))
            * (cfg.decoder_embed_dim ** -0.5)},
    }
    if cfg.layernorm_embedding:
        dec["embed_ln"] = layer_norm_init(cfg.decoder_embed_dim)
    if cfg.decoder_normalize_before:
        dec["final_ln"] = layer_norm_init(cfg.decoder_embed_dim)
    for i in range(cfg.decoder_layers):
        dec[f"layer{i}"] = decoder_layer_init(
            next(ks), cfg.decoder_embed_dim, cfg.decoder_ffn_embed_dim,
            cfg.decoder_attention_heads, kv_dim=cfg.decoder_embed_dim)
    params["decoder"] = dec
    return {"params": params, "stats": {}}


def adaptor_forward(p: Params, cfg: XMConfig, x: jnp.ndarray,
                    lengths: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                   jnp.ndarray]:
    """Conv1dAdaptor (:54-70): stride-s GLU convs; (B, T, C) -> shrunk."""
    s = cfg.adaptor_stride
    k = cfg.adaptor_kernel_size
    for i in range(cfg.adaptor_n_layers):
        y = jax.lax.conv_general_dilated(
            x, p[f"conv{i}"]["w"].astype(x.dtype), window_strides=(s,),
            padding=((k // 2, k // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"))
        y = y + p[f"conv{i}"]["b"].astype(x.dtype)
        a, g = jnp.split(y, 2, axis=-1)
        x = a * jax.nn.sigmoid(g)
        if cfg.adaptor_layernorm:
            from ..nn.core import layer_norm
            x = layer_norm(p[f"ln{i}"], x)
        lengths = jnp.floor((lengths.astype(jnp.float32) - 1) / s
                            + 1).astype(jnp.int32)
    return x, lengths


def encode(variables: Dict[str, Params], cfg: XMConfig,
           src_wave: jnp.ndarray, src_lens: jnp.ndarray,
           rng=None, deterministic: bool = True) -> Dict[str, Any]:
    feats, out_lens = extract_features(variables["params"]["w2v"],
                                       cfg.trunk, src_wave, src_lens)
    if cfg.freeze_w2v:
        feats = jax.lax.stop_gradient(feats)
    x, out_lens = adaptor_forward(variables["params"]["adaptor"], cfg,
                                  feats.astype(cfg.dtype), out_lens)
    pad_mask = jnp.arange(x.shape[1])[None, :] >= out_lens[:, None]
    return {"encoder_out": x, "encoder_padding_mask": pad_mask,
            "out_lengths": out_lens}


def forward(variables: Dict[str, Params], cfg: XMConfig,
            batch: Dict[str, Any], rng=None, deterministic: bool = True,
            train: bool = False) -> Dict[str, Any]:
    r_enc, r_dec = split_rngs(rng, 2)
    enc = encode(variables, cfg, batch["src_speech"],
                 batch["src_speech_lens"], rng=r_enc,
                 deterministic=deterministic)
    prev = batch.get("prev_text_tokens")
    if prev is None:
        prev = batch.get("prev_tgt_text_tokens",
                         batch.get("prev_src_text_tokens"))
    logits = tt._decode_learned_pos(
        variables["params"]["decoder"], cfg._decoder_shim(), prev,
        enc["encoder_out"], enc["encoder_padding_mask"], r_dec,
        deterministic)
    return {"logits": logits,
            "encoder_out": enc["encoder_out"],
            "encoder_padding_mask": enc["encoder_padding_mask"],
            "encoder_out_lengths": enc["out_lengths"],
            "new_stats": {}}
