"""LightConv / DynamicConv translation models (Wu et al. 2019, "Pay Less
Attention with Lightweight and Dynamic Convolutions").

Parity: ``fairseq/models/lightconv.py`` — encoder layers replace
self-attention with a (GLU-gated) lightweight or dynamic convolution
block; decoder layers use a causal conv (padding_l = K-1) plus standard
encoder attention; per-layer kernel sizes from --encoder/decoder-kernel-
size-list; weight_softmax normalization and weight/input/relu dropouts.

TPU-native: eval-time convolutions run the Pallas kernels
(ops/conv_kernels.py — the CUDA lightconv/dynamicconv kernels' TPU
equivalents); train-time (weight dropout on the softmaxed kernel) uses the
pure-XLA path the kernels are verified against.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import (Params, dropout, embedding, layer_norm,
                       layer_norm_init, linear, split_rngs, xavier_uniform)
from ..nn.attention import mha, mha_init
from ..nn.transformer import sinusoidal_table
from ..ops.conv_kernels import dynamicconv_op, lightconv_op
from . import transformer_text as tt

PAD, EOS = 1, 2


@dataclass(frozen=True)
class LightConvConfig:
    base: tt.TransformerTextConfig = dataclasses.field(
        default_factory=tt.TransformerTextConfig)
    conv_type: str = "lightweight"          # "lightweight" | "dynamic"
    encoder_kernel_sizes: Tuple[int, ...] = (3, 7, 15, 31, 31, 31, 31)
    decoder_kernel_sizes: Tuple[int, ...] = (3, 7, 15, 31, 31, 31)
    encoder_conv_dim: int = 512
    decoder_conv_dim: int = 512
    encoder_glu: bool = True
    decoder_glu: bool = True
    weight_softmax: bool = True
    weight_dropout: float = 0.1
    input_dropout: float = 0.1
    relu_dropout: float = 0.0

    def replace(self, **kw) -> "LightConvConfig":
        return dataclasses.replace(self, **kw)


def _linear_init(key, i, o, bias=True):
    kw, kb = jax.random.split(key)
    p = {"w": xavier_uniform(kw, (i, o), i, o)}
    if bias:
        p["b"] = jnp.zeros((o,))
    return p


def init_lightconv(key, cfg: LightConvConfig) -> Dict[str, Params]:
    b = cfg.base
    variables = tt.init_transformer(key, b)
    ks = iter(jax.random.split(jax.random.fold_in(key, 7), 256))
    enc = {"embed": variables["params"]["encoder"]["embed"]}
    for i, k in enumerate(cfg.encoder_kernel_sizes):
        heads = b.encoder_attention_heads
        layer: Params = {
            "linear1": _linear_init(
                next(ks), b.encoder_embed_dim,
                cfg.encoder_conv_dim * (2 if cfg.encoder_glu else 1)),
            "linear2": _linear_init(next(ks), cfg.encoder_conv_dim,
                                    b.encoder_embed_dim),
            "conv_ln": layer_norm_init(b.encoder_embed_dim),
            "fc1": _linear_init(next(ks), b.encoder_embed_dim,
                                b.encoder_ffn_embed_dim),
            "fc2": _linear_init(next(ks), b.encoder_ffn_embed_dim,
                                b.encoder_embed_dim),
            "final_ln": layer_norm_init(b.encoder_embed_dim),
        }
        if cfg.conv_type == "lightweight":
            layer["conv_weight"] = xavier_uniform(next(ks), (heads, k),
                                                  heads, k)
        else:
            layer["weight_linear"] = _linear_init(
                next(ks), cfg.encoder_conv_dim, heads * k, bias=False)
        enc[f"layer{i}"] = layer
    if b.encoder_normalize_before:
        enc["final_ln"] = layer_norm_init(b.encoder_embed_dim)

    dec: Params = {}
    base_dec = variables["params"]["decoder"]
    if "embed" in base_dec:
        dec["embed"] = base_dec["embed"]
    if "out_proj" in base_dec:
        dec["out_proj"] = base_dec["out_proj"]
    for i, k in enumerate(cfg.decoder_kernel_sizes):
        heads = b.decoder_attention_heads
        layer = {
            "linear1": _linear_init(
                next(ks), b.decoder_embed_dim,
                cfg.decoder_conv_dim * (2 if cfg.decoder_glu else 1)),
            "linear2": _linear_init(next(ks), cfg.decoder_conv_dim,
                                    b.decoder_embed_dim),
            "conv_ln": layer_norm_init(b.decoder_embed_dim),
            "cross_attn": mha_init(next(ks), b.decoder_embed_dim, heads,
                                   kdim=b.encoder_embed_dim,
                                   vdim=b.encoder_embed_dim),
            "cross_attn_ln": layer_norm_init(b.decoder_embed_dim),
            "fc1": _linear_init(next(ks), b.decoder_embed_dim,
                                b.decoder_ffn_embed_dim),
            "fc2": _linear_init(next(ks), b.decoder_ffn_embed_dim,
                                b.decoder_embed_dim),
            "final_ln": layer_norm_init(b.decoder_embed_dim),
        }
        if cfg.conv_type == "lightweight":
            layer["conv_weight"] = xavier_uniform(next(ks), (heads, k),
                                                  heads, k)
        else:
            layer["weight_linear"] = _linear_init(
                next(ks), cfg.decoder_conv_dim, heads * k, bias=False)
        dec[f"layer{i}"] = layer
    if b.decoder_normalize_before:
        dec["final_ln"] = layer_norm_init(b.decoder_embed_dim)
    return {"params": {"encoder": enc, "decoder": dec}, "stats": {}}


def _glu(x):
    a, g = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(g)


def _conv(cfg: LightConvConfig, lp: Params, x: jnp.ndarray, k: int,
          padding_l: int, heads: int, rng, deterministic: bool
          ) -> jnp.ndarray:
    """Apply the (light|dynamic) conv with weight-softmax + weight dropout
    (lightweight_convolution.py:105-135 semantics)."""
    if cfg.conv_type == "lightweight":
        w = lp["conv_weight"]
        if deterministic or cfg.weight_dropout == 0.0:
            return lightconv_op(x, w, padding_l, heads)
        wsm = jax.nn.softmax(w, axis=-1)
        wsm = dropout(wsm, cfg.weight_dropout, rng, deterministic)
        # conv with pre-normalized weights (training path, pure XLA)
        b_, t, c = x.shape
        w_c = jnp.repeat(wsm, c // heads, axis=0)
        xp = jnp.pad(x, ((0, 0), (padding_l, k - 1 - padding_l), (0, 0)))
        out = jnp.zeros_like(x)
        for ki in range(k):
            out = out + xp[:, ki:ki + t, :] * w_c[:, ki][None, None, :]
        return out
    # dynamic: per-position weights from x
    b_, t, c = x.shape
    logits = linear(lp["weight_linear"], x).reshape(b_, t, heads, k)
    if deterministic or cfg.weight_dropout == 0.0:
        return dynamicconv_op(x, logits, padding_l, heads)
    wsm = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    wsm = dropout(wsm, cfg.weight_dropout, rng, deterministic)
    w = jnp.repeat(wsm, c // heads, axis=2)                   # (B,T,C,K)
    xp = jnp.pad(x, ((0, 0), (padding_l, k - 1 - padding_l), (0, 0)))
    out = jnp.zeros_like(x)
    for ki in range(k):
        out = out + xp[:, ki:ki + t, :] * w[:, :, :, ki].astype(x.dtype)
    return out


def _enc_layer(cfg, lp, x, pad_mask, k, rng, deterministic):
    b = cfg.base
    nb = b.encoder_normalize_before
    r1, r2, r3, r4, r5 = split_rngs(rng, 5)
    residual = x
    h = layer_norm(lp["conv_ln"], x) if nb else x
    h = dropout(h, cfg.input_dropout, r1, deterministic)
    h = linear(lp["linear1"], h)
    if cfg.encoder_glu:
        h = _glu(h)
    h = jnp.where(pad_mask[:, :, None], 0.0, h)
    if k % 2 == 0:
        raise NotImplementedError("even conv kernels (asymmetric padding)")
    h = _conv(cfg, lp, h, k, k // 2, b.encoder_attention_heads, r2,
              deterministic)
    h = linear(lp["linear2"], h)
    h = dropout(h, b.dropout, r3, deterministic)
    x = residual + h
    if not nb:
        x = layer_norm(lp["conv_ln"], x)

    residual = x
    h = layer_norm(lp["final_ln"], x) if nb else x
    h = jax.nn.relu(linear(lp["fc1"], h))
    h = dropout(h, cfg.relu_dropout, r4, deterministic)
    h = linear(lp["fc2"], h)
    h = dropout(h, b.dropout, r5, deterministic)
    x = residual + h
    if not nb:
        x = layer_norm(lp["final_ln"], x)
    return x


def encode(variables, cfg: LightConvConfig, src_tokens,
           rng=None, deterministic=True) -> Dict[str, Any]:
    b = cfg.base
    p = variables["params"]["encoder"]
    scale = b.encoder_embed_dim ** 0.5
    x = embedding(p["embed"], src_tokens, b.dtype) * jnp.asarray(
        scale, b.dtype)
    table = sinusoidal_table(b.max_source_positions + PAD + 1,
                             b.encoder_embed_dim, PAD)
    is_pad = src_tokens == PAD
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    x = x + table[jnp.where(is_pad, PAD, cum + PAD)].astype(b.dtype)
    rngs = split_rngs(rng, len(cfg.encoder_kernel_sizes) + 1)
    x = dropout(x, b.dropout, rngs[-1], deterministic)
    for i, k in enumerate(cfg.encoder_kernel_sizes):
        x = _enc_layer(cfg, p[f"layer{i}"], x, is_pad, k, rngs[i],
                       deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    return {"encoder_out": x, "encoder_padding_mask": is_pad}


def _dec_layer(cfg, lp, x, enc_out, enc_pad, k, rng, deterministic):
    b = cfg.base
    nb = b.decoder_normalize_before
    r1, r2, r3, r4, r5, r6, r7 = split_rngs(rng, 7)
    residual = x
    h = layer_norm(lp["conv_ln"], x) if nb else x
    h = dropout(h, cfg.input_dropout, r1, deterministic)
    h = linear(lp["linear1"], h)
    if cfg.decoder_glu:
        h = _glu(h)
    h = _conv(cfg, lp, h, k, k - 1, b.decoder_attention_heads, r2,
              deterministic)
    h = linear(lp["linear2"], h)
    h = dropout(h, b.dropout, r3, deterministic)
    x = residual + h
    if not nb:
        x = layer_norm(lp["conv_ln"], x)

    if "cross_attn" in lp:          # absent in LM mode (no_encoder_attn)
        residual = x
        h = layer_norm(lp["cross_attn_ln"], x) if nb else x
        h, _ = mha(lp["cross_attn"], h, enc_out, enc_out,
                   b.decoder_attention_heads, key_padding_mask=enc_pad,
                   dropout_rate=b.attention_dropout, rng=r4,
                   deterministic=deterministic)
        h = dropout(h, b.dropout, r5, deterministic)
        x = residual + h
        if not nb:
            x = layer_norm(lp["cross_attn_ln"], x)

    residual = x
    h = layer_norm(lp["final_ln"], x) if nb else x
    h = jax.nn.relu(linear(lp["fc1"], h))
    h = dropout(h, cfg.relu_dropout, r6, deterministic)
    h = linear(lp["fc2"], h)
    h = dropout(h, b.dropout, r7, deterministic)
    x = residual + h
    if not nb:
        x = layer_norm(lp["final_ln"], x)
    return x


def decode(variables, cfg: LightConvConfig, prev_output_tokens, enc_out,
           enc_pad, rng=None, deterministic=True) -> jnp.ndarray:
    b = cfg.base
    p = dict(variables["params"]["decoder"])
    if cfg.base.share_all_embeddings:
        p["embed"] = variables["params"]["encoder"]["embed"]
    if "out_proj" not in p:
        p["out_proj"] = {"w": p["embed"]["w"].T}
    scale = b.decoder_embed_dim ** 0.5
    x = embedding(p["embed"], prev_output_tokens, b.dtype) * jnp.asarray(
        scale, b.dtype)
    table = sinusoidal_table(b.max_target_positions + PAD + 1,
                             b.decoder_embed_dim, PAD)
    is_pad = prev_output_tokens == PAD
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    x = x + table[jnp.where(is_pad, PAD, cum + PAD)].astype(b.dtype)
    rngs = split_rngs(rng, len(cfg.decoder_kernel_sizes) + 1)
    x = dropout(x, b.dropout, rngs[-1], deterministic)
    for i, k in enumerate(cfg.decoder_kernel_sizes):
        x = _dec_layer(cfg, p[f"layer{i}"], x, enc_out, enc_pad, k,
                       rngs[i], deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    return jnp.dot(x, p["out_proj"]["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32)


def make_beam_step(variables, cfg: LightConvConfig, enc_out, enc_pad):
    """Incremental decode step for the generic jitted beam: per-layer
    cache = the rolling window of the last K-1 post-GLU conv inputs (the
    torch modules' incremental input buffer), cross-attention runs full
    (the encoder is short; KV precompute is skipped for simplicity)."""
    from ..nn.transformer import sinusoidal_table
    b = cfg.base
    p = dict(variables["params"]["decoder"])
    if b.share_all_embeddings:
        p["embed"] = variables["params"]["encoder"]["embed"]
    if "out_proj" not in p:
        p["out_proj"] = {"w": p["embed"]["w"].T}
    table = sinusoidal_table(b.max_target_positions + PAD + 8,
                             b.decoder_embed_dim, PAD)
    scale = b.decoder_embed_dim ** 0.5
    heads = b.decoder_attention_heads

    def step_fn(tokens_t, step, cache):
        x = embedding(p["embed"], tokens_t, b.dtype) * jnp.asarray(
            scale, b.dtype)
        x = x + table[step + PAD + 1].astype(b.dtype)[None, None, :]
        new_cache = dict(cache)
        for i, k in enumerate(cfg.decoder_kernel_sizes):
            lp = p[f"layer{i}"]
            nb = b.decoder_normalize_before
            residual = x
            h = layer_norm(lp["conv_ln"], x) if nb else x
            h = linear(lp["linear1"], h)
            if cfg.decoder_glu:
                h = _glu(h)
            buf = jnp.concatenate([cache[f"conv{i}"][:, 1:], h], axis=1)
            new_cache[f"conv{i}"] = buf
            if cfg.conv_type == "lightweight":
                w = jax.nn.softmax(lp["conv_weight"], axis=-1)  # (H, K)
                w_c = jnp.repeat(w, buf.shape[-1] // heads, axis=0)
                h = jnp.einsum("nkc,ck->nc", buf, w_c)[:, None, :]
            else:
                logits = linear(lp["weight_linear"], h).reshape(
                    h.shape[0], heads, k)
                w = jax.nn.softmax(logits.astype(jnp.float32), -1)
                w_c = jnp.repeat(w, buf.shape[-1] // heads, axis=1)
                h = jnp.einsum("nkc,nck->nc",
                               buf, w_c.astype(buf.dtype))[:, None, :]
            h = linear(lp["linear2"], h)
            x = residual + h
            if not nb:
                x = layer_norm(lp["conv_ln"], x)

            residual = x
            h = layer_norm(lp["cross_attn_ln"], x) if nb else x
            h, _ = mha(lp["cross_attn"], h, enc_out, enc_out, heads,
                       key_padding_mask=enc_pad)
            x = residual + h
            if not nb:
                x = layer_norm(lp["cross_attn_ln"], x)

            residual = x
            h = layer_norm(lp["final_ln"], x) if nb else x
            h = linear(lp["fc2"], jax.nn.relu(linear(lp["fc1"], h)))
            x = residual + h
            if not nb:
                x = layer_norm(lp["final_ln"], x)
        if "final_ln" in p:
            x = layer_norm(p["final_ln"], x)
        logits = jnp.dot(x[:, 0], p["out_proj"]["w"].astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), new_cache

    return step_fn


def init_beam_cache(cfg: LightConvConfig, n: int) -> Dict[str, jnp.ndarray]:
    return {f"conv{i}": jnp.zeros((n, k, cfg.decoder_conv_dim),
                                  cfg.base.dtype)
            for i, k in enumerate(cfg.decoder_kernel_sizes)}


def forward(variables, cfg: LightConvConfig, batch: Dict[str, Any],
            rng=None, deterministic=True, train=False) -> Dict[str, Any]:
    r_enc, r_dec = split_rngs(rng, 2)
    enc = encode(variables, cfg, batch["src_tokens"], rng=r_enc,
                 deterministic=deterministic)
    logits = decode(variables, cfg, batch["prev_output_tokens"],
                    enc["encoder_out"], enc["encoder_padding_mask"],
                    rng=r_dec, deterministic=deterministic)
    return {"logits": logits, "new_stats": {}}


def init_lightconv_lm(key, cfg: LightConvConfig) -> Dict[str, Params]:
    """lightconv_lm / dynamicconv LM (fairseq/models/lightconv_lm.py):
    LightConvDecoder with no_encoder_attn — the seq2seq init minus the
    encoder and every cross-attention block."""
    full = init_lightconv(key, cfg)
    dec = {k: v for k, v in full["params"]["decoder"].items()}
    if "embed" not in dec:      # share_all_embeddings not meaningful here
        dec["embed"] = full["params"]["encoder"]["embed"]
    for i in range(len(cfg.decoder_kernel_sizes)):
        dec[f"layer{i}"] = {k: v for k, v in dec[f"layer{i}"].items()
                            if not k.startswith("cross_attn")}
    return {"params": {"decoder": dec}, "stats": {}}


def forward_lm(variables, cfg: LightConvConfig, batch: Dict[str, Any],
               rng=None, deterministic=True, train=False) -> Dict[str, Any]:
    """LM forward over batch["src_tokens"] -> {"logits": (B, T, V)}."""
    logits = decode(variables, cfg, batch["src_tokens"], None, None,
                    rng=rng, deterministic=deterministic)
    return {"logits": logits, "new_stats": {}}
