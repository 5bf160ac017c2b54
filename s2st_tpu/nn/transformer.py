"""Transformer encoder/decoder layers + sinusoidal positions (fairseq parity).

Parity targets:
- ``fairseq/modules/transformer_layer.py`` (pre/post-LN encoder & decoder layers)
- ``fairseq/modules/sinusoidal_positional_embedding.py`` (positions offset by
  padding_idx+1; table is [all-sines | all-cosines])

All activations are (B, T, C).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .attention import (causal_mask, cross_attn_precompute, mha,
                        mha_cross_step, mha_self_step, mha_init)
from .core import (Params, dropout, get_activation, layer_norm,
                   layer_norm_init, linear, linear_init, split_rngs)


# ---------------------------------------------------------------------------
# sinusoidal positional embedding
# ---------------------------------------------------------------------------

def sinusoidal_table(num_positions: int, dim: int, padding_idx: int = 1) -> jnp.ndarray:
    """fairseq SinusoidalPositionalEmbedding.get_embedding parity.

    Row p holds [sin(p*f_0..f_{h-1}) | cos(p*f_0..f_{h-1})]; the row at
    padding_idx is zero. Valid position t (0-based) uses row t+padding_idx+1.
    """
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                   * -(math.log(10000.0) / max(half - 1, 1)))
    pos = jnp.arange(num_positions, dtype=jnp.float32)[:, None] * freq[None, :]
    table = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate([table, jnp.zeros((num_positions, 1))], axis=1)
    table = table.at[padding_idx].set(0.0)
    return table


def positions_for_lengths(table: jnp.ndarray, lengths: jnp.ndarray, max_len: int,
                          padding_idx: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T, C) positional embeddings; pad positions get the zero row."""
    t = jnp.arange(max_len)
    valid = t[None, :] < lengths[:, None]
    idx = jnp.where(valid, t[None, :] + padding_idx + 1, padding_idx)
    return table[idx].astype(dtype)


def position_at_step(table: jnp.ndarray, step: jnp.ndarray,
                     padding_idx: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    """(C,) positional embedding at decode step `step` (0-based, traced)."""
    return jax.lax.dynamic_index_in_dim(
        table, step + padding_idx + 1, axis=0, keepdims=False).astype(dtype)


# ---------------------------------------------------------------------------
# encoder layer
# ---------------------------------------------------------------------------

def encoder_layer_init(key, dim: int, ffn_dim: int, num_heads: int) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(ks[0], dim, num_heads),
        "self_attn_ln": layer_norm_init(dim),
        "fc1": linear_init(ks[1], dim, ffn_dim),
        "fc2": linear_init(ks[2], ffn_dim, dim),
        "final_ln": layer_norm_init(dim),
    }


def encoder_layer(p: Params, x: jnp.ndarray,
                  padding_mask: Optional[jnp.ndarray],
                  num_heads: int, *, normalize_before: bool = True,
                  activation: str = "relu", dropout_rate: float = 0.0,
                  attn_dropout: float = 0.0, act_dropout: float = 0.0,
                  rng=None, deterministic: bool = True) -> jnp.ndarray:
    act = get_activation(activation)
    r_attn, r_attn_out, r_act, r_ffn = split_rngs(rng, 4)

    residual = x
    h = layer_norm(p["self_attn_ln"], x) if normalize_before else x
    h, _ = mha(p["self_attn"], h, h, h, num_heads,
               key_padding_mask=padding_mask, dropout_rate=attn_dropout,
               rng=r_attn, deterministic=deterministic)
    h = dropout(h, dropout_rate, r_attn_out, deterministic)
    x = residual + h
    if not normalize_before:
        x = layer_norm(p["self_attn_ln"], x)

    residual = x
    h = layer_norm(p["final_ln"], x) if normalize_before else x
    h = act(linear(p["fc1"], h))
    h = dropout(h, act_dropout, r_act, deterministic)
    h = linear(p["fc2"], h)
    h = dropout(h, dropout_rate, r_ffn, deterministic)
    x = residual + h
    if not normalize_before:
        x = layer_norm(p["final_ln"], x)
    return x


# ---------------------------------------------------------------------------
# decoder layer (self-attn + cross-attn + FFN)
# ---------------------------------------------------------------------------

def decoder_layer_init(key, dim: int, ffn_dim: int, num_heads: int,
                       kv_dim: Optional[int] = None) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "self_attn": mha_init(ks[0], dim, num_heads),
        "self_attn_ln": layer_norm_init(dim),
        "cross_attn": mha_init(ks[1], dim, num_heads, kdim=kv_dim, vdim=kv_dim),
        "cross_attn_ln": layer_norm_init(dim),
        "fc1": linear_init(ks[2], dim, ffn_dim),
        "fc2": linear_init(ks[3], ffn_dim, dim),
        "final_ln": layer_norm_init(dim),
    }


def decoder_layer(p: Params, x: jnp.ndarray, enc_out: Optional[jnp.ndarray],
                  enc_padding_mask: Optional[jnp.ndarray],
                  self_attn_mask: Optional[jnp.ndarray],
                  self_attn_padding_mask: Optional[jnp.ndarray],
                  num_heads: int, *, normalize_before: bool = False,
                  activation: str = "relu", dropout_rate: float = 0.0,
                  attn_dropout: float = 0.0, act_dropout: float = 0.0,
                  rng=None, deterministic: bool = True,
                  need_attn: bool = False):
    """Full-sequence decoder layer (training). Returns (x, cross_attn_weights).

    cross_attn_weights: fp32 (B, H, Tq, Tk) when need_attn else None.
    """
    act = get_activation(activation)
    r1, r2, r3, r4, r5, r6 = split_rngs(rng, 6)

    residual = x
    h = layer_norm(p["self_attn_ln"], x) if normalize_before else x
    h, _ = mha(p["self_attn"], h, h, h, num_heads,
               key_padding_mask=self_attn_padding_mask,
               attn_mask=self_attn_mask, dropout_rate=attn_dropout,
               rng=r1, deterministic=deterministic)
    h = dropout(h, dropout_rate, r2, deterministic)
    x = residual + h
    if not normalize_before:
        x = layer_norm(p["self_attn_ln"], x)

    attn_w = None
    if enc_out is not None:
        residual = x
        h = layer_norm(p["cross_attn_ln"], x) if normalize_before else x
        h, attn_w = mha(p["cross_attn"], h, enc_out, enc_out, num_heads,
                        key_padding_mask=enc_padding_mask,
                        dropout_rate=attn_dropout, rng=r3,
                        deterministic=deterministic, need_weights=need_attn)
        h = dropout(h, dropout_rate, r4, deterministic)
        x = residual + h
        if not normalize_before:
            x = layer_norm(p["cross_attn_ln"], x)

    residual = x
    h = layer_norm(p["final_ln"], x) if normalize_before else x
    h = act(linear(p["fc1"], h))
    h = dropout(h, act_dropout, r5, deterministic)
    h = linear(p["fc2"], h)
    h = dropout(h, dropout_rate, r6, deterministic)
    x = residual + h
    if not normalize_before:
        x = layer_norm(p["final_ln"], x)
    return x, attn_w


def decoder_layer_step(p: Params, x_step: jnp.ndarray, cache: Params,
                       step: jnp.ndarray, cross_kv: Params,
                       enc_padding_mask: Optional[jnp.ndarray],
                       num_heads: int, *, normalize_before: bool = False,
                       activation: str = "relu", need_attn: bool = False):
    """One-token decode step (eval only; no dropout).

    cache: {"k","v"} self-attn cache arrays (B, Tmax, H, D);
    cross_kv: precomputed encoder K/V from ``cross_attn_precompute``.
    Returns (x_step, new_cache, cross_attn_weights (B, H, 1, Tk) | None).
    """
    act = get_activation(activation)

    residual = x_step
    h = layer_norm(p["self_attn_ln"], x_step) if normalize_before else x_step
    h, cache = mha_self_step(p["self_attn"], cache, h, step, num_heads)
    x = residual + h
    if not normalize_before:
        x = layer_norm(p["self_attn_ln"], x)

    residual = x
    h = layer_norm(p["cross_attn_ln"], x) if normalize_before else x
    h, attn_w = mha_cross_step(p["cross_attn"], cross_kv, h, enc_padding_mask,
                               num_heads, need_weights=need_attn)
    x = residual + h
    if not normalize_before:
        x = layer_norm(p["cross_attn_ln"], x)

    residual = x
    h = layer_norm(p["final_ln"], x) if normalize_before else x
    h = linear(p["fc2"], act(linear(p["fc1"], h)))
    x = residual + h
    if not normalize_before:
        x = layer_norm(p["final_ln"], x)
    return x, cache, attn_w


__all__ = [
    "sinusoidal_table", "positions_for_lengths", "position_at_step",
    "encoder_layer_init", "encoder_layer",
    "decoder_layer_init", "decoder_layer", "decoder_layer_step",
    "causal_mask", "cross_attn_precompute",
]
