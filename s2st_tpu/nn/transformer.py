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

from .attention import (_split_heads, attend, causal_mask,
                        cross_attn_precompute, dequantize_kv, mha,
                        mha_cross_step, mha_self_step, mha_init,
                        quantize_kv)
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
                  rng=None, deterministic: bool = True,
                  use_flash: bool = False) -> jnp.ndarray:
    act = get_activation(activation)
    r_attn, r_attn_out, r_act, r_ffn = split_rngs(rng, 4)

    residual = x
    h = layer_norm(p["self_attn_ln"], x) if normalize_before else x
    h, _ = mha(p["self_attn"], h, h, h, num_heads,
               key_padding_mask=padding_mask, dropout_rate=attn_dropout,
               rng=r_attn, deterministic=deterministic,
               use_flash=use_flash)
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
                  need_attn: bool = False, use_flash: bool = False,
                  self_attn_causal: bool = False):
    """Full-sequence decoder layer (training). Returns (x, cross_attn_weights).

    use_flash routes the self-attn (when self_attn_causal replaces the
    explicit mask) and the cross-attn (when need_attn is False) through
    the Pallas flash kernel.

    cross_attn_weights: fp32 (B, H, Tq, Tk) when need_attn else None.
    """
    act = get_activation(activation)
    r1, r2, r3, r4, r5, r6 = split_rngs(rng, 6)

    residual = x
    h = layer_norm(p["self_attn_ln"], x) if normalize_before else x
    h, _ = mha(p["self_attn"], h, h, h, num_heads,
               key_padding_mask=self_attn_padding_mask,
               attn_mask=None if (use_flash and self_attn_causal)
               else self_attn_mask,
               dropout_rate=attn_dropout,
               rng=r1, deterministic=deterministic,
               use_flash=use_flash, causal=self_attn_causal)
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
                        deterministic=deterministic, need_weights=need_attn,
                        use_flash=use_flash)
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


def fuse_decoder_layer_params(lp: Params) -> Params:
    """Re-layout one decoder layer's params for the fused decode step: the
    self-attention q/k/v projections become one (C, 3C) matmul.

    TPU rationale: the AR decode step is latency-bound — ~40 tiny matmuls
    per step at base size; the qkv fusion cuts 2 matmul dispatches per
    layer. Numerics are identical: each fused output column is the same
    dot product. Done once per generate() call, outside the decode loop.
    """
    sa = lp["self_attn"]
    fused = {"w": jnp.concatenate(
        [sa["q"]["w"], sa["k"]["w"], sa["v"]["w"]], axis=1)}
    if "b" in sa["q"]:
        fused["b"] = jnp.concatenate(
            [sa["q"]["b"], sa["k"]["b"], sa["v"]["b"]])
    return {
        "qkv": fused,
        "self_out": sa["out"],
        "self_attn_ln": lp["self_attn_ln"],
        "cross_q": lp["cross_attn"]["q"],
        "cross_out": lp["cross_attn"]["out"],
        "cross_attn_ln": lp["cross_attn_ln"],
        "fc1": lp["fc1"], "fc2": lp["fc2"],
        "final_ln": lp["final_ln"],
    }


def stack_decoder_layers(p: Params, num_layers: int) -> Params:
    """Stacked (leading L axis) fused layer params for the scan path of
    ``decoder_layers_step``."""
    mapped = [fuse_decoder_layer_params(p[f"layer{i}"])
              for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *mapped)


def decoder_layer_step_fused(lp: Params, x_step: jnp.ndarray, cache: Params,
                             step: jnp.ndarray, cross_kv: Params,
                             enc_padding_mask: Optional[jnp.ndarray],
                             num_heads: int, *,
                             normalize_before: bool = False,
                             activation: str = "relu",
                             need_attn: bool = False):
    """One-token decode step with fused qkv params from
    ``fuse_decoder_layer_params`` (eval only; no dropout). Same semantics as
    ``decoder_layer_step`` with 2 fewer matmul dispatches.

    cache: {"k","v"} (B, Tmax, H, D); cross_kv: precomputed encoder K/V.
    Returns (x_step, new_cache, cross-attn weights (B, H, 1, Tk) | None).
    """
    act = get_activation(activation)
    b, _, c = x_step.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    max_len = cache["k"].shape[1]
    invalid = jnp.broadcast_to(jnp.arange(max_len)[None, :] > step,
                               (b, max_len))

    int8_kv = "k_scale" in cache  # int8-quantized KV layout (see attention)

    residual = x_step
    h = layer_norm(lp["self_attn_ln"], x_step) if normalize_before else x_step
    q, k_new, v_new = jnp.split(linear(lp["qkv"], h), 3, axis=-1)
    q = _split_heads(q * scale, num_heads)
    k_new = _split_heads(k_new, num_heads)
    v_new = _split_heads(v_new, num_heads)
    if int8_kv:
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        new_cache = {
            "k": jax.lax.dynamic_update_slice(cache["k"], kq,
                                              (0, step, 0, 0)),
            "k_scale": jax.lax.dynamic_update_slice(cache["k_scale"], ks,
                                                    (0, step, 0, 0)),
            "v": jax.lax.dynamic_update_slice(cache["v"], vq,
                                              (0, step, 0, 0)),
            "v_scale": jax.lax.dynamic_update_slice(cache["v_scale"], vs,
                                                    (0, step, 0, 0)),
        }
        k_all = dequantize_kv(new_cache["k"], new_cache["k_scale"], q.dtype)
        v_all = dequantize_kv(new_cache["v"], new_cache["v_scale"], q.dtype)
    else:
        new_cache = {
            "k": jax.lax.dynamic_update_slice(
                cache["k"], k_new.astype(cache["k"].dtype), (0, step, 0, 0)),
            "v": jax.lax.dynamic_update_slice(
                cache["v"], v_new.astype(cache["v"].dtype), (0, step, 0, 0)),
        }
        k_all = new_cache["k"].astype(q.dtype)
        v_all = new_cache["v"].astype(q.dtype)
    out, _ = attend(q, k_all, v_all, key_padding_mask=invalid)
    x = residual + linear(lp["self_out"], out.reshape(b, 1, c))
    if not normalize_before:
        x = layer_norm(lp["self_attn_ln"], x)

    residual = x
    h = layer_norm(lp["cross_attn_ln"], x) if normalize_before else x
    q = _split_heads(linear(lp["cross_q"], h) * scale, num_heads)
    if "k_scale" in cross_kv:
        ck = dequantize_kv(cross_kv["k"], cross_kv["k_scale"], q.dtype)
        cv = dequantize_kv(cross_kv["v"], cross_kv["v_scale"], q.dtype)
    else:
        ck, cv = cross_kv["k"], cross_kv["v"]
    out, w = attend(q, ck, cv, key_padding_mask=enc_padding_mask)
    x = residual + linear(lp["cross_out"], out.reshape(b, 1, c))
    if not normalize_before:
        x = layer_norm(lp["cross_attn_ln"], x)

    residual = x
    h = layer_norm(lp["final_ln"], x) if normalize_before else x
    x = residual + linear(lp["fc2"], act(linear(lp["fc1"], h)))
    if not normalize_before:
        x = layer_norm(lp["final_ln"], x)
    return x, new_cache, (w if need_attn else None)


def decoder_layers_step(stacked: Params, x_step: jnp.ndarray, caches: Params,
                        step: jnp.ndarray, cross_kv: Params,
                        enc_padding_mask: Optional[jnp.ndarray],
                        num_heads: int, *, normalize_before: bool = False,
                        activation: str = "relu"):
    """One decode step through ALL decoder layers via ``lax.scan`` over the
    stacked params from ``stack_decoder_layers`` (eval only; no dropout).

    NOTE: measured ~1.5x SLOWER than the unrolled per-layer loop on v5e for
    the base arch (scan serializes work XLA would otherwise software-pipeline
    across layers) — kept for compile-time-sensitive deep stacks; the
    generators use the unrolled ``decoder_layer_step_fused``.

    caches: {"k","v"} (L, B, Tmax, H, D); cross_kv: {"k","v"} (L, B, Ts, H, D).
    Returns (x_step (B,1,C), new caches, last-layer cross-attn weights
    head-averaged fp32 (B, Ts)) — the reference reads the alignment from the
    final layer (fairseq/models/transformer/transformer_decoder.py
    alignment_layer default).
    """
    b = x_step.shape[0]

    def body(x, xs):
        lp, ck, cv, xk, xv = xs
        x, cache, w = decoder_layer_step_fused(
            lp, x, {"k": ck, "v": cv}, step, {"k": xk, "v": xv},
            enc_padding_mask, num_heads, normalize_before=normalize_before,
            activation=activation, need_attn=True)
        return x, (cache["k"], cache["v"], jnp.mean(w, axis=1)[:, 0, :])

    xs = (stacked, caches["k"], caches["v"], cross_kv["k"], cross_kv["v"])
    x, (new_k, new_v, attn_ws) = jax.lax.scan(body, x_step, xs)
    return x, {"k": new_k, "v": new_v}, attn_ws[-1]


__all__ = [
    "sinusoidal_table", "positions_for_lengths", "position_at_step",
    "encoder_layer_init", "encoder_layer",
    "decoder_layer_init", "decoder_layer", "decoder_layer_step",
    "fuse_decoder_layer_params", "decoder_layer_step_fused",
    "stack_decoder_layers", "decoder_layers_step",
    "causal_mask", "cross_attn_precompute",
]
