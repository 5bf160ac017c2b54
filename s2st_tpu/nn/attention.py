"""Multi-head attention, functional, with a static preallocated KV cache.

Parity target: ``fairseq/modules/multihead_attention.py`` (QKV+out projections
with bias, q scaled by head_dim**-0.5, softmax in fp32). Instead of the
reference's dict-of-tensors ``incremental_state`` (grown step by step), the
decode path uses fixed-shape cache arrays updated with
``lax.dynamic_update_slice`` so the whole AR loop stays inside one XLA
program (see SURVEY.md §7 "incremental_state KV cache").
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core import Params, dropout, linear, linear_init

NEG_INF = -1e9  # large-negative instead of -inf: keeps softmax NaN-free


def mha_init(key, embed_dim: int, num_heads: int, kdim: Optional[int] = None,
             vdim: Optional[int] = None) -> Params:
    kdim = kdim or embed_dim
    vdim = vdim or embed_dim
    kq, kk, kv, ko = jax.random.split(key, 4)
    # fairseq uses xavier_uniform with gain 1/sqrt(2) for self-attn projections
    g = 1.0 / math.sqrt(2.0)
    return {
        "q": linear_init(kq, embed_dim, embed_dim, init="xavier", gain=g),
        "k": linear_init(kk, kdim, embed_dim, init="xavier", gain=g),
        "v": linear_init(kv, vdim, embed_dim, init="xavier", gain=g),
        "out": linear_init(ko, embed_dim, embed_dim, init="xavier"),
    }


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, c = x.shape
    return x.reshape(b, t, num_heads, c // num_heads)


def attend_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 causal: bool = False) -> jnp.ndarray:
    """Fused (never-materialize-the-scores) attention via the Pallas TPU
    flash kernel (jax.experimental.pallas.ops.tpu.flash_attention).

    Removes the (B, H, Tq, Tk) logits/weights HBM round-trips that the
    einsum+softmax path pays in fwd AND bwd — the roofline close-out
    identified exactly this non-GEMM elementwise time as the residual MFU
    gap. Numerics: fp32 online softmax (same reduction dtype as the
    baseline path), no attention-prob dropout (callers gate on
    attention_dropout == 0 or deterministic).

    q: (B, Tq, H, D) PRE-SCALED like `attend`; k/v: (B, Tk, H, D);
    key_padding_mask: (B, Tk) True at PAD. Sequences are padded here to
    the kernel's 128-multiple block grid and the pad region is masked via
    segment ids (pad kv gets segment 0, every query segment 1 — so pad
    QUERY rows attend the valid keys exactly like the baseline path, and
    no query can attend a pad key). Returns (B, Tq, H, D)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    b, tq, h, d = q.shape
    tk = k.shape[1]
    tq_p = -(-tq // 128) * 128
    tk_p = -(-tk // 128) * 128
    qf = jnp.moveaxis(q, 2, 1)              # (B, H, Tq, D)
    kf = jnp.moveaxis(k, 2, 1)
    vf = jnp.moveaxis(v, 2, 1)
    qf = jnp.pad(qf, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    kf = jnp.pad(kf, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
    vf = jnp.pad(vf, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
    kv_valid = jnp.ones((b, tk), jnp.int32) if key_padding_mask is None \
        else (~key_padding_mask).astype(jnp.int32)
    kv_seg = jnp.pad(kv_valid, ((0, 0), (0, tk_p - tk)))
    q_seg = jnp.ones((b, tq_p), jnp.int32)
    blk = min(128, tq_p, tk_p)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk)
    out = flash_attention(qf, kf, vf,
                          segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
                          causal=causal, sm_scale=1.0, block_sizes=sizes)
    return jnp.moveaxis(out[:, :, :tq, :], 1, 2)


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
           key_padding_mask: Optional[jnp.ndarray] = None,
           attn_mask: Optional[jnp.ndarray] = None,
           dropout_rate: float = 0.0, rng=None, deterministic: bool = True,
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core scaled dot-product attention.

    q: (B, Tq, H, D) pre-scaled; k, v: (B, Tk, H, D);
    key_padding_mask: (B, Tk) True at PAD; attn_mask: (Tq, Tk) additive.
    Returns (out (B, Tq, H, D), weights fp32 (B, H, Tq, Tk)).
    """
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if attn_mask is not None:
        logits = logits + attn_mask.astype(jnp.float32)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
    weights = jax.nn.softmax(logits, axis=-1)
    probs = dropout(weights, dropout_rate, rng, deterministic)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=v.dtype)
    return out, weights


def mha(p: Params, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray,
        num_heads: int,
        key_padding_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        dropout_rate: float = 0.0, rng=None, deterministic: bool = True,
        need_weights: bool = False,
        use_flash: bool = False, causal: bool = False):
    """Full (non-incremental) MHA. query/key/value: (B, T, C).

    use_flash: route through the Pallas flash kernel when the call is
    expressible there — no weights requested, no attention-prob dropout
    active, and the only additive mask is the causal one (signalled by
    ``causal=True`` INSTEAD of an attn_mask).

    Returns (out (B, Tq, C), weights (B, H, Tq, Tk) fp32 or None).
    """
    b, tq, c = query.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    q = _split_heads(linear(p["q"], query) * scale, num_heads)
    k = _split_heads(linear(p["k"], key), num_heads)
    v = _split_heads(linear(p["v"], value), num_heads)
    if use_flash and not need_weights and attn_mask is None and \
            (deterministic or dropout_rate == 0.0):
        out = attend_flash(q, k, v, key_padding_mask, causal=causal)
        return linear(p["out"], out.reshape(b, tq, c)), None
    if causal and attn_mask is None:
        attn_mask = causal_mask(tq)
    out, w = attend(q, k, v, key_padding_mask, attn_mask,
                    dropout_rate, rng, deterministic)
    out = linear(p["out"], out.reshape(b, tq, c))
    return out, (w if need_weights else None)


# ---------------------------------------------------------------------------
# incremental decoding
# ---------------------------------------------------------------------------

def self_attn_cache_init(batch: int, max_len: int, num_heads: int,
                         head_dim: int, dtype=jnp.bfloat16) -> Params:
    return {
        "k": jnp.zeros((batch, max_len, num_heads, head_dim), dtype),
        "v": jnp.zeros((batch, max_len, num_heads, head_dim), dtype),
    }


# ---------------------------------------------------------------------------
# int8-quantized KV (decode-time memory-bandwidth optimization)
# ---------------------------------------------------------------------------
# The AR decode step is HBM-bound on KV reads (~165 MB/step at B=64 base
# arch: cross-attention K/V re-read every step + the growing self-attention
# cache). Symmetric per-(token, head) absmax int8 quantization halves that
# traffic; XLA fuses the dequantize into the attention matmuls so no bf16
# copy is materialized. Enabled by GenerationConfig.kv_cache_dtype="int8".

def quantize_kv(x: jnp.ndarray):
    """x: (..., D) -> (int8 values, per-row scale (..., 1) fp32)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32)
                           / jnp.maximum(scale, 1e-8)), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def self_attn_cache_init_int8(batch: int, max_len: int, num_heads: int,
                              head_dim: int) -> Params:
    return {
        "k": jnp.zeros((batch, max_len, num_heads, head_dim), jnp.int8),
        "k_scale": jnp.zeros((batch, max_len, num_heads, 1), jnp.float32),
        "v": jnp.zeros((batch, max_len, num_heads, head_dim), jnp.int8),
        "v_scale": jnp.zeros((batch, max_len, num_heads, 1), jnp.float32),
    }


def cross_attn_precompute_int8(p: Params, enc_out: jnp.ndarray,
                               num_heads: int) -> Params:
    """int8 twin of ``cross_attn_precompute`` — the encoder K/V dominate
    per-step HBM reads (re-read by every decode step)."""
    k = _split_heads(linear(p["k"], enc_out), num_heads)
    v = _split_heads(linear(p["v"], enc_out), num_heads)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    return {"k": kq, "k_scale": ks, "v": vq, "v_scale": vs}

# NOTE: the int8 per-step attention itself lives in
# nn.transformer.decoder_layer_step_fused (the "k_scale" cache layout
# selects it) — no separate mha_*_step_int8 twins, so there is exactly one
# copy of the quantized step logic.


def mha_self_step(p: Params, cache: Params, x_step: jnp.ndarray, step: jnp.ndarray,
                  num_heads: int) -> Tuple[jnp.ndarray, Params]:
    """One-token self-attention step with cache write at position `step`.

    x_step: (B, 1, C); step: scalar int32. Returns (out (B, 1, C), new cache).
    Causal masking comes from masking cache positions > step.
    """
    b, _, c = x_step.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    q = _split_heads(linear(p["q"], x_step) * scale, num_heads)      # (B,1,H,D)
    k_new = _split_heads(linear(p["k"], x_step), num_heads)
    v_new = _split_heads(linear(p["v"], x_step), num_heads)
    k_all = jax.lax.dynamic_update_slice(
        cache["k"], k_new.astype(cache["k"].dtype), (0, step, 0, 0))
    v_all = jax.lax.dynamic_update_slice(
        cache["v"], v_new.astype(cache["v"].dtype), (0, step, 0, 0))
    max_len = k_all.shape[1]
    invalid = jnp.arange(max_len)[None, :] > step  # (1, Tk) future = masked
    out, _ = attend(q, k_all.astype(q.dtype), v_all.astype(q.dtype),
                    key_padding_mask=jnp.broadcast_to(invalid, (b, max_len)))
    out = linear(p["out"], out.reshape(b, 1, c))
    return out, {"k": k_all, "v": v_all}


def cross_attn_precompute(p: Params, enc_out: jnp.ndarray, num_heads: int) -> Params:
    """Project encoder K/V once per utterance (mirrors the reference's
    static_kv saved_state, fairseq/modules/multihead_attention.py)."""
    return {
        "k": _split_heads(linear(p["k"], enc_out), num_heads),
        "v": _split_heads(linear(p["v"], enc_out), num_heads),
    }


def mha_cross_step(p: Params, kv: Params, x_step: jnp.ndarray,
                   enc_padding_mask: Optional[jnp.ndarray], num_heads: int,
                   need_weights: bool = False):
    b, tq, c = x_step.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    q = _split_heads(linear(p["q"], x_step) * scale, num_heads)
    out, w = attend(q, kv["k"], kv["v"], key_padding_mask=enc_padding_mask)
    out = linear(p["out"], out.reshape(b, tq, c))
    return out, (w if need_weights else None)


def causal_mask(t: int, dtype=jnp.float32) -> jnp.ndarray:
    """(T, T) additive mask, NEG_INF strictly above the diagonal."""
    return jnp.triu(jnp.full((t, t), NEG_INF, dtype), k=1)
