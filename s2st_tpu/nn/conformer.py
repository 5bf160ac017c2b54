"""Conformer encoder layer + relative-position attention variants + VGGBlock.

Parity targets (all exported from ``fairseq/modules/__init__.py`` in the
reference; no model in the fork wires them — the `s2t_conformer` import in
``examples/s2s_trans/models/__init__.py:12`` is commented out and the file
absent — but the modules are live, importable building blocks, so they get
TPU-native equivalents + reference-numerics tests like everything else):

- ``fairseq/modules/conformer_layer.py`` (ConformerEncoderLayer: optional
  macaron FFN at 0.5 scale, self-attention with three selectable attention
  types, optional convolution module, final LayerNorm)
- ``fairseq/modules/convolution.py`` (ConvolutionModule: pad-masked
  pointwise-GLU -> depthwise conv -> BatchNorm/LayerNorm -> Swish ->
  pointwise, Mobvoi/WeNet lineage)
- ``fairseq/modules/rel_position_multihead_attention.py`` (Transformer-XL
  style: learned pos projection + pos_bias_u/v; NOTE the reference applies
  NO rel_shift — the call at :304 is commented out — and scales (ac+bd)
  *after* the sum rather than pre-scaling q; both reproduced)
- ``fairseq/modules/relative_multihead_attention.py`` (Shaw-style clipped
  relative embeddings. BUG-COMPATIBLE: the reference computes the
  relative-key scores at :253 then immediately OVERWRITES them with a plain
  ``q @ k^T`` at :256, so relative keys never affect attention weights; only
  the ``k_only=False`` value-side term survives. We reproduce exactly that.)
- ``fairseq/modules/vggblock.py`` (VGGBlock: conv2d stack + optional
  per-channel-dim LayerNorm + ReLU + ceil-mode MaxPool)

All activations are batch-major (B, T, C); VGGBlock uses NHWC (B, T, F, C)
instead of the reference's NCHW.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .attention import NEG_INF, mha, mha_init
from .core import (Params, batch_norm, batch_norm_init, batch_norm_stats_init,
                   dropout, get_activation, glu, layer_norm, layer_norm_init,
                   linear, linear_init, split_rngs, xavier_uniform)


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ConformerConfig:
    """Mirrors the args read by ConformerEncoderLayer.__init__ (:37-107)."""
    embed_dim: int = 256
    ffn_dim: int = 1024
    num_heads: int = 4
    dropout: float = 0.1
    activation_dropout: float = 0.0
    attention_dropout: float = 0.0
    activation: str = "relu"            # args.activation_fn (default relu)
    attn_type: str = "selfattn"         # selfattn | rel_selfattn | relative
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15         # odd (convolution.py:48)
    cnn_norm: str = "batch_norm"        # batch_norm | layer_norm
    normalize_before: bool = True
    max_relative_length: int = 8        # attn_type == "relative" only
    relative_k_only: bool = True        # RelativeMultiheadAttention k_only


# ---------------------------------------------------------------------------
# RelPositionMultiheadAttention (Transformer-XL / ESPNet style)
# ---------------------------------------------------------------------------

def rel_position_mha_init(key, embed_dim: int, num_heads: int) -> Params:
    head_dim = embed_dim // num_heads
    kb, ku, kv, kp = jax.random.split(key, 4)
    p = mha_init(kb, embed_dim, num_heads)
    # linear_pos: bias-free Linear keeping torch's DEFAULT init — the
    # reference's xavier_uniform_ call at rel_position:64 is commented out
    # (rel_position:53-56,64); pos_bias_u/v: xavier_normal (rel_position:65-66)
    p["linear_pos"] = linear_init(kp, embed_dim, embed_dim, bias=False)
    std = math.sqrt(2.0 / (num_heads + head_dim))
    p["pos_bias_u"] = std * jax.random.normal(ku, (num_heads, head_dim))
    p["pos_bias_v"] = std * jax.random.normal(kv, (num_heads, head_dim))
    return p


def rel_position_mha(p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray,
                     num_heads: int,
                     key_padding_mask: Optional[jnp.ndarray] = None,
                     attn_mask: Optional[jnp.ndarray] = None,
                     dropout_rate: float = 0.0, rng=None,
                     deterministic: bool = True,
                     need_weights: bool = False):
    """Self-attention with Transformer-XL position scores, reference-exact.

    x: (B, T, C); pos_emb: (B, T, C) or (T, C) (the reference requires
    pos_len == src_len because it applies no rel_shift — matrix_bd at :277
    is used unshifted, so column j of the bd term reads pos_emb[j]).
    attn_mask: additive (T, T) fp32. Returns (out, weights|None).
    """
    b, t, c = x.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    q = linear(p["q"], x).reshape(b, t, num_heads, head_dim)
    k = linear(p["k"], x).reshape(b, t, num_heads, head_dim)
    v = linear(p["v"], x).reshape(b, t, num_heads, head_dim)
    if pos_emb.ndim == 2:
        pos_emb = jnp.broadcast_to(pos_emb[None], (b,) + pos_emb.shape)
    pe = linear(p["linear_pos"], pos_emb).reshape(b, -1, num_heads, head_dim)

    # matrix (a+c): (q + u) k^T ; matrix (b+d): (q + v) pe^T — scores are
    # scaled AFTER the sum (rel_position:306), not via a pre-scaled q
    qu = q + p["pos_bias_u"].astype(q.dtype)
    qv = q + p["pos_bias_v"].astype(q.dtype)
    ac = jnp.einsum("bqhd,bkhd->bhqk", qu, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bqhd,bkhd->bhqk", qv, pe,
                    preferred_element_type=jnp.float32)
    logits = (ac + bd) * scale
    if attn_mask is not None:
        logits = logits + attn_mask.astype(jnp.float32)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
    weights = jax.nn.softmax(logits, axis=-1)
    probs = dropout(weights, dropout_rate, rng, deterministic)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=v.dtype)
    out = linear(p["out"], out.reshape(b, t, c))
    return out, (weights if need_weights else None)


# ---------------------------------------------------------------------------
# RelativeMultiheadAttention (Shaw-style, bug-compatible)
# ---------------------------------------------------------------------------

def relative_mha_init(key, embed_dim: int, num_heads: int,
                      max_relative_length: int, k_only: bool = True) -> Params:
    head_dim = embed_dim // num_heads
    kb, kk, kv = jax.random.split(key, 3)
    p = mha_init(kb, embed_dim, num_heads)
    n = 2 * max_relative_length + 1
    p["rel_keys"] = xavier_uniform(kk, (n, head_dim), head_dim, n)
    if not k_only:
        p["rel_values"] = xavier_uniform(kv, (n, head_dim), head_dim, n)
    return p


def _relative_positions_matrix(length: int, max_rel: int) -> jnp.ndarray:
    """(T, T) int32: clip(j - i, ±max_rel) + max_rel (relative:321-335)."""
    r = jnp.arange(length)
    dist = r[None, :] - r[:, None]
    return jnp.clip(dist, -max_rel, max_rel) + max_rel


def relative_mha(p: Params, x: jnp.ndarray, num_heads: int,
                 max_relative_length: int,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 dropout_rate: float = 0.0, rng=None,
                 deterministic: bool = True, need_weights: bool = False):
    """Shaw-style relative self-attention, reproducing the reference's
    latent bug: the relative-key score term is computed then DISCARDED
    (relative:253-256 reassigns attn_weights to the plain dot product), so
    attention weights are vanilla; only the value-side relative term (when
    ``k_only=False``) differs from standard MHA.
    """
    b, t, c = x.shape
    head_dim = c // num_heads
    q = linear(p["q"], x).reshape(b, t, num_heads, head_dim) * head_dim ** -0.5
    k = linear(p["k"], x).reshape(b, t, num_heads, head_dim)
    v = linear(p["v"], x).reshape(b, t, num_heads, head_dim)
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
    if "rel_values" in p:
        # x_tz term of _relative_attention_inner (relative:338-367) with
        # z = rel_values[relpos]: out[b,q,h] += sum_k probs[q,k] z[q,k]
        rel = p["rel_values"][_relative_positions_matrix(
            t, max_relative_length)].astype(v.dtype)       # (Tq, Tk, D)
        out = out + jnp.einsum("bhqk,qkd->bqhd", probs.astype(v.dtype), rel,
                               preferred_element_type=v.dtype)
    out = linear(p["out"], out.reshape(b, t, c))
    return out, (weights if need_weights else None)


# ---------------------------------------------------------------------------
# ConvolutionModule
# ---------------------------------------------------------------------------

def conv_module_init(key, channels: int, kernel_size: int,
                     norm: str = "batch_norm") -> Tuple[Params, Params]:
    """Returns (params, batch-norm stats — {} for layer_norm)."""
    assert (kernel_size - 1) % 2 == 0, "kernel must be odd (convolution.py:48)"
    k1, k2, k3 = jax.random.split(key, 3)
    # torch Conv1d default init == uniform_fan over in_ch*kernel
    from .core import conv1d_init
    p = {
        "pw1": conv1d_init(k1, channels, 2 * channels, 1),
        "dw": _depthwise_conv_init(k2, channels, kernel_size),
        "pw2": conv1d_init(k3, channels, channels, 1),
    }
    stats: Params = {}
    if norm == "batch_norm":
        p["norm"] = batch_norm_init(channels)
        stats = batch_norm_stats_init(channels)
    else:
        p["norm"] = layer_norm_init(channels)
    return p, stats


def _depthwise_conv_init(key, channels: int, kernel: int) -> Params:
    # torch Conv1d(groups=channels): weight (C, 1, K), fan_in = K
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(kernel)
    w = jax.random.uniform(kw, (kernel, channels), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (channels,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def _depthwise_conv1d(p: Params, x: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Per-channel conv over time. x: (B, T, C); kernel (K, C)."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, p["w"][:, None, :].astype(x.dtype),   # (K, 1, C) grouped kernel
        window_strides=(1,), padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
        preferred_element_type=x.dtype)
    return y + p["b"].astype(x.dtype)


def conv_module(p: Params, stats: Params, x: jnp.ndarray,
                padding_mask: jnp.ndarray, kernel_size: int,
                norm: str = "batch_norm", *, train: bool = False
                ) -> Tuple[jnp.ndarray, Params]:
    """ConvolutionModule.forward (convolution.py:78-114). x: (B, T, C);
    padding_mask: (B, T) True at PAD (zeroed before conv1 and after conv2,
    and — like the reference — pad rows are still INCLUDED in the BN batch
    statistics). Returns (y, new_bn_stats)."""
    keep = ~padding_mask[:, :, None]
    x = jnp.where(keep, x, 0.0)
    from .core import conv1d
    x = glu(conv1d(p["pw1"], x), axis=-1)
    x = _depthwise_conv1d(p["dw"], x, (kernel_size - 1) // 2)
    if norm == "batch_norm":
        x, new_stats = batch_norm(p["norm"], stats, x, train=train)
    else:
        x, new_stats = layer_norm(p["norm"], x), stats
    x = x * jax.nn.sigmoid(x)                     # Swish
    x = conv1d(p["pw2"], x)
    x = jnp.where(keep, x, 0.0)
    return x, new_stats


# ---------------------------------------------------------------------------
# ConformerEncoderLayer
# ---------------------------------------------------------------------------

def conformer_layer_init(key, cfg: ConformerConfig) -> Tuple[Params, Params]:
    """Returns (params, bn_stats). Param-tree keys mirror the torch module
    names so checkpoint import stays mechanical."""
    ks = jax.random.split(key, 8)
    d, f = cfg.embed_dim, cfg.ffn_dim
    if cfg.attn_type == "rel_selfattn":
        attn = rel_position_mha_init(ks[0], d, cfg.num_heads)
    elif cfg.attn_type == "relative":
        attn = relative_mha_init(ks[0], d, cfg.num_heads,
                                 cfg.max_relative_length, cfg.relative_k_only)
    else:
        attn = mha_init(ks[0], d, cfg.num_heads)
    p: Params = {
        "self_attn": attn,
        "self_attn_ln": layer_norm_init(d),
        "fc1": linear_init(ks[1], d, f),
        "fc2": linear_init(ks[2], f, d),
        "ffn_ln": layer_norm_init(d),
    }
    stats: Params = {}
    if cfg.macaron_style:
        p["macaron_fc1"] = linear_init(ks[3], d, f)
        p["macaron_fc2"] = linear_init(ks[4], f, d)
        p["macaron_ln"] = layer_norm_init(d)
    if cfg.use_cnn_module:
        p["conv_ln"] = layer_norm_init(d)
        p["conv"], stats = conv_module_init(ks[5], d, cfg.cnn_module_kernel,
                                            cfg.cnn_norm)
        p["final_ln"] = layer_norm_init(d)
    return p, stats


def _ffn(p: Params, pre: str, cfg: ConformerConfig, x, rng, deterministic):
    act = get_activation(cfg.activation)
    x = act(linear(p[pre + "fc1"], x))
    x = dropout(x, cfg.activation_dropout, rng, deterministic)
    return linear(p[pre + "fc2"], x)


def conformer_layer(p: Params, stats: Params, cfg: ConformerConfig,
                    x: jnp.ndarray, padding_mask: Optional[jnp.ndarray],
                    attn_mask: Optional[jnp.ndarray] = None,
                    pos_emb: Optional[jnp.ndarray] = None,
                    rng=None, deterministic: bool = True,
                    train: bool = False) -> Tuple[jnp.ndarray, Params]:
    """ConformerEncoderLayer.forward (conformer_layer.py:170-266).

    x: (B, T, C); padding_mask: (B, T) True at PAD; attn_mask: optional
    (T, T) bool, True = masked (converted to -1e8 additive like :196-198);
    pos_emb required when cfg.attn_type == "rel_selfattn".
    Returns (y, new_bn_stats).
    """
    rngs = split_rngs(rng, 7)
    ffn_scale = 0.5 if cfg.macaron_style else 1.0
    add_mask = None
    if attn_mask is not None:
        add_mask = jnp.where(attn_mask, -1e8, 0.0).astype(jnp.float32)

    if cfg.macaron_style:
        residual = x
        if cfg.normalize_before:
            x = layer_norm(p["macaron_ln"], x)
        x = _ffn(p, "macaron_", cfg, x, rngs[0], deterministic)
        x = residual + ffn_scale * dropout(x, cfg.dropout, rngs[1],
                                           deterministic)
        if not cfg.normalize_before:
            x = layer_norm(p["macaron_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(p["self_attn_ln"], x)
    if cfg.attn_type == "rel_selfattn":
        assert pos_emb is not None, "Positions is necessary for RPE!"
        x, _ = rel_position_mha(p["self_attn"], x, pos_emb, cfg.num_heads,
                                key_padding_mask=padding_mask,
                                attn_mask=add_mask,
                                dropout_rate=cfg.attention_dropout,
                                rng=rngs[2], deterministic=deterministic)
    elif cfg.attn_type == "relative":
        x, _ = relative_mha(p["self_attn"], x, cfg.num_heads,
                            cfg.max_relative_length,
                            key_padding_mask=padding_mask,
                            attn_mask=add_mask,
                            dropout_rate=cfg.attention_dropout,
                            rng=rngs[2], deterministic=deterministic)
    else:
        x, _ = mha(p["self_attn"], x, x, x, cfg.num_heads,
                   key_padding_mask=padding_mask, attn_mask=add_mask,
                   dropout_rate=cfg.attention_dropout, rng=rngs[2],
                   deterministic=deterministic)
    x = dropout(x, cfg.dropout, rngs[3], deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(p["self_attn_ln"], x)

    new_stats = stats
    if cfg.use_cnn_module:
        if not cfg.normalize_before and padding_mask is not None:
            # bug-compatible: the reference's ConvolutionModule masked_fill_
            # (convolution.py:96) writes in-place through a transpose VIEW of
            # its input; with normalize_before=False that input IS `residual`
            # (conformer_layer.py:239-245 — no conv_norm copy in between), so
            # the reference zeroes the residual's pad rows before the add.
            x = jnp.where(padding_mask[:, :, None], 0.0, x)
        residual = x
        if cfg.normalize_before:
            x = layer_norm(p["conv_ln"], x)
        pm = padding_mask if padding_mask is not None else \
            jnp.zeros(x.shape[:2], bool)
        x, new_stats = conv_module(p["conv"], stats, x, pm,
                                   cfg.cnn_module_kernel, cfg.cnn_norm,
                                   train=train)
        x = residual + dropout(x, cfg.dropout, rngs[4], deterministic)
        if not cfg.normalize_before:
            x = layer_norm(p["conv_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(p["ffn_ln"], x)
    x = _ffn(p, "", cfg, x, rngs[6], deterministic)
    x = residual + ffn_scale * dropout(x, cfg.dropout, rngs[5], deterministic)
    if not cfg.normalize_before:
        x = layer_norm(p["ffn_ln"], x)

    if cfg.use_cnn_module:
        x = layer_norm(p["final_ln"], x)
    return x, new_stats


# ---------------------------------------------------------------------------
# VGGBlock
# ---------------------------------------------------------------------------

def _conv2d_init(key, in_ch, out_ch, kh, kw):
    kk, kb = jax.random.split(key)
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kk, (kh, kw, in_ch, out_ch),
                           minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (out_ch,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def vgg_block_init(key, in_channels: int, out_channels: int,
                   conv_kernel_size, num_conv_layers: int, input_dim: int,
                   conv_stride=1, padding=None, use_layer_norm: bool = False
                   ) -> Params:
    kh, kw = _pair(conv_kernel_size)
    sh, sw = _pair(conv_stride)
    ph, pw = (kh // 2, kw // 2) if padding is None else _pair(padding)
    p: Params = {}
    dim = input_dim
    for i, k in enumerate(jax.random.split(key, num_conv_layers)):
        p[f"conv{i}"] = _conv2d_init(k, in_channels if i == 0 else
                                     out_channels, out_channels, kh, kw)
        dim = (dim + 2 * pw - kw) // sw + 1
        if use_layer_norm:
            p[f"ln{i}"] = layer_norm_init(dim)
    return p


def _pair(v):
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return tuple(v)
    return (v, v)


def _ceil_pool2d(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """MaxPool2d(kernel, ceil_mode=True) over NHWC spatial dims; torch's
    default stride == kernel."""
    kh, kw = _pair(kernel)
    pads = []
    for size, k in ((x.shape[1], kh), (x.shape[2], kw)):
        out = -(-max(size - k, 0) // k) + 1            # ceil division
        pads.append(max(0, (out - 1) * k + k - size))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, kh, kw, 1),
        [(0, 0), (0, pads[0]), (0, pads[1]), (0, 0)])


def vgg_block(p: Params, x: jnp.ndarray, num_conv_layers: int,
              conv_kernel_size, pooling_kernel_size, conv_stride=1,
              padding=None, use_layer_norm: bool = False) -> jnp.ndarray:
    """VGGBlock.forward. x: (B, T, F, C) NHWC (the reference uses NCHW
    (B, C, T, F)); LayerNorm, when enabled, normalizes the F axis — torch's
    nn.LayerNorm(per_channel_dim) over the trailing W dim of NCHW."""
    kh, kw = _pair(conv_kernel_size)
    sh, sw = _pair(conv_stride)
    ph, pw = (kh // 2, kw // 2) if padding is None else _pair(padding)
    for i in range(num_conv_layers):
        w = p[f"conv{i}"]["w"].astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype) + p[f"conv{i}"]["b"].astype(x.dtype)
        if use_layer_norm:
            # normalize over F (axis 2): move F last, LN, move back
            x = jnp.swapaxes(layer_norm(p[f"ln{i}"],
                                        jnp.swapaxes(x, 2, 3)), 2, 3)
        x = jax.nn.relu(x)
    if pooling_kernel_size is not None:
        x = _ceil_pool2d(x, pooling_kernel_size)
    return x
