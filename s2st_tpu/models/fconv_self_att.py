"""fconv_self_att: the hierarchical-stories ConvS2S with self-attention
(Fan et al. 2018).

Parity: ``fairseq/models/fconv_self_att.py`` — GLU conv encoder/decoder
with LEARNED positions (normal(0, 0.1) init), per-layer
DownsampledMultiHeadAttention cross-attention fed ``attproj(x) +
target_embedding`` with a residual around it, and SelfAttention blocks
(``fairseq/modules/downsampled_multihead_attention.py``): strictly-causal
masking (tril diagonal=-1 — a position may NOT attend to itself), a
zero scalar-bias slot prepended to keys/values so position 0 has
something to attend to, optional GatedLinear (GLU-MLP) projections,
optional per-head time DOWNSAMPLING (head h reads every (h+1)-th step),
and LayerNorm(x + residual). The DMHA projections are weight-normalized
(folded at import); the model-level Linears are plain.

The fusion path (``--pretrained`` gated joining with a frozen earlier
model, :427-534) composes two instances: ``forward`` takes an optional
``pretrained`` bundle of (variables, cfg) whose decoder fc2 output is
gated against the trained one exactly like the reference hooks.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import (Params, dropout, embedding, layer_norm,
                       layer_norm_init, split_rngs)
from .fconv import _conv_tbc, _glu, _lin

PAD = 1
NEG_INF = -1e9


@dataclass(frozen=True)
class FConvSelfAttConfig:
    src_vocab_size: int = 1000
    tgt_vocab_size: int = 1000
    encoder_embed_dim: int = 512
    encoder_convs: Tuple[Tuple[int, int], ...] = ((512, 3),) * 3
    decoder_embed_dim: int = 512
    decoder_convs: Tuple[Tuple[int, int], ...] = ((512, 3),) * 8
    decoder_out_embed_dim: int = 256
    decoder_attention: Tuple[bool, ...] = (True,) * 8
    self_attention: Tuple[bool, ...] = (False,) * 8
    encoder_attention: Tuple[bool, ...] = (False,) * 3
    attention_nheads: int = 1
    selfattention_nheads: int = 1
    encoder_attention_nheads: int = 1
    project_input: bool = False
    gated_attention: bool = False
    downsample: bool = False
    dropout: float = 0.1
    max_source_positions: int = 1024
    max_target_positions: int = 1024
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "FConvSelfAttConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _norm_init(key, shape, std):
    return jax.random.normal(key, shape) * std


def _lin_init(key, i, o, dropout_p=0.0, bias=True):
    kw, kb = jax.random.split(key)
    p = {"w": _norm_init(kw, (i, o), math.sqrt((1 - dropout_p) / i))}
    if bias:
        p["b"] = jnp.zeros((o,))
    return p


def _conv_init(key, i, o, k, dropout_p=0.0):
    kw, kb = jax.random.split(key)
    std = math.sqrt((4 * (1.0 - dropout_p)) / (k * i))
    return {"w": _norm_init(kw, (k, i, o), std), "b": jnp.zeros((o,))}


def _dmha_init(key, cfg: FConvSelfAttConfig, out_channels: int,
               embed_dim: int, num_heads: int, project_input: bool,
               gated: bool, downsample: bool) -> Params:
    ks = iter(jax.random.split(key, 12 * max(num_heads, 1) + 4))
    head_dim = embed_dim // num_heads

    def lin(i, o):
        return _lin_init(next(ks), i, o)

    def glin(i, o):
        return {"l1": lin(i, o * 4), "l2": lin(o * 2, o * 2),
                "l3": lin(o, o)}

    mk = glin if gated else lin
    p: Params = {}
    if downsample:
        for h in range(num_heads):
            hp: Params = {}
            if project_input:
                hp["q"] = mk(embed_dim, head_dim)
                hp["k"] = mk(embed_dim, head_dim)
                hp["v"] = mk(embed_dim, head_dim)
            hp["out"] = lin(head_dim, head_dim)
            p[f"head{h}"] = hp
        p["out_proj"] = lin(embed_dim, out_channels)
    else:
        if project_input:
            p["q"] = mk(embed_dim, embed_dim)
            p["k"] = mk(embed_dim, embed_dim)
            p["v"] = mk(embed_dim, embed_dim)
        p["out"] = lin(embed_dim, out_channels)
    return p


def _selfattn_init(key, cfg, out_channels, embed_dim, num_heads,
                   project_input=False, gated=False, downsample=False
                   ) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "in_proj_q": _lin_init(k1, out_channels, embed_dim),
        "in_proj_k": _lin_init(k2, out_channels, embed_dim),
        "in_proj_v": _lin_init(k3, out_channels, embed_dim),
        "attn": _dmha_init(k4, cfg, out_channels, embed_dim, num_heads,
                           project_input, gated, downsample),
        "ln": layer_norm_init(out_channels),
    }


def init_fconv_self_att(key, cfg: FConvSelfAttConfig) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, 256))
    d = cfg.encoder_embed_dim
    enc: Params = {
        "embed": {"w": _norm_init(next(ks), (cfg.src_vocab_size, d), 0.1)},
        "embed_positions": {"w": _norm_init(
            next(ks), (cfg.max_source_positions + PAD + 1, d), 0.1)},
        "fc1": _lin_init(next(ks), d, cfg.encoder_convs[0][0],
                         cfg.dropout),
    }
    in_ch = cfg.encoder_convs[0][0]
    for i, (out_ch, k) in enumerate(cfg.encoder_convs):
        if in_ch != out_ch:
            enc[f"proj{i}"] = _lin_init(next(ks), in_ch, out_ch)
        enc[f"conv{i}"] = _conv_init(next(ks), in_ch, out_ch * 2, k,
                                     cfg.dropout)
        if cfg.encoder_attention[i]:
            # encoder SelfAttention uses the DEFAULT flags (fconv_self_att
            # .py:225-229 passes only out_channels/embed_dim/nheads)
            enc[f"selfattn{i}"] = _selfattn_init(
                next(ks), cfg, out_ch, d, cfg.encoder_attention_nheads)
        in_ch = out_ch
    enc["fc2"] = _lin_init(next(ks), in_ch, d)

    dd = cfg.decoder_embed_dim
    dec: Params = {
        "embed": {"w": _norm_init(next(ks), (cfg.tgt_vocab_size, dd), 0.1)},
        "embed_positions": {"w": _norm_init(
            next(ks), (cfg.max_target_positions + PAD + 1, dd), 0.1)},
        "fc1": _lin_init(next(ks), dd, cfg.decoder_convs[0][0],
                         cfg.dropout),
    }
    in_ch = cfg.decoder_convs[0][0]
    for i, (out_ch, k) in enumerate(cfg.decoder_convs):
        if in_ch != out_ch:
            dec[f"proj{i}"] = _lin_init(next(ks), in_ch, out_ch)
        dec[f"conv{i}"] = _conv_init(next(ks), in_ch, out_ch * 2, k,
                                     cfg.dropout)
        if cfg.decoder_attention[i]:
            dec[f"attn{i}"] = _dmha_init(
                next(ks), cfg, out_ch, dd, cfg.attention_nheads,
                cfg.project_input, gated=False, downsample=False)
            dec[f"attproj{i}"] = _lin_init(next(ks), out_ch, dd,
                                           cfg.dropout)
        if cfg.self_attention[i]:
            dec[f"selfattn{i}"] = _selfattn_init(
                next(ks), cfg, out_ch, dd, cfg.selfattention_nheads,
                cfg.project_input, cfg.gated_attention, cfg.downsample)
        in_ch = out_ch
    dec["fc2"] = _lin_init(next(ks), in_ch, cfg.decoder_out_embed_dim)
    dec["fc3"] = _lin_init(next(ks), cfg.decoder_out_embed_dim,
                           cfg.tgt_vocab_size, cfg.dropout)
    return {"params": {"encoder": enc, "decoder": dec}, "stats": {}}


# ---------------------------------------------------------------------------
# DownsampledMultiHeadAttention
# ---------------------------------------------------------------------------

def _maybe_gated(p, x, gated: bool):
    if not gated:
        return _lin(p, x)
    h = _glu(_lin(p["l1"], x))
    h = _glu(_lin(p["l2"], h))
    return _lin(p["l3"], h)


def _single_head(p, q, k, v, head_dim, num_heads, *, project_input,
                 gated, downsample, head_index, mask_future, scalar_bias):
    """SingleHeadAttention (downsampled_multihead_attention.py:57-168) in
    batch-major (B, T, E)."""
    b, tgt_len, _ = q.shape
    if downsample:
        k = k[:, ::head_index + 1]
        v = v[:, ::head_index + 1]
    if project_input:
        q = _maybe_gated(p["q"], q, gated)
        k = _maybe_gated(p["k"], k, gated)
        v = _maybe_gated(p["v"], v, gated)
    size_per = head_dim if downsample else head_dim  # both project to slices
    q = q * (head_dim ** -0.5)
    if not downsample:
        # fold heads into batch: (B, T, H*hd) -> (B*H, T, hd)
        def fold(x):
            t = x.shape[1]
            return x.reshape(b, t, num_heads, head_dim) \
                .transpose(0, 2, 1, 3).reshape(b * num_heads, t, head_dim)
        q, k, v = fold(q), fold(k), fold(v)
    w = jnp.einsum("bqd,bkd->bqk", q, k)
    if mask_future:
        # strictly causal: a position may not attend to itself
        rows = jnp.arange(tgt_len)[:, None]
        src_idx = jnp.arange(w.shape[2]) * (head_index + 1 if downsample
                                            else 1)
        allowed = src_idx[None, :] < rows
        w = jnp.where(allowed[None], w, NEG_INF)
    if scalar_bias:
        # prepend a zero bias slot to keys/values (scalar_bias.py)
        w = jnp.concatenate(
            [jnp.zeros(w.shape[:2] + (1,), w.dtype), w], axis=2)
        v = jnp.concatenate(
            [jnp.zeros((v.shape[0], 1, v.shape[2]), v.dtype), v], axis=1)
    w = jax.nn.softmax(w, axis=-1)
    attn = jnp.einsum("bqk,bkd->bqd", w, v)
    if not downsample:
        attn = attn.reshape(b, num_heads, tgt_len, head_dim) \
            .transpose(0, 2, 1, 3).reshape(b, tgt_len,
                                           num_heads * head_dim)
    attn = _lin(p["out"], attn)
    return attn, w


def _dmha(p, q, k, v, embed_dim, num_heads, *, project_input, gated,
          downsample, mask_future=False, scalar_bias=False):
    head_dim = embed_dim // num_heads
    if downsample:
        outs = []
        w0 = None
        for h in range(num_heads):
            o, w = _single_head(
                p[f"head{h}"], q, k, v, head_dim, num_heads,
                project_input=project_input, gated=gated, downsample=True,
                head_index=h, mask_future=mask_future,
                scalar_bias=scalar_bias)
            outs.append(o)
            if h == 0:
                w0 = w
        full = jnp.concatenate(outs, axis=2)
        return _lin(p["out_proj"], full), w0
    o, w = _single_head(p, q, k, v, head_dim, num_heads,
                        project_input=project_input, gated=gated,
                        downsample=False, head_index=1,
                        mask_future=mask_future, scalar_bias=scalar_bias)
    b = q.shape[0]
    w = w.reshape(b, num_heads, w.shape[1], w.shape[2]).sum(1) / num_heads
    return o, w


def _self_attention(p, cfg: FConvSelfAttConfig, x, num_heads,
                    embed_dim: int, project_input=False, gated=False,
                    downsample=False):
    """SelfAttention block (fconv_self_att.py:556-590)."""
    residual = x
    q = _lin(p["in_proj_q"], x)
    k = _lin(p["in_proj_k"], x)
    v = _lin(p["in_proj_v"], x)
    out, _ = _dmha(p["attn"], q, k, v, embed_dim, num_heads,
                   project_input=project_input,
                   gated=gated, downsample=downsample,
                   mask_future=True, scalar_bias=True)
    return layer_norm(p["ln"], out + residual)


def _positions(p, tokens, dtype):
    is_pad = tokens == PAD
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    idx = jnp.where(is_pad, PAD, cum + PAD)
    return embedding(p["embed_positions"], idx, dtype)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def encode(variables: Dict[str, Params], cfg: FConvSelfAttConfig,
           src_tokens: jnp.ndarray, num_attention_layers: int,
           rng=None, deterministic: bool = True) -> Dict[str, Any]:
    p = variables["params"]["encoder"]
    rngs = split_rngs(rng, len(cfg.encoder_convs) + 2)
    x = embedding(p["embed"], src_tokens, cfg.dtype) \
        + _positions(p, src_tokens, cfg.dtype)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)
    input_embedding = x
    x = _lin(p["fc1"], x)
    pad_mask = src_tokens == PAD
    scale = math.sqrt(0.5)
    for i, (out_ch, k) in enumerate(cfg.encoder_convs):
        residual = _lin(p[f"proj{i}"], x) if f"proj{i}" in p else x
        x = jnp.where(pad_mask[:, :, None], 0.0, x)
        x = dropout(x, cfg.dropout, rngs[i], deterministic)
        x = _conv_tbc(p[f"conv{i}"], x, (k - 1) // 2, k // 2)
        x = _glu(x)
        if f"selfattn{i}" in p:
            x = _self_attention(p[f"selfattn{i}"], cfg, x,
                                cfg.encoder_attention_nheads,
                                cfg.encoder_embed_dim)  # default flags
        x = (x + residual) * scale
    x = _lin(p["fc2"], x)
    x = jnp.where(pad_mask[:, :, None], 0.0, x)
    # GradMultiply 1/(2*num_attention_layers)
    g = 1.0 / max(2.0 * num_attention_layers, 1.0)
    x = x * g + jax.lax.stop_gradient(x * (1.0 - g))
    y = (x + input_embedding) * scale
    return {"encoder_a": x, "encoder_b": y, "encoder_padding_mask": pad_mask}


def decode(variables: Dict[str, Params], cfg: FConvSelfAttConfig,
           prev_tokens: jnp.ndarray, enc: Dict[str, Any], rng=None,
           deterministic: bool = True, features_only: bool = False
           ) -> jnp.ndarray:
    p = variables["params"]["decoder"]
    rngs = split_rngs(rng, 2 * len(cfg.decoder_convs) + 3)
    x = embedding(p["embed"], prev_tokens, cfg.dtype) \
        + _positions(p, prev_tokens, cfg.dtype)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)
    target_embedding = x
    x = _lin(p["fc1"], x)
    scale = math.sqrt(0.5)
    for i, (out_ch, k) in enumerate(cfg.decoder_convs):
        residual = _lin(p[f"proj{i}"], x) if f"proj{i}" in p else x
        x = dropout(x, cfg.dropout, rngs[i], deterministic)
        x = _conv_tbc(p[f"conv{i}"], x, k - 1, 0)
        x = _glu(x)
        if f"attn{i}" in p:
            r = x
            q = _lin(p[f"attproj{i}"], x) + target_embedding
            o, _ = _dmha(p[f"attn{i}"], q, enc["encoder_a"],
                         enc["encoder_b"], cfg.decoder_embed_dim,
                         cfg.attention_nheads,
                         project_input=cfg.project_input, gated=False,
                         downsample=False)
            x = o + r
        if f"selfattn{i}" in p:
            x = _self_attention(p[f"selfattn{i}"], cfg, x,
                                cfg.selfattention_nheads,
                                cfg.decoder_embed_dim,
                                cfg.project_input, cfg.gated_attention,
                                cfg.downsample)
        x = (x + residual) * scale
    x = _lin(p["fc2"], x)
    x = dropout(x, cfg.dropout, rngs[-2], deterministic)
    if features_only:
        return x
    return _lin(p["fc3"], x)


def forward(variables: Dict[str, Params], cfg: FConvSelfAttConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False,
            pretrained: Optional[Tuple[Dict, "FConvSelfAttConfig"]] = None
            ) -> Dict[str, Any]:
    """-> {"logits"}; with ``pretrained`` = (variables, cfg) of a frozen
    earlier model, the gated fusion path (:522-535)."""
    n_attn = sum(cfg.decoder_attention)
    r_enc, r_dec, r_f = split_rngs(rng, 3)
    enc = encode(variables, cfg, batch["src_tokens"], n_attn, rng=r_enc,
                 deterministic=deterministic)
    if pretrained is None:
        logits = decode(variables, cfg, batch["prev_output_tokens"], enc,
                        rng=r_dec, deterministic=deterministic)
        return {"logits": logits, "new_stats": {}}
    pvars, pcfg = pretrained
    pvars = jax.tree_util.tree_map(jax.lax.stop_gradient, pvars)
    p_enc = encode(pvars, pcfg, batch["src_tokens"],
                   sum(pcfg.decoder_attention), deterministic=True)
    p_feats = decode(pvars, pcfg, batch["prev_output_tokens"], p_enc,
                     deterministic=True, features_only=True)
    x = decode(variables, cfg, batch["prev_output_tokens"], enc,
               rng=r_dec, deterministic=deterministic,
               features_only=True)
    p = variables["params"]["decoder"]
    y = jnp.concatenate([x, p_feats], axis=-1)
    g1 = jax.nn.sigmoid(_lin(p["gate1"], y))
    g2 = jax.nn.sigmoid(_lin(p["gate2"], y))
    fusion = jnp.concatenate([g1 * x, g2 * p_feats], axis=-1)
    h = _glu(layer_norm(p["join_ln1"], _lin(p["join1"], fusion)))
    h = _glu(layer_norm(p["join_ln2"], _lin(p["join2"], h)))
    h = layer_norm(p["join_ln3"], _lin(p["join3"], h))
    logits = _lin(p["fc3"], h)
    return {"logits": logits, "new_stats": {}}


def init_fusion_params(key, cfg: FConvSelfAttConfig) -> Params:
    """gate1/gate2 + the joining MLP (:427-446), added to the decoder tree
    when --pretrained is on."""
    ks = iter(jax.random.split(key, 8))
    od = cfg.decoder_out_embed_dim
    return {
        "gate1": _lin_init(next(ks), od * 2, od),
        "gate2": _lin_init(next(ks), od * 2, od),
        "join1": _lin_init(next(ks), od * 2, od * 2),
        "join_ln1": layer_norm_init(od * 2),
        "join2": _lin_init(next(ks), od, od * 2),
        "join_ln2": layer_norm_init(od * 2),
        "join3": _lin_init(next(ks), od, od),
        "join_ln3": layer_norm_init(od),
    }
