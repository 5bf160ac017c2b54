"""transformer_align: jointly learning to align and translate
(Garg et al., EMNLP 2019).

Parity: ``fairseq/models/transformer_align.py`` — a standard text
transformer whose decoder exposes the cross-attention of ONE supervised
layer (``--alignment-layer``, 0 = bottommost), averaged over the FIRST
``--alignment-heads`` heads (transformer_decoder.py:
``attn[:alignment_heads].mean(dim=0)``), plus the optional
``--full-context-alignment`` second decoder pass WITHOUT the causal mask
whose attention replaces the supervised one (:53-78). Trained with
``label_smoothed_cross_entropy_with_alignment``
(criterions/label_smoothed_cross_entropy_with_alignment.py): LS-CE +
``--alignment-lambda`` * the negative log of the supervised attention at
each aligned (src, tgt) index pair, weighted 1/freq of the target index.

TPU note: the alignment pass shares the encoder output; XLA CSEs the two
decoder passes' shared subgraphs where possible, and ragged alignment
pairs arrive as a fixed-width padded (A, 2) buffer whose padding carries
zero weight (exactly invariant, static shapes for jit).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.core import Params, dropout, embedding, layer_norm, split_rngs
from ..nn.transformer import causal_mask, decoder_layer
from . import transformer_text as tt

PAD = tt.PAD


@dataclass(frozen=True)
class TransformerAlignConfig:
    base: tt.TransformerTextConfig = dataclasses.field(
        default_factory=tt.TransformerTextConfig)
    alignment_heads: int = 1
    alignment_layer: int = 4
    full_context_alignment: bool = False

    def replace(self, **kw) -> "TransformerAlignConfig":
        return dataclasses.replace(self, **kw)


def init_transformer_align(key, cfg: TransformerAlignConfig
                           ) -> Dict[str, Params]:
    return tt.init_transformer(key, cfg.base)


def _decode_with_attn(p: Params, cfg: TransformerAlignConfig,
                      prev_tokens, enc_out, enc_padding_mask, *,
                      full_context: bool, rng, deterministic: bool):
    """Sinusoidal-position decode capturing the supervised layer's
    head-sliced mean cross-attention. Returns (features, attn (B,Tt,Ts))."""
    b = cfg.base
    dim = b.decoder_embed_dim
    _, tt_ = prev_tokens.shape
    scale = 1.0 if b.no_scale_embedding else dim ** 0.5
    x = embedding(p["embed"], prev_tokens, b.dtype) \
        * jnp.asarray(scale, b.dtype)
    x = x + tt._positions(prev_tokens, dim, b.max_target_positions, b.dtype)
    if "embed_ln" in p:
        x = layer_norm(p["embed_ln"], x)
    rngs = split_rngs(rng, b.decoder_layers + 1)
    x = dropout(x, b.dropout, rngs[-1], deterministic)
    mask = None if full_context else causal_mask(tt_)
    is_pad = prev_tokens == PAD
    attn = None
    for i in range(b.decoder_layers):
        x, w = decoder_layer(
            p[f"layer{i}"], x, enc_out, enc_padding_mask, mask, is_pad,
            b.decoder_attention_heads,
            normalize_before=b.decoder_normalize_before,
            activation=b.activation_fn, dropout_rate=b.dropout,
            attn_dropout=b.attention_dropout,
            act_dropout=b.activation_dropout,
            rng=rngs[i], deterministic=deterministic,
            need_attn=(i == cfg.alignment_layer))
        if i == cfg.alignment_layer and w is not None:
            # (B, H, Tt, Ts) -> first alignment_heads heads, mean
            attn = jnp.mean(w[:, :cfg.alignment_heads], axis=1)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    return x, attn


def forward(variables: Dict[str, Params], cfg: TransformerAlignConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """-> {"logits", "attn" (B, Tt, Ts) supervised alignment attention}."""
    b = cfg.base
    r_enc, r_dec, r_al = split_rngs(rng, 3)
    enc = tt.encode(variables, b, batch["src_tokens"], rng=r_enc,
                    deterministic=deterministic)
    p = tt.decoder_view(variables["params"], b)
    feats, attn = _decode_with_attn(
        p, cfg, batch["prev_output_tokens"], enc["encoder_out"],
        enc["encoder_padding_mask"], full_context=False, rng=r_dec,
        deterministic=deterministic)
    if cfg.full_context_alignment:
        _, attn = _decode_with_attn(
            p, cfg, batch["prev_output_tokens"], enc["encoder_out"],
            enc["encoder_padding_mask"], full_context=True, rng=r_al,
            deterministic=deterministic)
    logits = jnp.dot(feats, p["out_proj"]["w"].astype(feats.dtype),
                     preferred_element_type=jnp.float32)
    return {"logits": logits, "attn": attn,
            "encoder_padding_mask": enc["encoder_padding_mask"],
            "new_stats": {}}
