"""RoBERTa (masked-LM encoder) model family.

Parity: ``fairseq/models/roberta/model.py`` — post-norm transformer
encoder with LEARNED pad-aware positional embeddings, embedding layernorm,
gelu activations, no embed scaling; the LM head = dense -> gelu ->
layernorm -> tied output projection + free bias (:366-391); sentence
classification heads pool the <s> feature through dense/tanh/out_proj
(:394-430). Arch zoo: roberta (base 12x768), roberta_large, roberta_base,
roberta_prenorm (:547-551 — pre-LN layers, no embedding LN, final LN), xlm
(:588-594), and the model_parallel_roberta geometry aliases
(model_parallel/models/roberta/model.py:192-226; tensor parallelism is a
mesh axis here, so the archs reduce to their pre/post-norm geometry —
model_parallel_roberta_v1 drops the final LN via ``no_final_layer_norm``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.core import (Params, dropout, embedding, embedding_init,
                       layer_norm, layer_norm_init, linear, linear_init,
                       split_rngs)
from ..nn.transformer import encoder_layer, encoder_layer_init

PAD = 1


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    pooler_dropout: float = 0.0
    activation_fn: str = "gelu"
    pooler_activation_fn: str = "tanh"
    max_positions: int = 512
    untie_weights_roberta: bool = False
    # roberta_prenorm / model_parallel_roberta formulation knobs
    # (roberta/model.py:547-551, model_parallel/.../roberta/model.py:192-203)
    normalize_before: bool = False
    layernorm_embedding: bool = True
    no_final_layer_norm: bool = False
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "RobertaConfig":
        return dataclasses.replace(self, **kw)


def init_roberta(key, cfg: RobertaConfig) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, cfg.encoder_layers + 8))
    dim = cfg.encoder_embed_dim
    enc: Params = {
        "embed": embedding_init(next(ks), cfg.vocab_size, dim,
                                padding_idx=PAD),
        # LearnedPositionalEmbedding: rows 0..pad unused-ish; valid
        # position t uses row t + pad + 1
        "embed_positions": embedding_init(
            next(ks), cfg.max_positions + PAD + 1, dim, padding_idx=PAD),
    }
    if cfg.layernorm_embedding:
        enc["embed_ln"] = layer_norm_init(dim)
    if cfg.normalize_before and not cfg.no_final_layer_norm:
        enc["final_ln"] = layer_norm_init(dim)
    for i in range(cfg.encoder_layers):
        enc[f"layer{i}"] = encoder_layer_init(
            next(ks), dim, cfg.encoder_ffn_embed_dim,
            cfg.encoder_attention_heads)
    lm_head: Params = {
        "dense": linear_init(next(ks), dim, dim),
        "ln": layer_norm_init(dim),
        "bias": jnp.zeros((cfg.vocab_size,)),
    }
    if cfg.untie_weights_roberta:
        lm_head["weight"] = {"w": jax.random.normal(
            next(ks), (dim, cfg.vocab_size)) * (dim ** -0.5)}
    return {"params": {"encoder": enc, "lm_head": lm_head},
            "stats": {}}


def init_classification_head(key, cfg: RobertaConfig, num_classes: int,
                             inner_dim: Optional[int] = None) -> Params:
    inner = inner_dim or cfg.encoder_embed_dim
    k1, k2 = jax.random.split(key)
    return {"dense": linear_init(k1, cfg.encoder_embed_dim, inner),
            "out_proj": linear_init(k2, inner, num_classes)}


def extract_features(variables: Dict[str, Params], cfg: RobertaConfig,
                     tokens: jnp.ndarray, rng: Optional[jax.Array] = None,
                     deterministic: bool = True) -> jnp.ndarray:
    """(B, T) -> (B, T, C): the RoBERTa encoder trunk."""
    p = variables["params"]["encoder"]
    is_pad = tokens == PAD
    x = embedding(p["embed"], tokens, cfg.dtype)   # no_scale_embedding
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    pos_idx = jnp.where(is_pad, PAD, cum + PAD)
    x = x + embedding(p["embed_positions"], pos_idx, cfg.dtype)
    if cfg.layernorm_embedding:
        x = layer_norm(p["embed_ln"], x)
    rngs = split_rngs(rng, cfg.encoder_layers + 1)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)
    for i in range(cfg.encoder_layers):
        x = encoder_layer(
            p[f"layer{i}"], x, is_pad, cfg.encoder_attention_heads,
            normalize_before=cfg.normalize_before,
            activation=cfg.activation_fn,
            dropout_rate=cfg.dropout, attn_dropout=cfg.attention_dropout,
            act_dropout=cfg.activation_dropout,
            rng=rngs[i], deterministic=deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    return x


def lm_head(variables: Dict[str, Params], cfg: RobertaConfig,
            features: jnp.ndarray) -> jnp.ndarray:
    """(..., C) -> (..., V) (RobertaLMHead :380-391)."""
    h = variables["params"]["lm_head"]
    from ..nn.core import get_activation
    x = get_activation(cfg.activation_fn)(linear(h["dense"], features))
    x = layer_norm(h["ln"], x)
    w = h["weight"]["w"] if "weight" in h else \
        variables["params"]["encoder"]["embed"]["w"].T
    return jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32) + h["bias"]


def forward(variables: Dict[str, Params], cfg: RobertaConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    feats = extract_features(variables, cfg, batch["src_tokens"], rng=rng,
                             deterministic=deterministic)
    return {"logits": lm_head(variables, cfg, feats),
            "features": feats, "new_stats": {}}


def classification_forward(variables: Dict[str, Params],
                           cfg: RobertaConfig, head: Params,
                           tokens: jnp.ndarray,
                           rng: Optional[jax.Array] = None,
                           deterministic: bool = True) -> jnp.ndarray:
    """Sentence classification logits (RobertaClassificationHead
    :422-430: pool the <s> position)."""
    from ..nn.core import get_activation
    r1, r2, r3 = split_rngs(rng, 3)
    feats = extract_features(variables, cfg, tokens, rng=r1,
                             deterministic=deterministic)
    x = feats[:, 0, :]
    x = dropout(x, cfg.pooler_dropout, r2, deterministic)
    x = get_activation(cfg.pooler_activation_fn)(
        linear(head["dense"], x))
    x = dropout(x, cfg.pooler_dropout, r3, deterministic)
    return linear(head["out_proj"], x)
