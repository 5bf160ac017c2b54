"""BERT/XLM-style MaskedLM encoder model (the ``masked_lm`` model family:
``masked_lm`` / ``bert_base`` / ``bert_large`` / ``xlm_base`` archs).

Parity: ``fairseq/models/masked_lm.py`` + the TransformerSentenceEncoder
trunk (``fairseq/modules/transformer_sentence_encoder.py``): padding-idx
token embedding, learned OR pad-aware-sinusoidal positions, optional
segment embeddings, optional embedding layer-norm
(``--encoder-normalize-before`` gates the EMBEDDING norm — the layers
themselves are post-norm BERT style), padding positions zeroed before the
stack, sentence representation = position 0; LM head = dense ->
activation -> LayerNorm -> tied/untied vocab projection + learned bias
(:216-283); pooler (tanh dense on the sentence rep) and the optional NSP
``sentence_projection_layer`` for ``--sent-loss``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.core import (Params, dropout, embedding, embedding_init,
                       get_activation, layer_norm, layer_norm_init, linear,
                       linear_init, split_rngs)
from ..nn.transformer import encoder_layer, encoder_layer_init, \
    sinusoidal_table

PAD = 1


@dataclass(frozen=True)
class MaskedLMXLMConfig:
    vocab_size: int = 1000
    encoder_layers: int = 6
    encoder_embed_dim: int = 1024
    encoder_ffn_embed_dim: int = 4096
    encoder_attention_heads: int = 8
    dropout: float = 0.1
    attention_dropout: float = 0.1
    act_dropout: float = 0.0
    activation_fn: str = "relu"
    pooler_activation_fn: str = "tanh"
    encoder_learned_pos: bool = False
    no_token_positional_embeddings: bool = False
    num_segment: int = 2
    share_encoder_input_output_embed: bool = False
    encoder_normalize_before: bool = False
    sent_loss: bool = False
    sentence_class_num: int = 2
    max_positions: int = 512
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "MaskedLMXLMConfig":
        return dataclasses.replace(self, **kw)


def init_masked_lm_xlm(key, cfg: MaskedLMXLMConfig) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, cfg.encoder_layers + 10))
    dim = cfg.encoder_embed_dim
    enc: Params = {
        "embed": embedding_init(next(ks), cfg.vocab_size, dim,
                                padding_idx=PAD),
    }
    if cfg.encoder_learned_pos and not cfg.no_token_positional_embeddings:
        enc["embed_positions"] = embedding_init(
            next(ks), cfg.max_positions + PAD + 1, dim, padding_idx=PAD)
    if cfg.num_segment > 0:
        enc["segment_embeddings"] = embedding_init(next(ks),
                                                   cfg.num_segment, dim)
    if cfg.encoder_normalize_before:
        enc["emb_ln"] = layer_norm_init(dim)
    for i in range(cfg.encoder_layers):
        enc[f"layer{i}"] = encoder_layer_init(
            next(ks), dim, cfg.encoder_ffn_embed_dim,
            cfg.encoder_attention_heads)
    head: Params = {
        "lm_head_transform_weight": linear_init(next(ks), dim, dim),
        "ln": layer_norm_init(dim),
        "bias": jnp.zeros((cfg.vocab_size,)),
        "masked_lm_pooler": linear_init(next(ks), dim, dim),
    }
    if not cfg.share_encoder_input_output_embed:
        head["embed_out"] = {"w": jax.random.normal(
            next(ks), (dim, cfg.vocab_size)) * (dim ** -0.5)}
    if cfg.sent_loss:
        head["sentence_projection_layer"] = {"w": jax.random.normal(
            next(ks), (dim, cfg.sentence_class_num)) * (dim ** -0.5)}
    return {"params": {"encoder": enc, "head": head}, "stats": {}}


def extract_features(variables: Dict[str, Params], cfg: MaskedLMXLMConfig,
                     tokens: jnp.ndarray,
                     segment_labels: Optional[jnp.ndarray] = None,
                     rng: Optional[jax.Array] = None,
                     deterministic: bool = True) -> jnp.ndarray:
    p = variables["params"]["encoder"]
    is_pad = tokens == PAD
    x = embedding(p["embed"], tokens, cfg.dtype)
    if not cfg.no_token_positional_embeddings:
        cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
        pos_idx = jnp.where(is_pad, PAD, cum + PAD)
        if cfg.encoder_learned_pos:
            x = x + embedding(p["embed_positions"], pos_idx, cfg.dtype)
        else:
            table = sinusoidal_table(cfg.max_positions + PAD + 1,
                                     cfg.encoder_embed_dim, PAD)
            x = x + table[pos_idx].astype(cfg.dtype)
    if cfg.num_segment > 0 and segment_labels is not None:
        x = x + embedding(p["segment_embeddings"], segment_labels,
                          cfg.dtype)
    if "emb_ln" in p:
        x = layer_norm(p["emb_ln"], x)
    rngs = split_rngs(rng, cfg.encoder_layers + 1)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)
    # padding positions zeroed before the stack (tse.py:269-271)
    x = jnp.where(is_pad[:, :, None], 0.0, x)
    for i in range(cfg.encoder_layers):
        x = encoder_layer(
            p[f"layer{i}"], x, is_pad, cfg.encoder_attention_heads,
            normalize_before=False, activation=cfg.activation_fn,
            dropout_rate=cfg.dropout, attn_dropout=cfg.attention_dropout,
            act_dropout=cfg.act_dropout,
            rng=rngs[i], deterministic=deterministic)
    return x


def forward(variables: Dict[str, Params], cfg: MaskedLMXLMConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """-> {"logits" (B, T, V), "pooled_output", "sentence_logits"}."""
    h = variables["params"]["head"]
    x = extract_features(variables, cfg, batch["src_tokens"],
                         segment_labels=batch.get("segment_labels"),
                         rng=rng, deterministic=deterministic)
    sentence_rep = x[:, 0]
    y = get_activation(cfg.activation_fn)(
        linear(h["lm_head_transform_weight"], x))
    y = layer_norm(h["ln"], y)
    if cfg.share_encoder_input_output_embed:
        w = variables["params"]["encoder"]["embed"]["w"].T
    else:
        w = h["embed_out"]["w"]
    logits = jnp.dot(y, w.astype(y.dtype),
                     preferred_element_type=jnp.float32) + h["bias"]
    pooled = get_activation(cfg.pooler_activation_fn)(
        linear(h["masked_lm_pooler"], sentence_rep))
    sentence_logits = None
    if "sentence_projection_layer" in h:
        sentence_logits = jnp.dot(
            pooled, h["sentence_projection_layer"]["w"].astype(pooled.dtype))
    return {"logits": logits, "pooled_output": pooled,
            "sentence_logits": sentence_logits, "new_stats": {}}
