"""Decoder-only transformer language model (fairseq `transformer_lm` archs).

Parity: ``fairseq/models/transformer_lm.py`` (TransformerLanguageModel =
TransformerDecoder with no_encoder_attn=True) — embed_scale * embed +
pad-aware sinusoidal positions, dropout, N pre-LN causal self-attention
layers (base_lm_architecture pins decoder_normalize_before=True), final LN
unless --no-decoder-final-norm, output projection optionally tied to the
input embedding.

A no-cross-attention decoder layer carries exactly the encoder layer's
param set (self_attn / self_attn_ln / fc1 / fc2 / final_ln), so layer init
reuses ``encoder_layer_init`` and fairseq LM checkpoints map through the
same ``_enc_layer`` naming in torch_import.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.core import (Params, dropout, embedding, embedding_init,
                       layer_norm, layer_norm_init, split_rngs)
from ..nn.transformer import (causal_mask, decoder_layer, encoder_layer_init,
                              sinusoidal_table)

PAD, EOS = 1, 2


@dataclass(frozen=True)
class TransformerLMConfig:
    vocab_size: int = 1000
    decoder_layers: int = 6
    decoder_embed_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_attention_heads: int = 8
    # base_lm_architecture: "Model training is not stable without this"
    decoder_normalize_before: bool = True
    no_decoder_final_norm: bool = False
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation_fn: str = "relu"
    no_scale_embedding: bool = False
    share_decoder_input_output_embed: bool = False
    add_bos_token: bool = False
    max_target_positions: int = 1024
    # adaptive input/softmax (wiki103/gbw archs; models/adaptive.py)
    adaptive_input: bool = False
    adaptive_input_cutoff: tuple = ()
    adaptive_input_factor: float = 4.0
    adaptive_softmax_cutoff: tuple = ()
    adaptive_softmax_factor: float = 4.0
    tie_adaptive_weights: bool = False
    tie_adaptive_proj: bool = False
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "TransformerLMConfig":
        return dataclasses.replace(self, **kw)


def init_transformer_lm(key, cfg: TransformerLMConfig) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, cfg.decoder_layers + 5))
    dec: Params = {}
    if cfg.adaptive_input:
        from .adaptive import init_adaptive_input, init_adaptive_softmax
        from ..nn.core import xavier_uniform
        dec["adaptive_input"] = init_adaptive_input(
            next(ks), cfg.vocab_size, cfg.adaptive_input_cutoff,
            cfg.decoder_embed_dim, cfg.adaptive_input_factor,
            cfg.decoder_embed_dim)
    else:
        dec["embed"] = embedding_init(next(ks), cfg.vocab_size,
                                      cfg.decoder_embed_dim,
                                      padding_idx=PAD)
    for i in range(cfg.decoder_layers):
        # no-cross-attn decoder layer == encoder layer param set
        dec[f"layer{i}"] = encoder_layer_init(
            next(ks), cfg.decoder_embed_dim, cfg.decoder_ffn_embed_dim,
            cfg.decoder_attention_heads)
    if cfg.decoder_normalize_before and not cfg.no_decoder_final_norm:
        dec["final_ln"] = layer_norm_init(cfg.decoder_embed_dim)
    if cfg.adaptive_softmax_cutoff:
        from .adaptive import init_adaptive_softmax, _bands
        from ..nn.core import xavier_uniform
        asm = init_adaptive_softmax(
            next(ks), cfg.vocab_size, cfg.decoder_embed_dim,
            cfg.adaptive_softmax_cutoff, cfg.adaptive_softmax_factor)
        if cfg.tie_adaptive_weights:
            # TiedHeadModule: only the class projection is a free param
            n_tails = len(_bands(cfg.adaptive_softmax_cutoff,
                                 cfg.vocab_size)) - 1
            asm = {"class_proj": {"w": xavier_uniform(
                next(ks), (cfg.decoder_embed_dim, n_tails),
                cfg.decoder_embed_dim, n_tails)}}
            if not cfg.tie_adaptive_proj:
                base = init_adaptive_softmax(
                    next(ks), cfg.vocab_size, cfg.decoder_embed_dim,
                    cfg.adaptive_softmax_cutoff, cfg.adaptive_softmax_factor)
                for i in range(n_tails):
                    asm[f"tail{i}"] = {"proj": base[f"tail{i}"]["proj"]}
        dec["adaptive_softmax"] = asm
    elif not cfg.share_decoder_input_output_embed:
        dec["out_proj"] = {"w": jax.random.normal(
            next(ks), (cfg.decoder_embed_dim, cfg.vocab_size))
            * (cfg.decoder_embed_dim ** -0.5)}
    return {"params": {"decoder": dec}, "stats": {}}


def forward(variables: Dict[str, Params], cfg: TransformerLMConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """batch: src_tokens (B, T) int32 (the shifted LM input) ->
    {"logits": (B, T, V)}."""
    p = variables["params"]["decoder"]
    tokens = batch["src_tokens"]
    b, t = tokens.shape
    dim = cfg.decoder_embed_dim
    scale = 1.0 if cfg.no_scale_embedding else dim ** 0.5
    if cfg.adaptive_input:
        from .adaptive import adaptive_input_forward
        x = adaptive_input_forward(p["adaptive_input"], tokens,
                                   cfg.adaptive_input_cutoff,
                                   cfg.vocab_size, cfg.dtype)
    else:
        x = embedding(p["embed"], tokens, cfg.dtype)
    x = x * jnp.asarray(scale, cfg.dtype)
    table = sinusoidal_table(cfg.max_target_positions + PAD + 1, dim, PAD)
    is_pad = tokens == PAD
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    pos_idx = jnp.where(is_pad, PAD, cum + PAD)
    x = x + table[pos_idx].astype(cfg.dtype)

    rngs = split_rngs(rng, cfg.decoder_layers + 1)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)
    mask = causal_mask(t)
    for i in range(cfg.decoder_layers):
        x, _ = decoder_layer(
            p[f"layer{i}"], x, None, None, mask, is_pad,
            cfg.decoder_attention_heads,
            normalize_before=cfg.decoder_normalize_before,
            activation=cfg.activation_fn, dropout_rate=cfg.dropout,
            attn_dropout=cfg.attention_dropout,
            act_dropout=cfg.activation_dropout,
            rng=rngs[i], deterministic=deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    if cfg.adaptive_softmax_cutoff:
        # adaptive softmax: expose features; lprobs/nll come from
        # models.adaptive (the criterion never forms full-vocab logits)
        return {"features": x, "new_stats": {},
                "adaptive_tied": _tied(variables, cfg)}
    w_out = p["out_proj"]["w"] if "out_proj" in p else p["embed"]["w"].T
    logits = jnp.dot(x, w_out.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return {"logits": logits, "new_stats": {}}


def _tied(variables, cfg: TransformerLMConfig):
    if not cfg.tie_adaptive_weights:
        return None
    from .adaptive import tied_views
    return tied_views(variables["params"]["decoder"]["adaptive_input"],
                      cfg.tie_adaptive_proj)


def log_probs(variables: Dict[str, Params], cfg: TransformerLMConfig,
              batch: Dict[str, Any]) -> jnp.ndarray:
    """Full-vocab log-probs (B, T, V) for eval_lm — regular or adaptive."""
    out = forward(variables, cfg, batch, deterministic=True)
    if "logits" in out:
        return jax.nn.log_softmax(out["logits"].astype(jnp.float32), -1)
    from .adaptive import adaptive_log_probs
    feats = out["features"]
    b, t, d = feats.shape
    lp = adaptive_log_probs(
        variables["params"]["decoder"]["adaptive_softmax"],
        feats.reshape(b * t, d), cfg.adaptive_softmax_cutoff,
        cfg.vocab_size, out["adaptive_tied"])
    return lp.reshape(b, t, -1)
