"""Levenshtein transformer (insertion/deletion NAT).

Parity: ``fairseq/models/nat/levenshtein_transformer.py`` — a full-attention
decoder trunk with three heads: word deletion (2-way per token, early_exit
layer 0-slot), placeholder insertion (256-way per adjacent-token gap via the
concatenated pair features @ embed_mask_ins, early_exit slot 1), and word
prediction over UNK placeholders (the tied output layer, slot 2). Training
targets come from the Levenshtein edit-distance backtrace
(ops/edit_ops.py = the libnat C++/CUDA kernels re-expressed in XLA), with
the deletion head supervised on the model's OWN word predictions
(dual-policy imitation, :98-115).

Optional separate trunks: --no-share-discriminator (deletion layers),
--no-share-maskpredictor (insertion layers),
--share-discriminator-maskpredictor (one shared separate trunk for both).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import (Params, dropout, embedding, layer_norm, split_rngs)
from ..nn.transformer import decoder_layer, decoder_layer_init, \
    sinusoidal_table
from ..ops.edit_ops import get_del_targets, get_ins_targets
from . import transformer_text as tt

PAD, EOS, UNK, BOS = 1, 2, 3, 0


@dataclass(frozen=True)
class LevenshteinConfig:
    base: tt.TransformerTextConfig = dataclasses.field(
        default_factory=tt.TransformerTextConfig)
    early_exit: Tuple[int, int, int] = (6, 6, 6)   # del, mask_ins, word_ins
    no_share_discriminator: bool = False
    no_share_maskpredictor: bool = False
    share_discriminator_maskpredictor: bool = False
    sampling_for_deletion: bool = False

    def replace(self, **kw) -> "LevenshteinConfig":
        return dataclasses.replace(self, **kw)


def init_levenshtein(key, cfg: LevenshteinConfig) -> Dict[str, Params]:
    b = cfg.base
    ks = iter(jax.random.split(key, 4 + 2 * b.decoder_layers))
    variables = tt.init_transformer(next(ks), b)
    dec = variables["params"]["decoder"]
    dim = b.decoder_embed_dim
    dec["embed_mask_ins"] = {"w": jax.random.normal(
        next(ks), (256, dim * 2)) * ((dim * 2) ** -0.5)}
    dec["embed_word_del"] = {"w": jax.random.normal(
        next(ks), (2, dim)) * (dim ** -0.5)}
    if cfg.share_discriminator_maskpredictor:
        if not cfg.no_share_discriminator:
            raise ValueError("share_discriminator_maskpredictor requires "
                             "no_share_discriminator")
    if cfg.no_share_discriminator:
        for i in range(cfg.early_exit[0]):
            dec[f"layers_del{i}"] = decoder_layer_init(
                next(ks), dim, b.decoder_ffn_embed_dim,
                b.decoder_attention_heads, kv_dim=b.encoder_embed_dim)
    if cfg.no_share_maskpredictor and \
            not cfg.share_discriminator_maskpredictor:
        for i in range(cfg.early_exit[1]):
            dec[f"layers_msk{i}"] = decoder_layer_init(
                next(ks), dim, b.decoder_ffn_embed_dim,
                b.decoder_attention_heads, kv_dim=b.encoder_embed_dim)
    return variables


def _layer_prefix(cfg: LevenshteinConfig, which: str) -> str:
    if which == "del" and cfg.no_share_discriminator:
        return "layers_del"
    if which == "msk":
        if cfg.share_discriminator_maskpredictor:
            return "layers_del"
        if cfg.no_share_maskpredictor:
            return "layers_msk"
    return "layer"


def extract_features(variables: Dict[str, Params], cfg: LevenshteinConfig,
                     prev_tokens: jnp.ndarray, enc_out: jnp.ndarray,
                     enc_pad: jnp.ndarray, early_exit: int, which: str,
                     rng=None, deterministic: bool = True) -> jnp.ndarray:
    """Full-attention trunk with early exit (extract_features :305-384);
    the final LN (pre-norm configs) applies even on early exit."""
    b = cfg.base
    p = tt.decoder_view(variables["params"], b)
    dim = b.decoder_embed_dim
    is_pad = prev_tokens == PAD
    scale = 1.0 if b.no_scale_embedding else dim ** 0.5
    x = embedding(p["embed"], prev_tokens, b.dtype) \
        * jnp.asarray(scale, b.dtype)
    table = sinusoidal_table(b.max_target_positions + PAD + 1, dim, PAD)
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    x = x + table[jnp.where(is_pad, PAD, cum + PAD)].astype(b.dtype)
    rngs = split_rngs(rng, early_exit + 1)
    x = dropout(x, b.dropout, rngs[-1], deterministic)
    prefix = _layer_prefix(cfg, which)
    for i in range(early_exit):
        x, _ = decoder_layer(
            p[f"{prefix}{i}"], x, enc_out, enc_pad, None, is_pad,
            b.decoder_attention_heads,
            normalize_before=b.decoder_normalize_before,
            activation=b.activation_fn, dropout_rate=b.dropout,
            attn_dropout=b.attention_dropout,
            act_dropout=b.activation_dropout,
            rng=rngs[i], deterministic=deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    return x


def forward_word_del(variables, cfg: LevenshteinConfig, prev_tokens,
                     enc_out, enc_pad, rng=None, deterministic=True):
    f = extract_features(variables, cfg, prev_tokens, enc_out, enc_pad,
                         cfg.early_exit[0], "del", rng, deterministic)
    w = variables["params"]["decoder"]["embed_word_del"]["w"]
    return jnp.dot(f, w.astype(f.dtype).T,
                   preferred_element_type=jnp.float32)


def forward_mask_ins(variables, cfg: LevenshteinConfig, prev_tokens,
                     enc_out, enc_pad, rng=None, deterministic=True):
    f = extract_features(variables, cfg, prev_tokens, enc_out, enc_pad,
                         cfg.early_exit[1], "msk", rng, deterministic)
    pair = jnp.concatenate([f[:, :-1], f[:, 1:]], axis=-1)
    w = variables["params"]["decoder"]["embed_mask_ins"]["w"]
    return jnp.dot(pair, w.astype(pair.dtype).T,
                   preferred_element_type=jnp.float32)


def forward_word_ins(variables, cfg: LevenshteinConfig, prev_tokens,
                     enc_out, enc_pad, rng=None, deterministic=True):
    f = extract_features(variables, cfg, prev_tokens, enc_out, enc_pad,
                         cfg.early_exit[2], "word", rng, deterministic)
    out_w = tt.decoder_view(variables["params"], cfg.base)["out_proj"]["w"]
    return jnp.dot(f, out_w.astype(f.dtype),
                   preferred_element_type=jnp.float32)


def forward(variables: Dict[str, Params], cfg: LevenshteinConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """Training forward (LevenshteinTransformerModel.forward :71-138):
    batch needs src_tokens, prev_target (random_delete scaffold), target."""
    rngs = split_rngs(rng, 5)
    enc = tt.encode(variables, cfg.base, batch["src_tokens"], rng=rngs[0],
                    deterministic=deterministic)
    eo, ep = enc["encoder_out"], enc["encoder_padding_mask"]
    prev, tgt = batch["prev_target"], batch["target"]

    masked_tgt_masks, masked_tgt_tokens, mask_ins_targets = \
        get_ins_targets(prev, tgt)
    mask_ins_targets = jnp.clip(mask_ins_targets, 0, 255)

    mask_ins_out = forward_mask_ins(variables, cfg, prev, eo, ep,
                                    rngs[1], deterministic)
    word_ins_out = forward_word_ins(variables, cfg, masked_tgt_tokens,
                                    eo, ep, rngs[2], deterministic)
    if cfg.sampling_for_deletion:
        word_pred = jax.random.categorical(
            rngs[4], word_ins_out.astype(jnp.float32)).astype(jnp.int32)
    else:
        word_pred = jnp.argmax(word_ins_out, axis=-1).astype(jnp.int32)
    word_pred = jnp.where(masked_tgt_masks, word_pred, tgt)

    word_del_targets = get_del_targets(word_pred, tgt)
    word_del_out = forward_word_del(variables, cfg, word_pred, eo, ep,
                                    rngs[3], deterministic)
    return {
        "mask_ins_out": mask_ins_out,
        "mask_ins_tgt": mask_ins_targets,
        "mask_ins_mask": prev[:, 1:] != PAD,
        "word_ins_out": word_ins_out,
        "word_ins_tgt": tgt,
        "word_ins_mask": masked_tgt_masks,
        "word_del_out": word_del_out,
        "word_del_tgt": word_del_targets,
        "word_del_mask": word_pred != PAD,
        "new_stats": {},
    }
