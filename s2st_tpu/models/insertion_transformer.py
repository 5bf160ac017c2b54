"""Insertion transformer (Stern et al. 2019).

Parity: ``fairseq/models/nat/insertion_transformer.py`` — one head over
adjacent-feature pairs (pool_out linear -> tied output layer) predicting,
for every gap, which word to insert (PAD = "insert nothing"); training uses
SOFT labels from the edit-distance path weighted by the NegativeDistance
score (balanced-binary-tree bias, --label-tau), built in-graph by
``ops.edit_ops.get_insertion_targets``. Decoding inserts one word per gap
per refinement iteration (_apply_ins_words: coordinate-sort merge).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.core import Params, linear, linear_init
from ..ops.edit_ops import get_insertion_targets
from . import levenshtein_transformer as lev
from . import transformer_text as tt

PAD, EOS, UNK, BOS = 1, 2, 3, 0


@dataclass(frozen=True)
class InsertionConfig:
    base: tt.TransformerTextConfig = dataclasses.field(
        default_factory=tt.TransformerTextConfig)
    label_tau: Optional[float] = None

    def replace(self, **kw) -> "InsertionConfig":
        return dataclasses.replace(self, **kw)

    # LevenshteinConfig duck-typing for extract_features
    @property
    def early_exit(self):
        return (self.base.decoder_layers,) * 3

    no_share_discriminator = False
    no_share_maskpredictor = False
    share_discriminator_maskpredictor = False


def init_insertion(key, cfg: InsertionConfig) -> Dict[str, Params]:
    k_base, k_pool = jax.random.split(key)
    variables = tt.init_transformer(k_base, cfg.base)
    dim = cfg.base.decoder_embed_dim
    variables["params"]["decoder"]["pool_out"] = linear_init(
        k_pool, dim * 2, dim)
    return variables


def forward_word_ins(variables, cfg: InsertionConfig, prev_tokens,
                     enc_out, enc_pad, rng=None, deterministic=True
                     ) -> jnp.ndarray:
    """(B, T-1, V) per-gap insertion logits."""
    f = lev.extract_features(variables, cfg, prev_tokens, enc_out, enc_pad,
                             cfg.base.decoder_layers, "word", rng,
                             deterministic)
    pair = jnp.concatenate([f[:, :-1], f[:, 1:]], axis=-1)
    pooled = linear(variables["params"]["decoder"]["pool_out"], pair)
    out_w = tt.decoder_view(variables["params"], cfg.base)["out_proj"]["w"]
    return jnp.dot(pooled, out_w.astype(pooled.dtype),
                   preferred_element_type=jnp.float32)


def forward(variables: Dict[str, Params], cfg: InsertionConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    from ..nn.core import split_rngs
    r_enc, r_dec = split_rngs(rng, 2)
    enc = tt.encode(variables, cfg.base, batch["src_tokens"], rng=r_enc,
                    deterministic=deterministic)
    prev, tgt = batch["prev_target"], batch["target"]
    word_ins_out = forward_word_ins(
        variables, cfg, prev, enc["encoder_out"],
        enc["encoder_padding_mask"], r_dec, deterministic)
    word_ins_tgt = get_insertion_targets(
        prev, tgt, cfg.base.tgt_vocab_size, cfg.label_tau)
    return {
        "word_ins_out": word_ins_out,
        "word_ins_tgt": word_ins_tgt,          # soft labels (B, T-1, V)
        "word_ins_mask": prev[:, 1:] != PAD,
        "new_stats": {},
    }


def apply_ins_words_gapwise(tokens: jnp.ndarray, scores: jnp.ndarray,
                            word_pred: jnp.ndarray,
                            word_scores: jnp.ndarray):
    """insertion_transformer._apply_ins_words (:103-118): merge one
    prediction per gap into the sequence by coordinate sort (gap j gets
    coordinate j+0.5); PAD predictions sort to the end and are trimmed.
    Fixed-width: the merged (B, 2T-1) result is sliced back to T —
    overflow beyond the buffer is clipped (the reference grows)."""
    b, t = tokens.shape
    no_ins = (word_pred == PAD) | (tokens[:, 1:] == PAD)
    word_pred = jnp.where(no_ins, PAD, word_pred)
    word_scores = jnp.where(no_ins, 0.0, word_scores)
    coords = jnp.arange(t, dtype=jnp.float32)[None, :].repeat(b, 0)
    ins_coords = jnp.where(no_ins, jnp.inf, coords[:, 1:] - 0.5)
    all_coords = jnp.concatenate([coords, ins_coords], axis=1)
    order = jnp.argsort(all_coords, axis=1)
    all_toks = jnp.concatenate([tokens, word_pred], axis=1)
    all_scores = jnp.concatenate([scores, word_scores], axis=1)
    merged_t = jnp.take_along_axis(all_toks, order, axis=1)[:, :t]
    merged_s = jnp.take_along_axis(all_scores, order, axis=1)[:, :t]
    return merged_t, merged_s
