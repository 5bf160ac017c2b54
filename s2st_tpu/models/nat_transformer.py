"""Non-autoregressive transformer family: vanilla NAT + CMLM.

Parity: ``fairseq/models/nat/nonautoregressive_transformer.py``
(NATransformerModel — full-attention decoder over a unk-masked length
scaffold, mean-pooled length head ``embed_length`` (256 classes), optional
length offset vs the source, optional source-embedding copy via uniform
assignment) and ``fairseq/models/nat/cmlm_transformer.py``
(CMLMNATransformerModel — same model; the training mask is the noised
positions and decoding is iterative mask-predict).

TPU-native: the decoder is the text transformer's with NO causal mask; the
whole refinement loop (generate/iterative_refinement.py) runs as one
compiled program over a fixed-size token buffer.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.core import (Params, dropout, embedding, embedding_init,
                       layer_norm, layer_norm_init, split_rngs)
from ..nn.transformer import decoder_layer, sinusoidal_table
from . import transformer_text as tt

PAD, EOS, UNK, BOS = 1, 2, 3, 0


@dataclass(frozen=True)
class NATConfig:
    base: tt.TransformerTextConfig = dataclasses.field(
        default_factory=tt.TransformerTextConfig)
    sg_length_pred: bool = False
    pred_length_offset: bool = False
    length_loss_factor: float = 0.1
    src_embedding_copy: bool = False
    # iterative NAT (iterative_nonautoregressive_transformer.py)
    train_step: int = 1
    dae_ratio: float = 0.5
    stochastic_approx: bool = False
    # NAT-CRF (nat_crf_transformer.py + dynamic_crf_layer.py)
    crf: bool = False
    crf_lowrank_approx: int = 32
    crf_beam_approx: int = 64
    word_ins_loss_factor: float = 0.5

    def replace(self, **kw) -> "NATConfig":
        return dataclasses.replace(self, **kw)


def init_nat(key, cfg: NATConfig) -> Dict[str, Params]:
    k_base, k_len, k_crf = jax.random.split(key, 3)
    variables = tt.init_transformer(k_base, cfg.base)
    # length head: Embedding(256, enc_dim) used as a projection
    # (nonautoregressive_transformer.py:226 embed_length)
    variables["params"]["decoder"]["embed_length"] = embedding_init(
        k_len, 256, cfg.base.encoder_embed_dim)
    if cfg.crf:
        from ..ops.crf import init_crf
        variables["params"]["crf"] = init_crf(
            k_crf, cfg.base.tgt_vocab_size, cfg.crf_lowrank_approx)
    return variables


def _uniform_assignment(src_lens: jnp.ndarray, tgt_lens: jnp.ndarray,
                        max_tgt_len: int) -> jnp.ndarray:
    """(B, Tt) source indices: round(j * (src_len-1)/(tgt_len-1))
    (nonautoregressive_transformer.py:33-41)."""
    steps = (src_lens.astype(jnp.float32) - 1) / jnp.maximum(
        tgt_lens.astype(jnp.float32) - 1, 1)
    j = jnp.arange(max_tgt_len, dtype=jnp.float32)
    return jnp.round(steps[:, None] * j[None, :]).astype(jnp.int32)


def forward_length(variables: Dict[str, Params], cfg: NATConfig,
                   enc_out: jnp.ndarray, enc_pad: jnp.ndarray
                   ) -> jnp.ndarray:
    """Length logits (B, 256): mean-pooled encoder feats @ embed_length.T
    (forward_length, :234-245)."""
    feats = enc_out.astype(jnp.float32)
    keep = (~enc_pad)[:, :, None].astype(jnp.float32)
    pooled = jnp.sum(feats * keep, axis=1) / jnp.maximum(
        jnp.sum(keep, axis=1), 1.0)
    if cfg.sg_length_pred:
        pooled = jax.lax.stop_gradient(pooled)
    w = variables["params"]["decoder"]["embed_length"]["w"]
    return jnp.dot(pooled, w.astype(pooled.dtype).T,
                   preferred_element_type=jnp.float32)


def length_target(cfg: NATConfig, tgt_tokens: jnp.ndarray,
                  src_lens: jnp.ndarray) -> jnp.ndarray:
    """Training target for the length head (forward_length_prediction,
    :374-391): tgt_len (or tgt_len - src_len + 128), clamped to [0, 255]."""
    tgt_lens = jnp.sum(tgt_tokens != PAD, axis=1)
    if cfg.pred_length_offset:
        out = tgt_lens - src_lens + 128
    else:
        out = tgt_lens
    return jnp.clip(out, 0, 255)


def predict_length(cfg: NATConfig, length_logits: jnp.ndarray,
                   src_lens: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.argmax(length_logits, axis=-1).astype(jnp.int32)
    if cfg.pred_length_offset:
        pred = pred - 128 + src_lens.astype(jnp.int32)
    return pred


def nat_decode(variables: Dict[str, Params], cfg: NATConfig,
               prev_output_tokens: jnp.ndarray, enc_out: jnp.ndarray,
               enc_padding_mask: jnp.ndarray,
               rng: Optional[jax.Array] = None, deterministic: bool = True,
               src_tokens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full-attention decode over the scaffold -> logits (B, Tt, V)
    (NATransformerDecoder.extract_features + output_layer: same as the AR
    text decoder but with self_attn_mask=None).

    src_tokens: when given (src_embedding_copy, :247-285), the decoder
    inputs are the SOURCE token embeddings gathered under uniform
    assignment instead of scaffold embeddings (positions still added)."""
    b = cfg.base
    p = tt.decoder_view(variables["params"], b)
    dim = b.decoder_embed_dim
    is_pad = prev_output_tokens == PAD
    scale = 1.0 if b.no_scale_embedding else dim ** 0.5
    if src_tokens is not None:
        # forward_copying_source (:332-346): gather embed_scale-scaled
        # source embeddings (the `encoder_embedding` output: scaled tokens
        # WITHOUT positions) at round(j * (src_len-1)/(tgt_len-1))
        src_embed = embedding(variables["params"]["encoder"]["embed"],
                              src_tokens, b.dtype) \
            * jnp.asarray(scale, b.dtype)
        src_lens = jnp.sum(src_tokens != PAD, axis=1)
        tgt_lens = jnp.sum(~is_pad, axis=1)
        mapped = _uniform_assignment(src_lens, tgt_lens,
                                     prev_output_tokens.shape[1])
        mapped = jnp.where(is_pad, 0, mapped)
        x = jnp.take_along_axis(src_embed, mapped[:, :, None], axis=1)
    else:
        x = embedding(p["embed"], prev_output_tokens, b.dtype) \
            * jnp.asarray(scale, b.dtype)
    table = sinusoidal_table(b.max_target_positions + PAD + 1, dim, PAD)
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    x = x + table[jnp.where(is_pad, PAD, cum + PAD)].astype(b.dtype)
    rngs = split_rngs(rng, b.decoder_layers + 1)
    x = dropout(x, b.dropout, rngs[-1], deterministic)
    for i in range(b.decoder_layers):
        x, _ = decoder_layer(
            p[f"layer{i}"], x, enc_out, enc_padding_mask,
            None, is_pad,              # <- no causal mask: NAT
            b.decoder_attention_heads,
            normalize_before=b.decoder_normalize_before,
            activation=b.activation_fn, dropout_rate=b.dropout,
            attn_dropout=b.attention_dropout,
            act_dropout=b.activation_dropout,
            rng=rngs[i], deterministic=deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    return jnp.dot(x, p["out_proj"]["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32)


def forward(variables: Dict[str, Params], cfg: NATConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """batch: src_tokens, prev_target (the noised scaffold), target.
    Returns word_ins logits + length logits + targets, the nat_loss
    contract (nonautoregressive_transformer.py forward / cmlm forward)."""
    r_enc, r_dec = split_rngs(rng, 2)
    enc = tt.encode(variables, cfg.base, batch["src_tokens"], rng=r_enc,
                    deterministic=deterministic)
    src_lens = jnp.sum(batch["src_tokens"] != PAD, axis=1)
    length_logits = forward_length(variables, cfg, enc["encoder_out"],
                                   enc["encoder_padding_mask"])
    out = {
        "word_ins_logits": nat_decode(
            variables, cfg, batch["prev_target"], enc["encoder_out"],
            enc["encoder_padding_mask"], rng=r_dec,
            deterministic=deterministic,
            # train-time embedding copy (decoder.forward step=0 default)
            src_tokens=(batch["src_tokens"] if cfg.src_embedding_copy
                        else None)),
        "length_logits": length_logits,
        "length_tgt": length_target(cfg, batch["target"], src_lens),
        "new_stats": {},
    }
    return out


def sequential_poisoning(tgt: jnp.ndarray, vocab: int, rng: jax.Array,
                         beta: float = 0.33) -> jnp.ndarray:
    """DAE corruption (_sequential_poisoning,
    iterative_nonautoregressive_transformer.py:11-42): left-to-right,
    each position replaced by a random word, repeated into, or swapped
    with its right neighbor with probability beta/3 each. Quirk-compatible
    with the reference: the swap/repeat guard compares the NEXT word to
    the literal 3 (the signature's eos default — the call site passes the
    real eos=2, which the body ignores). The sequential column
    interdependence is a lax.scan carrying the evolving current column."""
    b, t = tgt.shape
    r1, r2 = jax.random.split(rng)
    rand_words = jax.random.randint(r1, (b, t), 4, vocab, jnp.int32)
    choices = jax.random.uniform(r2, (b, t))
    return poison_with(tgt, rand_words, choices, beta)


def poison_with(tgt: jnp.ndarray, rand_words: jnp.ndarray,
                choices: jnp.ndarray, beta: float = 0.33) -> jnp.ndarray:
    """Deterministic poisoning core given the random draws (testable
    against a spec oracle of the reference loop)."""
    protected = (tgt == PAD) | (tgt == BOS) | (tgt == EOS)
    choices = jnp.where(protected, 1.0, choices)
    replace = choices < beta / 3
    repeat = (choices >= beta / 3) & (choices < beta * 2 / 3)
    swap = (choices >= beta * 2 / 3) & (choices < beta)
    safe = choices >= beta

    def step(cur, xs):
        nxt, rw, rep, rpt, sw, sf = xs
        sw_i = sw & (nxt != 3)
        rpt_i = rpt & (nxt != 3)
        sf_i = sf | ((nxt == 3) & ~rep)
        out_i = (cur * (sf_i | rpt_i) + nxt * sw_i + rw * rep).astype(
            jnp.int32)
        # aliasing-compatible with the reference: its `self_word` is a
        # VIEW of s[:, i] already overwritten by the first assignment, so
        # the i+1 write reads the NEW value (a "swap" duplicates the next
        # word into both slots)
        new_next = (nxt * (sf_i | rep) + out_i * (sw_i | rpt_i)).astype(
            jnp.int32)
        return new_next, out_i

    xs = (tgt[:, 1:].T, rand_words[:, :-1].T, replace[:, :-1].T,
          repeat[:, :-1].T, swap[:, :-1].T, safe[:, :-1].T)
    last, outs = jax.lax.scan(step, tgt[:, 0], xs)
    return jnp.concatenate([outs.T, last[:, None]], axis=1)


def inat_forward(variables: Dict[str, Params], cfg: NATConfig,
                 batch: Dict[str, Any], rng: Optional[jax.Array] = None,
                 deterministic: bool = True, train: bool = False
                 ) -> Dict[str, Any]:
    """Iterative NAT training forward (IterNATransformerModel.forward
    :86-168): train_step rounds of word prediction, each round feeding its
    (optionally gumbel-sampled) predictions — or a DAE-corrupted target
    with probability dae_ratio per sentence — as the next scaffold.
    Outputs are stacked along a leading step axis for the joint loss."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, 2 + 3 * cfg.train_step)
    enc = tt.encode(variables, cfg.base, batch["src_tokens"], rng=rngs[0],
                    deterministic=deterministic)
    src_lens = jnp.sum(batch["src_tokens"] != PAD, axis=1)
    length_logits = forward_length(variables, cfg, enc["encoder_out"],
                                   enc["encoder_padding_mask"])
    tgt = batch["target"]
    prev = batch["prev_target"]
    b = tgt.shape[0]
    outs = []
    for t in range(cfg.train_step):
        w = nat_decode(variables, cfg, prev, enc["encoder_out"],
                       enc["encoder_padding_mask"], rng=rngs[1 + 3 * t],
                       deterministic=deterministic)
        outs.append(w)
        if t < cfg.train_step - 1:
            logits = w
            if cfg.stochastic_approx:
                g = -jnp.log(-jnp.log(jax.random.uniform(
                    rngs[2 + 3 * t], logits.shape) + 1e-8) + 1e-8)
                logits = logits + g
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            mask = tgt != PAD
            prev = jnp.where(mask, pred, prev)
            if cfg.dae_ratio > 0:
                r_c, r_p = jax.random.split(rngs[3 + 3 * t])
                corrupted = jax.random.uniform(r_c, (b,)) < cfg.dae_ratio
                poisoned = sequential_poisoning(
                    tgt, cfg.base.tgt_vocab_size, r_p)
                prev = jnp.where(corrupted[:, None], poisoned, prev)
    return {
        "word_ins_logits": jnp.concatenate(outs, axis=0),
        "word_ins_tgt": jnp.tile(tgt, (cfg.train_step, 1)),
        "length_logits": length_logits,
        "length_tgt": length_target(cfg, tgt, src_lens),
        "new_stats": {},
    }


def initialize_output_tokens(cfg: NATConfig, length_tgt: jnp.ndarray,
                             max_len: int) -> jnp.ndarray:
    """(B, max_len) scaffold: BOS + UNKs + EOS at the predicted length,
    PAD beyond (initialize_output_tokens, :146-160; lengths clamped >= 2).
    Fixed-width buffer: max_len is static (the reference sizes it to the
    batch max — here the compile-stable cap)."""
    length_tgt = jnp.clip(length_tgt, 2, max_len)
    j = jnp.arange(max_len)[None, :]
    toks = jnp.where(j < length_tgt[:, None], UNK, PAD).astype(jnp.int32)
    toks = toks.at[:, 0].set(BOS)
    b = length_tgt.shape[0]
    return toks.at[jnp.arange(b), length_tgt - 1].set(EOS)
