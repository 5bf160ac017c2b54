"""Text-to-text transformer (the fairseq `transformer` model family).

Parity: ``fairseq/models/transformer/`` — ``TransformerEncoder``
(transformer_encoder.py: embed_scale * embed + sinusoidal positions,
optional layernorm_embedding, dropout, N post/pre-LN layers, final LN under
normalize_before) and ``TransformerDecoder`` (transformer_decoder.py:
pad-aware positions, causal self-attention, cross-attention over the
encoder, output projection optionally tied to the input embedding), with
the arch zoo from ``transformer_legacy.py`` (base/iwslt/wmt/vaswani-big).

TPU-native design: pure functions over a param pytree; the decoder reuses
the aux-decoder machinery (``s2st_transformer.aux_decode`` implements
fairseq's TransformerDecoder semantics already), so the jitted beam search
(`generate.sequence_generator.beam_search_aux`) drives this model with
``which="decoder"`` unchanged. Embedding sharing (``--share-all-embeddings``
/ ``--share-decoder-input-output-embed``) is expressed structurally: shared
tensors exist ONCE in the pytree and views are derived in the forward, so
gradients flow to the single owner (torch ties Parameter objects; a pytree
ties by construction).
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
from ..nn.transformer import (decoder_layer_init, encoder_layer,
                              encoder_layer_init, sinusoidal_table)
from . import s2st_transformer as s2st

PAD, EOS = s2st.PAD, 2


@dataclass(frozen=True)
class TransformerTextConfig:
    """Field names match what ``s2st_transformer.aux_decode`` and the beam
    search read off their cfg, so this config can be passed to both."""
    src_vocab_size: int = 1000
    tgt_vocab_size: int = 1000
    encoder_layers: int = 6
    encoder_embed_dim: int = 512
    encoder_ffn_embed_dim: int = 2048
    encoder_attention_heads: int = 8
    encoder_normalize_before: bool = False
    decoder_layers: int = 6
    decoder_embed_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_attention_heads: int = 8
    decoder_normalize_before: bool = False
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation_fn: str = "relu"
    no_scale_embedding: bool = False
    layernorm_embedding: bool = False
    encoder_learned_pos: bool = False
    decoder_learned_pos: bool = False
    share_decoder_input_output_embed: bool = False
    share_all_embeddings: bool = False
    max_source_positions: int = 1024
    max_target_positions: int = 1024
    vocab_parallel_embed: bool = False
    # roberta_enc_dec (fairseq/models/roberta/enc_dec.py:96-101): the
    # output projection is a full RobertaLMHead (dense -> activation_fn ->
    # layernorm -> tied/free projection + bias) instead of a plain matmul.
    # no_scale_embedding stays True on BOTH sides there — the flag set by
    # roberta.base_architecture (roberta/model.py:543) flows into the
    # decoder args via read_args_from_roberta (enc_dec.py:138-160).
    lm_head_out_proj: bool = False
    # --quant-noise-pq > 0 adds the reference's extra embedding-path
    # projection Linear(embed_dim, embed_dim, bias=False) on both sides
    # (transformer_encoder.py:82-88 / transformer_decoder.py:82-89); the
    # block noise itself is applied by train/quantization.py
    quant_noise_pq: float = 0.0
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "TransformerTextConfig":
        return dataclasses.replace(self, **kw)


def init_transformer(key, cfg: TransformerTextConfig) -> Dict[str, Params]:
    """{"params": {"encoder": {...}, "decoder": aux-decoder layout}}.

    Sharing (transformer_legacy.py:110-131): share_all_embeddings stores ONE
    table under encoder.embed (decoder views it); tied output projection is
    derived from the decoder embedding at forward time (fairseq
    ``self.embed_tokens.weight`` reuse, transformer_decoder.py
    output_projection)."""
    if cfg.share_all_embeddings:
        if cfg.src_vocab_size != cfg.tgt_vocab_size:
            raise ValueError("--share-all-embeddings requires a joined "
                             "dictionary")
        if cfg.encoder_embed_dim != cfg.decoder_embed_dim:
            raise ValueError("--share-all-embeddings requires matching "
                             "embed dims")
    ks = iter(jax.random.split(key, cfg.encoder_layers + cfg.decoder_layers
                               + 4))
    enc: Params = {"embed": embedding_init(next(ks), cfg.src_vocab_size,
                                           cfg.encoder_embed_dim,
                                           padding_idx=PAD)}
    if cfg.encoder_learned_pos:
        enc["embed_positions"] = embedding_init(
            jax.random.fold_in(key, 101),
            cfg.max_source_positions + PAD + 1, cfg.encoder_embed_dim,
            padding_idx=PAD)
    for i in range(cfg.encoder_layers):
        enc[f"layer{i}"] = encoder_layer_init(
            next(ks), cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
            cfg.encoder_attention_heads)
    if cfg.encoder_normalize_before:
        enc["final_ln"] = layer_norm_init(cfg.encoder_embed_dim)
    if cfg.layernorm_embedding:
        enc["embed_ln"] = layer_norm_init(cfg.encoder_embed_dim)
    if cfg.quant_noise_pq > 0:
        enc["quant_noise_proj"] = linear_init(
            jax.random.fold_in(key, 103), cfg.encoder_embed_dim,
            cfg.encoder_embed_dim, bias=False)

    dec: Params = {}
    if not cfg.share_all_embeddings:
        dec["embed"] = embedding_init(next(ks), cfg.tgt_vocab_size,
                                      cfg.decoder_embed_dim, padding_idx=PAD)
    if cfg.decoder_learned_pos:
        dec["embed_positions"] = embedding_init(
            jax.random.fold_in(key, 102),
            cfg.max_target_positions + PAD + 1, cfg.decoder_embed_dim,
            padding_idx=PAD)
    for i in range(cfg.decoder_layers):
        dec[f"layer{i}"] = decoder_layer_init(
            next(ks), cfg.decoder_embed_dim, cfg.decoder_ffn_embed_dim,
            cfg.decoder_attention_heads, kv_dim=cfg.encoder_embed_dim)
    if cfg.decoder_normalize_before:
        dec["final_ln"] = layer_norm_init(cfg.decoder_embed_dim)
    if cfg.layernorm_embedding:
        dec["embed_ln"] = layer_norm_init(cfg.decoder_embed_dim)
    if cfg.lm_head_out_proj:
        # RobertaLMHead projection (roberta/model.py:366-391): dense + LN +
        # free bias; the weight is tied to the decoder embedding when
        # sharing, otherwise a free (dim, V) table.
        k_head = jax.random.fold_in(key, 103)
        head: Params = {
            "dense": linear_init(k_head, cfg.decoder_embed_dim,
                                 cfg.decoder_embed_dim),
            "ln": layer_norm_init(cfg.decoder_embed_dim),
            "bias": jnp.zeros((cfg.tgt_vocab_size,)),
        }
        if not (cfg.share_decoder_input_output_embed
                or cfg.share_all_embeddings):
            head["w"] = jax.random.normal(
                jax.random.fold_in(key, 104),
                (cfg.decoder_embed_dim, cfg.tgt_vocab_size)) \
                * (cfg.decoder_embed_dim ** -0.5)
        dec["out_proj"] = head
    elif not (cfg.share_decoder_input_output_embed
              or cfg.share_all_embeddings):
        dec["out_proj"] = {"w": jax.random.normal(
            next(ks), (cfg.decoder_embed_dim, cfg.tgt_vocab_size))
            * (cfg.decoder_embed_dim ** -0.5)}
    if cfg.quant_noise_pq > 0:
        dec["quant_noise_proj"] = linear_init(
            jax.random.fold_in(key, 105), cfg.decoder_embed_dim,
            cfg.decoder_embed_dim, bias=False)
    return {"params": {"encoder": enc, "decoder": dec}, "stats": {}}


def decoder_view(params: Params, cfg: TransformerTextConfig) -> Params:
    """Decoder params in the aux-decoder layout with shared tensors
    materialized as views (same underlying arrays — gradients flow to the
    single owner through the transpose/aliasing ops)."""
    dec = dict(params["decoder"])
    if cfg.share_all_embeddings:
        dec["embed"] = params["encoder"]["embed"]
    if "out_proj" not in dec:
        dec["out_proj"] = {"w": dec["embed"]["w"].T}
    elif "dense" in dec["out_proj"] and "w" not in dec["out_proj"]:
        # tied RobertaLMHead: materialize the projection view
        dec["out_proj"] = {**dec["out_proj"], "w": dec["embed"]["w"].T}
    if "quant_noise_proj" in dec:
        # the reference applies the extra quant-noise projection to the
        # scaled token embedding BEFORE positions (transformer_decoder.py:
        # 308-311) — so proj(table[ids]) == (table @ W)[ids]: fold the
        # projection into the embedding view (every decode path — teacher-
        # forced, learned-pos, beam — flows through this view). The tied
        # output projection above stays on the raw table, like fairseq's
        # embed_tokens.weight tie.
        qn = dec.pop("quant_noise_proj")
        dec["embed"] = {"w": jnp.dot(dec["embed"]["w"],
                                     qn["w"].astype(dec["embed"]["w"].dtype))}
    return dec


def _project(p_out: Params, x: jnp.ndarray, activation_fn: str,
             out_dtype=jnp.float32) -> jnp.ndarray:
    """Output projection: plain matmul, or the RobertaLMHead form when the
    params carry a dense sublayer (roberta_enc_dec's output_projection)."""
    if "dense" in p_out:
        x = get_activation(activation_fn)(linear(p_out["dense"], x))
        x = layer_norm(p_out["ln"], x)
        return jnp.dot(x, p_out["w"].astype(x.dtype),
                       preferred_element_type=out_dtype) \
            + p_out["bias"].astype(out_dtype)
    return jnp.dot(x, p_out["w"].astype(x.dtype),
                   preferred_element_type=out_dtype)


def _positions(tokens: jnp.ndarray, dim: int, max_positions: int,
               dtype) -> jnp.ndarray:
    """Pad-aware sinusoidal positions (utils.make_positions parity —
    supports LEFT-padded sources: position counts non-pad tokens
    cumulatively, pads read the zero row)."""
    table = sinusoidal_table(max_positions + PAD + 1, dim, PAD)
    is_pad = tokens == PAD
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    idx = jnp.where(is_pad, PAD, cum + PAD)
    return table[idx].astype(dtype)


def encode(variables: Dict[str, Params], cfg: TransformerTextConfig,
           src_tokens: jnp.ndarray, rng: Optional[jax.Array] = None,
           deterministic: bool = True) -> Dict[str, Any]:
    """src_tokens (B, Ts) int32 (left- or right-padded) ->
    {"encoder_out" (B, Ts, C), "encoder_padding_mask" bool (B, Ts)}."""
    p = variables["params"]["encoder"]
    scale = 1.0 if cfg.no_scale_embedding else cfg.encoder_embed_dim ** 0.5
    x = embedding(p["embed"], src_tokens, cfg.dtype) \
        * jnp.asarray(scale, cfg.dtype)
    if cfg.encoder_learned_pos:
        is_pad0 = src_tokens == PAD
        cum = jnp.cumsum((~is_pad0).astype(jnp.int32), axis=1)
        idx = jnp.where(is_pad0, PAD, cum + PAD)
        x = x + embedding(p["embed_positions"], idx, cfg.dtype)
    else:
        x = x + _positions(src_tokens, cfg.encoder_embed_dim,
                           cfg.max_source_positions, cfg.dtype)
    if "embed_ln" in p:
        x = layer_norm(p["embed_ln"], x)
    rngs = split_rngs(rng, cfg.encoder_layers + 1)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)
    if "quant_noise_proj" in p:
        # --quant-noise-pq extra projection, applied after embedding
        # dropout as in the reference (transformer_encoder.py:129-130)
        x = linear(p["quant_noise_proj"], x)
    pad_mask = src_tokens == PAD
    for i in range(cfg.encoder_layers):
        x = encoder_layer(
            p[f"layer{i}"], x, pad_mask, cfg.encoder_attention_heads,
            normalize_before=cfg.encoder_normalize_before,
            activation=cfg.activation_fn, dropout_rate=cfg.dropout,
            attn_dropout=cfg.attention_dropout,
            act_dropout=cfg.activation_dropout,
            rng=rngs[i], deterministic=deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    return {"encoder_out": x, "encoder_padding_mask": pad_mask}


def decode(variables: Dict[str, Params], cfg: TransformerTextConfig,
           prev_output_tokens: jnp.ndarray, enc_out: jnp.ndarray,
           enc_padding_mask: jnp.ndarray, rng: Optional[jax.Array] = None,
           deterministic: bool = True) -> jnp.ndarray:
    """Teacher-forced decode -> logits (B, Tt, V). Delegates to
    ``aux_decode`` (the shared fairseq-TransformerDecoder implementation)
    over the view-materialized decoder params."""
    dec = decoder_view(variables["params"], cfg)
    if cfg.decoder_learned_pos:
        return _decode_learned_pos(dec, cfg, prev_output_tokens, enc_out,
                                   enc_padding_mask, rng, deterministic)
    shim = _aux_cfg(cfg)
    return s2st.aux_decode(dec, shim, cfg.decoder_embed_dim,
                           cfg.decoder_layers, prev_output_tokens, enc_out,
                           enc_padding_mask,
                           max_positions=cfg.max_target_positions,
                           rng=rng, deterministic=deterministic)


def _decode_learned_pos(p: Params, cfg: TransformerTextConfig,
                        prev_tokens, enc_out, enc_padding_mask, rng,
                        deterministic) -> jnp.ndarray:
    """aux_decode with LEARNED pad-aware positions (fairseq
    LearnedPositionalEmbedding — the BART/mBART decoder setting)."""
    from ..nn.transformer import causal_mask, decoder_layer
    dim = cfg.decoder_embed_dim
    b, tt_ = prev_tokens.shape
    scale = 1.0 if cfg.no_scale_embedding else dim ** 0.5
    x = embedding(p["embed"], prev_tokens, cfg.dtype) \
        * jnp.asarray(scale, cfg.dtype)
    is_pad = prev_tokens == PAD
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    x = x + embedding(p["embed_positions"],
                      jnp.where(is_pad, PAD, cum + PAD), cfg.dtype)
    if "embed_ln" in p:
        x = layer_norm(p["embed_ln"], x)
    rngs = split_rngs(rng, cfg.decoder_layers + 1)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)
    mask = causal_mask(tt_)
    for i in range(cfg.decoder_layers):
        x, _ = decoder_layer(
            p[f"layer{i}"], x, enc_out, enc_padding_mask, mask, is_pad,
            cfg.decoder_attention_heads,
            normalize_before=cfg.decoder_normalize_before,
            activation=cfg.activation_fn, dropout_rate=cfg.dropout,
            attn_dropout=cfg.attention_dropout,
            act_dropout=cfg.activation_dropout,
            rng=rngs[i], deterministic=deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    return _project(p["out_proj"], x, cfg.activation_fn, out_dtype=x.dtype)


def make_beam_step(variables: Dict[str, Params],
                   cfg: TransformerTextConfig, enc_out, enc_pad):
    """Generic beam step fn for learned-position decoders (BART family):
    full-cache decoder steps with the learned position row at step+PAD+1.
    enc_out/enc_pad tiled to N = B*K."""
    from ..nn.attention import cross_attn_precompute, self_attn_cache_init
    from ..nn.transformer import decoder_layer_step
    p = decoder_view(variables["params"], cfg)
    dim = cfg.decoder_embed_dim
    heads = cfg.decoder_attention_heads
    scale = 1.0 if cfg.no_scale_embedding else dim ** 0.5
    cross_kvs = tuple(
        cross_attn_precompute(p[f"layer{i}"]["cross_attn"], enc_out, heads)
        for i in range(cfg.decoder_layers))

    def step_fn(tokens_t, step, caches):
        x = embedding(p["embed"], tokens_t, cfg.dtype) \
            * jnp.asarray(scale, cfg.dtype)
        x = x + embedding(p["embed_positions"],
                          jnp.asarray(step + PAD + 1), cfg.dtype)[None, None]
        if "embed_ln" in p:
            x = layer_norm(p["embed_ln"], x)
        new_caches = []
        for i in range(cfg.decoder_layers):
            x, c, _ = decoder_layer_step(
                p[f"layer{i}"], x, caches[i], step, cross_kvs[i], enc_pad,
                heads, normalize_before=cfg.decoder_normalize_before,
                activation=cfg.activation_fn)
            new_caches.append(c)
        if "final_ln" in p:
            x = layer_norm(p["final_ln"], x)
        logits = _project(p["out_proj"], x[:, 0], cfg.activation_fn,
                          out_dtype=jnp.float32)
        return (jax.nn.log_softmax(logits.astype(jnp.float32), -1),
                tuple(new_caches))

    return step_fn


def init_beam_cache(cfg: TransformerTextConfig, n: int, max_len: int):
    from ..nn.attention import self_attn_cache_init
    heads = cfg.decoder_attention_heads
    return tuple(
        self_attn_cache_init(n, max_len + 1, heads,
                             cfg.decoder_embed_dim // heads, cfg.dtype)
        for _ in range(cfg.decoder_layers))


def _aux_cfg(cfg: TransformerTextConfig) -> s2st.S2STConfig:
    """S2STConfig shim carrying the decoder hyperparameters where
    ``aux_decode`` / ``beam_search_aux(which="decoder")`` read them
    (the st_* slots, since which != "aux_asr_decoder")."""
    return s2st.S2STConfig(
        st_decoder_embed_dim=cfg.decoder_embed_dim,
        st_decoder_layers=cfg.decoder_layers,
        decoder_attention_heads=cfg.decoder_attention_heads,
        decoder_normalize_before=cfg.decoder_normalize_before,
        decoder_ffn_embed_dim=cfg.decoder_ffn_embed_dim,
        encoder_embed_dim=cfg.encoder_embed_dim,
        activation_fn=cfg.activation_fn,
        activation_dropout=cfg.activation_dropout,
        attention_dropout=cfg.attention_dropout,
        dropout=cfg.dropout,
        no_scale_embedding=cfg.no_scale_embedding,
        dtype=cfg.dtype)


def forward(variables: Dict[str, Params], cfg: TransformerTextConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """batch: src_tokens (B, Ts), prev_output_tokens (B, Tt) int32."""
    r_enc, r_dec = split_rngs(rng, 2)
    enc = encode(variables, cfg, batch["src_tokens"], rng=r_enc,
                 deterministic=deterministic)
    logits = decode(variables, cfg, batch["prev_output_tokens"],
                    enc["encoder_out"], enc["encoder_padding_mask"],
                    rng=r_dec, deterministic=deterministic)
    return {"logits": logits,
            "encoder_out": enc["encoder_out"],
            "encoder_padding_mask": enc["encoder_padding_mask"],
            "new_stats": {}}


def generation_variables(variables: Dict[str, Params],
                         cfg: TransformerTextConfig) -> Dict[str, Params]:
    """Variables with the decoder views materialized under
    params["decoder"] so ``beam_search_aux(..., which="decoder")`` finds
    embed/out_proj where the aux layout has them."""
    return {"params": {**variables["params"],
                       "decoder": decoder_view(variables["params"], cfg)}}
