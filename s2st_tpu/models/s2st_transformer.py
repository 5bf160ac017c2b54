"""Direct speech-to-speech translation transformer (TPU-native).

Capability parity with the reference ``s2st_transformer``
(``examples/s2s_trans/models/s2st_transformer.py:580``, Translatotron-style):

- Conv1d GLU x2-stride subsampler (``:94-140``),
- N-layer transformer encoder emitting middle-layer taps (``:195-237``),
- autoregressive spectrogram decoder: Prenet -> transformer layers ->
  feat/eos projections -> Postnet residual (``:319-456``),
- auxiliary ASR / ST text transformer decoders over encoder taps
  (``:483-578``) and a CTC projection over tap 0 (``:362-365,458-463``),
- optional speaker embeddings on both sides (``:204-206,441-444``),
- optional frozen HuBERT waveform frontend (``:245-252``; wired in via
  ``s2st_tpu.models.hubert``).

TPU-native design departures (deliberate, see SURVEY.md §7):
- batch-major (B, T, C) activations; one jittable pure function per phase;
- the AR decode path uses fixed-shape KV caches + ``lax`` loops
  (``s2st_tpu.generate.speech_generator``) instead of incremental_state dicts;
- aux decoders embed tokens directly at their own width (the reference
  accidentally embeds ASR tokens at 512 and projects down — a side effect of
  argparse mutation it later patches with ``convert_pt_to512.py``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import (Params, calculate_gain, conv1d, conv1d_init, dropout,
                       embedding, embedding_init, glu, layer_norm,
                       layer_norm_init, lengths_to_padding_mask, linear,
                       linear_init, split_rngs)
from ..nn.attention import causal_mask
from ..nn.tacotron import postnet, postnet_init, prenet, prenet_init
from ..nn.transformer import (decoder_layer, decoder_layer_init, encoder_layer,
                              encoder_layer_init, positions_for_lengths,
                              sinusoidal_table)

PAD = 1  # fairseq Dictionary: bos=0 pad=1 eos=2 unk=3


@dataclass(frozen=True)
class S2STConfig:
    """Hyperparameters. Defaults mirror the reference ``base_architecture``
    (s2st_transformer.py:792-830) plus the run_baseline.sh recipe overrides
    where noted."""
    # vocab
    src_vocab_size: int = 100
    tgt_vocab_size: int = 100
    # input
    input_feat_per_channel: int = 80
    input_channels: int = 1
    # conv subsampler
    conv_kernel_sizes: Tuple[int, ...] = (5, 5)
    conv_channels: int = 1024
    # encoder
    encoder_layers: int = 12
    encoder_embed_dim: int = 512
    encoder_ffn_embed_dim: int = 2048
    encoder_attention_heads: int = 4
    encoder_normalize_before: bool = True
    middle_layers: Tuple[int, ...] = (6,)
    # decoder
    decoder_layers: int = 6
    decoder_embed_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_attention_heads: int = 4
    decoder_normalize_before: bool = True  # recipe passes --decoder-normalize-before
    # spectrogram head
    output_frame_dim: int = 80
    n_frames_per_step: int = 1
    prenet_layers: int = 2
    prenet_dim: int = 256
    prenet_dropout: float = 0.5
    postnet_layers: int = 5
    postnet_conv_dim: int = 512
    postnet_conv_kernel_size: int = 5
    postnet_dropout: float = 0.5
    # aux heads
    ctc: bool = False
    aux_asr: bool = False
    aux_st: bool = False
    # MTL variant (s2st_transformer_mtl.py:231-273): decoder middle-layer
    # taps + target-side CTC projection over them
    middle_layers_decoder: Tuple[int, ...] = ()
    ctc_tgt: bool = False
    asr_decoder_layers: int = 6
    asr_decoder_embed_dim: int = 256
    st_decoder_layers: int = 6
    st_decoder_embed_dim: int = 256
    # speaker
    num_speakers: int = 0
    speaker_embed_dim: int = 64
    speaker_embed_dim_dec: int = 64
    # regularization
    dropout: float = 0.1
    attention_dropout: float = 0.1
    # route full-sequence attention through the Pallas flash kernel
    # (nn/attention.attend_flash). Only takes effect where expressible:
    # attention_dropout must be 0 (the kernel has no prob-dropout) and the
    # guided-attention alignment layer keeps the weights-returning path.
    use_flash_attention: bool = False
    activation_dropout: float = 0.01
    # LayerDrop (fairseq/modules/layer_drop.py, arXiv 1909.11556): each
    # encoder layer is skipped for the whole batch with this probability
    # at train time. Under jit the layer still computes (static graph) and
    # a select keeps/drops its output — same training semantics, no FLOP
    # savings (TPU-native tradeoff).
    encoder_layerdrop: float = 0.0
    activation_fn: str = "relu"
    no_scale_embedding: bool = False
    # positions
    max_source_positions: int = 3000
    max_target_positions: int = 2400
    # frontend (hubert-base defaults; the small knobs exist so CPU tests
    # and small variants don't instantiate a 95M frontend)
    use_hubert: bool = False
    hubert_hidden: int = 768
    hubert_layers: int = 12
    hubert_ffn: int = 3072
    hubert_heads: int = 12
    # compute
    dtype: Any = jnp.bfloat16
    # remat: checkpoint each transformer layer (trades FLOPs for HBM)
    remat: bool = False
    # Megatron-style vocab-parallel aux-decoder embedding tables (masked
    # local gather + psum, parallel/vocab_parallel.py) — use when vocabs
    # grow past "replicating the table is free"; requires a model axis > 1
    # and vocab divisible by it, otherwise falls back to replicated.
    vocab_parallel_embed: bool = False

    @property
    def out_dim(self) -> int:
        return self.output_frame_dim * self.n_frames_per_step

    def replace(self, **kw) -> "S2STConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _subsampler_init(key, cfg: S2STConfig) -> Params:
    in_ch = (cfg.hubert_hidden if cfg.use_hubert
             else cfg.input_feat_per_channel * cfg.input_channels)
    n = len(cfg.conv_kernel_sizes)
    ks = jax.random.split(key, n)
    p = {}
    for i, k in enumerate(cfg.conv_kernel_sizes):
        cin = in_ch if i == 0 else cfg.conv_channels // 2
        cout = cfg.conv_channels if i < n - 1 else cfg.encoder_embed_dim * 2
        # encoder_init: xavier_uniform with relu gain (s2st_transformer.py:41-43)
        p[f"conv{i}"] = conv1d_init(ks[i], cin, cout, k, init="xavier",
                                    gain=calculate_gain("relu"))
    return p


def _aux_decoder_init(key, cfg: S2STConfig, vocab: int, dim: int,
                      n_layers: int) -> Params:
    ks = jax.random.split(key, n_layers + 3)
    p: Params = {
        "embed": embedding_init(ks[0], vocab, dim, padding_idx=PAD),
        "out_proj": {"w": jax.random.normal(ks[1], (dim, vocab)) * (dim ** -0.5)},
    }
    for i in range(n_layers):
        p[f"layer{i}"] = decoder_layer_init(
            ks[2 + i], dim, cfg.decoder_ffn_embed_dim,
            cfg.decoder_attention_heads, kv_dim=cfg.encoder_embed_dim)
    if cfg.decoder_normalize_before:
        # fairseq TransformerDecoder adds a final LN under normalize_before
        # (transformer_decoder.py; the recipe always passes the flag)
        p["final_ln"] = layer_norm_init(dim)
    return p


def init_s2st(key, cfg: S2STConfig) -> Dict[str, Params]:
    """Returns {"params": ..., "stats": ...} (stats = postnet batch-norm).

    When cfg.use_hubert, a frozen HuBERT frontend lives under
    params["hubert"] (random init here; replaced by the torch-ckpt loader,
    s2st_transformer.py:684-697 build_hubert parity). Its gradients are cut
    with stop_gradient in encode()."""
    keys = iter(jax.random.split(key, 64))
    params: Params = {}

    if cfg.use_hubert:
        from .hubert import HubertConfig, init_hubert
        hcfg = HubertConfig(encoder_embed_dim=cfg.hubert_hidden,
                            encoder_layers=cfg.hubert_layers,
                            encoder_ffn_embed_dim=cfg.hubert_ffn,
                            encoder_attention_heads=cfg.hubert_heads,
                            dtype=cfg.dtype)
        params["hubert"] = init_hubert(next(keys), hcfg)

    # --- encoder ---
    enc: Params = {"subsample": _subsampler_init(next(keys), cfg)}
    for i in range(cfg.encoder_layers):
        enc[f"layer{i}"] = encoder_layer_init(
            next(keys), cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
            cfg.encoder_attention_heads)
    if cfg.encoder_normalize_before:
        enc["final_ln"] = layer_norm_init(cfg.encoder_embed_dim)
    if cfg.aux_asr:
        enc["aux_asr_norm"] = layer_norm_init(cfg.encoder_embed_dim)
    if cfg.aux_st:
        enc["aux_st_norm"] = layer_norm_init(cfg.encoder_embed_dim)
    if cfg.num_speakers > 0:
        enc["embed_speaker"] = embedding_init(next(keys), cfg.num_speakers,
                                              cfg.speaker_embed_dim)
    params["encoder"] = enc

    # --- spectrogram decoder ---
    dec: Params = {
        "prenet": prenet_init(next(keys), cfg.out_dim, cfg.prenet_layers,
                              cfg.prenet_dim),
        "prenet_proj": linear_init(next(keys), cfg.prenet_dim,
                                   cfg.decoder_embed_dim),
        "pos_emb_alpha": jnp.ones((1,)),
        "feat_proj": linear_init(next(keys), cfg.decoder_embed_dim, cfg.out_dim),
        "eos_proj": linear_init(next(keys), cfg.decoder_embed_dim, 1),
    }
    for i in range(cfg.decoder_layers):
        dec[f"layer{i}"] = decoder_layer_init(
            next(keys), cfg.decoder_embed_dim, cfg.decoder_ffn_embed_dim,
            cfg.decoder_attention_heads, kv_dim=cfg.encoder_embed_dim)
    if cfg.decoder_normalize_before:
        dec["final_ln"] = layer_norm_init(cfg.decoder_embed_dim)
    dec["postnet"], postnet_stats = postnet_init(
        next(keys), cfg.out_dim, cfg.postnet_conv_dim,
        cfg.postnet_conv_kernel_size, cfg.postnet_layers)
    if cfg.num_speakers > 0:
        dec["embed_speaker"] = embedding_init(next(keys), cfg.num_speakers,
                                              cfg.speaker_embed_dim_dec)
    if cfg.ctc:
        dec["ctc_proj"] = linear_init(next(keys), cfg.encoder_embed_dim,
                                      cfg.src_vocab_size)
    if cfg.ctc_tgt:
        dec["ctc_proj_tgt"] = linear_init(next(keys), cfg.decoder_embed_dim,
                                          cfg.tgt_vocab_size)
    params["decoder"] = dec

    if cfg.aux_asr:
        params["aux_asr_decoder"] = _aux_decoder_init(
            next(keys), cfg, cfg.src_vocab_size, cfg.asr_decoder_embed_dim,
            cfg.asr_decoder_layers)
    if cfg.aux_st:
        params["aux_st_decoder"] = _aux_decoder_init(
            next(keys), cfg, cfg.tgt_vocab_size, cfg.st_decoder_embed_dim,
            cfg.st_decoder_layers)

    return {"params": params, "stats": {"postnet": postnet_stats}}


# ---------------------------------------------------------------------------
# subsampler
# ---------------------------------------------------------------------------

def _get_layer(p: Params, i: int) -> Params:
    """Per-layer params from either layout: layer{i} keys (default) or the
    pre-stacked stage-sharded "layers_stacked" used under pipeline
    parallelism (parallel.pipeline.stack_pipeline_tree). The slice path
    only runs in non-pipeline programs over a stacked state (e.g.
    validation-with-inference during a PP training run)."""
    if f"layer{i}" in p:
        return p[f"layer{i}"]
    return jax.tree_util.tree_map(lambda a: a[i], p["layers_stacked"])


def subsample(p: Params, cfg: S2STConfig, x: jnp.ndarray,
              lengths: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv1dSubsampler parity (s2st_transformer.py:94-140).
    x: (B, T, C) -> (B, ceil(T/2^n), encoder_embed_dim); lengths updated as
    floor((L-1)/2)+1 per layer.

    TPU-native departure: activations beyond each layer's valid length are
    zeroed so the output is exactly invariant to the physical padded shape
    (the static-shape bucket menu must not perturb numerics; the reference's
    conv reads whatever batch padding exists)."""
    n = len(cfg.conv_kernel_sizes)
    for i, k in enumerate(cfg.conv_kernel_sizes):
        x = conv1d(p[f"conv{i}"], x, stride=2, padding=k // 2)
        x = glu(x, axis=-1)
        lengths = (lengths - 1) // 2 + 1
        valid = jnp.arange(x.shape[1])[None, :, None] < lengths[:, None, None]
        x = jnp.where(valid, x, 0.0)
    return x, lengths


def subsampled_length(cfg: S2STConfig, length):
    for _ in cfg.conv_kernel_sizes:
        length = (length - 1) // 2 + 1
    return length


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode(variables: Dict[str, Params], cfg: S2STConfig,
           src_feats: jnp.ndarray, src_lengths: jnp.ndarray,
           speaker: Optional[jnp.ndarray] = None,
           rng: Optional[jax.Array] = None, deterministic: bool = True,
           mesh=None, pp_chunks: int = 1, batch_axes=None
           ) -> Dict[str, Any]:
    """src_feats: (B, T, feat) already in compute dtype. Returns dict with
    encoder_out (B, T', C), encoder_padding_mask (B, T') True=pad,
    out_middle_layers list, out_lengths (B,).

    mesh + pp_chunks: when the mesh has a "stage" axis of size > 1 the
    transformer stack runs as a GPipe pipeline over it (tap-aware: the
    middle-layer taps come from the pipeline's per-layer collection;
    reference pipeline model: model_parallel/models/
    pipeline_parallel_transformer/model.py)."""
    p = variables["params"]["encoder"]
    if cfg.use_hubert:
        # frozen HuBERT frontend: src_feats is the raw waveform (B, L)
        # (s2st_transformer.py:245-252: eval() + no_grad + detach)
        from .hubert import HubertConfig, extract_features
        hcfg = HubertConfig(encoder_embed_dim=cfg.hubert_hidden,
                            encoder_layers=cfg.hubert_layers,
                            encoder_ffn_embed_dim=cfg.hubert_ffn,
                            encoder_attention_heads=cfg.hubert_heads,
                            dtype=cfg.dtype)
        hub = jax.lax.stop_gradient(variables["params"]["hubert"])
        src_feats, src_lengths = extract_features(
            hub, hcfg, src_feats, src_lengths)
        src_feats = jax.lax.stop_gradient(src_feats)
    x = src_feats.astype(cfg.dtype)
    x, out_lengths = subsample(p["subsample"], cfg, x, src_lengths)
    t_out = x.shape[1]

    scale = 1.0 if cfg.no_scale_embedding else cfg.encoder_embed_dim ** 0.5
    x = x * jnp.asarray(scale, x.dtype)
    padding_mask = lengths_to_padding_mask(out_lengths, t_out)
    table = sinusoidal_table(cfg.max_source_positions + PAD + 1,
                             cfg.encoder_embed_dim, PAD)
    x = x + positions_for_lengths(table, out_lengths, t_out, PAD, x.dtype)
    if speaker is not None and "embed_speaker" in p:
        x = x + embedding(p["embed_speaker"], speaker.reshape(-1), x.dtype)[:, None, :]

    rngs = split_rngs(rng, cfg.encoder_layers + 1)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)

    def run_layer(lp, h, pad, r):
        return encoder_layer(lp, h, pad, cfg.encoder_attention_heads,
                             normalize_before=cfg.encoder_normalize_before,
                             activation=cfg.activation_fn,
                             dropout_rate=cfg.dropout,
                             attn_dropout=cfg.attention_dropout,
                             act_dropout=cfg.activation_dropout,
                             rng=r, deterministic=deterministic,
                             use_flash=getattr(cfg, "use_flash_attention",
                                               False))

    layer_fn = jax.checkpoint(run_layer) if cfg.remat else run_layer

    middle: List[jnp.ndarray] = []
    if mesh is not None and mesh.shape.get("stage", 1) > 1:
        from ..parallel.pipeline import pipeline_apply, stack_layer_params
        # pre-stacked stage-sharded stack when the Trainer placed it
        # (parallel.pipeline.stack_pipeline_tree); stacking in-step forces
        # a per-step reshard of the whole stack (r2 verdict Weak #1)
        lp = {"p": p["layers_stacked"] if "layers_stacked" in p
              else stack_layer_params(
                  [p[f"layer{i}"] for i in range(cfg.encoder_layers)])}
        if rng is not None:
            lp["rng"] = jnp.stack([rngs[i]
                                   for i in range(cfg.encoder_layers)])

        def pp_layer(lp_i, h, pad, micro_idx=None):
            # per-layer rng folded with the microbatch index so dropout
            # masks are independent across microbatches (r2 verdict Weak
            # #5; the stream differs from the non-PP path's single draw,
            # which is statistically equivalent)
            r = lp_i.get("rng")
            if r is not None and micro_idx is not None:
                r = jax.random.fold_in(r, micro_idx)
            y = layer_fn(lp_i["p"], h, pad, r)
            if (cfg.encoder_layerdrop > 0.0 and not deterministic
                    and "rng" in lp_i):
                # whole-batch layer drop — the PER-LAYER key (no microbatch
                # fold) keeps the decision identical across microbatches,
                # as it must be
                keep = jax.random.uniform(
                    jax.random.fold_in(lp_i["rng"], 10_000)
                ) >= cfg.encoder_layerdrop
                y = jnp.where(keep, y, h)
            return y

        res = pipeline_apply(pp_layer, lp, x, mesh, pp_chunks,
                             batched_args=(padding_mask,),
                             collect=bool(cfg.middle_layers),
                             batch_axes=batch_axes, pass_micro_idx=True)
        if cfg.middle_layers:
            x, ys = res
            middle = [ys[i] for i in cfg.middle_layers]
        else:
            x = res
    else:
        for i in range(cfg.encoder_layers):
            y = layer_fn(_get_layer(p, i), x, padding_mask, rngs[i])
            if (cfg.encoder_layerdrop > 0.0 and not deterministic
                    and rng is not None):
                keep = jax.random.uniform(
                    jax.random.fold_in(rng, 10_000 + i)
                ) >= cfg.encoder_layerdrop
                y = jnp.where(keep, y, x)
            x = y
            if i in cfg.middle_layers:
                middle.append(x)

    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    if middle and "aux_asr_norm" in p:
        middle[0] = layer_norm(p["aux_asr_norm"], middle[0])
    if len(middle) > 1 and "aux_st_norm" in p:
        middle[1] = layer_norm(p["aux_st_norm"], middle[1])

    return {
        "encoder_out": x,
        "encoder_padding_mask": padding_mask,
        "out_middle_layers": middle,
        "out_lengths": out_lengths,
    }


# ---------------------------------------------------------------------------
# spectrogram decoder (teacher-forced / full-sequence)
# ---------------------------------------------------------------------------

def decode(variables: Dict[str, Params], cfg: S2STConfig,
           prev_output: jnp.ndarray, tgt_lengths: jnp.ndarray,
           encoder_out: Dict[str, Any],
           speaker: Optional[jnp.ndarray] = None,
           rng: Optional[jax.Array] = None, deterministic: bool = True,
           train: bool = False,
           mesh=None, pp_chunks: int = 1, batch_axes=None) -> Dict[str, Any]:
    """Teacher-forced decode. prev_output: (B, Tt, out_dim) shifted targets.

    Returns dict: feat_out, post_feat_out (B, Tt, out_dim), eos_out (B, Tt, 1),
    attn (B, Tt, Ts) head-averaged last-layer cross-attention (fp32),
    new_stats (postnet batch-norm updates).
    """
    p = variables["params"]["decoder"]
    stats = variables["stats"]["postnet"]
    b, tt, _ = prev_output.shape
    x_in = prev_output.astype(cfg.dtype)

    if speaker is not None and "embed_speaker" in p:
        spk = embedding(p["embed_speaker"], speaker.reshape(-1), cfg.dtype)
        # replace the zero BOS frame with the speaker embedding (:441-444)
        x_in = jnp.concatenate([spk[:, None, :], x_in[:, 1:, :]], axis=1)

    rngs = split_rngs(rng, cfg.decoder_layers + 3)
    x = prenet(p["prenet"], x_in, cfg.prenet_dropout, rngs[0],
               always_dropout=rngs[0] is not None)
    x = linear(p["prenet_proj"], x)

    table = sinusoidal_table(cfg.max_target_positions + PAD + 1,
                             cfg.decoder_embed_dim, PAD)
    pos = positions_for_lengths(table, tgt_lengths, tt, PAD, x.dtype)
    x = x + p["pos_emb_alpha"].astype(x.dtype) * pos
    x = dropout(x, cfg.dropout, rngs[1], deterministic)

    self_pad = lengths_to_padding_mask(tgt_lengths, tt)
    mask = causal_mask(tt)
    enc = encoder_out["encoder_out"]
    enc_pad = encoder_out["encoder_padding_mask"]
    alignment_layer = cfg.decoder_layers - 1

    attn = None
    middle_decoder: List[jnp.ndarray] = []
    if mesh is not None and mesh.shape.get("stage", 1) > 1:
        from ..parallel.pipeline import pipeline_apply, stack_layer_params
        nl = cfg.decoder_layers
        lp = {"p": p["layers_stacked"] if "layers_stacked" in p
              else stack_layer_params([p[f"layer{i}"] for i in range(nl)])}
        if rng is not None:
            lp["rng"] = jnp.stack([rngs[2 + i] for i in range(nl)])

        def pp_layer(lp_i, h, e, ep, sp, micro_idx=None):
            r = lp_i.get("rng")
            if r is not None and micro_idx is not None:
                # independent dropout masks per microbatch (Weak #5)
                r = jax.random.fold_in(r, micro_idx)
            h2, _ = decoder_layer(
                lp_i["p"], h, e, ep, causal_mask(h.shape[1]), sp,
                cfg.decoder_attention_heads,
                normalize_before=cfg.decoder_normalize_before,
                activation=cfg.activation_fn, dropout_rate=cfg.dropout,
                attn_dropout=cfg.attention_dropout,
                act_dropout=cfg.activation_dropout,
                rng=r, deterministic=deterministic)
            return h2

        x_pre = x
        x, ys = pipeline_apply(pp_layer, lp, x, mesh, pp_chunks,
                               batched_args=(enc, enc_pad, self_pad),
                               collect=True, batch_axes=batch_axes,
                               pass_micro_idx=True)
        middle_decoder = [ys[i] for i in cfg.middle_layers_decoder]
        # the guided-attention loss needs the alignment weights of the last
        # layer; the pipeline only carries boundary activations, so the last
        # layer is recomputed (replicated) with need_attn — same params, so
        # gradients from the attention loss add correctly (1/L extra FLOPs)
        last_in = ys[nl - 2] if nl >= 2 else x_pre
        _, w = decoder_layer(
            _get_layer(p, nl - 1), last_in, enc, enc_pad, mask, self_pad,
            cfg.decoder_attention_heads,
            normalize_before=cfg.decoder_normalize_before,
            activation=cfg.activation_fn, dropout_rate=cfg.dropout,
            attn_dropout=cfg.attention_dropout,
            act_dropout=cfg.activation_dropout,
            rng=rngs[2 + nl - 1], deterministic=deterministic,
            need_attn=True)
        attn = jnp.mean(w, axis=1)
    else:
        for i in range(cfg.decoder_layers):
            x, w = decoder_layer(
                _get_layer(p, i), x, enc, enc_pad, mask, self_pad,
                cfg.decoder_attention_heads,
                normalize_before=cfg.decoder_normalize_before,
                activation=cfg.activation_fn, dropout_rate=cfg.dropout,
                attn_dropout=cfg.attention_dropout,
                act_dropout=cfg.activation_dropout,
                rng=rngs[2 + i], deterministic=deterministic,
                need_attn=(i == alignment_layer),
                use_flash=getattr(cfg, "use_flash_attention", False),
                self_attn_causal=True)
            if w is not None:
                attn = jnp.mean(w, axis=1)  # (B, Tt, Ts) fp32
            if i in cfg.middle_layers_decoder:
                middle_decoder.append(x)

    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)

    feat_out = linear(p["feat_proj"], x)
    eos_out = linear(p["eos_proj"], x)
    post_res, new_postnet_stats = postnet(
        p["postnet"], stats, feat_out,
        kernel_size=cfg.postnet_conv_kernel_size,
        dropout_rate=cfg.postnet_dropout, train=train, rng=rngs[-1])
    post_feat_out = feat_out + post_res

    return {
        "feat_out": feat_out,
        "post_feat_out": post_feat_out,
        "eos_out": eos_out,
        "attn": attn,
        "out_middle_layers_decoder": middle_decoder,
        "new_stats": {"postnet": new_postnet_stats},
    }


# ---------------------------------------------------------------------------
# aux text decoders + CTC head
# ---------------------------------------------------------------------------

def aux_decode(p: Params, cfg: S2STConfig, dim: int, n_layers: int,
               prev_tokens: jnp.ndarray, enc_tap: jnp.ndarray,
               enc_padding_mask: Optional[jnp.ndarray],
               max_positions: int = 1024,
               rng: Optional[jax.Array] = None, deterministic: bool = True,
               mesh=None, batch_axes=None) -> jnp.ndarray:
    """Standard transformer text decoder over an encoder tap
    (parity: fairseq TransformerDecoder used via ASR/STTransformerDecoderScriptable,
    s2st_transformer.py:483-578). prev_tokens: (B, Tt) int32 -> logits (B, Tt, V).

    mesh/batch_axes: with cfg.vocab_parallel_embed and a model axis > 1,
    the input embedding runs as the Megatron masked-gather+psum shard_map
    op over the vocab-sharded table (parallel/vocab_parallel.py)."""
    b, tt = prev_tokens.shape
    scale = 1.0 if cfg.no_scale_embedding else dim ** 0.5
    tp = mesh.shape.get("model", 1) if mesh is not None else 1
    if cfg.vocab_parallel_embed and tp > 1 \
            and p["embed"]["w"].shape[0] % tp == 0:
        from ..parallel.vocab_parallel import vocab_parallel_embedding
        x = vocab_parallel_embedding(
            p["embed"]["w"], prev_tokens, mesh,
            batch_axes=batch_axes or ("data", "fsdp"), dtype=cfg.dtype)
    else:
        x = embedding(p["embed"], prev_tokens, cfg.dtype)
    x = x * jnp.asarray(scale, cfg.dtype)

    table = sinusoidal_table(max_positions + PAD + 1, dim, PAD)
    # fairseq positions are pad-aware over token ids
    is_pad = prev_tokens == PAD
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    pos_idx = jnp.where(is_pad, PAD, cum + PAD)
    x = x + table[pos_idx].astype(cfg.dtype)

    rngs = split_rngs(rng, n_layers + 1)
    x = dropout(x, cfg.dropout, rngs[-1], deterministic)

    mask = causal_mask(tt)
    self_pad = is_pad
    for i in range(n_layers):
        x, _ = decoder_layer(
            p[f"layer{i}"], x, enc_tap, enc_padding_mask, mask, self_pad,
            cfg.decoder_attention_heads,
            use_flash=getattr(cfg, "use_flash_attention", False),
            self_attn_causal=True,
            normalize_before=cfg.decoder_normalize_before,
            activation=cfg.activation_fn, dropout_rate=cfg.dropout,
            attn_dropout=cfg.attention_dropout,
            act_dropout=cfg.activation_dropout,
            rng=rngs[i], deterministic=deterministic)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    logits = jnp.dot(x, p["out_proj"]["w"].astype(x.dtype),
                     preferred_element_type=x.dtype)
    return logits


def ctc_logits(variables: Dict[str, Params], cfg: S2STConfig,
               enc_tap0: jnp.ndarray) -> jnp.ndarray:
    """CTC projection over encoder tap 0 (s2st_transformer.py:458-463)."""
    return linear(variables["params"]["decoder"]["ctc_proj"], enc_tap0)


# ---------------------------------------------------------------------------
# full forward (training)
# ---------------------------------------------------------------------------

def forward(variables: Dict[str, Params], cfg: S2STConfig, batch: Dict[str, Any],
            rng: Optional[jax.Array] = None, deterministic: bool = True,
            train: bool = False,
            mesh=None, pp_chunks: int = 1, batch_axes=None) -> Dict[str, Any]:
    """Training/teacher-forced forward over a collated batch.

    batch keys (see s2st_tpu.data.s2st_dataset.collate):
      src_speech (B,T,F), src_speech_lens (B,), prev_output_tokens (B,Tt,out_dim),
      target_lengths (B,), optional prev_src_text_tokens / prev_tgt_text_tokens
      (B,Ts_txt)/(B,Tt_txt), optional speaker (B,).

    mesh/pp_chunks/batch_axes: pipeline-parallel execution of the encoder
    and spectrogram-decoder stacks when the mesh has a "stage" axis > 1
    (see encode/decode; aux decoders and heads run replicated).
    """
    r_enc, r_dec, r_asr, r_st = split_rngs(rng, 4)
    speaker = batch.get("speaker")
    enc = encode(variables, cfg, batch["src_speech"], batch["src_speech_lens"],
                 speaker=speaker, rng=r_enc, deterministic=deterministic,
                 mesh=mesh, pp_chunks=pp_chunks, batch_axes=batch_axes)
    dec = decode(variables, cfg, batch["prev_output_tokens"],
                 batch["target_lengths"], enc, speaker=speaker,
                 rng=r_dec, deterministic=deterministic, train=train,
                 mesh=mesh, pp_chunks=pp_chunks, batch_axes=batch_axes)
    out: Dict[str, Any] = {
        "feat_out": dec["feat_out"],
        "post_feat_out": dec["post_feat_out"],
        "eos_out": dec["eos_out"],
        "attn": dec["attn"],
        "encoder_padding_mask": enc["encoder_padding_mask"],
        "encoder_out_lengths": enc["out_lengths"],
        "new_stats": dec["new_stats"],
    }
    params = variables["params"]
    if cfg.ctc and enc["out_middle_layers"]:
        out["ctc_logits"] = ctc_logits(variables, cfg, enc["out_middle_layers"][0])
    if cfg.ctc_tgt and dec["out_middle_layers_decoder"]:
        out["ctc_tgt_logits"] = linear(
            params["decoder"]["ctc_proj_tgt"],
            dec["out_middle_layers_decoder"][0])
    if cfg.aux_asr and "prev_src_text_tokens" in batch:
        out["asr_logits"] = aux_decode(
            params["aux_asr_decoder"], cfg, cfg.asr_decoder_embed_dim,
            cfg.asr_decoder_layers, batch["prev_src_text_tokens"],
            enc["out_middle_layers"][0], enc["encoder_padding_mask"],
            rng=r_asr, deterministic=deterministic,
            mesh=mesh, batch_axes=batch_axes)
    if cfg.aux_st and "prev_tgt_text_tokens" in batch:
        tap = enc["out_middle_layers"][1 if len(enc["out_middle_layers"]) > 1 else 0]
        out["st_logits"] = aux_decode(
            params["aux_st_decoder"], cfg, cfg.st_decoder_embed_dim,
            cfg.st_decoder_layers, batch["prev_tgt_text_tokens"],
            tap, enc["encoder_padding_mask"],
            rng=r_st, deterministic=deterministic,
            mesh=mesh, batch_axes=batch_axes)
    return out


def param_count(variables: Dict[str, Params]) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
