"""FastSpeech2: non-autoregressive text-to-spectrogram
(parity: ``fairseq/models/text_to_speech/fastspeech2.py`` — FFT blocks
with conv FFNs, variance adaptor with duration/pitch/energy predictors and
quantized pitch/energy embeddings, length regulator, optional postnet).

TPU-native design notes:
- The reference's LengthRegulator expands tokens with a per-sample PYTHON
  loop on the host (fastspeech2.py:85-101). Here it is one vectorized
  gather: output position j reads token ``searchsorted(cumsum(dur), j,
  'right')`` — jittable, batched, with a STATIC max output length (XLA
  needs fixed shapes; callers pass ``max_out_len``).
- Everything runs batch-major (B, T, C) in the compute dtype with fp32
  layer norms, like the rest of the package.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.attention import mha, mha_init
from ..nn.core import (Params, dropout, embedding, embedding_init, layer_norm,
                       layer_norm_init, linear, linear_init,
                       lengths_to_padding_mask, split_rngs)
from ..nn.tacotron import postnet, postnet_init
from ..nn.transformer import positions_for_lengths, sinusoidal_table

PAD = 1


@dataclasses.dataclass(frozen=True)
class FS2Config:
    """Defaults = fastspeech2 base_architecture (fastspeech2.py:351-375)."""
    vocab_size: int = 100
    output_frame_dim: int = 80
    n_frames_per_step: int = 1
    encoder_layers: int = 4
    encoder_embed_dim: int = 256
    encoder_attention_heads: int = 2
    decoder_layers: int = 4
    decoder_embed_dim: int = 256
    decoder_attention_heads: int = 2
    fft_hidden_dim: int = 1024
    fft_kernel_size: int = 9
    dropout: float = 0.2
    attention_dropout: float = 0.0
    var_pred_n_bins: int = 256
    var_pred_hidden_dim: int = 256
    var_pred_kernel_size: int = 3
    var_pred_dropout: float = 0.5
    pitch_min: float = 0.0
    pitch_max: float = 600.0
    energy_min: float = 0.0
    energy_max: float = 5.0
    add_postnet: bool = False
    postnet_layers: int = 5
    postnet_conv_dim: int = 512
    postnet_conv_kernel_size: int = 5
    postnet_dropout: float = 0.5
    num_speakers: int = 0
    speaker_embed_dim: int = 64
    max_source_positions: int = 1024
    max_target_positions: int = 2048
    ctc: bool = False
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.output_frame_dim * self.n_frames_per_step

    def replace(self, **kw) -> "FS2Config":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv1d_init(key, cin, cout, k):
    # torch Conv1d + model_init xavier_uniform with relu gain
    # (fastspeech2.py:24-26); bias keeps the torch default fan-in uniform
    from ..nn.core import uniform_fan, xavier_uniform, calculate_gain
    kw, kb = jax.random.split(key)
    w = xavier_uniform(kw, (k, cin, cout), cin * k, cout * k,
                       gain=calculate_gain("relu"))
    return {"w": w, "b": uniform_fan(kb, (cout,), cin * k)}


def _fft_layer_init(key, dim, heads, hidden, k):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(ks[0], dim, heads),
        "attn_ln": layer_norm_init(dim),
        "conv1": _conv1d_init(ks[1], dim, hidden, k),
        "conv2": _conv1d_init(ks[2], hidden, dim, k),
        "ffn_ln": layer_norm_init(dim),
    }


def _var_predictor_init(key, cfg: FS2Config, in_dim):
    ks = jax.random.split(key, 3)
    h = cfg.var_pred_hidden_dim
    return {
        "conv1": _conv1d_init(ks[0], in_dim, h, cfg.var_pred_kernel_size),
        "ln1": layer_norm_init(h),
        # the reference's second conv uses padding=1 regardless of kernel
        # (fastspeech2.py:120-124) — same here via pad_1 at apply time
        "conv2": _conv1d_init(ks[1], h, h, cfg.var_pred_kernel_size),
        "ln2": layer_norm_init(h),
        "proj": linear_init(ks[2], h, 1),
    }


def init_fs2(key, cfg: FS2Config) -> Dict[str, Params]:
    ks = jax.random.split(key, 16)
    d = cfg.encoder_embed_dim
    p: Dict[str, Any] = {
        "embed": embedding_init(ks[0], cfg.vocab_size, d, PAD),
        "pos_emb_alpha": jnp.ones(()),
        "dec_pos_emb_alpha": jnp.ones(()),
        "enc_layers": [
            _fft_layer_init(jax.random.fold_in(ks[1], i), d,
                            cfg.encoder_attention_heads, cfg.fft_hidden_dim,
                            cfg.fft_kernel_size)
            for i in range(cfg.encoder_layers)],
        "dec_layers": [
            _fft_layer_init(jax.random.fold_in(ks[2], i),
                            cfg.decoder_embed_dim,
                            cfg.decoder_attention_heads, cfg.fft_hidden_dim,
                            cfg.fft_kernel_size)
            for i in range(cfg.decoder_layers)],
        "dur_pred": _var_predictor_init(ks[3], cfg, d),
        "pitch_pred": _var_predictor_init(ks[4], cfg, d),
        "energy_pred": _var_predictor_init(ks[5], cfg, d),
        "embed_pitch": embedding_init(ks[6], cfg.var_pred_n_bins, d),
        "embed_energy": embedding_init(ks[7], cfg.var_pred_n_bins, d),
        "out_proj": linear_init(ks[8], cfg.decoder_embed_dim, cfg.out_dim),
    }
    stats: Dict[str, Any] = {}
    if cfg.add_postnet:
        p["postnet"], stats["postnet"] = postnet_init(
            ks[9], cfg.out_dim, cfg.postnet_conv_dim,
            cfg.postnet_conv_kernel_size, cfg.postnet_layers)
    if cfg.num_speakers > 0:
        p["embed_speaker"] = embedding_init(
            ks[10], cfg.num_speakers, cfg.speaker_embed_dim)
        p["spk_proj"] = linear_init(
            ks[11], d + cfg.speaker_embed_dim, d)
    if cfg.ctc:
        p["ctc_proj"] = linear_init(ks[12], cfg.out_dim, cfg.vocab_size)
    return {"params": p, "stats": stats}


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _conv1d(p, x, pad):
    """x: (B, T, Cin), weight (k, Cin, Cout), 'same'-style given pad."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1,),
        padding=[(pad, pad)], dimension_numbers=("NTC", "TIO", "NTC"))
    return y + p["b"].astype(x.dtype)


def _fft_layer(p, x, padding_mask, heads, k, *, dropout_rate, attn_dropout,
               rng=None, deterministic=True):
    """FFT block (fastspeech2.py:58-82): post-norm self-attn then post-norm
    conv FFN."""
    r1, r2 = split_rngs(rng, 2)
    residual = x
    h, _ = mha(p["self_attn"], x, x, x, heads,
               key_padding_mask=padding_mask, dropout_rate=attn_dropout,
               rng=r1, deterministic=deterministic)
    x = layer_norm(p["attn_ln"], residual + h)

    residual = x
    h = jax.nn.relu(_conv1d(p["conv1"], x, (k - 1) // 2))
    h = _conv1d(p["conv2"], h, (k - 1) // 2)
    h = dropout(h, dropout_rate, r2, deterministic)
    return layer_norm(p["ffn_ln"], residual + h)


def _var_predictor(p, x, k, *, dropout_rate, rng=None, deterministic=True):
    """(B, T, C) -> (B, T) (fastspeech2.py:104-136)."""
    r1, r2 = split_rngs(rng, 2)
    h = jax.nn.relu(_conv1d(p["conv1"], x, (k - 1) // 2))
    h = dropout(layer_norm(p["ln1"], h), dropout_rate, r1, deterministic)
    h = jax.nn.relu(_conv1d(p["conv2"], h, 1))   # reference: padding=1
    h = dropout(layer_norm(p["ln2"], h), dropout_rate, r2, deterministic)
    return linear(p["proj"], h)[:, :, 0]


def length_regulator(x: jnp.ndarray, durations: jnp.ndarray,
                     max_out_len: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand (B, T, C) by integer durations -> (B, max_out_len, C).

    Vectorized replacement for the reference's per-sample host loop
    (fastspeech2.py:85-101): output j takes the token whose cumulative
    duration first exceeds j. Positions >= sum(durations) are ZEROED to
    match the reference's new_zeros buffer — the decoder FFT convs read
    past each row's end, so this fill value affects valid frames."""
    cum = jnp.cumsum(durations, axis=1)                      # (B, T)
    out_lens = cum[:, -1]
    j = jnp.arange(max_out_len)
    # idx[b, j] = #{t : cum[b, t] <= j} == searchsorted(cum[b], j, 'right')
    idx = jax.vmap(lambda c: jnp.searchsorted(c, j, side="right"))(cum)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    out = jnp.where(j[None, :, None] < out_lens[:, None, None], out, 0)
    return out, out_lens


def _bucketize(x, vmin, vmax, n_bins):
    """torch.bucketize(right=False) against linspace(vmin, vmax, n_bins-1)
    boundaries — side="left" so a value exactly on a boundary (e.g. the
    very common pitch 0.0 == bins[0] when pitch_min=0) lands in the same
    bin as in the reference."""
    bins = jnp.linspace(vmin, vmax, n_bins - 1)
    return jnp.searchsorted(bins, x, side="left")


def forward(variables: Dict[str, Params], cfg: FS2Config,
            src_tokens: jnp.ndarray, src_lengths: jnp.ndarray,
            speaker: Optional[jnp.ndarray] = None,
            durations: Optional[jnp.ndarray] = None,
            pitches: Optional[jnp.ndarray] = None,
            energies: Optional[jnp.ndarray] = None,
            max_out_len: Optional[int] = None,
            d_factor: float = 1.0, p_factor: float = 1.0,
            e_factor: float = 1.0, min_duration: int = 0,
            rng: Optional[jax.Array] = None, deterministic: bool = True,
            train: bool = False) -> Dict[str, Any]:
    """One NAR pass (fastspeech2.py:257-287). Teacher-forced when
    durations/pitches/energies are given (training); free-running otherwise.

    max_out_len: static output length bound (defaults to
    cfg.max_target_positions; pass the padded target length in training).
    Returns dict: feat_out, post_feat_out, out_lens, log_dur_out,
    pitch_out, energy_out, ctc_logits?.
    """
    p = variables["params"]
    b, t = src_tokens.shape
    max_out = max_out_len or cfg.max_target_positions
    rngs = split_rngs(rng, 8)

    x = embedding(p["embed"], src_tokens, cfg.dtype)
    enc_pad = src_tokens == PAD
    table = sinusoidal_table(cfg.max_source_positions + PAD + 1,
                             cfg.encoder_embed_dim, PAD)
    x = x + p["pos_emb_alpha"].astype(x.dtype) * positions_for_lengths(
        table, src_lengths, t, PAD, x.dtype)
    x = dropout(x, cfg.dropout, rngs[0], deterministic)
    for i, lp in enumerate(p["enc_layers"]):
        x = _fft_layer(lp, x, enc_pad, cfg.encoder_attention_heads,
                       cfg.fft_kernel_size, dropout_rate=cfg.dropout,
                       attn_dropout=cfg.attention_dropout,
                       rng=jax.random.fold_in(rngs[1], i)
                       if rngs[1] is not None else None,
                       deterministic=deterministic)

    if speaker is not None and "embed_speaker" in p:
        emb = embedding(p["embed_speaker"], speaker.reshape(-1), x.dtype)
        emb = jnp.broadcast_to(emb[:, None, :], (b, t, emb.shape[-1]))
        x = linear(p["spk_proj"], jnp.concatenate([x, emb], axis=2))

    # variance adaptor (fastspeech2.py:173-194)
    log_dur_out = _var_predictor(p["dur_pred"], x, cfg.var_pred_kernel_size,
                                 dropout_rate=cfg.var_pred_dropout,
                                 rng=rngs[2], deterministic=deterministic)
    dur_out = jnp.clip(jnp.round((jnp.exp(log_dur_out) - 1.0) * d_factor),
                       0, None).astype(jnp.int32)
    # min_duration: serving floor for free-running decode (an extension —
    # an undertrained/out-of-domain duration predictor can collapse to 0
    # frames; the reference emits empty audio in that case)
    dur_out = jnp.maximum(dur_out, min_duration)
    dur_out = jnp.where(enc_pad, 0, dur_out)

    pitch_out = _var_predictor(p["pitch_pred"], x, cfg.var_pred_kernel_size,
                               dropout_rate=cfg.var_pred_dropout,
                               rng=rngs[3], deterministic=deterministic)
    pitch_src = pitches if pitches is not None else pitch_out * p_factor
    x = x + embedding(p["embed_pitch"], _bucketize(
        pitch_src, cfg.pitch_min, cfg.pitch_max, cfg.var_pred_n_bins),
        x.dtype)

    energy_out = _var_predictor(p["energy_pred"], x,
                                cfg.var_pred_kernel_size,
                                dropout_rate=cfg.var_pred_dropout,
                                rng=rngs[4], deterministic=deterministic)
    energy_src = energies if energies is not None else energy_out * e_factor
    x = x + embedding(p["embed_energy"], _bucketize(
        energy_src, cfg.energy_min, cfg.energy_max, cfg.var_pred_n_bins),
        x.dtype)

    x, out_lens = length_regulator(
        x, durations if durations is not None else dur_out, max_out)
    # free-running durations can sum past the static buffer; keep the
    # reported lengths consistent with the frames actually produced
    out_lens = jnp.minimum(out_lens, max_out)

    dec_pad = lengths_to_padding_mask(out_lens, max_out)
    dec_table = sinusoidal_table(cfg.max_target_positions + PAD + 1,
                                 cfg.decoder_embed_dim, PAD)
    x = x + p["dec_pos_emb_alpha"].astype(x.dtype) * positions_for_lengths(
        dec_table, out_lens, max_out, PAD, x.dtype)
    for i, lp in enumerate(p["dec_layers"]):
        x = _fft_layer(lp, x, dec_pad, cfg.decoder_attention_heads,
                       cfg.fft_kernel_size, dropout_rate=cfg.dropout,
                       attn_dropout=cfg.attention_dropout,
                       rng=jax.random.fold_in(rngs[5], i)
                       if rngs[5] is not None else None,
                       deterministic=deterministic)

    feat = linear(p["out_proj"], x)
    out: Dict[str, Any] = {
        "feat_out": feat,
        "post_feat_out": feat,
        "out_lens": out_lens,
        "log_dur_out": log_dur_out,
        "pitch_out": pitch_out,
        "energy_out": energy_out,
        "new_stats": {},
    }
    if cfg.add_postnet:
        res, new_stats = postnet(
            p["postnet"], variables["stats"]["postnet"], feat,
            kernel_size=cfg.postnet_conv_kernel_size,
            dropout_rate=cfg.postnet_dropout, train=train, rng=rngs[6])
        out["post_feat_out"] = feat + res
        out["new_stats"] = {"postnet": new_stats}
    if cfg.ctc and "ctc_proj" in p:
        out["ctc_logits"] = linear(p["ctc_proj"], feat)
    return out


def param_count(variables) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
