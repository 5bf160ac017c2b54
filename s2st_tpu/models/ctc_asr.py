"""CTC ASR fine-tuning of SSL speech encoders (wav2vec 2.0 / HuBERT).

Parity: fairseq/models/wav2vec/wav2vec2_asr.py (Wav2VecCtc + Wav2VecEncoder,
:155-435) and fairseq/models/hubert/hubert_asr.py (HubertCtc + HubertEncoder)
— both wrap the same transformer trunk, apply an optional span mask during
fine-tuning, freeze the trunk for the first ``freeze_finetune_updates``
updates, then project to the target vocabulary for CTC.

TPU-first departures:
- one trunk implementation (``models/hubert.py`` holds the shared conv
  extractor + post-LN/pre-LN transformer used by both SSL families);
- freeze-for-N-updates is a traced ``jnp.where(ft, x, stop_gradient(x))``
  select on the trunk output (+ per-leaf grad zeroing falls out of it),
  not a Python-level ``torch.no_grad`` branch — the compiled step is
  identical across the thaw boundary;
- padded frames are excluded via CTC logit paddings instead of the
  reference's in-place blank-forcing (get_logits, wav2vec2_asr.py:179-196);
  the blank-forcing form is reproduced exactly in ``get_ctc_logits`` for
  inference/parity.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import Params, dropout, layer_norm, lengths_to_padding_mask, \
    linear
from .hubert import (HubertConfig, _encoder_layer, _extractor, _pos_conv,
                     init_hubert)


@dataclass(frozen=True)
class CtcAsrConfig:
    """Wav2Vec2CtcConfig / HubertCtcConfig essentials
    (wav2vec2_asr.py:40-160)."""
    trunk: HubertConfig
    vocab_size: int
    final_dropout: float = 0.0
    apply_mask: bool = False
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 10
    freeze_finetune_updates: int = 0
    blank_weight: float = 0.0
    blank_mode: str = "add"
    dtype: Any = jnp.float32


def init_ctc_asr(key, cfg: CtcAsrConfig) -> Dict[str, Params]:
    """Trunk + mask_emb + proj (Wav2VecEncoder.__init__ :311-387)."""
    k0, k1, k2 = jax.random.split(key, 3)
    w2v = init_hubert(k0, cfg.trunk)
    d = cfg.trunk.encoder_embed_dim
    w2v["mask_emb"] = jax.random.uniform(k1, (d,))
    p = {"w2v": w2v,
         "proj": {"w": jax.random.normal(k2, (d, cfg.vocab_size)) * d ** -0.5,
                  "b": jnp.zeros((cfg.vocab_size,))}}
    return {"params": p, "stats": {"num_updates": jnp.zeros((), jnp.int32)}}


def _trunk_encode(params: Params, cfg: CtcAsrConfig, source: jnp.ndarray,
                  lengths: jnp.ndarray, rng, train: bool
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HubertModel/Wav2Vec2Model.extract_features with fine-tune masking:
    conv extractor -> LN -> post_proj -> dropout_input -> span/channel
    mask -> pos-conv transformer. Returns (x (B,T,C), padding_mask)."""
    from .wav2vec2 import compute_span_mask
    t = cfg.trunk
    det = not train or rng is None
    r = jax.random.split(rng, 5) if not det else (None,) * 5
    feats = _extractor(params["extractor"], t, source.astype(t.dtype))
    if t.feature_grad_mult != 1.0:
        c = t.feature_grad_mult
        feats = (jax.lax.stop_gradient(feats) if c == 0.0
                 else feats * c + jax.lax.stop_gradient(feats) * (1.0 - c))
    t_out = feats.shape[1]
    out_lengths = jnp.clip(t.output_length(lengths), 0, t_out)
    padding_mask = lengths_to_padding_mask(out_lengths, t_out)

    x = layer_norm(params["feat_ln"], feats)
    x = linear(params["post_proj"], x)
    x = dropout(x, t.dropout_input, r[0], det)

    if cfg.apply_mask and train:
        if t.mask_prob > 0:
            mask = compute_span_mask(r[1], out_lengths, t_out, t.mask_prob,
                                     t.mask_length, min_masks=2)
            x = jnp.where(mask[:, :, None],
                          params["mask_emb"].astype(x.dtype)[None, None, :],
                          x)
        if cfg.mask_channel_prob > 0:
            c_dim = x.shape[2]
            cmask = compute_span_mask(
                r[2], jnp.full((x.shape[0],), c_dim, jnp.int32), c_dim,
                cfg.mask_channel_prob, cfg.mask_channel_length, min_masks=0)
            x = jnp.where(cmask[:, None, :], 0.0, x)

    x = jnp.where(padding_mask[:, :, None], 0.0, x)
    x = x + _pos_conv(params["pos_conv"], t, x)
    if not t.layer_norm_first:
        x = layer_norm(params["enc_ln"], x)
    x = dropout(x, t.dropout, r[3], det)
    lr = jax.random.split(r[4], t.encoder_layers) if not det \
        else [None] * t.encoder_layers
    for i in range(t.encoder_layers):
        x = _encoder_layer(params[f"layer{i}"], t, x, padding_mask,
                           rng=lr[i], train=train,
                           rates=(t.dropout, t.activation_dropout, 0.0))
    if t.layer_norm_first:
        x = layer_norm(params["enc_ln"], x)
    return x, padding_mask


def forward_ctc(params: Params, cfg: CtcAsrConfig, source: jnp.ndarray,
                lengths: jnp.ndarray, rng=None, train: bool = False,
                num_updates=0) -> Dict[str, jnp.ndarray]:
    """Wav2VecEncoder.forward (wav2vec2_asr.py:389-416): trunk (frozen for
    the first freeze_finetune_updates) -> final_dropout -> proj.
    Returns batch-major logits (B, T, V) + padding_mask (B, T)."""
    det = not train or rng is None
    r = jax.random.split(rng, 2) if not det else (None, None)
    x, padding_mask = _trunk_encode(params["w2v"], cfg, source, lengths,
                                    r[0], train)
    ft = jnp.asarray(num_updates) >= cfg.freeze_finetune_updates
    x = jnp.where(ft, x, jax.lax.stop_gradient(x))
    x = dropout(x, cfg.final_dropout, r[1], det)
    logits = linear(params["proj"], x)
    return {"logits": logits, "padding_mask": padding_mask}


def get_ctc_logits(net: Dict[str, jnp.ndarray], cfg: CtcAsrConfig,
                   normalize: bool = False) -> jnp.ndarray:
    """Wav2VecCtc.get_logits/get_normalized_probs (wav2vec2_asr.py:179-207),
    batch-major: blank_weight add/set on column 0, padded frames forced to
    the blank (+inf blank / -inf rest), optional fp32 log_softmax."""
    logits = net["logits"].astype(jnp.float32)
    if cfg.blank_weight != 0:
        if cfg.blank_mode == "add":
            logits = logits.at[..., 0].add(cfg.blank_weight)
        elif cfg.blank_mode == "set":
            logits = logits.at[..., 0].set(cfg.blank_weight)
        else:
            raise ValueError(f"invalid blank mode {cfg.blank_mode}")
    pad = net["padding_mask"][:, :, None]
    col = jnp.arange(logits.shape[-1])[None, None, :] == 0
    logits = jnp.where(pad & col, jnp.inf, logits)
    logits = jnp.where(pad & ~col, -jnp.inf, logits)
    if normalize:
        logits = jax.nn.log_softmax(logits, axis=-1)
    return logits


def greedy_ctc_decode(logits: jnp.ndarray, out_lengths: jnp.ndarray,
                      blank: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """argmax -> unique_consecutive -> drop blanks (ctc.py:196-198),
    static-shape: returns (toks (B, T) left-packed padded with ``blank``,
    n (B,))."""
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # (B, T)
    t_idx = jnp.arange(pred.shape[1])[None, :]
    valid = t_idx < out_lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((pred.shape[0], 1), -1, jnp.int32), pred[:, :-1]], axis=1)
    keep = valid & (pred != prev) & (pred != blank)
    # left-pack kept tokens to fixed width
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    n = jnp.sum(keep, axis=1).astype(jnp.int32)
    out = jnp.full(pred.shape, blank, jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(pred.shape[0])[:, None], pred.shape)
    out = out.at[rows, jnp.where(keep, pos, pred.shape[1] - 1)].set(
        jnp.where(keep, pred, blank), mode="drop")
    # re-zero any slot beyond n (a dropped write may have landed on T-1)
    out = jnp.where(t_idx < n[:, None], out, blank)
    return out, n


def load_torch_ctc_asr(path: str, cfg: CtcAsrConfig) -> Dict[str, Params]:
    """Import a fine-tuned fairseq Wav2VecCtc / HubertCtc checkpoint
    (state-dict layout ``w2v_encoder.w2v_model.<trunk>`` +
    ``w2v_encoder.proj.{weight,bias}``, wav2vec2_asr.py:311-387)."""
    import torch
    from .hubert import trunk_params_from_sd
    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if "model" in state else state
    sd = {k: v.detach().float().numpy() if torch.is_tensor(v)
          else np.asarray(v, np.float32) for k, v in sd.items()}
    pre = "w2v_encoder.w2v_model."
    trunk_sd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}
    p = {"w2v": trunk_params_from_sd(trunk_sd, cfg.trunk),
         "proj": {"w": jnp.asarray(sd["w2v_encoder.proj.weight"].T.copy()),
                  "b": jnp.asarray(sd["w2v_encoder.proj.bias"])}}
    return {"params": p, "stats": {"num_updates": jnp.zeros((), jnp.int32)}}


# ---------------------------------------------------------------------------
# pretrained-trunk warm start
# ---------------------------------------------------------------------------

def load_w2v_trunk(variables, path: str, cfg: CtcAsrConfig):
    """--w2v-path warm start (Wav2VecEncoder.__init__ :326-345): accepts a
    fairseq .pt (pretraining checkpoint) or our .npz; copies every trunk
    leaf present in both (the pretrain-only final_proj/label_embs are
    dropped, mask_emb is kept)."""
    p = dict(variables["params"])
    w2v = jax.tree_util.tree_map(lambda x: x, p["w2v"])  # shallow-ish copy
    if path.endswith(".pt") or path.endswith(".bin"):
        from .hubert import load_torch_hubert
        loaded, _ = load_torch_hubert(path, cfg=cfg.trunk)
    else:
        from ..train.checkpoint import _SEP, load_checkpoint_file
        flat, _ = load_checkpoint_file(path)
        pre = "params" + _SEP
        loaded = {}
        for k, v in flat.items():
            if not k.startswith(pre):
                continue
            parts = k[len(pre):].split(_SEP)
            node = loaded
            for q in parts[:-1]:
                node = node.setdefault(q, {})
            node[parts[-1]] = v

    def merge(dst, src):
        for k, v in dst.items():
            if k not in src:
                continue
            if isinstance(v, dict):
                merge(v, src[k])
            else:
                a = np.asarray(src[k])
                assert a.shape == tuple(v.shape), (k, a.shape, v.shape)
                dst[k] = jnp.asarray(a, v.dtype)
    merge(w2v, loaded)
    p["w2v"] = w2v
    return {"params": p, "stats": variables["stats"]}
