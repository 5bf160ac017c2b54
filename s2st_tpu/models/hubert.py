"""HuBERT encoder (frozen waveform frontend) in JAX, with fairseq torch
checkpoint import.

Parity: ``fairseq/models/hubert/hubert.py`` inference path used by the S2ST
encoder (``examples/s2s_trans/models/s2st_transformer.py:245-252`` —
``hubert.extract_features(collated_audios, padding_mask)`` under
``torch.no_grad``): conv feature extractor (x320 downsample, GroupNorm on
layer 0, GELU) -> LayerNorm -> post_extract_proj -> transformer encoder
(grouped pos-conv relative embedding + post-LN layers for hubert-base).

TPU-native: everything is one jittable pure function; freezing ==
``jax.lax.stop_gradient`` at the call site (no eval()/no_grad machinery).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import (Params, dropout, layer_norm, lengths_to_padding_mask,
                       linear)
from ..nn.attention import mha


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


@dataclass(frozen=True)
class HubertConfig:
    # conv extractor: (dim, kernel, stride) per layer (hubert-base default)
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2))
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    conv_pos: int = 128
    conv_pos_groups: int = 16
    layer_norm_first: bool = False
    dtype: Any = jnp.float32

    # --- pretraining fields (HubertConfig, hubert.py:40-217) ---
    label_rate: int = 50
    sample_rate: int = 16000
    final_dim: int = 256
    logit_temp: float = 0.1
    num_classes: Tuple[int, ...] = ()       # len(dict) per label stream
    untie_final_proj: bool = False
    skip_masked: bool = False
    skip_nomask: bool = False
    feature_grad_mult: float = 0.1
    mask_prob: float = 0.8
    mask_length: int = 10
    dropout_input: float = 0.1
    dropout_features: float = 0.1
    dropout: float = 0.1
    activation_dropout: float = 0.0

    @property
    def feat2tar_ratio(self) -> float:
        return self.label_rate * self.downsample / self.sample_rate

    @property
    def downsample(self) -> int:
        out = 1
        for _, _, s in self.conv_layers:
            out *= s
        return out

    def output_length(self, in_length):
        length = in_length
        for _, k, s in self.conv_layers:
            length = (length - k) // s + 1
        return length


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_hubert(key, cfg: HubertConfig) -> Params:
    keys = iter(jax.random.split(key, 16 + 8 * cfg.encoder_layers))

    def nrm(shape, scale):
        return jax.random.normal(next(keys), shape) * scale

    p: Params = {"extractor": {}}
    in_d = 1
    for i, (d, k, s) in enumerate(cfg.conv_layers):
        p["extractor"][f"conv{i}"] = {"w": nrm((k, in_d, d), (in_d * k) ** -0.5)}
        in_d = d
    p["extractor"]["gn0"] = {"scale": jnp.ones((cfg.conv_layers[0][0],)),
                             "bias": jnp.zeros((cfg.conv_layers[0][0],))}
    d_model = cfg.encoder_embed_dim
    p["feat_ln"] = {"scale": jnp.ones((in_d,)), "bias": jnp.zeros((in_d,))}
    p["post_proj"] = {"w": nrm((in_d, d_model), in_d ** -0.5),
                      "b": jnp.zeros((d_model,))}
    p["pos_conv"] = {
        "w": nrm((cfg.conv_pos, d_model // cfg.conv_pos_groups, d_model),
                 0.05),
        "b": jnp.zeros((d_model,))}
    p["enc_ln"] = {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))}
    for i in range(cfg.encoder_layers):
        p[f"layer{i}"] = {
            "self_attn": {
                "q": {"w": nrm((d_model, d_model), d_model ** -0.5),
                      "b": jnp.zeros((d_model,))},
                "k": {"w": nrm((d_model, d_model), d_model ** -0.5),
                      "b": jnp.zeros((d_model,))},
                "v": {"w": nrm((d_model, d_model), d_model ** -0.5),
                      "b": jnp.zeros((d_model,))},
                "out": {"w": nrm((d_model, d_model), d_model ** -0.5),
                        "b": jnp.zeros((d_model,))},
            },
            "self_attn_ln": {"scale": jnp.ones((d_model,)),
                             "bias": jnp.zeros((d_model,))},
            "fc1": {"w": nrm((d_model, cfg.encoder_ffn_embed_dim),
                             d_model ** -0.5),
                    "b": jnp.zeros((cfg.encoder_ffn_embed_dim,))},
            "fc2": {"w": nrm((cfg.encoder_ffn_embed_dim, d_model),
                             cfg.encoder_ffn_embed_dim ** -0.5),
                    "b": jnp.zeros((d_model,))},
            "final_ln": {"scale": jnp.ones((d_model,)),
                         "bias": jnp.zeros((d_model,))},
        }
    return p


# ---------------------------------------------------------------------------
# forward (inference path)
# ---------------------------------------------------------------------------

def _group_norm(p, x, groups):
    """GroupNorm over channels; x: (B, T, C). hubert uses GroupNorm(512, 512)
    == InstanceNorm per channel over time."""
    b, t, c = x.shape
    g = x.reshape(b, t, groups, c // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    g = (g - mean) / jnp.sqrt(var + 1e-5)
    x = g.reshape(b, t, c)
    return x * p["scale"] + p["bias"]


def _extractor(p, cfg: HubertConfig, source: jnp.ndarray) -> jnp.ndarray:
    """source: (B, L) waveform -> (B, T', 512)."""
    x = source[:, :, None]                                  # (B, L, 1)
    for i, (d, k, s) in enumerate(cfg.conv_layers):
        w = p[f"conv{i}"]["w"].astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(s,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype)
        if i == 0:
            x = _group_norm(p["gn0"], x, groups=cfg.conv_layers[0][0])
        x = _gelu(x)
    return x


def _pos_conv(p, cfg: HubertConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Grouped conv relative positional embedding (wav2vec2 pos_conv):
    Conv1d(d, d, k=conv_pos, padding=k//2, groups=g) -> SamePad trim -> GELU."""
    k = cfg.conv_pos
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1,),
        padding=[(pad, pad)], dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=cfg.conv_pos_groups,
        preferred_element_type=x.dtype)
    y = y + p["b"].astype(x.dtype)
    if k % 2 == 0:
        y = y[:, :-1]  # SamePad removes the trailing frame for even kernels
    return _gelu(y)


def _encoder_layer(p, cfg: HubertConfig, x, padding_mask,
                   rng=None, rates=(0.0, 0.0, 0.0), train=False):
    """Post-LN (hubert-base layer_norm_first=False) transformer layer.
    ``rates`` = (dropout, activation_dropout, attention... n/a) following
    TransformerSentenceEncoderLayer (wav2vec2.py:621-671): dropout1 on the
    attn output, dropout2 after the activation, dropout3 on fc2's output
    (dropout1/3 share the `dropout` rate)."""
    det = not train or rng is None
    r = jax.random.split(rng, 3) if not det else (None,) * 3
    residual = x
    h, _ = mha(p["self_attn"], x, x, x, cfg.encoder_attention_heads,
               key_padding_mask=padding_mask)
    h = dropout(h, rates[0], r[0], det)
    x = layer_norm(p["self_attn_ln"], residual + h)
    residual = x
    h = dropout(_gelu(linear(p["fc1"], x)), rates[1], r[1], det)
    h = dropout(linear(p["fc2"], h), rates[0], r[2], det)
    x = layer_norm(p["final_ln"], residual + h)
    return x


def extract_features(params: Params, cfg: HubertConfig, source: jnp.ndarray,
                     lengths: jnp.ndarray,
                     output_layer: Optional[int] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frozen-frontend inference (HubertModel.extract_features parity,
    mask=False). source: (B, L) fp32 waveform; lengths: (B,) valid samples.
    Returns (x (B, T', encoder_embed_dim), out_lengths (B,))."""
    x = _extractor(params["extractor"], cfg, source.astype(cfg.dtype))
    t_out = x.shape[1]
    out_lengths = jnp.clip(cfg.output_length(lengths), 0, t_out)
    x = layer_norm(params["feat_ln"], x)
    x = linear(params["post_proj"], x)

    padding_mask = lengths_to_padding_mask(out_lengths, t_out)
    x = jnp.where(padding_mask[:, :, None], 0.0, x)
    x = x + _pos_conv(params["pos_conv"], cfg, x)
    if not cfg.layer_norm_first:
        x = layer_norm(params["enc_ln"], x)
    n = output_layer if output_layer is not None else cfg.encoder_layers
    for i in range(n):
        x = _encoder_layer(params[f"layer{i}"], cfg, x, padding_mask)
    if cfg.layer_norm_first and output_layer is None:
        x = layer_norm(params["enc_ln"], x)
    return x, out_lengths


# ---------------------------------------------------------------------------
# torch (fairseq) checkpoint import
# ---------------------------------------------------------------------------

def config_from_torch_ckpt(path: str) -> HubertConfig:
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    cfg = state.get("cfg", None)
    model_cfg = {}
    if cfg is not None:
        model_cfg = dict(cfg["model"]) if not hasattr(cfg, "model") \
            else dict(cfg.model)
    conv_spec = model_cfg.get(
        "conv_feature_layers",
        "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2")
    conv_layers = tuple(tuple(t) for t in eval(str(conv_spec)))
    return HubertConfig(
        conv_layers=conv_layers,
        encoder_layers=int(model_cfg.get("encoder_layers", 12)),
        encoder_embed_dim=int(model_cfg.get("encoder_embed_dim", 768)),
        encoder_ffn_embed_dim=int(model_cfg.get("encoder_ffn_embed_dim", 3072)),
        encoder_attention_heads=int(
            model_cfg.get("encoder_attention_heads", 12)),
        conv_pos=int(model_cfg.get("conv_pos", 128)),
        conv_pos_groups=int(model_cfg.get("conv_pos_groups", 16)),
        layer_norm_first=bool(model_cfg.get("layer_norm_first", False)),
    )


def load_torch_hubert(path: str, cfg: Optional[HubertConfig] = None
                      ) -> Tuple[Params, HubertConfig]:
    """Load a fairseq HuBERT checkpoint (hubert_base_ls960.pt layout:
    {"model": state_dict, "cfg": ...})."""
    import torch
    if cfg is None:
        cfg = config_from_torch_ckpt(path)
    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if "model" in state else state
    sd = {k: np.asarray(v, np.float32) if not torch.is_tensor(v)
          else v.detach().float().numpy() for k, v in sd.items()}
    return trunk_params_from_sd(sd, cfg), cfg


def trunk_params_from_sd(sd: Dict[str, np.ndarray], cfg: HubertConfig
                         ) -> Params:
    """fairseq state_dict (numpy leaves, trunk-level key names) -> our
    param tree. Shared by the pretraining, fine-tuned-ASR
    (models/ctc_asr.py) and xm_transformer import paths."""

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def lin(prefix):
        p = {"w": sd[prefix + ".weight"].T.copy()}
        if prefix + ".bias" in sd:
            p["b"] = sd[prefix + ".bias"]
        return p

    p: Params = {"extractor": {}}
    for i in range(len(cfg.conv_layers)):
        w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]  # (Cout,Cin,K)
        p["extractor"][f"conv{i}"] = {
            "w": np.transpose(w, (2, 1, 0)).copy()}
    p["extractor"]["gn0"] = {
        "scale": sd["feature_extractor.conv_layers.0.2.weight"],
        "bias": sd["feature_extractor.conv_layers.0.2.bias"]}
    p["feat_ln"] = ln("layer_norm")
    p["post_proj"] = lin("post_extract_proj")
    # pos conv: weight-norm folded; torch (Cout, Cin/groups, K) -> (K, Cin/g, Cout)
    if "encoder.pos_conv.0.weight_g" in sd:
        g = sd["encoder.pos_conv.0.weight_g"]
        v = sd["encoder.pos_conv.0.weight_v"]
        # fairseq uses weight_norm(dim=2): norm over dims (0, 1) per k-slice
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    else:
        w = sd["encoder.pos_conv.0.weight"]
    p["pos_conv"] = {"w": np.transpose(w, (2, 1, 0)).copy(),
                     "b": sd["encoder.pos_conv.0.bias"]}
    p["enc_ln"] = ln("encoder.layer_norm")
    for i in range(cfg.encoder_layers):
        pre = f"encoder.layers.{i}"
        p[f"layer{i}"] = {
            "self_attn": {
                "q": lin(pre + ".self_attn.q_proj"),
                "k": lin(pre + ".self_attn.k_proj"),
                "v": lin(pre + ".self_attn.v_proj"),
                "out": lin(pre + ".self_attn.out_proj"),
            },
            "self_attn_ln": ln(pre + ".self_attn_layer_norm"),
            "fc1": lin(pre + ".fc1"),
            "fc2": lin(pre + ".fc2"),
            "final_ln": ln(pre + ".final_layer_norm"),
        }
    if "mask_emb" in sd:                       # pretraining checkpoints
        p["mask_emb"] = sd["mask_emb"]
        if "final_proj.weight" in sd:
            p["final_proj"] = lin("final_proj")
        if "label_embs_concat" in sd:
            p["label_embs"] = sd["label_embs_concat"]
    return jax.tree_util.tree_map(jnp.asarray, p)


# ---------------------------------------------------------------------------
# SSL pretraining (HubertModel.forward, hubert.py:412-516)
# ---------------------------------------------------------------------------

def init_hubert_pretrain(key, cfg: HubertConfig) -> Dict[str, Params]:
    """Base encoder params + the pretraining-only leaves: mask_emb
    (uniform [0,1), hubert.py:277-279), final_proj, label_embs_concat
    (uniform [0,1), :305-308)."""
    k0, k1, k2, k3 = jax.random.split(key, 4)
    p = init_hubert(k0, cfg)
    d = cfg.encoder_embed_dim
    n_lbl = max(len(cfg.num_classes), 1)
    out_dim = cfg.final_dim * (n_lbl if cfg.untie_final_proj else 1)
    p["mask_emb"] = jax.random.uniform(k1, (d,))
    p["final_proj"] = {
        "w": jax.random.normal(k2, (d, out_dim)) * d ** -0.5,
        "b": jnp.zeros((out_dim,))}
    p["label_embs"] = jax.random.uniform(
        k3, (sum(cfg.num_classes), cfg.final_dim))
    return {"params": p, "stats": {"num_updates": jnp.zeros((), jnp.int32)}}


def _cosine_logits(proj_x: jnp.ndarray, target: jnp.ndarray,
                   label_embs: jnp.ndarray, logit_temp: float
                   ) -> jnp.ndarray:
    """compute_pred + compute_nce (hubert.py:363-375,463-473) with the
    dynamic gather re-expressed at full (B, T) shape: column 0 is the
    positive (the target's codeword), columns 1..V are every codeword as a
    negative, cosine similarity / logit_temp, and the negative equal to the
    positive (column 1+target) is masked to -inf."""
    x = proj_x.astype(jnp.float32)
    e = label_embs.astype(jnp.float32)
    # max(||x||, 1e-8) written as sqrt(max(x.x, 1e-16)): identical value,
    # but norm's backward is NaN at exactly-zero vectors (all-pad batch
    # rows reach here with weight 0 — NaN*0 would still poison grads)
    xn = x * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(x * x, axis=-1, keepdims=True), 1e-16))
    en = e * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(e * e, axis=-1, keepdims=True), 1e-16))
    sims = jnp.einsum("btd,vd->btv", xn, en)                  # (B, T, V)
    pos = jnp.take_along_axis(sims, target[:, :, None], axis=2)
    logits = jnp.concatenate([pos, sims], axis=2) / logit_temp
    v = sims.shape[2]
    neg_is_pos = jnp.arange(v)[None, None, :] == target[:, :, None]
    logits = logits.at[:, :, 1:].set(
        jnp.where(neg_is_pos, -jnp.inf, logits[:, :, 1:]))
    return logits


def forward_pretrain(params: Params, cfg: HubertConfig, source: jnp.ndarray,
                     lengths: jnp.ndarray, target_list, rng=None,
                     train: bool = True, mask_indices=None) -> Dict[str, Any]:
    """HubertModel.forward (hubert.py:412-516), static-shape.

    source: (B, L) waveform; lengths: (B,); target_list: list of (B, T_lbl)
    int32 codeword-dictionary indices. Returns full-shape per-stream logits
    ``logit_m``-equivalents as (B, T, 1+V) plus the frame masks — the
    criterion weights by mask instead of gathering (the reference's
    x[masked_indices] boolean gather is a dynamic shape XLA can't tile).
    ``mask_indices`` overrides the sampled span mask (parity tests)."""
    from .wav2vec2 import compute_span_mask
    det = not train or rng is None
    r = jax.random.split(rng, 4) if not det else (None,) * 4
    feats = _extractor(params["extractor"], cfg, source.astype(cfg.dtype))
    if cfg.feature_grad_mult != 1.0:
        c = cfg.feature_grad_mult
        feats = (jax.lax.stop_gradient(feats) if c == 0.0
                 else feats * c + jax.lax.stop_gradient(feats) * (1.0 - c))
    t_feat = feats.shape[1]
    # forward_targets (:387-398): trim features so every frame has a label,
    # then pick the aligned label per frame. Static because shapes are.
    ratio = cfg.feat2tar_ratio
    targ_tsz = min(int(t.shape[1]) for t in target_list)
    feat_tsz = min(t_feat, int(targ_tsz / ratio)) if ratio * t_feat > targ_tsz \
        else t_feat
    feats = feats[:, :feat_tsz]
    # the reference indexes via arange().float() * ratio then .long():
    # float32 multiply + truncation, reproduced bit-for-bit
    target_inds = (np.arange(feat_tsz, dtype=np.float32)
                   * np.float32(ratio)).astype(np.int64)
    target_list = [t[:, target_inds] for t in target_list]
    # forward_padding_mask (:400-410): the raw (B, L) suffix mask is
    # trimmed to a multiple of T and viewed (B, T, L//T); a frame is
    # padded iff ALL its chunk's samples are — i.e. chunk start >= length
    k = max(source.shape[1] // feat_tsz, 1)
    padding_mask = (jnp.arange(feat_tsz)[None, :] * k
                    >= lengths[:, None])
    out_lengths = jnp.sum(~padding_mask, axis=1).astype(jnp.int32)

    # features_pen (:426): plain mean over every frame incl. padding
    features_pen = jnp.mean(feats.astype(jnp.float32) ** 2)

    x = layer_norm(params["feat_ln"], feats)
    x = linear(params["post_proj"], x)
    x = dropout(x, cfg.dropout_input, r[0], det)

    if mask_indices is None and cfg.mask_prob > 0 and train:
        mask_indices = compute_span_mask(
            r[1], out_lengths, feat_tsz, cfg.mask_prob, cfg.mask_length,
            min_masks=2)
    elif mask_indices is None:
        mask_indices = jnp.zeros((x.shape[0], feat_tsz), bool)
    x = jnp.where(mask_indices[:, :, None],
                  params["mask_emb"].astype(x.dtype)[None, None, :], x)

    x = jnp.where(padding_mask[:, :, None], 0.0, x)
    x = x + _pos_conv(params["pos_conv"], cfg, x)
    if not cfg.layer_norm_first:
        x = layer_norm(params["enc_ln"], x)
    x = dropout(x, cfg.dropout, r[2], det)
    lr = jax.random.split(r[3], cfg.encoder_layers) if not det else \
        [None] * cfg.encoder_layers
    for i in range(cfg.encoder_layers):
        x = _encoder_layer(params[f"layer{i}"], cfg, x, padding_mask,
                           rng=lr[i], train=train,
                           rates=(cfg.dropout, cfg.activation_dropout, 0.0))
    if cfg.layer_norm_first:
        x = layer_norm(params["enc_ln"], x)

    proj = linear(params["final_proj"], x)                    # (B, T, D'|nD')
    n_lbl = len(target_list)
    if cfg.untie_final_proj:
        projs = jnp.split(proj, n_lbl, axis=-1)
    else:
        projs = [proj] * n_lbl
    offs = np.cumsum([0] + list(cfg.num_classes))
    logits = [
        _cosine_logits(projs[i], target_list[i],
                       params["label_embs"][offs[i]:offs[i + 1]],
                       cfg.logit_temp)
        for i in range(n_lbl)]
    return {"logits": logits, "mask": mask_indices,
            "padding_mask": padding_mask, "features_pen": features_pen,
            "target_list": target_list}
