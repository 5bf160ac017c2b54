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

from ..nn.core import Params, layer_norm, lengths_to_padding_mask, linear
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


def _encoder_layer(p, cfg: HubertConfig, x, padding_mask):
    """Post-LN (hubert-base layer_norm_first=False) transformer layer."""
    residual = x
    h, _ = mha(p["self_attn"], x, x, x, cfg.encoder_attention_heads,
               key_padding_mask=padding_mask)
    x = layer_norm(p["self_attn_ln"], residual + h)
    residual = x
    h = linear(p["fc2"], _gelu(linear(p["fc1"], x)))
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
    return jax.tree_util.tree_map(jnp.asarray, p), cfg
