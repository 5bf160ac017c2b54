"""HiFi-GAN generator (vocoder) in JAX, with torch checkpoint import.

Parity: ``fairseq/models/text_to_speech/hifigan.py:20-173`` — the standard
HiFi-GAN v1/v2 generator: conv_pre -> [ConvTranspose upsample -> multi-
receptive-field fusion (parallel dilated ResBlocks, averaged)] x N ->
leaky_relu -> conv_post -> tanh. Config keys follow the public HiFi-GAN
``config.json`` (upsample_rates, upsample_kernel_sizes,
upsample_initial_channel, resblock, resblock_kernel_sizes,
resblock_dilation_sizes, model_in_dim/num_mels).

Checkpoints: the reference loads torch ``generator`` state dicts with
weight-norm parametrization (weight_g/weight_v); ``load_torch_generator``
folds the norm (w = g * v / ||v||) and transposes Conv1d (Cout, Cin, K) ->
our (K, Cin, Cout) / ConvTranspose1d (Cin, Cout, K) -> (K, Cout, Cin).

The whole mel->wave graph is one jittable function; on TPU every conv maps
to the MXU and synthesis stays in HBM end to end.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HiFiGANConfig:
    model_in_dim: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))

    @classmethod
    def from_json(cls, cfg: Dict[str, Any]) -> "HiFiGANConfig":
        return cls(
            model_in_dim=cfg.get("model_in_dim") or cfg.get("num_mels", 80),
            upsample_initial_channel=cfg["upsample_initial_channel"],
            upsample_rates=tuple(cfg["upsample_rates"]),
            upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
            resblock=str(cfg.get("resblock", "1")),
            resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in cfg["resblock_dilation_sizes"]),
        )


def _conv(x, w, b, stride=1, padding=0, dilation=1):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,),
        padding=[(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)
    return y + b.astype(x.dtype) if b is not None else y


def _conv_transpose(x, w, b, stride, padding):
    """torch ConvTranspose1d semantics: out_len = (T-1)*stride - 2*pad + K.
    Implemented as an lhs-dilated (fractionally-strided) forward conv; the
    kernel is stored already time-flipped and channel-transposed to
    (K, Cin, Cout) so this is a plain WIO conv."""
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)
    return y + b.astype(x.dtype) if b is not None else y


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def resblock1(p, x, kernel: int, dilations: Sequence[int]):
    """ResBlock1: per dilation d: x + conv_d(lrelu) -> conv_1(lrelu)."""
    for i, d in enumerate(dilations):
        h = _lrelu(x)
        h = _conv(h, p[f"convs1_{i}"]["w"], p[f"convs1_{i}"]["b"],
                  padding=(kernel - 1) // 2 * d, dilation=d)
        h = _lrelu(h)
        h = _conv(h, p[f"convs2_{i}"]["w"], p[f"convs2_{i}"]["b"],
                  padding=(kernel - 1) // 2)
        x = x + h
    return x


def resblock2(p, x, kernel: int, dilations: Sequence[int]):
    for i, d in enumerate(dilations):
        h = _lrelu(x)
        h = _conv(h, p[f"convs_{i}"]["w"], p[f"convs_{i}"]["b"],
                  padding=(kernel - 1) // 2 * d, dilation=d)
        x = x + h
    return x


def synthesize(params, x: jnp.ndarray, cfg: HiFiGANConfig) -> jnp.ndarray:
    """x: (B, T, n_mels) log-mel -> (B, T * prod(upsample_rates)) waveform."""
    h = _conv(x, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)
    n_kernels = len(cfg.resblock_kernel_sizes)
    rb = resblock1 if cfg.resblock == "1" else resblock2
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        h = _lrelu(h)
        h = _conv_transpose(h, params[f"up_{i}"]["w"], params[f"up_{i}"]["b"],
                            stride=u, padding=(k - u) // 2)
        acc = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            y = rb(params[f"res_{i}_{j}"], h, rk, rd)
            acc = y if acc is None else acc + y
        h = acc / n_kernels
    h = _lrelu(h)
    h = _conv(h, params["conv_post"]["w"], params["conv_post"]["b"], padding=3)
    return jnp.tanh(h)[:, :, 0]


# ---------------------------------------------------------------------------
# init (random; for tests and training-from-scratch)
# ---------------------------------------------------------------------------

def init_hifigan(key, cfg: HiFiGANConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 256)
    ki = iter(keys)

    def conv_p(cin, cout, k):
        kk = next(ki)
        w = jax.random.normal(kk, (k, cin, cout)) * 0.01
        return {"w": w, "b": jnp.zeros((cout,))}

    params: Dict[str, Any] = {
        "conv_pre": conv_p(cfg.model_in_dim, cfg.upsample_initial_channel, 7)}
    ch = cfg.upsample_initial_channel
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        params[f"up_{i}"] = {
            "w": jax.random.normal(next(ki), (k, ch, ch // 2)) * 0.01,
            "b": jnp.zeros((ch // 2,))}
        ch //= 2
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            blk = {}
            for di in range(len(rd)):
                if cfg.resblock == "1":
                    blk[f"convs1_{di}"] = conv_p(ch, ch, rk)
                    blk[f"convs2_{di}"] = conv_p(ch, ch, rk)
                else:
                    blk[f"convs_{di}"] = conv_p(ch, ch, rk)
            params[f"res_{i}_{j}"] = blk
    params["conv_post"] = conv_p(ch, 1, 7)
    return params


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

def _fold_weight_norm(sd: Dict[str, "np.ndarray"], prefix: str) -> np.ndarray:
    """weight = g * v / ||v||_2 over dims (1, 2) (torch weight_norm dim=0)."""
    if prefix + ".weight" in sd:
        return np.asarray(sd[prefix + ".weight"])
    g = np.asarray(sd[prefix + ".weight_g"], np.float32)
    v = np.asarray(sd[prefix + ".weight_v"], np.float32)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _t_conv(sd, prefix) -> Dict[str, np.ndarray]:
    """torch Conv1d (Cout, Cin, K) -> ours (K, Cin, Cout)."""
    w = _fold_weight_norm(sd, prefix)
    return {"w": np.transpose(w, (2, 1, 0)).astype(np.float32),
            "b": np.asarray(sd[prefix + ".bias"], np.float32)}


def _t_convT(sd, prefix) -> Dict[str, np.ndarray]:
    """torch ConvTranspose1d (Cin, Cout, K) -> ours (K, Cin, Cout),
    time-flipped (equivalent forward-conv kernel of the lhs-dilated form)."""
    w = _fold_weight_norm(sd, prefix)
    w = np.transpose(w, (2, 0, 1))[::-1].copy()
    return {"w": w.astype(np.float32),
            "b": np.asarray(sd[prefix + ".bias"], np.float32)}


def load_torch_generator(path: str, cfg: HiFiGANConfig) -> Dict[str, Any]:
    """Load a torch HiFi-GAN checkpoint ({"generator": state_dict} or a bare
    state_dict; fairseq vocoder.py:166-170 loads ["generator"])."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if "generator" in state:
        state = state["generator"]
    sd = {k: v.numpy() for k, v in state.items()}

    params: Dict[str, Any] = {"conv_pre": _t_conv(sd, "conv_pre")}
    for i in range(len(cfg.upsample_rates)):
        params[f"up_{i}"] = _t_convT(sd, f"ups.{i}")
        n_kernels = len(cfg.resblock_kernel_sizes)
        for j, rd in enumerate(cfg.resblock_dilation_sizes):
            blk = {}
            flat = i * n_kernels + j
            for di in range(len(rd)):
                if cfg.resblock == "1":
                    blk[f"convs1_{di}"] = _t_conv(
                        sd, f"resblocks.{flat}.convs1.{di}")
                    blk[f"convs2_{di}"] = _t_conv(
                        sd, f"resblocks.{flat}.convs2.{di}")
                else:
                    blk[f"convs_{di}"] = _t_conv(
                        sd, f"resblocks.{flat}.convs.{di}")
            params[f"res_{i}_{j}"] = blk
    params["conv_post"] = _t_conv(sd, "conv_post")
    return params


def receptive_field_frames(cfg: HiFiGANConfig) -> int:
    """Upper bound on the generator's receptive field in INPUT mel frames:
    conv_pre + each stage's resblock stack mapped back through the
    cumulative upsampling factor."""
    rf = 3  # conv_pre k=7 -> +-3
    up = 1
    for i, (u, k) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up *= u
        stage_rf = k  # transpose conv spread
        for rk, rd in zip(cfg.resblock_kernel_sizes,
                          cfg.resblock_dilation_sizes):
            stage_rf += sum((rk - 1) * d + (rk - 1) for d in rd)
        rf += -(-stage_rf // up)  # ceil back to input frames
    return rf + 4  # conv_post + margin


def synthesize_streaming(params, x, cfg: HiFiGANConfig,
                         chunk_frames: int = 64,
                         overlap: Optional[int] = None):
    """Chunked synthesis fully on-device (BASELINE config: 'streaming
    chunked synthesis'): mel (B, T, M) is processed in fixed chunks with
    receptive-field overlap; interior samples are bit-identical to
    full-sequence synthesis, so chunks concatenate seamlessly. Latency per
    chunk = chunk_frames * hop / sr (e.g. 64 frames = 0.8 s at 80 fps).
    """
    import numpy as _np
    b, t, mels = x.shape
    ov = overlap if overlap is not None else receptive_field_frames(cfg)
    up = int(_np.prod(cfg.upsample_rates))
    n_chunks = -(-t // chunk_frames)
    t_pad = n_chunks * chunk_frames
    xp = jnp.pad(x, ((0, 0), (ov, t_pad - t + ov), (0, 0)))

    def one_chunk(carry, ci):
        start = ci * chunk_frames
        seg = jax.lax.dynamic_slice(
            xp, (0, start, 0), (b, chunk_frames + 2 * ov, mels))
        wav = synthesize(params, seg, cfg)          # (B, (chunk+2ov)*up)
        return carry, jax.lax.dynamic_slice(
            wav, (0, ov * up), (b, chunk_frames * up))

    _, chunks = jax.lax.scan(one_chunk, 0, jnp.arange(n_chunks))
    # chunks: (n_chunks, B, chunk*up) -> (B, T*up)
    wave = jnp.swapaxes(chunks, 0, 1).reshape(b, n_chunks * chunk_frames * up)
    return wave[:, : t * up]
