"""Vocoders: Griffin-Lim (on-device JAX) and HiFi-GAN (JAX port w/ torch
checkpoint import).

Parity: ``fairseq/models/text_to_speech/vocoder.py`` — PseudoInverseMelScale
(:24-46), GriffinLim (:49-110), GriffinLimVocoder.from_data_cfg (:113-158),
HiFiGANVocoder (:161-188), get_vocoder dispatch (:191-197).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.data_cfg import S2STDataConfig
from ..ops.dsp import griffin_lim, logmel_to_linear, make_pinv_mel_basis

logger = logging.getLogger(__name__)

LOG_EPS = float(np.log(1e-5))  # log-mel floor used at feature extraction


class GriffinLimVocoder:
    """mel (log) -> waveform via pinv-mel + Griffin-Lim, batched on device."""

    def __init__(self, sample_rate: int, win_size: int, hop_size: int,
                 n_fft: int, n_mels: int, f_min: float, f_max: float,
                 spec_bwd_max_iter: int = 32):
        self.sample_rate = sample_rate
        self.win_size, self.hop_size, self.n_fft = win_size, hop_size, n_fft
        self.n_iter = spec_bwd_max_iter
        self.pinv_basis = make_pinv_mel_basis(sample_rate, n_fft, n_mels,
                                              f_min, f_max)
        self._fn = jax.jit(self._synthesize)

    def _synthesize(self, logmel: jnp.ndarray, frame_mask: jnp.ndarray,
                    rng: jax.Array) -> jnp.ndarray:
        # mask padding frames to the log floor so exp() ~ 0 energy
        logmel = jnp.where(frame_mask[:, :, None], logmel, LOG_EPS)
        spec = logmel_to_linear(logmel, self.pinv_basis)     # (B, F, T)
        return griffin_lim(spec, self.n_fft, self.win_size, self.hop_size,
                           self.n_iter, rng)

    def __call__(self, logmel, lengths=None, rng=None):
        """logmel: (B, T, n_mels) or (T, n_mels); returns (B, L) waveform,
        L = hop*(T-1); valid length per sample = hop*(len-1)."""
        single = logmel.ndim == 2
        if single:
            logmel = logmel[None]
        b, t, _ = logmel.shape
        if lengths is None:
            lengths = jnp.full((b,), t, jnp.int32)
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        wave = self._fn(jnp.asarray(logmel, jnp.float32), mask, rng)
        return wave[0] if single else wave

    def wave_length(self, n_frames: int) -> int:
        return self.hop_size * (int(n_frames) - 1) if n_frames > 1 else 0

    @classmethod
    def from_data_cfg(cls, args, data_cfg: S2STDataConfig):
        feat = data_cfg.features
        assert feat is not None, "config.yaml must provide a features block"
        return cls(
            sample_rate=feat["sample_rate"],
            win_size=int(feat["win_len_t"] * feat["sample_rate"]),
            hop_size=int(feat["hop_len_t"] * feat["sample_rate"]),
            n_fft=feat["n_fft"], n_mels=feat["n_mels"],
            f_min=feat.get("f_min", 0.0), f_max=feat.get("f_max", 8000.0),
            spec_bwd_max_iter=getattr(args, "spec_bwd_max_iter", 32),
        )


class HiFiGANVocoder:
    """HiFi-GAN generator in JAX, loading the reference's torch checkpoints
    (fairseq/models/text_to_speech/hifigan.py). Implemented in
    s2st_tpu.models.hifigan."""

    def __init__(self, checkpoint_path: str, model_cfg: Dict[str, Any]):
        from ..models.hifigan import HiFiGANConfig, load_torch_generator, synthesize
        self.cfg = HiFiGANConfig.from_json(model_cfg)
        self.params = load_torch_generator(checkpoint_path, self.cfg)
        self.sample_rate = model_cfg.get("sampling_rate", 16000)
        self.hop_size = int(np.prod(self.cfg.upsample_rates))
        self._fn = jax.jit(partial(synthesize, cfg=self.cfg))

    def __call__(self, logmel, lengths=None, rng=None):
        single = logmel.ndim == 2
        if single:
            logmel = logmel[None]
        wave = self._fn(self.params, x=jnp.asarray(logmel, jnp.float32))
        return wave[0] if single else wave

    def wave_length(self, n_frames: int) -> int:
        return self.hop_size * int(n_frames)

    @classmethod
    def from_data_cfg(cls, args, data_cfg: S2STDataConfig):
        vocoder_cfg = data_cfg.vocoder
        assert vocoder_cfg.get("type", "griffin_lim") == "hifigan"
        with open(vocoder_cfg["config"]) as f:
            model_cfg = json.load(f)
        return cls(vocoder_cfg["checkpoint"], model_cfg)


def get_vocoder(args, data_cfg: S2STDataConfig):
    name = getattr(args, "vocoder", "griffin_lim")
    if name == "griffin_lim":
        return GriffinLimVocoder.from_data_cfg(args, data_cfg)
    if name == "hifigan":
        return HiFiGANVocoder.from_data_cfg(args, data_cfg)
    raise ValueError(f"Unknown vocoder {name}")
