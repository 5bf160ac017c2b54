"""Feature transforms (parity: fairseq/data/audio/feature_transforms/).

Registry + composite with the same config keys: ``global_cmvn``,
``utterance_cmvn``, ``specaugment``. Host-side numpy, applied per item
(the reference applies them in ``__getitem__`` too).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

_TRANSFORM_REGISTRY = {}


def register_feature_transform(name):
    def wrap(cls):
        _TRANSFORM_REGISTRY[name] = cls
        return cls
    return wrap


def get_feature_transform(name):
    return _TRANSFORM_REGISTRY[name]


class CompositeAudioFeatureTransform:
    """Applies a list of named transforms from a config dict
    (feature_transforms/__init__.py:55-106 parity, incl. the src_/tgt_ forks)."""

    def __init__(self, transforms):
        self.transforms = [t for t in transforms if t is not None]

    @classmethod
    def from_config_dict(cls, names: Optional[List[str]], config: Dict):
        if names is None:
            return None
        transforms = []
        for name in names:
            cls_ = get_feature_transform(name)
            transforms.append(cls_.from_config_dict(config.get(name, {})))
        return cls(transforms)

    def __call__(self, x: np.ndarray,
                 rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        """rng: private per-item stream for stochastic transforms
        (SpecAugment). When provided, augmentation draws are deterministic
        functions of (seed, epoch, sample index) regardless of how many
        collate workers interleave — unlike torch DataLoader workers
        (advisor finding r2)."""
        for t in self.transforms:
            if rng is not None and getattr(t, "stochastic", False):
                x = t(x, rng=rng)
            else:
                x = t(x)
        return x


class _GlobalCMVN:
    def __init__(self, stats_npz_path: str):
        stats = np.load(stats_npz_path)
        self.mean = stats["mean"].astype(np.float32)
        self.std = stats["std"].astype(np.float32)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return ((x - self.mean) / self.std).astype(np.float32)


@register_feature_transform("global_cmvn")
class GlobalCMVN(_GlobalCMVN):
    @classmethod
    def from_config_dict(cls, config):
        return cls(config["stats_npz_path"])


@register_feature_transform("src_global_cmvn")
class SrcGlobalCMVN(_GlobalCMVN):
    @classmethod
    def from_config_dict(cls, config):
        return cls(config["stats_npz_path"])


@register_feature_transform("tgt_global_cmvn")
class TgtGlobalCMVN(_GlobalCMVN):
    @classmethod
    def from_config_dict(cls, config):
        return cls(config["stats_npz_path"])


@register_feature_transform("utterance_cmvn")
class UtteranceCMVN:
    def __init__(self, norm_means=True, norm_vars=True):
        self.norm_means, self.norm_vars = norm_means, norm_vars

    @classmethod
    def from_config_dict(cls, config):
        return cls(config.get("norm_means", True), config.get("norm_vars", True))

    def __call__(self, x: np.ndarray) -> np.ndarray:
        mean = x.mean(axis=0)
        square_sums = (x ** 2).sum(axis=0)
        if self.norm_means:
            x = x - mean
        if self.norm_vars:
            var = square_sums / x.shape[0] - mean ** 2
            x = x / np.sqrt(np.maximum(var, 1e-10))
        return x.astype(np.float32)


@register_feature_transform("specaugment")
class SpecAugment:
    """Freq/time masking + optional time warp
    (feature_transforms/specaugment.py parity; warp uses linear interpolation
    instead of cv2's affine resize)."""

    stochastic = True  # accepts a per-item rng via __call__(x, rng=...)

    def __init__(self, time_warp_w=0, freq_mask_n=0, freq_mask_f=0,
                 time_mask_n=0, time_mask_t=0, time_mask_p=0.0,
                 mask_value=None, rng: Optional[np.random.RandomState] = None):
        self.time_warp_w = time_warp_w
        self.freq_mask_n, self.freq_mask_f = freq_mask_n, freq_mask_f
        self.time_mask_n, self.time_mask_t = time_mask_n, time_mask_t
        self.time_mask_p = time_mask_p
        self.mask_value = mask_value
        self.rng = rng or np.random

    @classmethod
    def from_config_dict(cls, config):
        config = config or {}
        return cls(
            time_warp_w=config.get("time_warp_W", 0),
            freq_mask_n=config.get("freq_mask_N", 0),
            freq_mask_f=config.get("freq_mask_F", 0),
            time_mask_n=config.get("time_mask_N", 0),
            time_mask_t=config.get("time_mask_T", 0),
            time_mask_p=config.get("time_mask_p", 0.0),
            mask_value=config.get("mask_value", None),
        )

    def __call__(self, spec: np.ndarray,
                 rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        rng = rng if rng is not None else self.rng
        spec = spec.copy()
        num_frames, num_freqs = spec.shape
        mask_value = self.mask_value
        if mask_value is None:
            mask_value = spec.mean()

        if num_frames == 0 or num_freqs < self.freq_mask_f:
            return spec

        w = self.time_warp_w
        if w > 0 and 2 * w < num_frames:
            w0 = rng.randint(w, num_frames - w)
            s = rng.randint(-w + 1, w)
            src_pos = np.arange(num_frames, dtype=np.float64)
            # piecewise-linear warp moving w0 -> w0+s
            left = src_pos[:w0 + s + 1] * (w0 / max(w0 + s, 1))
            right = w0 + (src_pos[w0 + s + 1:] - (w0 + s)) \
                * ((num_frames - 1 - w0) / max(num_frames - 1 - (w0 + s), 1))
            pos = np.concatenate([left, right])
            idx0 = np.clip(pos.astype(np.int64), 0, num_frames - 1)
            idx1 = np.clip(idx0 + 1, 0, num_frames - 1)
            frac = (pos - idx0)[:, None]
            spec = ((1 - frac) * spec[idx0] + frac * spec[idx1]).astype(np.float32)

        for _ in range(self.freq_mask_n):
            f = rng.randint(0, self.freq_mask_f + 1)
            f0 = rng.randint(0, max(num_freqs - f, 1))
            if f > 0:
                spec[:, f0:f0 + f] = mask_value

        max_t = min(self.time_mask_t,
                    int(num_frames * self.time_mask_p) if self.time_mask_p > 0
                    else self.time_mask_t)
        for _ in range(self.time_mask_n):
            t = rng.randint(0, max(max_t, 0) + 1)
            t0 = rng.randint(0, max(num_frames - t, 1))
            if t > 0:
                spec[t0:t0 + t, :] = mask_value
        return spec
