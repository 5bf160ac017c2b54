"""Exponential moving average of model parameters
(parity: fairseq/models/ema/ema.py + the trainer EMA step,
fairseq/trainer.py:924-936 — decay warmup via ema_start_update, optional
update frequency; the "fp32 ema copy" concern disappears because EMA params
are always fp32 here).

TPU-native: the update is a pure jitted pytree lerp executed on device; the
state lives alongside TrainState and is checkpointed via the same
flatten/unflatten machinery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EMAConfig:
    ema_decay: float = 0.9999
    ema_start_update: int = 0
    ema_update_freq: int = 1


def init_ema(params) -> Any:
    # explicit copy: the training step donates its param buffers, so the
    # EMA must own distinct arrays. Integer leaves (iPQ assignment buffers)
    # are copied as-is — they are frozen indices, not averaged weights.
    return jax.tree_util.tree_map(
        lambda p: jnp.array(p, copy=True)
        if not jnp.issubdtype(jnp.result_type(p), jnp.floating)
        else jnp.array(p, jnp.float32, copy=True), params)


def ema_step(cfg: EMAConfig, ema_params, new_params, step):
    """One EMA update (jittable). Before ema_start_update the EMA tracks the
    raw params exactly (decay 0, fairseq EMA warmup semantics); updates are
    applied every ema_update_freq steps."""
    warm = step >= cfg.ema_start_update
    do_update = (step % cfg.ema_update_freq) == 0
    decay = jnp.where(warm, cfg.ema_decay, 0.0)
    decay = jnp.where(do_update, decay, 1.0)

    def upd(e, p):
        if not jnp.issubdtype(jnp.result_type(p), jnp.floating):
            return p  # frozen integer buffer (iPQ assignments)
        return decay * e + (1.0 - decay) * p.astype(jnp.float32)

    return jax.tree_util.tree_map(upd, ema_params, new_params)
