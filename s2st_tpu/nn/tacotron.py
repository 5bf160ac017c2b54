"""Tacotron2 Prenet/Postnet (parity: fairseq/models/text_to_speech/tacotron2.py:85-126).

Quirks preserved:
- Prenet dropout is ALWAYS applied, training and inference alike (the
  Tacotron2 information-bottleneck trick) — callers must pass an rng even
  at generation time (or set ``always_dropout=False`` for deterministic tests).
- Postnet convs use BatchNorm1d with running stats; tanh on all but the last
  layer; xavier-uniform init with tanh/linear gain.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core import (Params, batch_norm, batch_norm_init, batch_norm_stats_init,
                   calculate_gain, conv1d, conv1d_init, dropout, linear,
                   linear_init, split_rngs)


# ---------------------------------------------------------------------------
# Prenet
# ---------------------------------------------------------------------------

def prenet_init(key, in_dim: int, n_layers: int, n_units: int) -> Params:
    ks = jax.random.split(key, n_layers)
    return {
        f"fc{i}": linear_init(ks[i], in_dim if i == 0 else n_units, n_units)
        for i in range(n_layers)
    }


def prenet(p: Params, x: jnp.ndarray, dropout_rate: float,
           rng: Optional[jax.Array], always_dropout: bool = True) -> jnp.ndarray:
    n_layers = len(p)
    rngs = split_rngs(rng, n_layers)
    for i in range(n_layers):
        x = jax.nn.relu(linear(p[f"fc{i}"], x))
        x = dropout(x, dropout_rate, rngs[i],
                    deterministic=not always_dropout or rngs[i] is None)
    return x


# ---------------------------------------------------------------------------
# Postnet
# ---------------------------------------------------------------------------

def postnet_init(key, in_dim: int, n_channels: int, kernel_size: int,
                 n_layers: int) -> Tuple[Params, Params]:
    """Returns (params, batch_stats)."""
    assert kernel_size % 2 == 1
    ks = jax.random.split(key, n_layers)
    params, stats = {}, {}
    for i in range(n_layers):
        cin = in_dim if i == 0 else n_channels
        cout = n_channels if i < n_layers - 1 else in_dim
        gain = calculate_gain("tanh" if i < n_layers - 1 else "linear")
        params[f"conv{i}"] = conv1d_init(ks[i], cin, cout, kernel_size,
                                         init="xavier", gain=gain)
        params[f"bn{i}"] = batch_norm_init(cout)
        stats[f"bn{i}"] = batch_norm_stats_init(cout)
    return params, stats


def postnet(p: Params, stats: Params, x: jnp.ndarray, *, kernel_size: int,
            dropout_rate: float, train: bool, rng: Optional[jax.Array] = None
            ) -> Tuple[jnp.ndarray, Params]:
    """x: (B, T, C_in) -> residual (B, T, C_in). Returns (y, new_stats)."""
    n_layers = sum(1 for k in p if k.startswith("conv"))
    rngs = split_rngs(rng, n_layers)
    new_stats = {}
    pad = (kernel_size - 1) // 2
    for i in range(n_layers):
        x = conv1d(p[f"conv{i}"], x, padding=pad)
        x, new_stats[f"bn{i}"] = batch_norm(p[f"bn{i}"], stats[f"bn{i}"], x,
                                            train=train)
        if i < n_layers - 1:
            x = jnp.tanh(x)
        x = dropout(x, dropout_rate, rngs[i], deterministic=not train)
    return x, new_stats
