"""Monotonic-attention expected alignment (simultaneous-MT training op).

Parity: ``examples/operators/alignment_train_cpu.cpp`` /
``alignment_train_kernel.cu`` — the MMA alpha recursion
alpha_t = p * exclusive_cumprod(1-p) * cumsum_src(alpha_{t-1} /
clamp(exclusive_cumprod(1-p), eps, 1)), row 0 seeded with
alpha_{-1} = [1, 0, ...], outputs clamped to [0, 1].

TPU-native: the src cumsum is one vector op per row and the tgt
recursion a ``lax.scan`` — the CUDA kernel's per-block scan maps to
XLA's native cumsum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    cp = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jnp.take(cp, jnp.asarray([0]), axis=axis))
    return jnp.concatenate(
        [one, jax.lax.slice_in_dim(cp, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis)


def alignment_train(p_choose: jnp.ndarray, eps: float = 1e-6
                    ) -> jnp.ndarray:
    """p_choose: (B, Tt, Ts) selection probabilities -> alpha (B, Tt, Ts)
    expected monotonic alignments."""
    b, tt, ts = p_choose.shape
    cumprod_1mp = exclusive_cumprod(1.0 - p_choose, axis=-1)
    clamped = jnp.clip(cumprod_1mp, eps, 1.0)
    alpha0 = jnp.zeros((b, ts), p_choose.dtype).at[:, 0].set(1.0)

    def step(prev_alpha, xs):
        p_t, cp_t, cl_t = xs                    # (B, Ts) each
        scan = jnp.cumsum(prev_alpha / cl_t, axis=-1)
        out = jnp.clip(scan * p_t * cp_t, 0.0, 1.0)
        return out, out

    xs = (p_choose.transpose(1, 0, 2), cumprod_1mp.transpose(1, 0, 2),
          clamped.transpose(1, 0, 2))
    _, alphas = jax.lax.scan(step, alpha0, xs)
    return alphas.transpose(1, 0, 2)
