"""Pallas TPU kernels: lightweight & dynamic convolutions.

Parity: ``fairseq/modules/lightconv_layer/*.cu`` and
``dynamicconv_layer/*.cu`` (the reference's hand-written CUDA kernels,
SURVEY.md §2.5) — depthwise convolutions with softmax-normalized weights
shared across ``H`` head groups:

  lightconv:    y[b,t,c] = sum_k softmax(w)[h(c),k]   * x[b, t+k-pad, c]
  dynamicconv:  y[b,t,c] = sum_k softmax(w)[b,t,h(c),k] * x[b, t+k-pad, c]

(pad = K-1 for the causal convs fairseq uses; h(c) = c // (C/H)).

Kernel design (pallas_guide.md): grid over the batch; each program holds
one (T, C) activation block plus its weights in VMEM and accumulates the
K taps as shifted fused multiply-adds on the VPU — K is small (3..31), so
this is bandwidth-bound and one pass through VMEM beats K separate XLA
slices through HBM. Backward runs through the pure-JAX reference
implementations via ``jax.custom_vjp`` (they are used in training rarely;
the fwd kernel is the serving path).

On CPU (tests) the kernels run in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _shifted(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """x (T, C) shifted along time by `shift` (positive = from the past),
    zero-padded: out[t] = x[t - shift]."""
    t = x.shape[0]
    if shift == 0:
        return x
    if shift > 0:
        return jnp.pad(x, ((shift, 0), (0, 0)))[:t]
    return jnp.pad(x, ((0, -shift), (0, 0)))[-shift:]


# ---------------------------------------------------------------------------
# lightconv (shared weights)
# ---------------------------------------------------------------------------

def _lightconv_kernel(x_ref, w_ref, out_ref, *, kernel_size: int,
                      padding_l: int, heads: int):
    """Per-head static channel slices; scalar weight broadcast per slice
    (Mosaic has no cross-lane repeat/reshape, pallas_guide.md pitfalls)."""
    x = x_ref[0]                       # (T, C)
    c = x.shape[1]
    cph = c // heads
    w = jax.nn.softmax(w_ref[:].astype(jnp.float32), axis=-1)   # (H, K)
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    for k in range(kernel_size):
        xs = _shifted(x, padding_l - k).astype(jnp.float32)
        parts = [w[h, k] * xs[:, h * cph:(h + 1) * cph]
                 for h in range(heads)]
        acc = acc + jnp.concatenate(parts, axis=1)
    out_ref[0] = acc.astype(out_ref.dtype)


def lightconv(x: jnp.ndarray, weight: jnp.ndarray, padding_l: int,
              heads: int) -> jnp.ndarray:
    """x: (B, T, C); weight: (H, K) raw (softmax applied inside).
    Returns (B, T, C)."""
    b, t, c = x.shape
    h, k = weight.shape
    assert h == heads and c % heads == 0
    kern = functools.partial(_lightconv_kernel, kernel_size=k,
                             padding_l=padding_l, heads=heads)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=_interpret(),
    )(x, weight)


def lightconv_reference(x, weight, padding_l, heads):
    """Pure-JAX reference (used for the custom VJP backward + tests)."""
    b, t, c = x.shape
    h, k = weight.shape
    w = jax.nn.softmax(weight, axis=-1)
    w_c = jnp.repeat(w, c // heads, axis=0)        # (C, K)
    xp = jnp.pad(x, ((0, 0), (padding_l, k - 1 - padding_l), (0, 0)))
    out = jnp.zeros_like(x)
    for ki in range(k):
        out = out + xp[:, ki:ki + t, :] * w_c[:, ki][None, None, :]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lightconv_op(x, weight, padding_l, heads):
    return lightconv(x, weight, padding_l, heads)


def _lc_fwd(x, weight, padding_l, heads):
    return lightconv(x, weight, padding_l, heads), (x, weight)


def _lc_bwd(padding_l, heads, res, g):
    x, weight = res
    _, vjp = jax.vjp(lambda xx, ww: lightconv_reference(
        xx, ww, padding_l, heads), x, weight)
    return vjp(g)


lightconv_op.defvjp(_lc_fwd, _lc_bwd)


# ---------------------------------------------------------------------------
# dynamicconv (position-wise predicted weights)
# ---------------------------------------------------------------------------

def _dynamicconv_kernel(x_ref, w_ref, out_ref, *, kernel_size: int,
                        padding_l: int):
    """w_ref holds channel-expanded, softmaxed weights (K, T, C) — the
    expansion happens in XLA outside (Mosaic supports no cross-lane repeat
    or sub-lane-offset concat); the kernel is a pure K-tap shifted FMA."""
    x = x_ref[0]                                   # (T, C)
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    for k in range(kernel_size):
        xs = _shifted(x, padding_l - k).astype(jnp.float32)
        acc = acc + w_ref[0, k].astype(jnp.float32) * xs
    out_ref[0] = acc.astype(out_ref.dtype)


def dynamicconv(x: jnp.ndarray, weight: jnp.ndarray, padding_l: int,
                heads: int) -> jnp.ndarray:
    """x: (B, T, C); weight: (B, T, H, K) raw logits. Returns (B, T, C).

    Falls back to the XLA reference when the expanded weights would not fit
    a program's VMEM budget (large T*C*K)."""
    b, t, c = x.shape
    _, _, h, k = weight.shape
    assert h == heads and c % heads == 0
    if (t * c * k + 2 * t * c) * 4 > 12 * 1024 * 1024:
        return dynamicconv_reference(x, weight, padding_l, heads)
    w = jax.nn.softmax(weight.astype(jnp.float32), axis=-1)   # (B,T,H,K)
    w = jnp.repeat(w, c // heads, axis=2)                     # (B,T,C,K)
    w = jnp.transpose(w, (0, 3, 1, 2))                        # (B,K,T,C)
    kern = functools.partial(_dynamicconv_kernel, kernel_size=k,
                             padding_l=padding_l)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, t, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=_interpret(),
    )(x, w)


def dynamicconv_reference(x, weight, padding_l, heads):
    b, t, c = x.shape
    _, _, h, k = weight.shape
    w = jax.nn.softmax(weight, axis=-1)                    # (B, T, H, K)
    w_c = jnp.repeat(w, c // heads, axis=2)                # (B, T, C, K)
    xp = jnp.pad(x, ((0, 0), (padding_l, k - 1 - padding_l), (0, 0)))
    out = jnp.zeros_like(x)
    for ki in range(k):
        out = out + xp[:, ki:ki + t, :] * w_c[:, :, :, ki]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dynamicconv_op(x, weight, padding_l, heads):
    return dynamicconv(x, weight, padding_l, heads)


def _dc_fwd(x, weight, padding_l, heads):
    return dynamicconv(x, weight, padding_l, heads), (x, weight)


def _dc_bwd(padding_l, heads, res, g):
    x, weight = res
    _, vjp = jax.vjp(lambda xx, ww: dynamicconv_reference(
        xx, ww, padding_l, heads), x, weight)
    return vjp(g)


dynamicconv_op.defvjp(_dc_fwd, _dc_bwd)
