"""Pallas lightconv/dynamicconv kernels vs pure-JAX references (CUDA
lightconv_cuda/dynamicconv_cuda parity, SURVEY §2.5). Runs in interpreter
mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.ops.conv_kernels import (dynamicconv_op, dynamicconv_reference,
                                       lightconv_op, lightconv_reference)


def test_lightconv_matches_reference():
    r = np.random.RandomState(0)
    b, t, c, h, k = 2, 12, 8, 2, 3
    x = jnp.asarray(r.randn(b, t, c).astype(np.float32))
    w = jnp.asarray(r.randn(h, k).astype(np.float32))
    pad = k - 1  # causal
    got = lightconv_op(x, w, pad, h)
    ref = lightconv_reference(x, w, pad, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_lightconv_causal():
    r = np.random.RandomState(1)
    b, t, c, h, k = 1, 10, 4, 1, 3
    x = r.randn(b, t, c).astype(np.float32)
    w = jnp.asarray(r.randn(h, k).astype(np.float32))
    y1 = np.asarray(lightconv_op(jnp.asarray(x), w, k - 1, h))
    x2 = x.copy()
    x2[:, 6:] += 10.0  # future change
    y2 = np.asarray(lightconv_op(jnp.asarray(x2), w, k - 1, h))
    np.testing.assert_allclose(y1[:, :6], y2[:, :6], atol=1e-6)


def test_dynamicconv_matches_reference():
    r = np.random.RandomState(2)
    b, t, c, h, k = 2, 9, 8, 4, 5
    x = jnp.asarray(r.randn(b, t, c).astype(np.float32))
    w = jnp.asarray(r.randn(b, t, h, k).astype(np.float32))
    pad = k - 1
    got = dynamicconv_op(x, w, pad, h)
    ref = dynamicconv_reference(x, w, pad, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_gradients_flow():
    r = np.random.RandomState(3)
    b, t, c, h, k = 1, 6, 4, 2, 3
    x = jnp.asarray(r.randn(b, t, c).astype(np.float32))
    w = jnp.asarray(r.randn(b, t, h, k).astype(np.float32))

    def loss(x, w):
        return jnp.sum(dynamicconv_op(x, w, k - 1, h) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)

    def loss_ref(x, w):
        return jnp.sum(dynamicconv_reference(x, w, k - 1, h) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-4)
