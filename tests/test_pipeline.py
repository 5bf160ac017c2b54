"""Pipeline parallelism: GPipe schedule over a stage mesh axis must equal
sequential layer application exactly (torch-Pipe pipeline transformer
parity, model_parallel/models/pipeline_parallel_transformer/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from s2st_tpu.nn.transformer import encoder_layer, encoder_layer_init
from s2st_tpu.parallel.pipeline import pipeline_apply, stack_layer_params


@pytest.fixture(scope="module")
def stage_mesh():
    devices = np.asarray(jax.devices()[:4]).reshape(4)
    return Mesh(devices, ("stage",))


def test_pipeline_matches_sequential_mlp(stage_mesh):
    """8 linear+gelu layers over 4 stages, 4 microbatches."""
    r = np.random.RandomState(0)
    L, B, D = 8, 8, 16
    layers = [{"w": jnp.asarray(r.randn(D, D).astype(np.float32) * 0.2),
               "b": jnp.asarray(r.randn(D).astype(np.float32) * 0.1)}
              for _ in range(L)]
    x = jnp.asarray(r.randn(B, 5, D).astype(np.float32))

    def layer_fn(p, h):
        return jax.nn.gelu(h @ p["w"] + p["b"])

    ref = x
    for p in layers:
        ref = layer_fn(p, ref)

    out = pipeline_apply(layer_fn, stack_layer_params(layers), x,
                         stage_mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_microbatch_counts(stage_mesh):
    r = np.random.RandomState(1)
    L, B, D = 4, 12, 8
    layers = [{"w": jnp.asarray(r.randn(D, D).astype(np.float32) * 0.3)}
              for _ in range(L)]
    x = jnp.asarray(r.randn(B, D).astype(np.float32))

    def layer_fn(p, h):
        return jnp.tanh(h @ p["w"])

    ref = x
    for p in layers:
        ref = layer_fn(p, ref)
    for m in (2, 3, 6, 12):
        out = pipeline_apply(layer_fn, stack_layer_params(layers), x,
                             stage_mesh, n_micro=m)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=f"m={m}")


def test_pipeline_transformer_encoder_layers(stage_mesh):
    """Real transformer encoder layers (shared static padding mask) through
    the pipeline == sequential stack."""
    r = np.random.RandomState(2)
    L, B, T, D, H = 4, 4, 10, 16, 2
    key = jax.random.PRNGKey(0)
    layers = [encoder_layer_init(jax.random.fold_in(key, i), D, 32, H)
              for i in range(L)]
    x = jnp.asarray(r.randn(B, T, D).astype(np.float32))
    pad = jnp.zeros((B, T), bool)

    def layer_fn(p, h):
        # padding mask is replicated/static across microbatches here; the
        # model-level integration slices it per microbatch
        return encoder_layer(p, h, None, H, normalize_before=True)

    ref = x
    for p in layers:
        ref = layer_fn(p, ref)
    out = pipeline_apply(layer_fn, stack_layer_params(layers), x,
                         stage_mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_pipeline_gradients_match_sequential(stage_mesh):
    """Gradients THROUGH the pipeline (scan+ppermute+psum) must equal the
    sequential model's — the reference trains through torch Pipe
    (model_parallel/models/pipeline_parallel_transformer/model.py)."""
    r = np.random.RandomState(2)
    L, B, D = 4, 8, 10
    layers = [{"w": jnp.asarray(r.randn(D, D).astype(np.float32) * 0.3),
               "b": jnp.asarray(r.randn(D).astype(np.float32) * 0.1)}
              for _ in range(L)]
    stacked = stack_layer_params(layers)
    x = jnp.asarray(r.randn(B, D).astype(np.float32))
    tgt = jnp.asarray(r.randn(B, D).astype(np.float32))

    def layer_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    def loss_pp(sp):
        out = pipeline_apply(layer_fn, sp, x, stage_mesh, n_micro=4)
        return jnp.mean((out - tgt) ** 2)

    def loss_seq(sp):
        h = x
        for i in range(L):
            h = layer_fn(jax.tree_util.tree_map(lambda a: a[i], sp), h)
        return jnp.mean((h - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_pp),
                     jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_collect_and_batched_args(stage_mesh):
    """collect=True returns every layer's output (the tap mechanism);
    batched_args are microbatched alongside x (padding-mask pattern)."""
    r = np.random.RandomState(3)
    L, B, T, D = 4, 8, 5, 6
    layers = [{"w": jnp.asarray(r.randn(D, D).astype(np.float32) * 0.4)}
              for _ in range(L)]
    x = jnp.asarray(r.randn(B, T, D).astype(np.float32))
    mask = jnp.asarray(r.rand(B, T) > 0.3)

    def layer_fn(p, h, m):
        h = jnp.tanh(h @ p["w"])
        return jnp.where(m[:, :, None], h, 0.0)

    ref, taps = x, []
    for p in layers:
        ref = layer_fn(p, ref, mask)
        taps.append(ref)

    out, ys = pipeline_apply(layer_fn, stack_layer_params(layers), x,
                             stage_mesh, n_micro=2, batched_args=(mask,),
                             collect=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert ys.shape == (L, B, T, D)
    for i in range(L):
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(taps[i]),
                                   rtol=2e-5, atol=2e-5)
