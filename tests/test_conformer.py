"""Reference-numerics parity for the conformer stack
(fairseq/modules/{conformer_layer,convolution,rel_position_multihead_attention,
relative_multihead_attention,vggblock}.py): the reference's OWN torch modules
run on identical inputs/weights and must agree with the TPU-native versions.
"""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.nn import conformer as cf
from s2st_tpu.models.torch_import import _lin, _ln, _mha


def _mha_bare(sd):
    """_mha for a bare (unprefixed) torch module's state_dict."""
    return {"q": _lin(sd, "q_proj", {}), "k": _lin(sd, "k_proj", {}),
            "v": _lin(sd, "v_proj", {}), "out": _lin(sd, "out_proj", {})}
from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")

B, T, C, H, F = 2, 11, 16, 2, 32


def _np(x):
    return x.detach().cpu().numpy()


def _rand_x(torch, seed=0):
    g = np.random.RandomState(seed)
    x = g.randn(B, T, C).astype(np.float32)
    lens = np.array([T, T - 3])
    pad = np.arange(T)[None, :] >= lens[:, None]
    return x, pad, torch.tensor(x), torch.tensor(pad)


def _import_dw(sd, prefix):
    w = sd.pop(prefix + ".weight")  # (C, 1, K)
    return {"w": np.transpose(w, (2, 1, 0))[:, 0, :].copy(),
            "b": sd.pop(prefix + ".bias")}


def _import_conv_module(sd, prefix, norm):
    """prefix is "" (bare module) or "conv_module." (inside the layer)."""
    p = {
        "pw1": {"w": np.transpose(sd.pop(prefix + "pointwise_conv1.weight"),
                                  (2, 1, 0)).copy(),
                "b": sd.pop(prefix + "pointwise_conv1.bias")},
        "dw": _import_dw(sd, prefix + "depthwise_conv"),
        "pw2": {"w": np.transpose(sd.pop(prefix + "pointwise_conv2.weight"),
                                  (2, 1, 0)).copy(),
                "b": sd.pop(prefix + "pointwise_conv2.bias")},
        "norm": _ln(sd, prefix + "norm"),
    }
    stats = {}
    if norm == "batch_norm":
        stats = {"mean": sd.pop(prefix + "norm.running_mean"),
                 "var": sd.pop(prefix + "norm.running_var"),
                 "count": np.int32(0)}
        sd.pop(prefix + "norm.num_batches_tracked", None)
    return p, stats


@pytest.mark.parametrize("norm", ["batch_norm", "layer_norm"])
def test_convolution_module_parity(norm):
    load_reference()
    import torch
    from fairseq.modules.convolution import ConvolutionModule

    torch.manual_seed(0)
    m = ConvolutionModule(C, kernel_size=5, norm=norm)
    if norm == "batch_norm":
        # randomize running stats so eval mode actually exercises them
        m.norm.running_mean.uniform_(-0.5, 0.5)
        m.norm.running_var.uniform_(0.5, 1.5)
    m.eval()

    x, pad, tx, tpad = _rand_x(torch)
    with torch.no_grad():
        ref = _np(m(tx, tpad))

    sd = {k: _np(v) for k, v in m.state_dict().items()}
    p, stats = _import_conv_module(sd, "", norm)
    p = jax.tree.map(jnp.asarray, p)
    got, _ = cf.conv_module(p, jax.tree.map(jnp.asarray, stats),
                            jnp.asarray(x), jnp.asarray(pad), 5, norm,
                            train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_rel_position_mha_parity():
    load_reference()
    import torch
    from fairseq.modules.rel_position_multihead_attention import \
        RelPositionMultiheadAttention

    torch.manual_seed(1)
    m = RelPositionMultiheadAttention(C, H, dropout=0.0, self_attention=True)
    m.eval()

    x, pad, tx, tpad = _rand_x(torch, 1)
    g = np.random.RandomState(2)
    pos = g.randn(T, B, C).astype(np.float32)   # reference: (pos_len, B, C)
    with torch.no_grad():
        ref, _ = m(tx.transpose(0, 1), tx.transpose(0, 1), tx.transpose(0, 1),
                   key_padding_mask=tpad, need_weights=False,
                   pos_emb=torch.tensor(pos))
    ref = np.transpose(_np(ref), (1, 0, 2))

    sd = {k: _np(v) for k, v in m.state_dict().items()}
    p = _mha_bare(sd)
    p["linear_pos"] = _lin(sd, "linear_pos", {})
    p["pos_bias_u"] = sd.pop("pos_bias_u")
    p["pos_bias_v"] = sd.pop("pos_bias_v")
    got, _ = cf.rel_position_mha(
        jax.tree.map(jnp.asarray, p), jnp.asarray(x),
        jnp.asarray(np.transpose(pos, (1, 0, 2))), H,
        key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


@pytest.mark.parametrize("k_only", [True, False])
def test_relative_mha_parity(k_only):
    load_reference()
    import torch
    from fairseq.modules.relative_multihead_attention import \
        RelativeMultiheadAttention

    torch.manual_seed(3)
    m = RelativeMultiheadAttention(C, H, dropout=0.0, self_attention=True,
                                   max_relative_length=4, k_only=k_only)
    m.eval()

    x, pad, tx, tpad = _rand_x(torch, 3)
    with torch.no_grad():
        ref, _ = m(tx.transpose(0, 1), tx.transpose(0, 1), tx.transpose(0, 1),
                   key_padding_mask=tpad, need_weights=False)
    ref = np.transpose(_np(ref), (1, 0, 2))

    sd = {k: _np(v) for k, v in m.state_dict().items()}
    p = _mha_bare(sd)
    p["rel_keys"] = sd.pop("relative_position_keys")
    if not k_only:
        p["rel_values"] = sd.pop("relative_position_values")
    got, _ = cf.relative_mha(jax.tree.map(jnp.asarray, p), jnp.asarray(x), H,
                             4, key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def _ref_layer_args(attn_type, macaron, use_cnn, normalize_before):
    a = argparse.Namespace()
    a.encoder_embed_dim = C
    a.encoder_ffn_embed_dim = 2 * C
    a.encoder_attention_heads = H
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.activation_fn = "relu"
    a.macaron_style = macaron
    a.use_cnn_module = use_cnn
    a.cnn_module_kernel = 5
    a.encoder_normalize_before = normalize_before
    a.encoder_attention_type = attn_type
    a.max_encoder_relative_length = 4
    a.quant_noise_pq = 0
    return a


def _import_layer(m, cfg):
    sd = {k: _np(v) for k, v in m.state_dict().items()}
    p = {
        "self_attn": _mha(sd, "self_attn"),
        "self_attn_ln": _ln(sd, "self_attn_layer_norm"),
        "fc1": _lin(sd, "fc1", {}),
        "fc2": _lin(sd, "fc2", {}),
        "ffn_ln": _ln(sd, "ffn_norm"),
    }
    if cfg.attn_type == "rel_selfattn":
        p["self_attn"]["linear_pos"] = _lin(sd, "self_attn.linear_pos", {})
        p["self_attn"]["pos_bias_u"] = sd.pop("self_attn.pos_bias_u")
        p["self_attn"]["pos_bias_v"] = sd.pop("self_attn.pos_bias_v")
    if cfg.attn_type == "relative":
        p["self_attn"]["rel_keys"] = sd.pop(
            "self_attn.relative_position_keys")
    stats = {}
    if cfg.macaron_style:
        p["macaron_fc1"] = _lin(sd, "macaron_fc1", {})
        p["macaron_fc2"] = _lin(sd, "macaron_fc2", {})
        p["macaron_ln"] = _ln(sd, "macaron_norm")
    if cfg.use_cnn_module:
        p["conv_ln"] = _ln(sd, "conv_norm")
        p["conv"], stats = _import_conv_module(sd, "conv_module.",
                                               cfg.cnn_norm)
        p["final_ln"] = _ln(sd, "final_norm")
    assert not sd, f"unmapped reference keys: {sorted(sd)}"
    return (jax.tree.map(jnp.asarray, p),
            jax.tree.map(jnp.asarray, stats) if stats else {})


@pytest.mark.parametrize(
    "attn_type,macaron,use_cnn,normalize_before",
    [("selfattn", True, True, True),
     ("selfattn", False, False, False),
     ("rel_selfattn", True, True, True),
     ("relative", True, True, False)])
def test_conformer_layer_parity(attn_type, macaron, use_cnn,
                                normalize_before):
    load_reference()
    import torch
    from fairseq.modules.conformer_layer import ConformerEncoderLayer

    torch.manual_seed(7)
    a = _ref_layer_args(attn_type, macaron, use_cnn, normalize_before)
    m = ConformerEncoderLayer(a)
    if use_cnn:
        m.conv_module.norm.running_mean.uniform_(-0.5, 0.5)
        m.conv_module.norm.running_var.uniform_(0.5, 1.5)
    m.eval()

    cfg = cf.ConformerConfig(
        embed_dim=C, ffn_dim=2 * C, num_heads=H, dropout=0.0,
        activation_dropout=0.0, attention_dropout=0.0, activation="relu",
        attn_type=attn_type, macaron_style=macaron, use_cnn_module=use_cnn,
        cnn_module_kernel=5, cnn_norm="batch_norm",
        normalize_before=normalize_before, max_relative_length=4)

    x, pad, tx, tpad = _rand_x(torch, 7)
    g = np.random.RandomState(8)
    pos = g.randn(T, B, C).astype(np.float32)
    kwargs = {}
    if attn_type == "rel_selfattn":
        kwargs["pos_emb"] = torch.tensor(pos)
    with torch.no_grad():
        ref = _np(m(tx.transpose(0, 1), tpad, **kwargs))
    ref = np.transpose(ref, (1, 0, 2))

    p, stats = _import_layer(m, cfg)
    got, _ = cf.conformer_layer(
        p, stats, cfg, jnp.asarray(x), jnp.asarray(pad),
        pos_emb=(jnp.asarray(np.transpose(pos, (1, 0, 2)))
                 if attn_type == "rel_selfattn" else None))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_conformer_layer_jit_and_grad():
    """The layer is jittable end to end and training mode (BN batch stats +
    dropout rngs) produces finite grads."""
    cfg = cf.ConformerConfig(embed_dim=C, ffn_dim=2 * C, num_heads=H,
                             dropout=0.1, attn_type="selfattn",
                             cnn_module_kernel=5)
    p, stats = cf.conformer_layer_init(jax.random.PRNGKey(0), cfg)
    g = np.random.RandomState(0)
    x = jnp.asarray(g.randn(B, T, C).astype(np.float32))
    pad = jnp.asarray(np.arange(T)[None, :] >= np.array([T, T - 3])[:, None])

    @jax.jit
    def loss_fn(p, stats, rng):
        y, new_stats = cf.conformer_layer(p, stats, cfg, x, pad, rng=rng,
                                          deterministic=False, train=True)
        return jnp.sum(y ** 2), new_stats

    (val, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        p, stats, jax.random.PRNGKey(1))
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert float(jnp.sum(jnp.abs(new_stats["mean"]))) > 0  # BN stats updated


@pytest.mark.parametrize("use_ln", [False, True])
def test_vgg_block_parity(use_ln):
    load_reference()
    import torch
    from fairseq.modules.vggblock import VGGBlock

    torch.manual_seed(9)
    m = VGGBlock(in_channels=1, out_channels=4, conv_kernel_size=3,
                 pooling_kernel_size=2, num_conv_layers=2, input_dim=F,
                 layer_norm=use_ln)
    m.eval()

    g = np.random.RandomState(9)
    x = g.randn(B, 1, T, F).astype(np.float32)      # reference NCHW
    with torch.no_grad():
        ref = _np(m(torch.tensor(x)))
    ref = np.transpose(ref, (0, 2, 3, 1))           # -> NHWC

    sd = {k: _np(v) for k, v in m.state_dict().items()}
    p = {}
    conv_i = 0
    for idx, sub in enumerate(m.layers):
        if type(sub).__name__ == "Conv2d":
            p[f"conv{conv_i}"] = {
                "w": np.transpose(sd.pop(f"layers.{idx}.weight"),
                                  (2, 3, 1, 0)).copy(),
                "b": sd.pop(f"layers.{idx}.bias")}
        elif type(sub).__name__ == "LayerNorm":
            p[f"ln{conv_i}"] = {
                "scale": sd.pop(f"layers.{idx}.weight"),
                "bias": sd.pop(f"layers.{idx}.bias")}
            conv_i += 1
        elif type(sub).__name__ == "ReLU" and not use_ln:
            conv_i += 1
    assert not sd, f"unmapped reference keys: {sorted(sd)}"
    got = cf.vgg_block(jax.tree.map(jnp.asarray, p),
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       num_conv_layers=2, conv_kernel_size=3,
                       pooling_kernel_size=2, use_layer_norm=use_ln)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
