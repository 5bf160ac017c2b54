"""xm_transformer: Conv1dAdaptor parity vs the reference module, and the
full raw-audio -> mBART-decoder forward under jit (its trunk and decoder
numerics are covered by the HuBERT and BART parity suites).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import xm_transformer as xm
from s2st_tpu.models.hubert import HubertConfig


def test_adaptor_parity():
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    load_reference()
    from fairseq.models.speech_to_text.xm_transformer import Conv1dAdaptor

    torch.manual_seed(0)
    in_dim, out_dim = 12, 8
    mod = Conv1dAdaptor(in_dim, out_dim, n_layers=2, kernel_size=3,
                        stride=2, add_layernorm=True)
    mod.eval()

    cfg = xm.XMConfig(adaptor_n_layers=2, adaptor_kernel_size=3,
                      adaptor_stride=2, adaptor_layernorm=True,
                      decoder_embed_dim=out_dim)
    p = {}
    for i, layer in enumerate(mod.layers):
        p[f"conv{i}"] = {
            "w": jnp.asarray(np.transpose(
                layer.weight.detach().numpy(), (2, 1, 0)).copy()),
            "b": jnp.asarray(layer.bias.detach().numpy()),
        }
        p[f"ln{i}"] = {
            "scale": jnp.asarray(
                mod.layernorms[i].weight.detach().numpy()),
            "bias": jnp.asarray(mod.layernorms[i].bias.detach().numpy()),
        }

    r = np.random.RandomState(0)
    b, t = 3, 17
    x = r.randn(b, t, in_dim).astype(np.float32)
    lens = np.array([17, 11, 8], np.int64)
    pad_mask = np.arange(t)[None, :] >= lens[:, None]
    with torch.no_grad():
        # reference takes T x B x C + B x T mask
        y_ref, mask_ref = mod(torch.from_numpy(x).transpose(0, 1),
                              torch.from_numpy(pad_mask))
    y, out_lens = xm.adaptor_forward(p, cfg, jnp.asarray(x),
                                     jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(y),
                               y_ref.transpose(0, 1).numpy(), atol=1e-5)
    ref_lens = (~mask_ref.numpy()).sum(1)
    np.testing.assert_array_equal(np.asarray(out_lens), ref_lens)


def test_xm_forward_jits():
    trunk = HubertConfig(conv_layers=((8, 10, 5), (8, 3, 2)),
                         encoder_layers=1, encoder_embed_dim=16,
                         encoder_ffn_embed_dim=32,
                         encoder_attention_heads=2, conv_pos=8,
                         conv_pos_groups=2)
    cfg = xm.XMConfig(trunk=trunk, vocab_size=30, decoder_layers=1,
                      decoder_embed_dim=16, decoder_ffn_embed_dim=32,
                      decoder_attention_heads=2, adaptor_n_layers=1,
                      max_target_positions=64)
    v = xm.init_xm(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(0)
    wave = r.randn(2, 400).astype(np.float32)
    lens = np.array([400, 300], np.int32)
    prev = np.array([[2, 5, 6, 7], [2, 8, 9, 1]], np.int32)
    out = jax.jit(lambda v, b: xm.forward(v, cfg, b, deterministic=True))(
        v, {"src_speech": wave, "src_speech_lens": lens,
            "prev_text_tokens": prev})
    assert out["logits"].shape == (2, 4, 30)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # frozen trunk: no grad reaches the w2v params
    def loss(v):
        o = xm.forward(v, cfg, {"src_speech": wave,
                                "src_speech_lens": lens,
                                "prev_text_tokens": prev},
                       deterministic=True)
        return jnp.sum(o["logits"] ** 2)
    g = jax.grad(loss)(v)
    w2v_norm = sum(float(jnp.abs(x).sum())
                   for x in jax.tree_util.tree_leaves(g["params"]["w2v"]))
    dec_norm = sum(float(jnp.abs(x).sum())
                   for x in jax.tree_util.tree_leaves(
                       g["params"]["decoder"]))
    assert w2v_norm == 0.0 and dec_norm > 0.0
