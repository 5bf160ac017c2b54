"""Model forward: shapes, masks, jit, padding invariance.

Coverage analogue of the reference's missing s2s_trans model tests
(SURVEY.md §4 — the rebuild adds what the reference never had)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2st_tpu.models import s2st_transformer as m
from tests.conftest import make_batch


def test_forward_shapes(tiny_cfg, tiny_variables, tiny_batch):
    out = m.forward(tiny_variables, tiny_cfg, tiny_batch, deterministic=True)
    b, tt, _ = tiny_batch["tgt_speech"].shape
    assert out["feat_out"].shape == (b, tt, tiny_cfg.out_dim)
    assert out["post_feat_out"].shape == (b, tt, tiny_cfg.out_dim)
    assert out["eos_out"].shape == (b, tt, 1)
    ts_sub = m.subsampled_length(tiny_cfg, tiny_batch["src_speech"].shape[1])
    assert out["attn"].shape == (b, tt, ts_sub)
    assert out["ctc_logits"].shape == (b, ts_sub, tiny_cfg.src_vocab_size)
    assert out["asr_logits"].shape == (
        b, tiny_batch["prev_src_text_tokens"].shape[1], tiny_cfg.src_vocab_size)
    assert out["st_logits"].shape == (
        b, tiny_batch["prev_tgt_text_tokens"].shape[1], tiny_cfg.tgt_vocab_size)
    for k in ("feat_out", "post_feat_out", "eos_out", "attn"):
        assert np.all(np.isfinite(np.asarray(out[k], np.float32))), k


def test_subsampled_lengths(tiny_cfg, tiny_variables, tiny_batch):
    out = m.encode(tiny_variables, tiny_cfg, tiny_batch["src_speech"],
                   tiny_batch["src_speech_lens"])
    lens = np.asarray(out["out_lengths"])
    expect = np.asarray(tiny_batch["src_speech_lens"])
    for _ in tiny_cfg.conv_kernel_sizes:
        expect = (expect - 1) // 2 + 1
    np.testing.assert_array_equal(lens, expect)
    # padding mask consistent with lengths
    mask = np.asarray(out["encoder_padding_mask"])
    np.testing.assert_array_equal((~mask).sum(axis=1), expect)


def test_forward_jits(tiny_cfg, tiny_variables, tiny_batch):
    fwd = jax.jit(lambda v, b: m.forward(v, tiny_cfg, b, deterministic=True))
    out = fwd(tiny_variables, tiny_batch)
    assert out["feat_out"].shape[0] == tiny_batch["tgt_speech"].shape[0]


def test_encoder_padding_invariance(tiny_cfg, tiny_variables):
    """Extending src ZERO-padding (what the static-shape batcher emits) must
    not change any valid encoder output. Note: conv windows of boundary
    frames do read the padded tail — matching fairseq's Conv1dSubsampler —
    so only zero padding is invariant, not arbitrary pad values."""
    b1 = make_batch(tiny_cfg, b=2, src_t=33, seed=3)
    src = b1["src_speech"]
    lens = b1["src_speech_lens"]
    # zero out the beyond-length tail (collate guarantees this), then extend
    t = src.shape[1]
    valid = np.arange(t)[None, :, None] < lens[:, None, None]
    src = np.where(valid, src, 0.0).astype(np.float32)
    src_longer = np.concatenate(
        [src, np.zeros((2, 12, src.shape[2]), np.float32)], axis=1)
    e1 = m.encode(tiny_variables, tiny_cfg, src, lens)
    e2 = m.encode(tiny_variables, tiny_cfg, src_longer, lens)
    out_lens = np.asarray(e1["out_lengths"])
    a = np.asarray(e1["encoder_out"], np.float32)
    c = np.asarray(e2["encoder_out"], np.float32)
    for row in range(2):
        n = int(out_lens[row])
        np.testing.assert_allclose(a[row, :n], c[row, :n], atol=2e-5)


def test_decoder_causality(tiny_cfg, tiny_variables, tiny_batch):
    """Changing future prev_output frames must not change earlier outputs."""
    enc = m.encode(tiny_variables, tiny_cfg, tiny_batch["src_speech"],
                   tiny_batch["src_speech_lens"])
    prev = tiny_batch["prev_output_tokens"]
    d1 = m.decode(tiny_variables, tiny_cfg, prev,
                  tiny_batch["target_lengths"], enc)
    prev2 = prev.copy()
    prev2[:, 10:] += 5.0
    d2 = m.decode(tiny_variables, tiny_cfg, prev2,
                  tiny_batch["target_lengths"], enc)
    np.testing.assert_allclose(
        np.asarray(d1["feat_out"][:, :10], np.float32),
        np.asarray(d2["feat_out"][:, :10], np.float32), atol=1e-5)
    assert not np.allclose(np.asarray(d1["feat_out"][:, 10:], np.float32),
                           np.asarray(d2["feat_out"][:, 10:], np.float32))


def test_param_count_scales(tiny_cfg, tiny_variables):
    n = m.param_count(tiny_variables)
    assert n > 1000
    # base config is ~70-90M params like the reference s2st_transformer
    base = m.S2STConfig()
    # don't init the full model on CPU tests; just sanity-check tiny
    assert isinstance(n, int)


def test_no_aux_heads_config(rng):
    cfg = m.S2STConfig(
        src_vocab_size=10, tgt_vocab_size=10, input_feat_per_channel=8,
        conv_channels=8, encoder_layers=1, encoder_embed_dim=8,
        encoder_ffn_embed_dim=16, encoder_attention_heads=2,
        decoder_layers=1, decoder_embed_dim=8, decoder_ffn_embed_dim=16,
        decoder_attention_heads=2, output_frame_dim=8, prenet_dim=8,
        postnet_layers=1, postnet_conv_dim=8,
        ctc=False, aux_asr=False, aux_st=False, middle_layers=(),
        dtype=jnp.float32)
    variables = m.init_s2st(rng, cfg)
    assert "aux_asr_decoder" not in variables["params"]
    batch = make_batch(cfg, b=2, src_t=19, tgt_t=11)
    out = m.forward(variables, cfg, batch, deterministic=True)
    assert "ctc_logits" not in out and "asr_logits" not in out


def test_encoder_layerdrop(tiny_cfg, tiny_variables, rng):
    """LayerDrop (arXiv 1909.11556): with p=1 every encoder layer is a
    no-op at train time; eval always runs all layers; p=0 matches the
    baseline exactly."""
    import jax
    from s2st_tpu.models import s2st_transformer as m
    from tests.conftest import make_batch
    batch = make_batch(tiny_cfg, b=2, src_t=24, seed=11)
    base = m.encode(tiny_variables, tiny_cfg, batch["src_speech"],
                    batch["src_speech_lens"])
    cfg_ld = tiny_cfg.replace(encoder_layerdrop=1.0, dropout=0.0,
                              attention_dropout=0.0, activation_dropout=0.0)
    cfg0 = tiny_cfg.replace(encoder_layerdrop=0.0, dropout=0.0,
                            attention_dropout=0.0, activation_dropout=0.0)
    key = jax.random.PRNGKey(3)
    drop_all = m.encode(tiny_variables, cfg_ld, batch["src_speech"],
                        batch["src_speech_lens"], rng=key,
                        deterministic=False)
    no_drop = m.encode(tiny_variables, cfg0, batch["src_speech"],
                       batch["src_speech_lens"], rng=key,
                       deterministic=False)
    # p=1: transformer stack is identity (up to the final layer norm)
    assert not np.allclose(np.asarray(drop_all["encoder_out"]),
                           np.asarray(no_drop["encoder_out"]))
    # eval ignores layerdrop entirely
    ev = m.encode(tiny_variables, cfg_ld, batch["src_speech"],
                  batch["src_speech_lens"], deterministic=True)
    np.testing.assert_allclose(np.asarray(ev["encoder_out"]),
                               np.asarray(base["encoder_out"]),
                               rtol=1e-5, atol=1e-5)
