"""AR spectrogram generator: while_loop decode parity with teacher-forced
decode, eos termination, incremental==full-sequence consistency
(speech_generator_for_s2st.py:36-134 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2st_tpu.generate.speech_generator import (GenerationConfig,
                                                generate_features,
                                                teacher_forcing_features)
from s2st_tpu.models import s2st_transformer as m
from tests.conftest import make_batch


@pytest.fixture(scope="module")
def gen_cfg():
    return GenerationConfig(max_iter=16, eos_prob_threshold=0.5,
                            prenet_dropout_at_inference=False)


def test_generate_shapes(tiny_cfg, tiny_variables, tiny_batch, gen_cfg):
    out = generate_features(tiny_variables, tiny_cfg, gen_cfg,
                            tiny_batch["src_speech"],
                            tiny_batch["src_speech_lens"])
    b = tiny_batch["src_speech"].shape[0]
    r = tiny_cfg.n_frames_per_step
    assert out["feats"].shape == (b, gen_cfg.max_iter * r,
                                  tiny_cfg.output_frame_dim)
    assert out["eos_prob"].shape == (b, gen_cfg.max_iter * r)
    assert out["raw_out_lens"].shape == (b,)
    assert np.all(np.asarray(out["raw_out_lens"]) <= gen_cfg.max_iter * r)
    assert np.all(np.isfinite(np.asarray(out["feats"])))


def test_generate_jits_once(tiny_cfg, tiny_variables, tiny_batch, gen_cfg):
    f = jax.jit(lambda v, s, l: generate_features(v, tiny_cfg, gen_cfg, s, l))
    out = f(tiny_variables, tiny_batch["src_speech"],
            tiny_batch["src_speech_lens"])
    out2 = f(tiny_variables, tiny_batch["src_speech"] * 0.5,
             tiny_batch["src_speech_lens"])
    assert out["feats"].shape == out2["feats"].shape


def test_incremental_matches_teacher_forced_decode(tiny_cfg, tiny_variables):
    """Feed the AR generator's own outputs through the full-sequence decoder:
    pre-postnet features must match step-wise decode exactly (same math,
    KV-cache vs full attention)."""
    cfg = tiny_cfg
    gen_cfg = GenerationConfig(max_iter=8, eos_prob_threshold=1.1,
                               prenet_dropout_at_inference=False)
    batch = make_batch(cfg, b=2, src_t=29, seed=7)
    enc = m.encode(tiny_variables, cfg, batch["src_speech"],
                   batch["src_speech_lens"])

    from s2st_tpu.generate.speech_generator import _decode_loop
    feats, eos_prob, attn, out_lens = _decode_loop(
        tiny_variables, cfg, gen_cfg, enc, None, None)
    # reconstruct prev_output: zero BOS + generated feats shifted
    prev = np.zeros((2, gen_cfg.max_iter, cfg.out_dim), np.float32)
    prev[:, 1:] = np.asarray(feats)[:, :-1]
    tgt_lens = np.full((2,), gen_cfg.max_iter, np.int32)
    dec = m.decode(tiny_variables, cfg, prev, tgt_lens, enc,
                   rng=None, deterministic=True, train=False)
    np.testing.assert_allclose(np.asarray(feats),
                               np.asarray(dec["feat_out"], np.float32),
                               atol=2e-4)
    eos_full = jax.nn.sigmoid(np.asarray(dec["eos_out"], np.float32))[:, :, 0]
    np.testing.assert_allclose(np.asarray(eos_prob), eos_full, atol=2e-4)


def test_eos_termination_sets_out_lens(tiny_cfg, tiny_variables, tiny_batch):
    # threshold 0 -> every sample terminates at step 1
    gen_cfg = GenerationConfig(max_iter=8, eos_prob_threshold=0.0,
                               prenet_dropout_at_inference=False)
    out = generate_features(tiny_variables, tiny_cfg, gen_cfg,
                            tiny_batch["src_speech"],
                            tiny_batch["src_speech_lens"])
    np.testing.assert_array_equal(np.asarray(out["out_lens"]),
                                  np.ones(2, np.int32))


def test_teacher_forcing_generator(tiny_cfg, tiny_variables, tiny_batch):
    out = teacher_forcing_features(tiny_variables, tiny_cfg, tiny_batch)
    b, tt, _ = tiny_batch["tgt_speech"].shape
    assert out["feats"].shape == (b, tt * tiny_cfg.n_frames_per_step,
                                  tiny_cfg.output_frame_dim)
    np.testing.assert_array_equal(np.asarray(out["out_lens"]),
                                  tiny_batch["target_lengths"])


def test_gcmvn_denormalize(tiny_cfg, tiny_variables, tiny_batch):
    gen_cfg = GenerationConfig(max_iter=4, eos_prob_threshold=1.1,
                               prenet_dropout_at_inference=False)
    mean = np.full((tiny_cfg.output_frame_dim,), 2.0, np.float32)
    std = np.full((tiny_cfg.output_frame_dim,), 3.0, np.float32)
    base = generate_features(tiny_variables, tiny_cfg, gen_cfg,
                             tiny_batch["src_speech"],
                             tiny_batch["src_speech_lens"])
    denorm = generate_features(tiny_variables, tiny_cfg, gen_cfg,
                               tiny_batch["src_speech"],
                               tiny_batch["src_speech_lens"],
                               gcmvn_mean=mean, gcmvn_std=std)
    np.testing.assert_allclose(np.asarray(denorm["feats"]),
                               np.asarray(base["feats"]) * 3.0 + 2.0,
                               rtol=1e-5, atol=1e-5)


def test_int8_kv_cache_close_to_bf16(tiny_cfg, tiny_variables):
    """kv_cache_dtype="int8" must track the full-precision decode closely:
    same early frames within quantization tolerance and identical shapes
    (serving bandwidth optimization; GenerationConfig.kv_cache_dtype)."""
    from s2st_tpu.generate.speech_generator import (GenerationConfig,
                                                    generate_features)
    batch = make_batch(tiny_cfg, b=2, src_t=33, seed=4)
    outs = {}
    for dt in ("bf16", "int8"):
        gen_cfg = GenerationConfig(max_iter=10, eos_prob_threshold=1.5,
                                   prenet_dropout_at_inference=False,
                                   kv_cache_dtype=dt)
        outs[dt] = generate_features(
            tiny_variables, tiny_cfg, gen_cfg,
            batch["src_speech"], batch["src_speech_lens"])
    a = np.asarray(outs["bf16"]["feats"], np.float32)
    b = np.asarray(outs["int8"]["feats"], np.float32)
    assert a.shape == b.shape
    # AR drift compounds; require tight agreement on the first step and
    # bounded relative error overall
    np.testing.assert_allclose(b[:, :1], a[:, :1], atol=0.08, rtol=0.1)
    rel = np.abs(b - a).mean() / (np.abs(a).mean() + 1e-6)
    assert rel < 0.35, rel
