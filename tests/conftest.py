"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's multi-process-single-host distributed test strategy
(tests/distributed/utils.py:12-37, file:// rendezvous spawn) the TPU-native
way: XLA host devices + jax.sharding meshes, no process spawning needed.

Must run before jax initializes its backends, hence the env mutation at
import time (pytest imports conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site hook pins JAX_PLATFORMS at interpreter start; the config
# update below overrides it reliably (must run before backend init).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    """A tiny-but-structurally-complete model config (fast on CPU)."""
    import jax.numpy as jnp
    from s2st_tpu.models.s2st_transformer import S2STConfig
    return S2STConfig(
        src_vocab_size=30, tgt_vocab_size=32,
        input_feat_per_channel=8,
        conv_kernel_sizes=(5, 5), conv_channels=16,
        encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, middle_layers=(0, 1),
        decoder_layers=2, decoder_embed_dim=16, decoder_ffn_embed_dim=32,
        decoder_attention_heads=2,
        output_frame_dim=8, n_frames_per_step=1,
        prenet_layers=2, prenet_dim=8,
        postnet_layers=2, postnet_conv_dim=8, postnet_conv_kernel_size=5,
        ctc=True, aux_asr=True, aux_st=True,
        asr_decoder_layers=1, asr_decoder_embed_dim=16,
        st_decoder_layers=1, st_decoder_embed_dim=16,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="session")
def tiny_variables(tiny_cfg, rng):
    from s2st_tpu.models.s2st_transformer import init_s2st
    return init_s2st(rng, tiny_cfg)


def make_batch(cfg, b=2, src_t=37, tgt_t=23, src_n=7, tgt_n=9, seed=0):
    """Random collated batch matching s2st_dataset.collate's key layout."""
    r = np.random.RandomState(seed)
    src_lens = r.randint(src_t // 2, src_t + 1, size=b).astype(np.int32)
    src_lens[0] = src_t
    tgt_lens = r.randint(tgt_t // 2, tgt_t + 1, size=b).astype(np.int32)
    tgt_lens[0] = tgt_t
    tgt_speech = r.randn(b, tgt_t, cfg.out_dim).astype(np.float32)
    prev = np.zeros_like(tgt_speech)
    prev[:, 1:] = tgt_speech[:, :-1]
    src_text = np.full((b, src_n), 1, np.int32)
    tgt_text = np.full((b, tgt_n), 1, np.int32)
    src_text_len = r.randint(2, src_n + 1, size=b).astype(np.int32)
    tgt_text_len = r.randint(2, tgt_n + 1, size=b).astype(np.int32)
    for i in range(b):
        src_text[i, :src_text_len[i]] = r.randint(
            4, cfg.src_vocab_size, size=src_text_len[i])
        src_text[i, src_text_len[i] - 1] = 2
        tgt_text[i, :tgt_text_len[i]] = r.randint(
            4, cfg.tgt_vocab_size, size=tgt_text_len[i])
        tgt_text[i, tgt_text_len[i] - 1] = 2
    prev_src = np.full((b, src_n), 1, np.int32)
    prev_tgt = np.full((b, tgt_n), 1, np.int32)
    for i in range(b):
        prev_src[i, 0] = 2
        prev_src[i, 1:src_text_len[i]] = src_text[i, :src_text_len[i] - 1]
        prev_tgt[i, 0] = 2
        prev_tgt[i, 1:tgt_text_len[i]] = tgt_text[i, :tgt_text_len[i] - 1]
    return {
        "src_speech": r.randn(b, src_t, cfg.input_feat_per_channel
                              ).astype(np.float32),
        "src_speech_lens": src_lens,
        "prev_output_tokens": prev,
        "prev_src_text_tokens": prev_src,
        "prev_tgt_text_tokens": prev_tgt,
        "tgt_speech": tgt_speech,
        "target_lengths": tgt_lens,
        "src_text": src_text,
        "src_text_len": src_text_len,
        "tgt_text": tgt_text,
        "tgt_text_len": tgt_text_len,
        "src_txt_ntokens": np.int32(src_text_len.sum()),
        "tgt_txt_ntokens": np.int32(tgt_text_len.sum()),
    }


@pytest.fixture()
def tiny_batch(tiny_cfg):
    return make_batch(tiny_cfg)


# ---------------------------------------------------------------------------
# smoke tier: `pytest -m smoke` = a <5-minute representative subset for the
# 1-CPU verification box (full suite is ~1.5h there). Covers: one CLI e2e
# train+resume, one mid-epoch-resume reproducibility run, one AR decode,
# one pipeline-parallel step, one multi-host collate, beam search, losses,
# and the reference-numerics forward parity test.
# ---------------------------------------------------------------------------
SMOKE_TESTS = {
    # one full CLI e2e (train + resume) is the heavyweight representative;
    # the other verticals' e2e runs live in the full suite only — measured
    # r4: they cost 100-145 s EACH on the 1-CPU box, which is what pushed
    # the tier to 17 min (the contract is <5 min)
    "test_cli_e2e.py::test_train_and_resume",
    "test_generator.py::test_incremental_matches_teacher_forced_decode",
    "test_pipeline.py::test_pipeline_matches_sequential_mlp",
    "test_multihost.py::test_row_sharded_collate_disjoint_and_aligned",
    "test_sequence_generator.py::test_beam_search_shapes_and_wellformed",
    "test_trainer.py::test_grad_accum_semantics",
    "test_model.py::test_forward_jits",
    "test_reference_parity.py::test_teacher_forced_forward_parity",
    "test_data.py::test_utterance_cmvn_and_specaugment",
    "test_checkpoint.py",  # whole file (fast)
    "test_bench_timing.py",  # whole file (fast)
    # NLP verticals (fast representatives)
    "test_translation.py::test_collate_matches_reference",
    "test_language_modeling.py::test_slice_indices_complete_mode",
    "test_nat.py::test_inject_noise_semantics",
    "test_bmuf.py",  # whole file (fast)
    "test_base_layer.py::test_balanced_and_near_optimal",
    "test_resampling_context.py::test_context_window_semantics_vs_reference_collater",
    "test_hydra_train.py::test_roundtrip_flags_to_yaml_to_same_namespace",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast representative subset (<5 min on 1 CPU; measured 2026-08-19: ~4 min)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]
        file_part = rel.split("::")[0]
        if rel in SMOKE_TESTS or file_part in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
