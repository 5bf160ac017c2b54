"""FastSpeech2 (NAR TTS) parity tests: length-regulator oracle, forward
shapes in teacher-forced and free-running modes, criterion gradients
(fairseq/models/text_to_speech/fastspeech2.py +
criterions/fastspeech2_loss.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import fastspeech2 as fs2
from s2st_tpu.train.losses import LossConfig, fastspeech2_loss

PAD = 1


@pytest.fixture(scope="module")
def cfg():
    return fs2.FS2Config(
        vocab_size=40, output_frame_dim=8,
        encoder_layers=2, encoder_embed_dim=16, encoder_attention_heads=2,
        decoder_layers=2, decoder_embed_dim=16, decoder_attention_heads=2,
        fft_hidden_dim=32, fft_kernel_size=3,
        var_pred_n_bins=16, var_pred_hidden_dim=8, var_pred_kernel_size=3,
        add_postnet=True, postnet_layers=2, postnet_conv_dim=8,
        ctc=True, max_source_positions=64, max_target_positions=128)


@pytest.fixture(scope="module")
def variables(cfg):
    return fs2.init_fs2(jax.random.PRNGKey(0), cfg)


def _batch(cfg, b=2, ts=7, seed=0):
    r = np.random.RandomState(seed)
    src = np.full((b, ts), PAD, np.int32)
    lens = np.asarray([ts, ts - 2], np.int32)
    for i in range(b):
        src[i, :lens[i]] = r.randint(4, cfg.vocab_size, lens[i])
    dur = np.zeros((b, ts), np.int32)
    for i in range(b):
        dur[i, :lens[i]] = r.randint(1, 4, lens[i])
    tgt_lens = dur.sum(1).astype(np.int32)
    tt = int(tgt_lens.max())
    tgt = r.randn(b, tt, cfg.output_frame_dim).astype(np.float32)
    pitches = (r.rand(b, ts) * 300).astype(np.float32)
    energies = (r.rand(b, ts) * 3).astype(np.float32)
    return {
        "src_text": jnp.asarray(src), "src_text_len": jnp.asarray(lens),
        "durations": jnp.asarray(dur), "pitches": jnp.asarray(pitches),
        "energies": jnp.asarray(energies),
        "tgt_speech": jnp.asarray(tgt),
        "target_lengths": jnp.asarray(tgt_lens),
    }


def test_length_regulator_matches_loop_oracle():
    r = np.random.RandomState(1)
    b, t, c = 3, 5, 4
    x = r.randn(b, t, c).astype(np.float32)
    dur = r.randint(0, 4, size=(b, t)).astype(np.int32)
    max_out = int(dur.sum(1).max()) + 2
    out, lens = fs2.length_regulator(jnp.asarray(x), jnp.asarray(dur),
                                     max_out)
    # oracle: the reference's python expansion (fastspeech2.py:85-101)
    for bi in range(b):
        idx = []
        for ti in range(t):
            idx.extend([ti] * int(dur[bi, ti]))
        assert int(lens[bi]) == len(idx)
        np.testing.assert_allclose(np.asarray(out)[bi, :len(idx)],
                                   x[bi, idx], rtol=1e-6)


def test_forward_teacher_forced_shapes(cfg, variables):
    batch = _batch(cfg)
    tt = batch["tgt_speech"].shape[1]
    out = fs2.forward(variables, cfg, batch["src_text"],
                      batch["src_text_len"],
                      durations=batch["durations"],
                      pitches=batch["pitches"], energies=batch["energies"],
                      max_out_len=tt)
    assert out["feat_out"].shape == (2, tt, cfg.out_dim)
    assert out["post_feat_out"].shape == (2, tt, cfg.out_dim)
    assert out["log_dur_out"].shape == batch["src_text"].shape
    np.testing.assert_array_equal(np.asarray(out["out_lens"]),
                                  np.asarray(batch["target_lengths"]))
    assert out["ctc_logits"].shape == (2, tt, cfg.vocab_size)


def test_forward_free_running(cfg, variables):
    """Inference mode: durations predicted, output lengths model-driven."""
    batch = _batch(cfg, seed=3)
    out = fs2.forward(variables, cfg, batch["src_text"],
                      batch["src_text_len"], max_out_len=64)
    lens = np.asarray(out["out_lens"])
    assert (lens >= 0).all() and (lens <= 64).all()
    assert np.isfinite(np.asarray(out["feat_out"], np.float32)).all()
    # duration scaling changes predicted lengths monotonically
    out2 = fs2.forward(variables, cfg, batch["src_text"],
                       batch["src_text_len"], max_out_len=64, d_factor=2.0)
    assert np.asarray(out2["out_lens"]).sum() >= lens.sum()


def test_fastspeech2_loss_and_grads(cfg, variables):
    batch = _batch(cfg, seed=5)
    lcfg = LossConfig(ctc_weight=0.5)

    def lf(params):
        loss, extras = fastspeech2_loss(
            {"params": params, "stats": variables["stats"]}, cfg, lcfg,
            batch, rng=jax.random.PRNGKey(2), train=True)
        return loss, extras

    (loss, extras), grads = jax.value_and_grad(lf, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    logging = extras["logging"]
    for k in ("l1_loss", "dur_loss", "pitch_loss", "energy_loss",
              "ctc_loss"):
        assert np.isfinite(float(logging[k])), k
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0
    # every component must receive gradient (predictors + embeddings)
    for name in ("dur_pred", "pitch_pred", "energy_pred", "embed_pitch",
                 "embed_energy", "out_proj", "ctc_proj"):
        sub = sum(float(jnp.sum(jnp.abs(g))) for g in
                  jax.tree_util.tree_leaves(grads[name]))
        assert sub > 0.0, name


def test_arch_registered():
    import s2st_tpu.options  # noqa: F401 — registrations live there
    from s2st_tpu.registry import ARCH_REGISTRY
    assert "fastspeech2" in ARCH_REGISTRY


def test_forward_jits(cfg, variables):
    batch = _batch(cfg, seed=7)
    f = jax.jit(lambda v, s, l: fs2.forward(v, cfg, s, l, max_out_len=48))
    out = f(variables, batch["src_text"], batch["src_text_len"])
    assert out["feat_out"].shape[1] == 48


def test_fastspeech2_cli_train_and_generate(tmp_path):
    """Full FastSpeech2 path through the CLIs: tiny corpus with
    duration/pitch/energy manifest columns -> train 1 epoch -> NAR
    generate_waveform (duration-predictor lengths)."""
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.generate_waveform import main as gen_main
    from tests.make_tiny_corpus import make_tiny_corpus
    corpus = make_tiny_corpus(tmp_path / "corpus", variance_columns=True)
    save_dir = tmp_path / "ckpt"
    common = [
        str(corpus), "--config-yaml", "config.yaml",
        "--task", "s2s_translation", "--arch", "fastspeech2",
        "--output-frame-dim", "8", "--n-frames-per-step", "1",
        "--max-source-positions", "64", "--max-target-positions", "128",
        "--max-tokens", "2000", "--required-batch-size-multiple", "1",
    ]
    rc = train_main(common + [
        "--save-dir", str(save_dir),
        "--train-subset", "train", "--valid-subset", "dev",
        "--criterion", "fastspeech2",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--seed", "1", "--max-epoch", "1",
        "--log-interval", "1", "--disable-validation"])
    assert rc == 0
    assert (save_dir / "checkpoint_last.npz").exists()

    out_dir = tmp_path / "dump"
    rc = gen_main(common + [
        "--gen-subset", "test",
        "--path", str(save_dir / "checkpoint_last.npz"),
        "--max-iter", "64", "--spec-bwd-max-iter", "2",
        # 1-epoch duration predictor rounds to 0 frames; the serving floor
        # keeps the smoke deterministic
        "--min-duration", "2",
        "--dump-waveforms", "--dump-features",
        "--results-path", str(out_dir)])
    assert rc == 0
    feats = list((out_dir / "feat").glob("*_pred.npy"))
    assert feats, "no NAR features dumped"
