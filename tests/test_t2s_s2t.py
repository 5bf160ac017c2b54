"""T2S (text->spectrogram) and S2T (speech->text) model families + losses
(t2s_transformer.py / s2t_transformer(_hubert) / t2s_loss / s2t_loss
parity), incl. CLI training and encoder warm-start interop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import s2st_transformer as s2st
from s2st_tpu.models import s2t_transformer as s2t
from s2st_tpu.models import t2s_transformer as t2s
from s2st_tpu.train.losses import LossConfig, s2t_loss, t2s_loss
from tests.conftest import make_batch


@pytest.fixture(scope="module")
def base_cfg():
    return s2st.S2STConfig(
        src_vocab_size=20, tgt_vocab_size=24, input_feat_per_channel=8,
        conv_kernel_sizes=(5,), conv_channels=16, encoder_layers=1,
        encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_layers=1, decoder_embed_dim=16,
        decoder_ffn_embed_dim=32, decoder_attention_heads=2,
        output_frame_dim=8, prenet_layers=1, prenet_dim=8, postnet_layers=1,
        postnet_conv_dim=8, middle_layers=(), ctc=False, aux_asr=False,
        aux_st=False, max_source_positions=128, max_target_positions=64,
        dtype=jnp.float32)


def test_t2s_forward_and_loss(base_cfg):
    cfg = t2s.T2SConfig(base=base_cfg, encoder_conv_layers=2,
                        encoder_conv_kernel_size=5,
                        encoder_transformer_layers=1)
    variables = t2s.init_t2s(jax.random.PRNGKey(0), cfg)
    batch = make_batch(base_cfg, b=2, src_t=20, tgt_t=11, src_n=6)
    out = t2s.forward(variables, cfg, batch, deterministic=True)
    assert out["feat_out"].shape == (2, 11, 8)
    assert out["attn"].shape == (2, 11, 6)  # text positions

    loss, extras = t2s_loss(variables, cfg, LossConfig(
        use_guided_attention_loss=True), batch,
        rng=jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))
    # batch-norm stats updated for both conv prenet and postnet
    assert "encoder" in extras["new_stats"]
    assert "postnet" in extras["new_stats"]


def test_t2s_loss_decreases(base_cfg):
    import optax
    cfg = t2s.T2SConfig(base=base_cfg.replace(dropout=0.0),
                        encoder_conv_layers=1, encoder_transformer_layers=1,
                        encoder_dropout=0.0)
    variables = t2s.init_t2s(jax.random.PRNGKey(0), cfg)
    batch = make_batch(base_cfg, b=2, src_t=16, tgt_t=9, src_n=5)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    lcfg = LossConfig()

    @jax.jit
    def step(params, stats, opt_state):
        def lf(p):
            loss, extras = t2s_loss({"params": p, "stats": stats}, cfg, lcfg,
                                    batch, train=True)
            return loss, extras
        (loss, extras), g = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), \
            extras["new_stats"], opt_state, loss

    params, stats = variables["params"], variables["stats"]
    losses = []
    for _ in range(10):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_s2t_forward_and_loss(base_cfg):
    cfg = s2t.S2TConfig(base=base_cfg, decoder_layers=1,
                        decoder_embed_dim=16)
    variables = s2t.init_s2t(jax.random.PRNGKey(0), cfg,
                             vocab_size=base_cfg.tgt_vocab_size)
    batch = make_batch(base_cfg, b=2, src_t=21, tgt_t=9, tgt_n=7)
    out = s2t.forward(variables, cfg, batch, deterministic=True)
    assert out["logits"].shape == (2, 7, base_cfg.tgt_vocab_size)

    loss, extras = s2t_loss(variables, cfg, LossConfig(label_smoothing=0.1),
                            batch, train=True, test_type="st")
    assert np.isfinite(float(loss))
    assert float(extras["logging"]["total"]) > 0

    loss_asr, ex_asr = s2t_loss(variables, cfg, LossConfig(),
                                batch, train=True, test_type="asr")
    # asr targets come from src_text (possibly different vocab size is fine
    # here because vocab sizes are >= both test vocabs)
    assert np.isfinite(float(loss_asr))


def test_s2t_encoder_warm_starts_s2st(base_cfg, tmp_path):
    """S2T encoder params drop into the S2ST model (prompt-tuning recipe's
    --load-pretrained-encoder-from path)."""
    from s2st_tpu.train.checkpoint import (load_pretrained_component,
                                           save_checkpoint_file)
    from s2st_tpu.train.optim import adam
    from s2st_tpu.train.trainer import create_train_state
    cfg = s2t.S2TConfig(base=base_cfg)
    s2t_vars = s2t.init_s2t(jax.random.PRNGKey(7), cfg)
    state = create_train_state(
        {"params": s2t_vars["params"], "stats": s2t_vars["stats"]}, adam())
    p = str(tmp_path / "s2t.npz")
    save_checkpoint_file(p, state)

    s2st_vars = s2st.init_s2st(jax.random.PRNGKey(8), base_cfg)
    warm = load_pretrained_component(s2st_vars, p, "encoder")
    for a, b in zip(
            jax.tree_util.tree_leaves(warm["params"]["encoder"]),
            jax.tree_util.tree_leaves(s2t_vars["params"]["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_t2s_cli_training(tmp_path):
    from tests.make_tiny_corpus import make_tiny_corpus
    from s2st_tpu.cli.train import main as train_main
    corpus = make_tiny_corpus(tmp_path / "corpus")
    rc = train_main([
        str(corpus), "--save-dir", str(tmp_path / "ckpts"),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--task", "s2s_translation", "--criterion", "t2s_loss",
        "--arch", "t2s_transformer",
        "--encoder-conv-layers", "1", "--encoder-transformer-layers", "1",
        "--encoder-embed-dim", "16", "--encoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8", "--max-tokens", "2000",
        "--max-epoch", "1", "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--max-source-positions", "128", "--max-target-positions", "64",
        "--required-batch-size-multiple", "1", "--clip-norm", "1.0",
    ])
    assert rc == 0
    assert (tmp_path / "ckpts" / "checkpoint_last.npz").is_file()


def test_s2t_cli_training(tmp_path):
    from tests.make_tiny_corpus import make_tiny_corpus
    from s2st_tpu.cli.train import main as train_main
    corpus = make_tiny_corpus(tmp_path / "corpus")
    rc = train_main([
        str(corpus), "--save-dir", str(tmp_path / "ckpts"),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--task", "s2s_translation", "--criterion", "s2t_loss",
        "--arch", "s2t_transformer", "--test-type", "st",
        "--label-smoothing", "0.1",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "",
        "--output-frame-dim", "8", "--max-tokens", "2000",
        "--max-epoch", "1", "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--max-source-positions", "128", "--max-target-positions", "64",
        "--required-batch-size-multiple", "1", "--clip-norm", "1.0",
    ])
    assert rc == 0
    assert (tmp_path / "ckpts" / "checkpoint_last.npz").is_file()


def test_mtl_forward_loss_and_cli(tmp_path, base_cfg):
    """s2st_transformer_mtl: decoder middle-layer taps + src/tgt CTC
    (s2st_transformer_mtl.py:231-273, s2st_loss_mtl.py:154-183)."""
    from s2st_tpu.train.losses import s2st_loss
    cfg = base_cfg.replace(ctc=True, ctc_tgt=True, middle_layers=(0,),
                           middle_layers_decoder=(0,))
    variables = s2st.init_s2st(jax.random.PRNGKey(0), cfg)
    assert "ctc_proj_tgt" in variables["params"]["decoder"]
    batch = make_batch(cfg, b=2, src_t=41, tgt_t=21)
    out = s2st.forward(variables, cfg, batch, deterministic=True)
    assert "ctc_tgt_logits" in out
    assert out["ctc_tgt_logits"].shape == (2, 21, cfg.tgt_vocab_size)
    lcfg = LossConfig(ctc_weight=0.3, ctc_weight_tgt=0.3)
    loss, extras = s2st_loss(variables, cfg, lcfg, batch, train=False)
    assert np.isfinite(float(loss))
    assert float(extras["logging"]["ctc_loss_tgt"]) > 0

    # CLI smoke via the mtl task + arch
    from tests.make_tiny_corpus import make_tiny_corpus
    from s2st_tpu.cli.train import main as train_main
    corpus = make_tiny_corpus(tmp_path / "corpus")
    rc = train_main([
        str(corpus), "--save-dir", str(tmp_path / "ckpts"),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--task", "s2s_translation_mtl", "--criterion", "s2st_loss_mtl",
        "--arch", "s2st_transformer_mtl",
        "--ctc-weight", "0.3", "--ctc-weight-tgt", "0.3",
        "--middle-layers", "0", "--middle-layers-decoder", "0",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8", "--max-tokens", "2000",
        "--max-epoch", "1", "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--max-source-positions", "128", "--max-target-positions", "64",
        "--required-batch-size-multiple", "1", "--clip-norm", "1.0",
    ])
    assert rc == 0


def test_ema_training(tmp_path):
    """--store-ema maintains an EMA param copy saved as
    checkpoint_last_ema.npz (fairseq EMA parity)."""
    from tests.make_tiny_corpus import make_tiny_corpus
    from s2st_tpu.cli.train import main as train_main
    corpus = make_tiny_corpus(tmp_path / "corpus")
    save = tmp_path / "ckpts"
    rc = train_main([
        str(corpus), "--save-dir", str(save),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--arch", "s2st_transformer",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8", "--max-tokens", "2000",
        "--max-epoch", "1", "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--required-batch-size-multiple", "1",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--store-ema", "--ema-decay", "0.9",
    ])
    assert rc == 0
    import numpy as np
    assert (save / "checkpoint_last_ema.npz").is_file()
    with np.load(save / "checkpoint_last_ema.npz") as z:
        assert len(z.files) > 10


def test_ema_step_math():
    import jax
    import jax.numpy as jnp
    from s2st_tpu.train.ema import EMAConfig, ema_step, init_ema
    cfg = EMAConfig(ema_decay=0.5, ema_start_update=2)
    params = {"w": jnp.ones((3,))}
    ema = init_ema(params)
    # before start_update: EMA tracks raw params exactly
    new = {"w": jnp.full((3,), 5.0)}
    ema = ema_step(cfg, ema, new, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(ema["w"]), 5.0)
    # after: lerp with decay
    newer = {"w": jnp.full((3,), 9.0)}
    ema = ema_step(cfg, ema, newer, jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(ema["w"]), 7.0)


def test_heartbeat_and_nonfinite_report():
    import time
    from s2st_tpu.utils.diagnostics import (HeartbeatWatchdog,
                                            report_nonfinite)
    wd = HeartbeatWatchdog(timeout=-1).start()  # disabled
    wd.beat(); wd.stop()
    rep = report_nonfinite(params={"a": np.array([1.0, np.nan]),
                                   "b": np.ones(3)})
    assert "a" in rep and "1/2" in rep
    assert "b" not in rep


def test_t2s_generate_waveform_cli(tmp_path):
    """Pseudo-label TTS generation: train t2s, synthesize waveforms from
    TEXT input via generate_waveform (the reference's input-text mode)."""
    from tests.make_tiny_corpus import make_tiny_corpus
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.generate_waveform import main as gen_main
    corpus = make_tiny_corpus(tmp_path / "corpus")
    save = tmp_path / "ckpts"
    common_model = [
        "--arch", "t2s_transformer",
        "--encoder-conv-layers", "1", "--encoder-transformer-layers", "1",
        "--encoder-embed-dim", "16", "--encoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-source-positions", "128", "--max-target-positions", "64",
        "--required-batch-size-multiple", "1",
    ]
    rc = train_main([
        str(corpus), "--save-dir", str(save), "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--criterion", "t2s_loss", *common_model,
        "--max-tokens", "2000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0"])
    assert rc == 0
    results = tmp_path / "dump"
    rc = gen_main([
        str(corpus), "--config-yaml", "config.yaml", "--gen-subset", "test",
        "--path", str(save / "checkpoint_last.npz"), *common_model,
        "--max-tokens", "2000", "--max-iter", "8", "--spec-bwd-max-iter", "2",
        "--dump-waveforms", "--results-path", str(results)])
    assert rc == 0
    assert len(list((results / "wav").glob("*_pred.wav"))) == 4
