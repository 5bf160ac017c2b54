"""End-to-end CLI tests on a tiny synthetic corpus — the analogue of the
reference's tests/test_binaries.py (preprocess -> train -> generate in tmp
dirs on tiny random data)."""

import sys
from pathlib import Path

import numpy as np
import pytest

from tests.make_tiny_corpus import make_tiny_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_corpus")
    return make_tiny_corpus(root)


def _train_args(corpus, save_dir, extra=()):
    return [
        str(corpus), "--save-dir", str(save_dir),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--task", "s2s_translation", "--criterion", "s2st_loss",
        "--arch", "s2st_transformer",
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "2", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-tokens", "2000", "--max-epoch", "2",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--n-frames-per-step", "1",
        "--bce-pos-weight", "5.0", "--seed", "1",
        "--encoder-normalize-before", "--decoder-normalize-before",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1",
        "--log-interval", "1",
        *extra,
    ]


def test_train_and_resume(corpus, tmp_path):
    from s2st_tpu.cli.train import main as train_main
    save_dir = tmp_path / "ckpts"
    rc = train_main(_train_args(corpus, save_dir))
    assert rc == 0
    assert (save_dir / "checkpoint_last.npz").is_file()
    assert (save_dir / "checkpoint1.npz").is_file()
    assert (save_dir / "checkpoint2.npz").is_file()
    # resume: raise max epoch, training continues from epoch 3 — with the
    # worker-pool collate path enabled end-to-end (--num-workers)
    rc = train_main(_train_args(corpus, save_dir)
                    + ["--max-epoch", "3", "--num-workers", "4"])
    assert rc == 0
    assert (save_dir / "checkpoint3.npz").is_file()


def test_train_with_aux_losses(corpus, tmp_path):
    from s2st_tpu.cli.train import main as train_main
    save_dir = tmp_path / "ckpts_aux"
    rc = train_main(_train_args(
        corpus, save_dir,
        extra=["--ctc-weight", "0.5", "--asr-ce-weight", "0.3",
               "--st-ce-weight", "0.3", "--label-smoothing", "0.1",
               "--asr-decoder-layers", "1", "--asr-decoder-embed-dim", "16",
               "--st-decoder-layers", "1", "--st-decoder-embed-dim", "16",
               "--use-guided-attention-loss", "--report-accuracy",
               "--middle-layers", "0,1", "--max-epoch", "1"]))
    assert rc == 0
    assert (save_dir / "checkpoint_last.npz").is_file()


def test_eval_inference_mcd(corpus, tmp_path):
    from s2st_tpu.cli.train import main as train_main
    save_dir = tmp_path / "ckpts_mcd"
    rc = train_main(_train_args(
        corpus, save_dir,
        extra=["--eval-inference", "--best-checkpoint-metric", "mcd_loss",
               "--spec-bwd-max-iter", "2", "--max-epoch", "1"]))
    assert rc == 0
    assert (save_dir / "checkpoint_best.npz").is_file()


def test_generate_waveform(corpus, tmp_path):
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.generate_waveform import main as gen_main
    save_dir = tmp_path / "ckpts_gen"
    rc = train_main(_train_args(corpus, save_dir) + ["--max-epoch", "1"])
    assert rc == 0

    results = tmp_path / "dump"
    rc = gen_main([
        str(corpus), "--config-yaml", "config.yaml",
        "--gen-subset", "test", "--task", "s2s_translation",
        "--path", str(save_dir / "checkpoint_last.npz"),
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "2", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-tokens", "2000", "--max-iter", "16",
        "--n-frames-per-step", "1",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1",
        "--spec-bwd-max-iter", "2",
        # a 1-epoch tiny model may emit EOS at the very first step, whose
        # Griffin-Lim inverse is 0 samples — force full-length decode so
        # the PCM assertion is deterministic
        "--eos-prob-threshold", "1.5",
        "--dump-waveforms", "--dump-features", "--dump-attentions",
        "--dump-eos-probs", "--dump-target",
        "--results-path", str(results),
    ])
    assert rc == 0
    wavs = list((results / "wav").glob("*_pred.wav"))
    assert len(wavs) == 4  # n_test utterances
    feats = list((results / "feat").glob("*_pred.npy"))
    assert len(feats) == 4
    assert len(list((results / "attn").glob("*.npy"))) == 4
    # wav files are valid PCM
    from s2st_tpu.data.audio_utils import read_wav
    wave, sr = read_wav(str(wavs[0]))
    assert sr == 16000 and len(wave) > 0
    assert np.all(np.isfinite(wave))


def test_average_checkpoints_cli(corpus, tmp_path):
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.average_checkpoints import main as avg_main
    save_dir = tmp_path / "ckpts_avg"
    rc = train_main(_train_args(corpus, save_dir))  # 2 epochs
    assert rc == 0
    out = str(tmp_path / "avg.npz")
    rc = avg_main(["--inputs", str(save_dir),
                   "--num-epoch-checkpoints", "2", "--output", out])
    assert rc == 0
    assert Path(out).is_file()


def test_generate_for_s2st_text_decode(corpus, tmp_path):
    """Train with aux decoders then beam-decode ASR (wer) and ST (sacrebleu)
    text — generate_for_s2st parity (stages 10-11 of run_baseline.sh)."""
    import contextlib
    import io
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.generate_for_s2st import main as g4s_main
    save_dir = tmp_path / "ckpts_g4s"
    rc = train_main(_train_args(
        corpus, save_dir,
        extra=["--asr-ce-weight", "0.3", "--st-ce-weight", "0.3",
               "--label-smoothing", "0.1",
               "--asr-decoder-layers", "1", "--asr-decoder-embed-dim", "16",
               "--st-decoder-layers", "1", "--st-decoder-embed-dim", "16",
               "--middle-layers", "0,1", "--max-epoch", "1"]))
    assert rc == 0

    common = [
        str(corpus), "--config-yaml", "config.yaml",
        "--gen-subset", "test", "--task", "s2s_translation",
        "--path", str(save_dir / "checkpoint_last.npz"),
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "2", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0,1",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--asr-decoder-layers", "1", "--asr-decoder-embed-dim", "16",
        "--st-decoder-layers", "1", "--st-decoder-embed-dim", "16",
        "--max-tokens", "2000", "--beam", "2",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1",
    ]
    for scoring, marker in (("wer", "WER"), ("sacrebleu", "BLEU")):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = g4s_main(common + ["--scoring", scoring] +
                          (["--wer-lowercase"] if scoring == "wer" else []))
        out = buf.getvalue()
        assert rc == 0
        assert out.count("H-") >= 4  # one hypothesis line per test utt
        assert marker in out.splitlines()[-1] or marker in out


def test_validate_and_score_clis(corpus, tmp_path, capsys):
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.validate import main as validate_main
    from s2st_tpu.cli.score import main as score_main
    save_dir = tmp_path / "ckpts_val"
    rc = train_main(_train_args(corpus, save_dir) + ["--max-epoch", "1"])
    assert rc == 0
    rc = validate_main(_train_args(corpus, save_dir) + [
        "--path", str(save_dir / "checkpoint_last.npz"),
        "--valid-subset", "dev"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "dev | loss" in out

    sysf = tmp_path / "sys.txt"
    reff = tmp_path / "ref.txt"
    sysf.write_text("hello world\nfoo bar baz qux\n")
    reff.write_text("hello world\nfoo bar baz qux\n")
    rc = score_main(["--sys", str(sysf), "--ref", str(reff),
                     "--scoring", "wer"])
    out = capsys.readouterr().out
    assert rc == 0 and "WER: 0.00" in out


def test_tensorboard_panels(corpus, tmp_path):
    """--tensorboard-logdir + --eval-inference writes scalar, audio,
    spectrogram and attention events (task tensorboard logging parity)."""
    pytest.importorskip("torch.utils.tensorboard")
    from s2st_tpu.cli.train import main as train_main
    tb_dir = tmp_path / "tb"
    rc = train_main(_train_args(
        corpus, tmp_path / "ckpts_tb",
        extra=["--eval-inference", "--best-checkpoint-metric", "mcd_loss",
               "--spec-bwd-max-iter", "2", "--max-epoch", "1",
               "--tensorboard-logdir", str(tb_dir)]))
    assert rc == 0
    events = list(tb_dir.glob("events.*"))
    assert events, "no tensorboard event files written"
    # the audio/image panels make events files much larger than scalars only
    assert sum(e.stat().st_size for e in events) > 5000


def test_generate_for_s2st_strategies(corpus, tmp_path):
    """New generation flags end-to-end: --sampling/--sampling-topk, --nbest,
    and --score-reference (SequenceScorer P- lines) through the CLI."""
    import contextlib
    import io
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.generate_for_s2st import main as g4s_main
    save_dir = tmp_path / "ckpts_strat"
    rc = train_main(_train_args(
        corpus, save_dir,
        extra=["--asr-ce-weight", "0.3", "--st-ce-weight", "0.3",
               "--label-smoothing", "0.1",
               "--asr-decoder-layers", "1", "--asr-decoder-embed-dim", "16",
               "--st-decoder-layers", "1", "--st-decoder-embed-dim", "16",
               "--middle-layers", "0,1", "--max-epoch", "1"]))
    assert rc == 0

    common = [
        str(corpus), "--config-yaml", "config.yaml",
        "--gen-subset", "test", "--task", "s2s_translation",
        "--path", str(save_dir / "checkpoint_last.npz"),
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "2", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0,1",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--asr-decoder-layers", "1", "--asr-decoder-embed-dim", "16",
        "--st-decoder-layers", "1", "--st-decoder-embed-dim", "16",
        "--max-tokens", "2000",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1", "--scoring", "wer",
        "--wer-lowercase",
    ]
    # sampling with top-k truncation + nbest output
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = g4s_main(common + ["--beam", "2", "--sampling",
                                "--sampling-topk", "8", "--nbest", "2"])
    out = buf.getvalue()
    assert rc == 0
    assert out.count("H-") >= 8  # 2 hypotheses per test utterance
    # score-reference: P- positional-score lines, H- is the reference itself
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = g4s_main(common + ["--beam", "1", "--score-reference"])
    out = buf.getvalue()
    assert rc == 0
    p_lines = [ln for ln in out.splitlines() if ln.startswith("P-")]
    assert len(p_lines) >= 4
    assert all(float(x) <= 0.0 for x in p_lines[0].split("\t")[1].split())


def test_train_with_tqdm_progress(corpus, tmp_path):
    """--log-format tqdm drives the interactive bar path through a real
    epoch loop (reference TqdmProgressBar, progress_bar.py:100-130)."""
    from s2st_tpu.cli.train import main as train_main
    save_dir = tmp_path / "ckpts_tqdm"
    rc = train_main(_train_args(corpus, save_dir,
                                extra=("--log-format", "tqdm")))
    assert rc == 0
    assert (save_dir / "checkpoint2.npz").is_file()
