"""Mid-epoch checkpoint/resume + restore-semantics tests.

Reference analogue: tests/test_reproducibility.py (resume reproduces the
uninterrupted run) + fairseq_cli/train.py:336-403 (--save-interval-updates)
+ checkpoint_utils.load_checkpoint:190-278 (--restore-file / reset flags).
"""

import json
import re

import numpy as np
import pytest

from tests.make_tiny_corpus import make_tiny_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_corpus_mid")
    return make_tiny_corpus(root)


def _args(corpus, save_dir, extra=()):
    # --batch-size 3 over 12 train items -> 4 batches per epoch, so
    # mid-epoch states are actually mid-epoch
    return [
        str(corpus), "--save-dir", str(save_dir),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--task", "s2s_translation", "--criterion", "s2st_loss",
        "--arch", "s2st_transformer",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-tokens", "2000", "--batch-size", "3",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--n-frames-per-step", "1",
        "--bce-pos-weight", "5.0", "--seed", "1",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1",
        "--log-interval", "1", "--disable-validation",
        *extra,
    ]


def _params(path):
    with np.load(str(path)) as z:
        return {k: z[k].copy() for k in z.files if k.startswith("params::")}


def _meta(path):
    with np.load(str(path)) as z:
        return json.loads(bytes(z["__meta__"].tobytes()).decode())


def test_midepoch_resume_reproduces_uninterrupted_run(corpus, tmp_path):
    """Kill training mid-epoch, resume, and land on bit-identical params
    vs the same run done uninterrupted (exact iterator fast-forward)."""
    from s2st_tpu.cli.train import main as train_main

    # uninterrupted run: 2 epochs = 8 updates
    dir_a = tmp_path / "uninterrupted"
    assert train_main(_args(corpus, dir_a, ["--max-epoch", "2"])) == 0
    meta_a = _meta(dir_a / "checkpoint_last.npz")
    total_updates = meta_a["step"]
    assert total_updates == 8, f"expected 4 batches/epoch, got {meta_a}"

    # interrupted run: stop mid-epoch-2 (update 6 of 8), then resume
    dir_b = tmp_path / "interrupted"
    assert train_main(_args(corpus, dir_b, [
        "--max-epoch", "2", "--max-update", "6",
        "--save-interval-updates", "1", "--keep-interval-updates", "2",
    ])) == 0
    meta_b = _meta(dir_b / "checkpoint_last.npz")
    assert meta_b["step"] == 6
    assert meta_b["iterator"]["epoch"] == 2
    assert meta_b["iterator"]["iterations_in_epoch"] == 2
    # keep-interval-updates GC kept only the last 2 update checkpoints
    kept = sorted(p.name for p in dir_b.glob("checkpoint_*_*.npz"))
    assert kept == ["checkpoint_2_5.npz", "checkpoint_2_6.npz"]

    assert train_main(_args(corpus, dir_b, ["--max-epoch", "2"])) == 0
    meta_b2 = _meta(dir_b / "checkpoint_last.npz")
    assert meta_b2["step"] == total_updates

    pa = _params(dir_a / "checkpoint_last.npz")
    pb = _params(dir_b / "checkpoint_last.npz")
    assert set(pa) == set(pb)
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)


def test_reset_optimizer_still_loads_model_weights(corpus, tmp_path):
    """--reset-optimizer must reset ONLY the optimizer state — fairseq still
    loads the model (trainer.py:440-530). lr=0 makes the follow-up update a
    no-op so the params must equal the first run's exactly."""
    from s2st_tpu.cli.train import main as train_main
    save_dir = tmp_path / "reset_opt"
    assert train_main(_args(corpus, save_dir, ["--max-epoch", "1"])) == 0
    before = _params(save_dir / "checkpoint_last.npz")
    assert _meta(save_dir / "checkpoint_last.npz")["step"] == 4

    assert train_main(_args(corpus, save_dir, [
        "--max-epoch", "1", "--reset-optimizer", "--lr", "0.0",
        "--warmup-updates", "0"])) == 0
    meta = _meta(save_dir / "checkpoint_last.npz")
    assert meta["step"] == 4  # optimizer step restarted from 0
    after = _params(save_dir / "checkpoint_last.npz")
    for k in before:
        np.testing.assert_array_equal(before[k], after[k], err_msg=k)


def test_restore_file_flag(corpus, tmp_path):
    """--restore-file picks an explicit checkpoint instead of
    checkpoint_last (options.py:171 was parsed-and-ignored in round 1)."""
    from s2st_tpu.cli.train import main as train_main
    save_dir = tmp_path / "restore_file"
    assert train_main(_args(corpus, save_dir, ["--max-epoch", "2"])) == 0
    # resume FROM checkpoint1 (epoch 1, step 4), not checkpoint_last (step 8)
    assert train_main(_args(corpus, save_dir, [
        "--max-epoch", "3", "--restore-file", "checkpoint1.npz"])) == 0
    meta = _meta(save_dir / "checkpoint_last.npz")
    # restarted after epoch 1: epochs 2,3 retrained -> 4 + 8 updates
    assert meta["step"] == 12


def test_plateau_state_survives_resume(corpus, tmp_path):
    """lr_scale (plateau shrink), best_val and patience are checkpointed and
    restored (fairseq persists scheduler state + `best`)."""
    from s2st_tpu.cli.train import main as train_main
    save_dir = tmp_path / "plateau"
    args = _args(corpus, save_dir, [
        "--max-epoch", "2", "--lr-scheduler", "reduce_lr_on_plateau",
        "--lr-shrink", "0.5", "--patience", "10"])
    args.remove("--disable-validation")
    assert train_main(args) == 0
    meta = _meta(save_dir / "checkpoint_last.npz")
    assert "lr_scale" in meta and "best_val" in meta \
        and "patience_left" in meta
    saved_scale = meta["lr_scale"]
    # resume one more epoch; the run must start from the saved lr_scale
    args2 = _args(corpus, save_dir, [
        "--max-epoch", "3", "--lr-scheduler", "reduce_lr_on_plateau",
        "--lr-shrink", "0.5", "--patience", "10"])
    args2.remove("--disable-validation")
    assert train_main(args2) == 0
    meta2 = _meta(save_dir / "checkpoint_last.npz")
    # lr_scale can only shrink further (or stay) — never reset to 1.0
    assert meta2["lr_scale"] <= saved_scale + 1e-12


def test_manual_lr_scheduler_cli(corpus, tmp_path):
    """--lr-scheduler manual with --epoch2lr/--update2lr drives the actual
    lr used by the compiled step (advisor round-1 finding: it silently
    degenerated to a constant)."""
    from s2st_tpu.cli.train import main as train_main
    save_dir = tmp_path / "manual_lr"
    log_file = tmp_path / "train.log"
    assert train_main(_args(corpus, save_dir, [
        "--max-epoch", "1", "--lr", "0.002",
        "--lr-scheduler", "manual",
        "--epoch2lr", '{"1": 0.01}',
        "--update2lr", '{"2": 0.0005, "3-4": 0.0004}',
        "--log-format", "json", "--log-file", str(log_file)])) == 0
    lrs = []
    for line in log_file.read_text().splitlines():
        mt = re.search(r'\{.*"train_inner_lr".*\}', line)
        if mt:
            lrs.append(json.loads(mt.group(0))["train_inner_lr"])
    # update k uses manual_lr(epoch=1, num_updates=k-1):
    #   u1: update2lr has no key <= 0 -> epoch2lr[1] = 0.01
    #   u2: no key <= 1 -> 0.01 ; u3: key 2 -> 5e-4 ; u4: key 3 -> 4e-4
    assert lrs == pytest.approx([0.01, 0.01, 0.0005, 0.0004], rel=1e-3)


def test_ema_restored_on_resume(corpus, tmp_path):
    """checkpoint_last_ema.npz is reloaded on resume instead of re-seeding
    the EMA from the current params (round-1 gap)."""
    from s2st_tpu.cli.train import main as train_main
    dir_a = tmp_path / "ema_straight"
    dir_b = tmp_path / "ema_resumed"
    ema = ["--store-ema", "--ema-decay", "0.5"]
    assert train_main(_args(corpus, dir_a, ["--max-epoch", "2"] + ema)) == 0
    assert train_main(_args(corpus, dir_b, ["--max-epoch", "1"] + ema)) == 0
    assert train_main(_args(corpus, dir_b, ["--max-epoch", "2"] + ema)) == 0
    with np.load(str(dir_a / "checkpoint_last_ema.npz")) as z:
        ea = {k: z[k].copy() for k in z.files}
    with np.load(str(dir_b / "checkpoint_last_ema.npz")) as z:
        eb = {k: z[k].copy() for k in z.files}
    for k in ea:
        np.testing.assert_allclose(ea[k], eb[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_ema_checkpoint_is_evaluable(corpus, tmp_path):
    """The EMA file is a complete eval checkpoint: params + stats, loadable
    by generate_waveform --path (fairseq evaluate-with-EMA-weights parity,
    fairseq/trainer.py:380-424)."""
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.generate_waveform import main as gw_main
    save_dir = tmp_path / "ema_eval"
    assert train_main(_args(corpus, save_dir,
                            ["--max-epoch", "1", "--store-ema",
                             "--ema-decay", "0.9"])) == 0
    ema_path = save_dir / "checkpoint_last_ema.npz"
    with np.load(str(ema_path)) as z:
        keys = list(z.files)
    assert any(k.startswith("params::") for k in keys)
    assert any(k.startswith("stats::") for k in keys)
    out_dir = tmp_path / "ema_dump"
    rc = gw_main([
        str(corpus), "--config-yaml", "config.yaml",
        "--gen-subset", "test", "--task", "s2s_translation",
        "--path", str(ema_path),
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8", "--n-frames-per-step", "1",
        "--max-tokens", "2000", "--max-iter", "8",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1",
        "--spec-bwd-max-iter", "2", "--dump-waveforms",
        "--results-path", str(out_dir)])
    assert rc == 0
    assert list((out_dir / "wav").glob("*_pred.wav"))
