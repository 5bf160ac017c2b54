"""dummy_lm / dummy_mt / dummy_masked_lm synthetic benchmark tasks."""

import pytest


@pytest.mark.parametrize("task,arch,crit,extra", [
    ("dummy_lm", "transformer_lm", "cross_entropy",
     ["--tokens-per-sample", "32"]),
    ("dummy_mt", "transformer_tiny", "label_smoothed_cross_entropy",
     ["--src-length", "12", "--tgt-length", "12",
      "--label-smoothing", "0.1"]),
    ("dummy_masked_lm", "roberta", "masked_lm",
     ["--tokens-per-sample", "32"]),
])
def test_dummy_task_trains(tmp_path, task, arch, crit, extra):
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        "dummy", "--task", task, "--arch", arch, "--criterion", crit,
        "--dict-size", "64", "--dataset-size", "8",
        "--batch-size", "4", "--max-tokens", "512",
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--save-dir", str(tmp_path / "ckpt"),
        "--max-epoch", "1", "--disable-validation",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ] + extra) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1
