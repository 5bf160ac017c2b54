"""semisupervised_translation: parallel CE + in-graph on-the-fly
back-translation + tgt-tgt denoising, with lambda schedules."""

import numpy as np
import pytest


def test_parse_lambda_config():
    from s2st_tpu.tasks.semisupervised_translation import (lambda_value,
                                                           parse_lambda_config)
    v, sched = parse_lambda_config("0.5")
    assert v == 0.5 and sched is None
    v, sched = parse_lambda_config("0:1,100:0.1")
    assert v == 1.0
    assert abs(lambda_value(v, sched, 0) - 1.0) < 1e-6
    assert abs(lambda_value(v, sched, 50) - 0.55) < 1e-6
    assert abs(lambda_value(v, sched, 100) - 0.1) < 1e-6
    assert abs(lambda_value(v, sched, 500) - 0.1) < 1e-6


def test_noising_dataset_semantics():
    """Noised source keeps >= 1 word, blanks to UNK, preserves the EOS;
    deterministic per (seed, index)."""
    from s2st_tpu.tasks.semisupervised_translation import NoisingDataset

    rows = [np.asarray([5, 6, 7, 8, 2]), np.asarray([9, 2])]
    ds = NoisingDataset(rows, [5, 2], seed=3, max_shuffle=3.0,
                        dropout=0.5, blank=0.5)
    a1, a2 = ds[0], ds[0]
    np.testing.assert_array_equal(a1.source, a2.source)
    for i in range(2):
        it = ds[i]
        assert it.source[-1] == 2
        assert len(it.source) >= 2
        np.testing.assert_array_equal(it.target, rows[i])


def test_semisupervised_cli_e2e(tmp_path):
    """2 directions + tgt monolingual -> parallel + BT + denoising
    streams through the train CLI; updates applied."""
    r = np.random.RandomState(0)
    words = [f"w{i}" for i in range(14)]
    pairs = ["de-en", "en-de"]
    for pair in pairs:
        src, tgt = pair.split("-")
        for split, n in (("train", 16), ("valid", 8)):
            for lang in (src, tgt):
                with open(tmp_path / f"{split}.{pair}.{lang}", "w") as f:
                    for _ in range(n):
                        f.write(" ".join(
                            r.choice(words, size=r.randint(3, 7))) + "\n")
    # monolingual per language
    for lang in ("de", "en"):
        with open(tmp_path / f"train.mono.{lang}", "w") as f:
            for _ in range(16):
                f.write(" ".join(
                    r.choice(words, size=r.randint(3, 7))) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--source-lang", "de", "--target-lang", "en",
               "--trainpref", str(tmp_path / "train.de-en"),
               "--validpref", str(tmp_path / "valid.de-en"),
               "--joined-dictionary",
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    assert pp(["--source-lang", "en", "--target-lang", "de",
               "--trainpref", str(tmp_path / "train.en-de"),
               "--validpref", str(tmp_path / "valid.en-de"),
               "--srcdict", str(tmp_path / "bin" / "dict.en.txt"),
               "--tgtdict", str(tmp_path / "bin" / "dict.de.txt"),
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    for lang in ("de", "en"):
        assert pp(["--only-source",
                   "--trainpref", str(tmp_path / f"train.mono.{lang}"),
                   "--srcdict", str(tmp_path / "bin" / f"dict.{lang}.txt"),
                   "--destdir", str(tmp_path / f"mono.{lang}"),
                   "--workers", "1"]) == 0
        import shutil
        for ext in ("bin", "idx"):
            shutil.copy(str(tmp_path / f"mono.{lang}" / f"train.{ext}"),
                        str(tmp_path / "bin" / f"train.{lang}.{ext}"))
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(tmp_path / "bin"), "--task", "semisupervised_translation",
        "--arch", "multilingual_transformer",
        "--lang-pairs", "de-en,en-de",
        "--lambda-parallel-config", "1.0",
        "--lambda-otf-bt-config", "0.5",
        "--lambda-denoising-config", "0:1,100:0.1",
        "--bt-beam-size", "1", "--bt-max-len-a", "1.2",
        "--bt-max-len-b", "4",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--max-tokens", "256", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    tree, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1
    # the tgt-tgt denoising decoders exist in the trained tree
    assert any("decoders::en" in k for k in tree), \
        [k for k in tree if k.startswith("params::decoders")][:5]
