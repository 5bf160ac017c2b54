"""multilingual_denoising (mBART) + multilingual_masked_lm tasks:
per-language corpora with temperature resampling; mBART blocks end with
[lang] tokens when --add-lang-token. CLI e2e for both."""

import os
import random
import shutil

import numpy as np
import pytest


def _build_corpus(tmp_path, langs=("en", "fr")):
    random.seed(0)
    d = str(tmp_path)
    with open(f"{d}/all.txt", "w") as fa:
        for lang in langs:
            for split, n in (("train", 50), ("valid", 8)):
                with open(f"{d}/{split}.{lang}.txt", "w") as f:
                    for _ in range(n):
                        line = " ".join(f"{lang}{random.randrange(10)}"
                                        for _ in range(random.randint(3, 8)))
                        f.write(line + "\n")
                        if split == "train":
                            fa.write(line + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--only-source", "--trainpref", f"{d}/all.txt",
               "--destdir", f"{d}/dictdir", "--dict-only",
               "--workers", "1"]) == 0
    os.makedirs(f"{d}/bin", exist_ok=True)
    shutil.copy(f"{d}/dictdir/dict.txt", f"{d}/bin/dict.txt")
    for lang in langs:
        os.makedirs(f"{d}/bin/{lang}", exist_ok=True)
        assert pp(["--only-source",
                   "--trainpref", f"{d}/train.{lang}.txt",
                   "--validpref", f"{d}/valid.{lang}.txt",
                   "--srcdict", f"{d}/bin/dict.txt",
                   "--destdir", f"{d}/bin/{lang}", "--workers", "1"]) == 0
    return f"{d}/bin"


def test_mbart_lang_token_blocks(tmp_path):
    bin_dir = _build_corpus(tmp_path)
    from s2st_tpu.options import _two_pass, get_training_parser
    args = _two_pass(get_training_parser(), [
        bin_dir, "--task", "multilingual_denoising", "--arch", "mbart_large",
        "--criterion", "cross_entropy", "--add-lang-token",
        "--langs", "en,fr", "--tokens-per-sample", "32",
        "--multilang-sampling-alpha", "0.5"])
    from s2st_tpu.registry import get_task, populate_builtin
    populate_builtin()
    task = get_task("multilingual_denoising").setup_task(args)
    en_tok = task.dictionary.index("[en]")
    fr_tok = task.dictionary.index("[fr]")
    assert en_tok != task.dictionary.unk() and fr_tok != en_tok
    ds = task.load_dataset("train")
    seen = set()
    for i in range(0, len(ds), max(len(ds) // 16, 1)):
        it = ds[i]
        assert it.source[-1] in (en_tok, fr_tok)
        assert it.target[-1] in (en_tok, fr_tok)
        seen.add(int(it.target[-1]))
    assert seen == {en_tok, fr_tok}   # both languages sampled


def test_multilingual_denoising_cli_e2e(tmp_path):
    bin_dir = _build_corpus(tmp_path)
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "multilingual_denoising",
        "--arch", "bart_base", "--criterion", "cross_entropy",
        "--langs", "en,fr", "--add-lang-token",
        "--tokens-per-sample", "32", "--sample-break-mode", "complete",
        "--mask", "0.3", "--rotate", "0.0", "--permute-sentences", "0.0",
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--save-dir", str(tmp_path / "ckpt"),
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1


def test_multilingual_masked_lm_cli_e2e(tmp_path):
    bin_dir = _build_corpus(tmp_path)
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "multilingual_masked_lm",
        "--arch", "roberta", "--criterion", "masked_lm",
        "--langs", "en,fr",
        "--tokens-per-sample", "32", "--sample-break-mode", "complete",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--save-dir", str(tmp_path / "ckpt"),
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1
