"""translation_multi_simple_epoch: lang-token datasets, temperature
upsampling, and an end-to-end two-pair train + per-pair generate run.
"""

import random

import numpy as np
import pytest


def _make_pair_corpus(d, src, tgt, n_train, seed):
    random.seed(seed)
    for split, n in (("train", n_train), ("valid", 8), ("test", 6)):
        with open(f"{d}/{split}.{src}", "w") as fs, \
                open(f"{d}/{split}.{tgt}", "w") as ft:
            for _ in range(n):
                L = random.randint(3, 6)
                idx = [random.randrange(8) for _ in range(L)]
                fs.write(" ".join(f"{src}{i}" for i in idx) + "\n")
                ft.write(" ".join(f"{tgt}{i}" for i in reversed(idx))
                         + "\n")


def _binarize_two_pairs(tmp_path):
    import os
    d = str(tmp_path)
    # per-pair raw dirs (both pairs share the 'en' filename otherwise)
    os.makedirs(f"{d}/aa-en", exist_ok=True)
    os.makedirs(f"{d}/bb-en", exist_ok=True)
    _make_pair_corpus(f"{d}/aa-en", "aa", "en", 60, 0)
    _make_pair_corpus(f"{d}/bb-en", "bb", "en", 20, 1)
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    # build one joint dictionary over all three languages
    with open(f"{d}/all.txt", "w") as f:
        for pair, src in (("aa-en", "aa"), ("bb-en", "bb")):
            f.write(open(f"{d}/{pair}/train.{src}").read())
            f.write(open(f"{d}/{pair}/train.en").read())
    pp(["--only-source", "--trainpref", f"{d}/all.txt",
        "--destdir", f"{d}/dictdir", "--workers", "1"])
    joint = f"{d}/dictdir/dict.txt"
    for pair, src in (("aa-en", "aa"), ("bb-en", "bb")):
        pp(["--source-lang", src, "--target-lang", "en",
            "--srcdict", joint, "--tgtdict", joint,
            "--trainpref", f"{d}/{pair}/train",
            "--validpref", f"{d}/{pair}/valid",
            "--testpref", f"{d}/{pair}/test", "--destdir", bin_dir,
            "--workers", "1"])
    import shutil
    shutil.copy(joint, f"{bin_dir}/dict.txt")
    return bin_dir


def test_langtok_dataset_and_ratios(tmp_path):
    bin_dir = _binarize_two_pairs(tmp_path)
    from s2st_tpu.options import parse_training_args
    args = parse_training_args([
        bin_dir, "--task", "translation_multi_simple_epoch",
        "--arch", "transformer_tiny",
        "--lang-pairs", "aa-en,bb-en", "--encoder-langtok", "tgt",
        "--decoder-langtok", "--sampling-temperature", "2.0"])
    from s2st_tpu.registry import get_task
    task = get_task(args.task).setup_task(args)
    ds = task.load_dataset("train")
    # lang tokens present in the dictionaries
    for lg in ("aa", "bb", "en"):
        assert task.src_dict.index(f"__{lg}__") > 3
    # temperature 2.0 upsamples the smaller pair more
    assert len(ds) > 80   # 60 + 20 plus upsampling
    it = ds[0]
    # encoder langtok 'tgt': source stream starts with __en__
    assert it.source[0] == task.src_dict.index("__en__")
    assert it.target[0] == task.tgt_dict.index("__en__")
    # batching interface works
    kw = ds.snap_kwargs([ds[0], ds[1]])
    batch = ds.collate([ds[0], ds[1]], **kw)
    assert batch["src_tokens"].shape[0] >= 2


def test_multilingual_e2e(tmp_path, capsys):
    bin_dir = _binarize_two_pairs(tmp_path)
    common = ["--task", "translation_multi_simple_epoch",
              "--arch", "transformer_tiny",
              "--lang-pairs", "aa-en,bb-en", "--encoder-langtok", "tgt",
              "--share-all-embeddings"]
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, *common, "--criterion", "label_smoothed_cross_entropy",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{tmp_path}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, *common, "--source-lang", "bb", "--target-lang", "en",
        "--path", f"{tmp_path}/ckpt/checkpoint_last.npz",
        "--gen-subset", "test", "--beam", "2", "--max-tokens", "400",
        "--max-len-b", "12", "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out
