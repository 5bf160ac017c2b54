"""online_backtranslation: single shared model with __lang__ tokens,
in-graph BT round trip + DAE streams, translation validation."""

import os
import shutil

import numpy as np
import pytest


def test_online_bt_cli_e2e(tmp_path):
    r = np.random.RandomState(0)
    words = [f"w{i}" for i in range(14)]
    d = str(tmp_path)
    # mono corpora per language + a small valid translation pair
    for lang in ("en", "ro"):
        with open(f"{d}/mono.{lang}.txt", "w") as f:
            for _ in range(16):
                f.write(" ".join(
                    r.choice(words, size=r.randint(3, 7))) + "\n")
    for lang in ("en", "ro"):
        with open(f"{d}/valid.{lang}", "w") as f:
            for _ in range(8):
                f.write(" ".join(
                    r.choice(words, size=r.randint(3, 7))) + "\n")
    with open(f"{d}/all.txt", "w") as f:
        for lang in ("en", "ro"):
            f.write(open(f"{d}/mono.{lang}.txt").read())
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--only-source", "--trainpref", f"{d}/all.txt",
               "--destdir", f"{d}/dictdir", "--dict-only",
               "--workers", "1"]) == 0
    os.makedirs(f"{d}/bin", exist_ok=True)
    shutil.copy(f"{d}/dictdir/dict.txt", f"{d}/bin/dict.txt")
    for lang in ("en", "ro"):
        os.makedirs(f"{d}/bin/{lang}", exist_ok=True)
        assert pp(["--only-source", "--trainpref", f"{d}/mono.{lang}.txt",
                   "--srcdict", f"{d}/bin/dict.txt",
                   "--destdir", f"{d}/bin/{lang}", "--workers", "1"]) == 0
    # valid pair binarized into the root with the shared dict
    assert pp(["--source-lang", "en", "--target-lang", "ro",
               "--validpref", f"{d}/valid",
               "--srcdict", f"{d}/bin/dict.txt",
               "--tgtdict", f"{d}/bin/dict.txt",
               "--destdir", f"{d}/bin", "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        f"{d}/bin", "--task", "online_backtranslation",
        "--arch", "transformer_tiny",
        "--mono-langs", "en,ro", "--valid-lang-pairs", "en-ro",
        "--lambda-bt", "1.0", "--lambda-dae", "0:1,100:0.5",
        "--criterion", "cross_entropy",
        "--share-all-embeddings",
        "--save-dir", f"{d}/ckpt",
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--max-tokens", "256", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(f"{d}/ckpt/checkpoint_last.npz")
    assert meta["step"] >= 1


def test_prefixed_pair_collate_semantics():
    """BT items: source = __lang__ + mono; prev_output_tokens starts with
    the language token (new_tgt_bos)."""
    from s2st_tpu.tasks.online_backtranslation import _PrefixedPair
    rows = [np.asarray([5, 6, 2]), np.asarray([7, 2])]
    ds = _PrefixedPair(rows, rows, [3, 2], lang_tok=9)
    it = ds[0]
    np.testing.assert_array_equal(it.source, [9, 5, 6, 2])
    np.testing.assert_array_equal(it.target, [5, 6, 2])
    batch = ds.collate([ds[0], ds[1]])
    assert (batch["prev_output_tokens"][:, 0] == 9).all()
