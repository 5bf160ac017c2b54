"""Translation task: collate parity vs the reference LanguagePairDataset
and an end-to-end preprocess -> train -> generate -> interactive run.
"""

import os
import random

import numpy as np
import pytest

from s2st_tpu.data.language_pair_dataset import (LanguagePairDataset,
                                                 LanguagePairItem)


def _rows(r, n, vocab=20, tmin=2, tmax=8):
    out = []
    for _ in range(n):
        L = r.randint(tmin, tmax)
        out.append(np.concatenate(
            [r.randint(4, vocab, size=L), [2]]).astype(np.int32))
    return out


def test_collate_matches_reference():
    """src_tokens/prev_output_tokens/target/ntokens == the reference's
    collate (fairseq/data/language_pair_dataset.py:16) on the same rows,
    at minimal padding (no snap), default left_pad_source=True."""
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    load_reference()
    from fairseq.data.language_pair_dataset import collate as ref_collate

    r = np.random.RandomState(0)
    srcs, tgts = _rows(r, 5), _rows(r, 5)
    samples = [{"id": i, "source": torch.from_numpy(s.astype(np.int64)),
                "target": torch.from_numpy(t.astype(np.int64))}
               for i, (s, t) in enumerate(zip(srcs, tgts))]
    ref = ref_collate(samples, pad_idx=1, eos_idx=2, left_pad_source=True,
                      left_pad_target=False)

    ds = LanguagePairDataset(srcs, [len(s) for s in srcs], None,
                             tgts, [len(t) for t in tgts], None)
    items = [LanguagePairItem(i, s, t)
             for i, (s, t) in enumerate(zip(srcs, tgts))]
    ours = ds.collate(items)

    np.testing.assert_array_equal(ours["src_tokens"],
                                  ref["net_input"]["src_tokens"].numpy())
    np.testing.assert_array_equal(ours["src_lengths"],
                                  ref["net_input"]["src_lengths"].numpy())
    np.testing.assert_array_equal(
        ours["prev_output_tokens"],
        ref["net_input"]["prev_output_tokens"].numpy())
    np.testing.assert_array_equal(ours["target"], ref["target"].numpy())
    assert ours["ntokens"] == ref["ntokens"]
    np.testing.assert_array_equal(ours["id"], ref["id"].numpy())


def test_collate_left_pad_target():
    r = np.random.RandomState(1)
    srcs, tgts = _rows(r, 3), _rows(r, 3)
    ds = LanguagePairDataset(srcs, [len(s) for s in srcs], None,
                             tgts, [len(t) for t in tgts], None,
                             left_pad_target=True)
    items = [LanguagePairItem(i, s, t)
             for i, (s, t) in enumerate(zip(srcs, tgts))]
    out = ds.collate(items)
    tt = out["target"].shape[1]
    for i in range(3):
        n = int(out["target_lengths"][i])
        row_t = out["target"][i]
        row_p = out["prev_output_tokens"][i]
        assert (row_t[:tt - n] == 1).all() and row_t[-1] == 2
        assert row_p[tt - n] == 2  # moved EOS heads the right-aligned span
        np.testing.assert_array_equal(row_p[tt - n + 1:], row_t[tt - n:-1])


def _make_corpus(d, seed=0):
    random.seed(seed)
    for split, n in (("train", 120), ("valid", 16), ("test", 8)):
        with open(f"{d}/{split}.src", "w") as fs, \
                open(f"{d}/{split}.tgt", "w") as ft:
            for _ in range(n):
                L = random.randint(3, 7)
                idx = [random.randrange(10) for _ in range(L)]
                fs.write(" ".join(f"s{i}" for i in idx) + "\n")
                ft.write(" ".join(f"t{i}" for i in reversed(idx)) + "\n")


def test_translation_e2e(tmp_path, capsys):
    """preprocess -> train 3 epochs (loss drops) -> generate prints
    S/T/H/D lines + a BLEU line -> interactive decodes raw text."""
    d = str(tmp_path)
    _make_corpus(d)
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    assert pp(["--source-lang", "src", "--target-lang", "tgt",
               "--trainpref", f"{d}/train", "--validpref", f"{d}/valid",
               "--testpref", f"{d}/test", "--destdir", bin_dir,
               "--workers", "1"]) == 0

    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "translation", "--arch", "transformer_tiny",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1", "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "10",
        "--max-tokens", "600", "--max-epoch", "3", "--save-dir", f"{d}/ckpt",
        "--log-interval", "5", "--seed", "1",
        "--share-decoder-input-output-embed",
        "--no-epoch-checkpoints"]) == 0
    assert os.path.exists(f"{d}/ckpt/checkpoint_best.npz")
    capsys.readouterr()

    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation", "--arch", "transformer_tiny",
        "--path", f"{d}/ckpt/checkpoint_best.npz", "--gen-subset", "test",
        "--beam", "2", "--max-tokens", "600", "--max-len-b", "12",
        "--share-decoder-input-output-embed",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    for tag in ("S-", "T-", "H-", "D-"):
        assert tag in out
    assert "Generate test with beam=2" in out
    assert out.count("H-") == 8

    inp = f"{d}/in.txt"
    with open(inp, "w") as f:
        f.write("s1 s2 s3\ns4 s5\n")
    from s2st_tpu.cli.interactive import main as inter_main
    assert inter_main([
        bin_dir, "--task", "translation", "--arch", "transformer_tiny",
        "--path", f"{d}/ckpt/checkpoint_best.npz", "--beam", "2",
        "--max-len-b", "10", "--share-decoder-input-output-embed",
        "--input", inp, "--buffer-size", "2"]) == 0
    out = capsys.readouterr().out
    assert out.count("S-") == 2 and out.count("H-") == 2


def test_infer_language_pair(tmp_path):
    from s2st_tpu.tasks.translation import infer_language_pair
    (tmp_path / "train.de-en.de.idx").touch()
    (tmp_path / "train.de-en.de.bin").touch()
    assert infer_language_pair(str(tmp_path)) == ["de", "en"]


def test_score_reference_mode(tmp_path, capsys):
    """--score-reference prints P- positional scores for the reference."""
    d = str(tmp_path)
    _make_corpus(d, seed=1)
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    pp(["--source-lang", "src", "--target-lang", "tgt",
        "--trainpref", f"{d}/train", "--testpref", f"{d}/test",
        "--destdir", bin_dir, "--workers", "1"])
    from s2st_tpu.cli.train import main as train_main
    train_main([
        bin_dir, "--task", "translation", "--arch", "transformer_tiny",
        "--criterion", "label_smoothed_cross_entropy",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "600", "--max-epoch", "1", "--save-dir", f"{d}/ckpt",
        "--disable-validation", "--no-epoch-checkpoints"])
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation", "--arch", "transformer_tiny",
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--max-tokens", "600", "--score-reference"]) == 0
    out = capsys.readouterr().out
    assert out.count("P-") == 8 and "H-" in out


def test_eval_bleu_validation(tmp_path):
    """--eval-bleu: validation runs beam generation and logs a corpus
    BLEU; --best-checkpoint-metric bleu drives checkpoint_best."""
    import numpy as np
    r = np.random.RandomState(0)
    words = [f"w{i}" for i in range(12)]
    for split, n in (("train", 20), ("valid", 6)):
        for lang in ("de", "en"):
            with open(tmp_path / f"{split}.{lang}", "w") as f:
                for _ in range(n):
                    f.write(" ".join(
                        r.choice(words, size=r.randint(3, 7))) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--source-lang", "de", "--target-lang", "en",
               "--trainpref", str(tmp_path / "train"),
               "--validpref", str(tmp_path / "valid"),
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(tmp_path / "bin"), "--task", "translation",
        "--source-lang", "de", "--target-lang", "en",
        "--arch", "transformer_tiny",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--eval-bleu", "--eval-bleu-args", '{"beam": 2, "max_len_b": 12}',
        "--eval-bleu-print-samples",
        "--best-checkpoint-metric", "bleu",
        "--maximize-best-checkpoint-metric",
        "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    import os
    assert os.path.exists(tmp_path / "ckpt" / "checkpoint_best.npz")
