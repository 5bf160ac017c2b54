"""Insertion transformer: soft-label targets vs the reference's own
NegativeDistanceScore, head parity, _apply_ins_words parity, e2e.
"""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import insertion_transformer as insm
from s2st_tpu.models import transformer_text as tt
from s2st_tpu.ops import edit_ops

G = dict(vocab=30, dim=16, ffn=32, heads=2, enc_layers=2, dec_layers=2)


def _load_ref():
    pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    return load_reference()


def _pairs(r, b=6, tx=12, ty=12):
    xs = np.full((b, tx), 1, np.int32)
    ys = np.full((b, ty), 1, np.int32)
    for i in range(b):
        ly = r.randint(3, ty + 1)
        yrow = np.concatenate([[0], r.randint(4, 9, ly - 2), [2]])
        ys[i, :ly] = yrow
        keep = np.sort(r.choice(np.arange(1, ly - 1),
                                r.randint(0, ly - 2), replace=False))
        xrow = np.concatenate([[0], yrow[keep], [2]])
        xs[i, :len(xrow)] = xrow
    return xs, ys


def _backtrace_gap_lists(x, y):
    """Per-gap insertion word lists from the C++-spec backtrace oracle."""
    lx, ly = len(x), len(y)
    d = [[0] * (ly + 1) for _ in range(lx + 1)]
    for i in range(lx + 1):
        d[i][0] = i
    for j in range(ly + 1):
        d[0][j] = j
    for i in range(1, lx + 1):
        for j in range(1, ly + 1):
            d[i][j] = min(min(d[i - 1][j], d[i][j - 1]) + 1,
                          d[i - 1][j - 1] + 2 * (x[i - 1] != y[j - 1]))
    gaps = [[] for _ in range(lx + 1)]
    i, j = lx, ly
    while not (i == 0 and j == 0):
        if j > 0 and d[i][j - 1] < d[i][j]:
            gaps[i].insert(0, y[j - 1])
            j -= 1
        elif i > 0 and d[i - 1][j] < d[i][j]:
            i -= 1
        else:
            i -= 1
            j -= 1
    return gaps


@pytest.mark.parametrize("tau", [None, 1.0])
def test_insertion_targets_vs_reference_scorer(tau):
    """Soft labels == weights from the reference's own
    NegativeDistanceScore over the oracle gap lists."""
    _load_ref()
    from fairseq.models.nat.insertion_transformer import neg_scorer

    r = np.random.RandomState(0)
    xs, ys = _pairs(r)
    out = np.asarray(edit_ops.get_insertion_targets(
        jnp.asarray(xs), jnp.asarray(ys), G["vocab"], tau))
    tp = xs.shape[1]
    for b in range(len(xs)):
        xo = [int(t) for t in xs[b] if t != 1]
        yo = [int(t) for t in ys[b] if t != 1]
        gaps = _backtrace_gap_lists(xo, yo)
        expect = np.zeros((tp - 1, G["vocab"]), np.float32)
        for g in range(1, len(xo)):          # the [1:-1] slice
            label = gaps[g] if gaps[g] else [1]   # pad-filled empty cell
            for k, w in enumerate(label):
                expect[g - 1, w] += neg_scorer(k, len(label), tau)
        np.testing.assert_allclose(out[b], expect, atol=1e-6,
                                   err_msg=f"row {b}")


def test_apply_ins_words_gapwise_vs_reference():
    torch = pytest.importorskip("torch")
    _load_ref()
    from fairseq.models.nat.insertion_transformer import \
        _apply_ins_words as ref_apply

    r = np.random.RandomState(1)
    tokens = np.array([[0, 5, 6, 2, 1, 1, 1, 1],
                       [0, 7, 2, 1, 1, 1, 1, 1]], np.int64)
    pred = r.randint(4, 9, size=(2, 7)).astype(np.int64)
    pred[0, 2] = 1            # PAD = no insertion at this gap
    pred[:, 3:] = 1           # gaps beyond the sentence
    scores = np.zeros((2, 8), np.float32)
    w_scores = -r.rand(2, 7).astype(np.float32)

    rt, rs = ref_apply(torch.from_numpy(tokens.copy()),
                       torch.from_numpy(scores.copy()),
                       torch.from_numpy(pred.copy()),
                       torch.from_numpy(w_scores.copy()), 1)
    ot, os_ = insm.apply_ins_words_gapwise(
        jnp.asarray(tokens.astype(np.int32)), jnp.asarray(scores),
        jnp.asarray(pred.astype(np.int32)), jnp.asarray(w_scores))
    ot, os_ = np.asarray(ot), np.asarray(os_)
    for b in range(2):
        ref_row = rt[b].numpy()
        ref_real = ref_row[ref_row != 1]
        ours_real = ot[b][ot[b] != 1]
        np.testing.assert_array_equal(ours_real[:len(ref_real)], ref_real)


def test_head_parity():
    torch = pytest.importorskip("torch")
    ref = _load_ref()
    import importlib
    ins_mod = importlib.import_module(
        "fairseq.models.nat.insertion_transformer")

    d = ref.Dictionary()
    for i in range(G["vocab"] - len(d)):
        d.add_symbol(f"w{i}")
    a = argparse.Namespace()
    a.encoder_embed_dim = G["dim"]
    a.encoder_ffn_embed_dim = G["ffn"]
    a.encoder_layers = G["enc_layers"]
    a.encoder_attention_heads = G["heads"]
    a.decoder_embed_dim = G["dim"]
    a.decoder_ffn_embed_dim = G["ffn"]
    a.decoder_layers = G["dec_layers"]
    a.decoder_attention_heads = G["heads"]
    a.dropout = 0.0
    a.label_smoothing = 0.0
    a.max_source_positions = 256
    a.max_target_positions = 256
    ins_mod.insertion_base_architecture(a)
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0

    class _Task:
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(0)
    model = ins_mod.InsertionTransformerModel.build_model(a, _Task)
    model.eval()

    from s2st_tpu.models.torch_import import (
        _lin, transformer_text_from_fairseq_state_dict)
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    pool = _lin(sd, "decoder.pool_out", {})
    variables = jax.tree_util.tree_map(
        jnp.asarray, transformer_text_from_fairseq_state_dict(sd))
    variables["params"]["decoder"]["pool_out"] = jax.tree_util.tree_map(
        jnp.asarray, pool)
    base = tt.TransformerTextConfig(
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"],
        encoder_layers=G["enc_layers"], encoder_embed_dim=G["dim"],
        encoder_ffn_embed_dim=G["ffn"], encoder_attention_heads=G["heads"],
        decoder_layers=G["dec_layers"], decoder_embed_dim=G["dim"],
        decoder_ffn_embed_dim=G["ffn"], decoder_attention_heads=G["heads"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32)
    cfg = insm.InsertionConfig(base=base)

    r = np.random.RandomState(0)
    src, cur = _pairs(r, b=3, tx=9, ty=9)
    src_lens = (src != 1).sum(1)
    with torch.no_grad():
        enc_ref = model.encoder(torch.from_numpy(src.astype(np.int64)),
                                src_lengths=torch.from_numpy(src_lens))
        head_ref = model.decoder.forward_word_ins(
            normalize=False,
            prev_output_tokens=torch.from_numpy(cur.astype(np.int64)),
            encoder_out=enc_ref)
    enc = tt.encode(variables, cfg.base, src, deterministic=True)
    ours = insm.forward_word_ins(variables, cfg, cur, enc["encoder_out"],
                                 enc["encoder_padding_mask"])
    np.testing.assert_allclose(np.asarray(ours), head_ref.numpy(),
                               atol=1e-4)


def test_insertion_e2e(tmp_path, capsys):
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 100), ("valid", 10), ("test", 6)):
        with open(f"{d}/{split}.src", "w") as fs, \
                open(f"{d}/{split}.tgt", "w") as ft:
            for _ in range(n):
                L = random.randint(3, 6)
                idx = [random.randrange(8) for _ in range(L)]
                fs.write(" ".join(f"w{i}" for i in idx) + "\n")
                ft.write(" ".join(f"w{i}" for i in idx) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    pp(["--source-lang", "src", "--target-lang", "tgt",
        "--joined-dictionary", "--trainpref", f"{d}/train",
        "--validpref", f"{d}/valid", "--testpref", f"{d}/test",
        "--destdir", bin_dir, "--workers", "1"])
    common = ["--encoder-layers", "1", "--decoder-layers", "1",
              "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
              "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim",
              "32", "--encoder-attention-heads", "2",
              "--decoder-attention-heads", "2"]
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "translation_lev",
        "--arch", "insertion_transformer", "--noise", "random_delete",
        "--criterion", "nat_loss", "--label-tau", "1.0", *common,
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation_lev",
        "--arch", "insertion_transformer", *common,
        "--path", f"{d}/ckpt/checkpoint_last.npz",
        "--gen-subset", "test", "--iter-decode-max-iter", "3",
        "--max-tokens", "400", "--max-len-b", "16",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out
