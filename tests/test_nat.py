"""NAT/CMLM family: reference-numerics parity + iterative refinement +
noise-injection semantics + e2e translation_lev run.
"""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import nat_transformer as natm
from s2st_tpu.models import transformer_text as tt

G = dict(vocab=30, dim=16, ffn=32, heads=2, enc_layers=2, dec_layers=2)


def _ref_setup(seed=0):
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    cmlm_mod = importlib.import_module("fairseq.models.nat.cmlm_transformer")

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
    cmlm_mod.cmlm_base_architecture(a)
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0

    class _Task:
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(seed)
    model = cmlm_mod.CMLMNATransformerModel.build_model(a, _Task)
    model.eval()

    from s2st_tpu.models.torch_import import nat_from_fairseq_state_dict
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, nat_from_fairseq_state_dict(sd))
    base = tt.TransformerTextConfig(
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"],
        encoder_layers=G["enc_layers"], encoder_embed_dim=G["dim"],
        encoder_ffn_embed_dim=G["ffn"], encoder_attention_heads=G["heads"],
        decoder_layers=G["dec_layers"], decoder_embed_dim=G["dim"],
        decoder_ffn_embed_dim=G["ffn"], decoder_attention_heads=G["heads"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        share_all_embeddings=True, max_source_positions=256,
        max_target_positions=256, dtype=jnp.float32)
    cfg = natm.NATConfig(base=base)
    return model, variables, cfg


def _batch(r, b=3, ts=9, tt_=7):
    src = np.full((b, ts), 1, np.int64)
    tgt = np.full((b, tt_), 1, np.int64)
    prev = np.full((b, tt_), 1, np.int64)
    for i in range(b):
        sl = r.randint(4, ts + 1) if i else ts
        tl = r.randint(4, tt_ + 1) if i else tt_
        src[i, :sl - 1] = r.randint(4, 30, size=sl - 1)
        src[i, 0] = 0
        src[i, sl - 1] = 2
        tgt[i, :tl - 1] = r.randint(4, 30, size=tl - 1)
        tgt[i, 0] = 0
        tgt[i, tl - 1] = 2
        prev[i, :tl] = tgt[i, :tl]
        # mask some interior tokens like random_mask would
        prev[i, 1:tl - 1:2] = 3
    return src, tgt, prev


def test_cmlm_forward_parity():
    torch = pytest.importorskip("torch")
    model, variables, cfg = _ref_setup()
    r = np.random.RandomState(0)
    src, tgt, prev = _batch(r)
    src_lens = (src != 1).sum(1)
    with torch.no_grad():
        out_ref = model(torch.from_numpy(src),
                        torch.from_numpy(src_lens),
                        torch.from_numpy(prev), torch.from_numpy(tgt))
    out = natm.forward(variables, cfg,
                       {"src_tokens": src.astype(np.int32),
                        "prev_target": prev.astype(np.int32),
                        "target": tgt.astype(np.int32)},
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(out["word_ins_logits"]),
                               out_ref["word_ins"]["out"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["length_logits"]),
                               out_ref["length"]["out"].numpy(), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["length_tgt"]),
                                  out_ref["length"]["tgt"].numpy())


def test_initialize_output_tokens_parity():
    torch = pytest.importorskip("torch")
    model, variables, cfg = _ref_setup(seed=1)
    r = np.random.RandomState(1)
    src, _, _ = _batch(r)
    src_lens = (src != 1).sum(1)
    with torch.no_grad():
        enc_ref = model.forward_encoder(
            [torch.from_numpy(src), torch.from_numpy(src_lens)])
        init_ref = model.initialize_output_tokens(
            enc_ref, torch.from_numpy(src))
    ref_toks = init_ref.output_tokens.numpy()

    enc = tt.encode(variables, cfg.base, src.astype(np.int32),
                    deterministic=True)
    length_logits = natm.forward_length(variables, cfg, enc["encoder_out"],
                                        enc["encoder_padding_mask"])
    length_tgt = natm.predict_length(
        cfg, length_logits, jnp.asarray(src_lens))
    ours = np.asarray(natm.initialize_output_tokens(
        cfg, length_tgt, ref_toks.shape[1]))
    np.testing.assert_array_equal(ours, ref_toks)


def test_skeptical_unmask_parity():
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    load_reference()
    from fairseq.models.nat.cmlm_transformer import _skeptical_unmasking
    from s2st_tpu.generate.iterative_refinement import _skeptical_unmask

    r = np.random.RandomState(0)
    tokens = np.array([[0, 5, 6, 7, 8, 2, 1, 1],
                       [0, 9, 10, 11, 12, 13, 14, 2]], np.int64)
    scores = np.where(tokens > 3, -r.rand(2, 8), 0.0)
    for p in (0.75, 0.5, 0.25):
        mask_ref = _skeptical_unmasking(
            torch.from_numpy(scores), torch.from_numpy(tokens != 1), p)
        ref_toks = torch.from_numpy(tokens.copy())
        ref_toks.masked_fill_(mask_ref, 3)
        ours_toks, _ = _skeptical_unmask(jnp.asarray(tokens.astype(np.int32)),
                                         jnp.asarray(scores), p)
        np.testing.assert_array_equal(np.asarray(ours_toks),
                                      ref_toks.numpy())


def test_inject_noise_semantics():
    from s2st_tpu.train.losses import inject_noise
    tgt = np.array([[0, 5, 6, 7, 8, 2, 1, 1],
                    [0, 9, 10, 11, 2, 1, 1, 1]], np.int32)
    rng = jax.random.PRNGKey(0)
    # full_mask: everything except bos/eos/pad becomes unk
    fm = np.asarray(inject_noise(jnp.asarray(tgt), "full_mask", rng))
    np.testing.assert_array_equal(
        fm, np.where((tgt == 0) | (tgt == 2) | (tgt == 1), tgt, 3))
    # random_mask: bos/eos/pad intact, >=1 interior token masked
    rm = np.asarray(inject_noise(jnp.asarray(tgt), "random_mask", rng))
    assert (rm[tgt == 0] == 0).all() and (rm[tgt == 2] == 2).all()
    assert (rm[tgt == 1] == 1).all()
    assert (rm == 3).sum() >= 2
    # random_delete: result keeps bos...eos order-compacted, right-pad
    rd = np.asarray(inject_noise(jnp.asarray(tgt), "random_delete", rng))
    for i in range(2):
        row = rd[i][rd[i] != 1]
        assert row[0] == 0 and row[-1] == 2
        orig = tgt[i][tgt[i] != 1]
        # kept tokens are a subsequence of the original
        it = iter(orig.tolist())
        assert all(any(x == y for y in it) for x in row.tolist())
    # no_noise
    np.testing.assert_array_equal(
        np.asarray(inject_noise(jnp.asarray(tgt), "no_noise", rng)), tgt)


def test_refinement_converges_on_identity():
    """A CMLM trained to copy should fill all UNKs and terminate early."""
    from s2st_tpu.generate.iterative_refinement import (pick_best_beam,
                                                        refine_generate)
    cfg = natm.NATConfig(base=tt.TransformerTextConfig(
        src_vocab_size=20, tgt_vocab_size=20, encoder_layers=1,
        decoder_layers=1, encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        share_all_embeddings=True, dropout=0.0,
        max_source_positions=64, max_target_positions=64,
        dtype=jnp.float32))
    v = natm.init_nat(jax.random.PRNGKey(0), cfg)
    src = np.array([[0, 5, 6, 2], [0, 7, 2, 1]], np.int32)
    out = refine_generate(v, jnp.asarray(src), cfg=cfg, kind="cmlm",
                          max_iter=3, adaptive=True, length_beam=2,
                          max_len=12)
    assert out["tokens"].shape == (2, 2, 12)
    best, score, _ = pick_best_beam(out["tokens"], out["scores"])
    bt = np.asarray(best)
    # scaffold structure survives: BOS first, one EOS, PAD tail only
    for i in range(2):
        row = bt[i]
        n = (row != 1).sum()
        assert row[0] == 0
        assert (row[n:] == 1).all()


def test_translation_lev_e2e(tmp_path, capsys):
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 100), ("valid", 10), ("test", 6)):
        with open(f"{d}/{split}.src", "w") as fs, \
                open(f"{d}/{split}.tgt", "w") as ft:
            for _ in range(n):
                L = random.randint(3, 6)
                idx = [random.randrange(8) for _ in range(L)]
                fs.write(" ".join(f"w{i}" for i in idx) + "\n")
                ft.write(" ".join(f"w{i}" for i in reversed(idx)) + "\n")
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
        bin_dir, "--task", "translation_lev", "--arch", "cmlm_transformer",
        "--noise", "random_mask", "--criterion", "nat_loss", *common,
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation_lev", "--arch", "cmlm_transformer",
        *common, "--path", f"{d}/ckpt/checkpoint_last.npz",
        "--gen-subset", "test", "--iter-decode-max-iter", "3",
        "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out


def test_sequential_poisoning_matches_reference_loop():
    """poison_with == the reference's _sequential_poisoning run on the
    SAME random draws (the reference torch fn consumes its own RNG, so the
    comparison drives the reference's loop via a direct call with
    monkeypatched draws)."""
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    load_reference()
    import fairseq.models.nat.iterative_nonautoregressive_transformer as it

    r = np.random.RandomState(0)
    b, t, vocab = 4, 9, 20
    tgt = np.full((b, t), 1, np.int64)
    for i in range(b):
        L = r.randint(4, t + 1)
        tgt[i, 0] = 0
        tgt[i, 1:L - 1] = r.randint(4, vocab, size=L - 2)
        tgt[i, L - 1] = 2
    rand_words = r.randint(4, vocab, size=(b, t)).astype(np.int64)
    choices = r.rand(b, t).astype(np.float32)

    # drive the reference loop with pinned draws
    orig_randint, orig_rand = torch.randint, torch.rand
    try:
        torch.randint = lambda *a, **k: torch.from_numpy(rand_words.copy())
        torch.rand = lambda *a, **k: torch.from_numpy(choices.copy())
        ref = it._sequential_poisoning(
            torch.from_numpy(tgt.copy()), vocab, 0.33, 0, 2, 1).numpy()
    finally:
        torch.randint, torch.rand = orig_randint, orig_rand

    ours = np.asarray(natm.poison_with(
        jnp.asarray(tgt.astype(np.int32)),
        jnp.asarray(rand_words.astype(np.int32)), jnp.asarray(choices)))
    np.testing.assert_array_equal(ours, ref)


def test_inat_e2e(tmp_path, capsys):
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 80), ("valid", 8), ("test", 6)):
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
        "--arch", "iterative_nonautoregressive_transformer",
        "--noise", "full_mask", "--criterion", "nat_loss",
        "--train-step", "2", "--stochastic-approx", *common,
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation_lev",
        "--arch", "iterative_nonautoregressive_transformer", *common,
        "--path", f"{d}/ckpt/checkpoint_last.npz",
        "--gen-subset", "test", "--iter-decode-max-iter", "2",
        "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out
