"""Levenshtein transformer: edit-op oracles, reference-numerics head
parity, one full forward_decoder iteration vs the reference, and e2e.
"""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import levenshtein_transformer as lev
from s2st_tpu.models import transformer_text as tt
from s2st_tpu.ops import edit_ops

G = dict(vocab=30, dim=16, ffn=32, heads=2, enc_layers=2, dec_layers=2)


# ---------------------------------------------------------------------------
# edit-op oracles (pure-python port of the libnat C++ spec,
# fairseq/clib/libnat/edit_dist.cpp:23-112)
# ---------------------------------------------------------------------------

def _dp_oracle(x, y):
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
    return d


def _backtrace_oracle(d, x, y):
    i, j = len(x), len(y)
    ins = [0] * (len(x) + 1)
    y_ins = [False] * len(y)
    x_del = [False] * len(x)
    while not (i == 0 and j == 0):
        if j > 0 and d[i][j - 1] < d[i][j]:
            ins[i] += 1
            y_ins[j - 1] = True
            j -= 1
        elif i > 0 and d[i - 1][j] < d[i][j]:
            x_del[i - 1] = True
            i -= 1
        else:
            i -= 1
            j -= 1
    return ins, y_ins, x_del


def _pairs(r, b=6, tx=12, ty=12, subseq=True):
    xs = np.full((b, tx), 1, np.int32)
    ys = np.full((b, ty), 1, np.int32)
    for i in range(b):
        ly = r.randint(3, ty + 1)
        yrow = np.concatenate([[0], r.randint(4, 9, ly - 2), [2]])
        ys[i, :ly] = yrow
        if subseq:
            keep = np.sort(r.choice(np.arange(1, ly - 1),
                                    r.randint(0, ly - 2), replace=False))
            xrow = np.concatenate([[0], yrow[keep], [2]])
        else:
            lx = r.randint(3, tx + 1)
            xrow = np.concatenate([[0], r.randint(4, 9, lx - 2), [2]])
        xs[i, :len(xrow)] = xrow
    return xs, ys


@pytest.mark.parametrize("subseq", [True, False])
def test_edit_ops_match_cpp_spec_oracle(subseq):
    r = np.random.RandomState(3 if subseq else 4)
    xs, ys = _pairs(r, subseq=subseq)
    d = np.asarray(edit_ops.levenshtein_dp(jnp.asarray(xs), jnp.asarray(ys)))
    lx = (xs != 1).sum(1)
    ly = (ys != 1).sum(1)
    ops = edit_ops.backtrace_edit_ops(jnp.asarray(d), jnp.asarray(lx),
                                      jnp.asarray(ly))
    for b in range(len(xs)):
        xo = [t for t in xs[b] if t != 1]
        yo = [t for t in ys[b] if t != 1]
        do = _dp_oracle(xo, yo)
        np.testing.assert_array_equal(d[b, :len(xo) + 1, :len(yo) + 1], do)
        ic, yi, xd = _backtrace_oracle(do, xo, yo)
        np.testing.assert_array_equal(
            np.asarray(ops["ins_count"])[b, :len(xo) + 1], ic)
        np.testing.assert_array_equal(
            np.asarray(ops["y_is_ins"])[b, :len(yo)], yi)
        np.testing.assert_array_equal(
            np.asarray(ops["x_deleted"])[b, :len(xo)], xd)


def test_ins_targets_and_apply_roundtrip():
    """Applying the TRUE gap counts to the scaffold reproduces the
    unk-masked target exactly (ins labels and _apply_ins_masks agree)."""
    r = np.random.RandomState(0)
    xs, ys = _pairs(r, tx=14, ty=14)
    mtm, mtt, mit = edit_ops.get_ins_targets(jnp.asarray(xs),
                                             jnp.asarray(ys))
    ot, _ = edit_ops.apply_ins_masks(jnp.asarray(xs), None, mit)
    np.testing.assert_array_equal(np.asarray(ot), np.asarray(mtt))


# ---------------------------------------------------------------------------
# reference parity
# ---------------------------------------------------------------------------

def _ref_setup(seed=0, early_exit="2,2,2"):
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    lev_mod = importlib.import_module(
        "fairseq.models.nat.levenshtein_transformer")

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
    a.early_exit = early_exit
    lev_mod.levenshtein_base_architecture(a)
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0

    class _Task:
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(seed)
    model = lev_mod.LevenshteinTransformerModel.build_model(a, _Task)
    model.eval()

    from s2st_tpu.models.torch_import import lev_from_fairseq_state_dict
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, lev_from_fairseq_state_dict(sd))
    base = tt.TransformerTextConfig(
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"],
        encoder_layers=G["enc_layers"], encoder_embed_dim=G["dim"],
        encoder_ffn_embed_dim=G["ffn"], encoder_attention_heads=G["heads"],
        decoder_layers=G["dec_layers"], decoder_embed_dim=G["dim"],
        decoder_ffn_embed_dim=G["ffn"], decoder_attention_heads=G["heads"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32)
    cfg = lev.LevenshteinConfig(
        base=base,
        early_exit=tuple(int(x) for x in early_exit.split(",")))
    return model, variables, cfg


def test_head_parity():
    torch = pytest.importorskip("torch")
    model, variables, cfg = _ref_setup()
    r = np.random.RandomState(0)
    src, tgt = _pairs(r, b=3, tx=9, ty=9, subseq=False)
    src_lens = (src != 1).sum(1)
    with torch.no_grad():
        enc_ref = model.encoder(torch.from_numpy(src.astype(np.int64)),
                                src_lengths=torch.from_numpy(src_lens))
        del_ref, _ = model.decoder.forward_word_del(
            normalize=False,
            prev_output_tokens=torch.from_numpy(tgt.astype(np.int64)),
            encoder_out=enc_ref)
        ins_ref, _ = model.decoder.forward_mask_ins(
            normalize=False,
            prev_output_tokens=torch.from_numpy(tgt.astype(np.int64)),
            encoder_out=enc_ref)
        word_ref, _ = model.decoder.forward_word_ins(
            normalize=False,
            prev_output_tokens=torch.from_numpy(tgt.astype(np.int64)),
            encoder_out=enc_ref)

    enc = tt.encode(variables, cfg.base, src, deterministic=True)
    eo, ep = enc["encoder_out"], enc["encoder_padding_mask"]
    np.testing.assert_allclose(
        np.asarray(lev.forward_word_del(variables, cfg, tgt, eo, ep)),
        del_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(lev.forward_mask_ins(variables, cfg, tgt, eo, ep)),
        ins_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(lev.forward_word_ins(variables, cfg, tgt, eo, ep)),
        word_ref.numpy(), atol=1e-4)


def test_forward_decoder_iteration_parity():
    """One full refinement iteration (del -> ins -> fill) produces the
    same tokens as the reference's forward_decoder."""
    torch = pytest.importorskip("torch")
    model, variables, cfg = _ref_setup(seed=5)  # loads the reference
    from fairseq.iterative_refinement_generator import DecoderOut
    r = np.random.RandomState(5)
    src, cur = _pairs(r, b=3, tx=9, ty=9, subseq=False)
    src_lens = (src != 1).sum(1)
    with torch.no_grad():
        enc_ref = model.encoder(torch.from_numpy(src.astype(np.int64)),
                                src_lengths=torch.from_numpy(src_lens))
        dec_out = DecoderOut(
            output_tokens=torch.from_numpy(cur.astype(np.int64)),
            output_scores=torch.zeros(cur.shape), attn=None, step=0,
            max_step=10, history=None)
        # max_ratio=2 is what IterativeRefinementGenerator always passes
        # (its default; the max_ratio=None branch upstream is broken)
        ref_out = model.forward_decoder(dec_out, enc_ref, max_ratio=2)
    ref_toks = ref_out.output_tokens.numpy()
    max_lens_np = np.clip((src_lens * 2).astype(int), 10, None)

    from s2st_tpu.generate.iterative_refinement import _levenshtein_generate
    # drive one iteration by hand through the same ops
    from s2st_tpu.ops.edit_ops import (apply_del_words, apply_ins_masks,
                                       apply_ins_words)
    enc = tt.encode(variables, cfg.base, src, deterministic=True)
    eo, ep = enc["encoder_out"], enc["encoder_padding_mask"]
    # fixed buffer wide enough that insertions never clip (ref grows)
    wide = np.full((cur.shape[0], 48), 1, np.int32)
    wide[:, :cur.shape[1]] = cur
    tokens = jnp.asarray(wide)
    scores = jnp.zeros(wide.shape, jnp.float32)
    can_del = jnp.sum(tokens != 1, axis=1) > 2
    del_pred = jnp.argmax(lev.forward_word_del(
        variables, cfg, tokens, eo, ep), axis=-1) == 1
    dt, ds = apply_del_words(tokens, scores, del_pred)
    tokens = jnp.where(can_del[:, None], dt, tokens)
    scores = jnp.where(can_del[:, None], ds, scores)
    max_lens = jnp.asarray(max_lens_np)
    ins_pred = jnp.argmax(lev.forward_mask_ins(
        variables, cfg, tokens, eo, ep), axis=-1).astype(jnp.int32)
    ins_pred = jnp.minimum(ins_pred, max_lens[:, None])
    it_, isc = apply_ins_masks(tokens, scores, ins_pred)
    can_ins = jnp.sum(tokens != 1, axis=1) < max_lens
    tokens = jnp.where(can_ins[:, None], it_, tokens)
    scores = jnp.where(can_ins[:, None], isc, scores)
    can_fill = jnp.any(tokens == 3, axis=1)
    wlp = jax.nn.log_softmax(lev.forward_word_ins(
        variables, cfg, tokens, eo, ep), axis=-1)
    wt, ws = apply_ins_words(tokens, scores,
                             jnp.argmax(wlp, -1).astype(jnp.int32),
                             jnp.max(wlp, -1))
    tokens = np.asarray(jnp.where(can_fill[:, None], wt, tokens))

    for b in range(3):
        ours = tokens[b][tokens[b] != 1]
        refs = ref_toks[b][ref_toks[b] != 1]
        np.testing.assert_array_equal(ours, refs, err_msg=f"row {b}")


def test_levenshtein_e2e(tmp_path, capsys):
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
              "--decoder-attention-heads", "2", "--early-exit", "1,1,1"]
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "translation_lev",
        "--arch", "levenshtein_transformer", "--noise", "random_delete",
        "--criterion", "nat_loss", *common,
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation_lev",
        "--arch", "levenshtein_transformer", *common,
        "--path", f"{d}/ckpt/checkpoint_last.npz",
        "--gen-subset", "test", "--iter-decode-max-iter", "3",
        "--max-tokens", "400", "--max-len-b", "16",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out


def test_ensemble_levt_duplicate_is_identity(tmp_path):
    """refine_generate with [m, m] decodes token-identically to m alone
    (logsumexp of identical log-probs is a constant shift)."""
    _, variables, cfg = _ref_setup(seed=5)
    r = np.random.RandomState(7)
    src, _ = _pairs(r, b=4, tx=8, ty=8, subseq=False)
    from s2st_tpu.generate.iterative_refinement import refine_generate
    single = refine_generate(variables, jnp.asarray(src), cfg=cfg,
                             kind="levenshtein", max_iter=3, max_len=32)
    dup = refine_generate([variables, variables], jnp.asarray(src),
                          cfg=cfg, kind="levenshtein", max_iter=3,
                          max_len=32)
    np.testing.assert_array_equal(np.asarray(single["tokens"]),
                                  np.asarray(dup["tokens"]))
    # non-LevT kinds reject ensembles like the reference
    # (nonautoregressive_ensembles.py only defines EnsembleLevT)
    with pytest.raises(NotImplementedError):
        refine_generate([variables, variables], jnp.asarray(src),
                        cfg=cfg, kind="insertion")


def test_ensemble_levt_parity():
    """One ensembled refinement iteration (del -> ins -> fill, each head
    logsumexp-averaged over two DIFFERENT models) produces the same tokens
    as the reference's own EnsembleLevT.forward_decoder
    (fairseq/models/nat/nonautoregressive_ensembles.py:64-140)."""
    torch = pytest.importorskip("torch")
    m1, v1, cfg = _ref_setup(seed=5)
    m2, v2, _ = _ref_setup(seed=11)
    import importlib
    # the fork's nonautoregressive_ensembles.py is DEAD CODE: nothing
    # imports it and its own `from fairseq.models.nat import _apply_...`
    # imports fail (star-imports don't re-export underscore names). Inject
    # the helpers so the reference's genuine ensemble math can run.
    import fairseq.models.nat as natpkg
    lu = importlib.import_module("fairseq.models.nat.levenshtein_utils")
    for n in ("_apply_del_words", "_apply_ins_masks", "_apply_ins_words",
              "_fill", "_skip", "_skip_encoder_out"):
        setattr(natpkg, n, getattr(lu, n))
    ens_mod = importlib.import_module(
        "fairseq.models.nat.nonautoregressive_ensembles")
    from fairseq.iterative_refinement_generator import DecoderOut

    r = np.random.RandomState(9)
    src, cur = _pairs(r, b=3, tx=9, ty=9, subseq=False)
    src_lens = (src != 1).sum(1)
    # second bug in the dead module: it calls the decoder heads
    # positionally (tokens, encoder_out) while the fork's decorated heads
    # take keywords (normalize/prev_output_tokens/encoder_out) — adapt the
    # call convention so the reference ensemble math can execute
    # ...and a third: it stacks per-model del/ins attentions into a
    # (n_models, B, T, S) tensor but feeds it where (B, T, S) is expected
    # (_apply_del_words crashes). Drop the attn output (tokens/scores math
    # is unaffected; attn only feeds alignment dumps).
    def _positional(orig):
        def call(tokens, enc_out):
            out = orig(normalize=False, prev_output_tokens=tokens,
                       encoder_out=enc_out)
            return (out[0], None) if isinstance(out, tuple) else (out, None)
        return call
    for m_ in (m1, m2):
        for nm in ("forward_word_del", "forward_mask_ins",
                   "forward_word_ins"):
            setattr(m_.decoder, nm, _positional(getattr(m_.decoder, nm)))
    ens = ens_mod.EnsembleLevT([m1, m2])
    with torch.no_grad():
        enc_refs = [m.encoder(torch.from_numpy(src.astype(np.int64)),
                              src_lengths=torch.from_numpy(src_lens))
                    for m in (m1, m2)]
        dec_out = DecoderOut(
            output_tokens=torch.from_numpy(cur.astype(np.int64)),
            output_scores=torch.zeros(cur.shape), attn=None, step=0,
            max_step=10, history=None)
        ref_out = ens.forward_decoder(dec_out, enc_refs, max_ratio=2.0)
    ref_toks = ref_out.output_tokens.numpy()
    max_lens_np = np.clip((src_lens * 2).astype(int), 10, None)

    from s2st_tpu.ops.edit_ops import (apply_del_words, apply_ins_masks,
                                       apply_ins_words)
    models = [v1, v2]
    encs = [tt.encode(v, cfg.base, src, deterministic=True) for v in models]

    def avg_lp(head):
        lps = [jax.nn.log_softmax(
            head(v, e["encoder_out"], e["encoder_padding_mask"]), -1)
            for v, e in zip(models, encs)]
        return (jax.scipy.special.logsumexp(jnp.stack(lps, 0), 0)
                - jnp.log(2.0))

    wide = np.full((cur.shape[0], 48), 1, np.int32)
    wide[:, :cur.shape[1]] = cur
    tokens = jnp.asarray(wide)
    scores = jnp.zeros(wide.shape, jnp.float32)
    can_del = jnp.sum(tokens != 1, axis=1) > 2
    del_pred = jnp.argmax(avg_lp(
        lambda v, e, p: lev.forward_word_del(v, cfg, tokens, e, p)),
        axis=-1) == 1
    dt, ds = apply_del_words(tokens, scores, del_pred)
    tokens = jnp.where(can_del[:, None], dt, tokens)
    scores = jnp.where(can_del[:, None], ds, scores)
    max_lens = jnp.asarray(max_lens_np)
    t_del = tokens
    ins_pred = jnp.argmax(avg_lp(
        lambda v, e, p: lev.forward_mask_ins(v, cfg, t_del, e, p)),
        axis=-1).astype(jnp.int32)
    ins_pred = jnp.minimum(ins_pred, max_lens[:, None])
    it_, isc = apply_ins_masks(tokens, scores, ins_pred)
    can_ins = jnp.sum(tokens != 1, axis=1) < max_lens
    tokens = jnp.where(can_ins[:, None], it_, tokens)
    scores = jnp.where(can_ins[:, None], isc, scores)
    can_fill = jnp.any(tokens == 3, axis=1)
    t_fill = tokens
    wlp = avg_lp(lambda v, e, p: lev.forward_word_ins(v, cfg, t_fill, e, p))
    wt, ws = apply_ins_words(tokens, scores,
                             jnp.argmax(wlp, -1).astype(jnp.int32),
                             jnp.max(wlp, -1))
    tokens = np.asarray(jnp.where(can_fill[:, None], wt, tokens))

    for b in range(3):
        ours = tokens[b][tokens[b] != 1]
        refs = ref_toks[b][ref_toks[b] != 1]
        np.testing.assert_array_equal(ours, refs, err_msg=f"row {b}")
