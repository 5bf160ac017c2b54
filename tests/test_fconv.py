"""ConvS2S (fconv): reference-numerics forward parity, beam parity vs the
reference SequenceGenerator through the incremental conv-buffer step fn,
and CLI e2e over the translation task."""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import fconv as fconv_m

G = dict(vocab=26)


def _build_ref(ref, seed=0, **over):
    torch = pytest.importorskip("torch")
    import importlib
    mod = importlib.import_module("fairseq.models.fconv")

    d = ref.Dictionary()
    for i in range(G["vocab"] - len(d)):
        d.add_symbol(f"w{i}")
    a = argparse.Namespace()
    a.dropout = 0.0
    a.encoder_embed_dim = 12
    a.decoder_embed_dim = 12
    a.decoder_out_embed_dim = 10
    a.encoder_layers = "[(16, 3)] + [(12, 3, 2)] + [(12, 2)]"
    a.decoder_layers = "[(16, 3)] + [(12, 1)]"
    a.decoder_attention = "True"
    a.encoder_embed_path = None
    a.decoder_embed_path = None
    a.share_input_output_embed = False
    a.max_source_positions = 64
    a.max_target_positions = 64
    a.criterion = "cross_entropy"
    for k, v in over.items():
        setattr(a, k, v)
    mod.base_architecture(a)

    class _Task:
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(seed)
    model = mod.FConvModel.build_model(a, _Task)
    model.eval()
    return model, a, _Task


def _our_cfg(a):
    return fconv_m.FConvConfig(
        src_vocab=G["vocab"], tgt_vocab=G["vocab"],
        encoder_embed_dim=a.encoder_embed_dim,
        decoder_embed_dim=a.decoder_embed_dim,
        decoder_out_embed_dim=a.decoder_out_embed_dim,
        encoder_convs=fconv_m.extend_conv_spec(eval(a.encoder_layers)),
        decoder_convs=fconv_m.extend_conv_spec(eval(a.decoder_layers)),
        dropout=0.0,
        share_input_output_embed=a.share_input_output_embed,
        max_source_positions=64, max_target_positions=64,
        dtype=jnp.float32)


def _import(model, cfg):
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    return fconv_m.load_torch_fconv(sd, cfg)


def _src(r, b, t):
    lens = r.randint(2, t + 1, size=b)
    lens[0] = t
    out = np.full((b, t), 1, np.int64)
    for i in range(b):
        out[i, t - lens[i]:] = np.concatenate(
            [r.randint(4, G["vocab"], size=lens[i] - 1), [2]])
    return out, lens.astype(np.int64)


def _prev(r, b, t):
    out = np.full((b, t), 1, np.int64)
    lens = r.randint(2, t + 1, size=b)
    lens[0] = t
    for i in range(b):
        out[i, 0] = 2
        out[i, 1:lens[i]] = r.randint(4, G["vocab"], size=lens[i] - 1)
    return out


@pytest.mark.parametrize("mode", ["base", "share", "evenk"])
def test_fconv_forward_parity(mode):
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    over = {}
    if mode == "share":
        over = dict(share_input_output_embed=True,
                    decoder_out_embed_dim=12)
    if mode == "evenk":
        over = dict(encoder_layers="[(12, 2)] * 2 + [(16, 4)]")
    model, a, _ = _build_ref(ref, seed=hash(mode) % 50, **over)
    cfg = _our_cfg(a)
    variables = _import(model, cfg)

    r = np.random.RandomState(1)
    src, src_lens = _src(r, 4, 9)
    prev = _prev(r, 4, 7)
    with torch.no_grad():
        logits_ref, attn_ref = model(torch.from_numpy(src),
                                     torch.from_numpy(src_lens),
                                     torch.from_numpy(prev))
    out = fconv_m.forward(variables, cfg,
                          {"src_tokens": src.astype(np.int32),
                           "prev_output_tokens": prev.astype(np.int32)},
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)
    if attn_ref is not None:
        np.testing.assert_allclose(np.asarray(out["attn"]),
                                   attn_ref.numpy(), atol=2e-4)


def test_fconv_beam_parity_vs_reference_generator():
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    sg_mod = importlib.import_module("fairseq.sequence_generator")
    model, a, task = _build_ref(ref, seed=4)
    cfg = _our_cfg(a)
    variables = _import(model, cfg)

    r = np.random.RandomState(5)
    src, src_lens = _src(r, 3, 8)
    gen = sg_mod.SequenceGenerator(
        [model], task.target_dictionary, beam_size=3, max_len_a=0,
        max_len_b=10, min_len=1, normalize_scores=True, len_penalty=1.0,
        temperature=1.0)
    sample = {"net_input": {"src_tokens": torch.from_numpy(src),
                            "src_lengths": torch.from_numpy(src_lens)}}
    with torch.no_grad():
        hypos = gen.generate([model], sample)

    from s2st_tpu.generate.sequence_generator import (BeamConfig,
                                                      beam_search_aux)
    k = 3
    enc = fconv_m.encode(variables, cfg, src.astype(np.int32),
                         deterministic=True)
    enc_tiled = {kk: jnp.repeat(v, k, axis=0) for kk, v in enc.items()}
    step_fn = fconv_m.make_beam_step(variables, cfg, enc_tiled)
    cache = fconv_m.init_beam_cache(variables, cfg, enc, k)
    out = beam_search_aux(
        [variables], None, "decoder",
        [jnp.zeros((3, 1, 1))], [enc["encoder_padding_mask"]],
        BeamConfig(beam=k, max_len=10), step_fns=[step_fn],
        init_caches=[cache], vocab_size=G["vocab"])
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    scores = np.asarray(out["scores"])
    for b in range(3):
        for j in range(k):
            ref_toks = hypos[b][j]["tokens"].numpy()
            n = int(lengths[b, j])
            np.testing.assert_array_equal(
                tokens[b, j, 1:n + 1], ref_toks, err_msg=f"hypo[{b}][{j}]")
            assert abs(scores[b, j] - float(hypos[b][j]["score"])) <= 1e-4


def test_fconv_e2e(tmp_path):
    """2-epoch fconv training on a tiny copy task via fairseq-preprocess
    binarized data + the translation task."""
    d = str(tmp_path)
    random.seed(0)
    words = [f"w{i}" for i in range(10)]
    for split, n in (("train", 60), ("valid", 8)):
        with open(f"{d}/{split}.src", "w") as fs, \
                open(f"{d}/{split}.tgt", "w") as ft:
            for _ in range(n):
                toks = random.choices(words, k=random.randint(2, 6))
                fs.write(" ".join(toks) + "\n")
                ft.write(" ".join(toks) + "\n")
    from s2st_tpu.cli.preprocess import main as preprocess_main
    assert preprocess_main([
        "--source-lang", "src", "--target-lang", "tgt",
        "--trainpref", f"{d}/train", "--validpref", f"{d}/valid",
        "--destdir", f"{d}/bin", "--joined-dictionary"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        f"{d}/bin", "--task", "translation", "--arch", "fconv_iwslt_de_en",
        "--criterion", "label_smoothed_cross_entropy",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--decoder-out-embed-dim", "16",
        "--encoder-conv-spec", "[(16, 3)] * 2",
        "--decoder-conv-spec", "[(16, 3)] * 2",
        "--label-smoothing", "0.1", "--max-tokens", "800",
        "--max-epoch", "2", "--optimizer", "adam", "--lr", "0.002",
        "--save-dir", f"{d}/ckpt", "--seed", "1", "--log-interval", "5",
        "--required-batch-size-multiple", "1"]) == 0
    import pathlib
    assert (pathlib.Path(d) / "ckpt" / "checkpoint_last.npz").is_file()


def test_fconv_lm_forward_parity():
    """fconv_lm: decoder-only (no positions, no attention, residual-0 and
    residual-3 specs from the gbw arch family) vs the reference
    FConvLanguageModel."""
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    mod = importlib.import_module("fairseq.models.fconv_lm")

    d = ref.Dictionary()
    for i in range(G["vocab"] - len(d)):
        d.add_symbol(f"w{i}")
    a = argparse.Namespace()
    a.dropout = 0.0
    a.decoder_embed_dim = 12
    a.decoder_layers = "[(16, 3)] + [(8, 1, 0), (8, 3, 0), (16, 1, 2)]"
    a.decoder_attention = "False"
    a.adaptive_softmax_cutoff = None
    a.adaptive_softmax_dropout = 0.0
    a.tokens_per_sample = 32
    a.criterion = "cross_entropy"

    class _Task:
        target_dictionary = d

    torch.manual_seed(9)
    model = mod.FConvLanguageModel.build_model(a, _Task)
    model.eval()

    convs = fconv_m.extend_conv_spec(eval(a.decoder_layers))
    cfg = fconv_m.FConvConfig(
        tgt_vocab=G["vocab"], decoder_embed_dim=12,
        decoder_out_embed_dim=12, decoder_convs=convs,
        decoder_attention=(False,) * len(convs), dropout=0.0,
        positional_embeddings=False, dtype=jnp.float32)
    variables = fconv_m.load_torch_fconv(
        {k: v.detach().float().numpy()
         for k, v in model.state_dict().items()}, cfg)

    r = np.random.RandomState(2)
    src = r.randint(4, G["vocab"], size=(3, 9)).astype(np.int64)
    src[:, 0] = 2
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src))
    out = fconv_m.forward_lm(variables, cfg,
                             {"src_tokens": src.astype(np.int32)},
                             deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)
