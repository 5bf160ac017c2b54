"""LSTM family: reference-numerics forward parity (uni/bidirectional,
hidden-size projections), beam-decode parity vs the reference
SequenceGenerator through the generic step-fn beam interface, and e2e.
"""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import lstm as lstm_m

G = dict(vocab=30)


def _build_ref(ref, seed=0, **over):
    torch = pytest.importorskip("torch")
    import importlib
    mod = importlib.import_module("fairseq.models.lstm")

    d = ref.Dictionary()
    for i in range(G["vocab"] - len(d)):
        d.add_symbol(f"w{i}")
    a = argparse.Namespace()
    a.dropout = 0.0
    a.encoder_embed_dim = 16
    a.encoder_layers = 2
    a.decoder_embed_dim = 16
    a.decoder_layers = 2
    a.decoder_out_embed_dim = 16
    a.max_source_positions = 256
    a.max_target_positions = 256
    a.criterion = "cross_entropy"
    for k, v in over.items():
        setattr(a, k, v)
    mod.base_architecture(a)
    a.encoder_dropout_in = 0.0
    a.encoder_dropout_out = 0.0
    a.decoder_dropout_in = 0.0
    a.decoder_dropout_out = 0.0

    class _Task:
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(seed)
    model = mod.LSTMModel.build_model(a, _Task)
    model.eval()
    return model, a, _Task


def _our_cfg(a):
    return lstm_m.LSTMConfig(
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"],
        encoder_embed_dim=a.encoder_embed_dim,
        encoder_hidden_size=a.encoder_hidden_size,
        encoder_layers=a.encoder_layers,
        encoder_bidirectional=a.encoder_bidirectional,
        encoder_dropout_in=0.0, encoder_dropout_out=0.0,
        decoder_embed_dim=a.decoder_embed_dim,
        decoder_hidden_size=a.decoder_hidden_size,
        decoder_layers=a.decoder_layers,
        decoder_out_embed_dim=a.decoder_out_embed_dim,
        decoder_attention=str(a.decoder_attention) in ("1", "True", "true"),
        decoder_dropout_in=0.0, decoder_dropout_out=0.0,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32)


def _import(model):
    from s2st_tpu.models.torch_import import lstm_from_fairseq_state_dict
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    return jax.tree_util.tree_map(jnp.asarray,
                                  lstm_from_fairseq_state_dict(sd))


def _src(r, b, t, left_pad=True):
    lens = r.randint(2, t + 1, size=b)
    lens[0] = t
    out = np.full((b, t), 1, np.int64)
    for i in range(b):
        row = np.concatenate([r.randint(4, G["vocab"], size=lens[i] - 1),
                              [2]])
        if left_pad:
            out[i, t - lens[i]:] = row
        else:
            out[i, :lens[i]] = row
    return out, lens.astype(np.int64)


def _prev(r, b, t):
    lens = r.randint(2, t + 1, size=b)
    lens[0] = t
    out = np.full((b, t), 1, np.int64)
    for i in range(b):
        out[i, 0] = 2
        out[i, 1:lens[i]] = r.randint(4, G["vocab"], size=lens[i] - 1)
    return out


@pytest.mark.parametrize("mode", ["base", "bidir", "proj"])
def test_lstm_forward_parity(mode):
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    over = {}
    if mode == "bidir":
        over = dict(encoder_bidirectional=True)
    if mode == "proj":
        # encoder_output_units != decoder_hidden -> hidden/cell projections
        over = dict(encoder_hidden_size=24, decoder_hidden_size=16,
                    decoder_out_embed_dim=12)
    model, a, _ = _build_ref(ref, seed=hash(mode) % 100, **over)
    variables = _import(model)
    cfg = _our_cfg(a)

    r = np.random.RandomState(0)
    src, src_lens = _src(r, 4, 11, left_pad=True)
    # the reference encoder expects length-sorted batches
    order = np.argsort(-src_lens)
    src, src_lens = src[order], src_lens[order]
    prev = _prev(r, 4, 7)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy(src_lens),
                              torch.from_numpy(prev))
    out = lstm_m.forward(variables, cfg,
                         {"src_tokens": src.astype(np.int32),
                          "prev_output_tokens": prev.astype(np.int32)},
                         deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)


def test_lstm_beam_parity_vs_reference_generator():
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    sg_mod = importlib.import_module("fairseq.sequence_generator")
    model, a, task = _build_ref(ref, seed=3)
    variables = _import(model)
    cfg = _our_cfg(a)

    r = np.random.RandomState(3)
    src, src_lens = _src(r, 3, 8, left_pad=True)
    order = np.argsort(-src_lens)
    src, src_lens = src[order], src_lens[order]
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
    enc = lstm_m.encode(variables, cfg, src.astype(np.int32),
                        deterministic=True)
    eo = jnp.repeat(enc["encoder_out"], k, axis=0)
    ep = jnp.repeat(enc["encoder_padding_mask"], k, axis=0)
    step_fn = lstm_m.make_beam_step(variables, cfg, eo, ep)
    cache = lstm_m.init_beam_cache(variables, cfg, enc, k)
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
                tokens[b, j, 1:n + 1], ref_toks,
                err_msg=f"hypo[{b}][{j}]")
            assert abs(scores[b, j] - float(hypos[b][j]["score"])) <= 1e-4


def test_lstm_e2e(tmp_path, capsys):
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
        "--trainpref", f"{d}/train", "--validpref", f"{d}/valid",
        "--testpref", f"{d}/test", "--destdir", bin_dir, "--workers", "1"])
    common = ["--encoder-layers", "1", "--decoder-layers", "1",
              "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
              "--decoder-out-embed-dim", "16"]
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "translation", "--arch", "lstm",
        "--criterion", "cross_entropy", *common,
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation", "--arch", "lstm", *common,
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--beam", "2", "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out
