"""BART family: reference-numerics forward parity (learned positions +
layernorm embedding + shared embeddings), denoising-dataset noising
properties, and an e2e denoising pretrain + generate run.
"""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import transformer_text as tt

G = dict(vocab=30, dim=16, ffn=32, heads=2, layers=2)


def test_bart_forward_parity():
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    mod = importlib.import_module("fairseq.models.bart.model")

    d = ref.Dictionary()
    for i in range(G["vocab"] - len(d)):
        d.add_symbol(f"w{i}")
    a = argparse.Namespace()
    a.encoder_layers = G["layers"]
    a.encoder_embed_dim = G["dim"]
    a.encoder_ffn_embed_dim = G["ffn"]
    a.encoder_attention_heads = G["heads"]
    a.decoder_layers = G["layers"]
    a.decoder_embed_dim = G["dim"]
    a.decoder_ffn_embed_dim = G["ffn"]
    a.decoder_attention_heads = G["heads"]
    a.dropout = 0.0
    a.max_source_positions = 64
    a.max_target_positions = 64
    mod.bart_base_architecture(a)
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0

    class _Task:
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(0)
    model = mod.BARTModel.build_model(a, _Task)
    model.eval()

    from s2st_tpu.models.torch_import import _dec_layer, _enc_layer, _ln
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    enc = {"embed": {"w": sd.pop("encoder.embed_tokens.weight")},
           "embed_positions": {
               "w": sd.pop("encoder.embed_positions.weight")},
           "embed_ln": _ln(sd, "encoder.layernorm_embedding")}
    for i in range(G["layers"]):
        enc[f"layer{i}"] = _enc_layer(sd, f"encoder.layers.{i}")
    dec = {"embed_positions": {
               "w": sd.pop("decoder.embed_positions.weight")},
           "embed_ln": _ln(sd, "decoder.layernorm_embedding")}
    for i in range(G["layers"]):
        dec[f"layer{i}"] = _dec_layer(sd, f"decoder.layers.{i}")
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"encoder": enc, "decoder": dec},
                      "stats": {}})

    cfg = tt.TransformerTextConfig(
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"],
        encoder_layers=G["layers"], encoder_embed_dim=G["dim"],
        encoder_ffn_embed_dim=G["ffn"], encoder_attention_heads=G["heads"],
        decoder_layers=G["layers"], decoder_embed_dim=G["dim"],
        decoder_ffn_embed_dim=G["ffn"], decoder_attention_heads=G["heads"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_fn="gelu", no_scale_embedding=True,
        share_all_embeddings=True,
        share_decoder_input_output_embed=True, layernorm_embedding=True,
        encoder_learned_pos=True, decoder_learned_pos=True,
        max_source_positions=64, max_target_positions=64,
        dtype=jnp.float32)

    r = np.random.RandomState(0)
    b, ts, tt_ = 3, 9, 7
    src = np.full((b, ts), 1, np.int64)
    prev = np.full((b, tt_), 1, np.int64)
    for i in range(b):
        sl = r.randint(3, ts + 1) if i else ts
        src[i, ts - sl:] = np.concatenate(
            [[0], r.randint(4, G["vocab"], size=sl - 2), [2]])
        tl = r.randint(2, tt_ + 1) if i else tt_
        prev[i, 0] = 2
        prev[i, 1:tl] = r.randint(4, G["vocab"], size=tl - 1)
    src_lens = (src != 1).sum(1)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy(src_lens),
                              torch.from_numpy(prev),
                              features_only=False)
    out = tt.forward(variables, cfg,
                     {"src_tokens": src.astype(np.int32),
                      "prev_output_tokens": prev.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)


def test_denoising_dataset_properties():
    from s2st_tpu.data.denoising_dataset import DenoisingDataset

    class _Rows:
        def __init__(self, rows):
            self.rows = [np.asarray(x, np.int64) for x in rows]
            self.sizes = np.asarray([len(x) for x in rows])

        def __len__(self):
            return len(self.rows)

        def __getitem__(self, i):
            return self.rows[i]

    r = np.random.RandomState(0)
    rows = [r.randint(4, 26, size=r.randint(10, 30)) for _ in range(16)]
    base = _Rows(rows)
    mask_idx = 28
    ds = DenoisingDataset(base, base.sizes, 29, mask_idx,
                          mask_ratio=0.3, random_ratio=0.1,
                          insert_ratio=0.1, rotate_ratio=0.5,
                          permute_sentence_ratio=0.0,
                          mask_length="span-poisson")
    for i in range(16):
        it = ds[i]
        # clean target wrapped in bos/eos
        np.testing.assert_array_equal(
            it.target, np.concatenate([[0], rows[i], [2]]))
        # noised source keeps the bos/eos frame
        assert it.source[0] == 0 and it.source[-1] == 2
        assert (it.source == mask_idx).sum() > 0 or len(rows[i]) < 5
        # deterministic per index
        np.testing.assert_array_equal(it.source, ds[i].source)
    # replace_length 0 deletes instead of masking
    ds0 = DenoisingDataset(base, base.sizes, 29, mask_idx,
                           mask_ratio=0.3, replace_length=0)
    it = ds0[0]
    assert (it.source == mask_idx).sum() == 0
    assert len(it.source) < len(it.target)


def test_denoising_e2e(tmp_path, capsys):
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 100), ("valid", 10), ("test", 6)):
        with open(f"{d}/{split}.txt", "w") as f:
            for _ in range(n):
                L = random.randint(5, 10)
                f.write(" ".join(
                    f"w{random.randrange(12)}" for _ in range(L)) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    pp(["--only-source", "--trainpref", f"{d}/train.txt",
        "--validpref", f"{d}/valid.txt", "--testpref", f"{d}/test.txt",
        "--destdir", bin_dir, "--workers", "1"])
    common = ["--encoder-layers", "1", "--decoder-layers", "1",
              "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
              "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim",
              "32", "--encoder-attention-heads", "2",
              "--decoder-attention-heads", "2"]
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "denoising", "--arch", "bart_base",
        "--criterion", "cross_entropy", *common,
        "--mask", "0.3", "--mask-length", "span-poisson",
        "--rotate", "0.0", "--tokens-per-sample", "32",
        "--sample-break-mode", "complete",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    import os
    assert os.path.exists(f"{d}/ckpt/checkpoint_last.npz")


def test_bart_translation_generate_e2e(tmp_path, capsys):
    """bart_base as a translation model: train + beam-generate through the
    learned-position step-fn beam path."""
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 80), ("valid", 8), ("test", 6)):
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
        bin_dir, "--task", "translation", "--arch", "bart_base",
        "--criterion", "label_smoothed_cross_entropy", *common,
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation", "--arch", "bart_base", *common,
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--beam", "2", "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out
