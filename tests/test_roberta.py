"""RoBERTa + masked_lm: reference-numerics forward parity, masking
distribution semantics, and an e2e masked-LM pretraining run.
"""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import roberta as rb

G = dict(vocab=32, dim=16, ffn=32, heads=2, layers=2)


def _build_ref(seed=0):
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    mod = importlib.import_module("fairseq.models.roberta.model")

    d = ref.Dictionary()
    for i in range(G["vocab"] - len(d)):
        d.add_symbol(f"w{i}")
    a = argparse.Namespace()
    a.encoder_layers = G["layers"]
    a.encoder_embed_dim = G["dim"]
    a.encoder_ffn_embed_dim = G["ffn"]
    a.encoder_attention_heads = G["heads"]
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.max_positions = 64
    a.tokens_per_sample = 64
    mod.base_architecture(a)
    a.dropout = 0.0
    a.attention_dropout = 0.0

    class _Task:
        source_dictionary = d
        dictionary = d

    torch.manual_seed(seed)
    model = mod.RobertaModel.build_model(a, _Task)
    model.eval()
    return model


def _import(model):
    from s2st_tpu.models.torch_import import _enc_layer, _lin, _ln
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    pre = "encoder.sentence_encoder"
    enc = {
        "embed": {"w": sd.pop(f"{pre}.embed_tokens.weight")},
        "embed_positions": {"w": sd.pop(f"{pre}.embed_positions.weight")},
        "embed_ln": _ln(sd, f"{pre}.layernorm_embedding"),
    }
    for i in range(G["layers"]):
        enc[f"layer{i}"] = _enc_layer(sd, f"{pre}.layers.{i}")
    head = {
        "dense": _lin(sd, "encoder.lm_head.dense", {}),
        "ln": _ln(sd, "encoder.lm_head.layer_norm"),
        "bias": sd.pop("encoder.lm_head.bias"),
    }
    sd.pop("encoder.lm_head.weight", None)   # tied to embed
    return jax.tree_util.tree_map(
        jnp.asarray, {"params": {"encoder": enc, "lm_head": head},
                      "stats": {}})


def _cfg():
    return rb.RobertaConfig(
        vocab_size=G["vocab"], encoder_layers=G["layers"],
        encoder_embed_dim=G["dim"], encoder_ffn_embed_dim=G["ffn"],
        encoder_attention_heads=G["heads"], dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, max_positions=64,
        dtype=jnp.float32)


def test_roberta_forward_parity():
    torch = pytest.importorskip("torch")
    model = _build_ref()
    variables = _import(model)
    cfg = _cfg()
    r = np.random.RandomState(0)
    b, t = 3, 11
    toks = np.full((b, t), 1, np.int64)
    for i in range(b):
        L = r.randint(4, t + 1)
        toks[i, 0] = 0
        toks[i, 1:L - 1] = r.randint(4, G["vocab"], size=L - 2)
        toks[i, L - 1] = 2
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(toks))
    out = rb.forward(variables, cfg, {"src_tokens": toks.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)


def test_classification_head_runs():
    cfg = _cfg()
    v = rb.init_roberta(jax.random.PRNGKey(0), cfg)
    head = rb.init_classification_head(jax.random.PRNGKey(1), cfg, 3)
    toks = np.array([[0, 5, 6, 2], [0, 7, 2, 1]], np.int32)
    out = rb.classification_forward(v, cfg, head, toks,
                                    deterministic=True)
    assert out.shape == (2, 3)


def test_mask_tokens_dataset_semantics():
    from s2st_tpu.data.mask_tokens_dataset import MaskedTokensDataset

    class _Rows:
        def __init__(self, rows):
            self.rows = [np.asarray(x, np.int64) for x in rows]
            self.sizes = np.asarray([len(x) for x in rows])

        def __len__(self):
            return len(self.rows)

        def __getitem__(self, i):
            return self.rows[i]

    r = np.random.RandomState(0)
    rows = [np.concatenate([r.randint(4, 28, size=30), [2]])
            for _ in range(20)]
    base = _Rows(rows)
    mask_idx = 28
    ds = MaskedTokensDataset(base, base.sizes, 29, mask_idx)
    n_masked = n_total = n_masktok = 0
    for i in range(20):
        it = ds[i]
        assert len(it.source) == len(rows[i]) + 1   # prepended <s>
        masked = it.target != 1
        n_masked += masked.sum()
        n_total += len(it.source)
        n_masktok += (it.source == mask_idx).sum()
        # targets at masked positions hold the ORIGINAL tokens
        orig = np.concatenate([[0], rows[i]])
        np.testing.assert_array_equal(it.target[masked], orig[masked])
        # determinism: same index -> same draw
        it2 = ds[i]
        np.testing.assert_array_equal(it.source, it2.source)
    assert 0.10 < n_masked / n_total < 0.20          # ~15% masked
    assert n_masktok < n_masked                      # 10% kept/random


def test_masked_lm_e2e(tmp_path, capsys):
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 120), ("valid", 12)):
        with open(f"{d}/{split}.txt", "w") as f:
            for _ in range(n):
                L = random.randint(5, 12)
                f.write(" ".join(
                    f"w{random.randrange(15)}" for _ in range(L)) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    pp(["--only-source", "--trainpref", f"{d}/train.txt",
        "--validpref", f"{d}/valid.txt", "--destdir", bin_dir,
        "--workers", "1"])
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "masked_lm", "--arch", "roberta",
        "--criterion", "masked_lm",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "512", "--max-epoch", "2",
        "--tokens-per-sample", "32", "--sample-break-mode", "complete",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    import os
    assert os.path.exists(f"{d}/ckpt/checkpoint_last.npz")


def test_sentence_prediction_e2e(tmp_path):
    """input0 + label binarized dirs -> finetune a tiny classifier: loss
    decreases and accuracy is reported."""
    d = str(tmp_path)
    random.seed(0)
    # classify: does the sentence contain w0?
    for split, n in (("train", 120), ("valid", 16)):
        with open(f"{d}/{split}.inp", "w") as fi, \
                open(f"{d}/{split}.lbl", "w") as fl:
            for _ in range(n):
                L = random.randint(3, 8)
                idx = [random.randrange(1, 10) for _ in range(L)]
                if random.random() < 0.5:
                    idx[random.randrange(L)] = 0
                fi.write(" ".join(f"w{i}" for i in idx) + "\n")
                fl.write(("yes" if 0 in idx else "no") + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    pp(["--only-source", "--trainpref", f"{d}/train.inp",
        "--validpref", f"{d}/valid.inp",
        "--destdir", f"{d}/bin/input0", "--workers", "1"])
    pp(["--only-source", "--trainpref", f"{d}/train.lbl",
        "--validpref", f"{d}/valid.lbl",
        "--destdir", f"{d}/bin/label", "--workers", "1"])
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        f"{d}/bin", "--task", "sentence_prediction", "--arch", "roberta",
        "--criterion", "sentence_prediction", "--num-classes", "2",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "512", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    import os
    assert os.path.exists(f"{d}/ckpt/checkpoint_last.npz")
