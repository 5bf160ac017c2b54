"""XLM/BERT masked_lm model family + cross_lingual_lm task.

Parity: the reference's own MaskedLMModel (fairseq/models/masked_lm.py)
built at two operating points — the sinusoidal/untied base arch with
segments, and a BERT-style tiny (learned pos, tied embeddings, embedding
LayerNorm, NSP head) — genuine state_dicts imported, logits + pooled
output + sentence logits compared. Plus a 2-language cross_lingual_lm
CLI e2e with segment labels.
"""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 1e-4
VOCAB = 30
GEO = dict(dim=16, ffn=32, heads=2, layers=2)


def _dictionary(ref):
    d = ref.Dictionary()
    for i in range(VOCAB - len(d)):
        d.add_symbol(f"w{i}")
    return d


def _args(bert: bool):
    a = argparse.Namespace()
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.act_dropout = 0.0
    a.encoder_ffn_embed_dim = GEO["ffn"]
    a.encoder_layers = GEO["layers"]
    a.encoder_attention_heads = GEO["heads"]
    a.encoder_embed_dim = GEO["dim"]
    a.share_encoder_input_output_embed = bert
    a.encoder_learned_pos = bert
    a.no_token_positional_embeddings = False
    a.num_segment = 2
    a.sentence_class_num = 2
    a.sent_loss = bert
    a.apply_bert_init = False
    a.activation_fn = "gelu" if bert else "relu"
    a.pooler_activation_fn = "tanh"
    a.encoder_normalize_before = bert
    a.max_positions = 64
    a.tokens_per_sample = 64
    return a


@pytest.fixture(scope="module", params=[False, True],
                ids=["xlm_sinusoidal", "bert_tied"])
def mlm_setup(request):
    bert = request.param
    ref = load_reference()
    from fairseq.models.masked_lm import MaskedLMModel

    a = _args(bert)

    class _Task:
        dictionary = _dictionary(ref)
        source_dictionary = dictionary
        target_dictionary = dictionary

    torch.manual_seed(0)
    model = MaskedLMModel.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import masked_lm_xlm as mx
    from s2st_tpu.models.torch_import import _enc_layer, _lin, _ln

    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    enc = {"embed": {
        "w": sd.pop("encoder.sentence_encoder.embed_tokens.weight")}}
    if bert:
        enc["embed_positions"] = {"w": sd.pop(
            "encoder.sentence_encoder.embed_positions.weight")}
    else:
        sd.pop("encoder.sentence_encoder.embed_positions._float_tensor",
               None)
    if "encoder.sentence_encoder.segment_embeddings.weight" in sd:
        enc["segment_embeddings"] = {"w": sd.pop(
            "encoder.sentence_encoder.segment_embeddings.weight")}
    if "encoder.sentence_encoder.emb_layer_norm.weight" in sd:
        enc["emb_ln"] = _ln(sd, "encoder.sentence_encoder.emb_layer_norm")
    for i in range(GEO["layers"]):
        enc[f"layer{i}"] = _enc_layer(
            sd, f"encoder.sentence_encoder.layers.{i}")
    head = {
        "lm_head_transform_weight": _lin(
            sd, "encoder.lm_head_transform_weight", {}),
        "ln": _ln(sd, "encoder.layer_norm"),
        "bias": sd.pop("encoder.lm_output_learned_bias"),
        "masked_lm_pooler": _lin(sd, "encoder.masked_lm_pooler", {}),
    }
    if "encoder.embed_out.weight" in sd:
        head["embed_out"] = {"w": sd.pop("encoder.embed_out.weight").T.copy()}
    if "encoder.sentence_projection_layer.weight" in sd:
        head["sentence_projection_layer"] = {"w": sd.pop(
            "encoder.sentence_projection_layer.weight").T.copy()}
    leftover = [k for k in sd if "version" not in k]
    assert not leftover, f"unmapped: {leftover}"
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"encoder": enc, "head": head},
                      "stats": {}})
    cfg = mx.MaskedLMXLMConfig(
        vocab_size=VOCAB, encoder_layers=GEO["layers"],
        encoder_embed_dim=GEO["dim"], encoder_ffn_embed_dim=GEO["ffn"],
        encoder_attention_heads=GEO["heads"],
        dropout=0.0, attention_dropout=0.0, act_dropout=0.0,
        activation_fn=a.activation_fn, encoder_learned_pos=bert,
        num_segment=2, share_encoder_input_output_embed=bert,
        encoder_normalize_before=bert, sent_loss=bert,
        sentence_class_num=2, max_positions=64)
    return model, variables, cfg


def test_masked_lm_xlm_forward_parity(mlm_setup):
    model, variables, cfg = mlm_setup
    from s2st_tpu.models import masked_lm_xlm as mx

    r = np.random.RandomState(0)
    b, t = 3, 11
    toks = np.full((b, t), 1, np.int64)
    seg = np.zeros((b, t), np.int64)
    for i in range(b):
        n = t if i == 0 else r.randint(4, t + 1)
        toks[i, :n] = np.concatenate([[2], r.randint(4, VOCAB, size=n - 1)])
        seg[i, :n] = r.randint(0, 2)
    with torch.no_grad():
        logits_ref, extra = model(torch.from_numpy(toks),
                                  segment_labels=torch.from_numpy(seg))
    out = mx.forward(variables, cfg,
                     {"src_tokens": toks.astype(np.int32),
                      "segment_labels": seg.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["pooled_output"]),
                               extra["pooled_output"].numpy(), atol=ATOL)
    if extra["sentence_logits"] is not None:
        np.testing.assert_allclose(np.asarray(out["sentence_logits"]),
                                   extra["sentence_logits"].numpy(),
                                   atol=ATOL)


def test_cross_lingual_lm_cli_e2e(tmp_path):
    """Two monolingual streams -> XLM MLM pretraining through the train
    CLI (segments = language ids); updates applied."""
    import random
    random.seed(0)
    d = str(tmp_path)
    for lang in ("en", "fr"):
        for split, n in (("train", 60), ("valid", 8)):
            with open(f"{d}/{split}.{lang}.txt", "w") as f:
                for _ in range(n):
                    L = random.randint(3, 8)
                    f.write(" ".join(
                        f"{lang}{random.randrange(10)}"
                        for _ in range(L)) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    # joint dictionary over both languages
    assert pp(["--only-source",
               "--trainpref", f"{d}/train.en.txt",
               "--destdir", f"{d}/bin0", "--dict-only",
               "--workers", "1"]) == 0 or True
    # build a shared dict from both corpora by concatenation
    with open(f"{d}/all.txt", "w") as f:
        for lang in ("en", "fr"):
            f.write(open(f"{d}/train.{lang}.txt").read())
    assert pp(["--only-source", "--trainpref", f"{d}/all.txt",
               "--destdir", f"{d}/dictdir", "--dict-only",
               "--workers", "1"]) == 0
    import os
    import shutil
    os.makedirs(f"{d}/bin", exist_ok=True)
    shutil.copy(f"{d}/dictdir/dict.txt", f"{d}/bin/dict.txt")
    for lang in ("en", "fr"):
        assert pp(["--only-source",
                   "--trainpref", f"{d}/train.{lang}.txt",
                   "--validpref", f"{d}/valid.{lang}.txt",
                   "--srcdict", f"{d}/bin/dict.txt",
                   "--destdir", f"{d}/tmp.{lang}", "--workers", "1"]) == 0
        for split in ("train", "valid"):
            for ext in ("bin", "idx"):
                src = f"{d}/tmp.{lang}/{split}.{ext}"
                if os.path.exists(src):
                    shutil.copy(src, f"{d}/bin/{split}.{lang}.{ext}")
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        f"{d}/bin", "--task", "cross_lingual_lm",
        "--arch", "masked_lm", "--criterion", "legacy_masked_lm_loss",
        "--monolingual-langs", "en,fr",
        "--tokens-per-sample", "32",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--save-dir", f"{d}/ckpt",
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(f"{d}/ckpt/checkpoint_last.npz")
    assert meta["step"] >= 1
