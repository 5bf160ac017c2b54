"""roberta_enc_dec (fairseq/models/roberta/enc_dec.py): a RoBERTa trunk as
encoder + a TransformerDecoder mirrored from the same args, with a full
RobertaLMHead output projection. Reference-numerics forward parity across
all three embedding-sharing modes, plus a translation train+generate e2e
through the learned-position beam (LM-head projection inside the step fn).
"""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import transformer_text as tt

G = dict(vocab=30, dim=16, ffn=32, heads=2, layers=2)


def _build_ref(share_dec: bool, share_all: bool, seed=0):
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    mod = importlib.import_module("fairseq.models.roberta.enc_dec")

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
    a.share_decoder_input_output_embed = share_dec
    a.share_all_embeddings = share_all

    class _Task:
        source_dictionary = d
        dictionary = d

    torch.manual_seed(seed)
    model = mod.RobertaEncDecModel.build_model(a, _Task)
    model.eval()
    return torch, model


def _import(model, share_dec: bool, share_all: bool):
    from s2st_tpu.models.torch_import import _dec_layer, _enc_layer, _lin, \
        _ln
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
    if not share_all:
        dec["embed"] = {"w": sd.pop("decoder.embed_tokens.weight")}
    else:
        sd.pop("decoder.embed_tokens.weight")
    for i in range(G["layers"]):
        dec[f"layer{i}"] = _dec_layer(sd, f"decoder.layers.{i}")
    head = {
        "dense": _lin(sd, "decoder.output_projection.dense", {}),
        "ln": _ln(sd, "decoder.output_projection.layer_norm"),
        "bias": sd.pop("decoder.output_projection.bias"),
    }
    w = sd.pop("decoder.output_projection.weight")
    if not (share_dec or share_all):
        head["w"] = w.T.copy()
    dec["out_proj"] = head
    return jax.tree_util.tree_map(
        jnp.asarray, {"params": {"encoder": enc, "decoder": dec},
                      "stats": {}})


def _cfg(share_dec: bool, share_all: bool):
    return tt.TransformerTextConfig(
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"],
        encoder_layers=G["layers"], encoder_embed_dim=G["dim"],
        encoder_ffn_embed_dim=G["ffn"], encoder_attention_heads=G["heads"],
        decoder_layers=G["layers"], decoder_embed_dim=G["dim"],
        decoder_ffn_embed_dim=G["ffn"], decoder_attention_heads=G["heads"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_fn="gelu", no_scale_embedding=True,
        layernorm_embedding=True, encoder_learned_pos=True,
        decoder_learned_pos=True,
        share_decoder_input_output_embed=share_dec,
        share_all_embeddings=share_all, lm_head_out_proj=True,
        max_source_positions=64, max_target_positions=64,
        dtype=jnp.float32)


def _batch(seed=0, b=3, ts=9, tt_=7):
    r = np.random.RandomState(seed)
    src = np.full((b, ts), 1, np.int64)
    prev = np.full((b, tt_), 1, np.int64)
    for i in range(b):
        sl = r.randint(3, ts + 1) if i else ts
        src[i, :sl] = np.concatenate(
            [[0], r.randint(4, G["vocab"], size=sl - 2), [2]])
        tl = r.randint(2, tt_ + 1) if i else tt_
        prev[i, 0] = 2
        prev[i, 1:tl] = r.randint(4, G["vocab"], size=tl - 1)
    return src, prev


@pytest.mark.parametrize("share_dec,share_all",
                         [(False, False), (True, False), (True, True)],
                         ids=["untied", "share_dec_in_out", "share_all"])
def test_roberta_enc_dec_forward_parity(share_dec, share_all):
    torch, model = _build_ref(share_dec, share_all)
    variables = _import(model, share_dec, share_all)
    cfg = _cfg(share_dec, share_all)

    src, prev = _batch()
    src_lens = (src != 1).sum(1)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy(src_lens),
                              torch.from_numpy(prev))
    out = tt.forward(variables, cfg,
                     {"src_tokens": src.astype(np.int32),
                      "prev_output_tokens": prev.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)


def test_arch_preset_builds_lm_head_config():
    from s2st_tpu.options import build_transformer_text_config, \
        parse_training_args
    a = parse_training_args(["data", "--arch", "roberta_enc_dec"])
    assert (a.decoder_layers, a.decoder_embed_dim,
            a.decoder_ffn_embed_dim) == (12, 768, 3072)
    assert a.encoder_learned_pos and a.decoder_learned_pos
    assert a.no_scale_embedding and a.layernorm_embedding
    assert not a.encoder_normalize_before and not a.decoder_normalize_before
    assert a.max_target_positions == 512
    cfg = build_transformer_text_config(a, 30, 30)
    assert cfg.lm_head_out_proj
    tiny = cfg.replace(
        encoder_layers=G["layers"], decoder_layers=G["layers"],
        encoder_embed_dim=G["dim"], decoder_embed_dim=G["dim"],
        encoder_ffn_embed_dim=G["ffn"], decoder_ffn_embed_dim=G["ffn"],
        encoder_attention_heads=G["heads"],
        decoder_attention_heads=G["heads"],
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"])
    variables = tt.init_transformer(jax.random.PRNGKey(0), tiny)
    head = variables["params"]["decoder"]["out_proj"]
    assert set(head) == {"dense", "ln", "bias", "w"}


def test_roberta_enc_dec_translation_e2e(tmp_path, capsys):
    """Train + beam-generate with --arch roberta_enc_dec: the LM-head
    projection runs inside the jitted learned-position beam step."""
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
        bin_dir, "--task", "translation", "--arch", "roberta_enc_dec",
        "--criterion", "label_smoothed_cross_entropy", *common,
        "--share-decoder-input-output-embed",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation", "--arch", "roberta_enc_dec",
        *common, "--share-decoder-input-output-embed",
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--beam", "2", "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert "BLEU" in out
