"""LightConv/DynamicConv model family: reference-numerics forward parity,
incremental-step == teacher-forced consistency, and e2e train+generate.
"""

import argparse
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import lightconv_model as lc
from s2st_tpu.models import transformer_text as tt

G = dict(vocab=30, dim=16, ffn=32, heads=2)


def _build_ref(ref, conv_type="lightweight", seed=0, glu=True):
    torch = pytest.importorskip("torch")
    import importlib
    mod = importlib.import_module("fairseq.models.lightconv")

    d = ref.Dictionary()
    for i in range(G["vocab"] - len(d)):
        d.add_symbol(f"w{i}")
    a = argparse.Namespace()
    a.encoder_embed_dim = G["dim"]
    a.encoder_ffn_embed_dim = G["ffn"]
    a.encoder_layers = 2
    a.encoder_attention_heads = G["heads"]
    a.decoder_embed_dim = G["dim"]
    a.decoder_ffn_embed_dim = G["ffn"]
    a.decoder_layers = 2
    a.decoder_attention_heads = G["heads"]
    a.encoder_kernel_size_list = [3, 5]
    a.decoder_kernel_size_list = [3, 5]
    a.encoder_conv_type = conv_type
    a.decoder_conv_type = conv_type
    a.encoder_glu = glu
    a.decoder_glu = glu
    a.weight_softmax = True
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.relu_dropout = 0.0
    a.input_dropout = 0.0
    a.weight_dropout = 0.0
    a.max_source_positions = 256
    a.max_target_positions = 256
    mod.base_architecture(a)
    for f in ("dropout", "attention_dropout", "relu_dropout",
              "input_dropout", "weight_dropout"):
        setattr(a, f, 0.0)

    class _Task:
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(seed)
    model = mod.LightConvModel.build_model(a, _Task)
    model.eval()
    return model, a


def _import(model, cfg):
    """torch LightConvModel state_dict -> our tree."""
    from s2st_tpu.models.torch_import import _lin, _ln, _mha
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    enc = {"embed": {"w": sd.pop("encoder.embed_tokens.weight")}}
    for i in range(len(cfg.encoder_kernel_sizes)):
        pre = f"encoder.layers.{i}"
        layer = {
            "linear1": _lin(sd, f"{pre}.linear1", {}),
            "linear2": _lin(sd, f"{pre}.linear2", {}),
            "conv_ln": _ln(sd, f"{pre}.layer_norms.0"),
            "fc1": _lin(sd, f"{pre}.fc1", {}),
            "fc2": _lin(sd, f"{pre}.fc2", {}),
            "final_ln": _ln(sd, f"{pre}.layer_norms.1"),
        }
        if f"{pre}.conv.weight" in sd:
            layer["conv_weight"] = sd.pop(f"{pre}.conv.weight")[:, 0, :]
        if f"{pre}.conv.weight_linear.weight" in sd:
            layer["weight_linear"] = _lin(sd, f"{pre}.conv.weight_linear",
                                          {})
        enc[f"layer{i}"] = layer
    dec = {"embed": {"w": sd.pop("decoder.embed_tokens.weight")}}
    for i in range(len(cfg.decoder_kernel_sizes)):
        pre = f"decoder.layers.{i}"
        layer = {
            "linear1": _lin(sd, f"{pre}.linear1", {}),
            "linear2": _lin(sd, f"{pre}.linear2", {}),
            "conv_ln": _ln(sd, f"{pre}.conv_layer_norm"),
            "cross_attn": _mha(sd, f"{pre}.encoder_attn"),
            "cross_attn_ln": _ln(sd, f"{pre}.encoder_attn_layer_norm"),
            "fc1": _lin(sd, f"{pre}.fc1", {}),
            "fc2": _lin(sd, f"{pre}.fc2", {}),
            "final_ln": _ln(sd, f"{pre}.final_layer_norm"),
        }
        if f"{pre}.conv.weight" in sd:
            layer["conv_weight"] = sd.pop(f"{pre}.conv.weight")[:, 0, :]
        if f"{pre}.conv.weight_linear.weight" in sd:
            layer["weight_linear"] = _lin(sd, f"{pre}.conv.weight_linear",
                                          {})
        dec[f"layer{i}"] = layer
    if "decoder.fc_out.weight" in sd:
        dec["out_proj"] = {"w": sd.pop("decoder.fc_out.weight").T.copy()}
    elif "decoder.embed_out" in sd:
        dec["out_proj"] = {"w": sd.pop("decoder.embed_out").T.copy()}
    return jax.tree_util.tree_map(
        jnp.asarray, {"params": {"encoder": enc, "decoder": dec},
                      "stats": {}})


def _cfg(conv_type="lightweight", glu=True):
    base = tt.TransformerTextConfig(
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"],
        encoder_layers=2, encoder_embed_dim=G["dim"],
        encoder_ffn_embed_dim=G["ffn"], encoder_attention_heads=G["heads"],
        decoder_layers=2, decoder_embed_dim=G["dim"],
        decoder_ffn_embed_dim=G["ffn"], decoder_attention_heads=G["heads"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32)
    return lc.LightConvConfig(
        base=base, conv_type=conv_type,
        encoder_kernel_sizes=(3, 5), decoder_kernel_sizes=(3, 5),
        encoder_conv_dim=G["dim"], decoder_conv_dim=G["dim"],
        encoder_glu=glu, decoder_glu=glu, weight_dropout=0.0,
        input_dropout=0.0, relu_dropout=0.0)


def _batch(r, b=3, ts=9, tt_=7):
    src = np.full((b, ts), 1, np.int64)
    prev = np.full((b, tt_), 1, np.int64)
    for i in range(b):
        sl = r.randint(3, ts + 1) if i else ts
        row = np.concatenate([r.randint(4, G["vocab"], size=sl - 1), [2]])
        src[i, ts - sl:] = row          # left-pad like the collate
        tl = r.randint(2, tt_ + 1) if i else tt_
        prev[i, 0] = 2
        prev[i, 1:tl] = r.randint(4, G["vocab"], size=tl - 1)
    return src, prev


@pytest.mark.parametrize("conv_type", ["lightweight", "dynamic"])
def test_lightconv_forward_parity(conv_type):
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    model, _ = _build_ref(ref, conv_type=conv_type)
    cfg = _cfg(conv_type=conv_type)
    variables = _import(model, cfg)
    r = np.random.RandomState(0)
    src, prev = _batch(r)
    src_lens = (src != 1).sum(1)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy(src_lens),
                              torch.from_numpy(prev))
    out = lc.forward(variables, cfg,
                     {"src_tokens": src.astype(np.int32),
                      "prev_output_tokens": prev.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)


@pytest.mark.parametrize("conv_type", ["lightweight", "dynamic"])
def test_incremental_matches_teacher_forced(conv_type):
    cfg = _cfg(conv_type=conv_type)
    v = lc.init_lightconv(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(1)
    src, prev = _batch(r, b=2, ts=7, tt_=6)
    enc = lc.encode(v, cfg, src.astype(np.int32), deterministic=True)
    tf = np.asarray(jax.nn.log_softmax(lc.decode(
        v, cfg, prev.astype(np.int32), enc["encoder_out"],
        enc["encoder_padding_mask"], deterministic=True).astype(np.float32),
        -1))
    step_fn = lc.make_beam_step(v, cfg, enc["encoder_out"],
                                enc["encoder_padding_mask"])
    cache = lc.init_beam_cache(cfg, 2)
    for t in range(prev.shape[1]):
        lp, cache = step_fn(prev[:, t:t + 1].astype(np.int32),
                            jnp.asarray(t), cache)
        # rows where prev[t] is a real token must match teacher forcing
        for bb in range(2):
            if prev[bb, t] != 1:
                np.testing.assert_allclose(np.asarray(lp)[bb], tf[bb, t],
                                           atol=1e-4,
                                           err_msg=f"b={bb} t={t}")


def test_lightconv_e2e(tmp_path, capsys):
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
        "--trainpref", f"{d}/train", "--validpref", f"{d}/valid",
        "--testpref", f"{d}/test", "--destdir", bin_dir, "--workers", "1"])
    common = ["--encoder-layers", "2", "--decoder-layers", "2",
              "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
              "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim",
              "32", "--encoder-attention-heads", "2",
              "--decoder-attention-heads", "2",
              "--encoder-kernel-size-list", "3,5",
              "--decoder-kernel-size-list", "3,5"]
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "translation", "--arch", "lightconv",
        "--criterion", "label_smoothed_cross_entropy", *common,
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation", "--arch", "lightconv", *common,
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--beam", "2", "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out
