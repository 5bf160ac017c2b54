"""Reference-numerics parity for the LSTM and LightConv/DynamicConv
language models (fairseq/models/lstm_lm.py + lightconv_lm.py) plus a
train->eval_lm CLI e2e for each.

The reference builds are its own LSTMLanguageModel / LightConvLanguageModel
(genuine state_dicts imported); logits are compared teacher-forced.
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


def _dictionary(ref):
    d = ref.Dictionary()
    for i in range(VOCAB - len(d)):
        d.add_symbol(f"w{i}")
    return d


def _tokens(r, b, t):
    out = r.randint(4, VOCAB, size=(b, t)).astype(np.int64)
    out[:, 0] = 2  # eos-led LM input
    return out


# ---------------------------------------------------------------------------
# lstm_lm
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("residuals", [False, True])
def test_lstm_lm_forward_parity(residuals):
    ref = load_reference()
    from fairseq.models.lstm_lm import LSTMLanguageModel

    d = _dictionary(ref)
    a = argparse.Namespace()
    a.dropout = 0.0
    a.decoder_embed_dim = 12
    a.decoder_embed_path = None
    a.decoder_hidden_size = 16
    a.decoder_layers = 2
    a.decoder_out_embed_dim = 8
    a.decoder_attention = "0"
    a.decoder_dropout_in = 0.0
    a.decoder_dropout_out = 0.0
    a.share_decoder_input_output_embed = False
    a.adaptive_softmax_cutoff = None
    a.residuals = residuals
    a.criterion = "cross_entropy"

    class _Task:
        dictionary = d
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(0)
    model = LSTMLanguageModel.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import lstm as lstm_m
    from s2st_tpu.models.torch_import import _lin, _lstm_block

    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    dec = {"embed": {"w": sd.pop("decoder.embed_tokens.weight")}}
    for i in range(2):
        dec[f"cell{i}"] = _lstm_block(sd, f"decoder.layers.{i}")
    dec["additional_fc"] = _lin(sd, "decoder.additional_fc", {})
    dec["fc_out"] = _lin(sd, "decoder.fc_out", {})
    assert not sd, f"unmapped: {list(sd)}"
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"decoder": dec}, "stats": {}})

    cfg = lstm_m.LSTMConfig(
        src_vocab_size=VOCAB, tgt_vocab_size=VOCAB,
        decoder_embed_dim=12, decoder_hidden_size=16, decoder_layers=2,
        decoder_out_embed_dim=8, decoder_attention=False,
        decoder_dropout_in=0.0, decoder_dropout_out=0.0,
        residuals=residuals, is_lm=True, dtype=jnp.float32)

    r = np.random.RandomState(0)
    toks = _tokens(r, 3, 7)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(toks))
    out = lstm_m.forward_lm(variables, cfg,
                            {"src_tokens": toks.astype(np.int32)},
                            deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# lightconv_lm / dynamicconv variant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("conv_type", ["lightweight", "dynamic"])
def test_lightconv_lm_forward_parity(conv_type):
    ref = load_reference()
    from fairseq.models.lightconv_lm import LightConvLanguageModel

    d = _dictionary(ref)
    a = argparse.Namespace()
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.relu_dropout = 0.0
    a.input_dropout = 0.0
    a.weight_dropout = 0.0
    a.decoder_embed_dim = 16
    a.decoder_output_dim = 16
    a.decoder_input_dim = 16
    a.decoder_ffn_embed_dim = 32
    a.decoder_layers = 2
    a.decoder_attention_heads = 2
    a.decoder_normalize_before = True
    a.adaptive_softmax_cutoff = None
    a.adaptive_softmax_dropout = 0
    a.adaptive_softmax_factor = 4
    a.no_token_positional_embeddings = False
    a.share_decoder_input_output_embed = False
    a.character_embeddings = False
    a.decoder_conv_dim = 16
    a.decoder_glu = True
    a.decoder_conv_type = conv_type
    a.weight_softmax = True
    a.adaptive_input = False
    a.tie_adaptive_weights = False
    a.decoder_kernel_size_list = [3, 5]
    a.tokens_per_sample = 64
    a.criterion = "cross_entropy"

    class _Task:
        dictionary = d
        output_dictionary = d
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(0)
    model = LightConvLanguageModel.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import lightconv_model as lc
    from s2st_tpu.models import transformer_text as tt
    from s2st_tpu.models.torch_import import _lin, _ln

    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    dec = {"embed": {"w": sd.pop("decoder.embed_tokens.weight")}}
    for i in range(2):
        pre = f"decoder.layers.{i}"
        layer = {
            "linear1": _lin(sd, f"{pre}.linear1", {}),
            "linear2": _lin(sd, f"{pre}.linear2", {}),
            "conv_ln": _ln(sd, f"{pre}.conv_layer_norm"),
            "fc1": _lin(sd, f"{pre}.fc1", {}),
            "fc2": _lin(sd, f"{pre}.fc2", {}),
            "final_ln": _ln(sd, f"{pre}.final_layer_norm"),
        }
        if f"{pre}.conv.weight" in sd:
            layer["conv_weight"] = sd.pop(f"{pre}.conv.weight")[:, 0, :]
        if f"{pre}.conv.weight_linear.weight" in sd:
            layer["weight_linear"] = _lin(sd, f"{pre}.conv.weight_linear", {})
        dec[f"layer{i}"] = layer
    if "decoder.layer_norm.weight" in sd:
        dec["final_ln"] = _ln(sd, "decoder.layer_norm")
    dec["out_proj"] = {"w": sd.pop("decoder.embed_out").T.copy()}
    # sinusoidal positions are a buffer, not a parameter
    leftover = [k for k in sd
                if "version" not in k and "_float_tensor" not in k]
    assert not leftover, f"unmapped: {leftover}"
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"decoder": dec}, "stats": {}})

    base = tt.TransformerTextConfig(
        src_vocab_size=VOCAB, tgt_vocab_size=VOCAB,
        decoder_layers=2, decoder_embed_dim=16, decoder_ffn_embed_dim=32,
        decoder_attention_heads=2, decoder_normalize_before=True,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_target_positions=64, dtype=jnp.float32)
    cfg = lc.LightConvConfig(
        base=base, conv_type=conv_type, decoder_kernel_sizes=(3, 5),
        decoder_conv_dim=16, decoder_glu=True, weight_softmax=True,
        weight_dropout=0.0, input_dropout=0.0, relu_dropout=0.0)

    r = np.random.RandomState(0)
    toks = _tokens(r, 3, 7)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(toks))
    out = lc.forward_lm(variables, cfg,
                        {"src_tokens": toks.astype(np.int32)},
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# CLI e2e: preprocess -> train -> eval_lm for both archs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("arch,flags", [
    ("lstm_lm", ["--decoder-embed-dim", "16", "--decoder-hidden-size", "16",
                 "--decoder-layers", "1", "--decoder-out-embed-dim", "16",
                 "--residuals"]),
    ("lightconv_lm", ["--decoder-embed-dim", "16",
                      "--decoder-ffn-embed-dim", "32",
                      "--decoder-layers", "2",
                      "--decoder-attention-heads", "2",
                      "--decoder-kernel-size-list", "3,5"]),
])
def test_lm_cli_e2e(tmp_path, arch, flags):
    r = np.random.RandomState(0)
    words = [f"w{i}" for i in range(20)]
    for split, n in (("train", 40), ("valid", 8)):
        with open(tmp_path / f"{split}.txt", "w") as f:
            for _ in range(n):
                f.write(" ".join(r.choice(words, size=r.randint(3, 9))) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--only-source",
               "--trainpref", str(tmp_path / "train.txt"),
               "--validpref", str(tmp_path / "valid.txt"),
               "--destdir", str(tmp_path / "bin"),
               "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(tmp_path / "bin"), "--task", "language_modeling",
        "--arch", arch, "--criterion", "cross_entropy",
        "--tokens-per-sample", "32", "--sample-break-mode", "none",
        "--save-dir", str(tmp_path / "ckpt"),
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ] + flags) == 0
    from s2st_tpu.cli.eval_lm import main as eval_main
    rc = eval_main([
        str(tmp_path / "bin"), "--task", "language_modeling",
        "--arch", arch,
        "--path", str(tmp_path / "ckpt" / "checkpoint_last.npz"),
        "--tokens-per-sample", "32", "--sample-break-mode", "none",
        "--max-tokens", "512", "--gen-subset", "valid",
    ] + [f for f in flags if f != "--residuals"]
      + (["--residuals"] if "--residuals" in flags else []))
    assert rc == 0
