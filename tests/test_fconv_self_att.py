"""fconv_self_att (stories model) parity vs the reference's own
FConvModelSelfAtt: base operating point (cross-attention only) and the
writing-prompts one (gated, downsampled multi-head self-attention,
projected inputs, encoder attention). Plus a preprocess->train CLI e2e
and the gated fusion path on a frozen copy."""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 2e-4
VOCAB = 24


def _dictionary(ref):
    d = ref.Dictionary()
    for i in range(VOCAB - len(d)):
        d.add_symbol(f"w{i}")
    return d


def _args(wp: bool):
    a = argparse.Namespace()
    a.dropout = 0.0
    a.encoder_embed_dim = 16
    a.decoder_embed_dim = 16
    a.decoder_out_embed_dim = 12
    a.max_source_positions = 64
    a.max_target_positions = 64
    a.pretrained = "False"
    a.pretrained_checkpoint = ""
    if wp:
        a.encoder_layers = "[(8, 3)] * 1 + [(16, 3)] * 1"
        a.decoder_layers = "[(16, 4)] * 2"
        a.decoder_attention = "True"
        a.self_attention = "True"
        a.encoder_attention = "True"
        a.multihead_attention_nheads = 1
        a.multihead_self_attention_nheads = 2
        a.encoder_attention_nheads = 1
        a.project_input = "True"
        a.gated_attention = "True"
        a.downsample = "True"
    else:
        a.encoder_layers = "[(16, 3)] * 2"
        a.decoder_layers = "[(16, 3)] * 2"
        a.decoder_attention = "True"
        a.self_attention = "False"
        a.encoder_attention = "False"
        a.multihead_attention_nheads = 1
        a.multihead_self_attention_nheads = 1
        a.encoder_attention_nheads = 1
        a.project_input = "False"
        a.gated_attention = "False"
        a.downsample = "False"
    return a


def _wn_lin(sd, prefix):
    g = sd.pop(prefix + ".weight_g")
    v = sd.pop(prefix + ".weight_v")
    w = g * v / np.linalg.norm(v, axis=1, keepdims=True)
    out = {"w": w.T.copy()}
    if prefix + ".bias" in sd:
        out["b"] = sd.pop(prefix + ".bias")
    return out


def _plain_lin(sd, prefix):
    out = {"w": sd.pop(prefix + ".weight").T.copy()}
    if prefix + ".bias" in sd:
        out["b"] = sd.pop(prefix + ".bias")
    return out


def _gated(sd, prefix):
    return {"l1": _wn_lin(sd, prefix + ".0"),
            "l2": _wn_lin(sd, prefix + ".2"),
            "l3": _wn_lin(sd, prefix + ".4")}


def _dmha(sd, prefix, *, project_input, gated, downsample, num_heads):
    p = {}
    if downsample:
        for h in range(num_heads):
            hp = {}
            if gated:
                q = _gated(sd, f"{prefix}.{h}.in_proj_q")
                k = _gated(sd, f"{prefix}.{h}.in_proj_k.1")
                v = _gated(sd, f"{prefix}.{h}.in_proj_v.1")
            else:
                q = _wn_lin(sd, f"{prefix}.{h}.in_proj_q")
                k = _wn_lin(sd, f"{prefix}.{h}.in_proj_k.1")
                v = _wn_lin(sd, f"{prefix}.{h}.in_proj_v.1")
            if project_input:
                hp["q"], hp["k"], hp["v"] = q, k, v
            hp["out"] = _wn_lin(sd, f"{prefix}.{h}.out_proj")
            p[f"head{h}"] = hp
        p["out_proj"] = _wn_lin(sd, f"{prefix}.out_proj")
    else:
        pre = f"{prefix}.attention_module"
        if gated:
            q = _gated(sd, pre + ".in_proj_q")
            k = _gated(sd, pre + ".in_proj_k.0")
            v = _gated(sd, pre + ".in_proj_v.0")
        else:
            q = _wn_lin(sd, pre + ".in_proj_q")
            k = _wn_lin(sd, pre + ".in_proj_k.0")
            v = _wn_lin(sd, pre + ".in_proj_v.0")
        if project_input:   # created but UNUSED when project_input=False
            p["q"], p["k"], p["v"] = q, k, v
        p["out"] = _wn_lin(sd, pre + ".out_proj")
    return p


def _selfattn(sd, prefix, *, project_input, gated, downsample, num_heads):
    return {
        "in_proj_q": _plain_lin(sd, prefix + ".in_proj_q"),
        "in_proj_k": _plain_lin(sd, prefix + ".in_proj_k"),
        "in_proj_v": _plain_lin(sd, prefix + ".in_proj_v"),
        "attn": _dmha(sd, prefix + ".attention",
                      project_input=project_input, gated=gated,
                      downsample=downsample, num_heads=num_heads),
        "ln": {"scale": sd.pop(prefix + ".ln.weight"),
               "bias": sd.pop(prefix + ".ln.bias")},
    }


def _import(model, cfg):
    import jax
    import jax.numpy as jnp
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    s = None
    # CompositeEncoder nests the training encoder under "encoder."
    sd = {k.replace("encoder.encoder.", "encoder.", 1): v
          for k, v in sd.items() if "version" not in k}
    enc = {
        "embed": {"w": sd.pop("encoder.embed_tokens.weight")},
        "embed_positions": {"w": sd.pop("encoder.embed_positions.weight")},
        "fc1": _plain_lin(sd, "encoder.fc1"),
        "fc2": _plain_lin(sd, "encoder.fc2"),
    }
    for i in range(len(cfg.encoder_convs)):
        if f"encoder.projections.{i}.weight" in sd:
            enc[f"proj{i}"] = _plain_lin(sd, f"encoder.projections.{i}")
        enc[f"conv{i}"] = {
            "w": sd.pop(f"encoder.convolutions.{i}.weight").copy(),
            "b": sd.pop(f"encoder.convolutions.{i}.bias")}
        if cfg.encoder_attention[i]:
            # encoder SelfAttention always uses the default DMHA flags
            enc[f"selfattn{i}"] = _selfattn(
                sd, f"encoder.attention.{i}",
                project_input=False, gated=False, downsample=False,
                num_heads=cfg.encoder_attention_nheads)
    dec = {
        "embed": {"w": sd.pop("decoder.embed_tokens.weight")},
        "embed_positions": {"w": sd.pop("decoder.embed_positions.weight")},
        "fc1": _plain_lin(sd, "decoder.fc1"),
        "fc2": _plain_lin(sd, "decoder.fc2"),
        "fc3": _plain_lin(sd, "decoder.fc3"),
    }
    for i in range(len(cfg.decoder_convs)):
        if f"decoder.projections.{i}.weight" in sd:
            dec[f"proj{i}"] = _plain_lin(sd, f"decoder.projections.{i}")
        dec[f"conv{i}"] = {
            "w": sd.pop(f"decoder.convolutions.{i}.weight").copy(),
            "b": sd.pop(f"decoder.convolutions.{i}.bias")}
        if cfg.decoder_attention[i]:
            dec[f"attn{i}"] = _dmha(
                sd, f"decoder.attention.{i}",
                project_input=cfg.project_input, gated=False,
                downsample=False, num_heads=cfg.attention_nheads)
            dec[f"attproj{i}"] = _plain_lin(sd, f"decoder.attproj.{i}")
        if cfg.self_attention[i]:
            dec[f"selfattn{i}"] = _selfattn(
                sd, f"decoder.selfattention.{i}",
                project_input=cfg.project_input,
                gated=cfg.gated_attention, downsample=cfg.downsample,
                num_heads=cfg.selfattention_nheads)
    assert not sd, f"unmapped: {list(sd)}"
    return jax.tree_util.tree_map(
        jnp.asarray, {"params": {"encoder": enc, "decoder": dec},
                      "stats": {}})


@pytest.mark.parametrize("wp", [False, True], ids=["base", "wp"])
def test_fconv_self_att_forward_parity(wp):
    ref = load_reference()
    from fairseq.models.fconv_self_att import FConvModelSelfAtt

    a = _args(wp)

    class _Task:
        source_dictionary = _dictionary(ref)
        target_dictionary = source_dictionary

    torch.manual_seed(0)
    model = FConvModelSelfAtt.build_model(a, _Task)
    model.eval()

    from s2st_tpu.models import fconv_self_att as fsa
    from s2st_tpu.options import build_fconv_self_att_config
    a2 = argparse.Namespace(**vars(a))
    a2.encoder_conv_spec = a.encoder_layers
    a2.decoder_conv_spec = a.decoder_layers
    a2.fp16 = a2.bf16 = False
    cfg = build_fconv_self_att_config(a2, VOCAB, VOCAB)
    variables = _import(model, cfg)

    r = np.random.RandomState(0)
    b, ts, tt_ = 2, 9, 7
    # unpadded rows: the reference stories decoder applies no padding
    # masks in attention, so parity is checked dense
    src = r.randint(4, VOCAB, size=(b, ts)).astype(np.int64)
    src[:, -1] = 2
    prev = np.concatenate(
        [np.full((b, 1), 2), r.randint(4, VOCAB, size=(b, tt_ - 1))],
        axis=1).astype(np.int64)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy((src != 1).sum(1)),
                              torch.from_numpy(prev))
    out = fsa.forward(variables, cfg,
                      {"src_tokens": src.astype(np.int32),
                       "prev_output_tokens": prev.astype(np.int32)},
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=ATOL)


def test_fconv_self_att_cli_e2e(tmp_path):
    r = np.random.RandomState(0)
    words = [f"w{i}" for i in range(16)]
    for split, n in (("train", 24), ("valid", 8)):
        for lang in ("de", "en"):
            with open(tmp_path / f"{split}.{lang}", "w") as f:
                for _ in range(n):
                    f.write(" ".join(
                        r.choice(words, size=r.randint(3, 8))) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--source-lang", "de", "--target-lang", "en",
               "--trainpref", str(tmp_path / "train"),
               "--validpref", str(tmp_path / "valid"),
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(tmp_path / "bin"), "--task", "translation",
        "--source-lang", "de", "--target-lang", "en",
        "--arch", "fconv_self_att", "--criterion", "cross_entropy",
        "--encoder-conv-spec", "[(16, 3)] * 2",
        "--decoder-conv-spec", "[(16, 3)] * 2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--decoder-out-embed-dim", "12",
        "--self-attention", "True",
        "--multihead-self-attention-nheads", "2",
        "--project-input", "True", "--gated-attention", "True",
        "--downsample", "True",
        "--save-dir", str(tmp_path / "ckpt"),
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1


def test_fusion_path_runs():
    """--pretrained gated fusion: logits finite, pretrained params get no
    gradient."""
    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import fconv_self_att as fsa
    cfg = fsa.FConvSelfAttConfig(
        src_vocab_size=VOCAB, tgt_vocab_size=VOCAB,
        encoder_embed_dim=8, encoder_convs=((8, 3),),
        decoder_embed_dim=8, decoder_convs=((8, 3),),
        decoder_out_embed_dim=8,
        decoder_attention=(True,), self_attention=(False,),
        encoder_attention=(False,), dropout=0.0,
        max_source_positions=32, max_target_positions=32)
    variables = fsa.init_fconv_self_att(jax.random.PRNGKey(0), cfg)
    variables["params"]["decoder"].update(
        fsa.init_fusion_params(jax.random.PRNGKey(1), cfg))
    pvars = fsa.init_fconv_self_att(jax.random.PRNGKey(2), cfg)

    r = np.random.RandomState(0)
    batch = {"src_tokens": r.randint(4, VOCAB, size=(2, 6)).astype(np.int32),
             "prev_output_tokens":
                 r.randint(4, VOCAB, size=(2, 5)).astype(np.int32)}

    def loss_fn(v):
        out = fsa.forward(v, cfg, batch, deterministic=True,
                          pretrained=(pvars, cfg))
        return jnp.sum(out["logits"] ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["params"]["decoder"]["gate1"]["w"])
    assert np.abs(g).sum() > 0
