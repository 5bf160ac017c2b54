"""HuBERT frontend: JAX inference path vs a torch oracle assembled from
public wav2vec2/HuBERT building blocks (conv extractor with GroupNorm,
grouped pos-conv with weight norm, post-LN transformer layers). Validates
both the math and the fairseq-checkpoint key mapping."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from s2st_tpu.models.hubert import (HubertConfig, extract_features,
                                    init_hubert, load_torch_hubert)

CFG = HubertConfig(
    conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
    encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
    encoder_attention_heads=2, conv_pos=8, conv_pos_groups=2)


class TorchOracle(nn.Module):
    """Inference path of fairseq HubertModel (hubert.py:377-384, 451-474,
    encoder from wav2vec2.py) with hubert-base structure at tiny dims;
    state-dict keys follow the fairseq layout for the import test."""

    def __init__(self, cfg: HubertConfig):
        super().__init__()
        self.cfg = cfg
        convs = []
        in_d = 1
        for i, (d, k, s) in enumerate(cfg.conv_layers):
            block = [nn.Conv1d(in_d, d, k, stride=s, bias=False),
                     nn.Dropout(0.0)]
            if i == 0:
                block.append(nn.GroupNorm(d, d, affine=True))
            convs.append(nn.Sequential(*block))
            in_d = d
        self.feature_extractor = _FE(convs)
        self.layer_norm = nn.LayerNorm(in_d)
        self.post_extract_proj = nn.Linear(in_d, cfg.encoder_embed_dim)
        self.encoder = _Enc(cfg)

    def extract(self, source, lengths):
        x = source.unsqueeze(1)
        for i, conv in enumerate(self.feature_extractor.conv_layers):
            x = conv(x)
            x = F.gelu(x)
        x = x.transpose(1, 2)  # (B, T, C)
        out_lens = lengths
        for _, k, s in self.cfg.conv_layers:
            out_lens = (out_lens - k) // s + 1
        x = self.layer_norm(x)
        x = self.post_extract_proj(x)
        pad = torch.arange(x.shape[1])[None] >= out_lens[:, None]
        x = x.masked_fill(pad.unsqueeze(-1), 0.0)
        x = self.encoder(x, pad)
        return x, out_lens


class _FE(nn.Module):
    def __init__(self, convs):
        super().__init__()
        self.conv_layers = nn.ModuleList(convs)


class _Enc(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.encoder_embed_dim
        conv = nn.Conv1d(d, d, cfg.conv_pos, padding=cfg.conv_pos // 2,
                         groups=cfg.conv_pos_groups)
        self.pos_conv = nn.Sequential(weight_norm(conv, dim=2))
        self.layer_norm = nn.LayerNorm(d)
        self.layers = nn.ModuleList(
            [_Layer(cfg) for _ in range(cfg.encoder_layers)])
        self.cfg = cfg

    def forward(self, x, pad):
        h = self.pos_conv[0](x.transpose(1, 2))
        if self.cfg.conv_pos % 2 == 0:
            h = h[:, :, :-1]
        x = x + F.gelu(h).transpose(1, 2)
        x = self.layer_norm(x)  # layer_norm_first=False
        for layer in self.layers:
            x = layer(x, pad)
        return x


class _Layer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.encoder_embed_dim
        self.self_attn = nn.MultiheadAttention(
            d, cfg.encoder_attention_heads, batch_first=True)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, cfg.encoder_ffn_embed_dim)
        self.fc2 = nn.Linear(cfg.encoder_ffn_embed_dim, d)
        self.final_layer_norm = nn.LayerNorm(d)

    def forward(self, x, pad):
        h, _ = self.self_attn(x, x, x, key_padding_mask=pad,
                              need_weights=False)
        x = self.self_attn_layer_norm(x + h)
        h = self.fc2(F.gelu(self.fc1(x)))
        return self.final_layer_norm(x + h)


def _fairseq_state_dict(oracle: TorchOracle):
    """Rename the oracle's state dict into the fairseq key layout."""
    sd = {}
    for k, v in oracle.state_dict().items():
        k = k.replace("pos_conv.0.parametrizations.weight.original0",
                      "pos_conv.0.weight_g")
        k = k.replace("pos_conv.0.parametrizations.weight.original1",
                      "pos_conv.0.weight_v")
        if k.startswith("encoder.layers") and ".self_attn." in k:
            # torch MHA stores packed in_proj -> split to q/k/v
            if "in_proj_weight" in k or "in_proj_bias" in k:
                continue
        sd[k] = v
    # split packed qkv
    for i, layer in enumerate(oracle.encoder.layers):
        w = layer.self_attn.in_proj_weight
        b = layer.self_attn.in_proj_bias
        d = w.shape[1]
        for j, name in enumerate(("q", "k", "v")):
            sd[f"encoder.layers.{i}.self_attn.{name}_proj.weight"] = \
                w[j * d:(j + 1) * d]
            sd[f"encoder.layers.{i}.self_attn.{name}_proj.bias"] = \
                b[j * d:(j + 1) * d]
            sd.pop(f"encoder.layers.{i}.self_attn.out_proj.weight_g", None)
    return sd


def test_matches_torch_oracle(tmp_path):
    torch.manual_seed(0)
    oracle = TorchOracle(CFG).eval()
    B, L = 2, 1600
    src = torch.randn(B, L) * 0.1
    lengths = torch.tensor([1600, 1200])
    with torch.no_grad():
        ref, ref_lens = oracle.extract(src, lengths)

    ckpt = tmp_path / "hubert_tiny.pt"
    torch.save({"model": _fairseq_state_dict(oracle)}, str(ckpt))
    params, _ = load_torch_hubert(str(ckpt), CFG)
    ours, out_lens = extract_features(params, CFG, jnp.asarray(src.numpy()),
                                      jnp.asarray(lengths.numpy()))
    np.testing.assert_array_equal(np.asarray(out_lens), ref_lens.numpy())
    ours = np.asarray(ours)
    ref = ref.numpy()
    for row in range(B):
        n = int(ref_lens[row])
        np.testing.assert_allclose(ours[row, :n], ref[row, :n], atol=2e-4)


def test_s2st_model_with_hubert_frontend():
    """Full S2ST forward with the HuBERT frontend; raw-wave batch."""
    from s2st_tpu.models import s2st_transformer as m
    cfg = m.S2STConfig(
        src_vocab_size=10, tgt_vocab_size=10, input_feat_per_channel=8,
        conv_kernel_sizes=(5,), conv_channels=16, encoder_layers=1,
        encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_layers=1, decoder_embed_dim=16,
        decoder_ffn_embed_dim=32, decoder_attention_heads=2,
        output_frame_dim=8, prenet_layers=1, prenet_dim=8,
        postnet_layers=1, postnet_conv_dim=8, middle_layers=(),
        ctc=False, aux_asr=False, aux_st=False,
        use_hubert=True, hubert_hidden=16,
        max_source_positions=128, max_target_positions=64,
        dtype=jnp.float32)
    # shrink the frontend for CPU tests by monkeypatching the default config
    import s2st_tpu.models.hubert as hub
    orig = hub.HubertConfig
    try:
        hub.HubertConfig = lambda **kw: CFG  # type: ignore
        variables = m.init_s2st(jax.random.PRNGKey(0), cfg)
        assert "hubert" in variables["params"]
        r = np.random.RandomState(0)
        batch = {
            "src_speech": r.randn(2, 1600).astype(np.float32) * 0.1,
            "src_speech_lens": np.array([1600, 1200], np.int32),
            "prev_output_tokens": r.randn(2, 9, 8).astype(np.float32),
            "target_lengths": np.array([9, 7], np.int32),
            "tgt_speech": r.randn(2, 9, 8).astype(np.float32),
        }
        out = m.forward(variables, cfg, batch, deterministic=True)
        assert out["feat_out"].shape == (2, 9, 8)
        # grads must NOT flow into the frozen frontend
        def loss(params):
            o = m.forward({"params": params, "stats": variables["stats"]},
                          cfg, batch, deterministic=True)
            return jnp.sum(o["feat_out"].astype(jnp.float32) ** 2)
        g = jax.grad(loss)(variables["params"])
        hub_norm = sum(float(jnp.sum(jnp.abs(x)))
                       for x in jax.tree_util.tree_leaves(g["hubert"]))
        enc_norm = sum(float(jnp.sum(jnp.abs(x)))
                       for x in jax.tree_util.tree_leaves(g["encoder"]))
        assert hub_norm == 0.0
        assert enc_norm > 0.0
    finally:
        hub.HubertConfig = orig


def test_hubert_cli_training_e2e(tmp_path):
    """Raw-audio corpus -> use_hubert training through the full CLI
    (collater_audio + frozen frontend path, s2st_transformer.py:239-256)."""
    from tests.make_tiny_corpus import make_tiny_corpus
    from s2st_tpu.cli.train import main as train_main
    corpus = make_tiny_corpus(tmp_path / "corpus", src_wav=True)
    rc = train_main([
        str(corpus), "--save-dir", str(tmp_path / "ckpts"),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--arch", "s2st_transformer", "--use-hubert", "True",
        "--hubert-hidden", "16", "--hubert-layers", "1",
        "--hubert-ffn", "32", "--hubert-heads", "2",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-tokens", "16000", "--max-epoch", "1", "--max-update", "2",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
        "--clip-norm", "1.0", "--required-batch-size-multiple", "1",
        "--max-source-positions", "16000", "--max-target-positions", "128",
        "--disable-validation",
    ])
    assert rc == 0
    assert (tmp_path / "ckpts" / "checkpoint_last.npz").is_file()
