"""fairseq checkpoint conversion: export->import roundtrip preserves every
parameter and running stat; converted trees drop into the model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import s2st_transformer as m
from s2st_tpu.models.torch_import import (from_fairseq_state_dict,
                                          to_fairseq_state_dict)
from tests.conftest import make_batch


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a.keys()) == set(b.keys()), (path, a.keys(), b.keys())
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-6, err_msg=path)


def test_roundtrip_full_model(tiny_cfg, tiny_variables):
    sd = to_fairseq_state_dict(tiny_variables)
    # fairseq Linear layout: (out, in)
    assert sd["decoder.feat_proj.weight"].shape == (
        tiny_cfg.out_dim, tiny_cfg.decoder_embed_dim)
    # Conv1d layout: (Cout, Cin, K)
    w = sd["encoder.subsample.conv_layers.0.weight"]
    assert w.shape[2] == tiny_cfg.conv_kernel_sizes[0]
    back = from_fairseq_state_dict(sd)
    _tree_equal(back["params"], tiny_variables["params"])
    _tree_equal(back["stats"], tiny_variables["stats"])


def test_imported_tree_runs_forward(tiny_cfg, tiny_variables):
    sd = to_fairseq_state_dict(tiny_variables)
    back = from_fairseq_state_dict(sd)
    batch = make_batch(tiny_cfg, b=2, src_t=25, tgt_t=11)
    out_a = m.forward(tiny_variables, tiny_cfg, batch, deterministic=True)
    out_b = m.forward(back, tiny_cfg, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_a["post_feat_out"], np.float32),
                               np.asarray(out_b["post_feat_out"], np.float32),
                               atol=1e-5)


def test_partial_checkpoint_no_aux(rng):
    """Checkpoints without aux decoders / ctc map cleanly."""
    cfg = m.S2STConfig(
        src_vocab_size=10, tgt_vocab_size=10, input_feat_per_channel=8,
        conv_channels=8, encoder_layers=1, encoder_embed_dim=8,
        encoder_ffn_embed_dim=16, encoder_attention_heads=2,
        decoder_layers=1, decoder_embed_dim=8, decoder_ffn_embed_dim=16,
        decoder_attention_heads=2, output_frame_dim=8, prenet_dim=8,
        postnet_layers=1, postnet_conv_dim=8, middle_layers=(),
        ctc=False, aux_asr=False, aux_st=False, dtype=jnp.float32)
    variables = m.init_s2st(rng, cfg)
    back = from_fairseq_state_dict(to_fairseq_state_dict(variables))
    assert "aux_asr_decoder" not in back["params"]
    assert "ctc_proj" not in back["params"]["decoder"]
    _tree_equal(back["params"], variables["params"])


def test_generate_from_torch_checkpoint(tiny_cfg, tiny_variables, tmp_path):
    """A torch .pt checkpoint with fairseq naming drives generate_waveform
    end-to-end (load_model_ensemble_and_task parity for the .pt path)."""
    import torch
    from tests.make_tiny_corpus import make_tiny_corpus
    from s2st_tpu.cli.generate_waveform import main as gen_main
    corpus = make_tiny_corpus(tmp_path / "corpus")
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in to_fairseq_state_dict(tiny_variables).items()}
    pt = tmp_path / "ref_ckpt.pt"
    torch.save({"model": sd}, str(pt))

    results = tmp_path / "dump"
    rc = gen_main([
        str(corpus), "--config-yaml", "config.yaml",
        "--gen-subset", "test", "--task", "s2s_translation",
        "--path", str(pt),
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "2", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0,1",
        "--ctc-weight", "1", "--asr-ce-weight", "1", "--st-ce-weight", "1",
        "--asr-decoder-layers", "1", "--asr-decoder-embed-dim", "16",
        "--st-decoder-layers", "1", "--st-decoder-embed-dim", "16",
        "--prenet-dim", "8", "--prenet-layers", "2",
        "--postnet-layers", "2", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8", "--max-tokens", "2000",
        "--max-iter", "8", "--max-source-positions", "256",
        "--max-target-positions", "256",
        "--required-batch-size-multiple", "1", "--spec-bwd-max-iter", "2",
        "--dump-waveforms", "--results-path", str(results),
    ])
    assert rc == 0
    assert len(list((results / "wav").glob("*_pred.wav"))) == 4
