"""multilingual_translation task + multilingual_transformer model.

Parity: the reference's own MultilingualTransformerModel is built on a
real MultilingualTranslationTask instance, its genuine state_dict imported
per pair, and per-pair teacher-forced logits compared — with and without
--share-encoders/--share-decoders. A CLI e2e trains two pairs round-robin
with language tokens.
"""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 1e-4
PAIRS = ["de-en", "en-de"]
VOCAB = 24
GEO = dict(dim=16, ffn=32, heads=2, layers=2)


def _dictionary(ref, n):
    d = ref.Dictionary()
    for i in range(n - len(d)):
        d.add_symbol(f"w{i}")
    return d


def _ref_args(share=False):
    a = argparse.Namespace()
    a.lang_pairs = list(PAIRS)
    a.source_lang = None
    a.target_lang = None
    a.encoder_langtok = None
    a.decoder_langtok = False
    a.left_pad_source = True
    a.left_pad_target = False
    a.encoder_embed_dim = GEO["dim"]
    a.encoder_ffn_embed_dim = GEO["ffn"]
    a.encoder_layers = GEO["layers"]
    a.encoder_attention_heads = GEO["heads"]
    a.decoder_embed_dim = GEO["dim"]
    a.decoder_ffn_embed_dim = GEO["ffn"]
    a.decoder_layers = GEO["layers"]
    a.decoder_attention_heads = GEO["heads"]
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.encoder_normalize_before = False
    a.decoder_normalize_before = False
    a.share_all_embeddings = False
    a.share_decoder_input_output_embed = False
    a.share_encoder_embeddings = share
    a.share_decoder_embeddings = share
    a.share_encoders = share
    a.share_decoders = share
    a.encoder_embed_path = None
    a.decoder_embed_path = None
    a.encoder_learned_pos = False
    a.decoder_learned_pos = False
    a.no_token_positional_embeddings = False
    a.no_scale_embedding = False
    a.layernorm_embedding = False
    a.adaptive_softmax_cutoff = None
    a.adaptive_input = False
    a.no_cross_attention = False
    a.cross_self_attention = False
    a.tie_adaptive_weights = False
    a.max_source_positions = 128
    a.max_target_positions = 128
    a.checkpoint_activations = False
    a.offload_activations = False
    a.encoder_layerdrop = 0.0
    a.decoder_layerdrop = 0.0
    a.quant_noise_pq = 0.0
    a.quant_noise_pq_block_size = 8
    a.quant_noise_scalar = 0.0
    return a


@pytest.fixture(scope="module", params=[False, True],
                ids=["separate", "shared"])
def ml_setup(request):
    share = request.param
    ref = load_reference()
    from fairseq.models.multilingual_transformer import \
        MultilingualTransformerModel
    from fairseq.tasks.multilingual_translation import \
        MultilingualTranslationTask

    dicts = {lg: _dictionary(ref, VOCAB) for lg in ("de", "en")}
    args = _ref_args(share)
    task = MultilingualTranslationTask(args, dicts, training=True)
    torch.manual_seed(0)
    model = MultilingualTransformerModel.build_model(args, task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import multilingual_transformer as mt
    from s2st_tpu.models import transformer_text as tt
    from s2st_tpu.models.torch_import import \
        transformer_text_from_fairseq_state_dict

    sd_all = {k: v.detach().float().numpy()
              for k, v in model.state_dict().items()}
    base = tt.TransformerTextConfig(
        src_vocab_size=VOCAB, tgt_vocab_size=VOCAB,
        encoder_layers=GEO["layers"], encoder_embed_dim=GEO["dim"],
        encoder_ffn_embed_dim=GEO["ffn"],
        encoder_attention_heads=GEO["heads"],
        decoder_layers=GEO["layers"], decoder_embed_dim=GEO["dim"],
        decoder_ffn_embed_dim=GEO["ffn"],
        decoder_attention_heads=GEO["heads"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_source_positions=128, max_target_positions=128,
        dtype=jnp.float32)
    cfg = mt.MultilingualConfig(
        lang_pairs=tuple(PAIRS),
        vocab_sizes=(("de", VOCAB), ("en", VOCAB)),
        base=base,
        share_encoder_embeddings=share, share_decoder_embeddings=share,
        share_encoders=share, share_decoders=share)

    encoders, decoders, shared = {}, {}, {}
    for pair in PAIRS:
        src, tgt = pair.split("-")
        pre = f"models.{pair}."
        sub = {k[len(pre):]: v for k, v in sd_all.items()
               if k.startswith(pre)}
        tree = transformer_text_from_fairseq_state_dict(sub)
        ek, dk = cfg.enc_key(src), cfg.dec_key(tgt)
        enc = dict(tree["params"]["encoder"])
        dec = dict(tree["params"]["decoder"])
        if cfg.share_enc_emb:
            shared["enc_embed"] = enc.pop("embed")
        if cfg.share_dec_emb:
            shared["dec_embed"] = dec.pop("embed")
        encoders.setdefault(ek, enc)
        decoders.setdefault(dk, dec)
    params = {"encoders": encoders, "decoders": decoders}
    if shared:
        params["shared"] = shared
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": params, "stats": {}})
    return model, variables, cfg


def test_multilingual_forward_parity(ml_setup):
    model, variables, cfg = ml_setup
    from s2st_tpu.models import multilingual_transformer as mt
    r = np.random.RandomState(0)
    for pair in PAIRS:
        b, ts, tt_ = 3, 9, 7
        src = np.full((b, ts), 1, np.int64)
        prev = np.full((b, tt_), 1, np.int64)
        for i in range(b):
            sl = r.randint(3, ts + 1) if i else ts
            src[i, ts - sl:] = np.concatenate(
                [r.randint(4, VOCAB, size=sl - 1), [2]])
            tl = r.randint(2, tt_ + 1) if i else tt_
            prev[i, 0] = 2
            prev[i, 1:tl] = r.randint(4, VOCAB, size=tl - 1)
        with torch.no_grad():
            logits_ref, _ = model.models[pair](
                torch.from_numpy(src),
                torch.from_numpy((src != 1).sum(1)),
                torch.from_numpy(prev))
        out = mt.forward(variables, cfg,
                         {"src_tokens": src.astype(np.int32),
                          "prev_output_tokens": prev.astype(np.int32)},
                         pair, deterministic=True)
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   logits_ref.numpy(), atol=ATOL,
                                   err_msg=pair)


def test_multilingual_cli_e2e(tmp_path):
    """preprocess de-en + en-de -> round-robin train with lang tokens ->
    updates applied."""
    r = np.random.RandomState(0)
    words = [f"w{i}" for i in range(16)]
    for pair in PAIRS:
        src, tgt = pair.split("-")
        for split, n in (("train", 24), ("valid", 8)):
            for lang in (src, tgt):
                with open(tmp_path / f"{split}.{pair}.{lang}", "w") as f:
                    for _ in range(n):
                        f.write(" ".join(
                            r.choice(words, size=r.randint(3, 8))) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    # one shared dict per language across pairs: binarize each pair with
    # --srcdict/--tgtdict after a first pass builds them
    assert pp(["--source-lang", "de", "--target-lang", "en",
               "--trainpref", str(tmp_path / "train.de-en"),
               "--validpref", str(tmp_path / "valid.de-en"),
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    assert pp(["--source-lang", "en", "--target-lang", "de",
               "--trainpref", str(tmp_path / "train.en-de"),
               "--validpref", str(tmp_path / "valid.en-de"),
               "--srcdict", str(tmp_path / "bin" / "dict.en.txt"),
               "--tgtdict", str(tmp_path / "bin" / "dict.de.txt"),
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(tmp_path / "bin"), "--task", "multilingual_translation",
        "--arch", "multilingual_transformer",
        "--lang-pairs", "de-en,en-de",
        "--encoder-langtok", "src", "--decoder-langtok",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-layers", "2", "--decoder-layers", "2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1


def test_multilingual_generate_cli(tmp_path):
    """Per-pair generation through the generate CLI after round-robin
    training (the reference's multilingual inference path)."""
    r = np.random.RandomState(3)
    words = [f"w{i}" for i in range(16)]
    for pair in PAIRS:
        src, tgt = pair.split("-")
        for split, n in (("train", 16), ("valid", 6), ("test", 6)):
            for lang in (src, tgt):
                with open(tmp_path / f"{split}.{pair}.{lang}", "w") as f:
                    for _ in range(n):
                        f.write(" ".join(
                            r.choice(words, size=r.randint(3, 7))) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--source-lang", "de", "--target-lang", "en",
               "--trainpref", str(tmp_path / "train.de-en"),
               "--validpref", str(tmp_path / "valid.de-en"),
               "--testpref", str(tmp_path / "test.de-en"),
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    assert pp(["--source-lang", "en", "--target-lang", "de",
               "--trainpref", str(tmp_path / "train.en-de"),
               "--validpref", str(tmp_path / "valid.en-de"),
               "--srcdict", str(tmp_path / "bin" / "dict.en.txt"),
               "--tgtdict", str(tmp_path / "bin" / "dict.de.txt"),
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    common_model = [
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    ]
    assert train_main([
        str(tmp_path / "bin"), "--task", "multilingual_translation",
        "--arch", "multilingual_transformer",
        "--lang-pairs", "de-en,en-de",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--save-dir", str(tmp_path / "ckpt"),
        "--max-tokens", "256", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ] + common_model) == 0
    from s2st_tpu.cli.generate import main as gen_main
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = gen_main([
            str(tmp_path / "bin"), "--task", "multilingual_translation",
            "--arch", "multilingual_transformer",
            "--lang-pairs", "de-en,en-de",
            "--source-lang", "de", "--target-lang", "en",
            "--path", str(tmp_path / "ckpt" / "checkpoint_last.npz"),
            "--gen-subset", "test", "--beam", "2", "--max-len-b", "15",
            "--max-tokens", "256", "--required-batch-size-multiple", "1",
        ] + common_model)
    assert rc == 0
    assert "H-" in buf.getvalue()
