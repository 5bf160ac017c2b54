"""translation_from_pretrained_bart / _xlm tasks.

Oracles: mBART append-lang-id dataset semantics (source ends [src_lang],
target ends [tgt_lang], prev_output starts with [tgt_lang]); XLM warm
start copies embed/positions/layers into the transformer halves and
leaves cross-attention fresh. CLI e2e: mBART-style fine-tune + generate
with the [tgt_lang] stop token; XLM-pretrained encoder fine-tune.
"""

import os

import numpy as np
import pytest


def _make_pair_corpus(tmp_path, r, n_train=24, n_valid=8):
    words = [f"w{i}" for i in range(16)]
    for split, n in (("train", n_train), ("valid", n_valid),
                     ("test", n_valid)):
        for lang in ("de", "en"):
            with open(tmp_path / f"{split}.{lang}", "w") as f:
                for _ in range(n):
                    f.write(" ".join(
                        r.choice(words, size=r.randint(3, 8))) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--source-lang", "de", "--target-lang", "en",
               "--trainpref", str(tmp_path / "train"),
               "--validpref", str(tmp_path / "valid"),
               "--testpref", str(tmp_path / "test"),
               "--joined-dictionary",
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    return str(tmp_path / "bin")


def test_bart_append_lang_id_semantics(tmp_path):
    r = np.random.RandomState(0)
    bin_dir = _make_pair_corpus(tmp_path, r)
    from s2st_tpu.options import _two_pass, get_training_parser
    args = _two_pass(get_training_parser(), [
        bin_dir, "--task", "translation_from_pretrained_bart",
        "--source-lang", "de", "--target-lang", "en",
        "--langs", "de,en", "--arch", "transformer_tiny",
        "--criterion", "label_smoothed_cross_entropy"])
    from s2st_tpu.registry import get_task, populate_builtin
    populate_builtin()
    task = get_task("translation_from_pretrained_bart").setup_task(args)
    src_id = task.src_dict.index("[de]")
    tgt_id = task.tgt_dict.index("[en]")
    assert src_id != task.src_dict.unk() and tgt_id != task.tgt_dict.unk()
    assert task.src_dict.index("<mask>") != task.src_dict.unk()
    ds = task.load_dataset("train")
    it = ds[0]
    assert it.source[-1] == src_id
    assert it.target[-1] == tgt_id
    batch = ds.collate([ds[i] for i in range(4)])
    # prev_output starts with the APPENDED [tgt_lang] (eos-to-front)
    assert (batch["prev_output_tokens"][:, 0] == tgt_id).all()
    assert task.generation_eos() == tgt_id


def test_bart_finetune_and_generate_cli_e2e(tmp_path):
    r = np.random.RandomState(1)
    bin_dir = _make_pair_corpus(tmp_path, r)
    from s2st_tpu.cli.train import main as train_main
    common = [
        bin_dir, "--task", "translation_from_pretrained_bart",
        "--source-lang", "de", "--target-lang", "en",
        "--langs", "de,en",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.2",
        "--arch", "transformer_tiny",
        "--encoder-layers", "2", "--decoder-layers", "2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    ]
    assert train_main(common + [
        "--save-dir", str(tmp_path / "ckpt"),
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1
    from s2st_tpu.cli.generate import main as gen_main
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = gen_main(common + [
            "--path", str(tmp_path / "ckpt" / "checkpoint_last.npz"),
            "--gen-subset", "test", "--beam", "2", "--max-len-b", "20",
            "--max-tokens", "512", "--required-batch-size-multiple", "1",
        ])
    assert rc == 0
    out = buf.getvalue()
    assert "H-" in out
    # hypotheses must not CONTAIN the [en] stop symbol (it terminates)
    for line in out.splitlines():
        if line.startswith("H-"):
            assert "[en]" not in line.split("\t")[-1]


def test_xlm_warm_start(tmp_path):
    """The transformer encoder (embed/positions/layers) equals the XLM
    checkpoint's after warm start; cross-attn stays fresh; training runs."""
    import jax
    import jax.numpy as jnp

    r = np.random.RandomState(2)
    bin_dir = _make_pair_corpus(tmp_path, r)
    from s2st_tpu.options import _two_pass, get_training_parser
    args = _two_pass(get_training_parser(), [
        bin_dir, "--task", "translation_from_pretrained_xlm",
        "--source-lang", "de", "--target-lang", "en",
        "--arch", "transformer_from_pretrained_xlm",
        "--criterion", "label_smoothed_cross_entropy",
        "--encoder-layers", "2", "--decoder-layers", "2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--max-source-positions", "64", "--max-target-positions", "64",
        "--pretrained-xlm-checkpoint", str(tmp_path / "xlm.npz")])
    from s2st_tpu.registry import get_task, populate_builtin
    populate_builtin()
    task = get_task("translation_from_pretrained_xlm").setup_task(args)
    vocab = len(task.src_dict)

    # build + save a genuine masked_lm_xlm checkpoint at matching geometry
    from s2st_tpu.models import masked_lm_xlm as mx
    from s2st_tpu.train.checkpoint import save_checkpoint_file
    from s2st_tpu.train.optim import adam
    from s2st_tpu.train.trainer import create_train_state
    xcfg = mx.MaskedLMXLMConfig(
        vocab_size=vocab, encoder_layers=2, encoder_embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_attention_heads=2,
        encoder_learned_pos=True, num_segment=0, max_positions=64)
    xvars = mx.init_masked_lm_xlm(jax.random.PRNGKey(7), xcfg)
    save_checkpoint_file(str(tmp_path / "xlm.npz"),
                         create_train_state(xvars, adam()))

    cfg, init_fn, _ = task.build_model_and_loss()
    variables = init_fn(jax.random.PRNGKey(0))
    enc = variables["params"]["encoder"]
    np.testing.assert_array_equal(
        np.asarray(enc["embed"]["w"]),
        np.asarray(xvars["params"]["encoder"]["embed"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(enc["embed_positions"]["w"]),
        np.asarray(xvars["params"]["encoder"]["embed_positions"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(enc["layer0"]["fc1"]["w"]),
        np.asarray(xvars["params"]["encoder"]["layer0"]["fc1"]["w"]))
    # decoder warm-started too (default: both halves), cross-attn fresh
    dec = variables["params"]["decoder"]
    np.testing.assert_array_equal(
        np.asarray(dec["layer0"]["fc1"]["w"]),
        np.asarray(xvars["params"]["encoder"]["layer0"]["fc1"]["w"]))
    assert "cross_attn" in dec["layer0"]

    # one training step runs green through the CLI
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "translation_from_pretrained_xlm",
        "--source-lang", "de", "--target-lang", "en",
        "--arch", "transformer_from_pretrained_xlm",
        "--criterion", "label_smoothed_cross_entropy",
        "--encoder-layers", "2", "--decoder-layers", "2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--max-source-positions", "64", "--max-target-positions", "64",
        "--pretrained-xlm-checkpoint", str(tmp_path / "xlm.npz"),
        "--save-dir", str(tmp_path / "ckpt2"),
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
