"""speech_to_text / text_to_speech task wrappers (parity:
fairseq/tasks/speech_to_text.py + text_to_speech.py over the S2T manifest
schema of fairseq/data/audio/speech_to_text_dataset.py)."""

import argparse

import numpy as np
import pytest

from tests.make_tiny_corpus import make_tiny_s2t_corpus


def _args(root, **kw):
    from s2st_tpu.options import _two_pass, get_training_parser
    base = [str(root), "--task", kw.pop("task", "speech_to_text"),
            "--config-yaml", "config.yaml"]
    for k, v in kw.pop("flags", {}).items():
        base += [k] + ([str(v)] if v is not None else [])
    return _two_pass(get_training_parser(), base)


def test_s2t_task_dataset(tmp_path):
    """Manifest columns map onto the S2ST schema: audio -> src side,
    tgt_text -> target tokens; batching cost follows the audio frames."""
    from s2st_tpu.registry import TASK_REGISTRY, populate_builtin
    populate_builtin()
    root = make_tiny_s2t_corpus(tmp_path)
    args = _args(root, flags={"--arch": "s2t_transformer",
                              "--criterion": "label_smoothed_cross_entropy"})
    task = TASK_REGISTRY["speech_to_text"].setup_task(args)
    ds = task.load_dataset("train")
    assert len(ds) == 10
    it = ds[0]
    assert it.src_speech.shape[1] == 8          # real fbank side
    assert it.tgt_speech.shape[0] <= 1 or it.tgt_speech.shape == (1, 8)
    assert it.tgt_text[-1] == task.tgt_dict.eos_index
    batch = ds.collate([ds[0], ds[1]])
    assert batch["src_speech"].shape[0] == 2
    assert batch["tgt_text"].shape[0] == 2
    assert ds.num_frames(0) == int(ds.src_n_frames[0])


def test_s2t_lang_tag_prepended(tmp_path):
    """prepend_tgt_lang_tag: <lang:xx> becomes the first target token
    (speech_to_text_dataset.py:245-265)."""
    from s2st_tpu.registry import TASK_REGISTRY, populate_builtin
    populate_builtin()
    root = make_tiny_s2t_corpus(tmp_path, lang_tags=True)
    args = _args(root, flags={"--arch": "s2t_transformer",
                              "--criterion": "label_smoothed_cross_entropy"})
    task = TASK_REGISTRY["speech_to_text"].setup_task(args)
    ds = task.load_dataset("train")
    for i, lang in ((0, "en"), (1, "es")):
        tag = task.tgt_dict.index(f"<lang:{lang}>")
        assert tag != task.tgt_dict.unk_index
        assert int(ds[i].tgt_text[0]) == tag


def test_s2t_train_cli_e2e(tmp_path):
    """1-epoch ASR/ST training through --task speech_to_text with the
    reference's criterion name."""
    root = make_tiny_s2t_corpus(tmp_path)
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(root), "--task", "speech_to_text", "--config-yaml",
        "config.yaml", "--arch", "s2t_transformer",
        "--criterion", "label_smoothed_cross_entropy",
        "--train-subset", "train", "--valid-subset", "dev",
        "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-layers", "2", "--decoder-layers", "2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--label-smoothing", "0.1",
        "--max-tokens", "2000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    assert (tmp_path / "ckpt" / "checkpoint_last.npz").is_file()


def test_tts_train_cli_e2e(tmp_path):
    """1-epoch TTS training through --task text_to_speech (audio is the
    target side; tts_transformer aliases the shared t2s decoder)."""
    root = make_tiny_s2t_corpus(tmp_path)
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(root), "--task", "text_to_speech", "--config-yaml",
        "config.yaml", "--arch", "tts_transformer",
        "--criterion", "t2s_loss",
        "--train-subset", "train", "--valid-subset", "dev",
        "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-transformer-layers", "2", "--decoder-layers", "2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--output-frame-dim", "8",
        "--max-tokens", "2000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    assert (tmp_path / "ckpt" / "checkpoint_last.npz").is_file()


def test_tacotron2_train_cli_e2e(tmp_path):
    """1-epoch Tacotron2 training through --task text_to_speech with the
    reference's arch/criterion names (tacotron_2 + tacotron2 loss)."""
    root = make_tiny_s2t_corpus(tmp_path)
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(root), "--task", "text_to_speech", "--config-yaml",
        "config.yaml", "--arch", "tacotron_2",
        "--criterion", "tacotron2",
        "--train-subset", "train", "--valid-subset", "dev",
        "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-embed-dim", "16", "--encoder-conv-layers", "1",
        "--encoder-conv-kernel-size", "3",
        "--attention-dim", "8", "--attention-conv-dim", "4",
        "--attention-conv-kernel-size", "3",
        "--prenet-layers", "1", "--prenet-dim", "8",
        "--postnet-layers", "2", "--postnet-conv-dim", "8",
        "--decoder-lstm-layers", "1", "--decoder-lstm-dim", "12",
        "--output-frame-dim", "8",
        "--max-tokens", "2000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    ckpt = tmp_path / "ckpt" / "checkpoint_last.npz"
    assert ckpt.is_file()
    # updates must have APPLIED (a NaN loss silently skips every update and
    # leaves step at 0 — regression guard for the all-pad-row -inf softmax)
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    tree, meta = load_checkpoint_file(str(ckpt))
    assert meta["step"] >= 1

    # drive AR generation from the trained params (library surface)
    import jax.numpy as jnp
    import jax

    from s2st_tpu.models import tacotron2 as tc2
    params = {}
    for k, v in tree.items():
        if k.startswith("params::") or k.startswith("stats::"):
            node = params
            parts = k.split("::")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.asarray(v)
    variables = {"params": params.get("params", {}),
                 "stats": params.get("stats", {})}
    cfg = tc2.Tacotron2Config(
        vocab_size=variables["params"]["encoder"]["embed_tokens"]["w"].shape[0],
        encoder_embed_dim=16, encoder_conv_layers=1,
        encoder_conv_kernel_size=3, attention_dim=8, attention_conv_dim=4,
        attention_conv_kernel_size=3, prenet_layers=1, prenet_dim=8,
        postnet_layers=2, postnet_conv_dim=8, decoder_lstm_layers=1,
        decoder_lstm_dim=12, output_frame_dim=8)
    src = np.array([[4, 5, 6, 2], [7, 8, 2, 1]], np.int32)
    out = tc2.generate_features(variables, cfg, src,
                                np.array([4, 3], np.int32), max_iter=10)
    assert np.isfinite(np.asarray(out["feature"])).all()
    assert out["feature"].shape == (2, 10, 8)
