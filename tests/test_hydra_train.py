"""Config-file-driven training entry (the reference's hydra system).

Parity target: fairseq_cli/hydra_train.py:26 (hydra.main over the
ConfigStore tree of fairseq/dataclass/configs.py:1030 with `_name`
registry selectors and dotted CLI overrides). Our equivalent compiles the
YAML tree onto the same two-pass argparse pipeline cli.train uses, so the
round-trip flags -> yaml -> namespace must be exact.
"""

from pathlib import Path

import pytest
import yaml

from tests.make_tiny_corpus import make_tiny_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_corpus_hydra")
    return make_tiny_corpus(root)


FLAGS = [
    "--task", "s2s_translation", "--criterion", "s2st_loss",
    "--arch", "s2st_transformer",
    "--encoder-layers", "2", "--encoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
    "--decoder-layers", "2", "--decoder-embed-dim", "16",
    "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
    "--conv-channels", "16", "--middle-layers", "0",
    "--prenet-dim", "8", "--prenet-layers", "1",
    "--postnet-layers", "1", "--postnet-conv-dim", "8",
    "--output-frame-dim", "8",
    "--max-tokens", "2000", "--max-epoch", "1",
    "--optimizer", "adam", "--lr", "0.001",
    "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
    "--clip-norm", "1.0", "--n-frames-per-step", "1",
    "--bce-pos-weight", "5.0", "--seed", "1",
    "--encoder-normalize-before", "--decoder-normalize-before",
    "--max-source-positions", "128", "--max-target-positions", "128",
    "--required-batch-size-multiple", "1", "--log-interval", "1",
]


def test_roundtrip_flags_to_yaml_to_same_namespace(corpus, tmp_path):
    """flags -> namespace -> dump_config yaml -> build_args == original."""
    from s2st_tpu.cli.hydra_train import build_args, dump_config
    from s2st_tpu.options import parse_training_args

    argv = [str(corpus), "--save-dir", str(tmp_path / "sv"),
            "--config-yaml", "config.yaml"] + FLAGS
    ref = parse_training_args(argv)

    cfg_path = tmp_path / "run.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(dump_config(ref), f)
    got, _ = build_args(str(cfg_path), [])

    ref_d, got_d = vars(ref), vars(got)
    assert set(ref_d) == set(got_d), (
        set(ref_d) ^ set(got_d))
    diffs = {k: (ref_d[k], got_d[k]) for k in ref_d
             if ref_d[k] != got_d[k]}
    assert not diffs, diffs


def test_grouped_yaml_with_name_selectors(tmp_path, corpus):
    """Reference-shaped grouped YAML (task/model/... groups with _name)
    resolves through the registry selectors like hydra's ConfigStore."""
    from s2st_tpu.cli.hydra_train import build_args

    cfg = {
        "task": {"_name": "s2s_translation", "data": str(corpus),
                 "config_yaml": "config.yaml"},
        "model": {"_name": "s2st_transformer", "encoder_layers": 3,
                  "encoder_embed_dim": 16, "encoder_attention_heads": 2},
        "criterion": {"_name": "s2st_loss", "bce_pos_weight": 5.0},
        "optimizer": {"_name": "adam"},
        "lr_scheduler": {"_name": "inverse_sqrt", "warmup_updates": 7},
        "optimization": {"lr": [0.001], "max_epoch": 1},
        "checkpoint": {"save_dir": str(tmp_path / "sv")},
    }
    p = tmp_path / "grouped.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    args, argv = build_args(str(p), [])
    assert args.task == "s2s_translation"
    assert args.arch == "s2st_transformer"
    assert args.criterion == "s2st_loss"
    assert args.optimizer == "adam"
    assert args.lr_scheduler == "inverse_sqrt"
    assert args.encoder_layers == 3          # yaml beats arch default
    assert args.warmup_updates == 7
    assert args.max_epoch == 1
    # arch defaults still fill unspecified keys (two-pass semantics)
    assert args.decoder_layers is not None


def test_dotted_overrides_beat_yaml(tmp_path, corpus):
    from s2st_tpu.cli.hydra_train import build_args
    cfg = {
        "task": {"_name": "s2s_translation", "data": str(corpus),
                 "config_yaml": "config.yaml"},
        "model": {"_name": "s2st_transformer"},
        "optimization": {"max_epoch": 5, "lr": [0.001]},
    }
    p = tmp_path / "c.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    args, _ = build_args(str(p), ["optimization.max_epoch=2",
                                  "model._name=s2st_transformer_mtl",
                                  "--seed", "7"])
    assert args.max_epoch == 2
    assert args.arch == "s2st_transformer_mtl"
    assert args.seed == 7


def test_unknown_key_raises_with_suggestion(tmp_path):
    from s2st_tpu.cli.hydra_train import build_args
    p = tmp_path / "bad.yaml"
    with open(p, "w") as f:
        yaml.safe_dump({"optimization": {"max_epoch_typo": 3}}, f)
    with pytest.raises(KeyError, match="max_epoch_typo"):
        build_args(str(p), [])


def test_train_from_yaml_alone(corpus, tmp_path):
    """One full (tiny) training run launched from a YAML config alone —
    the reference's 'one recipe stage runnable from a config file' flow."""
    from s2st_tpu.cli.hydra_train import main as hydra_main

    save_dir = tmp_path / "ckpts"
    cfg = {
        "task": {"_name": "s2s_translation", "data": str(corpus),
                 "config_yaml": "config.yaml"},
        "model": {
            "_name": "s2st_transformer",
            "encoder_layers": 2, "encoder_embed_dim": 16,
            "encoder_ffn_embed_dim": 32, "encoder_attention_heads": 2,
            "decoder_layers": 2, "decoder_embed_dim": 16,
            "decoder_ffn_embed_dim": 32, "decoder_attention_heads": 2,
            "conv_channels": 16, "middle_layers": "0",
            "prenet_dim": 8, "prenet_layers": 1,
            "postnet_layers": 1, "postnet_conv_dim": 8,
            "output_frame_dim": 8, "n_frames_per_step": 1,
            "encoder_normalize_before": True,
            "decoder_normalize_before": True,
        },
        "criterion": {"_name": "s2st_loss", "bce_pos_weight": 5.0},
        "optimizer": {"_name": "adam"},
        "lr_scheduler": {"_name": "inverse_sqrt", "warmup_updates": 4},
        "optimization": {"lr": [0.001], "max_epoch": 1,
                         "max_tokens": 2000, "clip_norm": 1.0},
        "dataset": {"train_subset": "train", "valid_subset": "dev",
                    "required_batch_size_multiple": 1},
        "common": {"seed": 1, "log_interval": 1,
                   "max_source_positions": 128,
                   "max_target_positions": 128},
        "checkpoint": {"save_dir": str(save_dir)},
    }
    p = tmp_path / "run.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    rc = hydra_main(["--config", str(p)])
    assert rc == 0
    assert (save_dir / "checkpoint_last.npz").is_file()


def test_dump_config_cli(tmp_path, corpus):
    from s2st_tpu.cli.hydra_train import main as hydra_main
    out = tmp_path / "resolved.yaml"
    rc = hydra_main(["--dump-config", str(out),
                     f"task.data={corpus}",
                     "task._name=s2s_translation",
                     "model._name=s2st_transformer",
                     "--config-yaml", "config.yaml"])
    assert rc == 0
    tree = yaml.safe_load(out.read_text())
    assert tree["task"]["_name"] == "s2s_translation"
    assert tree["model"]["_name"] == "s2st_transformer"
