"""Preprocessing pipeline: wavs -> get_feature_manifest CLI -> training-ready
corpus -> train 1 epoch (full offline pipeline parity, run_baseline.sh
stages 1-5 minus g2p)."""

import csv
from pathlib import Path

import numpy as np
import pytest

from s2st_tpu.data.audio_utils import write_wav


def _make_audio_manifests(root: Path, n=6, sr=16000):
    wav_dir = root / "wavs"
    wav_dir.mkdir(parents=True)
    r = np.random.RandomState(0)
    rows_by_split = {"train": [], "dev": [], "tst": []}
    splits = ["train"] * (n - 2) + ["dev", "tst"]
    for i, split in enumerate(splits):
        uid = f"utt{i}"
        dur_s = 0.3 + 0.1 * (i % 3)
        src = (0.3 * np.sin(2 * np.pi * (200 + 50 * i)
                            * np.arange(int(sr * dur_s)) / sr)
               ).astype(np.float32)
        tgt = (0.3 * np.sin(2 * np.pi * (300 + 40 * i)
                            * np.arange(int(sr * dur_s * 0.8)) / sr)
               ).astype(np.float32)
        write_wav(str(wav_dir / f"{uid}_src.wav"), src, sr)
        write_wav(str(wav_dir / f"{uid}_tgt.wav"), tgt, sr)
        rows_by_split[split].append({
            "id": uid,
            "src_audio": str(wav_dir / f"{uid}_src.wav"),
            "tgt_audio": str(wav_dir / f"{uid}_tgt.wav"),
            "src_text": f"hola mundo w{i}",
            "tgt_text": f"hello world w{i}",
            "speaker": "spk0",
        })
    for split, rows in rows_by_split.items():
        with open(root / f"{split}.audio_phone.tsv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                               delimiter="\t", quoting=csv.QUOTE_NONE)
            w.writeheader()
            w.writerows(rows)
    return root


def test_full_preprocess_then_train(tmp_path):
    from s2st_tpu.cli.get_feature_manifest import main as prep_main
    from s2st_tpu.cli.train import main as train_main

    manifests = _make_audio_manifests(tmp_path / "audio")
    out = tmp_path / "features"
    rc = prep_main([
        "--audio-manifest-root", str(manifests),
        "--output-root", str(out),
        "--splits", "train", "dev", "tst",
        "--ipa-vocab",
    ])
    assert rc == 0
    # artifacts
    for f in ("train.tsv", "dev.tsv", "tst.tsv", "config.yaml",
              "src_vocab.txt", "tgt_vocab.txt",
              "src_logmelspec80.zip", "tgt_logmelspec80.zip",
              "src_gcmvn_stats.npz", "tgt_gcmvn_stats.npz"):
        assert (out / f).is_file(), f
    # manifest sanity: zip-slice paths load back as (T, 80) features
    from s2st_tpu.data.audio_utils import get_features_or_waveform
    with open(out / "train.tsv") as f:
        rows = list(csv.DictReader(f, delimiter="\t",
                                   quoting=csv.QUOTE_NONE))
    assert len(rows) == 4
    feat = get_features_or_waveform(rows[0]["src_audio"])
    assert feat.shape[1] == 80
    assert feat.shape[0] == int(rows[0]["src_n_frames"])
    tfeat = get_features_or_waveform(rows[0]["tgt_audio"])
    assert tfeat.shape == (int(rows[0]["tgt_n_frames"]), 80)

    # vocab format: "symbol count"
    line = (out / "src_vocab.txt").read_text().splitlines()[0].split()
    assert len(line) == 2 and line[1].isdigit()

    # train one epoch straight off the produced corpus
    rc = train_main([
        str(out), "--save-dir", str(tmp_path / "ckpts"),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--arch", "s2st_transformer",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--max-tokens", "4000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--required-batch-size-multiple", "1",
        "--max-source-positions", "256", "--max-target-positions", "256",
    ])
    assert rc == 0
    assert (tmp_path / "ckpts" / "checkpoint_last.npz").is_file()
