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


def test_feature_manifest_8k_and_sharded(tmp_path):
    """--src-sample-rate 8000 (the _8k recipe variant) with sharded +
    multi-worker extraction (get_feature_manifest_8k/_parallel parity)."""
    from s2st_tpu.cli.get_feature_manifest import main as prep_main
    root = _make_audio_manifests(tmp_path / "audio")
    out = tmp_path / "feat8k"
    common = ["--audio-manifest-root", str(root), "--output-root", str(out),
              "--splits", "train", "dev", "tst",
              "--src-sample-rate", "8000"]
    # one sharded feature-extraction job; the finalize pass must then
    # extract the OTHER shard's features through the worker pool
    rc = prep_main(common + ["--num-shards", "2", "--shard-index", "0",
                             "--only-extract-audio-feature"])
    assert rc == 0
    rc = prep_main(common + ["--num-workers", "2"])
    assert rc == 0
    assert (out / "src_logmelspec80_8k.zip").exists()
    assert (out / "src_gcmvn_stats_8k.npz").exists()
    rows = list(csv.DictReader(open(out / "train.tsv"), delimiter="\t",
                               quoting=csv.QUOTE_NONE))
    assert len(rows) == 4
    # 8k fbank: 10ms hop at 8k halves nothing in frame count (time-based),
    # but frames must be positive and features readable from the zip
    from s2st_tpu.data.audio_utils import get_features_or_waveform
    feat = get_features_or_waveform(rows[0]["src_audio"])
    assert feat.shape[1] == 80 and feat.shape[0] == int(rows[0]["src_n_frames"])


def test_filter_manifest_cli(tmp_path):
    from s2st_tpu.preprocessing.filter_manifest import main as filt_main
    from s2st_tpu.preprocessing.manifest_utils import load_tsv, save_tsv
    rows = [{"id": f"u{i}", "src_audio": "a", "src_n_frames": str(100 * i),
             "src_text": "s", "tgt_audio": "b", "tgt_n_frames": str(50 * i),
             "tgt_text": "t", "speaker": "spk0"} for i in range(1, 6)]
    man = tmp_path / "in.tsv"
    save_tsv(rows, man)
    ref = tmp_path / "ref.tsv"
    save_tsv([{"id": "u1", "tgt_text": "orig one"},
              {"id": "u2", "tgt_text": "orig two"},
              {"id": "u4", "tgt_text": "orig four"}], ref)
    bad = tmp_path / "bad.txt"
    bad.write_text("u2, something\n")
    out = tmp_path / "out.tsv"
    rc = filt_main(["--manifest", str(man), "--output", str(out),
                    "--reference-manifest", str(ref),
                    "--exclude-ids", str(bad),
                    "--max-tgt-frames", "150"])
    assert rc == 0
    got = load_tsv(out)
    # u1 kept; u2 excluded by bad list; u3/u5 not in reference; u4 over cap
    assert [r["id"] for r in got] == ["u1"]
    assert got[0]["tgt_text_orig"] == "orig one"


def test_split_and_concat_roundtrip(tmp_path):
    from s2st_tpu.preprocessing.split_file import main as split_main
    from s2st_tpu.preprocessing.manifest_utils import load_tsv, save_tsv
    rows = [{"id": f"u{i}", "src_audio": "a", "src_n_frames": "1",
             "src_text": "s", "tgt_audio": "b", "tgt_n_frames": "1",
             "tgt_text": "t", "speaker": "spk"} for i in range(10)]
    src = tmp_path / "train.tsv"
    save_tsv(rows, src)
    rc = split_main(["--type", "split", "--n", "3",
                     "--input-file", str(src),
                     "--output-path", str(tmp_path / "parts")])
    assert rc == 0
    parts = sorted((tmp_path / "parts").glob("train.audio.*.tsv"))
    assert len(parts) == 3
    sizes = [len(load_tsv(p)) for p in parts]
    assert sum(sizes) == 10 and sizes[:2] == [3, 3]  # last takes remainder
    rc = split_main(["--type", "concat", "--output-path", str(tmp_path),
                     "--file-part"] + [str(p) for p in parts])
    assert rc == 0
    back = load_tsv(tmp_path / "train.audio_phone.tsv")
    assert [r["id"] for r in back] == [r["id"] for r in rows]


def test_g2p_chars_fallback(tmp_path):
    from s2st_tpu.preprocessing.g2p import main as g2p_main
    from s2st_tpu.preprocessing.manifest_utils import load_tsv, save_tsv
    rows = [
        {"id": "u0", "src_audio": "a", "src_n_frames": "1",
         "src_text": "Dr. Smith reads 3 books", "tgt_audio": "b",
         "tgt_n_frames": "1", "tgt_text": "他有3本书", "speaker": "s"},
        {"id": "u1", "src_audio": "a", "src_n_frames": "1",
         "src_text": "hello", "tgt_audio": "b", "tgt_n_frames": "1",
         "tgt_text": "包含English字符", "speaker": "s"},
    ]
    src = tmp_path / "in.tsv"
    save_tsv(rows, src)
    out = tmp_path / "out.tsv"
    rc = g2p_main(["--input-file", str(src), "--output-file", str(out),
                   "--src-backend", "chars", "--tgt-backend", "chars"])
    assert rc == 0
    got = load_tsv(out)
    assert len(got) == 1  # latin-in-tgt row dropped (g2p.py:45-48)
    assert got[0]["src_text"] == "doctor smith reads 3 books"
    assert got[0]["tgt_text"] == "他 有 三 本 书"


def test_audio_manifest_builder(tmp_path):
    from s2st_tpu.preprocessing.audio_manifest import main as am_main
    from s2st_tpu.preprocessing.manifest_utils import load_tsv, save_tsv
    sr = 16000
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    for name, n in (("a_src", 1600), ("a_tgt", 800),
                    ("b_src", 3200), ("b_tgt", 1600)):
        write_wav(str(wavs / f"{name}.wav"),
                  np.zeros(n, np.float32), sr)
    meta = tmp_path / "train.tsv"
    save_tsv([
        {"id": "a", "src_wav": "wavs/a_src.wav", "tgt_wav": "wavs/a_tgt.wav",
         "src_text": "Mr. Jones", "tgt_text": "他买了200个苹果。",
         "speaker": "sp1"},
        {"id": "b", "src_wav": "wavs/b_src.wav", "tgt_wav": "wavs/b_tgt.wav",
         "src_text": "two", "tgt_text": "二", "speaker": ""},
        {"id": "c", "src_wav": "wavs/missing.wav", "tgt_wav": "wavs/a_tgt.wav",
         "src_text": "x", "tgt_text": "x", "speaker": ""},
    ], meta)
    out = tmp_path / "manifests"
    rc = am_main(["--metadata", f"train:{meta}", "--audio-root",
                  str(tmp_path), "--output-root", str(out),
                  "--src-lang", "en", "--tgt-lang", "zh"])
    assert rc == 0
    rows = load_tsv(out / "train.audio.tsv")
    assert [r["id"] for r in rows] == ["a", "b"]  # missing wav skipped
    assert rows[0]["src_n_frames"] == "1600"
    assert rows[0]["src_text"] == "mister jones"
    assert rows[0]["tgt_text"].startswith("他买了两百个苹果")
    assert rows[1]["speaker"] == "spk0"
