"""Build a tiny synthetic Fisher-format S2ST corpus for end-to-end tests
(analogue of the reference's tests/utils.py create_dummy_data + the
preprocessing manifest format, get_feature_manifest.py:136-199)."""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np


SRC_WORDS = ["hola", "como", "estas", "bien", "gracias", "mundo", "agua"]
TGT_WORDS = ["hello", "how", "are", "you", "fine", "thanks", "world"]


def write_dict(path: Path, words):
    with open(path, "w", encoding="utf-8") as f:
        for w in words:
            f.write(f"{w} 10\n")


def make_tiny_corpus(root: Path, n_train: int = 12, n_dev: int = 4,
                     n_test: int = 4, n_feat: int = 8, n_mel: int = 8,
                     seed: int = 0, sample_rate: int = 16000,
                     n_fft: int = 128, hop: int = 64,
                     src_wav: bool = False,
                     variance_columns: bool = False) -> Path:
    """Creates <root>/{train,dev,test}.tsv + config.yaml + dicts + features.
    Feature dims are tiny (n_feat fbank bins, n_mel target mels) so CPU
    tests stay fast. src_wav=True writes source WAVs instead of fbank
    features (the use_hubert raw-audio input mode). Returns root."""
    root = Path(root)
    feat_dir = root / "features"
    feat_dir.mkdir(parents=True, exist_ok=True)
    r = np.random.RandomState(seed)

    write_dict(root / "src_vocab.txt", SRC_WORDS)
    write_dict(root / "tgt_vocab.txt", TGT_WORDS)

    splits = {"train": n_train, "dev": n_dev, "test": n_test}
    gcmvn_feats = []
    for split, n in splits.items():
        rows = []
        for i in range(n):
            uid = f"{split}_{i}"
            src_t = int(r.randint(20, 48))
            tgt_t = int(r.randint(16, 40))
            src = r.randn(src_t, n_feat).astype(np.float32)
            tgt = r.randn(tgt_t, n_mel).astype(np.float32)
            if src_wav:
                from s2st_tpu.data.audio_utils import write_wav
                wave = (0.2 * np.sin(
                    2 * np.pi * (200 + 20 * i)
                    * np.arange(src_t * 160) / sample_rate)
                ).astype(np.float32)
                write_wav(str(feat_dir / f"{uid}_src.wav"), wave,
                          sample_rate)
            else:
                np.save(feat_dir / f"{uid}_src.npy", src)
            np.save(feat_dir / f"{uid}_tgt.npy", tgt)
            gcmvn_feats.append(tgt)
            ns = int(r.randint(2, 5))
            nt = int(r.randint(2, 5))
            row = {
                "id": uid,
                "src_audio": (f"features/{uid}_src.wav" if src_wav
                              else f"features/{uid}_src.npy"),
                "tgt_audio": f"features/{uid}_tgt.npy",
                "src_n_frames": src_t,
                "tgt_n_frames": tgt_t,
                "src_text": " ".join(r.choice(SRC_WORDS, ns)),
                "tgt_text": " ".join(r.choice(TGT_WORDS, nt)),
                "speaker": "spk0",
            }
            if variance_columns:
                # FastSpeech2 extras: per-src-token durations summing to
                # the target frame count, plus pitch/energy targets
                n_tok = ns  # tokens excl. eos
                dur = np.full((n_tok,), tgt_t // n_tok, np.int32)
                dur[-1] += tgt_t - int(dur.sum())
                row["duration"] = " ".join(str(int(d)) for d in dur)
                row["pitch"] = " ".join(
                    f"{x:.2f}" for x in r.rand(n_tok) * 300)
                row["energy"] = " ".join(
                    f"{x:.2f}" for x in r.rand(n_tok) * 3)
            rows.append(row)
        with open(root / f"{split}.tsv", "w", newline="",
                  encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                                    delimiter="\t", quoting=csv.QUOTE_NONE)
            writer.writeheader()
            writer.writerows(rows)

    allf = np.concatenate(gcmvn_feats)
    np.savez(root / "gcmvn_tgt.npz", mean=allf.mean(0).astype(np.float32),
             std=np.maximum(allf.std(0), 1e-8).astype(np.float32))

    config = f"""audio_root: {root.as_posix()}
src_vocab_filename: src_vocab.txt
tgt_vocab_filename: tgt_vocab.txt
input_feat_per_channel: {n_feat}
input_channels: 1
features:
  sample_rate: {sample_rate}
  n_fft: {n_fft}
  win_len_t: {n_fft / sample_rate}
  hop_len_t: {hop / sample_rate}
  n_mels: {n_mel}
  f_min: 20.0
  f_max: {sample_rate // 2}
tgt_transforms:
  '*':
  - tgt_global_cmvn
tgt_global_cmvn:
  stats_npz_path: {(root / 'gcmvn_tgt.npz').as_posix()}
"""
    (root / "config.yaml").write_text(config)
    return root


def make_tiny_s2t_corpus(root: Path, n_train: int = 10, n_dev: int = 4,
                         n_feat: int = 8, seed: int = 0,
                         lang_tags: bool = False) -> Path:
    """The reference S2T manifest schema (speech_to_text_dataset.py:
    columns id, audio, n_frames, tgt_text, speaker [, tgt_lang]) with a
    single vocab_filename config.yaml — drives the speech_to_text /
    text_to_speech tasks."""
    root = Path(root)
    feat_dir = root / "features"
    feat_dir.mkdir(parents=True, exist_ok=True)
    r = np.random.RandomState(seed)
    words = list(TGT_WORDS)
    extra = [f"<lang:{t}>" for t in ("en", "es")] if lang_tags else []
    write_dict(root / "spm_vocab.txt", words + extra)
    for split, n in {"train": n_train, "dev": n_dev}.items():
        rows = []
        for i in range(n):
            uid = f"{split}_{i}"
            t = int(r.randint(20, 48))
            np.save(feat_dir / f"{uid}.npy",
                    r.randn(t, n_feat).astype(np.float32))
            row = {"id": uid, "audio": f"features/{uid}.npy",
                   "n_frames": t,
                   "tgt_text": " ".join(r.choice(words, int(r.randint(2, 5)))),
                   "speaker": "spk0"}
            if lang_tags:
                row["tgt_lang"] = ["en", "es"][i % 2]
            rows.append(row)
        with open(root / f"{split}.tsv", "w", newline="",
                  encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                                    delimiter="\t", quoting=csv.QUOTE_NONE)
            writer.writeheader()
            writer.writerows(rows)
    (root / "config.yaml").write_text(
        f"audio_root: {root.as_posix()}\n"
        "vocab_filename: spm_vocab.txt\n"
        f"input_feat_per_channel: {n_feat}\n"
        "input_channels: 1\n"
        + ("prepend_tgt_lang_tag: true\n" if lang_tags else ""))
    return root


if __name__ == "__main__":
    import sys
    make_tiny_corpus(Path(sys.argv[1]))
    print(f"tiny corpus at {sys.argv[1]}")
