"""Paired-corpus audio manifest builder
(reference: examples/s2s_trans/preprocessing/
get_ted_en2zhdefrjp_audio_manifest.py — builds the per-split
``<split>.audio.tsv`` (id, src_audio, src_n_frames, src_text, tgt_audio,
tgt_n_frames, tgt_text, speaker) from paired source/target wav trees and a
metadata table, normalizing English text and Chinese text (cn_tn) on the
way; that script is hardwired to internal TED paths + tensorflow/nltk —
rebuilt as a generic CLI over a local metadata TSV).

Metadata TSV columns: id, src_wav, tgt_wav, src_text, tgt_text[, speaker]
(wav paths absolute or relative to --audio-root). n_frames are the raw
sample counts read from the wav headers (SpeechToTextDatasetCreator
convention for audio manifests).
"""

from __future__ import annotations

import argparse
import logging
import sys
import wave
from pathlib import Path
from typing import List, Optional

from .cn_text_norm import normalize as cn_normalize
from .cn_text_norm import strip_punctuation
from .g2p import clean_english
from .manifest_utils import MANIFEST_COLUMNS, load_tsv, save_tsv

logger = logging.getLogger("s2st_tpu.audio_manifest")


def wav_n_samples(path: Path) -> int:
    with wave.open(str(path), "rb") as w:
        return w.getnframes()


def normalize_text(text: str, lang: str) -> str:
    if lang.startswith("zh"):
        return strip_punctuation(cn_normalize(text)).strip()
    return clean_english(text)


def build_rows(meta_rows, audio_root: Path, src_lang: str, tgt_lang: str,
               normalize: bool = True):
    rows, skipped = [], 0
    for e in meta_rows:
        src = audio_root / e["src_wav"]
        tgt = audio_root / e["tgt_wav"]
        if not src.exists() or not tgt.exists():
            skipped += 1
            continue
        src_text = e.get("src_text", "")
        tgt_text = e.get("tgt_text", "")
        if normalize:
            src_text = normalize_text(src_text, src_lang)
            tgt_text = normalize_text(tgt_text, tgt_lang)
        rows.append({
            "id": e["id"],
            "src_audio": src.as_posix(),
            "src_n_frames": wav_n_samples(src),
            "src_text": src_text,
            "tgt_audio": tgt.as_posix(),
            "tgt_n_frames": wav_n_samples(tgt),
            "tgt_text": tgt_text,
            "speaker": e.get("speaker", "spk0") or "spk0",
        })
    return rows, skipped


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    p = argparse.ArgumentParser("s2st_tpu audio_manifest")
    p.add_argument("--metadata", required=True, nargs="+",
                   help="metadata TSV per split, as <split>:<path> pairs "
                        "(e.g. train:meta_train.tsv) or bare paths (split "
                        "inferred from the file stem)")
    p.add_argument("--audio-root", default=".",
                   help="base directory the wav paths are relative to")
    p.add_argument("--output-root", "-o", required=True)
    p.add_argument("--src-lang", default="en")
    p.add_argument("--tgt-lang", default="es",
                   help="zh* runs Chinese NSW normalization on tgt_text")
    p.add_argument("--no-normalize", action="store_true")
    args = p.parse_args(argv)

    out_root = Path(args.output_root)
    out_root.mkdir(parents=True, exist_ok=True)
    audio_root = Path(args.audio_root)
    for spec in args.metadata:
        if ":" in spec and not Path(spec).exists():
            split, path = spec.split(":", 1)
        else:
            split, path = Path(spec).stem, spec
        rows, skipped = build_rows(load_tsv(path), audio_root,
                                   args.src_lang, args.tgt_lang,
                                   normalize=not args.no_normalize)
        save_tsv(rows, out_root / f"{split}.audio.tsv",
                 columns=MANIFEST_COLUMNS)
        logger.info(f"{split}: {len(rows)} rows ({skipped} skipped, "
                    f"missing audio) -> {out_root}/{split}.audio.tsv")
    return 0


if __name__ == "__main__":
    sys.exit(main())
