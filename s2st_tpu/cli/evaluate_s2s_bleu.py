"""ASR-BLEU / ASR-WER evaluation of dumped waveforms
(parity: examples/s2s_trans/evalute_s2s_bleu.py).

Transcribes the generated ``*_pred.wav`` files with a CTC wav2vec2 ASR model
(the reference uses HF ``facebook/wav2vec2-large-960h-lv60-self``,
evalute_s2s_bleu.py:47-48), normalizes (punctuation strip + lowercase,
:72-82), and scores sacrebleu/WER against the reference transcripts from
the audio manifest.

This image has no network egress, so the ASR checkpoint must already be on
disk: pass --asr-model-path (a HF directory) or have it in the HF cache.
"""

from __future__ import annotations

import argparse
import csv
import logging
import re
import string
import sys
from pathlib import Path

import numpy as np

logger = logging.getLogger("s2st_tpu.evaluate_s2s_bleu")

PUNC = string.punctuation.replace("'", "")


def normalize_text(s: str) -> str:
    s = re.sub(f"[{re.escape(PUNC)}]", " ", s)
    return " ".join(s.lower().split())


def build_hf_transcriber(model_path: str):
    """transcriber(wave fp32 (T,), sr) -> text, backed by a HF wav2vec2 CTC
    model (evalute_s2s_bleu.py:47-68)."""
    import torch
    from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor
    processor = Wav2Vec2Processor.from_pretrained(model_path)
    model = Wav2Vec2ForCTC.from_pretrained(model_path).eval()

    def transcribe(wave, sr):
        inputs = processor(wave, sampling_rate=sr, return_tensors="pt",
                           padding=True)
        with torch.no_grad():
            logits = model(inputs.input_values).logits
        ids = torch.argmax(logits, dim=-1)
        return processor.batch_decode(ids)[0]

    return transcribe


def evaluate(transcriber, audio_manifest_file: str, decode_save_path: str,
             out_result_file: str, scoring: str = "sacrebleu",
             reference_field: str = "tgt_text") -> str:
    """Transcribe every <id>_pred.wav with `transcriber` and score against
    the manifest transcripts. Returns the scorer result string; writes
    "hyp\\tref\\tid" lines to out_result_file (decode.txt — stage 9 cuts
    field 1 as the prediction stream)."""
    from ..data.audio_utils import read_wav
    from ..scoring import BleuScorer, WerScorer
    # Iterate in MANIFEST ROW ORDER (not wav-glob order): stage 9 of
    # run_baseline.sh line-pairs `cut -f1 decode.txt` against external
    # en.N reference files, so decode.txt line order must match the
    # manifest's, as in the reference (evalute_s2s_bleu.py:55-71). A
    # missing wav still emits a (placeholder) line so later rows don't
    # shift against the external reference streams.
    rows = []
    with open(audio_manifest_file, encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter="\t", quoting=csv.QUOTE_NONE):
            rows.append((row["id"], row[reference_field]))

    wav_dir = Path(decode_save_path) / "wav"
    out_path = Path(out_result_file)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    scorer = (WerScorer(lowercase=True, remove_punct=True)
              if scoring == "wer" else BleuScorer(lowercase=True))
    n = 0
    with open(out_path, "w", encoding="utf-8") as out:
        for uid, ref_text in rows:
            wav_path = wav_dir / f"{uid}_pred.wav"
            ref_n = normalize_text(ref_text)
            if not wav_path.exists():
                logger.warning(f"missing {wav_path.name}; emitting empty "
                               "hypothesis to keep line alignment")
                out.write(f"\t{ref_n}\t{uid}\n")
                scorer.add_string(ref_n, "")
                continue
            wave, sr = read_wav(str(wav_path))
            hyp_n = normalize_text(transcriber(wave, sr))
            out.write(f"{hyp_n}\t{ref_n}\t{uid}\n")
            scorer.add_string(ref_n, hyp_n)
            n += 1
    logger.info(f"scored {n} utterances ({len(rows) - n} missing)")
    return scorer.result_string()


def main(argv=None, transcriber=None) -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    p = argparse.ArgumentParser("s2st_tpu evaluate_s2s_bleu")
    p.add_argument("--audio-manifest-file", required=True,
                   help="TSV with id + tgt_text reference transcripts")
    p.add_argument("--decode-save-path", required=True,
                   help="generate_waveform --results-path (contains wav/)")
    p.add_argument("--out-result-file", required=True)
    p.add_argument("--scoring", default="sacrebleu",
                   choices=["sacrebleu", "wer"])
    p.add_argument("--asr-model-path",
                   default="facebook/wav2vec2-large-960h-lv60-self",
                   help="HF model dir or cached hub id")
    p.add_argument("--reference-field", default="tgt_text")
    args = p.parse_args(argv)

    if transcriber is None:
        try:
            transcriber = build_hf_transcriber(args.asr_model_path)
        except Exception as e:
            logger.error(
                f"cannot load ASR model '{args.asr_model_path}': {e}\n"
                "This environment has no network egress; download the model "
                "elsewhere and pass --asr-model-path /path/to/dir")
            return 2
    result = evaluate(transcriber, args.audio_manifest_file,
                      args.decode_save_path, args.out_result_file,
                      scoring=args.scoring,
                      reference_field=args.reference_field)
    print(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
