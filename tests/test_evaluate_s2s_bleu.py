"""ASR-BLEU evaluation pipeline (evalute_s2s_bleu.py parity) with a fake
transcriber — interface-rot protection without the HF wav2vec2 checkpoint
(unavailable offline) — plus the multi-reference BLEU scorer used by
run_baseline.sh stage 9."""

import csv

import numpy as np
import pytest

from s2st_tpu.data.audio_utils import write_wav


def _fake_dump(tmp_path, utts):
    wav_dir = tmp_path / "dump" / "wav"
    wav_dir.mkdir(parents=True)
    for uid in utts:
        write_wav(str(wav_dir / f"{uid}_pred.wav"),
                  0.1 * np.ones(1600, np.float32), 16000)
    man = tmp_path / "test.audio.tsv"
    with open(man, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "tgt_text"], delimiter="\t",
                           quoting=csv.QUOTE_NONE)
        w.writeheader()
        for uid, text in utts.items():
            w.writerow({"id": uid, "tgt_text": text})
    return man, tmp_path / "dump"


def test_evaluate_with_fake_transcriber(tmp_path, capsys):
    from s2st_tpu.cli.evaluate_s2s_bleu import main as eval_main
    utts = {"u0": "hello world", "u1": "good morning!"}
    man, dump = _fake_dump(tmp_path, utts)
    hyps = {"u0": "HELLO WORLD", "u1": "good morning"}

    def fake_transcriber(wave, sr):
        assert sr == 16000 and wave.shape[0] == 1600
        fake_transcriber.calls.append(1)
        return hyps[f"u{len(fake_transcriber.calls) - 1}"]

    fake_transcriber.calls = []
    rc = eval_main(["--audio-manifest-file", str(man),
                    "--decode-save-path", str(dump),
                    "--out-result-file", str(dump / "decode.txt"),
                    "--scoring", "wer"],
                   transcriber=fake_transcriber)
    out = capsys.readouterr().out
    assert rc == 0
    assert len(fake_transcriber.calls) == 2
    assert "WER: 0.00" in out  # normalization strips case + punctuation
    lines = (dump / "decode.txt").read_text().splitlines()
    assert len(lines) == 2
    hyp, ref, uid = lines[0].split("\t")
    assert uid == "u0" and hyp == ref == "hello world"


def test_decode_txt_follows_manifest_order_not_glob_order(tmp_path):
    """decode.txt lines must come out in audio-manifest row order: stage 9
    line-pairs `cut -f1 decode.txt` against external reference files, so
    lexicographic wav order (utt_10 < utt_9) would silently misalign the
    multi-reference BLEU (advisor finding r2)."""
    from s2st_tpu.cli.evaluate_s2s_bleu import evaluate
    # manifest order: utt_9 BEFORE utt_10 (glob sort would reverse them)
    utts = {"utt_9": "nine", "utt_10": "ten"}
    man, dump = _fake_dump(tmp_path, utts)

    def transcriber(wave, sr):
        return "words"

    evaluate(transcriber, str(man), str(dump), str(dump / "decode.txt"),
             scoring="wer")
    ids = [l.split("\t")[2]
           for l in (dump / "decode.txt").read_text().splitlines()]
    assert ids == ["utt_9", "utt_10"]


def test_missing_wav_emits_placeholder_line(tmp_path):
    """A missing wav must not shift later lines (keeps alignment with
    external reference streams)."""
    from s2st_tpu.cli.evaluate_s2s_bleu import evaluate
    utts = {"u0": "first", "u1": "second", "u2": "third"}
    man, dump = _fake_dump(tmp_path, utts)
    (dump / "wav" / "u1_pred.wav").unlink()

    evaluate(lambda w, sr: "x", str(man), str(dump),
             str(dump / "decode.txt"), scoring="wer")
    lines = (dump / "decode.txt").read_text().splitlines()
    assert len(lines) == 3
    hyp1, _, uid1 = lines[1].split("\t")
    assert uid1 == "u1" and hyp1 == ""
    assert lines[2].split("\t")[2] == "u2"


def test_evaluate_with_real_hf_model_path(tmp_path, capsys):
    """Exercises the REAL transcriber code path (HF Wav2Vec2ForCTC +
    Processor loading, tensor prep, batch_decode) with a tiny wav2vec2
    checkpoint constructed locally — the pretrained
    wav2vec2-large-960h-lv60-self itself is env-blocked (zero egress), but
    the loading/inference path is identical (r2 verdict Weak #8)."""
    import json
    import os
    transformers = pytest.importorskip("transformers")
    from transformers import (Wav2Vec2Config, Wav2Vec2CTCTokenizer,
                              Wav2Vec2FeatureExtractor, Wav2Vec2ForCTC,
                              Wav2Vec2Processor)
    model_dir = tmp_path / "tiny_w2v2"
    model_dir.mkdir()
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4,
             "A": 5, "B": 6, "C": 7}
    with open(model_dir / "vocab.json", "w") as f:
        json.dump(vocab, f)
    tok = Wav2Vec2CTCTokenizer(str(model_dir / "vocab.json"))
    fe = Wav2Vec2FeatureExtractor(feature_size=1, sampling_rate=16000,
                                  padding_value=0.0, do_normalize=True,
                                  return_attention_mask=False)
    Wav2Vec2Processor(feature_extractor=fe,
                      tokenizer=tok).save_pretrained(str(model_dir))
    cfg = Wav2Vec2Config(vocab_size=len(vocab), hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=64,
                         conv_dim=(16, 16, 16, 16, 16, 16, 16))
    Wav2Vec2ForCTC(cfg).save_pretrained(str(model_dir))

    from s2st_tpu.cli.evaluate_s2s_bleu import main as eval_main
    utts = {"u0": "a b", "u1": "c"}
    man, dump = _fake_dump(tmp_path, utts)
    rc = eval_main(["--audio-manifest-file", str(man),
                    "--decode-save-path", str(dump),
                    "--out-result-file", str(dump / "decode.txt"),
                    "--scoring", "wer",
                    "--asr-model-path", str(model_dir)])
    assert rc == 0
    lines = (dump / "decode.txt").read_text().splitlines()
    assert len(lines) == 2 and lines[0].split("\t")[2] == "u0"
    assert "WER" in capsys.readouterr().out


def test_evaluate_missing_model_exits_2(tmp_path):
    from s2st_tpu.cli.evaluate_s2s_bleu import main as eval_main
    man, dump = _fake_dump(tmp_path, {"u0": "x"})
    rc = eval_main(["--audio-manifest-file", str(man),
                    "--decode-save-path", str(dump),
                    "--out-result-file", str(dump / "decode.txt"),
                    "--asr-model-path", str(tmp_path / "nonexistent")])
    assert rc == 2


def test_multi_reference_bleu(tmp_path, capsys):
    """score CLI with several --ref files (stage 9: sacrebleu 4-ref)."""
    from s2st_tpu.cli.score import main as score_main
    (tmp_path / "sys.txt").write_text("the cat sat on the mat\n"
                                      "a quick brown fox\n")
    (tmp_path / "r0.txt").write_text("the cat sat on a mat\n"
                                     "the quick brown fox\n")
    (tmp_path / "r1.txt").write_text("the cat sat on the mat\n"
                                     "a fast brown fox jumps\n")
    rc = score_main(["--sys", str(tmp_path / "sys.txt"),
                     "--ref", str(tmp_path / "r0.txt"),
                     str(tmp_path / "r1.txt")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "BLEU" in out
    # perfect hypothesis 1 is covered by r1 -> multi-ref BLEU must beat
    # single-ref BLEU against r0
    from s2st_tpu.scoring import (bleu_from_counts, corpus_bleu_counts,
                                  corpus_bleu_counts_multi)
    hyps = [l.split() for l in (tmp_path / "sys.txt").read_text().splitlines()]
    r0 = [l.split() for l in (tmp_path / "r0.txt").read_text().splitlines()]
    r1 = [l.split() for l in (tmp_path / "r1.txt").read_text().splitlines()]
    single = bleu_from_counts(*corpus_bleu_counts(r0, hyps))
    multi = bleu_from_counts(*corpus_bleu_counts_multi(
        [[a, b] for a, b in zip(r0, r1)], hyps))
    assert multi > single


def test_multi_ref_perfect_match_is_100():
    from s2st_tpu.scoring import bleu_from_counts, corpus_bleu_counts_multi
    hyp = ["the cat sat on the mat".split()]
    refs = [[["completely", "different", "words", "here", "now", "ok"],
             "the cat sat on the mat".split()]]
    score = bleu_from_counts(*corpus_bleu_counts_multi(refs, hyp))
    assert abs(score - 100.0) < 1e-6


def test_multi_ref_counts_match_sacrebleu():
    """Our fallback multi-reference BLEU must agree with sacrebleu on
    tokenized input (max-clip counts + closest-ref brevity length)."""
    sacrebleu = pytest.importorskip("sacrebleu")
    hyps = ["the cat sat on the mat today",
            "a quick brown fox jumps over it",
            "hello world again"]
    r0 = ["the cat sat on a mat today",
          "the quick brown fox leaps over it",
          "hello there world"]
    r1 = ["a cat sat on the mat",
          "a fast brown fox jumps over it",
          "hello world again and again"]
    ref = sacrebleu.corpus_bleu(hyps, [r0, r1], tokenize="none").score
    from s2st_tpu.scoring import bleu_from_counts, corpus_bleu_counts_multi
    refs_per_hyp = [[a.split(), b.split()] for a, b in zip(r0, r1)]
    ours = bleu_from_counts(*corpus_bleu_counts_multi(
        refs_per_hyp, [h.split() for h in hyps]))
    assert abs(ours - ref) < 0.2, (ours, ref)
