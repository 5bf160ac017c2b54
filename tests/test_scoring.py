"""Scoring: WER edit distance, BLEU counts vs sacrebleu."""

import pytest

from s2st_tpu.scoring import (BleuScorer, WerScorer, bleu_from_counts,
                              corpus_bleu_counts, edit_distance)


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], ["a"]) == 1
    assert edit_distance(["a", "b"], ["a", "b"]) == 0


def test_wer_scorer():
    s = WerScorer()
    s.add_string("the cat sat", "the cat sat")
    assert s.score() == 0.0
    s2 = WerScorer()
    s2.add_string("a b c d", "a x c")  # 1 sub + 1 del
    assert abs(s2.score() - 50.0) < 1e-6
    assert "WER" in s2.result_string()


def test_wer_normalization():
    s = WerScorer(lowercase=True, remove_punct=True)
    s.add_string("Hello, World!", "hello world")
    assert s.score() == 0.0


def test_bleu_identity():
    refs = [["the", "cat", "sat", "on", "the", "mat"]]
    hyps = [["the", "cat", "sat", "on", "the", "mat"]]
    score = bleu_from_counts(*corpus_bleu_counts(refs, hyps))
    assert abs(score - 100.0) < 1e-6


def test_bleu_matches_sacrebleu():
    sacrebleu = pytest.importorskip("sacrebleu")
    refs = ["the cat sat on the mat here now",
            "a quick brown fox jumps over it"]
    hyps = ["the cat sat on a mat here now",
            "a quick brown dog jumps over it"]
    ours = bleu_from_counts(*corpus_bleu_counts(
        [r.split() for r in refs], [h.split() for h in hyps]))
    ref = sacrebleu.corpus_bleu(hyps, [refs], tokenize="none",
                                smooth_method="none").score
    assert abs(ours - ref) < 0.1


def test_bleu_scorer_result_string():
    s = BleuScorer()
    s.add_string("hello world how are you", "hello world how are you")
    assert s.score() > 99.0
    assert "BLEU" in s.result_string()


def test_wer_13a_tokenizer():
    """--wer-tokenizer 13a (recipe stage 10 flags): sacrebleu's 13a splits
    punctuation into its own tokens, changing WER vs plain whitespace."""
    pytest.importorskip("sacrebleu")
    from s2st_tpu.scoring import WerScorer
    plain = WerScorer()
    tok13a = WerScorer(tokenizer="13a")
    # identical up to a trailing comma: 13a isolates the comma into a
    # separate (substitutable) token, whitespace sees one changed word
    plain.add_string("hello world", "hello world,")
    tok13a.add_string("hello world", "hello world,")
    assert plain.score() == pytest.approx(50.0)    # 1 sub / 2 ref words
    assert tok13a.score() == pytest.approx(50.0)   # 1 ins / 2 ref tokens
    # but with --wer-remove-punct both agree at 0
    both = WerScorer(tokenizer="13a", remove_punct=True)
    both.add_string("hello world", "hello world,")
    assert both.score() == 0.0
