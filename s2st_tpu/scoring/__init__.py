"""Scorers: WER and BLEU (parity: fairseq/scoring/{wer,bleu}.py and the
sacrebleu scorer used by generate_for_s2st.py:393-430).

The n-gram BLEU counter has a native C++ fast path
(s2st_tpu/clib/libbleu) mirroring the reference's fairseq.libbleu, with a
pure-Python fallback; sacrebleu (when installed) is the default for
corpus BLEU, exactly like the reference."""

from __future__ import annotations

import math
import re
import string
from collections import Counter
from typing import List, Optional, Sequence


# ---------------------------------------------------------------------------
# WER
# ---------------------------------------------------------------------------

def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance. Uses the native C++ op (s2st_tpu/clib,
    libnat edit_dist.cpp parity) when built, Python DP otherwise."""
    try:
        from ..clib import edit_distance_tokens, get_lib
        if get_lib() is not None:
            # map arbitrary tokens to int ids for the native path
            ids = {}
            enc = [ids.setdefault(t, len(ids)) for t in a]
            enc_b = [ids.setdefault(t, len(ids)) for t in b]
            return edit_distance_tokens(enc, enc_b)
    except Exception:
        pass
    n, m = len(a), len(b)
    if n == 0:
        return m
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[m]


class WerScorer:
    """--scoring wer (+ --wer-tokenizer/--wer-lowercase/--wer-remove-punct;
    fairseq/scoring/wer.py + scoring/tokenizer.py EvaluationTokenizer
    parity — the 13a tokenizer comes from sacrebleu, with a plain-space
    fallback when the lib is absent)."""

    def __init__(self, lowercase: bool = False, remove_punct: bool = False,
                 tokenizer: str = "none"):
        self.lowercase = lowercase
        self.remove_punct = remove_punct
        self.distance = 0
        self.ref_length = 0
        self._pre = None
        if tokenizer == "13a":
            try:
                from sacrebleu.tokenizers.tokenizer_13a import Tokenizer13a
                self._pre = Tokenizer13a()
            except ImportError:
                pass

    def _tok(self, s: str) -> List[str]:
        if self._pre is not None:
            s = self._pre(s)
        if self.lowercase:
            s = s.lower()
        if self.remove_punct:
            s = s.translate(str.maketrans("", "", string.punctuation))
        return s.split()

    def add_string(self, ref: str, pred: str):
        ref_t, pred_t = self._tok(ref), self._tok(pred)
        self.distance += edit_distance(ref_t, pred_t)
        self.ref_length += len(ref_t)

    def score(self) -> float:
        return 100.0 * self.distance / self.ref_length \
            if self.ref_length > 0 else 0.0

    def result_string(self) -> str:
        return f"WER: {self.score():.2f}"


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------

def _ngrams(tokens: Sequence, n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu_counts(refs: List[List[str]], hyps: List[List[str]],
                       max_n: int = 4):
    """Clipped n-gram match/total counts + lengths (libbleu.cpp semantics)."""
    match = [0] * max_n
    total = [0] * max_n
    ref_len = hyp_len = 0
    for ref, hyp in zip(refs, hyps):
        ref_len += len(ref)
        hyp_len += len(hyp)
        for n in range(1, max_n + 1):
            h = _ngrams(hyp, n)
            r = _ngrams(ref, n)
            total[n - 1] += max(len(hyp) - n + 1, 0)
            match[n - 1] += sum(min(c, r[g]) for g, c in h.items())
    return match, total, ref_len, hyp_len


def corpus_bleu_counts_multi(refs_per_hyp: List[List[List[str]]],
                             hyps: List[List[str]], max_n: int = 4):
    """Multi-reference clipped counts (run_baseline.sh stage 9 scores the
    prediction against 4 Fisher references with sacrebleu): n-gram clip is
    the MAX count over the references, brevity-penalty reference length is
    the CLOSEST reference length (standard BLEU / sacrebleu semantics)."""
    match = [0] * max_n
    total = [0] * max_n
    ref_len = hyp_len = 0
    for refs, hyp in zip(refs_per_hyp, hyps):
        hyp_len += len(hyp)
        ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            h = _ngrams(hyp, n)
            clip: Counter = Counter()
            for r in refs:
                for g, c in _ngrams(r, n).items():
                    clip[g] = max(clip[g], c)
            total[n - 1] += max(len(hyp) - n + 1, 0)
            match[n - 1] += sum(min(c, clip[g]) for g, c in h.items())
    return match, total, ref_len, hyp_len


def bleu_from_counts(match, total, ref_len, hyp_len, smooth: bool = False
                     ) -> float:
    logs = 0.0
    for m_, t_ in zip(match, total):
        if smooth:
            m_, t_ = m_ + 1, t_ + 1
        if t_ == 0 or m_ == 0:
            return 0.0
        logs += math.log(m_ / t_)
    bp = min(0.0, 1.0 - ref_len / hyp_len) if hyp_len > 0 else -9999.0
    return 100.0 * math.exp(logs / len(match) + bp)


class BleuScorer:
    """--scoring bleu / sacrebleu. Uses sacrebleu when available (reference
    default for generate_for_s2st), own counts otherwise."""

    def __init__(self, lowercase: bool = False, tokenizer: str = "13a"):
        self.refs: List[str] = []
        self.hyps: List[str] = []
        self.lowercase = lowercase
        self.tokenizer = tokenizer

    def add_string(self, ref: str, pred: str):
        self.refs.append(ref)
        self.hyps.append(pred)

    def score(self) -> float:
        try:
            import sacrebleu
            return sacrebleu.corpus_bleu(
                self.hyps, [self.refs], lowercase=self.lowercase,
                tokenize=self.tokenizer).score
        except ImportError:
            refs = [r.split() for r in self.refs]
            hyps = [h.split() for h in self.hyps]
            return bleu_from_counts(*corpus_bleu_counts(refs, hyps))

    def result_string(self) -> str:
        try:
            import sacrebleu
            return str(sacrebleu.corpus_bleu(
                self.hyps, [self.refs], lowercase=self.lowercase,
                tokenize=self.tokenizer))
        except ImportError:
            return f"BLEU4 = {self.score():.2f}"


class ChrFScorer:
    """fairseq/scoring/chrf.py parity: corpus chrF via sacrebleu."""

    def __init__(self):
        self.refs = []
        self.hyps = []

    def add_string(self, ref: str, pred: str):
        self.refs.append(ref)
        self.hyps.append(pred)

    def score(self) -> float:
        import sacrebleu
        return sacrebleu.corpus_chrf(self.hyps, [self.refs]).score

    def result_string(self) -> str:
        try:
            import sacrebleu
            return sacrebleu.corpus_chrf(self.hyps, [self.refs]).format()
        except ImportError:
            return f"chrF = {self.score():.2f}"


def build_scorer(args):
    name = getattr(args, "scoring", "sacrebleu")
    if name == "wer":
        return WerScorer(lowercase=getattr(args, "wer_lowercase", False),
                         remove_punct=getattr(args, "wer_remove_punct", False),
                         tokenizer=getattr(args, "wer_tokenizer", "none"))
    if name in ("bleu", "sacrebleu"):
        return BleuScorer()
    if name == "chrf":
        return ChrFScorer()
    raise ValueError(f"unknown scorer {name}")
