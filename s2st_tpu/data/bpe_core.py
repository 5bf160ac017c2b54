"""Host-side BPE machinery: a shared greedy rank-merge core, subword-nmt
codes (apply + learn), and the GPT-2 byte-level codec.

Parity targets:
  * subword-nmt apply_bpe/learn_bpe semantics — the reference wraps the
    subword_nmt library (fairseq/data/encoders/subword_nmt_bpe.py:25-48);
    that library is not in this image, so the algorithm is implemented
    natively here (version 0.1 and 0.2 word endings, fastBPE 3-column
    codes accepted).
  * GPT-2 byte-level BPE — fairseq/data/encoders/gpt2_bpe_utils.py.
    Verified in tests against the reference module itself AND against
    huggingface/tokenizers' ByteLevelBPETokenizer on the same
    vocab/merges.

All of this is offline text preprocessing (runs on host, never under
jit), so plain Python is the right tool.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

Pair = Tuple[str, str]

END_WORD = "</w>"


def fuse_pair(word: Sequence[str], first: str, second: str) -> List[str]:
    """Rewrite ``word`` fusing every (first, second) adjacency
    left-to-right (the rewrite step shared by merge application and
    codes learning)."""
    out: List[str] = []
    i = 0
    while i < len(word):
        if (i + 1 < len(word) and word[i] == first
                and word[i + 1] == second):
            out.append(first + second)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return out


def merge_by_rank(symbols: Sequence[str], ranks: Dict[Pair, int]) -> Tuple[str, ...]:
    """Greedy BPE merge: repeatedly fuse every occurrence of the
    lowest-ranked adjacent symbol pair until no adjacent pair has a rank.
    This is the inner loop shared by GPT-2 bpe() and subword-nmt
    encode() (both pick ``min(pairs, key=rank)`` then rewrite the word).
    """
    word = list(symbols)
    while len(word) > 1:
        best_i = -1
        best_rank = None
        for i in range(len(word) - 1):
            r = ranks.get((word[i], word[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        word = fuse_pair(word, word[best_i], word[best_i + 1])
    return tuple(word)


# ---------------------------------------------------------------------------
# subword-nmt codes
# ---------------------------------------------------------------------------

class SubwordNMTCodes:
    """Apply a subword-nmt codes file.

    Codes format: optional ``#version: 0.x`` header, then one merge per
    line ``A B`` (subword-nmt) or ``A B count`` (fastBPE; extra column
    ignored). Version 0.2 folds END_WORD into the last character
    (``l o w e r</w>``); headerless subword-nmt 0.1 files keep it as a
    separate symbol (``l o w e r </w>``). fastBPE codes are headerless
    but use the FUSED convention (fastBPE.hpp appends kEndWord to the
    last char), so FastBpe passes ``version=(0, 2)`` explicitly.
    """

    def __init__(self, codes_lines: Iterable[str], separator: str = "@@",
                 version: Optional[Tuple[int, int]] = None):
        lines = list(codes_lines)
        header_version = (0, 1)
        if lines and lines[0].startswith("#version:"):
            major, minor = lines[0].split(":", 1)[1].strip().split(".")
            header_version = (int(major), int(minor))
            lines = lines[1:]
        self.version = version if version is not None else header_version
        self.ranks: Dict[Pair, int] = {}
        for line in lines:
            fields = line.split()
            if len(fields) < 2:
                continue
            pair = (fields[0], fields[1])
            if pair not in self.ranks:
                self.ranks[pair] = len(self.ranks)
        self.separator = separator
        self._cache: Dict[str, Tuple[str, ...]] = {}

    @classmethod
    def from_file(cls, path: str, separator: str = "@@",
                  version: Optional[Tuple[int, int]] = None
                  ) -> "SubwordNMTCodes":
        with open(path, encoding="utf-8") as f:
            return cls(f.read().splitlines(), separator, version=version)

    def segment_word(self, word: str) -> List[str]:
        if not word:
            return []
        hit = self._cache.get(word)
        if hit is None:
            if self.version >= (0, 2):
                symbols = list(word[:-1]) + [word[-1] + END_WORD]
            else:
                symbols = list(word) + [END_WORD]
            merged = list(merge_by_rank(symbols, self.ranks))
            # strip the end-of-word marker back off
            if merged[-1] == END_WORD:
                merged.pop()
            elif merged[-1].endswith(END_WORD):
                merged[-1] = merged[-1][: -len(END_WORD)]
            hit = tuple(merged)
            self._cache[word] = hit
        return list(hit)

    def encode_line(self, line: str) -> str:
        out: List[str] = []
        for word in line.split():
            pieces = self.segment_word(word)
            out.extend(p + self.separator for p in pieces[:-1])
            if pieces:
                out.append(pieces[-1])
        return " ".join(out)

    def decode_line(self, line: str) -> str:
        return (line + " ").replace(self.separator + " ", "").rstrip()


def learn_codes(lines: Iterable[str], num_merges: int,
                min_frequency: int = 2) -> List[str]:
    """Learn a subword-nmt v0.2 codes file from raw text.

    Matches learn_bpe's selection rule: each step merges the most
    frequent adjacent pair, ties broken by the lexicographically
    greatest pair; stop early when the best pair's count drops below
    ``min_frequency``. Returns the codes file lines (header included).
    O(num_merges * corpus) recount per step — fine for the offline
    preprocessing scale this is used at.
    """
    freqs: Dict[Tuple[str, ...], int] = {}
    for line in lines:
        for word in line.split():
            if not word:
                continue
            key = tuple(word[:-1]) + (word[-1] + END_WORD,)
            freqs[key] = freqs.get(key, 0) + 1

    out = ["#version: 0.2"]
    for _ in range(num_merges):
        counts: Dict[Pair, int] = {}
        for word, n in freqs.items():
            for a, b in zip(word, word[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = max(counts, key=lambda p: (counts[p], p))
        if counts[best] < min_frequency:
            break
        out.append(f"{best[0]} {best[1]}")
        new_freqs: Dict[Tuple[str, ...], int] = {}
        for word, n in freqs.items():
            key = tuple(fuse_pair(word, best[0], best[1]))
            new_freqs[key] = new_freqs.get(key, 0) + n
        freqs = new_freqs
    return out


# ---------------------------------------------------------------------------
# GPT-2 byte-level BPE
# ---------------------------------------------------------------------------

def gpt2_byte_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte→unicode table: visually printable bytes
    (``!``..``~``, ``¡``..``¬``, ``®``..``ÿ``) map to themselves; the
    remaining 68 bytes map, in byte order, to 256, 257, ... so no BPE
    symbol ever contains raw whitespace/control characters
    (gpt2_bpe_utils.py:13-36)."""
    keep = (set(range(ord("!"), ord("~") + 1))
            | set(range(ord("¡"), ord("¬") + 1))
            | set(range(ord("®"), ord("ÿ") + 1)))
    table: Dict[int, str] = {}
    n = 0
    for b in range(256):
        if b in keep:
            table[b] = chr(b)
        else:
            table[b] = chr(256 + n)
            n += 1
    return table


# GPT-2's pre-tokenizer split (gpt2_bpe_utils.py:69-71): contraction
# suffixes, letter runs, digit runs, punctuation runs (each optionally
# space-prefixed), then whitespace.
GPT2_SPLIT_PATTERN = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
    r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")


class GPT2Codec:
    """Byte-level BPE with GPT-2's pre-tokenizer regex.

    ``vocab`` maps bpe symbol → id, ``merges`` is the ranked pair list
    (vocab.bpe order). encode/decode round-trip any unicode text.
    """

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Pair],
                 errors: str = "replace"):
        import regex  # \p{L}/\p{N} classes; stdlib re lacks them
        self.vocab = dict(vocab)
        self.inv_vocab = {i: t for t, i in self.vocab.items()}
        self.ranks: Dict[Pair, int] = {
            tuple(p): r for r, p in enumerate(merges)}
        self.errors = errors
        self._b2u = gpt2_byte_to_unicode()
        self._u2b = {u: b for b, u in self._b2u.items()}
        self._pat = regex.compile(GPT2_SPLIT_PATTERN)
        self._cache: Dict[str, Tuple[str, ...]] = {}

    def _bpe(self, token: str) -> Tuple[str, ...]:
        hit = self._cache.get(token)
        if hit is None:
            hit = merge_by_rank(tuple(token), self.ranks)
            self._cache[token] = hit
        return hit

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for piece in self._pat.findall(text):
            bchars = "".join(self._b2u[b] for b in piece.encode("utf-8"))
            ids.extend(self.vocab[sym] for sym in self._bpe(bchars))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.inv_vocab.get(i, str(i)) for i in ids)
        return bytes(self._u2b[c] for c in text).decode(
            "utf-8", errors=self.errors)

    @classmethod
    def from_files(cls, encoder_json: str, vocab_bpe: str) -> "GPT2Codec":
        """Load OpenAI-format encoder.json + vocab.bpe (first line is a
        version comment, last line empty — gpt2_bpe_utils.py:131-140)."""
        with open(encoder_json, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(vocab_bpe, encoding="utf-8") as f:
            merge_lines = f.read().split("\n")[1:-1]
        merges = [tuple(line.split()) for line in merge_lines]
        return cls(vocab, merges)
