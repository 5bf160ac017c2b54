"""Byte-level text codec (parity: fairseq/data/encoders/byte_utils.py).

Text becomes a string of "byte-characters": every utf-8 byte is one
unicode codepoint — the byte's own codepoint when it is printable
latin-1 (ascii 32-126 plus latin-1 161-172 / 174-255; NBSP and soft
hyphen excluded), otherwise ``256 + byte`` so whitespace/control bytes
never leak into vocab symbols. ``smart_byte_decode`` recovers corrupt
hypotheses (invalid utf-8 after beam search) by keeping the maximum
number of decodable characters, as the reference does
(byte_utils.py:34-51).
"""

from __future__ import annotations

import re

SPACE = " "
SPACE_ESCAPE = "▁"
_WS = re.compile(r"\s+")


def _is_printable_latin(b: int) -> bool:
    # byte_utils.py:13-15 — ascii printable + latin-1 printable,
    # minus NBSP (160) and soft hyphen (173)
    return 32 <= b <= 126 or 161 <= b <= 172 or 174 <= b <= 255


_BYTE_TO_CHAR = tuple(
    chr(b) if _is_printable_latin(b) else chr(256 + b) for b in range(256))
_CHAR_TO_BYTE = {c: b for b, c in enumerate(_BYTE_TO_CHAR)}


def byte_encode(x: str) -> str:
    """Whitespace-normalize, then map each utf-8 byte to its byte-char."""
    x = _WS.sub(SPACE, x)
    return "".join(_BYTE_TO_CHAR[b] for b in x.encode("utf-8"))


def byte_decode(x: str) -> str:
    """Inverse of byte_encode; '' when the byte string is not valid utf-8
    (unknown byte-chars raise, as in the reference)."""
    try:
        return bytes(_CHAR_TO_BYTE[c] for c in x).decode("utf-8")
    except UnicodeDecodeError:
        return ""


def smart_byte_decode(x: str) -> str:
    """byte_decode with best-effort recovery: if the whole string is not
    valid utf-8, dynamic-program over byte positions to keep the maximum
    number of whole decodable characters (spans of 1-4 byte-chars),
    dropping the rest."""
    whole = byte_decode(x)
    if whole:
        return whole
    n = len(x)
    if n == 0:
        return ""
    # best[i]: max #chars recoverable from x[:i]; back[i]: split point
    best = [0] * (n + 1)
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        best[i], back[i] = best[i - 1], i - 1
        for span in range(1, min(4, i) + 1):
            if best[i - span] + 1 > best[i] and byte_decode(x[i - span:i]):
                best[i], back[i] = best[i - span] + 1, i - span
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        if best[i] == best[j] + 1:
            pieces.append(byte_decode(x[j:i]))
        i = j
    return "".join(reversed(pieces))
