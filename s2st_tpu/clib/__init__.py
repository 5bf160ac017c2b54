"""Native C++ host ops (ctypes bindings), compiled on demand with g++.

Parity: the reference's compiled host components (SURVEY.md §2.5) —
``fairseq.libbleu`` (BLEU n-gram counting driven via ctypes,
fairseq/scoring/bleu.py:17), ``fairseq.libnat`` CPU edit distance, and the
Cython token-budget batcher (``data_utils_fast.pyx``). Build is lazy and
cached next to the source; every caller has a pure-Python fallback, so a
missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "libbleu.cpp"
_SO = _HERE / "_libbleu_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return ctypes.CDLL(str(_SO))
    try:
        tmp = str(_SO) + ".tmp.so"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return ctypes.CDLL(str(_SO))
    except Exception as e:  # toolchain missing / failed: fall back
        logger.warning(f"native clib build failed ({e}); using Python paths")
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.bleu_add.restype = None
                lib.edit_distance.restype = ctypes.c_int64
                lib.batch_by_size.restype = ctypes.c_int64
            _lib = lib
    return _lib


def _i32(arr) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.int32)


class NativeBleu:
    """Accumulating clipped n-gram BLEU counter over int token sequences
    (fairseq.libbleu semantics)."""

    def __init__(self):
        self.match = np.zeros(4, np.int64)
        self.total = np.zeros(4, np.int64)
        self.ref_len = np.zeros(1, np.int64)
        self.hyp_len = np.zeros(1, np.int64)

    def add(self, ref: Sequence[int], hyp: Sequence[int]):
        lib = get_lib()
        ref = _i32(ref)
        hyp = _i32(hyp)
        if lib is None:
            from ..scoring import corpus_bleu_counts
            m, t, rl, hl = corpus_bleu_counts([list(ref)], [list(hyp)])
            self.match += np.asarray(m, np.int64)
            self.total += np.asarray(t, np.int64)
            self.ref_len[0] += rl
            self.hyp_len[0] += hl
            return
        lib.bleu_add(
            ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ref),
            hyp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(hyp),
            self.match.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.total.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.ref_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.hyp_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

    def score(self) -> float:
        from ..scoring import bleu_from_counts
        return bleu_from_counts(self.match.tolist(), self.total.tolist(),
                                int(self.ref_len[0]), int(self.hyp_len[0]))


def edit_distance_tokens(a: Sequence[int], b: Sequence[int]) -> int:
    lib = get_lib()
    a = _i32(a)
    b = _i32(b)
    if lib is None:
        prev = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            cur = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[len(b)]
    return int(lib.edit_distance(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(b)))


def batch_by_size_native(indices: np.ndarray, lengths: np.ndarray,
                         max_tokens: int, max_sentences: int = 0,
                         bsz_mult: int = 1) -> Optional[List[np.ndarray]]:
    """Native token-budget batcher. Returns None when the native lib is
    unavailable (caller falls back to the Python batcher)."""
    lib = get_lib()
    if lib is None:
        return None
    indices = np.ascontiguousarray(indices, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    out = np.full(len(indices), -2, np.int64)
    n_batches = lib.batch_by_size(
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices), max_tokens, max_sentences or 0, bsz_mult,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    batches: List[List[int]] = [[] for _ in range(n_batches)]
    for pos, bid in enumerate(out):
        if bid >= 0:
            batches[bid].append(int(indices[pos]))
    return [np.asarray(b) for b in batches if b]
