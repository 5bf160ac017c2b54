"""FASTA protein-sequence datasets (parity: ``fairseq/data/fasta_dataset.py``).

Reachable through the ``--dataset-impl fasta`` dispatch exactly like the
reference (``fairseq/data/indexed_dataset.py:56,67,85-88``): a ``.fasta``
file next to the split prefix is detected by ``infer_dataset_impl`` and
``EncodedFastaDataset`` encodes each record character-by-character with the
task dictionary (``dictionary.encode_line(seq, tokenizer=list)`` semantics).

Design differences from the reference: the byte-offset index is built with
one buffered numpy scan instead of a ``grep | awk | tqdm`` shell pipeline
(same ``{prefix}.fasta.idx.npy`` cache format: stacked [offsets, sizes]).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def fasta_file_path(prefix_path: str) -> str:
    return prefix_path + ".fasta"


def _build_index(fn: str):
    """Byte offsets of '>' header lines + concatenated sequence lengths."""
    offsets = []
    sizes = []
    pos = 0
    cur = -1
    with open(fn, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                offsets.append(pos)
                sizes.append(0)
                cur = len(sizes) - 1
            elif cur >= 0:
                sizes[cur] += len(line.strip())
            pos += len(line)
    return (np.asarray(offsets, np.int64), np.asarray(sizes, np.int64))


class FastaDataset:
    """Raw (description, sequence) records out of a ``.fasta`` file."""

    def __init__(self, path: str, cache_indices: bool = False):
        self.fn = fasta_file_path(path)
        self.cache = Path(f"{path}.fasta.idx.npy")
        if cache_indices and self.cache.exists():
            self.offsets, self.sizes = np.load(self.cache)
        else:
            self.offsets, self.sizes = _build_index(self.fn)
            if cache_indices:
                np.save(self.cache, np.stack([self.offsets, self.sizes]))
        self._f = None

    def _file(self):
        if self._f is None:
            self._f = open(self.fn, "r")
        return self._f

    def __len__(self):
        return len(self.offsets)

    def __getitem__(self, idx: int):
        f = self._file()
        f.seek(int(self.offsets[idx]))
        desc = f.readline().strip()
        seq = []
        line = f.readline()
        while line and not line.startswith(">"):
            seq.append(line.strip())
            line = f.readline()
        return desc, "".join(seq)

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(fasta_file_path(path))


class EncodedFastaDataset(FastaDataset):
    """FASTA records encoded per-character with a Dictionary
    (reference fasta_dataset.py:93-107: ``encode_line(line_tokenizer=list)``,
    i.e. one symbol per residue, eos appended)."""

    def __init__(self, path: str, dictionary):
        super().__init__(path, cache_indices=True)
        self.dictionary = dictionary

    def __getitem__(self, idx: int):
        _, seq = super().__getitem__(idx)
        return np.asarray(
            self.dictionary.encode_line(seq, tokenizer=list), np.int64)
