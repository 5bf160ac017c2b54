"""Binarized token datasets, bit-compatible with fairseq's on-disk formats
(parity: fairseq/data/indexed_dataset.py).

Two binary formats plus a raw-text fallback:

  * ``mmap`` — MMapIndexedDataset. ``.bin`` is the raw concatenation of
    each item's array bytes; ``.idx`` is ``MMIDIDX\\x00\\x00`` magic,
    u64 version=1, u8 dtype code, u64 count, int32 sizes[count], int64
    byte-pointers[count] (indexed_dataset.py:389-464). The modern default
    and the interop surface: files written by fairseq-preprocess load
    here unchanged, and vice versa (round-trip tested against the
    reference's own reader/writer).
  * ``lazy`` / ``cached`` — the TorchNet legacy format. ``.idx`` is
    ``TNTIDX\\x00\\x00`` magic, u64 version=1, u64 dtype code + u64
    element size, u64 len + u64 size-count, then int64 dim_offsets[len+1],
    element data_offsets[len+1], sizes arrays. Values are stored +1 (Lua
    heritage); readers pass ``fix_lua_indexing=True`` to undo it
    (indexed_dataset.py:144-214,321-380).
  * ``raw`` — in-memory binarization of a text file with a Dictionary.

Everything is numpy (zero-copy np.memmap readers); items come back as
int64 arrays like the reference's ``.long()`` tensors.
"""

from __future__ import annotations

import os
import shutil
import struct
from typing import List, Optional

import numpy as np

_MMAP_MAGIC = b"MMIDIDX\x00\x00"
_TNT_MAGIC = b"TNTIDX\x00\x00"

# dtype header codes (indexed_dataset.py:115-126). The reference maps
# BOTH 6 (np.float) and 7 (np.double) to float64 — np.float was the
# builtin float alias — and its _dtype_header_code returns the first
# match, so float64 writes code 6. Mirror exactly for bit-compat;
# float32 has no code in the reference's table, so it has none here.
_CODE_TO_DTYPE = {
    1: np.uint8, 2: np.int8, 3: np.int16, 4: np.int32, 5: np.int64,
    6: np.float64, 7: np.float64, 8: np.uint16, 9: np.uint32, 10: np.uint64,
}
_DTYPE_TO_CODE: dict = {}
for _code, _dt in _CODE_TO_DTYPE.items():
    _DTYPE_TO_CODE.setdefault(np.dtype(_dt), _code)  # first match wins


def best_fitting_int_dtype(max_int_to_represent: Optional[int]):
    """Smallest safe integer dtype for token ids (same thresholds as the
    reference: uint16 under 65500, uint32 under 2^32-1, else int64)."""
    if max_int_to_represent is None:
        return np.uint32
    if max_int_to_represent < 65500:
        return np.uint16
    if max_int_to_represent < 4294967295:
        return np.uint32
    return np.int64


def index_file_path(prefix_path: str) -> str:
    return prefix_path + ".idx"


def data_file_path(prefix_path: str) -> str:
    return prefix_path + ".bin"


# ---------------------------------------------------------------------------
# mmap format
# ---------------------------------------------------------------------------

class MMapIndexedDataset:
    """Zero-copy reader for the mmap format. ``ds[i]`` → int64 ndarray."""

    def __init__(self, path: str):
        self._path = path
        with open(index_file_path(path), "rb") as f:
            magic = f.read(len(_MMAP_MAGIC))
            if magic != _MMAP_MAGIC:
                raise ValueError(
                    f"{index_file_path(path)}: not an MMIDIDX index "
                    "(check --dataset-impl)")
            (version,) = struct.unpack("<Q", f.read(8))
            assert version == 1, version
            (code,) = struct.unpack("<B", f.read(1))
            self._dtype = np.dtype(_CODE_TO_DTYPE[code])
            (self._len,) = struct.unpack("<Q", f.read(8))
            header_end = f.tell()
        idx_buf = np.memmap(index_file_path(path), mode="r")
        self._sizes = np.frombuffer(idx_buf, dtype=np.int32,
                                    count=self._len, offset=header_end)
        self._pointers = np.frombuffer(
            idx_buf, dtype=np.int64, count=self._len,
            offset=header_end + self._sizes.nbytes)
        self._data = np.memmap(data_file_path(path), mode="r")

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, i: int) -> np.ndarray:
        out = np.frombuffer(self._data, dtype=self._dtype,
                            count=int(self._sizes[i]),
                            offset=int(self._pointers[i]))
        return out if out.dtype == np.int64 else out.astype(np.int64)

    @property
    def sizes(self) -> np.ndarray:
        return self._sizes

    @property
    def dtype(self):
        return self._dtype

    def num_tokens(self, i: int) -> int:
        return int(self._sizes[i])

    def size(self, i: int) -> int:
        return int(self._sizes[i])

    @property
    def supports_prefetch(self) -> bool:
        return False

    @staticmethod
    def exists(path: str) -> bool:
        return (os.path.exists(index_file_path(path))
                and os.path.exists(data_file_path(path)))


class MMapIndexedDatasetBuilder:
    def __init__(self, out_file: str, dtype=np.int64):
        self._out = open(out_file, "wb")
        self._dtype = np.dtype(dtype)
        self._sizes: List[int] = []

    def add_item(self, array) -> None:
        arr = np.asarray(array)
        if hasattr(array, "numpy"):  # torch tensor passthrough
            arr = array.numpy()
        arr = np.ascontiguousarray(arr, dtype=self._dtype)
        self._out.write(arr.tobytes())
        self._sizes.append(arr.size)

    def merge_file_(self, another_prefix: str) -> None:
        other = MMapIndexedDataset(another_prefix)
        assert other.dtype == self._dtype, (other.dtype, self._dtype)
        self._sizes.extend(int(s) for s in other.sizes)
        with open(data_file_path(another_prefix), "rb") as f:
            shutil.copyfileobj(f, self._out)

    def finalize(self, index_file: str) -> None:
        self._out.close()
        sizes = np.asarray(self._sizes, dtype=np.int32)
        pointers = np.zeros(len(sizes), dtype=np.int64)
        if len(sizes) > 1:
            byte_sizes = sizes[:-1].astype(np.int64) * self._dtype.itemsize
            pointers[1:] = np.cumsum(byte_sizes)
        with open(index_file, "wb") as f:
            f.write(_MMAP_MAGIC)
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<B", _DTYPE_TO_CODE[self._dtype]))
            f.write(struct.pack("<Q", len(sizes)))
            f.write(sizes.tobytes())
            f.write(pointers.tobytes())


# ---------------------------------------------------------------------------
# legacy TorchNet format
# ---------------------------------------------------------------------------

class IndexedDataset:
    """Legacy-format reader (``lazy``). Values were written +1; pass
    ``fix_lua_indexing=True`` (as fairseq's loaders do) to undo."""

    def __init__(self, path: str, fix_lua_indexing: bool = False):
        self._path = path
        self._fix_lua = fix_lua_indexing
        with open(index_file_path(path), "rb") as f:
            magic = f.read(len(_TNT_MAGIC))
            if magic != _TNT_MAGIC:
                raise ValueError(
                    f"{index_file_path(path)}: not a TNTIDX index "
                    "(check --dataset-impl)")
            (version,) = struct.unpack("<Q", f.read(8))
            assert version == 1, version
            code, self._element_size = struct.unpack("<QQ", f.read(16))
            self._dtype = np.dtype(_CODE_TO_DTYPE[code])
            self._len, n_sizes = struct.unpack("<QQ", f.read(16))
            self.dim_offsets = np.fromfile(f, np.int64, self._len + 1)
            self.data_offsets = np.fromfile(f, np.int64, self._len + 1)
            self.sizes = np.fromfile(f, np.int64, n_sizes)
        self._data_file = None

    def _item_raw(self, i: int) -> np.ndarray:
        if not 0 <= i < self._len:
            raise IndexError("index out of range")
        if self._data_file is None:
            self._data_file = open(data_file_path(self._path), "rb",
                                   buffering=0)
        shape = self.sizes[self.dim_offsets[i]:self.dim_offsets[i + 1]]
        out = np.empty(tuple(int(s) for s in shape), dtype=self._dtype)
        self._data_file.seek(int(self.data_offsets[i]) * self._element_size)
        self._data_file.readinto(out)
        return out

    def __getitem__(self, i: int) -> np.ndarray:
        out = self._item_raw(i).astype(np.int64)
        return out - 1 if self._fix_lua else out

    def __len__(self) -> int:
        return self._len

    @property
    def dtype(self):
        return self._dtype

    def num_tokens(self, i: int) -> int:
        return int(self.sizes[i])

    def size(self, i: int) -> int:
        return int(self.sizes[i])

    @property
    def supports_prefetch(self) -> bool:
        return False

    def close(self):
        if self._data_file is not None:
            self._data_file.close()
            self._data_file = None

    @staticmethod
    def exists(path: str) -> bool:
        return (os.path.exists(index_file_path(path))
                and os.path.exists(data_file_path(path)))


class IndexedCachedDataset(IndexedDataset):
    """Legacy reader with explicit prefetch-into-RAM (``cached``)."""

    def __init__(self, path: str, fix_lua_indexing: bool = False):
        super().__init__(path, fix_lua_indexing=fix_lua_indexing)
        self._cache: dict = {}

    @property
    def supports_prefetch(self) -> bool:
        return True

    def prefetch(self, indices) -> None:
        for i in sorted(set(int(j) for j in indices)):
            if i not in self._cache:
                self._cache[i] = self._item_raw(i)
        self.close()

    def __getitem__(self, i: int) -> np.ndarray:
        raw = self._cache[i] if i in self._cache else self._item_raw(i)
        out = raw.astype(np.int64)
        return out - 1 if self._fix_lua else out


class IndexedDatasetBuilder:
    # (the reference's table lists np.float at 4 bytes — a latent bug
    # there, since np.float was float64; we store the true item size)
    _ELEMENT_SIZES = {np.dtype(np.uint8): 1, np.dtype(np.int8): 1,
                      np.dtype(np.int16): 2, np.dtype(np.int32): 4,
                      np.dtype(np.int64): 8, np.dtype(np.float64): 8}

    def __init__(self, out_file: str, dtype=np.int32):
        self._out = open(out_file, "wb")
        self._dtype = np.dtype(dtype)
        self._element_size = self._ELEMENT_SIZES[self._dtype]
        self.data_offsets: List[int] = [0]
        self.dim_offsets: List[int] = [0]
        self.sizes: List[int] = []

    def add_item(self, array) -> None:
        arr = np.asarray(array.numpy() if hasattr(array, "numpy") else array)
        # +1: Lua-era convention the legacy format carries
        # (indexed_dataset.py:340-342)
        arr = np.ascontiguousarray(arr + 1, dtype=self._dtype)
        self._out.write(arr.tobytes())
        self.data_offsets.append(self.data_offsets[-1] + arr.size)
        self.sizes.extend(arr.shape)
        self.dim_offsets.append(self.dim_offsets[-1] + arr.ndim)

    def merge_file_(self, another_prefix: str) -> None:
        other = IndexedDataset(another_prefix)
        assert other.dtype == self._dtype
        data_base = self.data_offsets[-1]
        self.data_offsets.extend(data_base + int(o)
                                 for o in other.data_offsets[1:])
        dim_base = self.dim_offsets[-1]
        self.dim_offsets.extend(dim_base + int(o)
                                for o in other.dim_offsets[1:])
        self.sizes.extend(int(s) for s in other.sizes)
        with open(data_file_path(another_prefix), "rb") as f:
            shutil.copyfileobj(f, self._out)

    def finalize(self, index_file: str) -> None:
        self._out.close()
        with open(index_file, "wb") as f:
            f.write(_TNT_MAGIC)
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<QQ", _DTYPE_TO_CODE[self._dtype],
                                self._element_size))
            f.write(struct.pack("<QQ", len(self.data_offsets) - 1,
                                len(self.sizes)))
            for arr in (self.dim_offsets, self.data_offsets, self.sizes):
                f.write(np.asarray(arr, dtype=np.int64).tobytes())


# ---------------------------------------------------------------------------
# raw text
# ---------------------------------------------------------------------------

class IndexedRawTextDataset:
    """Binarize a text file in memory with a Dictionary; keeps the
    original lines for get_original_text."""

    def __init__(self, path: str, dictionary, append_eos: bool = True,
                 reverse_order: bool = False):
        self.tokens_list: List[np.ndarray] = []
        self.lines: List[str] = []
        sizes = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                self.lines.append(line.rstrip("\n"))
                ids = dictionary.encode_line(line, append_eos=append_eos)
                if reverse_order:
                    eos_tail = 1 if append_eos else 0
                    body = ids[:len(ids) - eos_tail][::-1]
                    ids = np.concatenate([body, ids[len(ids) - eos_tail:]])
                self.tokens_list.append(np.asarray(ids, dtype=np.int64))
                sizes.append(len(ids))
        self.sizes = np.asarray(sizes, dtype=np.int64)

    def __getitem__(self, i: int) -> np.ndarray:
        return self.tokens_list[i]

    def get_original_text(self, i: int) -> str:
        return self.lines[i]

    def __len__(self) -> int:
        return len(self.tokens_list)

    def num_tokens(self, i: int) -> int:
        return int(self.sizes[i])

    def size(self, i: int) -> int:
        return int(self.sizes[i])

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(path)


# ---------------------------------------------------------------------------
# factory helpers
# ---------------------------------------------------------------------------

def infer_dataset_impl(path: str) -> Optional[str]:
    if IndexedRawTextDataset.exists(path) and not os.path.exists(
            index_file_path(path)):
        return "raw"
    if os.path.exists(index_file_path(path)):
        with open(index_file_path(path), "rb") as f:
            magic = f.read(8)
        if magic == _TNT_MAGIC:
            return "cached"
        if magic == _MMAP_MAGIC[:8]:
            return "mmap"
        if magic == b"HUFFIDX\x00":
            return "huffman"
    from .fasta_dataset import FastaDataset
    if FastaDataset.exists(path):
        return "fasta"
    return None


def make_builder(out_file: str, impl: str, vocab_size: Optional[int] = None):
    assert impl != "huffman", (
        "use HuffmanMMapIndexedDatasetBuilder directly (as the reference's "
        "preprocess asserts, fairseq_cli/preprocess.py:44)")
    if impl == "mmap":
        return MMapIndexedDatasetBuilder(
            out_file, dtype=best_fitting_int_dtype(vocab_size))
    return IndexedDatasetBuilder(out_file)


def make_dataset(path: str, impl: str, fix_lua_indexing: bool = False,
                 dictionary=None):
    if impl == "raw" and IndexedRawTextDataset.exists(path):
        assert dictionary is not None
        return IndexedRawTextDataset(path, dictionary)
    if impl == "lazy" and IndexedDataset.exists(path):
        return IndexedDataset(path, fix_lua_indexing=fix_lua_indexing)
    if impl == "cached" and IndexedDataset.exists(path):
        return IndexedCachedDataset(path, fix_lua_indexing=fix_lua_indexing)
    if impl == "mmap" and MMapIndexedDataset.exists(path):
        return MMapIndexedDataset(path)
    if impl == "huffman":
        from .huffman import HuffmanMMapIndexedDataset
        if HuffmanMMapIndexedDataset.exists(path):
            return HuffmanMMapIndexedDataset(path)
    if impl == "fasta":
        from .fasta_dataset import EncodedFastaDataset, FastaDataset
        if FastaDataset.exists(path):
            assert dictionary is not None
            return EncodedFastaDataset(path, dictionary)
    return None


def load_indexed_dataset(path: str, dictionary=None,
                         dataset_impl: Optional[str] = None,
                         combine: bool = False, default: str = "cached"):
    """fairseq data_utils.load_indexed_dataset parity: infer the impl when
    not given, read with fix_lua_indexing, and with ``combine`` also load
    ``path1``, ``path2``, ... shards into one concatenated list view."""
    datasets = []
    for k in range(0, 1_000_000):
        path_k = path + (str(k) if k > 0 else "")
        impl = dataset_impl
        if impl is None:
            impl = infer_dataset_impl(path_k) or default
        ds = make_dataset(path_k, impl, fix_lua_indexing=True,
                          dictionary=dictionary)
        if ds is None:
            break
        datasets.append(ds)
        if not combine:
            break
    if not datasets:
        return None
    if len(datasets) == 1:
        return datasets[0]

    class _Concat:
        def __init__(self, parts):
            self._parts = parts
            self._lens = [len(p) for p in parts]
            self.sizes = np.concatenate(
                [np.asarray(p.sizes).reshape(-1) for p in parts])

        def __len__(self):
            return sum(self._lens)

        def __getitem__(self, i):
            for p, n in zip(self._parts, self._lens):
                if i < n:
                    return p[i]
                i -= n
            raise IndexError(i)

    return _Concat(datasets)


def dataset_exists(path: str, impl: str) -> bool:
    if impl == "raw":
        return IndexedRawTextDataset.exists(path)
    if impl == "mmap":
        return MMapIndexedDataset.exists(path)
    if impl == "huffman":
        from .huffman import HuffmanMMapIndexedDataset
        return HuffmanMMapIndexedDataset.exists(path)
    return IndexedDataset.exists(path)
