"""Huffman-coded corpus storage (builder, coder, mmap dataset).

Parity: ``fairseq/data/huffman/`` — ``HuffmanCodeBuilder`` /
``HuffmanCoder`` (`huffman_coder.py`) and
``HuffmanMMapIndexedDataset(+Builder)`` (`huffman_mmap_indexed_dataset.py`).
Byte-format compatible:

- codes come from the reference's two-queue construction over
  ``Counter.most_common()`` order (leaves popped from the least-common end,
  internal nodes appended left), right child = 0 / left child = 1,
  single-symbol root = "0";
- sentences are bit-padded with ``1 0*`` up to the byte boundary (a full
  extra byte when already aligned) and packed MSB-first — identical bytes
  to bitarray's big-endian ``tobytes``;
- the ``.vocab`` file is the ``symbol\\tcount`` table in id order, the
  ``.idx`` layout is ``HUFFIDX\\x00\\x00`` + <Q version + <Q data_len +
  <Q n_items + int32 sizes + int64 end-pointers, ``.bin`` is the
  concatenated codes.

The reference module itself needs the ``bitarray`` package (absent in this
image), so it cannot run here; this is a dependency-free numpy
reimplementation, verified by roundtrips, prefix-free/code-shape oracles,
and byte-level format checks against the documented layout.
"""

from __future__ import annotations

import os
import re
import shutil
import struct
import typing as tp
from collections import Counter, deque
from dataclasses import dataclass, field

import numpy as np

BLOCKSIZE = 8

_HDR_MAGIC = b"HUFFIDX\x00\x00"
_VERSION = 1


def vocab_file_path(prefix_path: str) -> str:
    return prefix_path + ".vocab"


def _data_path(prefix: str) -> str:
    return prefix + ".bin"


def _index_path(prefix: str) -> str:
    return prefix + ".idx"


@dataclass
class HuffmanNode:
    id: int
    count: int
    symbol: tp.Optional[str] = None
    left: tp.Optional["HuffmanNode"] = None
    right: tp.Optional["HuffmanNode"] = None
    code: tp.Optional[tp.Tuple[int, ...]] = None

    def is_leaf(self) -> bool:
        return self.left is None and self.right is None

    def code_table(self, prefix: tp.Tuple[int, ...] = ()
                   ) -> tp.Dict[str, "HuffmanNode"]:
        """Right = 0, left = 1 (huffman_coder.py:143-153); a lone root
        gets code (0,)."""
        if self.is_leaf():
            self.code = prefix if prefix else (0,)
            return {self.symbol: self}
        table = self.left.code_table(prefix + (1,))
        table.update(self.right.code_table(prefix + (0,)))
        return table


class HuffmanCoder:
    def __init__(self, root: HuffmanNode, bos="<s>", pad="<pad>",
                 eos="</s>", unk="<unk>"):
        self.root = root
        self.table = root.code_table()
        self.bos_word, self.unk_word = bos, unk
        self.pad_word, self.eos_word = pad, eos

    # -- bit packing -----------------------------------------------------

    @staticmethod
    def _pad_bits(bits: tp.List[int]) -> np.ndarray:
        """Bitpadding ``1`` then ``0``s to the byte boundary; a full extra
        byte when already aligned (huffman_coder.py:28-36)."""
        pad_len = BLOCKSIZE - (len(bits) % BLOCKSIZE) - 1
        return np.asarray(bits + [1] + [0] * pad_len, np.uint8)

    def encode(self, tokens: tp.Iterable[str]) -> bytes:
        bits: tp.List[int] = []
        for token in tokens:
            node = self.table.get(token)
            if node is None:
                if self.unk_word is None:
                    raise Exception(
                        f"unknown token {token} cannot be encoded.")
                node = self.table[self.unk_word]
            bits.extend(node.code)
        return np.packbits(self._pad_bits(bits), bitorder="big").tobytes()

    def decode(self, data: bytes) -> tp.Iterator[HuffmanNode]:
        bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="big")
        ones = np.flatnonzero(bits)
        if ones.size == 0:
            raise Exception("no bitpadding marker found")
        end = int(ones[-1])            # strip the trailing `1 0*`
        node = self.root
        for bit in bits[:end]:
            node = node.left if bit else node.right
            if node is None:
                raise Exception("fell off a leaf")
            if node.is_leaf():
                yield node
                node = self.root
        if node is not self.root:
            raise Exception("couldn't decode all the bits")

    # -- table access / io ------------------------------------------------

    def get_code(self, symbol: str):
        node = self.table.get(symbol)
        return None if node is None else node.code

    def __iter__(self):
        yield from self.table.values()

    def __len__(self) -> int:
        return len(self.table)

    def __contains__(self, sym: str) -> bool:
        return sym in self.table

    def __eq__(self, other) -> bool:
        return {s: n.code for s, n in self.table.items()} == \
            {s: n.code for s, n in other.table.items()}

    def merge(self, other: "HuffmanCoder") -> "HuffmanCoder":
        builder = HuffmanCodeBuilder()
        for n in self:
            builder.increment(n.symbol, n.count)
        for n in other:
            builder.increment(n.symbol, n.count)
        return builder.build_code()

    def to_file(self, filename: str, sep: str = "\t") -> None:
        nodes = sorted(self.table.values(), key=lambda n: n.id)
        with open(filename, "w", encoding="utf-8") as f:
            for n in nodes:
                f.write(f"{n.symbol}{sep}{n.count}\n")

    @classmethod
    def from_file(cls, filename: str, bos="<s>", pad="<pad>", eos="</s>",
                  unk="<unk>") -> "HuffmanCoder":
        return HuffmanCodeBuilder.from_file(filename).build_code(
            bos=bos, pad=pad, eos=eos, unk=unk)

    def to_dictionary(self):
        from .dictionary import Dictionary
        d = Dictionary()
        for n in self:
            d.add_symbol(n.symbol, n=n.count)
        d.finalize()
        return d


class HuffmanCodeBuilder:
    """Count symbols, then build the code with the reference's two-queue
    algorithm (huffman_coder.py:219-265): leaves sorted most-common-first,
    both queues popped from the least-common end, internal nodes appended
    on the left."""

    def __init__(self):
        self.symbols: Counter = Counter()

    def add_symbols(self, *syms: str) -> None:
        self.symbols.update(syms)

    def increment(self, symbol: str, cnt: int) -> None:
        self.symbols[symbol] += cnt

    def __add__(self, other: "HuffmanCodeBuilder") -> "HuffmanCodeBuilder":
        out = HuffmanCodeBuilder()
        out.symbols = self.symbols + other.symbols
        return out

    @classmethod
    def from_file(cls, filename: str) -> "HuffmanCodeBuilder":
        c = cls()
        with open(filename, "r", encoding="utf-8") as f:
            for line in f:
                split = re.split(r"[\s]+", line)
                c.increment(split[0], int(split[1]))
        return c

    def to_file(self, filename: str, sep: str = "\t") -> None:
        with open(filename, "w", encoding="utf-8") as f:
            for tok, cnt in self.symbols.most_common():
                f.write(f"{tok}{sep}{cnt}\n")

    @staticmethod
    def _smallest(q1: deque, q2: deque) -> HuffmanNode:
        if not q1:
            return q2.pop()
        if not q2:
            return q1.pop()
        return q1.pop() if q1[-1].count < q2[-1].count else q2.pop()

    def build_code(self, bos="<s>", pad="<pad>", eos="</s>", unk="<unk>"
                   ) -> HuffmanCoder:
        assert len(self.symbols) > 0, \
            "cannot build code from empty list of symbols"
        for special in (bos, pad, eos, unk):
            if self.symbols[special] == 0:
                self.add_symbols(special)

        leaves = deque(
            HuffmanNode(symbol=symbol, count=count, id=idx)
            for idx, (symbol, count) in enumerate(self.symbols.most_common())
        )
        if len(leaves) == 1:
            root = leaves.pop()
            root.id = 0
            return HuffmanCoder(root, bos=bos, pad=pad, eos=eos, unk=unk)

        nodes: deque = deque()
        node_id = 0
        while leaves or len(nodes) != 1:
            n1 = self._smallest(leaves, nodes)
            n2 = self._smallest(leaves, nodes)
            nodes.appendleft(HuffmanNode(
                count=n1.count + n2.count, left=n1, right=n2, id=node_id))
            node_id += 1
        return HuffmanCoder(nodes.pop(), bos=bos, pad=pad, eos=eos, unk=unk)


# ---------------------------------------------------------------------------
# mmap dataset
# ---------------------------------------------------------------------------

class HuffmanMMapIndex:
    """Index file: magic + <Q version + <Q data_len + <Q n + int32 sizes +
    int64 END pointers (huffman_mmap_indexed_dataset.py:20-117)."""

    @classmethod
    def write(cls, path: str, data_len: int, sizes, pointers) -> None:
        with open(path, "wb") as f:
            f.write(_HDR_MAGIC)
            f.write(struct.pack("<Q", _VERSION))
            f.write(struct.pack("<Q", data_len))
            f.write(struct.pack("<Q", len(sizes)))
            f.write(np.asarray(sizes, np.int32).tobytes(order="C"))
            f.write(np.asarray(pointers, np.int64).tobytes(order="C"))

    def __init__(self, path: str):
        with open(path, "rb") as stream:
            magic = stream.read(9)
            assert magic == _HDR_MAGIC, (
                "Index file doesn't match expected format. Make sure that "
                "--dataset-impl is configured properly.")
            (version,) = struct.unpack("<Q", stream.read(8))
            assert version == _VERSION
            (self._data_len,) = struct.unpack("<Q", stream.read(8))
            (self._len,) = struct.unpack("<Q", stream.read(8))
            offset = stream.tell()
        buf = np.memmap(path, mode="r", order="C")
        self._sizes = np.frombuffer(buf, np.int32, count=self._len,
                                    offset=offset)
        self._pointers = np.frombuffer(
            buf, np.int64, count=self._len,
            offset=offset + self._sizes.nbytes)

    @property
    def data_len(self) -> int:
        return self._data_len

    @property
    def sizes(self) -> np.ndarray:
        return self._sizes

    def __getitem__(self, i: int):
        return self._pointers[i], self._sizes[i]

    def __iter__(self):
        for i in range(self._len):
            yield self[i]

    def __len__(self) -> int:
        return self._len


class HuffmanMMapIndexedDataset:
    """Reads items as int64 arrays of node IDS (the coder's id space, as
    in the reference's __getitem__)."""

    def __init__(self, prefix_path: str):
        self._prefix = prefix_path
        self._index = HuffmanMMapIndex(_index_path(prefix_path))
        self._coder = HuffmanCoder.from_file(vocab_file_path(prefix_path))
        with open(_data_path(prefix_path), "rb") as f:
            self._data = np.memmap(f, mode="r", order="C")

    def __len__(self) -> int:
        return len(self._index)

    def _decode(self, i: int):
        ptr, _ = self._index[i]
        prev = 0 if i == 0 else int(self._index[i - 1][0])
        return self._coder.decode(self._data[prev:int(ptr)].tobytes())

    def __getitem__(self, i: int) -> np.ndarray:
        return np.asarray([n.id for n in self._decode(i)], np.int64)

    def get_symbols(self, i: int) -> tp.Iterator[str]:
        for n in self._decode(i):
            yield n.symbol

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    @property
    def sizes(self) -> np.ndarray:
        return self._index.sizes

    @property
    def coder(self) -> HuffmanCoder:
        return self._coder

    @staticmethod
    def exists(prefix_path: str) -> bool:
        return (os.path.exists(_index_path(prefix_path))
                and os.path.exists(_data_path(prefix_path))
                and os.path.exists(vocab_file_path(prefix_path)))


class HuffmanMMapIndexedDatasetBuilder:
    """Stream tokenized sentences into a huffman-compressed dataset
    (vocab first, then .bin, index on close)."""

    def __init__(self, path_prefix: str, coder: HuffmanCoder):
        self._path_prefix = path_prefix
        self._coder = coder
        self._sizes: tp.List[int] = []
        self._ptrs: tp.List[int] = []
        self._data_len = 0

    def open(self):
        self._coder.to_file(vocab_file_path(self._path_prefix))
        self._data_file = open(_data_path(self._path_prefix), "wb")
        return self

    __enter__ = open

    def add_item(self, tokens: tp.List[str]) -> None:
        encoded = self._coder.encode(tokens)
        last = self._ptrs[-1] if self._ptrs else 0
        self._sizes.append(len(tokens))
        self._ptrs.append(last + len(encoded))
        self._data_len += len(encoded)
        self._data_file.write(encoded)

    def append(self, other_prefix: str) -> None:
        other = HuffmanMMapIndex(_index_path(other_prefix))
        for ptr, size in other:
            self._ptrs.append(int(ptr) + self._data_len)
            self._sizes.append(int(size))
        with open(_data_path(other_prefix), "rb") as f:
            shutil.copyfileobj(f, self._data_file)
        self._data_len += other.data_len

    def close(self):
        self._data_file.close()
        HuffmanMMapIndex.write(_index_path(self._path_prefix),
                               self._data_len, self._sizes, self._ptrs)

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.close()
