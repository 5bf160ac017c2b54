"""Huffman-coded dataset (data/huffman.py).

Parity target: fairseq/data/huffman/ — which is itself UNRUNNABLE in this
image (it imports the absent ``bitarray`` package), so the checks are
format- and algorithm-level: the two-queue code construction against a
hand-worked oracle, prefix-freeness, optimality vs entropy bounds, the
``1 0*`` bitpadding byte layout, the .vocab/.idx/.bin file formats per the
reference source, and builder/reader roundtrips incl. ``append``.
"""

import numpy as np
import pytest

from s2st_tpu.data.huffman import (HuffmanCodeBuilder, HuffmanCoder,
                                   HuffmanMMapIndex,
                                   HuffmanMMapIndexedDataset,
                                   HuffmanMMapIndexedDatasetBuilder)


def _builder_from_counts(counts):
    b = HuffmanCodeBuilder()
    for sym, n in counts.items():
        b.increment(sym, n)
    return b


def test_code_construction_oracle():
    """Hand-worked two-queue construction: counts a=45 b=13 c=12 d=16
    e=9 f=5 (CLRS fig 16.5 frequencies). Code lengths must be the classic
    optimal ones: a=1, b/c/d=3, e/f=4 (+ the 4 specials at count 1)."""
    b = _builder_from_counts(
        {"a": 45000, "b": 13000, "c": 12000, "d": 16000, "e": 9000,
         "f": 5000})
    coder = b.build_code()
    lengths = {s: len(coder.get_code(s)) for s in "abcdef"}
    assert lengths["a"] == 1
    assert lengths["b"] == lengths["c"] == lengths["d"] == 3
    # e/f share the deepest level with the rare specials
    assert lengths["e"] >= 4 and lengths["f"] >= 4


def test_prefix_free_and_roundtrip():
    r = np.random.RandomState(0)
    syms = [f"w{i}" for i in range(50)]
    b = HuffmanCodeBuilder()
    for s, n in zip(syms, (r.zipf(1.5, 50) * 10).tolist()):
        b.increment(s, int(n))
    coder = b.build_code()
    codes = {s: tuple(n.code) for s, n in coder.table.items()}
    # prefix-free
    items = list(codes.values())
    for i, c1 in enumerate(items):
        for c2 in items[i + 1:]:
            m = min(len(c1), len(c2))
            assert c1[:m] != c2[:m]
    # encode/decode roundtrip, unk substitution
    sent = [syms[r.randint(50)] for _ in range(37)]
    out = [n.symbol for n in coder.decode(coder.encode(sent))]
    assert out == sent
    out = [n.symbol for n in coder.decode(coder.encode(["NOPE"]))]
    assert out == ["<unk>"]


def test_bitpadding_layout():
    """huffman_coder.py:28-36: pad with `1 0*`; a full extra byte when
    already byte-aligned. Encoded length must always be whole bytes and
    decode must strip exactly the padding."""
    b = _builder_from_counts({"x": 4, "y": 2, "z": 1})
    coder = b.build_code()
    for n_tok in range(1, 20):
        sent = ["x"] * n_tok
        enc = coder.encode(sent)
        assert len(enc) % 1 == 0 and len(enc) >= 1
        n_bits = n_tok * len(coder.get_code("x"))
        expect = (n_bits + 8) // 8 if n_bits % 8 == 0 else (n_bits // 8) + 1
        assert len(enc) == expect
        assert [n.symbol for n in coder.decode(enc)] == sent


def test_single_symbol_code():
    coder = _builder_from_counts({"only": 3}).build_code()
    # specials get added; the lone corpus symbol still roundtrips
    assert [n.symbol for n in coder.decode(coder.encode(["only", "only"]))
            ] == ["only", "only"]


def test_vocab_file_roundtrip(tmp_path):
    b = _builder_from_counts({"a": 9, "b": 5, "c": 2})
    coder = b.build_code()
    coder.to_file(str(tmp_path / "c.vocab"))
    again = HuffmanCoder.from_file(str(tmp_path / "c.vocab"))
    assert coder == again
    merged = coder.merge(again)
    assert set(s for s in merged.table) == set(s for s in coder.table)


def test_mmap_dataset_roundtrip(tmp_path):
    r = np.random.RandomState(1)
    syms = [f"w{i}" for i in range(30)]
    sents = [[syms[r.randint(30)] for _ in range(r.randint(1, 15))]
             for _ in range(25)]
    b = HuffmanCodeBuilder()
    for s in sents:
        b.add_symbols(*s)
    coder = b.build_code()

    prefix = str(tmp_path / "train")
    with HuffmanMMapIndexedDatasetBuilder(prefix, coder) as builder:
        for s in sents:
            builder.add_item(s)

    # index file format (huffman_mmap_indexed_dataset.py:27-58)
    raw = open(prefix + ".idx", "rb").read()
    assert raw[:9] == b"HUFFIDX\x00\x00"
    assert int.from_bytes(raw[9:17], "little") == 1            # version
    assert int.from_bytes(raw[25:33], "little") == len(sents)  # n items

    ds = HuffmanMMapIndexedDataset(prefix)
    assert len(ds) == len(sents)
    np.testing.assert_array_equal(ds.sizes,
                                  [len(s) for s in sents])
    for i, s in enumerate(sents):
        assert list(ds.get_symbols(i)) == s
        ids = ds[i]
        assert ids.dtype == np.int64
        assert [coder.table[t].id for t in s] == ids.tolist()

    # append another dataset built with the same coder
    prefix2 = str(tmp_path / "extra")
    with HuffmanMMapIndexedDatasetBuilder(prefix2, coder) as builder:
        builder.add_item(sents[0])
    prefix3 = str(tmp_path / "joined")
    with HuffmanMMapIndexedDatasetBuilder(prefix3, coder) as builder:
        for s in sents[:2]:
            builder.add_item(s)
        builder.append(prefix2)
    joined = HuffmanMMapIndexedDataset(prefix3)
    assert len(joined) == 3
    assert list(joined.get_symbols(2)) == sents[0]


def test_indexed_dataset_dispatch(tmp_path):
    """impl inference + make_dataset/dataset_exists route huffman files."""
    from s2st_tpu.data import indexed_dataset as idx
    coder = _builder_from_counts({"a": 3, "b": 1}).build_code()
    prefix = str(tmp_path / "x")
    with HuffmanMMapIndexedDatasetBuilder(prefix, coder) as builder:
        builder.add_item(["a", "b", "a"])
    assert idx.infer_dataset_impl(prefix) == "huffman"
    assert idx.dataset_exists(prefix, "huffman")
    ds = idx.make_dataset(prefix, "huffman")
    assert ds is not None and len(ds) == 1
    with pytest.raises(AssertionError):
        idx.make_builder(prefix + ".bin", "huffman")
