"""Binarized-dataset format interop vs the reference's own code.

The .bin/.idx formats are fairseq's serialization contract; these tests
prove BIT-compatibility both ways: files written by the reference's
builders load here, files written here load in the reference's readers,
for both the mmap and the legacy TorchNet formats — plus the preprocess
CLI end-to-end with its dict.txt readable by the reference Dictionary.
"""

import os

import numpy as np
import pytest

from s2st_tpu.data import indexed_dataset as ids
from s2st_tpu.data.dictionary import Dictionary

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _items(seed=0, n=13):
    r = np.random.RandomState(seed)
    return [r.randint(0, 30000, size=r.randint(1, 40)).astype(np.int64)
            for _ in range(n)]


# ---------------------------------------------------------------------------
# mmap format
# ---------------------------------------------------------------------------

def test_mmap_roundtrip_native(tmp_path):
    items = _items()
    prefix = str(tmp_path / "data")
    b = ids.MMapIndexedDatasetBuilder(ids.data_file_path(prefix),
                                      dtype=np.uint16)
    for it in items:
        b.add_item(it)
    b.finalize(ids.index_file_path(prefix))
    ds = ids.MMapIndexedDataset(prefix)
    assert len(ds) == len(items)
    for i, it in enumerate(items):
        got = ds[i]
        assert got.dtype == np.int64
        np.testing.assert_array_equal(got, it)
    np.testing.assert_array_equal(ds.sizes, [len(it) for it in items])


def test_mmap_reference_writes_we_read(tmp_path, ref):
    rid = ref.fairseq.data.indexed_dataset
    items = _items(1)
    prefix = str(tmp_path / "refw")
    b = rid.MMapIndexedDatasetBuilder(rid.data_file_path(prefix),
                                      dtype=np.uint16)
    for it in items:
        b.add_item(torch.from_numpy(it))
    b.finalize(rid.index_file_path(prefix))
    ds = ids.MMapIndexedDataset(prefix)
    for i, it in enumerate(items):
        np.testing.assert_array_equal(ds[i], it)


def test_mmap_we_write_reference_reads(tmp_path, ref):
    rid = ref.fairseq.data.indexed_dataset
    items = _items(2)
    prefix = str(tmp_path / "ourw")
    b = ids.MMapIndexedDatasetBuilder(ids.data_file_path(prefix),
                                      dtype=np.uint16)
    for it in items:
        b.add_item(it)
    b.finalize(ids.index_file_path(prefix))
    ds = rid.MMapIndexedDataset(prefix)
    assert len(ds) == len(items)
    for i, it in enumerate(items):
        np.testing.assert_array_equal(ds[i].numpy(), it)


def test_mmap_merge_file(tmp_path):
    a, b_items = _items(3, 5), _items(4, 7)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    for prefix, items in ((pa, a), (pb, b_items)):
        b = ids.MMapIndexedDatasetBuilder(ids.data_file_path(prefix),
                                          dtype=np.uint16)
        for it in items:
            b.add_item(it)
        b.finalize(ids.index_file_path(prefix))
    merged = str(tmp_path / "m")
    b = ids.MMapIndexedDatasetBuilder(ids.data_file_path(merged),
                                      dtype=np.uint16)
    for it in a:
        b.add_item(it)
    b.merge_file_(pb)
    b.finalize(ids.index_file_path(merged))
    ds = ids.MMapIndexedDataset(merged)
    allitems = a + b_items
    assert len(ds) == len(allitems)
    for i, it in enumerate(allitems):
        np.testing.assert_array_equal(ds[i], it)


# ---------------------------------------------------------------------------
# legacy TorchNet format
# ---------------------------------------------------------------------------

def test_legacy_cross_interop(tmp_path, ref):
    rid = ref.fairseq.data.indexed_dataset
    items = _items(5)
    # reference writes (+1 Lua), we read with fix_lua_indexing
    prefix = str(tmp_path / "refleg")
    b = rid.IndexedDatasetBuilder(rid.data_file_path(prefix),
                                  dtype=np.int32)
    for it in items:
        b.add_item(torch.from_numpy(it))
    b.finalize(rid.index_file_path(prefix))
    for cls in (ids.IndexedDataset, ids.IndexedCachedDataset):
        ds = cls(prefix, fix_lua_indexing=True)
        if ds.supports_prefetch:
            ds.prefetch(range(len(items)))
        for i, it in enumerate(items):
            np.testing.assert_array_equal(ds[i], it)

    # we write, reference reads
    prefix2 = str(tmp_path / "ourleg")
    b2 = ids.IndexedDatasetBuilder(ids.data_file_path(prefix2),
                                   dtype=np.int32)
    for it in items:
        b2.add_item(it)
    b2.finalize(ids.index_file_path(prefix2))
    rds = rid.IndexedDataset(prefix2, fix_lua_indexing=True)
    for i, it in enumerate(items):
        np.testing.assert_array_equal(rds[i].numpy(), it)


def test_infer_impl_and_factories(tmp_path):
    items = _items(6, 3)
    for impl in ("mmap", "lazy", "cached"):
        prefix = str(tmp_path / impl)
        b = ids.make_builder(ids.data_file_path(prefix), impl,
                             vocab_size=300)
        for it in items:
            b.add_item(it)
        b.finalize(ids.index_file_path(prefix))
        assert ids.infer_dataset_impl(prefix) == (
            "mmap" if impl == "mmap" else "cached")
        ds = ids.make_dataset(prefix, impl, fix_lua_indexing=impl != "mmap")
        for i, it in enumerate(items):
            np.testing.assert_array_equal(np.asarray(ds[i]), it)
    # vocab 300 -> uint16 storage on mmap (best_fitting_int_dtype)
    assert ids.MMapIndexedDataset(str(tmp_path / "mmap")).dtype == np.uint16


# ---------------------------------------------------------------------------
# Dictionary.finalize parity
# ---------------------------------------------------------------------------

def test_dictionary_finalize_matches_reference(ref):
    words = [("zeta", 5), ("alpha", 5), ("mid", 3), ("rare", 1),
             ("beta", 7), ("kappa", 3)]
    ours, theirs = Dictionary(), ref.Dictionary()
    for w, n in words:
        ours.add_symbol(w, n)
        theirs.add_symbol(w, n)
    ours.finalize(threshold=2, nwords=-1, padding_factor=8)
    theirs.finalize(threshold=2, nwords=-1, padding_factor=8)
    assert ours.symbols == theirs.symbols
    assert ours.count == theirs.count
    assert len(ours) % 8 == 0


# ---------------------------------------------------------------------------
# preprocess CLI e2e + reference loads our output
# ---------------------------------------------------------------------------

CORPUS_SRC = ["la casa azul", "el gato come", "la casa grande",
              "el gato azul duerme"]
CORPUS_TGT = ["the blue house", "the cat eats", "the big house",
              "the blue cat sleeps"]


def _write_corpus(d):
    (d / "train.es").write_text("\n".join(CORPUS_SRC) + "\n")
    (d / "train.en").write_text("\n".join(CORPUS_TGT) + "\n")
    (d / "valid.es").write_text(CORPUS_SRC[0] + "\n")
    (d / "valid.en").write_text(CORPUS_TGT[0] + "\n")


def test_preprocess_cli_e2e_reference_loads_output(tmp_path, ref):
    from s2st_tpu.cli.preprocess import main as pp_main
    _write_corpus(tmp_path)
    dest = tmp_path / "bin"
    rc = pp_main(["-s", "es", "-t", "en",
                  "--trainpref", str(tmp_path / "train"),
                  "--validpref", str(tmp_path / "valid"),
                  "--destdir", str(dest), "--dataset-impl", "mmap"])
    assert rc == 0
    # our dict loads in the reference Dictionary and matches ours
    ref_dict = ref.Dictionary.load(str(dest / "dict.es.txt"))
    our_dict = Dictionary.load(str(dest / "dict.es.txt"))
    assert ref_dict.symbols == our_dict.symbols
    # binarized tokens: reference reader sees encode_line output
    rid = ref.fairseq.data.indexed_dataset
    rds = rid.MMapIndexedDataset(str(dest / "train.es-en.es"))
    assert len(rds) == len(CORPUS_SRC)
    for i, line in enumerate(CORPUS_SRC):
        want = ref_dict.encode_line(line, add_if_not_exist=False).numpy()
        np.testing.assert_array_equal(rds[i].numpy(), want)
    # valid split exists and loads natively too
    vds = ids.make_dataset(str(dest / "valid.es-en.en"), "mmap")
    assert len(vds) == 1


def test_preprocess_joined_dictionary_and_thresholds(tmp_path):
    from s2st_tpu.cli.preprocess import main as pp_main
    _write_corpus(tmp_path)
    dest = tmp_path / "joined"
    pp_main(["-s", "es", "-t", "en",
             "--trainpref", str(tmp_path / "train"),
             "--destdir", str(dest), "--joined-dictionary",
             "--thresholdsrc", "2"])
    d_es = Dictionary.load(str(dest / "dict.es.txt"))
    d_en = Dictionary.load(str(dest / "dict.en.txt"))
    assert d_es.symbols == d_en.symbols  # joined
    # threshold 2 drops singletons (e.g. 'duerme' appears once)
    assert "duerme" not in d_es
    assert d_es.index("la") != d_es.unk()


def test_preprocess_raw_impl_copies(tmp_path):
    from s2st_tpu.cli.preprocess import main as pp_main
    _write_corpus(tmp_path)
    dest = tmp_path / "raw"
    pp_main(["-s", "es", "-t", "en",
             "--trainpref", str(tmp_path / "train"),
             "--destdir", str(dest), "--dataset-impl", "raw"])
    out = dest / "train.es-en.es"
    assert out.read_text().splitlines() == CORPUS_SRC
    d = Dictionary.load(str(dest / "dict.es.txt"))
    raw = ids.make_dataset(str(out), "raw", dictionary=d)
    assert raw.get_original_text(0) == CORPUS_SRC[0]
    np.testing.assert_array_equal(
        raw[0], d.encode_line(CORPUS_SRC[0], append_eos=True))


def test_load_indexed_dataset_combine_and_read_binarized(tmp_path, capsys):
    from s2st_tpu.cli.read_binarized import main as rb_main
    d = Dictionary()
    for w in ("casa", "gato", "azul"):
        d.add_symbol(w)
    d.save(str(tmp_path / "dict.txt"))
    lines = [["casa", "azul"], ["gato"], ["azul", "gato", "casa"]]
    # two shards: prefix + prefix1 (combine convention)
    for prefix, chunk in ((str(tmp_path / "data"), lines[:2]),
                          (str(tmp_path / "data1"), lines[2:])):
        b = ids.make_builder(ids.data_file_path(prefix), "mmap",
                             vocab_size=len(d))
        for ws in chunk:
            b.add_item(d.encode_line(" ".join(ws), append_eos=True))
        b.finalize(ids.index_file_path(prefix))
    ds = ids.load_indexed_dataset(str(tmp_path / "data"), combine=True)
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[2],
                                  d.encode_line("azul gato casa"))
    assert list(ds.sizes) == [3, 2, 4]

    rc = rb_main(["--input", str(tmp_path / "data"),
                  "--dict", str(tmp_path / "dict.txt")])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["casa azul", "gato"]  # shard 0 only without combine


def test_spm_cli_gated(tmp_path):
    pytest.importorskip("sentencepiece")
    from s2st_tpu.cli.spm import main as spm_main
    corpus = tmp_path / "c.txt"
    corpus.write_text("la casa azul\nel gato come\n" * 50)
    prefix = tmp_path / "m"
    assert spm_main(["train", f"--input={corpus}",
                     f"--model_prefix={prefix}", "--vocab_size=30",
                     "--model_type=bpe"]) == 0
    enc_out = tmp_path / "enc.txt"
    assert spm_main(["encode", "--model", f"{prefix}.model",
                     "--inputs", str(corpus), "--outputs",
                     str(enc_out)]) == 0
    assert enc_out.read_text().strip()


def test_preprocess_dict_only_and_existing_dict_guard(tmp_path):
    from s2st_tpu.cli.preprocess import main as pp_main
    _write_corpus(tmp_path)
    dest = tmp_path / "dictonly"
    pp_main(["-s", "es", "-t", "en",
             "--trainpref", str(tmp_path / "train"),
             "--destdir", str(dest), "--dict-only"])
    assert (dest / "dict.es.txt").exists()
    assert not ids.MMapIndexedDataset.exists(str(dest / "train.es-en.es"))
    with pytest.raises(FileExistsError):
        pp_main(["-s", "es", "-t", "en",
                 "--trainpref", str(tmp_path / "train"),
                 "--destdir", str(dest)])


def test_fasta_dataset_roundtrip(tmp_path):
    """--dataset-impl fasta (reference fairseq/data/fasta_dataset.py via
    indexed_dataset.py:56,67,85-88): records parse, index caches, and
    EncodedFastaDataset encodes per-residue with eos."""
    import numpy as np
    from s2st_tpu.data.dictionary import Dictionary
    from s2st_tpu.data.fasta_dataset import EncodedFastaDataset, FastaDataset
    from s2st_tpu.data.indexed_dataset import (infer_dataset_impl,
                                               make_dataset)
    prefix = str(tmp_path / "proteins")
    with open(prefix + ".fasta", "w") as f:
        f.write(">seq1 desc\nMKV\nLAG\n>seq2\nGG\n>seq3\nMKVLAGGA\n")
    ds = FastaDataset(prefix)
    assert len(ds) == 3
    assert ds[0] == (">seq1 desc", "MKVLAG")
    assert ds[1] == (">seq2", "GG")
    assert list(ds.sizes) == [6, 2, 8]

    d = Dictionary()
    for ch in "MKVLAG":
        d.add_symbol(ch)
    enc = EncodedFastaDataset(prefix, d)
    row = enc[0]
    assert row[-1] == d.eos()
    assert [d[int(t)] for t in row[:-1]] == list("MKVLAG")
    # index cache written and reused
    assert (tmp_path / "proteins.fasta.idx.npy").is_file()
    enc2 = EncodedFastaDataset(prefix, d)
    np.testing.assert_array_equal(enc2.offsets, enc.offsets)

    # factory dispatch parity
    assert infer_dataset_impl(prefix) == "fasta"
    via = make_dataset(prefix, "fasta", dictionary=d)
    np.testing.assert_array_equal(via[2][:-1],
                                  [d.index(c) for c in "MKVLAGGA"])
