"""legacy_masked_lm task: BERT block-pair + NSP pipeline.

Parity: the pair construction and collate-time masking consume the global
numpy stream in the reference's exact draw order, so under the same seed
our BlockPairDataset / LegacyMaskedLMDataset produce byte-identical pairs,
masks, segments, and NSP labels as the reference's own
fairseq/data/legacy/{block_pair_dataset,masked_lm_dataset}.py (run
in-process via tests.ref_loader).
"""

import os
import random

import numpy as np
import pytest

from s2st_tpu.tasks.legacy_masked_lm import (BertDictionary,
                                             BlockPairDataset,
                                             LegacyMaskedLMDataset,
                                             numpy_seed)
from tests.ref_loader import load_reference, reference_available

requires_ref = pytest.mark.skipif(not reference_available(),
                                  reason="no /root/reference")


def _build_vocab(n_words=20):
    d = BertDictionary()
    for i in range(n_words):
        d.add_symbol(f"w{i}")
    return d


def _corpus(d, r, n_docs=4, sents_per_doc=(3, 6), sent_len=(2, 9)):
    """Token-id sentence lists with eos appended + blank-line separators
    (the binarized layout the legacy task loads)."""
    eos = d.eos_index
    rows = []
    for _ in range(n_docs):
        for _ in range(r.randint(*sents_per_doc)):
            L = r.randint(*sent_len)
            rows.append(np.asarray(
                [d.nspecial + r.randint(len(d) - d.nspecial)
                 for _ in range(L)] + [eos], np.int64))
        rows.append(np.asarray([eos], np.int64))  # doc break (size 1)
    return rows


class _NpDataset:
    def __init__(self, rows):
        self.rows = rows
        self.sizes = np.asarray([len(x) for x in rows])

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return self.rows[i]


class _TorchDataset(_NpDataset):
    def __getitem__(self, i):
        import torch
        return torch.from_numpy(self.rows[i])


def _ref_legacy():
    load_reference()
    import importlib
    bp = importlib.import_module("fairseq.data.legacy.block_pair_dataset")
    ml = importlib.import_module("fairseq.data.legacy.masked_lm_dataset")
    md = importlib.import_module(
        "fairseq.data.legacy.masked_lm_dictionary")
    return bp, ml, md


def _ref_dict(our: BertDictionary, md):
    d = md.BertDictionary()
    for sym in our.symbols[our.nspecial:]:
        d.add_symbol(sym)
    assert d.indices == our.indices
    return d


@requires_ref
@pytest.mark.parametrize("seed", [3, 17])
def test_block_pair_doc_parity(seed):
    our_d = _build_vocab()
    bp, _, md = _ref_legacy()
    ref_d = _ref_dict(our_d, md)
    r = np.random.RandomState(seed)
    rows = _corpus(our_d, r)

    with numpy_seed(1000 + seed):
        ref = bp.BlockPairDataset(_TorchDataset(rows), ref_d,
                                  np.asarray([len(x) for x in rows]),
                                  block_size=32, break_mode="doc")
    with numpy_seed(1000 + seed):
        ours = BlockPairDataset(_NpDataset(rows), our_d,
                                [len(x) for x in rows],
                                block_size=32, break_mode="doc")

    assert len(ours) == len(ref)
    np.testing.assert_array_equal(np.asarray(ours.sizes),
                                  np.asarray(ref.sizes))
    for i in range(len(ours)):
        a1, a2, lab = ours[i]
        b1, b2, lab_ref = ref[i]
        assert lab == lab_ref, i
        np.testing.assert_array_equal(a1, b1.numpy(), err_msg=f"pair {i}")
        np.testing.assert_array_equal(a2, b2.numpy(), err_msg=f"pair {i}")


@requires_ref
def test_block_pair_none_mode():
    """break_mode="none" is BROKEN in the reference: ``self.sent_pairs``
    is only initialized on the doc-mode branch, so `_pair_sentences`
    crashes with AttributeError on any input (block_pair_dataset.py:77
    vs :117) — asserted here. Ours implements the written intent (equal
    blocks over the flat stream, 50% consecutive / 50% random pairing)
    and is checked against a slicing oracle."""
    our_d = _build_vocab()
    bp, _, md = _ref_legacy()
    ref_d = _ref_dict(our_d, md)
    r = np.random.RandomState(0)
    # (block_size - 3) // 2 = 6 -> 6-token sentences align exactly
    rows = [np.asarray([our_d.nspecial + r.randint(10) for _ in range(6)],
                       np.int64) for _ in range(12)]

    with numpy_seed(7):
        with pytest.raises(AttributeError):
            bp.BlockPairDataset(_TorchDataset(rows), ref_d,
                                np.asarray([6] * 12),
                                block_size=15, break_mode="none")
    with numpy_seed(7):
        ours = BlockPairDataset(_NpDataset(rows), our_d, [6] * 12,
                                block_size=15, break_mode="none")
    flat = np.concatenate(rows)
    assert len(ours) == 12
    labels = []
    for i in range(len(ours)):
        a1, a2, lab = ours[i]
        labels.append(lab)
        np.testing.assert_array_equal(a1, flat[i * 6:(i + 1) * 6])
        assert len(a2) == 6
        if lab:  # true next block
            np.testing.assert_array_equal(
                a2, flat[(i + 1) * 6:(i + 2) * 6])
    assert 0 < sum(labels) < len(labels)  # both label kinds present


@requires_ref
def test_masked_collate_parity():
    """Collate-time BERT masking: same ids -> identical src_tokens /
    lm_target / segment_labels / sentence_targets as the reference
    MaskedLMDataset.collater."""
    our_d = _build_vocab()
    bp, ml, md = _ref_legacy()
    ref_d = _ref_dict(our_d, md)
    r = np.random.RandomState(5)
    rows = _corpus(our_d, r)
    with numpy_seed(11):
        ref_pairs = bp.BlockPairDataset(_TorchDataset(rows), ref_d,
                                        np.asarray([len(x) for x in rows]),
                                        block_size=32, break_mode="doc")
    with numpy_seed(11):
        our_pairs = BlockPairDataset(_NpDataset(rows), our_d,
                                     [len(x) for x in rows],
                                     block_size=32, break_mode="doc")

    ref_ds = ml.MaskedLMDataset(
        dataset=ref_pairs, sizes=ref_pairs.sizes, vocab=ref_d,
        pad_idx=ref_d.pad(), mask_idx=ref_d.mask(),
        classif_token_idx=ref_d.cls(), sep_token_idx=ref_d.sep(),
        shuffle=False, seed=42)
    our_ds = LegacyMaskedLMDataset(our_pairs, our_d, seed=42)

    ids = list(range(min(6, len(our_pairs))))
    ref_batch = ref_ds.collater([ref_ds[i] for i in ids])
    our_batch = our_ds.collate([our_ds[i] for i in ids])

    ref_src = ref_batch["net_input"]["src_tokens"].numpy()
    t = ref_src.shape[1]
    np.testing.assert_array_equal(our_batch["src_tokens"][:len(ids), :t],
                                  ref_src)
    np.testing.assert_array_equal(
        our_batch["target"][:len(ids), :t], ref_batch["lm_target"].numpy())
    np.testing.assert_array_equal(
        our_batch["segment_labels"][:len(ids), :t],
        ref_batch["net_input"]["segment_labels"].numpy())
    np.testing.assert_array_equal(
        our_batch["sentence_target"][:len(ids)],
        ref_batch["sentence_target"].numpy())
    assert our_batch["ntokens"] == ref_batch["ntokens"]


def test_legacy_cli_e2e(tmp_path):
    """preprocess --task legacy_masked_lm (BertDictionary ids) -> train
    bert arch with the NSP head + legacy_masked_lm_loss."""
    d = str(tmp_path)
    random.seed(0)
    with open(f"{d}/train", "w") as f:
        for doc in range(6):
            for _ in range(random.randint(3, 5)):
                L = random.randint(3, 8)
                f.write(" ".join(f"w{random.randrange(12)}"
                                 for _ in range(L)) + "\n")
            f.write("\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    assert pp(["--only-source", "--task", "legacy_masked_lm",
               "--trainpref", f"{d}/train", "--destdir", bin_dir,
               "--workers", "1"]) == 0
    # dict.txt reloads as a BertDictionary with the same indices
    bd = BertDictionary.load(f"{bin_dir}/dict.txt")
    assert bd.mask() == 4 and bd.cls() == 5 and bd.sep() == 6

    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "legacy_masked_lm", "--arch", "bert_base",
        "--criterion", "legacy_masked_lm_loss",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--tokens-per-sample", "32", "--break-mode", "doc",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--max-tokens", "256", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints", "--disable-validation",
        "--log-interval", "2"]) == 0
    assert os.path.exists(f"{d}/ckpt/checkpoint_last.npz")
