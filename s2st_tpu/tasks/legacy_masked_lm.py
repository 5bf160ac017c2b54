"""legacy_masked_lm task: BERT-style block-pair + next-sentence-prediction
pretraining.

Parity: ``fairseq/tasks/legacy_masked_lm.py`` over the legacy data stack —
``BertDictionary`` (`fairseq/data/legacy/masked_lm_dictionary.py:32-60`:
mask/cls/sep appended after the core specials), ``BlockPairDataset``
(`fairseq/data/legacy/block_pair_dataset.py`: documents split into
sentence-pair blocks, 50% true next sentence / 50% random doc, 10% short
sequences, longest-side front-or-back truncation) and ``MaskedLMDataset``
(`fairseq/data/legacy/masked_lm_dataset.py`: collate-time BERT masking —
ceil(0.15*len) positions, 80% -> <mask> / 10% -> random / 10% kept, rng
reseeded per batch from seed + first id so epochs repeat masks), feeding
the XLM/BERT sentence encoder (models/masked_lm_xlm.py, ``bert_base``
archs) with segment labels and the NSP head, under
``legacy_masked_lm_loss`` (+ the NSP cross-entropy term unless
``--masked-lm-only``; `criterions/legacy_masked_lm.py:95-123`).

All pair/mask randomness intentionally consumes the GLOBAL numpy stream
inside ``numpy_seed`` scopes with the reference's exact draw order, so a
given (corpus, seed) produces byte-identical pairs and masks — asserted
against the reference's own datasets in tests/test_legacy_masked_lm.py.
"""

from __future__ import annotations

import contextlib
import logging
import math
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.iterators import EpochBatchIterator
from ..registry import register_task

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def numpy_seed(seed: Optional[int]):
    """fairseq data_utils.numpy_seed: scoped global-numpy reseed."""
    if seed is None:
        yield
        return
    state = np.random.get_state()
    np.random.seed(seed)
    try:
        yield
    finally:
        np.random.set_state(state)


class BertDictionary(Dictionary):
    """Core specials (bos/pad/eos/unk) + <mask>, <cls>, <sep>."""

    def __init__(self):
        super().__init__()
        self.mask_index = self.add_symbol("<mask>")
        self.cls_index = self.add_symbol("<cls>")
        self.sep_index = self.add_symbol("<sep>")
        self.nspecial = len(self.symbols)

    def mask(self) -> int:
        return self.mask_index

    def cls(self) -> int:
        return self.cls_index

    def sep(self) -> int:
        return self.sep_index

    @classmethod
    def load(cls, path: str) -> "BertDictionary":
        d = cls()
        d.add_from_file(path)
        return d


class BlockPairDataset:
    """Sentence-pair blocks for NSP+MLM (block_pair_dataset.py semantics,
    identical global-numpy draw order; see module docstring).

    break_mode "doc": documents are runs of sentences separated by
    doc_break_size-length blank lines; each pair stays within (true next)
    or crosses (random) documents. break_mode "none": the flat token
    stream is cut into equal (block_size-3)//2 blocks and consecutive /
    random blocks are paired.
    """

    def __init__(self, dataset, dictionary: BertDictionary, sizes,
                 block_size: int, break_mode: str = "doc",
                 short_seq_prob: float = 0.1, doc_break_size: int = 1):
        self.dataset = dataset
        self.pad = dictionary.pad_index
        self.cls = dictionary.cls_index
        self.sep = dictionary.sep_index
        self.short_seq_prob = short_seq_prob
        sizes = np.asarray(sizes)
        self._sizes_arr = sizes
        self.sent_pairs: List[Tuple] = []
        self.sizes: List[int] = []
        if break_mode == "doc":
            self.block_indices: List[List[int]] = []
            doc: List[int] = []
            for sent_id, sz in enumerate(sizes):
                assert doc_break_size == 0 or sz != 0, (
                    "blank-line document separators must be a single eos")
                if sz == doc_break_size:
                    if doc:
                        self.block_indices.append(doc)
                    doc = []
                else:
                    doc.append(sent_id)
            max_num_tokens = block_size - 3     # [CLS] a [SEP] b [SEP]
            for doc_id, doc in enumerate(self.block_indices):
                self._pairs_from_doc(doc, doc_id, max_num_tokens, sizes)
        elif break_mode is None or break_mode == "none":
            sent_length = (block_size - 3) // 2
            total_len = int(sum(dataset.sizes))
            n_blocks = math.ceil(total_len / sent_length)
            starts = np.arange(n_blocks) * sent_length
            ends = np.minimum(starts + sent_length, total_len)
            block_sizes = ends - starts
            index = self._blocks_to_dataset_index(block_sizes)
            for sent_id, sent in enumerate(index):
                label = 1 if (np.random.rand() > 0.5
                              and sent_id != len(index) - 1) else 0
                if label:
                    nxt = index[sent_id + 1]
                else:
                    nxt = index[self._skip_sampling(
                        len(index), [sent_id, sent_id + 1])]
                self.sent_pairs.append((sent, nxt, label))
                self.sizes.append(3 + sent[3] + nxt[3])
        else:
            raise ValueError(f"Invalid break_mode: {break_mode}")
        self.sizes = np.asarray(self.sizes)

    # -- doc mode -------------------------------------------------------

    def _pairs_from_doc(self, doc, doc_id, max_num_tokens, sizes):
        chunk: List[int] = []
        curr = 0
        target_len = max_num_tokens
        if np.random.random() < self.short_seq_prob:
            target_len = np.random.randint(2, max_num_tokens)
        while curr < len(doc):
            chunk.append(doc[curr])
            length = int(sizes[chunk].sum())
            if curr == len(doc) - 1 or length >= target_len:
                a_end = 1
                if len(chunk) > 2:
                    a_end = np.random.randint(1, len(chunk) - 1)
                sent_a = chunk[:a_end]
                len_a = int(sizes[sent_a].sum())
                label = 1 if (np.random.rand() > 0.5
                              and len(chunk) != 1) else 0
                if not label:
                    target_b = target_len - len_a
                    rand_doc = self.block_indices[self._skip_sampling(
                        len(self.block_indices), [doc_id])]
                    start = np.random.randint(0, len(rand_doc))
                    sent_b: List[int] = []
                    for j in range(start, len(rand_doc)):
                        sent_b.append(rand_doc[j])
                        if int(sizes[sent_b].sum()) >= target_b:
                            break
                    curr -= len(chunk) - a_end  # re-queue unused tail
                else:
                    sent_b = chunk[a_end:]
                sent_a, sent_b = self._truncate(sent_a, sent_b,
                                                max_num_tokens)
                self.sent_pairs.append((sent_a, sent_b, label))
                self.sizes.append(3 + sent_a[3] + sent_b[3])
                chunk = []
            curr += 1

    def _skip_sampling(self, total: int, skip_ids: List[int]) -> int:
        rand_id = np.random.randint(total - len(skip_ids))
        return rand_id if rand_id < min(skip_ids) else \
            rand_id + len(skip_ids)

    def _truncate(self, sent_a, sent_b, max_num_tokens):
        sizes = self.dataset.sizes
        len_a, len_b = int(sizes[sent_a].sum()), int(sizes[sent_b].sum())
        fa = fb = ea = eb = 0
        while len_a + len_b - fa - fb - ea - eb > max_num_tokens:
            if len_a - fa - ea > len_b - fb - eb:
                if np.random.rand() < 0.5:
                    fa += 1
                else:
                    ea += 1
            else:
                if np.random.rand() < 0.5:
                    fb += 1
                else:
                    eb += 1
        return self._cut(sent_a, fa, ea), self._cut(sent_b, fb, eb)

    def _cut(self, sent, front_cut, end_cut):
        sizes = self.dataset.sizes
        start, end, offset = sent[0], sent[-1], 0
        target_len = int(sizes[sent].sum()) - front_cut - end_cut
        while front_cut > 0:
            if sizes[start] > front_cut:
                offset += front_cut
                break
            front_cut -= int(sizes[start])
            start += 1
        while end_cut > 0:
            if sizes[end] > end_cut:
                break
            end_cut -= int(sizes[end])
            end -= 1
        return (start, offset, end, target_len)

    # -- none mode ------------------------------------------------------

    def _blocks_to_dataset_index(self, block_sizes):
        """block_pair_dataset.py:_sent_to_dataset_index, faithfully
        including its supply walk over the BLOCK sizes (the reference's
        asserts make this mode well-defined only when blocks align with
        dataset items — uniform sentence lengths; parity-tested there)."""
        out = []
        ds_idx, ds_remaining = -1, 0
        for to_consume in block_sizes:
            size = int(to_consume)
            if ds_remaining == 0:
                ds_idx += 1
                ds_remaining = int(block_sizes[ds_idx])
            start_idx = ds_idx
            start_offset = int(block_sizes[ds_idx]) - ds_remaining
            while size > ds_remaining:
                size -= ds_remaining
                ds_idx += 1
                ds_remaining = int(block_sizes[ds_idx])
            ds_remaining -= size
            out.append((start_idx, start_offset, ds_idx, int(to_consume)))
        assert ds_remaining == 0
        assert ds_idx == len(self.dataset) - 1
        return out

    # -- item access ----------------------------------------------------

    def _fetch(self, start, offset, end, length) -> np.ndarray:
        buf = np.concatenate([np.asarray(self.dataset[i])
                              for i in range(start, end + 1)])
        return buf[offset:offset + length]

    def __getitem__(self, index: int):
        a, b, label = self.sent_pairs[index]
        return self._fetch(*a), self._fetch(*b), label

    def __len__(self) -> int:
        return len(self.sent_pairs)


class LegacyMaskedLMDataset:
    """Collate-time BERT masking over BlockPairDataset
    (masked_lm_dataset.py). Produces static-shape batches for XLA."""

    def __init__(self, dataset: BlockPairDataset, vocab: BertDictionary,
                 seed: int = 1, masking_ratio: float = 0.15,
                 masking_prob: float = 0.8,
                 random_token_prob: float = 0.1):
        self.dataset = dataset
        self.vocab = vocab
        self.seed = seed
        self.masking_ratio = masking_ratio
        self.masking_prob = masking_prob
        self.random_token_prob = random_token_prob
        self.sizes = np.asarray(dataset.sizes)

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        one, two, label = self.dataset[index]
        return {"id": index, "block_one": one, "block_two": two,
                "sentence_target": label}

    def src_frames(self, i: int) -> int:
        return int(self.sizes[i])

    def _mask_block(self, sentence: np.ndarray):
        """masked_lm_dataset.py:_mask_block — identical draw order."""
        sent = np.copy(sentence)
        n = len(sentence)
        mask_num = math.ceil(n * self.masking_ratio)
        mask = np.random.choice(n, mask_num, replace=False)
        target = np.copy(sentence)
        lo, hi = self.vocab.nspecial, len(self.vocab)
        for i in range(n):
            if i in mask:
                rand = np.random.random()
                if rand < self.masking_prob:
                    sent[i] = self.vocab.mask_index
                elif rand < self.masking_prob + self.random_token_prob:
                    sent[i] = np.random.randint(lo, hi)
            else:
                target[i] = self.vocab.pad_index
        return sent, target

    def snap_kwargs(self, items: List[Dict]) -> Dict[str, int]:
        from ..data.iterators import snap_len
        return dict(pad_batch=snap_len(len(items), 8),
                    pad_len=snap_len(max(
                        3 + len(s["block_one"]) + len(s["block_two"])
                        for s in items), 8))

    def collate(self, items: List[Dict], pad_batch: Optional[int] = None,
                pad_len: Optional[int] = None) -> Dict[str, Any]:
        pad = self.vocab.pad_index
        rows = []
        # rng reset from seed + FIRST id of the batch so every epoch masks
        # an example identically (masked_lm_dataset.py:186-190)
        with numpy_seed(self.seed + items[0]["id"]):
            for s in items:
                blk1, tgt1 = self._mask_block(s["block_one"])
                blk2, tgt2 = self._mask_block(s["block_two"])
                tokens = np.concatenate(
                    [[self.vocab.cls_index], blk1, [self.vocab.sep_index],
                     blk2, [self.vocab.sep_index]])
                targets = np.concatenate(
                    [[pad], tgt1, [pad], tgt2, [pad]])
                segments = np.concatenate(
                    [np.zeros(len(blk1) + 2, np.int32),
                     np.ones(len(blk2) + 1, np.int32)])
                rows.append((s["id"], tokens, targets, segments,
                             s["sentence_target"]))
        b = pad_batch or len(rows)
        t = pad_len or max(len(r[1]) for r in rows)
        src = np.full((b, t), pad, np.int32)
        tgt = np.full((b, t), pad, np.int32)
        # the reference merges segment_labels through collate_tokens, so
        # padding carries pad_idx (masked_lm_dataset.py:233-236); the
        # positions are attention-masked anyway
        seg = np.full((b, t), pad, np.int32)
        st = np.zeros((b,), np.int32)
        for i, (_, tokens, targets, segments, label) in enumerate(rows):
            n = min(len(tokens), t)
            src[i, :n] = tokens[:n]
            tgt[i, :n] = targets[:n]
            seg[i, :n] = segments[:n]
            st[i] = label
        return {"id": np.asarray([r[0] for r in rows], np.int64),
                "src_tokens": src, "segment_labels": seg, "target": tgt,
                "sentence_target": st,
                "ntokens": int(sum(len(r[1]) for r in rows)),
                "nsentences": len(rows)}


@register_task("legacy_masked_lm")
class LegacyMaskedLMTask:
    """fairseq/tasks/legacy_masked_lm.py: BERT pretraining over binarized
    monolingual corpora with blank-line document separators."""

    def __init__(self, args, dictionary: BertDictionary):
        self.args = args
        self.dictionary = dictionary
        self.seed = getattr(args, "seed", 1)
        self.datasets: Dict[str, LegacyMaskedLMDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "LegacyMaskedLMTask":
        data_path = str(args.data).split(os.pathsep)[0]
        d = BertDictionary.load(os.path.join(data_path, "dict.txt"))
        logger.info(f"bert dictionary: {len(d)} types")
        return cls(args, d)

    @property
    def source_dictionary(self):
        return self.dictionary

    target_dictionary = source_dictionary

    def load_dataset(self, split: str) -> LegacyMaskedLMDataset:
        data_path = str(self.args.data).split(os.pathsep)[0]
        ds = load_indexed_dataset(
            os.path.join(data_path, split), self.dictionary,
            getattr(self.args, "dataset_impl", None))
        if ds is None:
            raise FileNotFoundError(f"{split} not found in {data_path}")
        with numpy_seed(self.seed):
            pairs = BlockPairDataset(
                ds, self.dictionary, ds.sizes,
                getattr(self.args, "tokens_per_sample", 512),
                break_mode=getattr(self.args, "break_mode", "doc") or "doc",
                doc_break_size=1)
        logger.info(f"{split}: {len(pairs)} sentence pairs")
        self.datasets[split] = LegacyMaskedLMDataset(
            pairs, self.dictionary, seed=self.seed)
        return self.datasets[split]

    def get_batch_iterator(self, split: str, max_tokens: int,
                           max_sentences: Optional[int] = None,
                           seed: int = 1, num_shards: int = 1,
                           shard_id: int = 0, shuffle: bool = True,
                           data_rank: int = 0, data_world: int = 1
                           ) -> EpochBatchIterator:
        if split not in self.datasets:
            self.load_dataset(split)
        return EpochBatchIterator(
            self.datasets[split], max_tokens=max_tokens,
            max_sentences=max_sentences, seed=seed, num_shards=num_shards,
            shard_id=shard_id, shuffle=shuffle,
            required_batch_size_multiple=getattr(
                self.args, "required_batch_size_multiple", 1),
            data_rank=data_rank, data_world=data_world,
            num_workers=getattr(self.args, "num_workers", 0),
            num_batch_buckets=getattr(self.args, "num_batch_buckets", 0))

    # ------------------------------------------------------------------

    def build_model_config(self):
        import jax.numpy as jnp

        from ..models.masked_lm_xlm import MaskedLMXLMConfig
        a = self.args
        return MaskedLMXLMConfig(
            vocab_size=len(self.dictionary),
            encoder_layers=a.encoder_layers,
            encoder_embed_dim=a.encoder_embed_dim,
            encoder_ffn_embed_dim=a.encoder_ffn_embed_dim,
            encoder_attention_heads=a.encoder_attention_heads,
            dropout=a.dropout,
            attention_dropout=a.attention_dropout,
            act_dropout=getattr(a, "activation_dropout", 0.0),
            activation_fn=a.activation_fn,
            encoder_learned_pos=getattr(a, "encoder_learned_pos", False),
            num_segment=getattr(a, "num_segment", 2) or 2,
            share_encoder_input_output_embed=getattr(
                a, "share_encoder_input_output_embed", False),
            encoder_normalize_before=getattr(
                a, "encoder_normalize_before", False),
            sent_loss=not getattr(a, "masked_lm_only", False),
            max_positions=getattr(a, "tokens_per_sample", 512) + 2,
            dtype=jnp.bfloat16 if (a.fp16 or a.bf16) else jnp.float32)

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools

        from ..models import masked_lm_xlm as mx
        from ..train import losses as L
        cfg = self.build_model_config()
        return cfg, functools.partial(mx.init_masked_lm_xlm, cfg=cfg), \
            L.legacy_masked_lm_loss
