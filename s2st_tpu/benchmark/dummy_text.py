"""Synthetic text benchmark tasks (parity: fairseq/benchmark/
dummy_lm.py, dummy_mt.py, dummy_masked_lm.py — perf runs with no corpus
on disk).

``--task dummy_lm`` serves the fixed shifted-arange LM batch;
``--task dummy_mt`` serves a fixed (src, tgt) pair batch;
``--task dummy_masked_lm`` masks every 3rd position like the reference.
All reuse the real tasks' model/loss builders so the profiled train step
is the production one.
"""

from __future__ import annotations

import numpy as np

from ..data.dictionary import Dictionary
from ..registry import register_task
from ..tasks.language_modeling import LanguageModelingTask
from ..tasks.masked_lm import MaskedLMTask
from ..tasks.translation import TranslationTask

PAD = 1


def _dummy_dict(n: int) -> Dictionary:
    d = Dictionary()
    for i in range(n):
        d.add_symbol(f"word{i}")
    # pad_to_multiple_(8)
    while len(d) % 8 != 0:
        d.add_symbol(f"madeupword{len(d)}")
    return d


class _FixedBatches:
    """Iterator protocol shim: yields the same collated batch."""

    def __init__(self, batch, n_batches: int):
        self.batch = batch
        self.n = n_batches
        self.epoch = 0
        self.iterations_in_epoch = 0

    def __len__(self):
        return self.n

    def end_of_epoch(self):
        return self.iterations_in_epoch >= self.n

    def next_epoch_itr(self, shuffle=True, offset: int = 0):
        self.epoch += 1
        self.iterations_in_epoch = 0

        def gen():
            for _ in range(self.n):
                self.iterations_in_epoch += 1
                yield dict(self.batch)

        return gen()

    def state_dict(self):
        return {"epoch": self.epoch, "iterations_in_epoch": 0}

    def load_state_dict(self, state):
        self.epoch = int(state.get("epoch", 1))


def _bsz(args, tokens_per_sample: int) -> int:
    if getattr(args, "batch_size", None):
        b = int(args.batch_size)
    else:
        b = max(int(getattr(args, "max_tokens", 8192) or 8192)
                // tokens_per_sample, 1)
    # the data mesh row-shards batches; snap like the real collates
    from ..data.iterators import snap_len
    return snap_len(b, 8)


@register_task("dummy_lm")
class DummyLMTask(LanguageModelingTask):
    @classmethod
    def setup_task(cls, args):
        d = _dummy_dict(getattr(args, "dict_size", 49996))
        task = cls(args, d)
        return task

    def get_batch_iterator(self, split, max_tokens, max_sentences=None,
                           **kw):
        t = getattr(self.args, "tokens_per_sample", 512)
        seq = np.arange(t + 1, dtype=np.int32) % (len(self.dictionary)
                                                  - PAD - 1) + PAD + 1
        b = _bsz(self.args, t)
        batch = {
            "id": np.arange(b, dtype=np.int64),
            "src_tokens": np.tile(seq[:-1], (b, 1)),
            "target": np.tile(seq[1:], (b, 1)),
            "nsentences": b, "ntokens": b * t,
        }
        n = getattr(self.args, "dataset_size", 100000) // b
        return _FixedBatches(batch, max(n, 1))


@register_task("dummy_mt")
class DummyMTTask(TranslationTask):
    @classmethod
    def setup_task(cls, args):
        d = _dummy_dict(getattr(args, "dict_size", 49996))
        if args.source_lang is None:
            args.source_lang, args.target_lang = "src", "tgt"
        return cls(args, d, d)

    def get_batch_iterator(self, split, max_tokens, max_sentences=None,
                           **kw):
        s = getattr(self.args, "src_length", 30)
        t = getattr(self.args, "tgt_length", 30)
        vocab = len(self.src_dict)
        seq_s = np.arange(s, dtype=np.int32) % (vocab - 4) + 4
        seq_t = np.arange(t + 1, dtype=np.int32) % (vocab - 4) + 4
        b = _bsz(self.args, max(s, t))
        batch = {
            "id": np.arange(b, dtype=np.int64),
            "src_tokens": np.tile(seq_s, (b, 1)),
            "src_lengths": np.full((b,), s, np.int32),
            "prev_output_tokens": np.tile(seq_t[:-1], (b, 1)),
            "target": np.tile(seq_t[1:], (b, 1)),
            "nsentences": b, "ntokens": b * t,
        }
        n = getattr(self.args, "dataset_size", 100000) // b
        return _FixedBatches(batch, max(n, 1))


@register_task("dummy_masked_lm")
class DummyMaskedLMTask(MaskedLMTask):
    @classmethod
    def setup_task(cls, args):
        d = _dummy_dict(getattr(args, "dict_size", 49996))
        return cls(args, d)

    def get_batch_iterator(self, split, max_tokens, max_sentences=None,
                           **kw):
        t = getattr(self.args, "tokens_per_sample", 512)
        mask_idx = self.mask_idx
        seq = np.arange(t, dtype=np.int32) % (len(self.dictionary)
                                              - PAD - 2) + PAD + 1
        src = seq.copy()
        tgt = np.full((t,), PAD, np.int32)
        # mask every 3rd token (dummy_masked_lm.py:48-56)
        src[::3] = mask_idx
        tgt[::3] = seq[::3]
        b = _bsz(self.args, t)
        batch = {
            "id": np.arange(b, dtype=np.int64),
            "src_tokens": np.tile(src, (b, 1)),
            "target": np.tile(tgt, (b, 1)),
            "nsentences": b, "ntokens": b * t,
        }
        n = getattr(self.args, "dataset_size", 100000) // b
        return _FixedBatches(batch, max(n, 1))
