"""Paired source/target text dataset for the translation task.

Parity: ``fairseq/data/language_pair_dataset.py`` — collate semantics
(sort rows by descending source length; LEFT-padded sources by default,
right-padded targets; ``prev_output_tokens`` = target with EOS moved to the
front, data_utils.collate_tokens move_eos_to_beginning) over binarized
``.bin/.idx`` datasets produced by the preprocess CLI.

TPU-native twist: ``snap_kwargs`` snaps batch/time dims up to the coarse
shape grid (iterators.snap_len) so the compiled-program set stays small;
padded rows are all-PAD and vanish in the pad-masked loss.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

PAD, EOS = 1, 2


@dataclass
class LanguagePairItem:
    id: int
    source: np.ndarray          # (Ts,) int32, eos-terminated
    target: Optional[np.ndarray]  # (Tt,) int32, eos-terminated
    alignment: Optional[np.ndarray] = None  # (n, 2) int [src_pos, tgt_pos]


class LanguagePairDataset:
    """src/tgt are indexed datasets (data.indexed_dataset) or any sequence
    of int arrays; sizes are token counts including the trailing EOS."""

    def __init__(self, src, src_sizes, src_dict, tgt=None, tgt_sizes=None,
                 tgt_dict=None, left_pad_source: bool = True,
                 left_pad_target: bool = False, prepend_bos: bool = False,
                 align=None):
        self.src = src
        self.tgt = tgt
        # flat [s0,t0,s1,t1,...] int sequences (--load-alignments)
        self.align = align
        self.src_sizes = np.asarray(src_sizes)
        self.tgt_sizes = np.asarray(tgt_sizes) if tgt_sizes is not None \
            else None
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.left_pad_source = left_pad_source
        self.left_pad_target = left_pad_target
        # PrependTokenDataset(bos) on both streams (load_langpair_dataset
        # prepend_bos=True — the translation_lev task's setting)
        self.prepend_bos = prepend_bos
        if prepend_bos:
            self.src_sizes = self.src_sizes + 1
            if self.tgt_sizes is not None:
                self.tgt_sizes = self.tgt_sizes + 1

    def __len__(self):
        return len(self.src)

    def __getitem__(self, i: int) -> LanguagePairItem:
        src = np.asarray(self.src[i], np.int32)
        tgt = np.asarray(self.tgt[i], np.int32) if self.tgt is not None \
            else None
        if self.prepend_bos:
            bos = 0
            src = np.concatenate([[bos], src]).astype(np.int32)
            if tgt is not None:
                tgt = np.concatenate([[bos], tgt]).astype(np.int32)
        align = None
        if self.align is not None:
            align = np.asarray(self.align[i], np.int64).reshape(-1, 2)
        return LanguagePairItem(id=i, source=src, target=tgt,
                                alignment=align)

    def src_frames(self, i: int) -> int:
        """Batching cost of sample i. fairseq's num_tokens is
        max(src, tgt) (language_pair_dataset.py num_tokens) so a token
        budget bounds BOTH padded dims; the iterator reads this hook for
        its length-major ordering + token-budget batching."""
        n = int(self.src_sizes[i])
        if self.tgt_sizes is not None:
            n = max(n, int(self.tgt_sizes[i]))
        return n

    # -- static-shape policy ------------------------------------------------
    def snap_kwargs(self, items: List[LanguagePairItem]) -> Dict[str, int]:
        from .iterators import snap_len
        kw = dict(pad_batch=snap_len(len(items), 8),
                  pad_src=snap_len(max(len(it.source) for it in items), 8))
        if items[0].target is not None:
            kw["pad_tgt"] = snap_len(max(len(it.target) for it in items), 8)
        return kw

    # -- collate ------------------------------------------------------------
    def collate(self, items: List[LanguagePairItem],
                pad_batch: Optional[int] = None,
                pad_src: Optional[int] = None,
                pad_tgt: Optional[int] = None) -> Dict[str, Any]:
        if not items:
            return {}
        # sort by descending source length (collate sort_order parity)
        items = sorted(items, key=lambda it: -len(it.source))
        b = pad_batch or len(items)
        ts = pad_src or max(len(it.source) for it in items)

        src_tokens = np.full((b, ts), PAD, np.int32)
        src_lengths = np.zeros((b,), np.int32)
        for i, it in enumerate(items):
            n = len(it.source)
            if self.left_pad_source:
                src_tokens[i, ts - n:] = it.source
            else:
                src_tokens[i, :n] = it.source
            src_lengths[i] = n

        batch: Dict[str, Any] = {
            "id": np.asarray([it.id for it in items], np.int64),
            "src_tokens": src_tokens,
            "src_lengths": src_lengths,
            "nsentences": len(items),
        }
        if items[0].target is None:
            batch["ntokens"] = int(src_lengths.sum())
            return batch

        tt = pad_tgt or max(len(it.target) for it in items)
        target = np.full((b, tt), PAD, np.int32)
        prev = np.full((b, tt), PAD, np.int32)
        tgt_lengths = np.zeros((b,), np.int32)
        for i, it in enumerate(items):
            n = len(it.target)
            if self.left_pad_target:
                target[i, tt - n:] = it.target
                prev[i, tt - n] = it.target[-1]          # the EOS
                prev[i, tt - n + 1:] = it.target[:-1]
            else:
                target[i, :n] = it.target
                # move_eos_to_beginning (data_utils.collate_tokens parity)
                prev[i, 0] = it.target[-1]
                prev[i, 1:n] = it.target[:-1]
            tgt_lengths[i] = n
        batch["target"] = target
        batch["prev_output_tokens"] = prev
        batch["target_lengths"] = tgt_lengths
        batch["ntokens"] = int(tgt_lengths.sum())

        if items[0].alignment is not None:
            # fairseq collate alignments (language_pair_dataset.py:80-118):
            # offset src by the left-pad shift and tgt into the flattened
            # (bsz*tgt_sz) row index; weights = 1/freq of each flat tgt
            # index; invalid alignments (index >= length) are dropped.
            # TPU: pad to a snapped static width with zero-weight pairs.
            from .iterators import snap_len
            pairs = []
            for i, it in enumerate(items):
                al = it.alignment
                if al is None or len(al) == 0:
                    continue
                s_len, t_len = len(it.source), len(it.target)
                # check_alignment (language_pair_dataset.py:20-30):
                # indices must stay BELOW the EOS position (len - 1)
                if al[:, 0].max() >= s_len - 1 or al[:, 1].max() >= t_len - 1:
                    continue
                src_off = (ts - s_len) if self.left_pad_source else 0
                tgt_off = i * tt + ((tt - t_len) if self.left_pad_target
                                    else 0)
                pairs.append(al + np.asarray([[src_off, tgt_off]]))
            if pairs:
                flat = np.concatenate(pairs, axis=0)
                uniq, inv, counts = np.unique(
                    flat[:, 1], return_inverse=True, return_counts=True)
                weights = (1.0 / counts[inv]).astype(np.float32)
                width = snap_len(len(flat), 8)
                out = np.zeros((width, 2), np.int32)
                out[:len(flat)] = flat
                w = np.zeros((width,), np.float32)
                w[:len(flat)] = weights
                batch["alignments"] = out
                batch["align_weights"] = w
        return batch
