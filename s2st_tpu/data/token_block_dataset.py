"""Token-block slicing + monolingual LM dataset.

Parity: ``fairseq/data/token_block_utils_fast.pyx`` (the Cython hot loop —
reimplemented as vectorized numpy where the mode allows, a plain loop where
it is inherently sequential), ``fairseq/data/token_block_dataset.py``
(block -> dataset-index mapping, include_targets source/item/past_target
shifting) and ``fairseq/data/monolingual_dataset.py`` (self/future/past
targets, add_eos_for_other_targets, add_bos_token, right-padded collate).

Break modes (token_block_dataset.py:20-28):
  none          equally sized blocks up to block_size (crosses sentences)
  complete      blocks of whole sentences up to block_size (a sentence
                longer than block_size gets its own oversized block)
  complete_doc  like complete but never crossing document boundaries
                (an empty line == a doc separator of size document_sep_len)
  eos           one sentence per block
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

PAD, EOS, BOS = 1, 2, 0


def get_slice_indices(sizes: np.ndarray, break_mode: Optional[str],
                      block_size: int, document_sep_len: int = 1
                      ) -> np.ndarray:
    """(N, 2) [start, end) token slices over the concatenated corpus
    (_get_slice_indices_fast parity)."""
    sizes = np.asarray(sizes, np.int64)
    mode = break_mode or "none"
    if mode == "none":
        total = int(sizes.sum())
        starts = np.arange(0, total, block_size, dtype=np.int64)
        ends = np.minimum(starts + block_size, total)
        return np.stack([starts, ends], 1)
    if mode == "eos":
        cum = sizes.cumsum()
        out = np.zeros((len(sizes), 2), np.int64)
        out[1:, 0] = cum[:-1]
        out[:, 1] = cum
        return out
    out: List[Tuple[int, int]] = []
    tok, cur, i = 0, 0, 0
    if mode == "complete":
        while i < len(sizes):
            if cur + sizes[i] <= block_size or cur == 0:
                cur += int(sizes[i])
                i += 1
            else:
                out.append((tok, tok + cur))
                tok += cur
                cur = 0
        if cur > 0:
            out.append((tok, tok + cur))
        return np.asarray(out, np.int64).reshape(-1, 2)
    if mode == "complete_doc":
        while i < len(sizes):
            if ((cur + sizes[i] <= block_size or cur == 0)
                    and sizes[i] != document_sep_len):
                cur += int(sizes[i])
                i += 1
            else:
                if cur > 1:   # only keep non-empty documents
                    out.append((tok, tok + cur))
                tok += cur
                cur = 0
                if sizes[i] == document_sep_len:
                    tok += int(sizes[i])
                    i += 1
        if cur > 1:
            out.append((tok, tok + cur))
        return np.asarray(out, np.int64).reshape(-1, 2)
    raise ValueError(f"Invalid break_mode: {break_mode}")


def block_to_dataset_index(sizes: np.ndarray, slice_indices: np.ndarray
                           ) -> np.ndarray:
    """(N, 3) [start_ds_idx, start_offset, end_ds_idx]
    (_get_block_to_dataset_index_fast parity, vectorized: the sequential
    DatasetSearcher is a cumsum + searchsorted)."""
    sizes = np.asarray(sizes, np.int64)
    cum = sizes.cumsum()
    starts = slice_indices[:, 0]
    ends = slice_indices[:, 1]
    # sentence containing token t = first index with cumsum > t
    start_ds = np.searchsorted(cum, starts, side="right")
    end_ds = np.searchsorted(cum, np.maximum(ends - 1, starts), side="right")
    prev_cum = np.concatenate([[0], cum])[start_ds]
    return np.stack([start_ds, starts - prev_cum, end_ds], 1)


class TokenBlockDataset:
    """fairseq/data/token_block_dataset.py parity over indexed text
    datasets. include_targets -> __getitem__ returns (source, item,
    past_target): item is the block, source its right-shift-by-1
    (eos-left-padded), past_target its right-shift-by-2."""

    def __init__(self, dataset, sizes, block_size: int, pad: int = PAD,
                 eos: int = EOS, break_mode: Optional[str] = None,
                 include_targets: bool = False, document_sep_len: int = 1):
        self.dataset = dataset
        self.pad = pad
        self.eos = eos
        self.include_targets = include_targets
        self.slice_indices = get_slice_indices(
            np.asarray(sizes, np.int64), break_mode, block_size,
            document_sep_len)
        self.sizes = self.slice_indices[:, 1] - self.slice_indices[:, 0]
        if (break_mode or "none") == "eos":
            n = len(sizes)
            self.b2d = np.stack([np.arange(n), np.zeros(n, np.int64),
                                 np.arange(n)], 1)
        else:
            self.b2d = block_to_dataset_index(
                np.asarray(sizes, np.int64), self.slice_indices)

    def __len__(self):
        return len(self.slice_indices)

    def __getitem__(self, index: int):
        start_ds, start_off, end_ds = self.b2d[index]
        buffer = np.concatenate([
            np.asarray(self.dataset[i], np.int64)
            for i in range(start_ds, end_ds + 1)])
        length = int(self.sizes[index])
        s, e = int(start_off), int(start_off) + length
        item = buffer[s:e]
        if not self.include_targets:
            return item
        if s == 0:
            source = np.concatenate([[self.eos], buffer[:e - 1]])
            past = np.concatenate([[self.pad, self.eos], buffer[:e - 2]])
        else:
            source = buffer[s - 1:e - 1]
            if s == 1:
                past = np.concatenate([[self.eos], buffer[:e - 2]])
            else:
                past = buffer[s - 2:e - 2]
        return source, item, past


@dataclass
class MonolingualItem:
    id: int
    source: np.ndarray
    target: Optional[np.ndarray]


class MonolingualDataset:
    """fairseq/data/monolingual_dataset.py parity (single-target form;
    targets pick 'self' (= input), 'future' (default LM) or 'past')."""

    def __init__(self, dataset: TokenBlockDataset, sizes, vocab,
                 targets: Sequence[str] = ("future",),
                 add_eos_for_other_targets: bool = False,
                 add_bos_token: bool = False):
        for t in targets:
            if t not in ("self", "future", "past"):
                raise ValueError(f"invalid target {t}")
        if len(targets) != 1:
            raise NotImplementedError(
                "multi-target LM training (adaptive criterion zoo) is out "
                "of scope; pick one of self/future/past")
        self.dataset = dataset
        self.sizes = np.asarray(sizes)
        self.vocab = vocab
        self.target_type = targets[0]
        self.add_eos_for_other_targets = add_eos_for_other_targets
        self.add_bos_token = add_bos_token

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int) -> MonolingualItem:
        source, future, past = self.dataset[index]
        tgt = {"self": source, "future": future, "past": past}[
            self.target_type]
        if self.add_eos_for_other_targets and self.target_type != "future" \
                and tgt[-1] != EOS:
            tgt = np.concatenate([tgt, [EOS]])
            source = np.concatenate([source, [future[-1]]])
        if self.add_bos_token:
            source = np.concatenate([[BOS], source])
            tgt = np.concatenate([[BOS], tgt]) if self.target_type == "self" \
                else np.concatenate([tgt, [PAD]])[:len(source)]
        return MonolingualItem(id=index, source=source.astype(np.int32),
                               target=tgt.astype(np.int32))

    def src_frames(self, i: int) -> int:
        return int(self.sizes[i])

    def snap_kwargs(self, items: List[MonolingualItem]) -> Dict[str, int]:
        from .iterators import snap_len
        return dict(pad_batch=snap_len(len(items), 8),
                    pad_len=snap_len(max(len(it.source) for it in items), 8))

    def collate(self, items: List[MonolingualItem],
                pad_batch: Optional[int] = None,
                pad_len: Optional[int] = None) -> Dict[str, Any]:
        if not items:
            return {}
        b = pad_batch or len(items)
        t = pad_len or max(len(it.source) for it in items)
        src = np.full((b, t), PAD, np.int32)
        tgt = np.full((b, t), PAD, np.int32)
        lens = np.zeros((b,), np.int32)
        for i, it in enumerate(items):
            n = len(it.source)
            src[i, :n] = it.source
            tgt[i, :len(it.target)] = it.target
            lens[i] = n
        return {
            "id": np.asarray([it.id for it in items], np.int64),
            "src_tokens": src,
            "src_lengths": lens,
            "target": tgt,
            "ntokens": int(sum(len(it.source) for it in items)),
            "nsentences": len(items),
        }
