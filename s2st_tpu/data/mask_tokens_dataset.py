"""Masked-LM data pipeline (BERT-style 80/10/10 masking).

Parity: ``fairseq/data/mask_tokens_dataset.py`` — per-item deterministic
rng seeded by (seed, epoch, index); num_mask = int(mask_prob*sz + rand())
probabilistic rounding; rand-or-unmask split by
leave_unmasked_prob/random_token_prob; random replacements drawn uniformly
over the non-special vocabulary — and ``fairseq/tasks/masked_lm.py``'s
dataset chain: TokenBlockDataset(tokens_per_sample - 1) -> prepend <s> ->
apply_mask -> right-padded (src, target) pair where target is PAD except
at the masked positions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

PAD, BOS = 1, 0


@dataclass
class MaskedLMItem:
    id: int
    source: np.ndarray
    target: np.ndarray


class MaskedTokensDataset:
    supports_item_rng = True

    def __init__(self, block_dataset, sizes, vocab_size: int,
                 mask_idx: int, nspecial: int = 4, seed: int = 1,
                 mask_prob: float = 0.15, leave_unmasked_prob: float = 0.1,
                 random_token_prob: float = 0.1):
        self.dataset = block_dataset
        self.sizes = np.asarray(sizes) + 1          # + prepended <s>
        self.vocab_size = vocab_size
        self.mask_idx = mask_idx
        self.seed = seed
        self.mask_prob = mask_prob
        self.leave_unmasked_prob = leave_unmasked_prob
        self.random_token_prob = random_token_prob
        w = np.ones(vocab_size)
        w[:nspecial] = 0
        self.weights = w / w.sum()

    def __len__(self):
        return len(self.dataset)

    def src_frames(self, i: int) -> int:
        return int(self.sizes[i])

    def __getitem__(self, index: int,
                    rng: Optional[np.random.RandomState] = None
                    ) -> MaskedLMItem:
        rng = rng or np.random.RandomState(
            (self.seed * 1_000_003 + index) % (2 ** 32))
        item = np.concatenate(
            [[BOS], np.asarray(self.dataset[index], np.int64)])
        sz = len(item)
        mask = np.zeros(sz, bool)
        num_mask = int(self.mask_prob * sz + rng.rand())
        mask[rng.choice(sz, num_mask, replace=False)] = True

        # target: PAD everywhere except the chosen positions
        target = np.full(sz, PAD, np.int64)
        target[mask] = item[mask]

        rand_or_unmask_prob = self.random_token_prob \
            + self.leave_unmasked_prob
        rand_mask = unmask = None
        if rand_or_unmask_prob > 0.0:
            rand_or_unmask = mask & (rng.rand(sz) < rand_or_unmask_prob)
            unmask_prob = self.leave_unmasked_prob / rand_or_unmask_prob
            decision = rng.rand(sz) < unmask_prob
            unmask = rand_or_unmask & decision
            rand_mask = rand_or_unmask & ~decision
        if unmask is not None:
            mask = mask ^ unmask
        new_item = item.copy()
        new_item[mask] = self.mask_idx
        if rand_mask is not None and rand_mask.sum() > 0:
            new_item[rand_mask] = rng.choice(
                self.vocab_size, int(rand_mask.sum()), p=self.weights)
        return MaskedLMItem(id=index, source=new_item.astype(np.int32),
                            target=target.astype(np.int32))

    def snap_kwargs(self, items: List[MaskedLMItem]) -> Dict[str, int]:
        from .iterators import snap_len
        return dict(pad_batch=snap_len(len(items), 8),
                    pad_len=snap_len(max(len(it.source) for it in items),
                                     8))

    def collate(self, items: List[MaskedLMItem],
                pad_batch: Optional[int] = None,
                pad_len: Optional[int] = None) -> Dict[str, Any]:
        b = pad_batch or len(items)
        t = pad_len or max(len(it.source) for it in items)
        src = np.full((b, t), PAD, np.int32)
        tgt = np.full((b, t), PAD, np.int32)
        lens = np.zeros((b,), np.int32)
        for i, it in enumerate(items):
            n = len(it.source)
            src[i, :n] = it.source
            tgt[i, :n] = it.target
            lens[i] = n
        return {"id": np.asarray([it.id for it in items], np.int64),
                "src_tokens": src, "src_lengths": lens, "target": tgt,
                "ntokens": int(lens.sum()), "nsentences": len(items)}
