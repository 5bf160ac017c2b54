"""BART denoising dataset (text infilling + sentence permutation + ...).

Parity: ``fairseq/data/denoising_dataset.py`` — per-item (seed, epoch,
index)-seeded noising of [bos ... eos] blocks:
  * permute_sentences: full-stop-delimited sentence shuffling (:219-240),
  * add_whole_word_mask: span-poisson (truncated-Poisson categorical,
    :157-172) or per-subword masking with the mask/random split and
    replace_length -1/0/1 semantics (:250-355),
  * add_insertion_noise (:372-393), add_rolling_noise (:365-370).
Targets are the clean blocks; the collate is the LanguagePairDataset's
(right-padded, eos-moved prev tokens).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np

from .language_pair_dataset import LanguagePairDataset, LanguagePairItem

PAD, BOS, EOS = 1, 0, 2


def poisson_span_pmf(lam: float, max_k: int = 128) -> np.ndarray:
    ps = []
    p = math.exp(-lam)
    lam_k = 1.0
    k_fact = 1.0
    for k in range(max_k):
        ps.append(math.exp(-lam) * lam_k / k_fact)
        lam_k *= lam
        k_fact *= k + 1
        if ps[-1] < 1e-7:
            break
    ps = np.asarray(ps)
    return ps / ps.sum()


class DenoisingDataset:
    supports_item_rng = True

    def __init__(self, block_dataset, sizes, vocab_size: int,
                 mask_idx: int, seed: int = 1, mask_ratio: float = 0.0,
                 random_ratio: float = 0.0, insert_ratio: float = 0.0,
                 rotate_ratio: float = 0.0,
                 permute_sentence_ratio: float = 0.0,
                 mask_length: str = "subword", poisson_lambda: float = 3.0,
                 replace_length: int = -1, full_stop_index: int = EOS):
        self.dataset = block_dataset
        self.sizes = np.asarray(sizes) + 2          # + bos/eos wrap
        self.vocab_size = vocab_size
        self.mask_idx = mask_idx
        self.seed = seed
        self.mask_ratio = mask_ratio
        self.random_ratio = random_ratio
        self.insert_ratio = insert_ratio
        self.rotate_ratio = rotate_ratio
        self.permute_sentence_ratio = permute_sentence_ratio
        self.replace_length = replace_length
        self.full_stop_index = full_stop_index
        self.span_pmf = poisson_span_pmf(poisson_lambda) \
            if mask_length == "span-poisson" else None

    def __len__(self):
        return len(self.dataset)

    def src_frames(self, i: int) -> int:
        return int(self.sizes[i])

    # -- noising ops --------------------------------------------------------
    def _permute_sentences(self, src, p, rng):
        full_stops = src == self.full_stop_index
        full_stops[-2] = True
        sentence_ends = np.nonzero(full_stops[1:] & ~full_stops[:-1])[0] + 2
        result = src.copy()
        n = len(sentence_ends)
        num_to_permute = math.ceil((n * 2 * p) / 2.0)
        subs = rng.permutation(n)[:num_to_permute]
        ordering = np.arange(n)
        ordering[subs] = subs[rng.permutation(num_to_permute)]
        index = 1
        for i in ordering:
            start = sentence_ends[i - 1] if i > 0 else 1
            sent = src[start:sentence_ends[i]]
            result[index:index + len(sent)] = sent
            index += len(sent)
        return result

    def _insertion_noise(self, toks, p, rng):
        if p == 0.0:
            return toks
        num = len(toks)
        n = int(math.ceil(num * p))
        noise_idx = rng.permutation(num + n - 2)[:n] + 1
        noise_mask = np.zeros(num + n, bool)
        noise_mask[noise_idx] = True
        result = np.full(num + n, -1, np.int64)
        num_random = int(math.ceil(n * self.random_ratio))
        result[noise_idx[num_random:]] = self.mask_idx
        result[noise_idx[:num_random]] = rng.randint(
            1, self.vocab_size, size=num_random)
        result[~noise_mask] = toks
        return result

    def _whole_word_mask(self, src, p, rng):
        src = src.copy()
        is_word_start = np.ones(len(src))
        is_word_start[0] = 0
        is_word_start[-1] = 0
        num_to_mask = int(math.ceil(is_word_start.sum() * p))
        num_inserts = 0
        if num_to_mask == 0:
            return src
        if self.span_pmf is not None:
            lengths = rng.choice(len(self.span_pmf), size=num_to_mask,
                                 p=self.span_pmf)
            while lengths.cumsum()[-1] < num_to_mask:
                lengths = np.concatenate(
                    [lengths, rng.choice(len(self.span_pmf),
                                         size=num_to_mask,
                                         p=self.span_pmf)])
            cum = lengths.cumsum()
            i = int(np.searchsorted(cum, num_to_mask))
            lengths[i] = num_to_mask - (0 if i == 0 else cum[i - 1])
            lengths = lengths[:i + 1]
            num_to_mask = i + 1
            lengths = lengths[lengths > 0]
            num_inserts = num_to_mask - len(lengths)
            num_to_mask -= num_inserts
            if num_to_mask == 0:
                return self._insertion_noise(src, num_inserts / len(src),
                                             rng)
        else:
            lengths = np.ones(num_to_mask, np.int64)
        word_starts = np.nonzero(is_word_start)[0]
        indices = word_starts[rng.permutation(len(word_starts))
                              [:num_to_mask]]
        mask_random = rng.rand(num_to_mask) < self.random_ratio
        to_keep = np.ones(len(src), bool)
        is_word_start[-1] = 255
        if self.replace_length == 0:
            to_keep[indices] = False
        else:
            src[indices] = self.mask_idx
            src[indices[mask_random]] = rng.randint(
                1, self.vocab_size, size=int(mask_random.sum()))
        lengths = lengths.astype(np.int64) - 1
        while len(indices) > 0:
            lengths = lengths - is_word_start[
                np.minimum(indices + 1, len(src) - 1)].astype(np.int64)
            uncompleted = lengths >= 0
            indices = indices[uncompleted] + 1
            mask_random = mask_random[uncompleted]
            lengths = lengths[uncompleted]
            if len(indices) == 0:
                break
            if self.replace_length != -1:
                to_keep[indices] = False
            else:
                src[indices] = self.mask_idx
                src[indices[mask_random]] = rng.randint(
                    1, self.vocab_size, size=int(mask_random.sum()))
        src = src[to_keep]
        if num_inserts > 0:
            src = self._insertion_noise(src, num_inserts / len(src), rng)
        return src

    def _rolling_noise(self, toks, rng):
        offset = rng.randint(1, max(1, len(toks) - 1) + 1)
        return np.concatenate([toks[0:1], toks[offset:-1],
                               toks[1:offset], toks[-1:]])

    # -----------------------------------------------------------------------
    def __getitem__(self, index: int,
                    rng: Optional[np.random.RandomState] = None
                    ) -> LanguagePairItem:
        rng = rng or np.random.RandomState(
            (self.seed * 1_000_003 + index) % (2 ** 32))
        block = np.asarray(self.dataset[index], np.int64)
        tokens = np.concatenate([[BOS], block, [EOS]])
        source, target = tokens.copy(), tokens
        if self.permute_sentence_ratio > 0.0:
            source = self._permute_sentences(
                source, self.permute_sentence_ratio, rng)
        if self.mask_ratio > 0:
            source = self._whole_word_mask(source, self.mask_ratio, rng)
        if self.insert_ratio > 0:
            source = self._insertion_noise(source, self.insert_ratio, rng)
        if self.rotate_ratio > 0.0 and rng.rand() < self.rotate_ratio:
            source = self._rolling_noise(source, rng)
        assert source[0] == BOS and source[-1] == EOS
        return LanguagePairItem(id=index, source=source.astype(np.int32),
                                target=target.astype(np.int32))

    # collate: the language-pair contract (right pad, eos-moved prev)
    def snap_kwargs(self, items: List[LanguagePairItem]) -> Dict[str, int]:
        proto = LanguagePairDataset([], [], None, left_pad_source=False)
        return proto.snap_kwargs(items)

    def collate(self, items: List[LanguagePairItem], **kw):
        proto = LanguagePairDataset([], [], None, left_pad_source=False)
        return proto.collate(items, **kw)
