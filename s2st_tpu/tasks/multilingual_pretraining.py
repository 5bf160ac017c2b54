"""Multilingual pretraining tasks: multilingual_denoising (mBART) and
multilingual_masked_lm (XLM-R-style RoBERTa MLM).

Parity:
  * ``fairseq/tasks/multilingual_denoising.py`` — per-language corpora in
    ``<data>/<lang>/<split>``, ``--langs`` (or autodetected subdirs),
    optional ``--add-lang-token`` which adds ``[lang]`` symbols and ends
    every block with the language's token instead of EOS, BART noising
    per language, and temperature-based language resampling on train
    (``--multilang-sampling-alpha``, :210-236).
  * ``fairseq/tasks/multilingual_masked_lm.py`` — the same layout with
    BERT-style masking (RoBERTa MLM) per language and the same
    temperature sampling.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..data.denoising_dataset import DenoisingDataset
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.iterators import EpochBatchIterator
from ..data.mask_tokens_dataset import MaskedTokensDataset
from ..data.token_block_dataset import TokenBlockDataset
from ..registry import register_task
from .denoising import DenoisingTask, _StripEos
from .masked_lm import MaskedLMTask

logger = logging.getLogger(__name__)

PAD, EOS = 1, 2


class _ReplaceEos:
    """End blocks with the [lang] token instead of EOS (mBART
    --add-lang-token: DenoisingDataset(eos=langtok))."""

    def __init__(self, ds, lang_tok: int):
        self.ds = ds
        self.lang_tok = lang_tok
        self.sizes = ds.sizes

    def __len__(self):
        return len(self.ds)

    def src_frames(self, i):
        return self.ds.src_frames(i)

    def snap_kwargs(self, items):
        return self.ds.snap_kwargs(items)

    def collate(self, items, **kw):
        return self.ds.collate(items, **kw)

    def __getitem__(self, i):
        it = self.ds[i]
        src, tgt = it.source.copy(), it.target.copy()
        src[src == EOS] = self.lang_tok
        tgt[tgt == EOS] = self.lang_tok
        it.source, it.target = src, tgt
        return it


class MultiCorpusUpsampled:
    """Concat per-language datasets with integer upsampling ratios
    (the temperature-resampling regime, size_ratio rounded up)."""

    def __init__(self, parts: List[Any], ratios: List[int]):
        self.parts = parts
        self.ratios = ratios
        self.offsets = []
        total = 0
        for p, r in zip(parts, ratios):
            self.offsets.append(total)
            total += len(p) * r
        self.length = total
        self.sizes = np.concatenate(
            [np.tile(np.asarray(p.sizes), r)
             for p, r in zip(parts, ratios)])

    def __len__(self):
        return self.length

    def _map(self, i: int):
        for p, r, off in zip(self.parts, self.ratios, self.offsets):
            n = len(p) * r
            if i < off + n:
                return p, (i - off) % len(p)
        raise IndexError(i)

    def __getitem__(self, i: int):
        p, j = self._map(i)
        it = p[j]
        it.id = i
        return it

    def src_frames(self, i: int) -> int:
        p, j = self._map(i)
        return p.src_frames(j) if hasattr(p, "src_frames") \
            else int(p.sizes[j])

    def snap_kwargs(self, items):
        return self.parts[0].snap_kwargs(items)

    def collate(self, items, **kw):
        return self.parts[0].collate(items, **kw)


def _languages(args, data_path: str) -> List[str]:
    langs = getattr(args, "langs", None)
    if langs:
        out = [lg for lg in str(langs).split(",") if lg]
        for lg in out:
            assert os.path.isdir(os.path.join(data_path, lg)), \
                f"data not found: {os.path.join(data_path, lg)}"
        return out
    return sorted(n for n in os.listdir(data_path)
                  if os.path.isdir(os.path.join(data_path, n)))


def _ratios(args, split: str, lengths: np.ndarray) -> List[int]:
    """Temperature sampling -> integer upsample ratios (train only)."""
    if not split.startswith("train") or len(lengths) < 2:
        return [1] * len(lengths)
    alpha = float(getattr(args, "multilang_sampling_alpha", 1.0))
    prob = lengths / lengths.sum()
    smoothed = prob ** alpha
    smoothed = smoothed / smoothed.sum()
    size_ratio = (smoothed * lengths.sum()) / lengths
    boost = size_ratio / size_ratio.min()
    return list(np.maximum(np.round(boost), 1).astype(int))


@register_task("multilingual_denoising")
class MultilingualDenoisingTask(DenoisingTask):
    @classmethod
    def setup_task(cls, args) -> "MultilingualDenoisingTask":
        data_path = str(args.data).split(os.pathsep)[0]
        dictionary = Dictionary.load(os.path.join(data_path, "dict.txt"))
        if getattr(args, "add_lang_token", False):
            for lg in _languages(args, data_path):
                dictionary.add_symbol(f"[{lg}]")
        logger.info(f"dictionary: {len(dictionary)} types")
        return cls(args, dictionary)

    def _lang_dataset(self, data_path: str, lang: str, split: str):
        ds = load_indexed_dataset(
            os.path.join(data_path, lang, split), self.dictionary,
            getattr(self.args, "dataset_impl", None), combine=True)
        if ds is None:
            raise FileNotFoundError(f"{lang}/{split} not found")
        stripped = _StripEos(ds)
        block = TokenBlockDataset(
            stripped, stripped.sizes,
            block_size=getattr(self.args, "tokens_per_sample", 512) - 2,
            break_mode=getattr(self.args, "sample_break_mode", "complete"),
            include_targets=False)
        a = self.args
        noisy = DenoisingDataset(
            block, block.sizes, len(self.dictionary), self.mask_idx,
            seed=getattr(a, "seed", 1),
            mask_ratio=getattr(a, "mask", 0.0),
            random_ratio=getattr(a, "mask_random", 0.0),
            insert_ratio=getattr(a, "insert", 0.0),
            rotate_ratio=getattr(a, "rotate", 0.5),
            permute_sentence_ratio=getattr(a, "permute_sentences", 0.0),
            mask_length=getattr(a, "mask_length", "subword"),
            poisson_lambda=getattr(a, "poisson_lambda", 3.0),
            replace_length=getattr(a, "replace_length", -1))
        if getattr(a, "add_lang_token", False):
            noisy = _ReplaceEos(noisy,
                                self.dictionary.index(f"[{lang}]"))
        return noisy

    def load_dataset(self, split: str):
        data_path = str(self.args.data).split(os.pathsep)[0]
        langs = _languages(self.args, data_path)
        parts = [self._lang_dataset(data_path, lg, split) for lg in langs]
        lengths = np.asarray([len(p) for p in parts], float)
        ratios = _ratios(self.args, split, lengths)
        for lg, p, r in zip(langs, parts, ratios):
            logger.info(f"  {split} [{lg}]: {len(p)} blocks x{r}")
        ds = MultiCorpusUpsampled(parts, ratios)
        self.datasets[split] = ds
        return ds


@register_task("multilingual_masked_lm")
class MultilingualMaskedLMTask(MaskedLMTask):
    @classmethod
    def setup_task(cls, args) -> "MultilingualMaskedLMTask":
        data_path = str(args.data).split(os.pathsep)[0]
        dictionary = Dictionary.load(os.path.join(data_path, "dict.txt"))
        logger.info(f"dictionary: {len(dictionary)} types")
        return cls(args, dictionary)

    def _lang_dataset(self, data_path: str, lang: str, split: str):
        ds = load_indexed_dataset(
            os.path.join(data_path, lang, split), self.dictionary,
            getattr(self.args, "dataset_impl", None), combine=True)
        if ds is None:
            raise FileNotFoundError(f"{lang}/{split} not found")
        block = TokenBlockDataset(
            ds, ds.sizes,
            block_size=getattr(self.args, "tokens_per_sample", 512) - 1,
            break_mode=getattr(self.args, "sample_break_mode", "complete"),
            include_targets=False)
        mp = getattr(self.args, "mask_prob", 0.15)
        if mp == 0.65:
            mp = 0.15
        return MaskedTokensDataset(
            block, block.sizes, len(self.dictionary), self.mask_idx,
            seed=getattr(self.args, "seed", 1), mask_prob=mp,
            leave_unmasked_prob=getattr(self.args, "leave_unmasked_prob",
                                        0.1),
            random_token_prob=getattr(self.args, "random_token_prob", 0.1))

    def load_dataset(self, split: str):
        data_path = str(self.args.data).split(os.pathsep)[0]
        langs = _languages(self.args, data_path)
        parts = [self._lang_dataset(data_path, lg, split) for lg in langs]
        lengths = np.asarray([len(p) for p in parts], float)
        ratios = _ratios(self.args, split, lengths)
        for lg, p, r in zip(langs, parts, ratios):
            logger.info(f"  {split} [{lg}]: {len(p)} blocks x{r}")
        ds = MultiCorpusUpsampled(parts, ratios)
        self.datasets[split] = ds
        return ds
