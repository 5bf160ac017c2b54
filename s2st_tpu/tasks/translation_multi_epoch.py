"""Multilingual translation over a shared model
(parity: ``fairseq/tasks/translation_multi_simple_epoch.py`` +
``fairseq/data/multilingual/multilingual_data_manager.py`` essentials).

One shared transformer trains on the union of ``--lang-pairs`` corpora;
language identity enters through ``__lang__`` tokens: ``--encoder-langtok
src|tgt`` prepends the source/target language token to the source,
``--decoder-langtok`` prepends the target language token to the
target/prev stream (multilingual/utils get_lang_tok semantics).
``--sampling-temperature T`` rebalances pair sampling q_i ∝ p_i^(1/T)
(SampledMultiDataset); here the rebalancing is materialized as integer
upsampling ratios over a concatenated index space — the same expected
token mix without the reference's per-epoch virtual-index resampling.

Generation loads only the ``--source-lang/--target-lang`` pair.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ..data.dictionary import Dictionary
from ..data.iterators import EpochBatchIterator
from ..data.language_pair_dataset import LanguagePairDataset, \
    LanguagePairItem
from ..registry import register_task
from .translation import TranslationTask

logger = logging.getLogger(__name__)


def lang_token(lang: str) -> str:
    return f"__{lang}__"


class LangTokDataset:
    """Wrap a LanguagePairDataset, prepending language tokens to the
    source (encoder langtok) and/or target (decoder langtok) streams."""

    def __init__(self, base: LanguagePairDataset,
                 src_tok: Optional[int], tgt_tok: Optional[int]):
        self.base = base
        self.src_tok = src_tok
        self.tgt_tok = tgt_tok
        self.src_sizes = base.src_sizes + (1 if src_tok is not None else 0)
        self.tgt_sizes = None if base.tgt_sizes is None else \
            base.tgt_sizes + (1 if tgt_tok is not None else 0)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int) -> LanguagePairItem:
        it = self.base[i]
        src, tgt = it.source, it.target
        if self.src_tok is not None:
            src = np.concatenate([[self.src_tok], src]).astype(np.int32)
        if self.tgt_tok is not None and tgt is not None:
            tgt = np.concatenate([[self.tgt_tok], tgt]).astype(np.int32)
        return LanguagePairItem(id=it.id, source=src, target=tgt)

    # EpochBatchIterator surface (multilingual_translation consumes this
    # dataset directly, without the MultiPairDataset wrapper)
    def src_frames(self, i: int) -> int:
        return int(self.src_sizes[i])

    def collate(self, items, **kw):
        return self.base.collate(items, **kw)

    def snap_kwargs(self, items):
        return self.base.snap_kwargs(items)


class MultiPairDataset:
    """Concatenation of per-pair datasets with integer upsampling ratios;
    batches may mix pairs (one shared model — SampledMultiDataset mixes
    too). Exposes the LanguagePairDataset iterator interface."""

    def __init__(self, parts: List[LangTokDataset], ratios: List[int],
                 left_pad_source: bool, left_pad_target: bool):
        self.parts = parts
        self.left_pad_source = left_pad_source
        self.left_pad_target = left_pad_target
        index = []
        for pi, (part, r) in enumerate(zip(parts, ratios)):
            for _ in range(r):
                index.append(np.stack(
                    [np.full(len(part), pi), np.arange(len(part))], 1))
        self._index = np.concatenate(index)

    def __len__(self):
        return len(self._index)

    def __getitem__(self, i: int) -> LanguagePairItem:
        pi, li = self._index[i]
        it = self.parts[pi][li]
        return LanguagePairItem(id=i, source=it.source, target=it.target)

    def src_frames(self, i: int) -> int:
        pi, li = self._index[i]
        part = self.parts[pi]
        n = int(part.src_sizes[li])
        if part.tgt_sizes is not None:
            n = max(n, int(part.tgt_sizes[li]))
        return n

    def snap_kwargs(self, items):
        proto = LanguagePairDataset([], [], None,
                                    left_pad_source=self.left_pad_source,
                                    left_pad_target=self.left_pad_target)
        return proto.snap_kwargs(items)

    def collate(self, items, **kw):
        proto = LanguagePairDataset([], [], None,
                                    left_pad_source=self.left_pad_source,
                                    left_pad_target=self.left_pad_target)
        return proto.collate(items, **kw)


@register_task("translation_multi_simple_epoch")
class TranslationMultiSimpleEpochTask(TranslationTask):
    @classmethod
    def setup_task(cls, args):
        pairs = [p for p in str(getattr(args, "lang_pairs", "") or "")
                 .split(",") if p]
        if not pairs:
            raise ValueError("--lang-pairs is required for "
                             "translation_multi_simple_epoch")
        args.lang_pairs = pairs
        langs = sorted({x for p in pairs for x in p.split("-")})
        paths = str(args.data).split(os.pathsep)

        def load_dict(lang):
            shared = os.path.join(paths[0], "dict.txt")
            per = os.path.join(paths[0], f"dict.{lang}.txt")
            d = Dictionary.load(per if os.path.isfile(per) else shared)
            for lg in langs:
                d.add_symbol(lang_token(lg))
            return d

        # shared-dictionary regime (the common multilingual recipe); the
        # lang tokens are appended to every dictionary identically
        src_dict = load_dict(langs[0])
        tgt_dict = load_dict(langs[0])
        if args.source_lang is None:
            args.source_lang, args.target_lang = pairs[0].split("-")
        logger.info(f"lang pairs: {pairs}; dictionary: {len(src_dict)} "
                    f"types (incl. {len(langs)} lang tokens)")
        task = cls(args, src_dict, tgt_dict)
        task.langs = langs
        return task

    def _load_pair(self, split: str, src: str, tgt: str):
        saved = (self.args.source_lang, self.args.target_lang)
        self.args.source_lang, self.args.target_lang = src, tgt
        try:
            base = TranslationTask.load_dataset(self, split)
        finally:
            self.args.source_lang, self.args.target_lang = saved
        enc_mode = getattr(self.args, "encoder_langtok", None)
        src_tok = None
        if enc_mode == "src":
            src_tok = self.src_dict.index(lang_token(src))
        elif enc_mode == "tgt":
            src_tok = self.src_dict.index(lang_token(tgt))
        tgt_tok = self.tgt_dict.index(lang_token(tgt)) \
            if getattr(self.args, "decoder_langtok", False) else None
        return LangTokDataset(base, src_tok, tgt_tok)

    def load_dataset(self, split: str):
        is_gen = split == getattr(self.args, "gen_subset", "test")
        if is_gen and self.args.source_lang and self.args.target_lang:
            pairs = [f"{self.args.source_lang}-{self.args.target_lang}"]
        else:
            pairs = self.args.lang_pairs
        parts = [self._load_pair(split, *p.split("-")) for p in pairs]
        sizes = np.asarray([len(p) for p in parts], np.float64)
        temp = float(getattr(self.args, "sampling_temperature", 1.0))
        p_i = sizes / sizes.sum()
        q_i = p_i ** (1.0 / temp)
        q_i = q_i / q_i.sum()
        boost = q_i / p_i
        ratios = np.maximum(np.round(boost / boost.min()), 1).astype(int) \
            if split.startswith("train") else np.ones(len(parts), int)
        for p, pr, r in zip(pairs, parts, ratios):
            logger.info(f"  {split} {p}: {len(pr)} examples x{r}")
        ds = MultiPairDataset(
            parts, list(ratios),
            left_pad_source=getattr(self.args, "left_pad_source", True),
            left_pad_target=getattr(self.args, "left_pad_target", False))
        self.datasets[split] = ds
        return ds
