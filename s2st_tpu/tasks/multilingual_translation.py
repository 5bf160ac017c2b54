"""multilingual_translation task: per-language-pair models trained
round-robin.

Parity: ``fairseq/tasks/multilingual_translation.py`` — per-LANGUAGE
dictionaries (``dict.<lang>.txt``), one LanguagePairDataset per pair
(``<split>.<src>-<tgt>.<lang>`` binarized files), RoundRobinZipDatasets
batching (every update carries one sub-batch per pair; shorter pairs wrap
around, :180-220), optional ``--encoder-langtok {src,tgt}`` /
``--decoder-langtok`` source/target language tokens (:105-130), and the
``multilingual_transformer`` model family with its sharing flags.

TPU note: each pair's sub-batches snap to the shared static-shape menu, so
the jitted multi-pair train step compiles once per shape menu entry, not
per pair combination.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import numpy as np

from ..data.dictionary import Dictionary
from ..data.iterators import EpochBatchIterator
from ..registry import register_task
from .translation import TranslationTask
from .translation_multi_epoch import LangTokDataset, lang_token

logger = logging.getLogger(__name__)


class RoundRobinIterator:
    """RoundRobinZipDatasets over per-pair EpochBatchIterators: one epoch =
    the LONGEST pair's epoch; shorter pairs cycle. Yields
    {"pairs": {pair: batch}, "ntokens", "nsentences"}."""

    def __init__(self, itrs: Dict[str, EpochBatchIterator]):
        self.itrs = itrs
        self.epoch = max(it.epoch for it in itrs.values())
        self.iterations_in_epoch = 0

    def __len__(self):
        return max(len(it) for it in self.itrs.values())

    @property
    def n(self):
        return self.iterations_in_epoch

    def end_of_epoch(self) -> bool:
        return self.iterations_in_epoch >= len(self)

    def next_epoch_itr(self, shuffle: bool = True, offset: int = 0):
        self.epoch += 1
        self.iterations_in_epoch = 0
        gens = {p: iter(it.next_epoch_itr(shuffle=shuffle))
                for p, it in self.itrs.items()}

        def cycle(pair):
            while True:
                try:
                    yield next(gens[pair])
                except StopIteration:
                    gens[pair] = iter(
                        self.itrs[pair].next_epoch_itr(shuffle=shuffle))
                    yield next(gens[pair])

        cyclers = {p: cycle(p) for p in self.itrs}
        n = len(self)

        def gen():
            drop = {"id", "target_texts"}
            for _ in range(n):
                pairs = {}
                ntok = nsent = 0
                for p in self.itrs:
                    sub = dict(next(cyclers[p]))
                    ntok += int(sub.pop("ntokens", 0))
                    nsent += int(sub.pop("nsentences", 0))
                    for k in drop:
                        sub.pop(k, None)
                    pairs[p] = sub
                self.iterations_in_epoch += 1
                yield {"pairs": pairs, "ntokens": ntok,
                       "nsentences": nsent}

        return gen()

    def state_dict(self):
        return {"epoch": self.epoch,
                "iterations_in_epoch": 0,
                "sub": {p: it.state_dict() for p, it in self.itrs.items()}}

    def load_state_dict(self, state):
        self.epoch = int(state.get("epoch", 1))
        for p, sd in state.get("sub", {}).items():
            if p in self.itrs:
                self.itrs[p].load_state_dict(sd)


@register_task("multilingual_translation")
class MultilingualTranslationTask:
    """Legacy per-pair-model multilingual MT (see module docstring)."""

    def __init__(self, args, dicts: Dict[str, Dictionary]):
        self.args = args
        self.dicts = dicts
        self.langs = sorted(dicts)
        self.datasets: Dict[str, Dict[str, Any]] = {}

    @classmethod
    def setup_task(cls, args) -> "MultilingualTranslationTask":
        pairs = [p for p in str(getattr(args, "lang_pairs", "") or "")
                 .split(",") if p]
        if not pairs:
            raise ValueError("--lang-pairs is required for "
                             "multilingual_translation")
        args.lang_pairs = pairs
        langs = sorted({x for p in pairs for x in p.split("-")})
        path = str(args.data).split(os.pathsep)[0]
        dicts = {}
        for lang in langs:
            d = Dictionary.load(os.path.join(path, f"dict.{lang}.txt"))
            if getattr(args, "encoder_langtok", None) is not None \
                    or getattr(args, "decoder_langtok", False):
                for lg in langs:
                    d.add_symbol(lang_token(lg))
            dicts[lang] = d
            logger.info(f"[{lang}] dictionary: {len(d)} types")
        if args.source_lang is None:
            args.source_lang, args.target_lang = pairs[0].split("-")
        return cls(args, dicts)

    # ------------------------------------------------------------------
    @property
    def source_dictionary(self):
        return self.dicts[self.args.source_lang]

    @property
    def target_dictionary(self):
        return self.dicts[self.args.target_lang]

    def _load_pair(self, split: str, src: str, tgt: str):
        sub = TranslationTask(self.args, self.dicts[src], self.dicts[tgt])
        saved = (self.args.source_lang, self.args.target_lang)
        self.args.source_lang, self.args.target_lang = src, tgt
        try:
            base = sub.load_dataset(split)
        finally:
            self.args.source_lang, self.args.target_lang = saved
        enc_mode = getattr(self.args, "encoder_langtok", None)
        src_tok = None
        if enc_mode == "src":
            src_tok = self.dicts[src].index(lang_token(src))
        elif enc_mode == "tgt":
            src_tok = self.dicts[src].index(lang_token(tgt))
        tgt_tok = self.dicts[tgt].index(lang_token(tgt)) \
            if getattr(self.args, "decoder_langtok", False) else None
        return LangTokDataset(base, src_tok, tgt_tok)

    def load_dataset(self, split: str):
        per_pair = {p: self._load_pair(split, *p.split("-"))
                    for p in self.args.lang_pairs}
        self.datasets[split] = per_pair
        return per_pair

    def get_batch_iterator(self, split: str, max_tokens: int,
                           max_sentences: Optional[int] = None,
                           seed: int = 1, num_shards: int = 1,
                           shard_id: int = 0, shuffle: bool = True,
                           data_rank: int = 0, data_world: int = 1
                           ) -> RoundRobinIterator:
        if split not in self.datasets:
            self.load_dataset(split)
        itrs = {
            pair: EpochBatchIterator(
                ds, max_tokens=max_tokens, max_sentences=max_sentences,
                seed=seed + i, num_shards=num_shards, shard_id=shard_id,
                shuffle=shuffle,
                required_batch_size_multiple=getattr(
                    self.args, "required_batch_size_multiple", 1),
                data_rank=data_rank, data_world=data_world,
                num_batch_buckets=getattr(self.args, "num_batch_buckets", 0))
            for i, (pair, ds) in enumerate(self.datasets[split].items())}
        return RoundRobinIterator(itrs)

    # ------------------------------------------------------------------
    def build_model_config(self):
        from ..options import build_transformer_text_config
        a = self.args
        base = build_transformer_text_config(a, 1, 1)
        from ..models.multilingual_transformer import MultilingualConfig
        return MultilingualConfig(
            lang_pairs=tuple(a.lang_pairs),
            vocab_sizes=tuple((lg, len(d)) for lg, d in self.dicts.items()),
            base=base,
            share_encoder_embeddings=getattr(
                a, "share_encoder_embeddings", False),
            share_decoder_embeddings=getattr(
                a, "share_decoder_embeddings", False),
            share_encoders=getattr(a, "share_encoders", False),
            share_decoders=getattr(a, "share_decoders", False))

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools
        from ..models import multilingual_transformer as mt
        from ..train import losses as L
        cfg = self.build_model_config()
        return cfg, functools.partial(mt.init_multilingual, cfg=cfg), \
            L.multilingual_loss
