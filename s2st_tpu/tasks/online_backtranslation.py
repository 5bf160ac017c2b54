"""online_backtranslation: single-model unsupervised MT (mBART-style
round-trip training).

Parity: ``fairseq/tasks/online_backtranslation.py`` — ONE shared model
over a common dictionary extended with ``__lang__`` tokens (:631-657);
per-monolingual-language train streams ``{lang}-BT`` (source =
``__lang__`` + mono, back-translated ON THE FLY to the other language
with bos = ``__other__`` and re-sourced as ``__other__`` + hypothesis,
:432-478) and ``{lang}-DENOISE`` (word-noised ``__lang__`` + mono
reconstructing the clean text); decoder input starts with the TARGET
language token (TransformEosLangPairDataset new_tgt_bos, :259-269);
piecewise-linear ``--lambda-bt`` / ``--lambda-dae`` weights; validation
on the ``--valid-lang-pairs`` translation data.

TPU design: like semisupervised_translation, the BT round trip runs
inside the jitted train step (beam K=1, max len 1.3x+5, min len 5 —
the reference's generator settings) under stop_gradient.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.language_pair_dataset import LanguagePairDataset, \
    LanguagePairItem
from ..registry import register_task
from .multilingual_translation import RoundRobinIterator
from .semisupervised_translation import NoisingDataset, parse_lambda_config, \
    lambda_value

logger = logging.getLogger(__name__)

PAD, EOS = 1, 2


def lang_token(lang: str) -> str:
    return f"__{lang}__"


class _PrefixedPair:
    """(src = __lang__ + row[, noised], tgt = clean row); collate sets
    prev_output_tokens[:, 0] to the language token (the reference's
    TransformEosLangPairDataset new_tgt_bos)."""

    def __init__(self, src_rows, tgt_rows, sizes, lang_tok: int,
                 left_pad_source=True, left_pad_target=False):
        self.src_rows = src_rows
        self.tgt_rows = tgt_rows
        self.sizes = np.asarray(sizes)
        self.lang_tok = lang_tok
        self.src_sizes = self.sizes + 1
        self.tgt_sizes = self.sizes
        self._ds = LanguagePairDataset(
            [], [], None, left_pad_source=left_pad_source,
            left_pad_target=left_pad_target)

    def __len__(self):
        return len(self.src_rows)

    def __getitem__(self, i: int) -> LanguagePairItem:
        src = np.concatenate(
            [[self.lang_tok], np.asarray(self.src_rows[i], np.int64)])
        tgt = np.asarray(self.tgt_rows[i], np.int64)
        return LanguagePairItem(id=i, source=src.astype(np.int32),
                                target=tgt.astype(np.int32))

    def src_frames(self, i: int) -> int:
        return int(self.src_sizes[i])

    def snap_kwargs(self, items):
        return self._ds.snap_kwargs(items)

    def collate(self, items, **kw):
        batch = self._ds.collate(items, **kw)
        if "prev_output_tokens" in batch:
            prev = batch["prev_output_tokens"]
            real = prev[:, 0] != PAD
            prev[:, 0] = np.where(real, self.lang_tok, prev[:, 0])
        return batch


@register_task("online_backtranslation")
class OnlineBackTranslationTask:
    def __init__(self, args, common_dict: Dictionary,
                 mono_langs: List[str], valid_lang_pairs: List[str]):
        self.args = args
        self.common_dict = common_dict
        self.mono_langs = mono_langs
        self.valid_lang_pairs = valid_lang_pairs
        self.lambda_bt = parse_lambda_config(
            getattr(args, "lambda_bt", "1.0"))
        self.lambda_dae = parse_lambda_config(
            getattr(args, "lambda_dae", "1.0"))
        self.datasets: Dict[str, Any] = {}
        self._update_proxy = 0

    @classmethod
    def setup_task(cls, args) -> "OnlineBackTranslationTask":
        data_path = str(args.data).split(os.pathsep)[0]
        mono_langs = [lg for lg in str(getattr(args, "mono_langs", "")
                                       or "").split(",") if lg]
        assert mono_langs, "--mono-langs is required"
        valid_pairs = [p for p in str(getattr(args, "valid_lang_pairs", "")
                                      or "").split(",") if p]
        for cand in (os.path.join(data_path, "dict.txt"),
                     os.path.join(data_path, mono_langs[0], "dict.txt")):
            if os.path.isfile(cand):
                d = Dictionary.load(cand)
                break
        else:
            raise FileNotFoundError(f"dict.txt not found under {data_path}")
        # add_secial_tokens_to_dict_and_model (:631-657)
        for lg in mono_langs:
            d.add_symbol(lang_token(lg))
        logger.info(f"dictionary: {len(d)} types "
                    f"(+{len(mono_langs)} lang tokens)")
        if args.source_lang is None and valid_pairs:
            args.source_lang, args.target_lang = valid_pairs[0].split("-")
        return cls(args, d, mono_langs, valid_pairs)

    @property
    def source_dictionary(self):
        return self.common_dict

    target_dictionary = source_dictionary

    def other_lang(self, lang: str) -> str:
        """:493-499 (first-listed other language; the >2-lang random pick
        collapses to the deterministic first choice here)."""
        if lang != self.mono_langs[0]:
            return self.mono_langs[0]
        return self.mono_langs[1]

    def _mono(self, lang: str):
        data_path = str(self.args.data).split(os.pathsep)[0]
        ds = load_indexed_dataset(
            os.path.join(data_path, lang, "train"), self.common_dict,
            getattr(self.args, "dataset_impl", None))
        if ds is None:
            raise FileNotFoundError(f"{lang}/train not found")
        return ds

    def load_dataset(self, split: str):
        lp_s = getattr(self.args, "left_pad_source", True)
        lp_t = getattr(self.args, "left_pad_target", False)
        if split.startswith("train"):
            parts = {}
            a = self.args
            for lang in self.mono_langs:
                mono = self._mono(lang)
                tok = self.common_dict.index(lang_token(lang))
                parts[f"{lang}-BT"] = _PrefixedPair(
                    mono, mono, mono.sizes, tok, lp_s, lp_t)
                noisy = NoisingDataset(
                    mono, mono.sizes, seed=getattr(a, "seed", 1),
                    max_shuffle=getattr(a, "max_word_shuffle_distance",
                                        3.0),
                    dropout=getattr(a, "word_dropout_prob", 0.1),
                    blank=getattr(a, "word_blanking_prob", 0.2))

                class _NoisySrc:
                    def __init__(self, nd):
                        self.nd = nd

                    def __len__(self):
                        return len(self.nd)

                    def __getitem__(self, i):
                        return self.nd[i].source

                parts[f"{lang}-DENOISE"] = _PrefixedPair(
                    _NoisySrc(noisy), mono, mono.sizes, tok, lp_s, lp_t)
            self.datasets[split] = parts
            return parts
        # valid/test: the translation pair (src prefixed __src__, prev
        # bos __tgt__)
        assert self.valid_lang_pairs, "--valid-lang-pairs required"
        src, tgt = self.valid_lang_pairs[0].split("-")
        from .translation import TranslationTask
        sub = TranslationTask(self.args, self.common_dict,
                              self.common_dict)
        saved = (self.args.source_lang, self.args.target_lang)
        self.args.source_lang, self.args.target_lang = src, tgt
        try:
            base = sub.load_dataset(split)
        finally:
            self.args.source_lang, self.args.target_lang = saved

        src_tok = self.common_dict.index(lang_token(src))
        tgt_tok = self.common_dict.index(lang_token(tgt))

        class _ValidPair(_PrefixedPair):
            def __init__(self, inner):
                self.inner = inner
                self.sizes = np.asarray(inner.src_sizes)
                self.lang_tok = tgt_tok
                self.src_sizes = self.sizes + 1
                self.tgt_sizes = inner.tgt_sizes
                self._ds = LanguagePairDataset(
                    [], [], None, left_pad_source=lp_s,
                    left_pad_target=lp_t)

            def __len__(self):
                return len(self.inner)

            def __getitem__(self, i):
                it = self.inner[i]
                src_row = np.concatenate([[src_tok], it.source])
                return LanguagePairItem(id=it.id,
                                        source=src_row.astype(np.int32),
                                        target=it.target)

        ds = {f"{src}-{tgt}": _ValidPair(base)}
        self.datasets[split] = ds
        return ds

    def get_batch_iterator(self, split: str, max_tokens: int,
                           max_sentences: Optional[int] = None,
                           seed: int = 1, num_shards: int = 1,
                           shard_id: int = 0, shuffle: bool = True,
                           data_rank: int = 0, data_world: int = 1):
        from ..data.iterators import EpochBatchIterator
        if split not in self.datasets:
            self.load_dataset(split)
        itrs = {
            key: EpochBatchIterator(
                ds, max_tokens=max_tokens, max_sentences=max_sentences,
                seed=seed + i, num_shards=num_shards, shard_id=shard_id,
                shuffle=shuffle,
                required_batch_size_multiple=getattr(
                    self.args, "required_batch_size_multiple", 1),
                data_rank=data_rank, data_world=data_world,
                num_batch_buckets=getattr(self.args, "num_batch_buckets", 0))
            for i, (key, ds) in enumerate(self.datasets[split].items())}
        base = RoundRobinIterator(itrs)
        task = self

        class _Iter(RoundRobinIterator):
            def __init__(self, b):
                self.__dict__.update(b.__dict__)

            def next_epoch_itr(self, shuffle: bool = True, offset: int = 0):
                gen = super().next_epoch_itr(shuffle=shuffle, offset=offset)

                def wrapped():
                    for batch in gen:
                        n = task._update_proxy
                        task._update_proxy += 1
                        batch["lambda_bt"] = np.float32(lambda_value(
                            *task.lambda_bt, n))
                        batch["lambda_dae"] = np.float32(lambda_value(
                            *task.lambda_dae, n))
                        yield batch

                return wrapped()

        return _Iter(base)

    # ------------------------------------------------------------------
    def build_model_config(self):
        from ..options import build_transformer_text_config
        n = len(self.common_dict)
        return build_transformer_text_config(self.args, n, n)

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools

        from ..models import transformer_text as tt
        from ..train import losses as L
        cfg = self.build_model_config()
        lang_toks = {lg: self.common_dict.index(lang_token(lg))
                     for lg in self.mono_langs}
        other = {lg: self.other_lang(lg) for lg in self.mono_langs}
        loss = functools.partial(
            L.online_bt_loss,
            mono_langs=tuple(self.mono_langs),
            lang_toks=tuple(sorted(lang_toks.items())),
            other=tuple(sorted(other.items())))
        loss.mean_keys = L.online_bt_loss.mean_keys
        return cfg, functools.partial(tt.init_transformer, cfg=cfg), loss
