"""semisupervised_translation: multilingual MT + on-the-fly
back-translation + denoising autoencoding.

Parity: ``fairseq/tasks/semisupervised_translation.py`` — the
multilingual_translation round-robin regime extended with
  * a ``bt:{pair}`` stream per pair: target-language monolingual batches
    back-translated ON THE FLY by the reverse-direction model
    (``--bt-beam-size`` beam, max len a*x+b), training the forward model
    on (synthetic source, real target) (:356-447);
  * a ``denoising:{pair}`` stream: word-noised target monolingual text
    (WordShuffle <= ``--max-word-shuffle-distance``, WordDropout
    ``--word-dropout-prob``, blanking ``--word-blanking-prob``;
    fairseq/data/noising.py) reconstructed by a ``tgt-tgt`` model;
  * per-stream loss weights ``--lambda-parallel-config`` /
    ``--lambda-otf-bt-config`` / ``--lambda-denoising-config``, fixed or
    piecewise-linear in the update count (:41-61).

TPU design: back-translation runs INSIDE the jitted train step — the
reverse pair view decodes with the shared jitted beam (K = bt_beam_size)
under stop_gradient, so the whole (generate -> re-translate -> CE)
round trip is one fused XLA program; the reference leaves generation on
the host between steps. The piecewise-linear lambdas are computed on the
host from the iterator's running batch counter (an update-count proxy;
exact under --update-freq 1) and enter the graph as batch scalars.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..data.language_pair_dataset import LanguagePairDataset, \
    LanguagePairItem
from ..registry import register_task
from .multilingual_translation import (MultilingualTranslationTask,
                                       RoundRobinIterator)

logger = logging.getLogger(__name__)

PAD, EOS, UNK = 1, 2, 3


def parse_lambda_config(x: str):
    """":41-61: "0.5" -> constant; "0:1,20000:0.1" -> piecewise linear."""
    split = str(x).split(",")
    if len(split) == 1:
        return float(x), None
    split = [s.split(os.pathsep) if os.pathsep in s else s.split(":")
             for s in split]
    pairs = [(int(t), float(v)) for t, v in split]
    assert pairs[0][0] == 0, "lambda schedule must start at update 0"
    return float(pairs[0][1]), pairs


def lambda_value(init: float, schedule, n: int) -> float:
    if schedule is None:
        return init
    for (t0, v0), (t1, v1) in zip(schedule[:-1], schedule[1:]):
        if t0 <= n < t1:
            return v0 + (n - t0) * (v1 - v0) / (t1 - t0)
    return schedule[-1][1]


class NoisingDataset:
    """UnsupervisedMTNoising (fairseq/data/noising.py): word shuffle
    within a max distance, word dropout (keep >= 1), word blanking to
    UNK — applied to the clean sentence as the SOURCE; target = clean."""

    def __init__(self, mono, sizes, seed: int, max_shuffle: float,
                 dropout: float, blank: float):
        self.mono = mono
        self.sizes = np.asarray(sizes)
        self.seed = seed
        self.max_shuffle = max_shuffle
        self.dropout = dropout
        self.blank = blank
        self.src_sizes = self.sizes
        self.tgt_sizes = self.sizes

    def __len__(self):
        return len(self.mono)

    def __getitem__(self, i: int) -> LanguagePairItem:
        clean = np.asarray(self.mono[i], np.int64)
        r = np.random.RandomState((self.seed * 9176 + i) % (2 ** 31))
        has_eos = len(clean) > 0 and clean[-1] == EOS
        words = clean[:-1] if has_eos else clean
        x = words
        if self.max_shuffle > 0 and len(x) > 1:
            noise = r.uniform(0, self.max_shuffle, size=len(x))
            order = np.argsort(np.arange(len(x)) + noise, kind="stable")
            x = x[order]
        if self.dropout > 0 and len(x) > 0:
            keep = r.rand(len(x)) >= self.dropout
            if not keep.any():
                keep[r.randint(len(x))] = True
            x = x[keep]
        if self.blank > 0 and len(x) > 0:
            blanked = r.rand(len(x)) < self.blank
            x = np.where(blanked, UNK, x)
        src = np.concatenate([x, [EOS]]) if has_eos else x
        return LanguagePairItem(id=i, source=src.astype(np.int32),
                                target=clean.astype(np.int32))

    def src_frames(self, i: int) -> int:
        return int(self.sizes[i]) + 1


class MonoAsPairDataset:
    """Target-language monolingual rows exposed as (source=clean,
    target=clean) pairs — the BT stream's collate input (the reverse
    model reads src_tokens, the forward CE reads target)."""

    def __init__(self, mono, sizes):
        self.mono = mono
        self.sizes = np.asarray(sizes)
        self.src_sizes = self.sizes
        self.tgt_sizes = self.sizes

    def __len__(self):
        return len(self.mono)

    def __getitem__(self, i: int) -> LanguagePairItem:
        row = np.asarray(self.mono[i], np.int32)
        return LanguagePairItem(id=i, source=row, target=row.copy())

    def src_frames(self, i: int) -> int:
        return int(self.sizes[i])


def _as_langpair(inner, left_pad_source, left_pad_target):
    ds = LanguagePairDataset([], [], None,
                             left_pad_source=left_pad_source,
                             left_pad_target=left_pad_target)

    class _Wrap:
        def __init__(self):
            self.src_sizes = inner.src_sizes
            self.tgt_sizes = inner.tgt_sizes

        def __len__(self):
            return len(inner)

        def __getitem__(self, i):
            return inner[i]

        def src_frames(self, i):
            return inner.src_frames(i)

        def collate(self, items, **kw):
            return ds.collate(items, **kw)

        def snap_kwargs(self, items):
            return ds.snap_kwargs(items)

    return _Wrap()


@register_task("semisupervised_translation")
class SemisupervisedTranslationTask(MultilingualTranslationTask):
    @classmethod
    def setup_task(cls, args) -> "SemisupervisedTranslationTask":
        task = super().setup_task(args)
        task.lambda_parallel, task.lambda_parallel_steps = \
            parse_lambda_config(getattr(args, "lambda_parallel_config",
                                        "1.0"))
        task.lambda_otf_bt, task.lambda_otf_bt_steps = \
            parse_lambda_config(getattr(args, "lambda_otf_bt_config",
                                        "0.0"))
        task.lambda_denoising, task.lambda_denoising_steps = \
            parse_lambda_config(getattr(args, "lambda_denoising_config",
                                        "0.0"))
        if task.lambda_denoising > 0.0 or \
                task.lambda_denoising_steps is not None:
            tgts = sorted({p.split("-")[1] for p in args.lang_pairs})
            task.denoising_pairs = [f"{t}-{t}" for t in tgts]
        else:
            task.denoising_pairs = []
        task._update_proxy = 0
        return task

    @property
    def model_lang_pairs(self) -> List[str]:
        return list(self.args.lang_pairs) + self.denoising_pairs

    def _mono(self, split: str, lang: str):
        """Monolingual stream: {split}.{lang}-None.{lang} (the reference
        naming) or plain {split}.{lang}."""
        from ..data.indexed_dataset import load_indexed_dataset
        data_path = str(self.args.data).split(os.pathsep)[0]
        impl = getattr(self.args, "dataset_impl", None)
        for name in (f"{split}.{lang}-None.{lang}", f"{split}.{lang}"):
            ds = load_indexed_dataset(os.path.join(data_path, name),
                                      self.dicts[lang], impl)
            if ds is not None:
                return ds
        raise FileNotFoundError(f"monolingual {split}.{lang} not found")

    def load_dataset(self, split: str):
        per_pair = {p: self._load_pair(split, *p.split("-"))
                    for p in self.args.lang_pairs}
        lp_s = getattr(self.args, "left_pad_source", True)
        lp_t = getattr(self.args, "left_pad_target", False)
        if split.startswith("train"):
            use_bt = self.lambda_otf_bt > 0.0 or \
                self.lambda_otf_bt_steps is not None
            use_dn = self.lambda_denoising > 0.0 or \
                self.lambda_denoising_steps is not None
            for pair in self.args.lang_pairs:
                tgt = pair.split("-")[1]
                if use_bt:
                    mono = self._mono(split, tgt)
                    per_pair[f"bt:{pair}"] = _as_langpair(
                        MonoAsPairDataset(mono, mono.sizes), lp_s, lp_t)
                if use_dn:
                    mono = self._mono(split, tgt)
                    a = self.args
                    per_pair[f"denoising:{pair}"] = _as_langpair(
                        NoisingDataset(
                            mono, mono.sizes,
                            seed=getattr(a, "seed", 1),
                            max_shuffle=getattr(
                                a, "max_word_shuffle_distance", 3.0),
                            dropout=getattr(a, "word_dropout_prob", 0.1),
                            blank=getattr(a, "word_blanking_prob", 0.2)),
                        lp_s, lp_t)
        self.datasets[split] = per_pair
        return per_pair

    def get_batch_iterator(self, *a, **kw):
        itr = super().get_batch_iterator(*a, **kw)
        task = self

        class _LambdaIter(RoundRobinIterator):
            def __init__(self, base: RoundRobinIterator):
                self.__dict__.update(base.__dict__)

            def next_epoch_itr(self, shuffle: bool = True, offset: int = 0):
                gen = super().next_epoch_itr(shuffle=shuffle, offset=offset)

                def wrapped():
                    for batch in gen:
                        n = task._update_proxy
                        task._update_proxy += 1
                        batch["lambda_parallel"] = np.float32(lambda_value(
                            task.lambda_parallel,
                            task.lambda_parallel_steps, n))
                        batch["lambda_otf_bt"] = np.float32(lambda_value(
                            task.lambda_otf_bt,
                            task.lambda_otf_bt_steps, n))
                        batch["lambda_denoising"] = np.float32(lambda_value(
                            task.lambda_denoising,
                            task.lambda_denoising_steps, n))
                        yield batch

                return wrapped()

        return _LambdaIter(itr)

    # ------------------------------------------------------------------
    def build_model_config(self):
        cfg = super().build_model_config()
        return cfg.replace(
            lang_pairs=tuple(self.model_lang_pairs))

    def build_model_and_loss(self):
        import functools

        from ..models import multilingual_transformer as mt
        from ..train import losses as L
        cfg = self.build_model_config()
        loss = functools.partial(
            L.semisupervised_loss,
            parallel_pairs=tuple(self.args.lang_pairs),
            bt_beam=getattr(self.args, "bt_beam_size", 1),
            bt_max_len_a=getattr(self.args, "bt_max_len_a", 1.1),
            bt_max_len_b=getattr(self.args, "bt_max_len_b", 10.0))
        loss.mean_keys = L.semisupervised_loss.mean_keys
        return cfg, functools.partial(mt.init_multilingual, cfg=cfg), loss
