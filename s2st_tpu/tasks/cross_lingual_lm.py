"""cross_lingual_lm task: XLM-style multilingual masked-LM pretraining.

Parity: ``fairseq/tasks/cross_lingual_lm.py`` — per-language monolingual
streams (``<split>.<lang>`` binarized), token blocks of
``tokens_per_sample - 1`` with a classification token (EOS) prepended,
language-id SEGMENT labels (``--monolingual-langs`` order), legacy
BERT-style masking (ratio 0.15; of the masked: 0.8 -> <mask>, 0.1 ->
random, 0.1 -> kept; ``fairseq/data/legacy/masked_lm_dataset.py``),
uniform language sampling per example (MultiCorpusSampledDataset), and
the ``legacy_masked_lm_loss`` criterion (per-token CE normalized
in-batch, sample_size 1; ``criterions/legacy_masked_lm.py:73-133``).
The MaskedLMDictionary adds ``<mask>``.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.iterators import EpochBatchIterator
from ..data.mask_tokens_dataset import MaskedTokensDataset
from ..data.token_block_dataset import TokenBlockDataset
from ..registry import register_task

logger = logging.getLogger(__name__)

PAD, EOS = 1, 2


@dataclass
class XLMItem:
    id: int
    source: np.ndarray         # (T,) with classif token at 0, masks applied
    target: np.ndarray         # (T,) PAD everywhere except masked positions
    segment: int


class XLMMaskedDataset:
    """One language's masked stream: classif-token-prepended blocks with
    the lang's segment id."""

    def __init__(self, masked: MaskedTokensDataset, segment: int):
        self.masked = masked
        self.segment = segment
        self.sizes = np.asarray(masked.sizes) + 1

    def __len__(self):
        return len(self.masked)

    def __getitem__(self, i: int) -> XLMItem:
        it = self.masked[i]
        src = np.concatenate([[EOS], it.source]).astype(np.int32)
        tgt = np.concatenate([[PAD], it.target]).astype(np.int32)
        return XLMItem(id=i, source=src, target=tgt, segment=self.segment)


class MultiCorpusSampled:
    """Uniform per-example language choice (multi_corpus_sampled_dataset
    semantics); deterministic in (seed, index)."""

    def __init__(self, parts: Dict[str, XLMMaskedDataset], seed: int):
        self.parts = parts
        self.keys = sorted(parts)
        self.seed = seed
        self.length = sum(len(p) for p in parts.values())
        self.sizes = np.concatenate(
            [np.asarray(parts[k].sizes) for k in self.keys])

    def __len__(self):
        return self.length

    def _pick(self, i: int):
        r = np.random.RandomState((self.seed * 1000003 + i) % (2 ** 31))
        key = self.keys[r.randint(len(self.keys))]
        sub = r.randint(len(self.parts[key]))
        return key, sub

    def __getitem__(self, i: int) -> XLMItem:
        key, sub = self._pick(i)
        it = self.parts[key][sub]
        it.id = i
        return it

    def src_frames(self, i: int) -> int:
        key, sub = self._pick(i)
        return int(self.parts[key].sizes[sub])

    def snap_kwargs(self, items: List[XLMItem]) -> Dict[str, int]:
        from ..data.iterators import snap_len
        return dict(pad_batch=snap_len(len(items), 8),
                    pad_len=snap_len(max(len(it.source) for it in items),
                                     8))

    def collate(self, items: List[XLMItem],
                pad_batch: Optional[int] = None,
                pad_len: Optional[int] = None) -> Dict[str, Any]:
        b = pad_batch or len(items)
        t = pad_len or max(len(it.source) for it in items)
        src = np.full((b, t), PAD, np.int32)
        tgt = np.full((b, t), PAD, np.int32)
        seg = np.zeros((b, t), np.int32)
        for i, it in enumerate(items):
            n = len(it.source)
            src[i, :n] = it.source[:t]
            tgt[i, :n] = it.target[:t]
            seg[i, :n] = it.segment
        return {"id": np.asarray([it.id for it in items], np.int64),
                "src_tokens": src, "segment_labels": seg, "target": tgt,
                "ntokens": int(sum(len(it.source) for it in items)),
                "nsentences": len(items)}


@register_task("cross_lingual_lm")
class CrossLingualLMTask:
    def __init__(self, args, dictionary: Dictionary):
        self.args = args
        self.dictionary = dictionary
        self.mask_idx = dictionary.add_symbol("<mask>")
        langs = str(getattr(args, "monolingual_langs", "") or "en")
        self.langs = [lg.strip() for lg in langs.split(",")]
        self.langs2id = {lg: i for i, lg in enumerate(self.langs)}
        self.datasets: Dict[str, MultiCorpusSampled] = {}

    @classmethod
    def setup_task(cls, args) -> "CrossLingualLMTask":
        d = Dictionary.load(os.path.join(args.data, "dict.txt"))
        logger.info(f"dictionary: {len(d)} types")
        return cls(args, d)

    @property
    def source_dictionary(self):
        return self.dictionary

    target_dictionary = source_dictionary

    def load_dataset(self, split: str) -> MultiCorpusSampled:
        data_path = str(self.args.data).split(os.pathsep)[0]
        parts = {}
        for lang in self.langs:
            ds = load_indexed_dataset(
                os.path.join(data_path, f"{split}.{lang}"),
                self.dictionary, getattr(self.args, "dataset_impl", None))
            if ds is None:
                raise FileNotFoundError(f"{split}.{lang} not found in "
                                        f"{data_path}")
            block = TokenBlockDataset(
                ds, ds.sizes,
                block_size=getattr(self.args, "tokens_per_sample", 512) - 1,
                break_mode="none", include_targets=False)
            masked = MaskedTokensDataset(
                block, block.sizes, len(self.dictionary), self.mask_idx,
                seed=getattr(self.args, "seed", 1),
                mask_prob=0.15, leave_unmasked_prob=0.1,
                random_token_prob=0.1)
            parts[lang] = XLMMaskedDataset(masked, self.langs2id[lang])
            logger.info(f"{split}.{lang}: {len(block)} blocks "
                        f"(segment {self.langs2id[lang]})")
        ds = MultiCorpusSampled(parts, getattr(self.args, "seed", 1))
        self.datasets[split] = ds
        return ds

    def get_batch_iterator(self, split: str, max_tokens: int,
                           max_sentences: Optional[int] = None,
                           seed: int = 1, num_shards: int = 1,
                           shard_id: int = 0, shuffle: bool = True,
                           data_rank: int = 0, data_world: int = 1
                           ) -> EpochBatchIterator:
        if split not in self.datasets:
            self.load_dataset(split)
        return EpochBatchIterator(
            self.datasets[split], max_tokens=max_tokens,
            max_sentences=max_sentences, seed=seed, num_shards=num_shards,
            shard_id=shard_id, shuffle=shuffle,
            required_batch_size_multiple=getattr(
                self.args, "required_batch_size_multiple", 1),
            data_rank=data_rank, data_world=data_world,
            num_workers=getattr(self.args, "num_workers", 0),
            num_batch_buckets=getattr(self.args, "num_batch_buckets", 0))

    # ------------------------------------------------------------------
    def build_model_config(self):
        import jax.numpy as jnp

        from ..models.masked_lm_xlm import MaskedLMXLMConfig
        a = self.args
        return MaskedLMXLMConfig(
            vocab_size=len(self.dictionary),
            encoder_layers=a.encoder_layers,
            encoder_embed_dim=a.encoder_embed_dim,
            encoder_ffn_embed_dim=a.encoder_ffn_embed_dim,
            encoder_attention_heads=a.encoder_attention_heads,
            dropout=a.dropout,
            attention_dropout=a.attention_dropout,
            act_dropout=getattr(a, "activation_dropout", 0.0),
            activation_fn=a.activation_fn,
            encoder_learned_pos=getattr(a, "encoder_learned_pos", False),
            num_segment=max(len(self.langs),
                            getattr(a, "num_segment", 0) or 0),
            share_encoder_input_output_embed=getattr(
                a, "share_encoder_input_output_embed", False),
            encoder_normalize_before=getattr(
                a, "encoder_normalize_before", False),
            sent_loss=False,
            max_positions=getattr(a, "tokens_per_sample", 512) + 2,
            dtype=jnp.bfloat16 if (a.fp16 or a.bf16) else jnp.float32)

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools

        from ..models import masked_lm_xlm as mx
        from ..train import losses as L
        cfg = self.build_model_config()
        return cfg, functools.partial(mx.init_masked_lm_xlm, cfg=cfg), \
            L.legacy_masked_lm_loss
