"""sentence_prediction task (RoBERTa GLUE-style finetuning).

Parity: ``fairseq/tasks/sentence_prediction.py`` — binarized
``<data>/input0/<split>`` (+ optional ``input1`` joined by a separator
token), ``<data>/label/<split>`` label dictionary (class id = dictionary
index - nspecial), <s>-prepended inputs truncated to max positions;
``fairseq/criterions/sentence_prediction.py`` cross-entropy +
accuracy over the pooled classification head.
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
from ..registry import register_task

logger = logging.getLogger(__name__)

PAD, BOS, EOS = 1, 0, 2


@dataclass
class SentenceItem:
    id: int
    source: np.ndarray
    label: int


class SentencePredictionDataset:
    def __init__(self, input0, input1, labels, nspecial: int,
                 max_positions: int):
        self.input0 = input0
        self.input1 = input1
        self.labels = labels
        self.nspecial = nspecial
        self.max_positions = max_positions
        sizes = np.asarray(input0.sizes) + 1
        if input1 is not None:
            sizes = sizes + np.asarray(input1.sizes) + 1
        self.sizes = np.minimum(sizes, max_positions)

    def __len__(self):
        return len(self.input0)

    def __getitem__(self, i: int) -> SentenceItem:
        toks = np.concatenate([[BOS], np.asarray(self.input0[i], np.int64)])
        if self.input1 is not None:
            toks = np.concatenate(
                [toks, [EOS], np.asarray(self.input1[i], np.int64)])
        toks = toks[:self.max_positions]
        label = int(np.asarray(self.labels[i])[0]) - self.nspecial
        return SentenceItem(id=i, source=toks.astype(np.int32),
                            label=label)

    def src_frames(self, i: int) -> int:
        return int(self.sizes[i])

    def snap_kwargs(self, items: List[SentenceItem]) -> Dict[str, int]:
        from ..data.iterators import snap_len
        return dict(pad_batch=snap_len(len(items), 8),
                    pad_len=snap_len(max(len(it.source) for it in items),
                                     8))

    def collate(self, items: List[SentenceItem],
                pad_batch: Optional[int] = None,
                pad_len: Optional[int] = None) -> Dict[str, Any]:
        b = pad_batch or len(items)
        t = pad_len or max(len(it.source) for it in items)
        src = np.full((b, t), PAD, np.int32)
        labels = np.full((b,), -1, np.int32)   # -1 = padded row (masked)
        for i, it in enumerate(items):
            src[i, :len(it.source)] = it.source
            labels[i] = it.label
        return {"id": np.asarray([it.id for it in items], np.int64),
                "src_tokens": src, "target": labels,
                "ntokens": int(sum(len(it.source) for it in items)),
                "nsentences": len(items)}


@register_task("sentence_prediction")
class SentencePredictionTask:
    def __init__(self, args, data_dict: Dictionary,
                 label_dict: Dictionary):
        self.args = args
        self.dictionary = data_dict
        self.label_dictionary = label_dict
        self.datasets: Dict[str, SentencePredictionDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "SentencePredictionTask":
        assert getattr(args, "num_classes", 0) > 0, \
            "Must set --num-classes"
        data_dict = Dictionary.load(
            os.path.join(args.data, "input0", "dict.txt"))
        label_dict = Dictionary.load(
            os.path.join(args.data, "label", "dict.txt"))
        logger.info(f"[input] dictionary: {len(data_dict)} types; "
                    f"[label] dictionary: {len(label_dict)} types")
        return cls(args, data_dict, label_dict)

    @property
    def source_dictionary(self):
        return self.dictionary

    target_dictionary = source_dictionary

    def load_dataset(self, split: str) -> SentencePredictionDataset:
        def make(key, dic):
            path = os.path.join(self.args.data, key, split)
            return load_indexed_dataset(path, dic,
                                        getattr(self.args, "dataset_impl",
                                                None))

        input0 = make("input0", self.dictionary)
        if input0 is None:
            raise FileNotFoundError(f"could not find dataset: "
                                    f"input0/{split}")
        input1 = make("input1", self.dictionary)
        labels = make("label", self.label_dictionary)
        ds = SentencePredictionDataset(
            input0, input1, labels, self.label_dictionary.nspecial,
            getattr(self.args, "max_source_positions", 512))
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
        from ..models.roberta import RobertaConfig
        a = self.args
        return RobertaConfig(
            vocab_size=len(self.dictionary),
            encoder_layers=a.encoder_layers,
            encoder_embed_dim=a.encoder_embed_dim,
            encoder_ffn_embed_dim=a.encoder_ffn_embed_dim,
            encoder_attention_heads=a.encoder_attention_heads,
            dropout=a.dropout,
            attention_dropout=a.attention_dropout,
            activation_dropout=a.activation_dropout,
            pooler_dropout=getattr(a, "pooler_dropout", 0.0),
            activation_fn=a.activation_fn,
            max_positions=getattr(a, "max_source_positions", 512),
            normalize_before=getattr(a, "encoder_normalize_before", False),
            layernorm_embedding=getattr(a, "layernorm_embedding", True),
            no_final_layer_norm=getattr(a, "no_final_layer_norm", False),
            dtype=jnp.bfloat16 if (a.fp16 or a.bf16) else jnp.float32)

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools

        import jax

        from ..models import roberta
        from ..train import losses as L
        cfg = self.build_model_config()
        num_classes = self.args.num_classes

        def init_fn(key):
            k1, k2 = jax.random.split(key)
            variables = roberta.init_roberta(k1, cfg)
            variables["params"]["classification_heads"] = {
                "sentence_classification_head":
                    roberta.init_classification_head(k2, cfg, num_classes)}
            return variables

        return cfg, init_fn, L.sentence_prediction_loss
