"""sentence_ranking task (multiple-choice finetuning, e.g. RACE/SWAG).

Parity: ``fairseq/tasks/sentence_ranking.py`` — binarized
``input0/<split>`` shared context plus ``input1..inputN`` candidate
streams; each candidate row = [--init-token] + option (truncated to
``--max-option-length``) + [--separator-token]-prepended context
(ConcatSentencesDataset order, :129-146); labels from the raw text
``label/<split>.label`` file. ``fairseq/criterions/sentence_ranking.py``
— the model scores every candidate with a 1-unit ranking head and the
loss is sum-reduced NLL over the per-candidate softmax.
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

PAD = 1


@dataclass
class RankingItem:
    id: int
    options: List[np.ndarray]   # num_classes candidate token rows
    label: int


class SentenceRankingDataset:
    def __init__(self, input0, input_options, labels, args):
        self.input0 = input0
        self.input_options = input_options
        self.labels = labels
        self.args = args
        opt_sizes = np.max(np.stack(
            [np.asarray(o.sizes) for o in input_options]), axis=0)
        if args.max_option_length is not None:
            opt_sizes = np.minimum(opt_sizes, args.max_option_length)
        self.sizes = np.asarray(input0.sizes) + opt_sizes + 2

    def __len__(self):
        return len(self.input0)

    def __getitem__(self, i: int) -> RankingItem:
        a = self.args
        ctx = np.asarray(self.input0[i], np.int64)
        if a.separator_token is not None:
            ctx = np.concatenate([[a.separator_token], ctx])
        rows = []
        for opt_ds in self.input_options:
            opt = np.asarray(opt_ds[i], np.int64)
            if a.init_token is not None:
                opt = np.concatenate([[a.init_token], opt])
            if a.max_option_length is not None:
                opt = opt[:a.max_option_length]
            rows.append(np.concatenate([opt, ctx])[
                :getattr(a, "max_source_positions", 512)].astype(np.int32))
        return RankingItem(id=i, options=rows, label=int(self.labels[i]))

    def src_frames(self, i: int) -> int:
        return int(self.sizes[i])

    def snap_kwargs(self, items: List[RankingItem]) -> Dict[str, int]:
        from ..data.iterators import snap_len
        return dict(
            pad_batch=snap_len(len(items), 8),
            pad_len=snap_len(max(len(row) for it in items
                                 for row in it.options), 8))

    def collate(self, items: List[RankingItem],
                pad_batch: Optional[int] = None,
                pad_len: Optional[int] = None) -> Dict[str, Any]:
        b = pad_batch or len(items)
        t = pad_len or max(len(row) for it in items for row in it.options)
        c = len(self.input_options)
        src = np.full((b, c, t), PAD, np.int32)
        labels = np.full((b,), -1, np.int32)
        for i, it in enumerate(items):
            for k, row in enumerate(it.options):
                src[i, k, :len(row)] = row
            labels[i] = it.label
        return {"id": np.asarray([it.id for it in items], np.int64),
                "src_tokens_options": src, "target": labels,
                "ntokens": int(sum(len(it.options[0]) for it in items)),
                "nsentences": len(items)}


@register_task("sentence_ranking")
class SentenceRankingTask:
    def __init__(self, args, data_dict: Dictionary):
        self.args = args
        self.dictionary = data_dict
        self.datasets: Dict[str, SentenceRankingDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "SentenceRankingTask":
        assert getattr(args, "num_classes", 0) > 0, "Must set --num-classes"
        data_dict = Dictionary.load(
            os.path.join(args.data, "input0", "dict.txt"))
        logger.info(f"[input] dictionary: {len(data_dict)} types")
        return cls(args, data_dict)

    @property
    def source_dictionary(self):
        return self.dictionary

    target_dictionary = source_dictionary

    def load_dataset(self, split: str) -> SentenceRankingDataset:
        impl = getattr(self.args, "dataset_impl", None)

        def make(key):
            return load_indexed_dataset(
                os.path.join(self.args.data, key, split),
                self.dictionary, impl)

        input0 = make("input0")
        if input0 is None:
            raise FileNotFoundError(f"input0/{split} not found")
        options = [make(f"input{k + 1}")
                   for k in range(self.args.num_classes)]
        label_path = os.path.join(self.args.data, "label",
                                  f"{split}.label")
        labels = [int(x) for x in open(label_path)] \
            if os.path.exists(label_path) else [0] * len(input0)
        ds = SentenceRankingDataset(input0, options, labels, self.args)
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
        head_name = getattr(self.args, "ranking_head_name",
                            "sentence_classification_head")

        def init_fn(key):
            k1, k2 = jax.random.split(key)
            variables = roberta.init_roberta(k1, cfg)
            variables["params"]["classification_heads"] = {
                head_name: roberta.init_classification_head(k2, cfg, 1)}
            return variables

        loss = functools.partial(L.sentence_ranking_loss,
                                 head_name=head_name)
        loss.mean_keys = L.sentence_ranking_loss.mean_keys
        return cfg, init_fn, loss
