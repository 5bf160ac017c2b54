"""masked_lm task (fairseq/tasks/masked_lm.py): RoBERTa pretraining over
binarized monolingual data — token blocks of tokens_per_sample - 1,
prepended <s>, a ``<mask>`` symbol added to the dictionary, BERT-style
masking in the dataset, masked-position cross-entropy.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.iterators import EpochBatchIterator
from ..data.mask_tokens_dataset import MaskedTokensDataset
from ..data.token_block_dataset import TokenBlockDataset
from ..registry import register_task

logger = logging.getLogger(__name__)


@register_task("masked_lm")
class MaskedLMTask:
    def __init__(self, args, dictionary: Dictionary):
        self.args = args
        self.dictionary = dictionary
        self.mask_idx = dictionary.add_symbol("<mask>")
        self.datasets: Dict[str, MaskedTokensDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "MaskedLMTask":
        paths = str(args.data).split(os.pathsep)
        dictionary = Dictionary.load(os.path.join(paths[0], "dict.txt"))
        logger.info(f"dictionary: {len(dictionary)} types")
        return cls(args, dictionary)

    @property
    def source_dictionary(self):
        return self.dictionary

    target_dictionary = source_dictionary

    def load_dataset(self, split: str) -> MaskedTokensDataset:
        data_path = str(self.args.data).split(os.pathsep)[0]
        ds = load_indexed_dataset(os.path.join(data_path, split),
                                  self.dictionary,
                                  getattr(self.args, "dataset_impl", None),
                                  combine=True)
        if ds is None:
            raise FileNotFoundError(f"Dataset not found: {split}")
        block = TokenBlockDataset(
            ds, ds.sizes,
            block_size=getattr(self.args, "tokens_per_sample", 512) - 1,
            break_mode=getattr(self.args, "sample_break_mode", "complete"),
            include_targets=False)
        logger.info(f"{data_path} {split} {len(block)} blocks")
        # --mask-prob is shared with the wav2vec2 flag group whose default
        # is 0.65 (span masking); BERT-style masking defaults to 0.15, so
        # the untouched wav2vec default means "unset" here
        mp = getattr(self.args, "mask_prob", 0.15)
        if mp == 0.65:
            mp = 0.15
        mono = MaskedTokensDataset(
            block, block.sizes, len(self.dictionary), self.mask_idx,
            seed=getattr(self.args, "seed", 1),
            mask_prob=mp,
            leave_unmasked_prob=getattr(self.args, "leave_unmasked_prob",
                                        0.1),
            random_token_prob=getattr(self.args, "random_token_prob", 0.1))
        self.datasets[split] = mono
        return mono

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
            activation_fn=a.activation_fn,
            max_positions=max(getattr(a, "tokens_per_sample", 512) + 2,
                              512),
            untie_weights_roberta=getattr(a, "untie_weights_roberta",
                                          False),
            normalize_before=getattr(a, "encoder_normalize_before", False),
            layernorm_embedding=getattr(a, "layernorm_embedding", True),
            no_final_layer_norm=getattr(a, "no_final_layer_norm", False),
            dtype=jnp.bfloat16 if (a.fp16 or a.bf16) else jnp.float32)

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools
        from ..models import roberta
        from ..train import losses as L
        cfg = self.build_model_config()
        return cfg, functools.partial(roberta.init_roberta, cfg=cfg), \
            L.masked_lm_loss
