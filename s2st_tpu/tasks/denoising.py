"""denoising task (BART pretraining; fairseq/tasks/denoising.py).

Monolingual binarized data -> eos-stripped token blocks
(--sample-break-mode complete_doc) wrapped in [bos ... eos], noised by the
DenoisingDataset (text infilling / insertion / rotation / sentence
permutation) and trained as seq2seq reconstruction with the BART
(learned-position) transformer.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

from ..data.dictionary import Dictionary
from ..data.denoising_dataset import DenoisingDataset
from ..data.indexed_dataset import load_indexed_dataset
from ..data.iterators import EpochBatchIterator
from ..data.token_block_dataset import TokenBlockDataset
from ..registry import register_task

logger = logging.getLogger(__name__)


class _StripEos:
    """StripTokenDataset(eos) over an indexed dataset."""

    def __init__(self, ds):
        self.ds = ds
        self.sizes = np.maximum(np.asarray(ds.sizes) - 1, 0)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        row = np.asarray(self.ds[i])
        return row[:-1] if len(row) and row[-1] == 2 else row


@register_task("denoising")
class DenoisingTask:
    def __init__(self, args, dictionary: Dictionary):
        self.args = args
        self.dictionary = dictionary
        self.mask_idx = dictionary.add_symbol("<mask>")
        self.datasets: Dict[str, DenoisingDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "DenoisingTask":
        paths = str(args.data).split(os.pathsep)
        dictionary = Dictionary.load(os.path.join(paths[0], "dict.txt"))
        logger.info(f"dictionary: {len(dictionary)} types")
        return cls(args, dictionary)

    @property
    def source_dictionary(self):
        return self.dictionary

    target_dictionary = source_dictionary

    def load_dataset(self, split: str) -> DenoisingDataset:
        data_path = str(self.args.data).split(os.pathsep)[0]
        ds = load_indexed_dataset(os.path.join(data_path, split),
                                  self.dictionary,
                                  getattr(self.args, "dataset_impl", None),
                                  combine=True)
        if ds is None:
            raise FileNotFoundError(f"Dataset not found: {split}")
        stripped = _StripEos(ds)
        block = TokenBlockDataset(
            stripped, stripped.sizes,
            block_size=getattr(self.args, "tokens_per_sample", 512) - 2,
            break_mode=getattr(self.args, "sample_break_mode", "complete"),
            include_targets=False)
        logger.info(f"{data_path} {split} {len(block)} blocks")
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
        self.datasets[split] = noisy
        return noisy

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
        from ..options import build_transformer_text_config
        cfg = build_transformer_text_config(
            self.args, len(self.dictionary), len(self.dictionary))
        return cfg

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools
        from ..models import transformer_text as tt
        from ..train import losses as L
        cfg = self.build_model_config()
        return cfg, functools.partial(tt.init_transformer, cfg=cfg), \
            L.translation_loss
