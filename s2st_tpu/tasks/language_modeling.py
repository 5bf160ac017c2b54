"""The language_modeling task (fairseq/tasks/language_modeling.py).

Binarized monolingual data (``<data>/<split>`` .bin/.idx + ``dict.txt``)
sliced into token blocks (--sample-break-mode / --tokens-per-sample) and
trained as a causal LM with the decoder-only transformer
(models/transformer_lm.py). ``eval_lm`` consumes the same datasets.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.iterators import EpochBatchIterator
from ..data.token_block_dataset import MonolingualDataset, TokenBlockDataset
from ..registry import register_task

logger = logging.getLogger(__name__)


def _cutoff(spec) -> tuple:
    if not spec:
        return ()
    return tuple(int(x) for x in str(spec).split(","))


@register_task("language_modeling")
class LanguageModelingTask:
    def __init__(self, args, dictionary: Dictionary):
        self.args = args
        self.dictionary = dictionary
        self.datasets: Dict[str, MonolingualDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "LanguageModelingTask":
        paths = str(args.data).split(os.pathsep)
        dictionary = Dictionary.load(os.path.join(paths[0], "dict.txt"))
        logger.info(f"dictionary: {len(dictionary)} types")
        return cls(args, dictionary)

    @property
    def source_dictionary(self):
        return self.dictionary

    @property
    def target_dictionary(self):
        return self.dictionary

    # ------------------------------------------------------------------
    def load_dataset(self, split: str) -> MonolingualDataset:
        data_path = str(self.args.data).split(os.pathsep)[0]
        path = os.path.join(data_path, split)
        ds = load_indexed_dataset(path, self.dictionary,
                                  getattr(self.args, "dataset_impl", None),
                                  combine=True)
        if ds is None:
            raise FileNotFoundError(f"Dataset not found: {split} ({path})")
        block = TokenBlockDataset(
            ds, ds.sizes,
            block_size=getattr(self.args, "tokens_per_sample", 1024),
            break_mode=getattr(self.args, "sample_break_mode", "none"),
            include_targets=True)
        logger.info(f"{data_path} {split} {len(block)} blocks")
        mono = MonolingualDataset(
            block, block.sizes, self.dictionary,
            add_bos_token=getattr(self.args, "add_bos_token", False))
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
        from ..models.transformer_lm import TransformerLMConfig
        a = self.args
        return TransformerLMConfig(
            vocab_size=len(self.dictionary),
            decoder_layers=a.decoder_layers,
            decoder_embed_dim=a.decoder_embed_dim,
            decoder_ffn_embed_dim=a.decoder_ffn_embed_dim,
            decoder_attention_heads=a.decoder_attention_heads,
            no_decoder_final_norm=getattr(a, "no_decoder_final_norm", False),
            dropout=a.dropout,
            attention_dropout=a.attention_dropout,
            activation_dropout=a.activation_dropout,
            activation_fn=a.activation_fn,
            no_scale_embedding=a.no_scale_embedding,
            share_decoder_input_output_embed=getattr(
                a, "share_decoder_input_output_embed", False),
            add_bos_token=getattr(a, "add_bos_token", False),
            max_target_positions=max(
                a.max_target_positions,
                getattr(a, "tokens_per_sample", 1024) + 2),
            adaptive_input=getattr(a, "adaptive_input", False),
            adaptive_input_cutoff=_cutoff(
                getattr(a, "adaptive_input_cutoff", None)),
            adaptive_input_factor=getattr(a, "adaptive_input_factor", 4.0),
            adaptive_softmax_cutoff=_cutoff(
                getattr(a, "adaptive_softmax_cutoff", None)),
            adaptive_softmax_factor=getattr(
                a, "adaptive_softmax_factor", 4.0),
            tie_adaptive_weights=getattr(a, "tie_adaptive_weights", False),
            tie_adaptive_proj=getattr(a, "tie_adaptive_proj", False),
            dtype=jnp.bfloat16 if (a.fp16 or a.bf16) else jnp.float32)

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools
        from ..models import transformer_lm as tlm
        from ..train import losses as L
        arch = str(getattr(self.args, "arch", ""))
        if arch.startswith("lstm_lm"):
            from ..models import lstm as lstm_m
            from ..options import build_lstm_config
            n = len(self.dictionary)
            cfg = build_lstm_config(self.args, n, n).replace(
                decoder_attention=False, is_lm=True,
                residuals=getattr(self.args, "residuals", False))
            return cfg, functools.partial(lstm_m.init_lstm_lm, cfg=cfg), \
                L.lm_loss
        if arch.startswith(("lightconv_lm", "dynamicconv_lm")):
            from ..models import lightconv_model as lc_m
            from ..options import build_lightconv_config
            n = len(self.dictionary)
            # decoder-only: the (unused) encoder half of the config must
            # still build — mirror the decoder geometry onto it
            self.args.encoder_layers = self.args.decoder_layers
            if getattr(self.args, "encoder_kernel_size_list", None) is None:
                self.args.encoder_kernel_size_list = \
                    self.args.decoder_kernel_size_list
            cfg = build_lightconv_config(self.args, n, n)
            return cfg, functools.partial(lc_m.init_lightconv_lm, cfg=cfg), \
                L.lm_loss
        if arch.startswith("fconv"):
            from ..models import fconv as fconv_m
            from ..options import build_fconv_config
            n = len(self.dictionary)
            cfg = build_fconv_config(self.args, n, n).replace(
                positional_embeddings=False,
                decoder_out_embed_dim=self.args.decoder_embed_dim,
                decoder_attention=tuple())
            # fconv_lm: attention [False]*n (fconv_lm.py:82-86)
            cfg = cfg.replace(decoder_attention=(
                (False,) * len(cfg.decoder_convs)))
            return cfg, functools.partial(fconv_m.init_fconv_lm, cfg=cfg), \
                L.lm_loss
        cfg = self.build_model_config()
        return cfg, functools.partial(tlm.init_transformer_lm, cfg=cfg), \
            L.lm_loss
