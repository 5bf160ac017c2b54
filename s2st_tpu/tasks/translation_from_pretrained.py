"""Fine-tuning translation tasks over pretrained mBART / XLM models.

Parity:
  * ``fairseq/tasks/translation_from_pretrained_bart.py`` — the
    translation task with ``--langs`` ``[lang]`` symbols + ``<mask>``
    added to both dictionaries, the language id APPENDED to every source
    and target row (load_langpair_dataset append_source_id=True), an
    optional ``--prepend-bos``, and generation that stops at the
    ``[tgt_lang]`` symbol instead of EOS (:92-118).
  * ``fairseq/tasks/translation_from_pretrained_xlm.py`` — the
    translation task whose dictionaries are MaskedLMDictionary
    (= Dictionary + <mask>), paired with the
    ``transformer_from_pretrained_xlm`` model: a standard transformer
    whose encoder/decoder embed/positions/layers are warm-started from an
    XLM (cross_lingual_lm) checkpoint
    (models/transformer_from_pretrained_xlm.py:73-148;
    ``--init-encoder-only`` / ``--init-decoder-only`` gate the halves).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..data.language_pair_dataset import LanguagePairItem
from ..registry import register_task
from .translation import TranslationTask

logger = logging.getLogger(__name__)

PAD = 1


class AppendLangIdDataset:
    """load_langpair_dataset append_source_id=True: AppendTokenDataset on
    both streams — src rows end with [src_lang], tgt rows with
    [tgt_lang] (so the eos-moved prev tokens START with [tgt_lang], the
    mBART decoder convention)."""

    def __init__(self, base, src_id: int, tgt_id: Optional[int],
                 prepend_bos: bool = False):
        self.base = base
        self.src_id = src_id
        self.tgt_id = tgt_id
        self.prepend_bos = prepend_bos
        extra = 1 + (1 if prepend_bos else 0)
        self.src_sizes = np.asarray(base.src_sizes) + extra
        self.tgt_sizes = None if base.tgt_sizes is None else \
            np.asarray(base.tgt_sizes) + extra

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int) -> LanguagePairItem:
        it = self.base[i]
        src, tgt = it.source, it.target
        if self.prepend_bos:
            src = np.concatenate([[0], src]).astype(np.int32)
            if tgt is not None:
                tgt = np.concatenate([[0], tgt]).astype(np.int32)
        src = np.concatenate([src, [self.src_id]]).astype(np.int32)
        if tgt is not None and self.tgt_id is not None:
            tgt = np.concatenate([tgt, [self.tgt_id]]).astype(np.int32)
        return LanguagePairItem(id=it.id, source=src, target=tgt,
                                alignment=it.alignment)

    def src_frames(self, i: int) -> int:
        n = int(self.src_sizes[i])
        if self.tgt_sizes is not None:
            n = max(n, int(self.tgt_sizes[i]))
        return n

    def collate(self, items, **kw):
        return self.base.collate(items, **kw)

    def snap_kwargs(self, items):
        return self.base.snap_kwargs(items)


@register_task("translation_from_pretrained_bart")
class TranslationFromPretrainedBARTTask(TranslationTask):
    @classmethod
    def setup_task(cls, args) -> "TranslationFromPretrainedBARTTask":
        task = super().setup_task(args)
        langs = [lg for lg in str(getattr(args, "langs", "") or "")
                 .split(",") if lg]
        if not langs:
            raise ValueError("--langs is required for "
                             "translation_from_pretrained_bart")
        task.langs = langs
        for d in {id(task.src_dict): task.src_dict,
                  id(task.tgt_dict): task.tgt_dict}.values():
            for lg in langs:
                d.add_symbol(f"[{lg}]")
            d.add_symbol("<mask>")
        return task

    def load_dataset(self, split: str):
        base = super().load_dataset(split)
        src_id = self.src_dict.index(f"[{self.args.source_lang}]")
        tgt_id = self.tgt_dict.index(f"[{self.args.target_lang}]")
        ds = AppendLangIdDataset(
            base, src_id, tgt_id,
            prepend_bos=getattr(self.args, "prepend_bos", False))
        self.datasets[split] = ds
        return ds

    def generation_eos(self) -> int:
        """SequenceGenerator(eos=[tgt_lang]) (:99-117)."""
        return self.tgt_dict.index(f"[{self.args.target_lang}]")


@register_task("translation_from_pretrained_xlm")
class TranslationFromPretrainedXLMTask(TranslationTask):
    """TranslationTask whose dictionaries carry <mask> (MaskedLMDictionary
    semantics) so XLM-pretrained embeddings line up."""

    @classmethod
    def setup_task(cls, args) -> "TranslationFromPretrainedXLMTask":
        task = super().setup_task(args)
        for d in {id(task.src_dict): task.src_dict,
                  id(task.tgt_dict): task.tgt_dict}.values():
            d.add_symbol("<mask>")
        return task

    def build_model_and_loss(self):
        import functools

        import jax

        from ..train import losses as L
        arch = str(getattr(self.args, "arch", ""))
        if not arch.startswith("transformer_from_pretrained_xlm"):
            return super().build_model_and_loss()
        from ..models import transformer_text as tt
        # XLM checkpoints carry learned positions; the warm-started
        # transformer must read them (reference base arch keeps the
        # transformer defaults, but the copied embed_positions weights
        # only take effect with learned positions on)
        self.args.encoder_learned_pos = True
        cfg = self.build_model_config().replace(encoder_learned_pos=True)
        ckpt = getattr(self.args, "pretrained_xlm_checkpoint", None)
        init_enc_only = getattr(self.args, "init_encoder_only", False)
        init_dec_only = getattr(self.args, "init_decoder_only", False)

        def init_fn(key):
            variables = tt.init_transformer(key, cfg)
            if ckpt:
                variables = load_xlm_into_transformer(
                    variables, ckpt, encoder=not init_dec_only,
                    decoder=not init_enc_only)
            return variables

        return cfg, init_fn, L.translation_loss


def load_xlm_into_transformer(variables, ckpt_path: str,
                              encoder: bool = True, decoder: bool = False):
    """upgrade_state_dict_with_xlm_weights parity: copy embed_tokens /
    embed_positions / layers.* from a cross_lingual_lm (masked_lm_xlm)
    checkpoint into the transformer halves; everything else keeps its
    fresh init. Shapes must match exactly (the reference asserts)."""
    import jax.numpy as jnp

    from ..train.checkpoint import load_checkpoint_file
    flat, _ = load_checkpoint_file(ckpt_path)
    prefix = "params::encoder::"
    xlm = {k[len(prefix):]: v for k, v in flat.items()
           if k.startswith(prefix)}

    def copy_into(tree):
        tree = dict(tree)
        if "embed::w" in xlm:
            assert tree["embed"]["w"].shape == xlm["embed::w"].shape, \
                "XLM vocab/width mismatch"
            tree["embed"] = {"w": jnp.asarray(xlm["embed::w"])}
        if "embed_positions::w" in xlm and "embed_positions" in tree:
            assert tree["embed_positions"]["w"].shape == \
                xlm["embed_positions::w"].shape, \
                "XLM position-table size mismatch (max positions)"
            tree["embed_positions"] = {
                "w": jnp.asarray(xlm["embed_positions::w"])}
        i = 0
        while f"layer{i}" in tree:
            sub = {k: v for k, v in xlm.items()
                   if k.startswith(f"layer{i}::")}
            if sub:
                new_layer = {}
                for k, v in sub.items():
                    node = new_layer
                    parts = k.split("::")[1:]
                    for part in parts[:-1]:
                        node = node.setdefault(part, {})
                    node[parts[-1]] = jnp.asarray(v)
                # decoder layers keep their fresh cross-attention
                merged = dict(tree[f"layer{i}"])
                merged.update(new_layer)
                tree[f"layer{i}"] = merged
            i += 1
        return tree

    out = {"params": dict(variables["params"]),
           "stats": variables.get("stats", {})}
    if encoder:
        out["params"]["encoder"] = copy_into(out["params"]["encoder"])
    if decoder:
        out["params"]["decoder"] = copy_into(out["params"]["decoder"])
    return out
