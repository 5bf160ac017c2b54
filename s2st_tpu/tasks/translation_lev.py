"""translation_lev: non-autoregressive translation task
(parity: ``fairseq/tasks/translation_lev.py`` TranslationLevenshteinTask).

Same binarized language-pair data as the translation task with
``prepend_bos=True`` (load_dataset :48-64), plus the ``--noise`` scaffold
corruption (random_delete / random_mask / full_mask / no_noise). The noise
is injected inside the jitted loss from the step rng (the reference's
train_step/valid_step both call inject_noise on the host, :175-190) so the
whole train step stays one compiled program.
"""

from __future__ import annotations

import logging

from ..registry import register_task
from .translation import TranslationTask

logger = logging.getLogger(__name__)


@register_task("translation_lev")
class TranslationLevenshteinTask(TranslationTask):
    def load_dataset(self, split: str):
        ds = super().load_dataset(split)
        ds.prepend_bos = True
        ds.src_sizes = ds.src_sizes + 1
        if ds.tgt_sizes is not None:
            ds.tgt_sizes = ds.tgt_sizes + 1
        return ds

    def build_model_and_loss(self):
        import functools
        from ..models import nat_transformer as natm
        from ..options import build_transformer_text_config
        from ..train import losses as L
        a = self.args
        base = build_transformer_text_config(
            a, len(self.src_dict), len(self.tgt_dict))
        if str(a.arch).startswith("insertion"):
            from ..models import insertion_transformer as insm
            cfg = insm.InsertionConfig(
                base=base, label_tau=getattr(a, "label_tau", None))
            loss = functools.partial(
                L.insertion_loss,
                noise=getattr(a, "noise", "random_delete"))
            loss.mean_keys = L.insertion_loss.mean_keys
            return cfg, functools.partial(insm.init_insertion, cfg=cfg), \
                loss
        if str(a.arch).startswith("levenshtein"):
            from ..models import levenshtein_transformer as lev
            cfg = lev.LevenshteinConfig(
                base=base,
                early_exit=tuple(int(x) for x in
                                 str(getattr(a, "early_exit",
                                             "6,6,6")).split(",")),
                no_share_discriminator=getattr(
                    a, "no_share_discriminator", False),
                no_share_maskpredictor=getattr(
                    a, "no_share_maskpredictor", False),
                share_discriminator_maskpredictor=getattr(
                    a, "share_discriminator_maskpredictor", False),
                sampling_for_deletion=getattr(
                    a, "sampling_for_deletion", False))
            loss = functools.partial(
                L.lev_loss, noise=getattr(a, "noise", "random_delete"))
            loss.mean_keys = L.lev_loss.mean_keys
            return cfg, functools.partial(lev.init_levenshtein, cfg=cfg), \
                loss
        is_inat = str(a.arch).startswith("iterative")
        is_crf = str(a.arch).startswith("nacrf")
        cfg = natm.NATConfig(
            crf=is_crf,
            crf_lowrank_approx=getattr(a, "crf_lowrank_approx", 32),
            crf_beam_approx=getattr(a, "crf_beam_approx", 64),
            word_ins_loss_factor=getattr(a, "word_ins_loss_factor", 0.5),
            base=base,
            sg_length_pred=getattr(a, "sg_length_pred", False),
            pred_length_offset=getattr(a, "pred_length_offset", False),
            length_loss_factor=getattr(a, "length_loss_factor", 0.1),
            src_embedding_copy=getattr(a, "src_embedding_copy", False),
            train_step=(getattr(a, "train_step", 4) or 4) if is_inat else 1,
            dae_ratio=getattr(a, "dae_ratio", 0.5),
            stochastic_approx=getattr(a, "stochastic_approx", False))
        kind = "cmlm" if str(a.arch).startswith("cmlm") else "nat"
        loss = functools.partial(L.nat_loss,
                                 noise=getattr(a, "noise", "random_mask"),
                                 kind=kind)
        loss.mean_keys = L.nat_loss.mean_keys
        return cfg, functools.partial(natm.init_nat, cfg=cfg), loss
