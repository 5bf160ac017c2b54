"""The translation task: binarized text MT (fairseq-train --task translation).

Parity: ``fairseq/tasks/translation.py`` — language-pair inference from the
binarized filenames (data_utils.infer_language_pair), ``dict.<lang>.txt``
dictionaries, ``load_langpair_dataset`` split resolution (both
``<split>.<src>-<tgt>.<lang>`` naming directions, shard combine), and the
LanguagePairDataset collate contract consumed by the transformer model +
label-smoothed CE.
"""

from __future__ import annotations

import itertools
import logging
import os
from typing import Dict, Optional

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import dataset_exists, load_indexed_dataset
from ..data.iterators import EpochBatchIterator
from ..data.language_pair_dataset import LanguagePairDataset
from ..registry import register_task

logger = logging.getLogger(__name__)


class _TruncateSource:
    """--truncate-source view: strip trailing eos, truncate to ``n``,
    re-append eos (translation.py:88-95 AppendToken(Truncate(StripToken)))."""

    def __init__(self, ds, n: int, eos: int):
        import numpy as np
        self.ds, self.n, self.eos = ds, n, eos
        self.sizes = np.minimum(ds.sizes, n + 1)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        import numpy as np
        row = self.ds[i]
        if len(row) > self.n + 1:
            row = np.concatenate([row[:self.n],
                                  np.asarray([self.eos], row.dtype)])
        return row


def infer_language_pair(path: str):
    """data_utils.infer_language_pair parity: find a
    ``train.<src>-<tgt>.*`` artifact and split the langpair off its name."""
    src, tgt = None, None
    for fname in sorted(os.listdir(path)):
        parts = fname.split(".")
        if len(parts) >= 3 and parts[0] == "train" and parts[1].count("-") == 1:
            return parts[1].split("-")
    return src, tgt


@register_task("translation")
class TranslationTask:
    def __init__(self, args, src_dict: Dictionary, tgt_dict: Dictionary):
        self.args = args
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.datasets: Dict[str, LanguagePairDataset] = {}

    # ------------------------------------------------------------------
    @classmethod
    def setup_task(cls, args) -> "TranslationTask":
        paths = str(args.data).split(os.pathsep)
        if getattr(args, "source_lang", None) is None or \
                getattr(args, "target_lang", None) is None:
            src, tgt = infer_language_pair(paths[0])
            if src is None or tgt is None:
                raise ValueError(
                    "could not infer language pair; use --source-lang and "
                    "--target-lang")
            args.source_lang, args.target_lang = src, tgt
        src_dict = Dictionary.load(
            os.path.join(paths[0], f"dict.{args.source_lang}.txt"))
        tgt_dict = Dictionary.load(
            os.path.join(paths[0], f"dict.{args.target_lang}.txt"))
        assert src_dict.pad() == tgt_dict.pad()
        assert src_dict.eos() == tgt_dict.eos()
        logger.info(f"[{args.source_lang}] dictionary: {len(src_dict)} types")
        logger.info(f"[{args.target_lang}] dictionary: {len(tgt_dict)} types")
        return cls(args, src_dict, tgt_dict)

    @property
    def source_dictionary(self):
        return self.src_dict

    @property
    def target_dictionary(self):
        return self.tgt_dict

    # ------------------------------------------------------------------
    def load_dataset(self, split: str) -> LanguagePairDataset:
        """load_langpair_dataset parity: resolve
        ``<split><k>.<src>-<tgt>.<lang>`` in either naming direction,
        combining ``split1``, ``split2``, ... shards."""
        data_path = str(self.args.data).split(os.pathsep)[0]
        src, tgt = self.args.source_lang, self.args.target_lang
        impl = getattr(self.args, "dataset_impl", None)

        def prefix_for(split_k):
            for a, b in ((src, tgt), (tgt, src)):
                probe = os.path.join(data_path, f"{split_k}.{a}-{b}.")
                if dataset_exists(probe + src, impl or "mmap") or \
                        dataset_exists(probe + src, impl or "cached") or \
                        os.path.exists(probe + src + ".idx") or \
                        os.path.exists(probe + src + ".bin"):
                    return probe
            return None

        src_parts, tgt_parts = [], []
        for k in itertools.count():
            split_k = split + (str(k) if k > 0 else "")
            prefix = prefix_for(split_k)
            if prefix is None:
                if k == 0:
                    raise FileNotFoundError(
                        f"Dataset not found: {split} ({data_path})")
                break
            src_parts.append(load_indexed_dataset(
                prefix + src, self.src_dict, impl))
            tgt_ds = load_indexed_dataset(prefix + tgt, self.tgt_dict, impl)
            if tgt_ds is not None:
                tgt_parts.append(tgt_ds)
            logger.info(f"{data_path} {split_k} {src}-{tgt} "
                        f"{len(src_parts[-1])} examples")

        def concat(parts):
            if len(parts) == 1:
                return parts[0]

            class _Cat:
                def __init__(self, ps):
                    self.ps = ps
                    self.lens = [len(p) for p in ps]

                def __len__(self):
                    return sum(self.lens)

                def __getitem__(self, i):
                    for p, n in zip(self.ps, self.lens):
                        if i < n:
                            return p[i]
                        i -= n
                    raise IndexError

                @property
                def sizes(self):
                    import numpy as np
                    return np.concatenate([p.sizes for p in self.ps])

            return _Cat(parts)

        src_ds = concat(src_parts)
        tgt_ds = concat(tgt_parts) if tgt_parts else None
        if getattr(self.args, "truncate_source", False):
            # strip-eos -> truncate to msp-1 -> re-append eos
            # (translation.py:88-95 AppendToken(Truncate(StripToken(...))))
            src_ds = _TruncateSource(
                src_ds, getattr(self.args, "max_source_positions", 1024) - 1,
                self.src_dict.eos())
        align_ds = None
        if getattr(self.args, "load_alignments", False):
            # load_langpair_dataset: {split}.align.{src}-{tgt} (:143-150)
            align_prefix = os.path.join(data_path,
                                        f"{split}.align.{src}-{tgt}")
            align_ds = load_indexed_dataset(align_prefix, None, impl)
            if align_ds is None:
                raise FileNotFoundError(
                    f"--load-alignments: {align_prefix} not found")
        ds = LanguagePairDataset(
            src_ds, src_ds.sizes, self.src_dict, tgt_ds,
            tgt_ds.sizes if tgt_ds is not None else None, self.tgt_dict,
            left_pad_source=getattr(self.args, "left_pad_source", True),
            left_pad_target=getattr(self.args, "left_pad_target", False),
            align=align_ds)
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
        max_pos = None
        if getattr(self.args, "skip_invalid_size_inputs_valid_test", False):
            max_pos = getattr(self.args, "max_source_positions", None)
        return EpochBatchIterator(
            self.datasets[split], max_tokens=max_tokens,
            max_sentences=max_sentences, seed=seed, num_shards=num_shards,
            shard_id=shard_id, shuffle=shuffle,
            required_batch_size_multiple=getattr(
                self.args, "required_batch_size_multiple", 1),
            max_positions=max_pos,
            data_rank=data_rank, data_world=data_world,
            num_workers=getattr(self.args, "num_workers", 0),
            num_batch_buckets=getattr(self.args, "num_batch_buckets", 0))

    # ------------------------------------------------------------------
    def build_model_config(self):
        from ..options import build_transformer_text_config
        return build_transformer_text_config(
            self.args, len(self.src_dict), len(self.tgt_dict))

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        import functools
        from ..train import losses as L
        arch = str(getattr(self.args, "arch", ""))
        if arch.startswith("lstm"):
            from ..models import lstm as lstm_m
            from ..options import build_lstm_config
            cfg = build_lstm_config(self.args, len(self.src_dict),
                                    len(self.tgt_dict))
            return cfg, functools.partial(lstm_m.init_lstm, cfg=cfg), \
                L.translation_loss
        if arch.startswith("fconv_self_att"):
            from ..models import fconv_self_att as fsa
            from ..options import build_fconv_self_att_config
            cfg = build_fconv_self_att_config(
                self.args, len(self.src_dict), len(self.tgt_dict))
            loss = L.fconv_self_att_loss
            return cfg, functools.partial(
                fsa.init_fconv_self_att, cfg=cfg), loss
        if arch.startswith("fconv"):
            from ..models import fconv as fconv_m
            from ..options import build_fconv_config
            cfg = build_fconv_config(self.args, len(self.src_dict),
                                     len(self.tgt_dict))
            return cfg, functools.partial(fconv_m.init_fconv, cfg=cfg), \
                L.translation_loss
        if arch.startswith(("lightconv", "dynamicconv")):
            from ..models import lightconv_model as lc
            from ..options import build_lightconv_config
            cfg = build_lightconv_config(self.args, len(self.src_dict),
                                         len(self.tgt_dict))
            return cfg, functools.partial(lc.init_lightconv, cfg=cfg), \
                L.translation_loss
        if arch.startswith("transformer_align") or arch.endswith("_align"):
            from ..models import transformer_align as ta
            a = self.args
            cfg = ta.TransformerAlignConfig(
                base=self.build_model_config(),
                alignment_heads=getattr(a, "alignment_heads", 1),
                alignment_layer=getattr(a, "alignment_layer", 4),
                full_context_alignment=getattr(
                    a, "full_context_alignment", False))
            return cfg, functools.partial(
                ta.init_transformer_align, cfg=cfg), \
                L.translation_alignment_loss
        from ..models import transformer_text as tt
        cfg = self.build_model_config()
        return cfg, functools.partial(tt.init_transformer, cfg=cfg), \
            L.translation_loss

    # ------------------------------------------------------------------
    def build_valid_bleu(self, model_cfg):
        """--eval-bleu (fairseq/tasks/translation.py:369-394): a per-batch
        generation hook for validation-time BLEU. Returns
        run(variables, host_batch) -> (hyps, refs) detokenized strings,
        or None when --eval-bleu is off. Transformer-family archs only
        (the reference's common eval-bleu regime)."""
        if not getattr(self.args, "eval_bleu", False):
            return None
        import json

        import jax
        import jax.numpy as jnp

        from ..data.encoders import build_tokenizer
        from ..generate.sequence_generator import BeamConfig, \
            beam_search_aux
        from ..models import transformer_text as tt
        if not isinstance(model_cfg, tt.TransformerTextConfig):
            raise ValueError("--eval-bleu supports the transformer "
                             "family archs")
        gen = json.loads(getattr(self.args, "eval_bleu_args", None)
                         or "{}")
        detok = build_tokenizer(
            {"tokenizer": getattr(self.args, "eval_bleu_detok", "space"),
             **json.loads(getattr(self.args, "eval_bleu_detok_args", None)
                          or "{}")})
        remove_bpe = getattr(self.args, "eval_bleu_remove_bpe", None)
        max_len = min(int(gen.get("max_len_a", 0)
                          * model_cfg.max_source_positions
                          + gen.get("max_len_b", 200)),
                      model_cfg.max_target_positions - 2)
        bs = BeamConfig(beam=int(gen.get("beam", 5)),
                        max_len=max(max_len, 2),
                        len_penalty=float(gen.get("lenpen", 1.0)),
                        min_len=int(gen.get("min_len", 1)))
        tgt_dict = self.tgt_dict

        @jax.jit
        def infer(gen_vars, src_tokens):
            enc = tt.encode(gen_vars, model_cfg, src_tokens,
                            deterministic=True)
            return beam_search_aux(
                [gen_vars], tt._aux_cfg(model_cfg), "decoder",
                [enc["encoder_out"]], [enc["encoder_padding_mask"]], bs,
                src_lengths=jnp.sum(src_tokens != 1, axis=1),
                rng=jax.random.PRNGKey(0))

        def run(variables, batch):
            import numpy as np
            gen_vars = tt.generation_variables(variables, model_cfg)
            out = infer(gen_vars, jnp.asarray(batch["src_tokens"]))
            tokens = np.asarray(out["tokens"])[:, 0]
            lens = np.asarray(out["lengths"])[:, 0]
            tgt = np.asarray(batch["target"])
            hyps, refs = [], []
            for i in range(tokens.shape[0]):
                if (tgt[i] != 1).sum() == 0:
                    continue  # batch-fill row
                hyp_ids = tokens[i, 1:1 + int(lens[i])]
                hyp = tgt_dict.string(hyp_ids, remove_bpe)
                # escape_unk=True on refs (the reference's
                # _inference_with_bleu decode)
                ref = tgt_dict.string(tgt[i], remove_bpe, escape_unk=True)
                if detok is not None:
                    hyp, ref = detok.decode(hyp), detok.decode(ref)
                hyps.append(hyp)
                refs.append(ref)
            return hyps, refs

        return run
