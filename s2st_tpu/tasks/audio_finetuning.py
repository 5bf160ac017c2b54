"""Audio fine-tuning task (parity: fairseq/tasks/audio_finetuning.py +
fairseq/data/add_target_dataset.py AddTargetDataset).

Drives CTC ASR fine-tuning of SSL encoders through the generic train CLI:
``--task audio_finetuning --arch wav2vec_ctc|hubert_ctc --criterion ctc``.

Data: the wav2vec manifest ({split}.tsv) plus transcript label files
``{split}.{label}`` (one line of space-separated units per manifest row —
letters with "|" word separators for the ltr recipes) and their dictionary
``dict.{label}.txt``. Unlike pretraining, audio is PADDED to the batch max
(AddTargetDataset rides the pad=True FileAudioDataset): transcripts are
whole-utterance, so cropping is not an option. Pad shapes snap UP on the
iterators' geometric grid to keep the compiled-program set O(log T).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..data.dictionary import Dictionary
from ..data.iterators import EpochBatchIterator, snap_len
from ..registry import register_task
from .audio_pretraining import RawAudioDataset

logger = logging.getLogger(__name__)


class FinetuneAudioDataset(RawAudioDataset):
    """FileAudioDataset(pad=True) + AddTargetDataset: padded waveforms +
    encoded transcript targets (add_target_dataset.py:40-80; labels are
    encoded with append_eos=False per audio_finetuning.py LabelEncoder)."""

    def __init__(self, manifest_path: str, label_path: str,
                 dictionary: Dictionary, sample_rate: int = 16000,
                 max_sample_size: int = 250000, min_sample_size: int = 1,
                 normalize: bool = False):
        super().__init__(manifest_path, sample_rate=sample_rate,
                         max_sample_size=max_sample_size,
                         min_sample_size=min_sample_size,
                         normalize=normalize)
        keep: List[int] = []
        with open(manifest_path) as f:
            f.readline()
            for i, line in enumerate(f):
                if int(line.strip().split("\t")[1]) >= min_sample_size:
                    keep.append(i)
        self.dictionary = dictionary
        with open(label_path) as f:
            lines = f.read().splitlines()
        self.labels = [np.asarray(
            dictionary.encode_line(lines[i], append_eos=False), np.int32)
            for i in keep]
        assert len(self.labels) == len(self.fnames)

    def __getitem__(self, index: int,
                    rng: Optional[np.random.RandomState] = None
                    ) -> Dict[str, Any]:
        item = super().__getitem__(index, rng)
        item["target"] = self.labels[index]
        return item

    def snap_kwargs(self, items: Sequence[Dict]) -> Dict[str, int]:
        return {
            "pad_batch": snap_len(len(items), 8),
            "target_size": snap_len(
                min(max(len(it["wav"]) for it in items),
                    self.max_sample_size), 256),
            "label_size": snap_len(
                max(len(it["target"]) for it in items), 8),
        }

    def collate(self, items: Sequence[Dict], pad_batch: Optional[int] = None,
                target_size: Optional[int] = None,
                label_size: Optional[int] = None, **_unused
                ) -> Dict[str, Any]:
        """Pad-to-max collate: padded rows carry length 0 and pad-only
        targets; the CTC criterion masks them out."""
        n_real = len(items)
        b = pad_batch or n_real
        sizes = [len(it["wav"]) for it in items]
        target = target_size if target_size is not None \
            else min(max(sizes), self.max_sample_size)
        u = label_size if label_size is not None \
            else max(len(it["target"]) for it in items)
        source = np.zeros((b, target), np.float32)
        lens = np.zeros((b,), np.int32)
        ids = np.zeros((b,), np.int32)
        labels = np.full((b, u), self.dictionary.pad_index, np.int32)
        tgt_lens = np.zeros((b,), np.int32)
        for i, it in enumerate(items):
            wav = it["wav"][:target]
            if self.normalize:
                m, v = wav.mean(), wav.var()
                wav = (wav - m) / np.sqrt(v + 1e-5)
            source[i, :len(wav)] = wav
            lens[i] = len(wav)
            ids[i] = it["id"]
            lab = it["target"][:u]
            labels[i, :len(lab)] = lab
            tgt_lens[i] = len(lab)
        return {"source": source, "source_lens": lens, "id": ids,
                "target": labels, "target_lengths": tgt_lens,
                "nsentences": np.int32(n_real),
                "ntokens": np.int32(int(tgt_lens.sum()))}


@register_task("audio_finetuning")
class AudioFinetuningTask:
    """fairseq/tasks/audio_finetuning.py:AudioFinetuningTask (the CTC
    branch; seq2seq fine-tune rides the s2t paths here)."""

    def __init__(self, args):
        self.args = args
        labels = getattr(args, "labels", None) or "ltr"
        if isinstance(labels, str):
            labels = labels.split(",")
        self.label = labels[0]
        label_dir = getattr(args, "label_dir", None) or args.data
        self.label_dir = label_dir
        self.target_dictionary = Dictionary.load(
            os.path.join(label_dir, f"dict.{self.label}.txt"))
        self.datasets: Dict[str, FinetuneAudioDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "AudioFinetuningTask":
        return cls(args)

    def load_dataset(self, split: str):
        manifest = os.path.join(self.args.data, f"{split}.tsv")
        self.datasets[split] = FinetuneAudioDataset(
            manifest,
            os.path.join(self.label_dir, f"{split}.{self.label}"),
            self.target_dictionary,
            sample_rate=getattr(self.args, "sample_rate", 16000),
            max_sample_size=getattr(self.args, "max_sample_size", 250000),
            min_sample_size=getattr(self.args, "min_sample_size", 1),
            normalize=getattr(self.args, "normalize", False))
        return self.datasets[split]

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
        from ..options import build_ctc_asr_config
        return build_ctc_asr_config(self.args, len(self.target_dictionary))

    def build_loss_config(self):
        from ..train.losses import CtcLossConfig
        d = self.target_dictionary
        sep = d.index("|") if "|" in d.indices else -1
        return CtcLossConfig(
            zero_infinity=getattr(self.args, "zero_infinity", True),
            sentence_avg=getattr(self.args, "sentence_avg", False),
            pad_idx=d.pad_index, eos_idx=d.eos_index, blank_idx=d.bos_index,
            sep_idx=sep)

    def build_model_and_loss(self):
        import functools
        from ..models.ctc_asr import init_ctc_asr, load_w2v_trunk
        from ..train.losses import ctc_loss
        cfg = self.build_model_config()
        w2v_path = getattr(self.args, "w2v_path", None)

        def init_fn(key):
            v = init_ctc_asr(key, cfg)
            if w2v_path:
                logger.info(f"warm-starting trunk from {w2v_path}")
                v = load_w2v_trunk(v, w2v_path, cfg)
            return v
        return cfg, init_fn, ctc_loss
