"""HuBERT pretraining task (parity: fairseq/tasks/hubert_pretraining.py +
fairseq/data/audio/hubert_dataset.py HubertDataset).

Drives HuBERT SSL pretraining through the generic train CLI:
``--task hubert_pretraining --arch hubert --criterion hubert``.

Data: the wav2vec manifest format ({split}.tsv: root line then
``rel/path.wav<TAB>num_samples`` rows) plus per-stream frame-label files
``{label_dir}/{split}.{label}`` (one space-separated line of k-means unit
symbols per manifest row, hubert_dataset.py:73-83) and their dictionaries
``{label_dir}/dict.{label}.txt``.

Collate follows HubertDataset.collater (hubert_dataset.py:219-305),
pad_audio=False regime: every batch is CROPPED to its shortest sample
(capped at --max-sample-size) with per-item random offsets, and the label
streams are cropped in sync (frm_start = round(audio_start * label_rate /
sample_rate), frm_size = round(audio_size * s2f)).

TPU twists vs the reference:
- the crop target snaps DOWN to a coarse geometric grid so the compiled
  program set stays O(log T) (same policy as audio_pretraining);
- the reference shrinks frm_size when a label row runs short
  (``min(frm_size, *rem_size)``, :292) — a data-dependent shape. We keep
  the shape static by clamping the audio crop start left instead so the
  label window always fits, and pad (with the row's last unit) only in
  the degenerate labels-shorter-than-audio-at-offset-0 case.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..data.dictionary import Dictionary
from ..data.iterators import EpochBatchIterator, snap_len
from ..registry import register_task
from .audio_pretraining import RawAudioDataset, _snap_down

logger = logging.getLogger(__name__)


class HubertPretrainDataset(RawAudioDataset):
    """HubertDataset (hubert_dataset.py:110-330): raw audio + N aligned
    frame-label streams. Reuses RawAudioDataset's manifest/crop machinery;
    label lines are kept in memory (store_labels=True default, :137-139)
    and indexed by ORIGINAL manifest row so the min-size filter can't
    desynchronize audio from labels."""

    def __init__(self, manifest_path: str, label_paths: Sequence[str],
                 dictionaries: Sequence[Dictionary], label_rate: float,
                 sample_rate: int = 16000, max_sample_size: int = 250000,
                 min_sample_size: int = 32000, normalize: bool = False):
        # re-scan the manifest ourselves to record kept original rows
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
        assert len(keep) == len(self.fnames)
        self.label_rate = float(label_rate)
        self.dictionaries = list(dictionaries)
        self.labels: List[List[np.ndarray]] = []   # [stream][kept-row]
        for path, d in zip(label_paths, dictionaries):
            with open(path) as f:
                lines = f.read().splitlines()
            enc = [np.asarray(
                d.encode_line(lines[i], append_eos=False), np.int32)
                for i in keep]
            self.labels.append(enc)
        for s, enc in enumerate(self.labels):
            assert len(enc) == len(self.fnames), \
                f"label stream {s}: {len(enc)} rows != {len(self.fnames)}"

    @property
    def num_labels(self) -> int:
        return len(self.labels)

    def __getitem__(self, index: int,
                    rng: Optional[np.random.RandomState] = None
                    ) -> Dict[str, Any]:
        item = super().__getitem__(index, rng)
        item["labels"] = [enc[index] for enc in self.labels]
        return item

    def collate(self, items: Sequence[Dict], pad_batch: Optional[int] = None,
                target_size: Optional[int] = None, **_unused
                ) -> Dict[str, Any]:
        """collater (:219-305): crop-to-shortest audio + synced label crop
        (collater_frm_label :284-303). Padded batch rows carry length 0
        and pad-index labels; the criterion masks them out entirely."""
        n_real = len(items)
        b = pad_batch or n_real
        sizes = [len(it["wav"]) for it in items]
        target = target_size if target_size is not None \
            else min(min(sizes), self.max_sample_size)
        s2f = self.label_rate / self.sample_rate
        frm_size = int(round(target * s2f))
        source = np.zeros((b, target), np.float32)
        lens = np.zeros((b,), np.int32)
        ids = np.zeros((b,), np.int32)
        targets = [np.full((b, frm_size), d.pad_index, np.int32)
                   for d in self.dictionaries]
        for i, it in enumerate(items):
            wav, sz = it["wav"], len(it["wav"])
            start = 0
            if sz > target:
                r = np.random.RandomState(it["crop_seed"])
                start = int(r.randint(0, sz - target + 1))
                # clamp left so every label window fits at full frm_size
                # (static-shape stand-in for the reference's rem_size
                # shrink, :290-292)
                min_rem = min(len(lab) for lab in it["labels"])
                max_frm_start = max(min_rem - frm_size, 0)
                max_start = int(max_frm_start / s2f) if s2f > 0 else start
                start = min(start, max_start)
                wav = wav[start:start + target]
            if self.normalize:
                m, v = wav.mean(), wav.var()
                wav = (wav - m) / np.sqrt(v + 1e-5)
            source[i, :len(wav)] = wav
            lens[i] = len(wav)
            ids[i] = it["id"]
            frm_start = int(round(start * s2f))
            for s, lab in enumerate(it["labels"]):
                win = lab[frm_start:frm_start + frm_size]
                if len(win) < frm_size and len(lab):
                    logger.warning(
                        "label stream %d row %d short (%d < %d frames); "
                        "padding with last unit", s, it["id"], len(win),
                        frm_size)
                    win = np.concatenate(
                        [win, np.full(frm_size - len(win),
                                      lab[-1] if len(win) == 0 else win[-1],
                                      np.int32)])
                targets[s][i, :len(win)] = win
        return {"source": source, "source_lens": lens, "id": ids,
                "target_list": tuple(targets),
                "nsentences": np.int32(n_real),
                "ntokens": np.int32(int(lens.sum()))}


@register_task("hubert_pretraining")
class HubertPretrainingTask:
    """fairseq/tasks/hubert_pretraining.py:HubertPretrainingTask
    (pretrain branch; fine_tuning rides the s2t/HuBERT-encoder paths
    here)."""

    def __init__(self, args):
        self.args = args
        label_dir = getattr(args, "label_dir", None) or args.data
        labels = getattr(args, "labels", None) or ["km"]
        if isinstance(labels, str):
            labels = labels.split(",")
        self.labels = list(labels)
        self.label_dir = label_dir
        self.dictionaries = [
            Dictionary.load(os.path.join(label_dir, f"dict.{lbl}.txt"))
            for lbl in self.labels]
        self.datasets: Dict[str, HubertPretrainDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "HubertPretrainingTask":
        return cls(args)

    def load_dataset(self, split: str):
        manifest = os.path.join(self.args.data, f"{split}.tsv")
        self.datasets[split] = HubertPretrainDataset(
            manifest,
            [os.path.join(self.label_dir, f"{split}.{lbl}")
             for lbl in self.labels],
            self.dictionaries,
            label_rate=getattr(self.args, "label_rate", 50),
            sample_rate=getattr(self.args, "sample_rate", 16000),
            max_sample_size=getattr(self.args, "max_sample_size", 250000),
            min_sample_size=getattr(self.args, "min_sample_size", 32000),
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
        from ..options import build_hubert_pretrain_config
        return build_hubert_pretrain_config(
            self.args, tuple(len(d) for d in self.dictionaries))

    def build_loss_config(self):
        from ..train.losses import HubertLossConfig
        w = str(getattr(self.args, "loss_weights", "10") or "10")
        pen = float(w.split(",")[0])
        return HubertLossConfig(
            pred_masked_weight=getattr(self.args, "pred_masked_weight", 1.0),
            pred_nomask_weight=getattr(self.args, "pred_nomask_weight", 0.0),
            features_pen_weight=pen)

    def build_model_and_loss(self):
        import functools
        from ..models.hubert import init_hubert_pretrain
        from ..train.losses import hubert_loss
        cfg = self.build_model_config()
        return cfg, functools.partial(init_hubert_pretrain, cfg=cfg), \
            hubert_loss
