"""Audio pretraining task (parity: fairseq/tasks/audio_pretraining.py +
fairseq/data/audio/raw_audio_dataset.py FileAudioDataset).

Drives wav2vec 2.0 SSL pretraining through the generic train CLI:
``--task audio_pretraining --arch wav2vec2 --criterion wav2vec``.

Data: the wav2vec manifest format — first line is the corpus root, each
following line ``rel/path.wav<TAB>num_samples``. The pretraining regime
uses NO padding (raw_audio_dataset.py: pad=False for wav2vec2): every
batch is CROPPED to its shortest sample (capped at ``--max-sample-size``)
with per-item random offsets, so batches are dense (B, T) blocks.

TPU twist: the crop target is snapped DOWN to a coarse geometric grid
(mirror image of iterators.snap_len which snaps pad shapes UP) so the set
of compiled programs stays O(log T) — crops may only shrink, never pad,
keeping the no-padding invariant.
"""

from __future__ import annotations

import logging
import math
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..data.audio_utils import read_wav
from ..data.iterators import EpochBatchIterator, snap_len
from ..registry import register_task

logger = logging.getLogger(__name__)


def _snap_down(n: int, lo: int, ratio: float = 1.15) -> int:
    """Largest grid point <= n on the geometric grid {lo * ratio^k}."""
    if n <= lo:
        return int(n)
    k = int(math.floor(math.log(n / lo) / math.log(ratio)))
    return min(int(lo * ratio ** k), int(n))


class RawAudioDataset:
    """FileAudioDataset (raw_audio_dataset.py:23-190) duck-typed to the
    EpochBatchIterator protocol (src_frames/collate/snap_kwargs)."""

    supports_item_rng = True

    def __init__(self, manifest_path: str, sample_rate: int = 16000,
                 max_sample_size: int = 250000,
                 min_sample_size: int = 32000, normalize: bool = False):
        self.sample_rate = sample_rate
        self.max_sample_size = max_sample_size
        self.min_sample_size = min_sample_size
        self.normalize = normalize
        self.fnames: List[str] = []
        sizes: List[int] = []
        with open(manifest_path) as f:
            self.root_dir = f.readline().strip()
            for i, line in enumerate(f):
                items = line.strip().split("\t")
                assert len(items) == 2, f"bad manifest line {i}: {line}"
                sz = int(items[1])
                if sz < min_sample_size:
                    continue  # skipped like the reference's min filter
                self.fnames.append(items[0])
                sizes.append(sz)
        self.sizes = np.asarray(sizes, np.int64)
        logger.info(f"loaded {len(self.fnames)} samples from {manifest_path}")

    def __len__(self):
        return len(self.fnames)

    def src_frames(self, index: int) -> int:
        # batching cost = crop-capped length (what the batch will cost)
        return int(min(self.sizes[index], self.max_sample_size))

    def num_frames(self, index: int) -> int:
        return self.src_frames(index)

    def collate_meta(self, indices) -> Optional[tuple]:
        return None  # raw-audio path: row-shard collate loads the batch

    def __getitem__(self, index: int,
                    rng: Optional[np.random.RandomState] = None
                    ) -> Dict[str, Any]:
        path = os.path.join(self.root_dir, self.fnames[index])
        wav, sr = read_wav(path, normalization=True)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        assert sr == self.sample_rate, f"{path}: {sr} != {self.sample_rate}"
        # crop seed: collate() needs a per-item deterministic offset draw
        seed = int(rng.randint(0, 2 ** 31 - 1)) if rng is not None \
            else int(np.random.randint(0, 2 ** 31 - 1))
        return {"id": index, "wav": wav.astype(np.float32),
                "crop_seed": seed}

    # ------------------------------------------------------------------
    def snap_kwargs(self, items: Sequence[Dict]) -> Dict[str, int]:
        target = min(min(len(it["wav"]) for it in items),
                     self.max_sample_size)
        return {
            "pad_batch": snap_len(len(items), 8),
            "target_size": _snap_down(target, self.min_sample_size),
        }

    def collate(self, items: Sequence[Dict], pad_batch: Optional[int] = None,
                target_size: Optional[int] = None, **_unused
                ) -> Dict[str, Any]:
        """Crop-to-shortest collate (raw_audio_dataset.py collater:120-156,
        pad=False branch): random offset per item (crop_to_max_size).
        ``pad_batch`` rows beyond the real batch carry length 0 and are
        fully masked by the criterion."""
        n_real = len(items)
        b = pad_batch or n_real
        sizes = [len(it["wav"]) for it in items]
        target = target_size if target_size is not None \
            else min(min(sizes), self.max_sample_size)
        source = np.zeros((b, target), np.float32)
        lens = np.zeros((b,), np.int32)
        ids = np.zeros((b,), np.int32)
        for i, it in enumerate(items):
            wav, sz = it["wav"], len(it["wav"])
            if sz > target:
                r = np.random.RandomState(it["crop_seed"])
                start = r.randint(0, sz - target + 1)
                wav = wav[start:start + target]
            if self.normalize:
                # cfg.normalize: layer_norm over the (cropped) waveform
                # (raw_audio_dataset.py postprocess:96-101)
                m = wav.mean()
                v = wav.var()
                wav = (wav - m) / np.sqrt(v + 1e-5)
            source[i, :len(wav)] = wav
            lens[i] = len(wav)
            ids[i] = it["id"]
        return {"source": source, "source_lens": lens, "id": ids,
                "nsentences": np.int32(n_real),
                "ntokens": np.int32(int(lens.sum()))}


@register_task("audio_pretraining")
class AudioPretrainingTask:
    """fairseq/tasks/audio_pretraining.py:AudioPretrainingTask — the
    wav2vec2 pretraining entry (labels/fine-tune variants live in the
    downstream s2t/HuBERT paths here)."""

    def __init__(self, args):
        self.args = args
        self.datasets: Dict[str, RawAudioDataset] = {}

    @classmethod
    def setup_task(cls, args) -> "AudioPretrainingTask":
        return cls(args)

    def load_dataset(self, split: str):
        manifest = os.path.join(self.args.data, f"{split}.tsv")
        self.datasets[split] = RawAudioDataset(
            manifest,
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
        from ..options import build_wav2vec2_config
        return build_wav2vec2_config(self.args)

    def build_loss_config(self):
        from ..train.losses import Wav2VecLossConfig
        w = [float(x) for x in
             str(getattr(self.args, "loss_weights", "0.1,10")).split(",")]
        if len(w) == 1:
            w = w * 2  # criterion broadcasts a single weight (:96-99)
        return Wav2VecLossConfig(prob_ppl_weight=w[0],
                                 features_pen_weight=w[1])

    @staticmethod
    def _conv_spec(spec, default):
        if spec is None:
            return default
        from ..options import conv_spec_expr
        return tuple(tuple(t) for t in conv_spec_expr(str(spec)))

    def build_model_and_loss(self):
        import functools
        arch = str(getattr(self.args, "arch", "wav2vec2"))
        if arch == "wav2vec" or arch.startswith("wav2vec_v1"):
            from ..models import wav2vec_v1 as w1
            from ..train.losses import wav2vec_v1_loss
            a = self.args
            cfg = w1.Wav2VecV1Config(
                prediction_steps=getattr(a, "prediction_steps", 12),
                num_negatives=getattr(a, "num_negatives", 10),
                infonce=getattr(a, "infonce", False),
                balanced_classes=getattr(a, "balanced_classes", False),
                log_compression=getattr(a, "log_compression", False),
                conv_feature_layers=self._conv_spec(
                    getattr(a, "conv_feature_layers", None),
                    w1.Wav2VecV1Config.conv_feature_layers),
                conv_aggregator_layers=self._conv_spec(
                    getattr(a, "conv_aggregator_layers", None),
                    w1.Wav2VecV1Config.conv_aggregator_layers),
                vq_type=getattr(a, "vq_type", "none"),
                vq_vars=getattr(a, "vq_vars", 320),
                vq_groups=getattr(a, "vq_groups", 2),
                vq_dim=getattr(a, "vq_dim", 0),
                vq_gamma=getattr(a, "vq_gamma", 0.25),
                dropout=a.dropout)
            lw = str(getattr(a, "loss_weights", "1"))
            # "0.1,10" is the wav2vec2 default -> unset for v1 (the
            # reference criterion defaults to no explicit weights)
            w = 1.0 if lw == "0.1,10" else float(lw.split(",")[0] or 1.0)
            loss = functools.partial(wav2vec_v1_loss, penalty_weight=w)
            loss.mean_keys = wav2vec_v1_loss.mean_keys
            return cfg, functools.partial(w1.init_wav2vec_v1, cfg=cfg), \
                loss
        from ..models import wav2vec2 as w2v
        from ..train.losses import wav2vec_loss
        cfg = self.build_model_config()
        return cfg, functools.partial(w2v.init_wav2vec2, cfg=cfg), \
            wav2vec_loss
