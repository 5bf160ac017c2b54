"""S2ST dataset: TSV manifests -> per-item features -> static-shape batches.

Parity: ``examples/s2s_trans/data/s2st_dataset.py`` —
- TSV columns id, src_audio, tgt_audio, src_n_frames, tgt_n_frames,
  src_text, tgt_text, speaker [, src_orig, tgt_text_orig] (:458-533);
- separate src/tgt transform chains (:91-96);
- target frame-packing for n-frames-per-step (:196, pack via
  SpeechToTextDataset.pack_frames);
- collate: length-descending order, zero-prepended shifted spectrogram
  ``prev_output_tokens`` (:392-395), eos-moved-to-front prev text tokens
  (:396-409), src/tgt text tensors and token counts (:427-455).

TPU-native departure: ``collate`` pads every tensor to caller-chosen static
shapes (bucketed by the batcher) so XLA compiles a small closed set of
programs instead of one per dynamic shape.
"""

from __future__ import annotations

import csv
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .audio_utils import get_features_or_waveform
from .data_cfg import S2STDataConfig
from .dictionary import Dictionary
from .feature_transforms import CompositeAudioFeatureTransform

logger = logging.getLogger(__name__)

PAD = 1


@dataclass
class S2STItem:
    index: int
    src_speech: np.ndarray          # (T, F) fbank (or None when use_hubert)
    tgt_speech: np.ndarray          # (Tt, F*r) packed log-mel
    src_text: np.ndarray            # (N,) int32 incl. eos
    tgt_text: np.ndarray            # (M,) int32 incl. eos
    src_orig: Optional[np.ndarray] = None   # raw waveform for HuBERT
    speaker_id: Optional[int] = None
    tgt_text_orig: Optional[str] = None
    # FastSpeech2 variance targets (reference TextToSpeechDataset extras:
    # per-source-token duration/pitch/energy from the manifest)
    duration: Optional[np.ndarray] = None   # (N,) int32
    pitch: Optional[np.ndarray] = None      # (N,) float32
    energy: Optional[np.ndarray] = None     # (N,) float32


def _load_tsv(path: Path) -> List[Dict[str, str]]:
    with open(path, encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t", quotechar=None,
                                doublequote=False, lineterminator="\n",
                                quoting=csv.QUOTE_NONE)
        return [dict(e) for e in reader]


def pack_frames(feature: np.ndarray, n_frames_per_step: int) -> np.ndarray:
    """(T, d) -> (T//n, n*d) (speech_to_text_dataset.py:234-239 parity)."""
    if n_frames_per_step == 1:
        return feature
    n_packed = feature.shape[0] // n_frames_per_step
    feature = feature[:n_packed * n_frames_per_step]
    return feature.reshape(n_packed, -1)


class S2STDataset:
    def __init__(self, split: str, is_train_split: bool, cfg: S2STDataConfig,
                 samples: List[Dict[str, str]], src_dict: Dictionary,
                 tgt_dict: Dictionary, n_frames_per_step: int = 1,
                 speaker_to_id: Optional[Dict[str, int]] = None):
        self.split = split
        self.is_train_split = is_train_split
        self.cfg = cfg
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.n_frames_per_step = n_frames_per_step
        self.speaker_to_id = speaker_to_id
        # temperature-resampling state (set by S2STDatasetCreator when the
        # train split names several corpora and sampling_alpha != 1.0 —
        # reference: s2st_dataset.py:577-586 over ResamplingDataset)
        self._resample = None
        self._set_samples(samples)

    def _set_samples(self, samples):
        self.samples = samples
        self.ids = [s["id"] for s in samples]
        self.src_audio_paths = [s["src_audio"] for s in samples]
        self.tgt_audio_paths = [s["tgt_audio"] for s in samples]
        self.src_n_frames = np.array([int(s["src_n_frames"]) for s in samples])
        self.tgt_n_frames = np.array([int(s["tgt_n_frames"]) for s in samples])
        self.src_texts = [s.get("src_text", "") for s in samples]
        self.tgt_texts = [s.get("tgt_text", "") for s in samples]
        self.speakers = [s.get("speaker", "") for s in samples]
        self.src_orig_paths = [s.get("src_orig") for s in samples]
        self.tgt_text_orig = [s.get("tgt_text_orig") for s in samples]
        # optional FastSpeech2 variance columns ("duration" space-separated
        # ints; "pitch"/"energy" space-separated floats or .npy paths —
        # fairseq/data/audio/text_to_speech_dataset.py manifest extras)
        self.durations = [s.get("duration") for s in samples] \
            if any(s.get("duration") for s in samples) else None
        self.pitches = [s.get("pitch") for s in samples] \
            if any(s.get("pitch") for s in samples) else None
        self.energies = [s.get("energy") for s in samples] \
            if any(s.get("energy") for s in samples) else None

        self.feature_transforms_src = CompositeAudioFeatureTransform.from_config_dict(
            self.cfg.get_feature_transforms_for_src(
                self.split, self.is_train_split), self.cfg.config)
        self.feature_transforms_tgt = CompositeAudioFeatureTransform.from_config_dict(
            self.cfg.get_feature_transforms_for_tgt(
                self.split, self.is_train_split), self.cfg.config)

    def __len__(self):
        return len(self.samples)

    # -- temperature-based multi-corpus resampling --------------------------
    @property
    def can_reuse_epoch_itr_across_epochs(self) -> bool:
        # resampled corpora change composition per epoch, so batch
        # formation must rerun (resampling_dataset.py:108-111 parity)
        return self._resample is None

    def enable_resampling(self, corpora, ratios, seed: int):
        """corpora: list of per-corpus sample lists; ratios: per-corpus
        size ratios from the temperature formula (arXiv:1907.05019)."""
        self._resample = {"corpora": corpora, "ratios": ratios, "seed": seed}
        self.set_epoch(1)

    def set_epoch(self, epoch: int):
        """Redraw the epoch's sample list. RNG seeding is bit-compatible
        with the reference ResamplingDataset.set_epoch (resampling_dataset
        .py:113-139: RandomState([42, seed, epoch]) + rng.choice with
        replace=(ratio >= 1.0)) so resampled epochs see the same corpus
        mixture as a fairseq run with the same seed."""
        if self._resample is None:
            return
        seed = self._resample["seed"]
        drawn = []
        for corpus, ratio in zip(self._resample["corpora"],
                                 self._resample["ratios"]):
            n = int(np.ceil(len(corpus) * ratio))
            rng = np.random.RandomState([42, seed % (2 ** 32), epoch])
            idx = rng.choice(len(corpus), n, replace=(ratio >= 1.0))
            drawn.extend(corpus[i] for i in idx)
        self._set_samples(drawn)

    def num_frames(self, index: int) -> int:
        return int(self.tgt_n_frames[index])

    def src_frames(self, index: int) -> int:
        return int(self.src_n_frames[index])

    def collate_meta(self, indices) -> Optional[tuple]:
        """Cheap global pad metadata — (max_src_t, max_tgt_t_packed,
        max_src_txt, max_tgt_txt, src_txt_ntokens, tgt_txt_ntokens) — from
        the manifest only, no feature IO. Lets each process of a multi-host
        run collate ONLY its own rows of a global batch to identical padded
        shapes (the JAX analogue of fairseq's per-rank ShardedIterator,
        iterators.py:446-459). None for the raw-audio/HuBERT input mode
        (waveform lengths are not in the manifest)."""
        if self.cfg.use_hubert:
            return None
        src_t = int(max(self.src_n_frames[i] for i in indices))
        tgt_t = int(max(int(self.tgt_n_frames[i]) // self.n_frames_per_step
                        for i in indices))
        # encode_line is whitespace tokenization + eos (dictionary.py)
        s_lens = [len(self.src_texts[i].split()) + 1 for i in indices]
        t_lens = [len(self.tgt_texts[i].split()) + 1 for i in indices]
        return (src_t, tgt_t, max(s_lens), max(t_lens),
                int(sum(s_lens)), int(sum(t_lens)))

    # __getitem__ accepts a private per-item RandomState so stochastic
    # transforms stay deterministic under parallel collate (iterators.py
    # derives it from (seed, epoch, index); advisor finding r2)
    supports_item_rng = True

    def __getitem__(self, index: int,
                    rng: Optional[np.random.RandomState] = None) -> S2STItem:
        src_speech = None
        src_orig = None
        if self.cfg.use_hubert:
            src_orig = get_features_or_waveform(
                self.src_orig_paths[index] or self.src_audio_paths[index],
                need_waveform=True)
            src_orig = np.asarray(src_orig, np.float32)
        else:
            src_speech = get_features_or_waveform(self.src_audio_paths[index])
            if self.feature_transforms_src is not None:
                src_speech = self.feature_transforms_src(src_speech, rng=rng)
            src_speech = np.asarray(src_speech, np.float32)

        tgt_speech = get_features_or_waveform(self.tgt_audio_paths[index])
        if self.feature_transforms_tgt is not None:
            tgt_speech = self.feature_transforms_tgt(tgt_speech, rng=rng)
        tgt_speech = pack_frames(np.asarray(tgt_speech, np.float32),
                                 self.n_frames_per_step)

        src_text = self.src_dict.encode_line(self.src_texts[index],
                                             append_eos=True)
        tgt_text = self.tgt_dict.encode_line(self.tgt_texts[index],
                                             append_eos=True)
        speaker_id = None
        if self.speaker_to_id is not None:
            speaker_id = self.speaker_to_id.get(self.speakers[index], 0)

        def _variance(col, dtype):
            if col is None or not col[index]:
                return None
            v = col[index]
            if v.endswith(".npy") or ":" in v:   # path or zip-slice
                return np.asarray(get_features_or_waveform(v), dtype)
            return np.asarray(v.split(), dtype)

        return S2STItem(index=index, src_speech=src_speech,
                        tgt_speech=tgt_speech, src_text=src_text,
                        tgt_text=tgt_text, src_orig=src_orig,
                        speaker_id=speaker_id,
                        tgt_text_orig=self.tgt_text_orig[index],
                        duration=_variance(self.durations, np.int32),
                        pitch=_variance(self.pitches, np.float32),
                        energy=_variance(self.energies, np.float32))

    # ------------------------------------------------------------------
    # collate to static shapes
    # ------------------------------------------------------------------

    def collate(self, items: Sequence[S2STItem],
                pad_batch: Optional[int] = None,
                pad_src_t: Optional[int] = None,
                pad_tgt_t: Optional[int] = None,
                pad_src_txt: Optional[int] = None,
                pad_tgt_txt: Optional[int] = None) -> Dict[str, Any]:
        """Pad to the given static shapes (defaults: batch maxima).

        Padding rows beyond the real batch get length 0 (fully masked);
        downstream losses are exactly invariant to them.
        """
        n_real = len(items)
        b = pad_batch or n_real
        # HuBERT path: source is the raw waveform (collater_audio parity
        # :293); same key names, 2-D (B, L) instead of 3-D (B, T, F).
        use_audio = items[0].src_speech is None

        def src_arr(it):
            return it.src_orig if use_audio else it.src_speech

        src_t = pad_src_t or max(src_arr(it).shape[0] for it in items)
        tgt_t = pad_tgt_t or max(it.tgt_speech.shape[0] for it in items)
        src_n = pad_src_txt or max(len(it.src_text) for it in items)
        tgt_n = pad_tgt_txt or max(len(it.tgt_text) for it in items)
        out_dim = items[0].tgt_speech.shape[1]

        # length-descending order (collater parity :333-337)
        order = np.argsort([-src_arr(it).shape[0] for it in items],
                           kind="stable")
        items = [items[i] for i in order]

        if use_audio:
            src_speech = np.zeros((b, src_t), np.float32)
        else:
            feat_dim = items[0].src_speech.shape[1]
            src_speech = np.zeros((b, src_t, feat_dim), np.float32)
        src_speech_lens = np.zeros((b,), np.int32)
        tgt_speech = np.zeros((b, tgt_t, out_dim), np.float32)
        target_lengths = np.zeros((b,), np.int32)
        prev_output = np.zeros((b, tgt_t, out_dim), np.float32)
        src_text = np.full((b, src_n), PAD, np.int32)
        tgt_text = np.full((b, tgt_n), PAD, np.int32)
        prev_src_text = np.full((b, src_n), PAD, np.int32)
        prev_tgt_text = np.full((b, tgt_n), PAD, np.int32)
        src_text_len = np.zeros((b,), np.int32)
        tgt_text_len = np.zeros((b,), np.int32)
        speaker = np.zeros((b,), np.int32)
        ids = np.full((b,), -1, np.int64)

        for i, it in enumerate(items):
            ts, tt = src_arr(it).shape[0], it.tgt_speech.shape[0]
            ns, nt = len(it.src_text), len(it.tgt_text)
            src_speech[i, :min(ts, src_t)] = src_arr(it)[:src_t]
            src_speech_lens[i] = min(ts, src_t)
            tgt_speech[i, :tt] = it.tgt_speech[:tgt_t]
            target_lengths[i] = min(tt, tgt_t)
            # zero BOS frame + shifted target (:392-395)
            prev_output[i, 1:min(tt, tgt_t)] = it.tgt_speech[:min(tt, tgt_t) - 1]
            src_text[i, :ns] = it.src_text[:src_n]
            tgt_text[i, :nt] = it.tgt_text[:tgt_n]
            src_text_len[i] = min(ns, src_n)
            tgt_text_len[i] = min(nt, tgt_n)
            # eos-to-front shift (:396-409)
            prev_src_text[i, 0] = it.src_text[-1]
            prev_src_text[i, 1:ns] = it.src_text[:src_n - 1][:ns - 1]
            prev_tgt_text[i, 0] = it.tgt_text[-1]
            prev_tgt_text[i, 1:nt] = it.tgt_text[:tgt_n - 1][:nt - 1]
            if it.speaker_id is not None:
                speaker[i] = it.speaker_id
            ids[i] = it.index

        batch = {
            "id": ids,
            "nsentences": n_real,
            "ntokens": int(target_lengths.sum()),
            "src_txt_ntokens": int(src_text_len.sum()),
            "tgt_txt_ntokens": int(tgt_text_len.sum()),
            "src_speech": src_speech,
            "src_speech_lens": src_speech_lens,
            "prev_output_tokens": prev_output,
            "prev_src_text_tokens": prev_src_text,
            "prev_tgt_text_tokens": prev_tgt_text,
            "tgt_speech": tgt_speech,
            "target_lengths": target_lengths,
            "src_text": src_text,
            "src_text_len": src_text_len,
            "tgt_text": tgt_text,
            "tgt_text_len": tgt_text_len,
            "target_texts": [self.tgt_dict.string(it.tgt_text) for it in items],
            "tgt_text_orig": [it.tgt_text_orig for it in items],
        }
        if self.speaker_to_id is not None:
            batch["speaker"] = speaker
        if items[0].duration is not None:
            # FastSpeech2 variance targets, padded per source token
            # (reference TextToSpeechDataset collater extras). eos/pad
            # positions get 0 (masked by src_text_len downstream).
            durations = np.zeros((b, src_n), np.int32)
            pitches = np.zeros((b, src_n), np.float32)
            energies = np.zeros((b, src_n), np.float32)
            for i, it in enumerate(items):
                n = min(len(it.duration), src_n)
                durations[i, :n] = it.duration[:n]
                if it.pitch is not None:
                    pitches[i, :len(it.pitch[:src_n])] = it.pitch[:src_n]
                if it.energy is not None:
                    energies[i, :len(it.energy[:src_n])] = it.energy[:src_n]
            batch["durations"] = durations
            batch["pitches"] = pitches
            batch["energies"] = energies
        return batch


class S2STDatasetCreator:
    @classmethod
    def from_tsv(cls, root: str, cfg: S2STDataConfig, splits: str,
                 src_dict: Dictionary, tgt_dict: Dictionary,
                 is_train_split: bool, n_frames_per_step: int = 1,
                 speaker_to_id: Optional[Dict[str, int]] = None,
                 seed: int = 1) -> S2STDataset:
        datasets = []
        for split in splits.split(","):
            tsv_path = Path(root) / f"{split}.tsv"
            if not tsv_path.is_file():
                raise FileNotFoundError(f"Dataset not found: {tsv_path}")
            samples = _load_tsv(tsv_path)
            # resolve audio paths against audio_root
            audio_root = Path(cfg.audio_root)
            for s in samples:
                for k in ("src_audio", "tgt_audio", "src_orig"):
                    if k in s and s[k] and not s[k].startswith("/"):
                        s[k] = (audio_root / s[k]).as_posix()
            datasets.append(samples)
        all_samples = [s for ds in datasets for s in ds]
        ds = S2STDataset(splits, is_train_split, cfg, all_samples,
                         src_dict, tgt_dict, n_frames_per_step,
                         speaker_to_id)
        if is_train_split and len(datasets) > 1 and cfg.sampling_alpha != 1.0:
            # temperature-based corpus sampling: the reference
            # get_size_ratios (speech_to_text_dataset.py:422-452) AGGREGATES
            # frame counts per lang pair before applying alpha, so several
            # TSVs sharing a pair get one pooled ratio (ADVICE r4); TSVs
            # without src_lang/tgt_lang columns fall back to per-TSV groups
            def _pair(d, k):
                s = d[0] if d else {}
                return (s.get("src_lang", ""), s.get("tgt_lang", "")) \
                    if ("src_lang" in s or "tgt_lang" in s) else ("", f"#{k}")
            pairs = [_pair(d, k) for k, d in enumerate(datasets)]
            sizes = np.array([sum(int(s["src_n_frames"]) for s in d)
                              for d in datasets], np.float64)
            lp_sz: Dict = {}
            for p, sz in zip(pairs, sizes):
                lp_sz[p] = lp_sz.get(p, 0.0) + sz
            sz_sum = sum(lp_sz.values())
            tgt_prob = {p: (v / sz_sum) ** cfg.sampling_alpha
                        for p, v in lp_sz.items()}
            prob_sum = sum(tgt_prob.values())
            ratios = np.array([
                (tgt_prob[p] / prob_sum) * sz_sum / lp_sz[p]
                for p in pairs], np.float64)
            logger = __import__("logging").getLogger(__name__)
            logger.info("temperature resampling (alpha="
                        f"{cfg.sampling_alpha}): ratios="
                        f"{[round(float(r), 3) for r in ratios]}")
            ds.enable_resampling(datasets, [float(r) for r in ratios],
                                 seed=seed)
        return ds
