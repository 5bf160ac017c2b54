"""speech_to_text and text_to_speech tasks.

Parity: fairseq/tasks/speech_to_text.py (SpeechToTextTask) and
fairseq/tasks/text_to_speech.py (TextToSpeechTask + FrmTextToSpeechTask)
over fairseq/data/audio/speech_to_text_dataset.py's manifest schema —
columns ``id, audio, n_frames, tgt_text [, speaker, src_text, src_lang,
tgt_lang, duration, pitch, energy]`` with a single ``vocab_filename``
dictionary, optional ``pre_tokenizer``/``bpe_tokenizer`` stages and
``prepend_tgt_lang_tag`` (<lang:xx> prefix, speech_to_text_dataset.py
LANG_TAG_TEMPLATE / :245-265).

Both tasks subclass S2STranslationTask: the manifest columns are remapped
into the S2ST dataset's schema (audio lands on the src side for S2T, the
tgt side for TTS; text rides ``tgt_text`` for S2T targets, ``src_text``
for TTS inputs), so every model/criterion the base task dispatches
(s2t_transformer/convtransformer/berard/xm; t2s/fastspeech2) runs
unchanged under the reference's task names.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..data.data_cfg import S2STDataConfig
from ..data.dictionary import Dictionary
from ..data.encoders import build_bpe, build_tokenizer
from ..data.s2st_dataset import S2STDataset, _load_tsv
from ..registry import register_task
from .s2s_translation import S2STranslationTask

logger = logging.getLogger(__name__)

LANG_TAG_TEMPLATE = "<lang:{}>"


def _tokenize(cfg: S2STDataConfig, texts: List[str]) -> List[str]:
    """pre_tokenizer -> bpe (SpeechToTextDataset.tokenize, :240-247)."""
    pre = build_tokenizer(cfg.pre_tokenizer)
    bpe = build_bpe(cfg.bpe_tokenizer)
    out = []
    for t in texts:
        if pre is not None:
            t = pre.encode(t)
        if bpe is not None:
            t = bpe.encode(t)
        out.append(t)
    return out


def _load_s2t_samples(root: str, cfg: S2STDataConfig, splits: str,
                      audio_side: str) -> List[Dict[str, str]]:
    """Read {split}.tsv rows in the S2T schema and remap onto the S2ST
    column names. ``audio_side``: "src" (S2T/ASR) or "tgt" (TTS)."""
    samples: List[Dict[str, str]] = []
    audio_root = Path(cfg.audio_root)
    for split in splits.split(","):
        tsv = Path(root) / f"{split}.tsv"
        if not tsv.is_file():
            raise FileNotFoundError(f"Dataset not found: {tsv}")
        for s in _load_tsv(tsv):
            audio = s.get("audio", "")
            if audio and not audio.startswith("/"):
                audio = (audio_root / audio).as_posix()
            row = {"id": s.get("id", str(len(samples))),
                   "speaker": s.get("speaker", ""),
                   "src_lang": s.get("src_lang", ""),
                   "tgt_lang": s.get("tgt_lang", "")}
            for k in ("duration", "pitch", "energy"):
                if s.get(k):
                    row[k] = s[k]
            text = s.get("tgt_text", "")
            if audio_side == "src":
                row.update(src_audio=audio, src_n_frames=s["n_frames"],
                           tgt_audio="", tgt_n_frames="1",
                           src_text=s.get("src_text", ""), tgt_text=text)
            else:
                row.update(tgt_audio=audio, tgt_n_frames=s["n_frames"],
                           src_audio="", src_n_frames="1",
                           src_text=text, tgt_text=s.get("src_text", ""))
            samples.append(row)
    return samples


class _S2TDataset(S2STDataset):
    """S2STDataset with the absent audio side replaced by a 1-frame zero
    block (never read by the s2t/t2s criteria)."""

    def __init__(self, *a, dummy_side: str = "tgt", **kw):
        super().__init__(*a, **kw)
        self.dummy_side = dummy_side
        feat = self.cfg.input_feat_per_channel
        dummy = _ZeroFeat(np.zeros(
            (max(self.n_frames_per_step, 1), feat), np.float32))
        # set once (thread-safe under the num_workers collate pool)
        if dummy_side == "tgt":
            self.tgt_audio_paths = [dummy] * len(self)
        else:
            self.src_audio_paths = [dummy] * len(self)

    def num_frames(self, index: int) -> int:
        # batching cost follows the REAL audio side (the reference sizes
        # S2T batches by n_frames, speech_to_text_dataset.py:346-350)
        return int(self.src_n_frames[index] if self.dummy_side == "tgt"
                   else self.tgt_n_frames[index])


class _ZeroFeat:
    """Sentinel path object: get_features_or_waveform sees a non-str and
    S2STDataset reads it through numpy directly."""

    def __init__(self, arr):
        self.arr = arr


# patch point: s2st_dataset.get_features_or_waveform handles str paths;
# intercept the sentinel before it reaches the real loader.
import s2st_tpu.data.s2st_dataset as _s2st_mod

_orig_gfow = _s2st_mod.get_features_or_waveform


def _gfow(path, *a, **kw):
    if isinstance(path, _ZeroFeat):
        return path.arr
    return _orig_gfow(path, *a, **kw)


_s2st_mod.get_features_or_waveform = _gfow


@register_task("speech_to_text")
class SpeechToTextTask(S2STranslationTask):
    """fairseq/tasks/speech_to_text.py:SpeechToTextTask — ASR/ST training
    and generation over the S2T manifest with one target dictionary."""

    audio_side = "src"

    @classmethod
    def setup_task(cls, args) -> "SpeechToTextTask":
        data_cfg = S2STDataConfig(Path(args.data) / args.config_yaml)
        data_cfg.set_use_hubert(getattr(args, "use_hubert", False))
        vocab = data_cfg.config.get("vocab_filename", "dict.txt")
        path = Path(args.data) / vocab
        if not path.is_file():
            raise FileNotFoundError(f"Dict not found: {path}")
        tgt_dict = Dictionary.load(str(path))
        logger.info(f"dictionary size ({vocab}): {len(tgt_dict):,}")
        return cls(args, data_cfg, tgt_dict, tgt_dict)

    def load_dataset(self, split: str):
        is_train = split.startswith("train")
        samples = _load_s2t_samples(self.args.data, self.data_cfg, split,
                                    self.audio_side)
        text_key = "tgt_text" if self.audio_side == "src" else "src_text"
        texts = _tokenize(self.data_cfg, [s[text_key] for s in samples])
        if self.data_cfg.prepend_tgt_lang_tag:
            d = self.tgt_dict if self.audio_side == "src" else self.src_dict
            for s, t in zip(samples, texts):
                tag = LANG_TAG_TEMPLATE.format(s.get("tgt_lang", ""))
                assert tag in d.indices, \
                    f"prepend_tgt_lang_tag: {tag} missing from the dict"
                s[text_key] = f"{tag} {t}"
        else:
            for s, t in zip(samples, texts):
                s[text_key] = t
        ds = _S2TDataset(
            split, is_train, self.data_cfg, samples, self.src_dict,
            self.tgt_dict, self.args.n_frames_per_step, self.speaker_to_id,
            dummy_side="tgt" if self.audio_side == "src" else "src")
        self.datasets[split] = ds
        return ds

    def build_model_and_loss(self):
        # the reference pairs this task with label_smoothed_cross_entropy
        # (= our s2t_loss over tgt_text); archs dispatch as in the base
        import functools
        from ..train import losses as L
        crit = getattr(self.args, "criterion", "")
        if crit in ("label_smoothed_cross_entropy", "cross_entropy", ""):
            arch = getattr(self.args, "arch", "s2t_transformer")
            if arch.startswith("s2t_transformer"):
                from ..models import s2t_transformer as s2t
                cfg = self._s2t_cfg()
                loss = functools.partial(L.s2t_loss, test_type="st")
                loss.mean_keys = L.s2t_loss.mean_keys
                return cfg, functools.partial(
                    s2t.init_s2t, cfg=cfg,
                    vocab_size=len(self.tgt_dict)), loss
        return super().build_model_and_loss()

    def _s2t_cfg(self):
        from ..models.s2t_transformer import S2TConfig
        base = self.build_model_config()
        a = self.args
        return S2TConfig(
            base=base,
            decoder_layers=a.decoder_layers,
            decoder_embed_dim=a.decoder_embed_dim)


@register_task("frm_text_to_speech")
@register_task("text_to_speech")
class TextToSpeechTask(SpeechToTextTask):
    """fairseq/tasks/text_to_speech.py:TextToSpeechTask — TTS training
    over the S2T manifest (audio is the target side); frm_text_to_speech
    is the frame-level variant (same data path; the frame-rate choice
    lives in the features, tasks/frm_text_to_speech.py)."""

    audio_side = "tgt"

    def build_model_and_loss(self):
        from ..train import losses as L  # noqa: F401 (arch dispatch below)
        arch = getattr(self.args, "arch", "tts_transformer")
        if arch in ("tts_transformer",):
            # reference tts_transformer == our shared t2s decoder
            self.args.arch = "t2s_transformer"
        return S2STranslationTask.build_model_and_loss(self)
