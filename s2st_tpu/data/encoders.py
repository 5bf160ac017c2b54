"""Tokenizer / BPE registry (parity: fairseq/data/encoders/ — moses/space
pre-tokenizers, sentencepiece/char BPE codecs).

The s2s_trans recipes tokenize offline (g2p / IPA phonemization before
get_feature_manifest); these are driven by the data config's
``pre_tokenizer`` / ``bpe_tokenizer`` blocks. The moses row wraps the SAME
sacremoses backend the reference wraps; sentencepiece is gated on the
library being installed (it is not baked into this image)."""

from __future__ import annotations

import re
from typing import Dict, List, Optional

TOKENIZER_REGISTRY = {}
BPE_REGISTRY = {}


def register_tokenizer(name):
    def wrap(cls):
        TOKENIZER_REGISTRY[name] = cls
        return cls
    return wrap


def register_bpe(name):
    def wrap(cls):
        BPE_REGISTRY[name] = cls
        return cls
    return wrap


def build_tokenizer(cfg: Optional[Dict]):
    if not cfg or cfg.get("tokenizer") in (None, "none"):
        return None
    name = cfg["tokenizer"]
    if name not in TOKENIZER_REGISTRY:
        raise KeyError(f"unknown tokenizer {name}")
    return TOKENIZER_REGISTRY[name](cfg)


def build_bpe(cfg: Optional[Dict]):
    if not cfg or cfg.get("bpe") in (None, "none"):
        return None
    name = cfg["bpe"]
    if name not in BPE_REGISTRY:
        raise KeyError(f"unknown bpe {name}")
    return BPE_REGISTRY[name](cfg)


@register_tokenizer("space")
class SpaceTokenizer:
    def __init__(self, cfg=None):
        self._re = re.compile(r"\s+")

    def encode(self, x: str) -> str:
        return self._re.sub(" ", x).strip()

    def decode(self, x: str) -> str:
        return x


@register_tokenizer("moses")
class MosesTokenizer:
    """fairseq/data/encoders/moses_tokenizer.py parity: wraps sacremoses
    MosesTokenizer/MosesDetokenizer with the same config surface
    (source_lang/target_lang, moses_no_dash_splits, moses_no_escape).
    Falls back to a documented lite approximation only if sacremoses is
    absent from the environment."""

    def __init__(self, cfg=None):
        cfg = cfg or {}
        self.cfg = cfg
        self.lang = cfg.get("source_lang", "en")
        try:
            from sacremoses import MosesDetokenizer as MD
            from sacremoses import MosesTokenizer as MT
            self.tok = MT(self.lang)
            self.detok = MD(cfg.get("target_lang", "en"))
        except ImportError:
            self.tok = self.detok = None

    def encode(self, x: str) -> str:
        if self.tok is not None:
            return self.tok.tokenize(
                x,
                aggressive_dash_splits=not self.cfg.get(
                    "moses_no_dash_splits", False),
                return_str=True,
                escape=not self.cfg.get("moses_no_escape", False))
        x = re.sub(r"([\.\,\!\?\;\:\(\)\"\[\]])", r" \1 ", x)
        return re.sub(r"\s+", " ", x).strip()

    def decode(self, x: str) -> str:
        if self.detok is not None:
            return self.detok.detokenize(x.split())
        x = re.sub(r"\s+([\.\,\!\?\;\:\)\]])", r"\1", x)
        x = re.sub(r"([\(\[])\s+", r"\1", x)
        return x


@register_bpe("characters")
class CharacterBpe:
    """Char-level codec (gen_vocab(..., "char") parity)."""

    def __init__(self, cfg=None):
        pass

    def encode(self, x: str) -> str:
        return " ".join(list(x.replace(" ", "▁")))

    def decode(self, x: str) -> str:
        return x.replace(" ", "").replace("▁", " ").strip()


@register_bpe("sentencepiece")
class SentencepieceBpe:
    def __init__(self, cfg):
        try:
            import sentencepiece as spm
        except ImportError as e:
            raise ImportError(
                "sentencepiece is not installed in this image; install it "
                "or use bpe=characters") from e
        self.sp = spm.SentencePieceProcessor()
        self.sp.Load(cfg["sentencepiece_model"])

    def encode(self, x: str) -> str:
        return " ".join(self.sp.EncodeAsPieces(x))

    def decode(self, x: str) -> str:
        return self.sp.DecodePieces(x.split())
