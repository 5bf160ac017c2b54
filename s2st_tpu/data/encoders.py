"""Tokenizer / BPE registry (parity: fairseq/data/encoders/ — the full
pre-tokenizer + BPE codec suite: space/moses/nltk tokenizers;
characters/bytes/sentencepiece/byte_bpe/subword_nmt/fastbpe/gpt2/bert/
hf_byte_bpe codecs).

The s2s_trans recipes tokenize offline (g2p / IPA phonemization before
get_feature_manifest); these are driven by the data config's
``pre_tokenizer`` / ``bpe_tokenizer`` blocks. Rows that wrap a library
wrap the SAME library as the reference (sacremoses, transformers,
tokenizers) and are gated on its presence; subword-nmt/fastbpe/gpt2
algorithms are implemented natively in ``bpe_core`` (the libraries the
reference shells out to are not in this image) and oracle-tested against
the reference's own gpt2_bpe_utils + huggingface tokenizers."""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from . import byte_codec
from .bpe_core import GPT2Codec, SubwordNMTCodes

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
        return x.replace(" ", "").replace("▁", " ")


@register_tokenizer("nltk")
class NltkTokenizer:
    """fairseq/data/encoders/nltk_tokenizer.py parity: word_tokenize on
    encode, identity decode. Gated on nltk + its punkt data (the data is
    a download; absent in a zero-egress image)."""

    def __init__(self, cfg=None):
        try:
            from nltk.tokenize import word_tokenize
        except ImportError as e:
            raise ImportError("nltk is not installed") from e
        try:
            word_tokenize("probe")
        except LookupError as e:
            raise LookupError(
                "nltk punkt tokenizer data is missing; run "
                "nltk.download('punkt_tab') on a networked machine") from e
        self._tok = word_tokenize

    def encode(self, x: str) -> str:
        return " ".join(self._tok(x))

    def decode(self, x: str) -> str:
        return x


@register_bpe("bytes")
class BytesBpe:
    """fairseq/data/encoders/bytes.py parity: utf-8 bytes as printable
    byte-chars, space-separated; decode recovers corrupt utf-8 via the
    max-valid-chars DP."""

    def __init__(self, cfg=None):
        pass

    @staticmethod
    def encode(x: str) -> str:
        bchars = byte_codec.byte_encode(x)
        return " ".join(bchars.replace(byte_codec.SPACE,
                                       byte_codec.SPACE_ESCAPE))

    @staticmethod
    def decode(x: str) -> str:
        joined = x.replace(byte_codec.SPACE, "").replace(
            byte_codec.SPACE_ESCAPE, byte_codec.SPACE)
        return byte_codec.smart_byte_decode(joined)


@register_bpe("byte_bpe")
class ByteBpe:
    """fairseq/data/encoders/byte_bpe.py parity: sentencepiece over the
    byte-char stream. Gated on the sentencepiece library."""

    def __init__(self, cfg):
        try:
            import sentencepiece as spm
        except ImportError as e:
            raise ImportError(
                "sentencepiece is required for bpe=byte_bpe") from e
        self.sp = spm.SentencePieceProcessor()
        self.sp.Load(cfg["sentencepiece_model_path"])

    def encode(self, x: str) -> str:
        return " ".join(self.sp.EncodeAsPieces(byte_codec.byte_encode(x)))

    @staticmethod
    def decode(x: str) -> str:
        return BytesBpe.decode(x)


@register_bpe("subword_nmt")
class SubwordNMTBpe:
    """fairseq/data/encoders/subword_nmt_bpe.py parity: apply a
    subword-nmt codes file (``--bpe-codes``), ``@@``-separated subwords.
    The apply algorithm is native (bpe_core.SubwordNMTCodes) — the
    subword_nmt library the reference wraps is not in this image."""

    def __init__(self, cfg):
        if not cfg.get("bpe_codes"):
            raise ValueError("bpe_codes is required for bpe=subword_nmt")
        self.sep = cfg.get("bpe_separator", "@@")
        self.codes = SubwordNMTCodes.from_file(cfg["bpe_codes"], self.sep)

    def encode(self, x: str) -> str:
        return self.codes.encode_line(x)

    def decode(self, x: str) -> str:
        return self.codes.decode_line(x)


@register_bpe("fastbpe")
class FastBpe:
    """fairseq/data/encoders/fastbpe.py parity: same codes application
    with fastBPE's headerless 3-column codes. fastBPE fuses </w> onto
    the last character (fastBPE.hpp kEndWord), i.e. v0.2-style word
    decomposition despite the missing header — the native fallback
    forces that. Uses the real fastBPE library when importable."""

    def __init__(self, cfg):
        if not cfg.get("bpe_codes"):
            raise ValueError("bpe_codes is required for bpe=fastbpe")
        self.sep = "@@"
        try:
            import fastBPE
            self._fast = fastBPE.fastBPE(cfg["bpe_codes"])
        except ImportError:
            self._fast = None
            self.codes = SubwordNMTCodes.from_file(cfg["bpe_codes"],
                                                   self.sep,
                                                   version=(0, 2))

    def encode(self, x: str) -> str:
        if self._fast is not None:
            return self._fast.apply([x])[0]
        return self.codes.encode_line(x)

    def decode(self, x: str) -> str:
        return (x + " ").replace(self.sep + " ", "").rstrip()


@register_bpe("gpt2")
class Gpt2Bpe:
    """fairseq/data/encoders/gpt2_bpe.py parity: byte-level BPE with the
    GPT-2 pre-tokenizer; encode → space-joined token ids. Native codec
    (bpe_core.GPT2Codec), oracle-tested vs the reference's
    gpt2_bpe_utils.Encoder. The OpenAI vocab files are downloads, so
    both paths must be given explicitly in a zero-egress image."""

    def __init__(self, cfg):
        if not (cfg.get("gpt2_encoder_json") and cfg.get("gpt2_vocab_bpe")):
            raise ValueError(
                "gpt2_encoder_json and gpt2_vocab_bpe are required for "
                "bpe=gpt2 (the reference's default URLs need network)")
        self.bpe = GPT2Codec.from_files(cfg["gpt2_encoder_json"],
                                        cfg["gpt2_vocab_bpe"])

    def encode(self, x: str) -> str:
        return " ".join(map(str, self.bpe.encode(x)))

    def decode(self, x: str) -> str:
        return self.bpe.decode(
            [int(t) if t not in {"<unk>", "<mask>"} else t
             for t in x.split()])

    def is_beginning_of_word(self, x: str) -> bool:
        return self.decode(x).startswith(" ")


@register_bpe("bert")
class BertBpe:
    """fairseq/data/encoders/hf_bert_bpe.py parity: wraps the SAME
    transformers BertTokenizer (wordpiece). ``bpe_vocab_file`` loads a
    local vocab (the pretrained names need network)."""

    def __init__(self, cfg):
        try:
            from transformers import BertTokenizer
        except ImportError as e:
            raise ImportError("transformers is required for bpe=bert") from e
        cased = cfg.get("bpe_cased", False)
        if cfg.get("bpe_vocab_file"):
            self.tok = BertTokenizer(cfg["bpe_vocab_file"],
                                     do_lower_case=not cased)
        else:
            name = "bert-base-cased" if cased else "bert-base-uncased"
            self.tok = BertTokenizer.from_pretrained(name)

    def encode(self, x: str) -> str:
        return " ".join(self.tok.tokenize(x))

    def decode(self, x: str) -> str:
        return self.tok.clean_up_tokenization(
            self.tok.convert_tokens_to_string(x.split(" ")))

    def is_beginning_of_word(self, x: str) -> bool:
        return not x.startswith("##")


@register_bpe("hf_byte_bpe")
class HfByteBpe:
    """fairseq/data/encoders/hf_byte_bpe.py parity: wraps the SAME
    huggingface tokenizers ByteLevelBPETokenizer (vocab.json +
    merges.txt)."""

    def __init__(self, cfg):
        try:
            from tokenizers import ByteLevelBPETokenizer
        except ImportError as e:
            raise ImportError("tokenizers is required for bpe=hf_byte_bpe") from e
        self.bpe = ByteLevelBPETokenizer(
            cfg["bpe_vocab"], cfg["bpe_merges"],
            add_prefix_space=cfg.get("bpe_add_prefix_space", False))

    def encode(self, x: str) -> str:
        return " ".join(map(str, self.bpe.encode(x).ids))

    def decode(self, x: str) -> str:
        return self.bpe.decode(
            [int(t) if t not in {"<unk>", "<mask>"} else t
             for t in x.split()])

    def is_beginning_of_word(self, x: str) -> bool:
        return self.decode(x).startswith(" ")


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
