"""Tokenizer/BPE codec parity vs the reference's own code.

Oracles, strongest available per codec:
  * bytes / byte codec — the reference's fairseq/data/encoders/byte_utils.py
    imported standalone (it is dependency-free) and run on the same fuzz
    strings, including corrupt-utf-8 recovery.
  * gpt2 — BOTH the reference's gpt2_bpe_utils.Encoder (standalone import)
    AND huggingface tokenizers' ByteLevelBPETokenizer, all three on the
    same trained-in-test vocab/merges.
  * subword_nmt / fastbpe — hand-computed goldens (the subword_nmt library
    is not in this image) + learn→apply→decode roundtrips.
  * bert / hf_byte_bpe — the same libraries the reference wraps, driven
    through our registry with locally built vocabs (zero egress).
"""

import importlib.util
import json
import os
import random
import sys

import pytest

from s2st_tpu.data import byte_codec
from s2st_tpu.data.bpe_core import (GPT2Codec, SubwordNMTCodes, learn_codes,
                                    merge_by_rank)
from s2st_tpu.data.encoders import build_bpe, build_tokenizer

REF = "/root/reference/fairseq/data/encoders"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")


def _load_standalone(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FUZZ = [
    "",
    "hello world",
    "  leading and   inner\tand trailing  ",
    "Grüße, naïve café — déjà vu",
    "牛肉面 和 bánh mì",
    "emoji 🙂🚀 mixed ASCII",
    " nbsp and soft­hyphen",
    "tabs\tnewlines\nand\r\nCRLF",
    "ωμέγα ΩΜΕΓΑ русский ТЕКСТ",
]


# ---------------------------------------------------------------------------
# bytes
# ---------------------------------------------------------------------------

def test_byte_codec_matches_reference():
    ref = _load_standalone("ref_byte_utils", f"{REF}/byte_utils.py")
    for s in FUZZ:
        enc = byte_codec.byte_encode(s)
        assert enc == ref.byte_encode(s)
        assert byte_codec.byte_decode(enc) == ref.byte_decode(enc)
        assert byte_codec.smart_byte_decode(enc) == ref.smart_byte_decode(enc)


def test_smart_byte_decode_recovery_matches_reference():
    ref = _load_standalone("ref_byte_utils2", f"{REF}/byte_utils.py")
    r = random.Random(7)
    base = [byte_codec.byte_encode(s) for s in FUZZ if s]
    for enc in base:
        for _ in range(20):
            # corrupt: delete a random char, or take a random slice
            chars = list(enc)
            if len(chars) > 1 and r.random() < 0.5:
                del chars[r.randrange(len(chars))]
                bad = "".join(chars)
            else:
                i = r.randrange(len(chars))
                j = r.randrange(i, len(chars) + 1)
                bad = enc[i:j]
            assert byte_codec.smart_byte_decode(bad) == \
                ref.smart_byte_decode(bad), repr(bad)


def test_bytes_bpe_matches_reference_wrapper_semantics():
    """reference bytes.py:25-34: encode = byte_encode → escape SPACE →
    space-join chars; decode = strip spaces → unescape → smart decode."""
    ref = _load_standalone("ref_byte_utils3", f"{REF}/byte_utils.py")
    b = build_bpe({"bpe": "bytes"})
    for s in FUZZ:
        enc = b.encode(s)
        want = ref.SPACE.join(
            list(ref.byte_encode(s).replace(ref.SPACE, ref.SPACE_ESCAPE)))
        assert enc == want
        assert b.decode(enc) == ref.smart_byte_decode(
            enc.replace(ref.SPACE, "").replace(ref.SPACE_ESCAPE, ref.SPACE))


# ---------------------------------------------------------------------------
# gpt2
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gpt2_files(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    d = tmp_path_factory.mktemp("gpt2bpe")
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "it's the fox's den, isn't it? I'll say we'd 123 456",
        "hello world Hello World HELLO   spaced",
        "déjà vu naïve café, 牛肉 bánh mì",
    ] * 40
    cpath = d / "corpus.txt"
    cpath.write_text("\n".join(corpus), encoding="utf-8")
    tok = tokenizers.ByteLevelBPETokenizer(add_prefix_space=False)
    tok.train([str(cpath)], vocab_size=420, min_frequency=2,
              show_progress=False)
    tok.save_model(str(d))
    return str(d / "vocab.json"), str(d / "merges.txt"), corpus


def test_gpt2_codec_matches_reference_and_hf(gpt2_files):
    vocab_json, merges_txt, corpus = gpt2_files
    ref_mod = _load_standalone("ref_gpt2", f"{REF}/gpt2_bpe_utils.py")
    ref_enc = ref_mod.get_encoder(vocab_json, merges_txt)
    mine = GPT2Codec.from_files(vocab_json, merges_txt)

    from tokenizers import ByteLevelBPETokenizer
    hf = ByteLevelBPETokenizer(vocab_json, merges_txt,
                               add_prefix_space=False)

    cases = corpus[:4] + [
        "the fox",
        "it's 123",
        "  double  spaces  ",
        "HELLO world déjà",
        "fox.dog,fox?dog!",
    ]
    for s in cases:
        want = ref_enc.encode(s)
        got = mine.encode(s)
        assert got == want, s
        assert hf.encode(s).ids == want, s
        assert mine.decode(got) == ref_enc.decode(want) == s


def test_gpt2_registry_wrapper(gpt2_files):
    vocab_json, merges_txt, _ = gpt2_files
    b = build_bpe({"bpe": "gpt2", "gpt2_encoder_json": vocab_json,
                   "gpt2_vocab_bpe": merges_txt})
    s = "it's the fox"
    enc = b.encode(s)
    assert all(t.isdigit() for t in enc.split())
    assert b.decode(enc) == s
    # is_beginning_of_word mirrors gpt2_bpe.py:44-45
    first, rest = enc.split()[0], enc.split()[2]
    assert not b.is_beginning_of_word(first)
    assert b.is_beginning_of_word(rest)


def test_gpt2_requires_local_paths():
    with pytest.raises(ValueError, match="gpt2_encoder_json"):
        build_bpe({"bpe": "gpt2"})


# ---------------------------------------------------------------------------
# subword-nmt / fastbpe
# ---------------------------------------------------------------------------

def test_subword_nmt_hand_golden():
    # v0.2: "lower" → l o w e r</w>; merges: (l,o) → (lo,w) → (e,r</w>)
    codes = SubwordNMTCodes(
        ["#version: 0.2", "l o", "lo w", "e r</w>"], "@@")
    assert codes.segment_word("lower") == ["low", "er"]
    # "low" ends in w</w>, so (lo,w) cannot fire on the last symbol
    assert codes.segment_word("low") == ["lo", "w"]
    assert codes.encode_line("lower low") == "low@@ er lo@@ w"
    assert codes.decode_line("low@@ er lo@@ w") == "lower low"


def test_subword_nmt_end_of_word_is_position_sensitive():
    """(l,o) must NOT fire on the word 'lo': its symbols are l + o</w>,
    and o</w> ≠ o. This is the core subword-nmt v0.2 semantic."""
    codes = SubwordNMTCodes(["#version: 0.2", "l o"], "@@")
    assert codes.segment_word("lo") == ["l", "o"]
    assert codes.segment_word("lot") == ["lo", "t"]


def test_subword_nmt_v01_headerless():
    # headerless subword-nmt 0.1: </w> is its own symbol; 3-column lines
    # parse (count ignored)
    codes = SubwordNMTCodes(["l o 99", "lo w 42", "w </w> 7"], "@@")
    assert codes.segment_word("low") == ["low"]
    assert codes.segment_word("lo") == ["lo"]
    assert codes.encode_line("low lowx") == "low low@@ x"


def test_fastbpe_forces_fused_end_of_word(tmp_path):
    """fastBPE fuses </w> onto the last char (fastBPE.hpp kEndWord), so
    its headerless codes must be applied v0.2-style — NOT subword-nmt
    0.1 — or end-of-word merges like (e, r</w>) would never fire."""
    path = tmp_path / "fast.codes"
    path.write_text("l o 99\nlo w 42\ne r</w> 7\n")
    f = build_bpe({"bpe": "fastbpe", "bpe_codes": str(path)})
    assert f.encode("lower") == "low@@ er"
    # the same file through subword_nmt (headerless -> 0.1) differs:
    s = SubwordNMTCodes(path.read_text().splitlines(), "@@")
    assert s.encode_line("lower") == "low@@ e@@ r"


def test_subword_nmt_registry_and_learn_roundtrip(tmp_path):
    corpus = ["the fattest cat sat on the mat",
              "the fat cats patted the fat rat",
              "that fat cat was the fattest"] * 10
    lines = learn_codes(corpus, num_merges=30)
    assert lines[0] == "#version: 0.2"
    assert len(lines) > 5
    path = tmp_path / "codes.bpe"
    path.write_text("\n".join(lines), encoding="utf-8")
    b = build_bpe({"bpe": "subword_nmt", "bpe_codes": str(path)})
    for line in corpus[:3]:
        enc = b.encode(line)
        assert b.decode(enc) == line
        # frequent words should compress to a single symbol
    assert b.encode("the") == "the"

    f = build_bpe({"bpe": "fastbpe", "bpe_codes": str(path)})
    enc = f.encode(corpus[0])
    assert f.decode(enc) == corpus[0]


def test_merge_by_rank_merges_all_occurrences():
    out = merge_by_rank(("a", "b", "a", "b", "c"), {("a", "b"): 0})
    assert out == ("ab", "ab", "c")


# ---------------------------------------------------------------------------
# bert / hf_byte_bpe / nltk
# ---------------------------------------------------------------------------

def test_bert_bpe_local_vocab(tmp_path):
    pytest.importorskip("transformers")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "un", "##aff", "##able", "the", "fox", "runs", ",", "."]
    vfile = tmp_path / "vocab.txt"
    vfile.write_text("\n".join(vocab), encoding="utf-8")
    b = build_bpe({"bpe": "bert", "bpe_vocab_file": str(vfile)})
    enc = b.encode("the unaffable fox runs.")
    assert enc == "the un ##aff ##able fox runs ."
    assert b.decode(enc) == "the unaffable fox runs."
    assert b.is_beginning_of_word("un")
    assert not b.is_beginning_of_word("##aff")


def test_hf_byte_bpe_wrapper(gpt2_files):
    vocab_json, merges_txt, _ = gpt2_files
    b = build_bpe({"bpe": "hf_byte_bpe", "bpe_vocab": vocab_json,
                   "bpe_merges": merges_txt})
    s = "the quick brown fox"
    enc = b.encode(s)
    assert b.decode(enc) == s
    mine = GPT2Codec.from_files(vocab_json, merges_txt)
    assert [int(t) for t in enc.split()] == mine.encode(s)


def test_nltk_tokenizer_gated():
    nltk = pytest.importorskip("nltk")
    try:
        tok = build_tokenizer({"tokenizer": "nltk"})
    except LookupError:
        pytest.skip("nltk punkt data not installed (zero-egress image)")
    assert tok.encode("Hello, world.") == "Hello , world ."
    assert tok.decode("already tokenized") == "already tokenized"
