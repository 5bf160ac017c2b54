"""Tokenizer/BPE shims + the dummy_s2st benchmark task."""

import numpy as np
import pytest

from s2st_tpu.data.encoders import build_bpe, build_tokenizer


def test_space_tokenizer():
    t = build_tokenizer({"tokenizer": "space"})
    assert t.encode("  hola   mundo ") == "hola mundo"


def test_moses_roundtrip():
    t = build_tokenizer({"tokenizer": "moses"})
    enc = t.encode("Hello, world!")
    assert enc == "Hello , world !"
    assert t.decode(enc) == "Hello, world!"


def test_moses_is_real_sacremoses():
    """The moses row wraps the SAME backend the reference wraps
    (fairseq/data/encoders/moses_tokenizer.py -> sacremoses), so behavior
    matches by construction; spot-check its signature behaviors that the
    lite fallback can't reproduce."""
    pytest.importorskip("sacremoses")
    t = build_tokenizer({"tokenizer": "moses"})
    # HTML escaping of special entities (escape=True default)
    assert t.encode("AT&T") == "AT &amp; T"
    # aggressive dash splits insert @-@
    assert t.encode("foo-bar") == "foo @-@ bar"
    # both disabled via the reference's flag names
    t2 = build_tokenizer({"tokenizer": "moses", "moses_no_escape": True,
                          "moses_no_dash_splits": True})
    assert t2.encode("AT&T foo-bar") == "AT & T foo-bar"  # split, unescaped
    # detokenizer is moses-aware (apostrophes re-attach)
    assert t.decode("it 's fine .") == "it's fine."


def test_char_bpe_roundtrip():
    b = build_bpe({"bpe": "characters"})
    enc = b.encode("hola mundo")
    assert enc.split()[0] == "h"
    assert b.decode(enc) == "hola mundo"


def test_none_builders():
    assert build_tokenizer(None) is None
    assert build_bpe({"bpe": "none"}) is None


def test_dummy_s2st_task_trains(tmp_path):
    """--task dummy_s2st: full train step on synthetic data, no corpus."""
    from s2st_tpu.cli.train import main as train_main
    rc = train_main([
        "dummy", "--task", "dummy_s2st", "--save-dir", str(tmp_path / "c"),
        "--arch", "s2st_transformer",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8", "--input-feat-per-channel", "8",
        "--max-tokens", "4000", "--max-update", "2", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
        "--clip-norm", "1.0", "--required-batch-size-multiple", "1",
        "--max-source-positions", "256", "--max-target-positions", "256",
        "--dummy-items", "8", "--dummy-src-frames", "64",
        "--dummy-tgt-frames", "32", "--disable-validation",
    ])
    assert rc == 0
