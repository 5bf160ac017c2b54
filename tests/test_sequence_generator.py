"""Beam search over aux decoders: shape/score invariants, beam-1 == argmax
greedy, score monotonicity with beam size, CTC collapse — the analogue of
the reference's tests/test_sequence_generator.py (probability-table
decoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2st_tpu.generate.sequence_generator import (BeamConfig, beam_search_aux,
                                                  ctc_argmax_decode,
                                                  greedy_decode_aux)
from s2st_tpu.models import s2st_transformer as m
from tests.conftest import make_batch

EOS = 2


@pytest.fixture(scope="module")
def enc_state(tiny_cfg, tiny_variables):
    batch = make_batch(tiny_cfg, b=2, src_t=33, seed=21)
    enc = m.encode(tiny_variables, tiny_cfg, batch["src_speech"],
                   batch["src_speech_lens"])
    return enc


def test_beam_search_shapes_and_wellformed(tiny_cfg, tiny_variables, enc_state):
    cfg = BeamConfig(beam=3, max_len=12)
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"], cfg)
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    scores = np.asarray(out["scores"])
    assert tokens.shape[:2] == (2, 3)
    assert np.all(tokens[:, :, 0] == EOS)  # bos
    # scores sorted descending per batch row
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    # every hypothesis ends with EOS at position `length`
    for b in range(2):
        for k in range(3):
            n = int(lengths[b, k])
            assert 1 <= n <= cfg.max_len + 1
            assert tokens[b, k, n] == EOS, tokens[b, k]
    assert np.all(np.isfinite(scores))


def test_beam1_matches_stepwise_greedy(tiny_cfg, tiny_variables, enc_state):
    """beam=1 must produce the argmax continuation at every step."""
    out = greedy_decode_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                            enc_state["out_middle_layers"][0],
                            enc_state["encoder_padding_mask"], max_len=10)
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    # re-run the sequence through the full (teacher-forced) aux decoder and
    # check each emitted token is the argmax given the prefix
    b = tokens.shape[0]
    for row in range(b):
        n = int(lengths[row])
        prefix = tokens[row:row + 1, :n]  # includes bos-eos, excl. final eos
        logits = m.aux_decode(
            tiny_variables["params"]["aux_asr_decoder"], tiny_cfg,
            tiny_cfg.asr_decoder_embed_dim, tiny_cfg.asr_decoder_layers,
            jnp.asarray(prefix),
            enc_state["out_middle_layers"][0][row:row + 1],
            enc_state["encoder_padding_mask"][row:row + 1])
        lp = np.array(jax.nn.log_softmax(
            np.asarray(logits, np.float32), axis=-1), copy=True)
        lp[:, :, 1] = -1e9  # beam search masks PAD
        # the last position may be a forced EOS at max_len (fairseq
        # max-step finalization parity) — check argmax for the rest
        for t in range(n - 1):
            emitted = tokens[row, t + 1]
            assert emitted == int(np.argmax(lp[0, t])), (row, t)
        assert tokens[row, n] == EOS


def test_bigger_beam_never_worse(tiny_cfg, tiny_variables, enc_state):
    tap = enc_state["out_middle_layers"][0]
    pad = enc_state["encoder_padding_mask"]
    s1 = np.asarray(beam_search_aux(tiny_variables, tiny_cfg,
                                    "aux_asr_decoder", tap, pad,
                                    BeamConfig(beam=1, max_len=12))["scores"])
    s4 = np.asarray(beam_search_aux(tiny_variables, tiny_cfg,
                                    "aux_asr_decoder", tap, pad,
                                    BeamConfig(beam=4, max_len=12))["scores"])
    assert np.all(s4[:, 0] >= s1[:, 0] - 1e-4)


def test_st_decoder_beam(tiny_cfg, tiny_variables, enc_state):
    taps = enc_state["out_middle_layers"]
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_st_decoder",
                          taps[1], enc_state["encoder_padding_mask"],
                          BeamConfig(beam=2, max_len=8))
    assert np.asarray(out["tokens"]).shape[:2] == (2, 2)


def test_ctc_argmax_decode_collapses(tiny_cfg, tiny_variables, enc_state):
    out = ctc_argmax_decode(tiny_variables, tiny_cfg,
                            enc_state["out_middle_layers"][0],
                            enc_state["out_lengths"])
    assert len(out) == 2
    for seq in out:
        assert np.all(seq != 0)  # no blanks
        if len(seq) > 1:
            assert np.all(seq[1:] != seq[:-1])  # no repeats


def test_beam_search_jits(tiny_cfg, tiny_variables, enc_state):
    cfg = BeamConfig(beam=2, max_len=8)
    f = jax.jit(lambda v, tap, pad: beam_search_aux(
        v, tiny_cfg, "aux_asr_decoder", tap, pad, cfg))
    out = f(tiny_variables, enc_state["out_middle_layers"][0],
            enc_state["encoder_padding_mask"])
    assert np.asarray(out["tokens"]).shape[:2] == (2, 2)


def test_no_repeat_ngram_blocking(tiny_cfg, tiny_variables, enc_state):
    """With no_repeat_ngram_size=2, no generated hypothesis may contain a
    repeated bigram (NGramRepeatBlock parity)."""
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"],
                          BeamConfig(beam=3, max_len=20,
                                     no_repeat_ngram_size=2))
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    for b in range(tokens.shape[0]):
        for k in range(tokens.shape[1]):
            n = int(lengths[b, k])
            seq = tokens[b, k, 1:n]  # exclude bos; final token may be
            bigrams = set()
            for i in range(len(seq) - 1):
                bg = (int(seq[i]), int(seq[i + 1]))
                if bg[1] == 2:  # forced final EOS at max_len is exempt
                    continue
                assert bg not in bigrams, (b, k, seq)
                bigrams.add(bg)


def test_ensemble_beam_search(tiny_cfg, tiny_variables, enc_state, rng):
    """Ensemble of [model, model] must equal the single model exactly
    (log-mean of identical probs is identity); a 2-distinct-model ensemble
    runs and produces well-formed hypotheses."""
    tap = enc_state["out_middle_layers"][0]
    pad = enc_state["encoder_padding_mask"]
    cfg = BeamConfig(beam=2, max_len=10)
    single = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                             tap, pad, cfg)
    dup = beam_search_aux([tiny_variables, tiny_variables], tiny_cfg,
                          "aux_asr_decoder", [tap, tap], [pad, pad], cfg)
    np.testing.assert_array_equal(np.asarray(single["tokens"]),
                                  np.asarray(dup["tokens"]))
    np.testing.assert_allclose(np.asarray(single["scores"]),
                               np.asarray(dup["scores"]), atol=1e-5)

    from s2st_tpu.models.s2st_transformer import init_s2st
    other = init_s2st(jax.random.fold_in(rng, 123), tiny_cfg)
    mixed = beam_search_aux([tiny_variables, other], tiny_cfg,
                            "aux_asr_decoder", [tap, tap], [pad, pad], cfg)
    tokens = np.asarray(mixed["tokens"])
    lengths = np.asarray(mixed["lengths"])
    for b in range(tokens.shape[0]):
        for k in range(tokens.shape[1]):
            assert tokens[b, k, int(lengths[b, k])] == EOS


def test_ngram_ban_mask_paths_agree():
    """one-hot (small-vocab) and scatter (large-vocab) n-gram ban paths
    produce identical masks."""
    from s2st_tpu.generate.sequence_generator import _ngram_ban_mask
    r = np.random.RandomState(0)
    b, k, L = 2, 3, 16
    tokens = jnp.asarray(r.randint(2, 9, size=(b, k, L)).astype(np.int32))
    t = jnp.asarray(9)
    small = np.asarray(_ngram_ban_mask(tokens, t, 9, 2))
    # force the scatter path by padding vocab above the threshold; the
    # first 9 columns must match
    big = np.asarray(_ngram_ban_mask(tokens, t, 4096, 2))
    np.testing.assert_array_equal(small, big[:, :, :9])
