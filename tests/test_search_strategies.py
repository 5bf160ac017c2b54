"""Search strategies beyond plain beam (fairseq/search.py:103-814 parity):
Sampling (top-k/top-p), DiverseBeamSearch, DiverseSiblingsSearch, per-
sentence length constraints, forced prefix tokens, and the SequenceScorer.

The step functions are verified against brute-force numpy oracles on random
probability tables (the analogue of the reference's handcrafted-probability
decoder tests, /root/reference/tests/utils.py:60-160); the end-to-end
beam_search_aux paths run on the tiny model fixture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2st_tpu.generate.sequence_generator import (
    BeamConfig, NEG_INF, _step_beam, _step_diverse_beam,
    _step_diverse_siblings, _step_sampling, beam_search_aux,
    score_sequences)
from s2st_tpu.models import s2st_transformer as m
from tests.conftest import make_batch

PAD, EOS = 1, 2


@pytest.fixture(scope="module")
def enc_state(tiny_cfg, tiny_variables):
    batch = make_batch(tiny_cfg, b=2, src_t=33, seed=21)
    enc = m.encode(tiny_variables, tiny_cfg, batch["src_speech"],
                   batch["src_speech_lens"])
    return enc


def _rand_lprobs(b, k, v, seed=0):
    r = np.random.RandomState(seed)
    x = r.randn(b, k, v).astype(np.float32)
    return jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))


# ---------------------------------------------------------------------------
# step-function oracles
# ---------------------------------------------------------------------------

def test_step_beam_matches_numpy_topk():
    b, k, v = 2, 3, 11
    lp = _rand_lprobs(b, k, v, 1)
    alive = jnp.asarray(np.random.RandomState(2).randn(b, k).astype(np.float32))
    s, tok, beam = _step_beam(jnp.int32(3), lp, alive, k)
    cand = np.asarray(alive)[:, :, None] + np.asarray(lp)
    flat = cand.reshape(b, -1)
    order = np.argsort(-flat, axis=1)[:, :2 * k]
    np.testing.assert_allclose(np.asarray(s),
                               np.take_along_axis(flat, order, 1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(beam), order // v)
    np.testing.assert_array_equal(np.asarray(tok), order % v)


def test_sampling_topk_restricts_support_and_scores():
    b, k, v = 3, 4, 23
    topk = 5
    lp = _rand_lprobs(b, k, v, 3)
    alive = jnp.zeros((b, k), jnp.float32)
    rng = jax.random.PRNGKey(0)
    s, tok, beam = _step_sampling(jnp.int32(2), lp, alive, k, rng, topk, -1.0)
    s, tok, beam = map(np.asarray, (s, tok, beam))
    lp_np = np.asarray(lp)
    # first K entries are real candidates, rest padding at NEG_INF
    assert (s[:, k:] <= NEG_INF / 2).all()
    for bi in range(b):
        for ki in range(k):
            t = tok[bi, ki]
            src = beam[bi, ki]
            assert src == ki  # t>0: each beam continues itself
            kth = np.sort(lp_np[bi, src])[-topk]
            assert lp_np[bi, src, t] >= kth  # sampled inside the top-k set
            # returned score is the ORIGINAL lprob (+ cumulative 0)
            np.testing.assert_allclose(s[bi, ki], lp_np[bi, src, t],
                                       rtol=1e-5)


def test_sampling_step0_draws_from_beam0():
    b, k, v = 2, 4, 13
    lp = _rand_lprobs(b, k, v, 4)
    alive = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1),
                                 jnp.float32)[None], (b, 1))
    s, tok, beam = _step_sampling(jnp.int32(0), lp, alive, k,
                                  jax.random.PRNGKey(1), -1, -1.0)
    assert (np.asarray(beam)[:, :k] == 0).all()
    lp_np = np.asarray(lp)
    for bi in range(b):
        for ki in range(k):
            np.testing.assert_allclose(np.asarray(s)[bi, ki],
                                       lp_np[bi, 0, np.asarray(tok)[bi, ki]],
                                       rtol=1e-5)


def test_sampling_topp_support():
    b, k, v = 2, 3, 17
    topp = 0.6
    lp = _rand_lprobs(b, k, v, 5)
    alive = jnp.zeros((b, k), jnp.float32)
    s, tok, beam = _step_sampling(jnp.int32(1), lp, alive, k,
                                  jax.random.PRNGKey(2), -1, topp)
    lp_np = np.asarray(lp)
    for bi in range(b):
        for ki in range(k):
            t = int(np.asarray(tok)[bi, ki])
            # the sampled token must be in the smallest nucleus set:
            # mass of tokens strictly more likely than it is < topp
            p = np.exp(lp_np[bi, ki])
            mass_before = p[p > p[t]].sum()
            assert mass_before < topp + 1e-6


def test_diverse_beam_penalizes_repeats():
    """Group 1 must avoid the token group 0 already chose when scores tie."""
    b, k, v = 1, 2, 6
    # identical peaked distributions for both beams
    row = np.full((v,), -10.0, np.float32)
    row[4] = -0.1
    row[5] = -0.2
    lp = jnp.asarray(np.tile(row, (b, k, 1)))
    alive = jnp.zeros((b, k), jnp.float32)
    s, tok, beam = _step_diverse_beam(jnp.int32(1), lp, alive, k,
                                      num_groups=2, strength=10.0)
    tok = np.asarray(tok).reshape(-1)
    # candidates are interleaved (c0_g0, c0_g1, c1_g0, c1_g1): group 0
    # picks 4 then 5 and both enter the diversity counts (fairseq
    # scatter_adds ALL the group's candidates); group 1's picks (odd
    # positions) must avoid both
    assert tok[0] == 4 and tok[2] == 5
    assert tok[1] not in (4, 5) and tok[3] not in (4, 5)


def test_diverse_siblings_matches_oracle():
    b, k, v = 2, 3, 9
    rate = 0.3
    lp = _rand_lprobs(b, k, v, 6)
    alive = jnp.asarray(np.random.RandomState(7).randn(b, k).astype(np.float32))
    s, tok, beam = _step_diverse_siblings(jnp.int32(2), lp, alive, k, rate)
    s, tok, beam = map(np.asarray, (s, tok, beam))
    # oracle (search.py:744-814): per-beam top-2K over vocab with rank
    # penalty, then global top-2K
    cand = np.asarray(alive)[:, :, None] + np.asarray(lp)
    k2 = 2 * k
    exp_scores = np.zeros((b, k2))
    for bi in range(b):
        pool = []
        for ki in range(k):
            idx = np.argsort(-cand[bi, ki])[:k2]
            for r_, t in enumerate(idx):
                pool.append((cand[bi, ki, t] - rate * (r_ + 1), t, ki))
        pool.sort(key=lambda x: -x[0])
        for j in range(k2):
            exp_scores[bi, j] = pool[j][0]
    np.testing.assert_allclose(s, exp_scores, rtol=1e-5)


def test_diverse_siblings_zero_rate_is_beam():
    b, k, v = 2, 3, 8
    lp = _rand_lprobs(b, k, v, 8)
    alive = jnp.asarray(np.random.RandomState(9).randn(b, k).astype(np.float32))
    s0, t0, b0 = _step_beam(jnp.int32(4), lp, alive, k)
    s1, t1, b1 = _step_diverse_siblings(jnp.int32(4), lp, alive, k, 0.0)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


# ---------------------------------------------------------------------------
# end-to-end on the tiny model
# ---------------------------------------------------------------------------

def test_sampling_end_to_end_wellformed(tiny_cfg, tiny_variables, enc_state):
    cfg = BeamConfig(beam=3, max_len=10, strategy="sampling", sampling_topk=8)
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"], cfg,
                          rng=jax.random.PRNGKey(3))
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    assert tokens.shape[:2] == (2, 3)
    assert (lengths >= 1).all() and (lengths <= 11).all()
    # every finished hypothesis ends with EOS at position `length`
    for bi in range(tokens.shape[0]):
        n = int(lengths[bi, 0])
        assert tokens[bi, 0, n] == EOS


def test_sampling_seeds_differ(tiny_cfg, tiny_variables, enc_state):
    cfg = BeamConfig(beam=2, max_len=10, strategy="sampling")
    outs = []
    for seed in (0, 1):
        out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                              enc_state["out_middle_layers"][0],
                              enc_state["encoder_padding_mask"], cfg,
                              rng=jax.random.PRNGKey(seed))
        outs.append(np.asarray(out["tokens"]))
    assert not np.array_equal(outs[0], outs[1])


def test_diverse_beam_end_to_end(tiny_cfg, tiny_variables, enc_state):
    cfg = BeamConfig(beam=4, max_len=10, strategy="diverse_beam",
                     diversity_num_groups=2, diversity_strength=0.8)
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"], cfg)
    assert np.asarray(out["tokens"]).shape[:2] == (2, 4)
    s = np.asarray(out["scores"])
    assert np.isfinite(s[:, 0]).all()


def test_prefix_tokens_are_forced(tiny_cfg, tiny_variables, enc_state):
    prefix = jnp.asarray([[5, 6], [7, 8]], jnp.int32)
    cfg = BeamConfig(beam=3, max_len=12)
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"], cfg,
                          prefix_tokens=prefix)
    tokens = np.asarray(out["tokens"])
    # position 0 is the bos EOS; the forced prefix follows for every beam
    np.testing.assert_array_equal(tokens[0, :, 1:3],
                                  np.tile([5, 6], (3, 1)))
    np.testing.assert_array_equal(tokens[1, :, 1:3],
                                  np.tile([7, 8], (3, 1)))


def test_length_constrained_bounds(tiny_cfg, tiny_variables, enc_state):
    cfg = BeamConfig(beam=2, max_len=16, min_len_a=0.0, min_len_b=4.0,
                     max_len_a=0.0, max_len_b=6.0)
    src_lens = jnp.asarray([33, 33], jnp.int32)
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"], cfg,
                          src_lengths=src_lens)
    lengths = np.asarray(out["lengths"])
    # min_len=4 tokens before EOS -> total >= 5; forced EOS at step >= 6
    assert (lengths >= 5).all()
    assert (lengths <= 8).all()


def test_score_sequences_oracle(tiny_cfg, tiny_variables, enc_state):
    """positional_scores must equal the teacher-forced log-softmax gather."""
    r = np.random.RandomState(11)
    b, tt = 2, 6
    toks = r.randint(4, tiny_cfg.src_vocab_size, size=(b, tt)).astype(np.int32)
    lens = np.asarray([6, 4], np.int32)
    toks[0, 5] = EOS
    toks[1, 3] = EOS
    toks[1, 4:] = PAD
    tap = enc_state["out_middle_layers"][0]
    pad = enc_state["encoder_padding_mask"]
    out = score_sequences(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          tap, pad, jnp.asarray(toks), jnp.asarray(lens))
    pos = np.asarray(out["positional_scores"])
    # oracle: aux_decode over eos-front prev tokens
    prev = np.where(toks == PAD, PAD,
                    np.concatenate([np.full((b, 1), EOS, np.int32),
                                    toks[:, :-1]], axis=1))
    logits = m.aux_decode(tiny_variables["params"]["aux_asr_decoder"],
                          tiny_cfg, tiny_cfg.asr_decoder_embed_dim,
                          tiny_cfg.asr_decoder_layers,
                          jnp.asarray(prev), tap, pad)
    lp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    exp = np.take_along_axis(np.asarray(lp), toks[:, :, None], 2)[:, :, 0]
    for bi in range(b):
        np.testing.assert_allclose(pos[bi, :lens[bi]], exp[bi, :lens[bi]],
                                    rtol=1e-4, atol=1e-5)
        assert (pos[bi, lens[bi]:] == 0).all()
    np.testing.assert_allclose(
        np.asarray(out["score"]),
        np.array([exp[0, :6].mean(), exp[1, :4].mean()]), rtol=1e-4)


def test_strategies_jit(tiny_cfg, tiny_variables, enc_state):
    for strat, kw in [("sampling", dict(sampling_topk=5)),
                      ("diverse_beam", dict(diversity_num_groups=2)),
                      ("diverse_siblings", dict(diversity_rate=0.2))]:
        cfg = BeamConfig(beam=2, max_len=6, strategy=strat, **kw)
        f = jax.jit(lambda v, tap, pad, r: beam_search_aux(
            v, tiny_cfg, "aux_asr_decoder", tap, pad, cfg, rng=r))
        out = f(tiny_variables, enc_state["out_middle_layers"][0],
                enc_state["encoder_padding_mask"], jax.random.PRNGKey(0))
        assert np.asarray(out["tokens"]).shape[:2] == (2, 2)


def test_sampling_topk_larger_than_vocab(tiny_cfg, tiny_variables, enc_state):
    """--sampling-topk larger than the vocabulary must behave like
    unrestricted sampling instead of crashing (negative sort index)."""
    cfg = BeamConfig(beam=2, max_len=6, strategy="sampling",
                     sampling_topk=10_000)
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"], cfg,
                          rng=jax.random.PRNGKey(0))
    assert np.asarray(out["tokens"]).shape[:2] == (2, 2)


def test_diverse_beam_group_striping_preserved(tiny_cfg, tiny_variables,
                                               enc_state):
    """Beam slot j must stay owned by group j % G across steps: with a huge
    diversity strength, adjacent slots (different groups) must start with
    different tokens, while slot pairs 2 apart (same group) are merely
    score-ordered."""
    cfg = BeamConfig(beam=4, max_len=8, strategy="diverse_beam",
                     diversity_num_groups=2, diversity_strength=1000.0)
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"], cfg)
    tokens = np.asarray(out["tokens"])
    # the final pool is score-sorted, but with a huge penalty the two
    # groups must contribute DIFFERENT continuations — at least G distinct
    # first tokens among the K returned hypotheses (a striping regression
    # collapses them all onto group 0's best path)
    for bi in range(tokens.shape[0]):
        firsts = tokens[bi, :, 1]
        assert len(set(firsts.tolist())) >= 2, firsts


def test_prefix_constrained_beam_search():
    """PrefixConstrainedBeamSearch (fairseq/search.py:147-208) as a
    jittable allowed-token mask: hypotheses only ever contain allowed
    tokens, and with a trivial all-allowed mask the decode equals the
    unconstrained beam."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2st_tpu.generate.sequence_generator import BeamConfig, \
        beam_search_aux
    from s2st_tpu.models import transformer_text as tt

    cfg = tt.TransformerTextConfig(
        src_vocab_size=16, tgt_vocab_size=16, encoder_layers=1,
        encoder_embed_dim=8, encoder_ffn_embed_dim=16,
        encoder_attention_heads=2, decoder_layers=1,
        decoder_embed_dim=8, decoder_ffn_embed_dim=16,
        decoder_attention_heads=2, dropout=0.0,
        max_source_positions=32, max_target_positions=32,
        dtype=jnp.float32)
    variables = tt.init_transformer(jax.random.PRNGKey(0), cfg)
    gen_vars = tt.generation_variables(variables, cfg)
    src = np.array([[5, 6, 7, 2], [8, 9, 2, 1]], np.int32)
    enc = tt.encode(gen_vars, cfg, jnp.asarray(src), deterministic=True)
    bs = BeamConfig(beam=2, max_len=8)

    base = beam_search_aux([gen_vars], tt._aux_cfg(cfg), "decoder",
                           [enc["encoder_out"]],
                           [enc["encoder_padding_mask"]], bs,
                           rng=jax.random.PRNGKey(0))

    # all-allowed mask == unconstrained
    def all_allowed(t, alive):
        b, k = alive.shape[0], alive.shape[1]
        return jnp.ones((b, k, 16), bool)

    same = beam_search_aux([gen_vars], tt._aux_cfg(cfg), "decoder",
                           [enc["encoder_out"]],
                           [enc["encoder_padding_mask"]], bs,
                           rng=jax.random.PRNGKey(0),
                           prefix_allowed_fn=all_allowed)
    np.testing.assert_array_equal(np.asarray(base["tokens"]),
                                  np.asarray(same["tokens"]))

    # restrict to {4, 5, EOS}: every emitted token must be allowed
    allowed_set = jnp.zeros((16,), bool).at[jnp.array([2, 4, 5])].set(True)

    def restricted(t, alive):
        b, k = alive.shape[0], alive.shape[1]
        return jnp.broadcast_to(allowed_set, (b, k, 16))

    out = beam_search_aux([gen_vars], tt._aux_cfg(cfg), "decoder",
                          [enc["encoder_out"]],
                          [enc["encoder_padding_mask"]], bs,
                          rng=jax.random.PRNGKey(0),
                          prefix_allowed_fn=restricted)
    toks = np.asarray(out["tokens"])
    lens = np.asarray(out["lengths"])
    for i in range(toks.shape[0]):
        for j in range(toks.shape[1]):
            hyp = toks[i, j, 1:1 + lens[i, j]]
            assert set(hyp.tolist()) <= {2, 4, 5}, hyp
