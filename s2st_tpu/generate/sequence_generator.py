"""Beam search over the auxiliary text decoders, fully inside XLA.

Parity: ``fairseq/sequence_generator.py`` + ``fairseq/search.py:103-146``
(BeamSearch) as used by ``fairseq_cli/generate_for_s2st.py`` — decode text
from ``aux_asr_decoder`` / ``aux_st_decoder`` over their encoder taps, with
cumulative log-prob scoring and length-penalty-normalized finalization
(``sequence_generator.py`` finalize_hypos: score / (step+1)**len_penalty).

TPU-native design: the reference's per-step Python loop with dict-keyed
incremental_state and index_select reordering becomes one ``lax.while_loop``
with fixed-shape KV caches and gather-based beam reordering; alive/finished
hypothesis pools follow the standard XLA beam-search formulation. Greedy and
CTC argmax decoding (test/generator_score.py ScoreGenerator parity) are the
beam=1 / projection paths below.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import s2st_transformer as m
from ..nn.attention import cross_attn_precompute, self_attn_cache_init
from ..nn.core import embedding, layer_norm, linear
from ..nn.transformer import decoder_layer_step, sinusoidal_table

PAD, EOS, UNK = 1, 2, 3
NEG_INF = -1e9


@dataclass(frozen=True)
class BeamConfig:
    beam: int = 5
    max_len: int = 200
    min_len: int = 1            # fairseq: EOS banned while step < min_len
    len_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    # --- strategy selection (fairseq/search.py:103-814) ---
    # "beam" | "sampling" | "diverse_beam" | "diverse_siblings"
    strategy: str = "beam"
    sampling_topk: int = -1      # Sampling: keep top-k tokens (-1 = all)
    sampling_topp: float = -1.0  # Sampling: nucleus mass (-1 = off)
    diversity_num_groups: int = 2        # DiverseBeamSearch G
    diversity_strength: float = 0.5      # DiverseBeamSearch penalty
    diversity_rate: float = 0.0          # DiverseSiblingsSearch gamma
    # LengthConstrainedBeamSearch (search.py:529-553): per-sentence
    # min/max = a*src_len + b, enabled when any coefficient is set
    min_len_a: float = 0.0
    min_len_b: float = -1.0      # <0 -> disabled (scalar min_len applies)
    max_len_a: float = 0.0
    max_len_b: float = -1.0      # <0 -> disabled
    # custom stop/bos token (SequenceGenerator eos=... — mBART decodes
    # with eos = the [tgt_lang] symbol, translation_from_pretrained_bart)
    eos: int = 2
    # separate decoder-input start token (SequenceGenerator bos_token=...,
    # the online_backtranslation __lang__ prefix); -1 -> use eos
    bos: int = -1

    def __post_init__(self):
        # fairseq raises on --sampling-topk + --sampling-topp together
        # (fairseq/search.py:626-628); enforce at config construction so
        # programmatic callers get the same guard as the CLI.
        if self.sampling_topk > 0 and self.sampling_topp > 0:
            raise ValueError(
                "sampling_topk and sampling_topp are mutually exclusive")


# ---------------------------------------------------------------------------
# search strategies: each returns 2K candidates (scores, tokens, beams)
# given lprobs (B, K, V) and cumulative alive scores (B, K).
# fairseq parity: fairseq/search.py BeamSearch:103 / Sampling:620 /
# DiverseBeamSearch:556 / DiverseSiblingsSearch:744.
# ---------------------------------------------------------------------------

def _fill_finished_slots(fin_scores, fin_tokens, fin_lens, fin_flags,
                         cand_scores, cand_tokens, length, k,
                         fin_pos=None, cand_pos=None):
    """Append eos candidates (best-first) into the free finished slots of
    each sentence, fairseq finalize_hypos-style: slots fill in arrival
    order and are never replaced; a sentence with all K slots filled is
    frozen. cand_scores (B, C) with NEG_INF for non-candidates;
    cand_tokens (B, C, L); length: scalar/int hypothesis length.
    fin_pos/cand_pos: optional per-position score buffers (B, K|C, L)
    carried alongside (the P- output lines)."""
    filled = fin_flags.sum(axis=1)                          # (B,)
    take = min(k, cand_scores.shape[1])
    cs, ci = jax.lax.top_k(cand_scores, take)               # sorted desc
    ct = jnp.take_along_axis(cand_tokens, ci[:, :, None], 1)
    p = jnp.arange(k)[None, :]                              # slot position
    r = p - filled[:, None]                                 # candidate rank
    in_range = (r >= 0) & (r < take)
    rc = jnp.clip(r, 0, take - 1)
    new_score = jnp.take_along_axis(cs, rc, 1)
    valid = in_range & (new_score > NEG_INF / 2)
    out_scores = jnp.where(valid, new_score, fin_scores)
    out_tokens = jnp.where(valid[:, :, None],
                           jnp.take_along_axis(ct, rc[:, :, None], 1),
                           fin_tokens)
    out_lens = jnp.where(valid, jnp.asarray(length, jnp.int32), fin_lens)
    out_flags = fin_flags | valid
    if fin_pos is None:
        return out_scores, out_tokens, out_lens, out_flags
    cp = jnp.take_along_axis(cand_pos, ci[:, :, None], 1)
    out_pos = jnp.where(valid[:, :, None],
                        jnp.take_along_axis(cp, rc[:, :, None], 1),
                        fin_pos)
    return out_scores, out_tokens, out_lens, out_flags, out_pos


def _step_beam(t, lprobs, alive_scores, k):
    b, _, vocab = lprobs.shape
    cand = alive_scores[:, :, None] + lprobs
    top_scores, top_idx = jax.lax.top_k(cand.reshape(b, k * vocab), 2 * k)
    return top_scores, top_idx % vocab, top_idx // vocab


def _step_sampling(t, lprobs, alive_scores, k, rng, topk, topp):
    """Sampling parity (search.py:620-742): at step 0 draw K i.i.d.
    continuations from the first beam (with replacement); afterwards each
    beam draws one. The sampled token's score is its ORIGINAL lprob; the
    sampling distribution is the top-k/top-p truncated, renormalized one.
    Pads to 2K candidates with NEG_INF so the pool logic stays uniform."""
    b, _, vocab = lprobs.shape
    src = jnp.where(t == 0, jnp.zeros((k,), jnp.int32), jnp.arange(k))
    dist = jnp.take_along_axis(lprobs, src[None, :, None], axis=1)  # (B,K,V)
    masked = dist
    if topk > 0 and topk < vocab:   # topk >= vocab keeps the full support
        kth = jnp.sort(dist, axis=-1)[..., vocab - topk][..., None]
        masked = jnp.where(dist < kth, NEG_INF, dist)
    elif topp > 0:
        # keep a sorted-desc word iff the probability mass strictly before it
        # is < p (includes the first word that crosses p — search.py:649-663)
        sorted_lp = jnp.sort(dist, axis=-1)[..., ::-1]
        probs = jnp.exp(sorted_lp)
        before = jnp.cumsum(probs, axis=-1) - probs
        keep = before < topp
        last = jnp.maximum(jnp.sum(keep, axis=-1, keepdims=True) - 1, 0)
        cutoff = jnp.take_along_axis(sorted_lp, last, axis=-1)
        masked = jnp.where(dist < cutoff, NEG_INF, dist)
    keys = jax.random.split(jax.random.fold_in(rng, t), b)
    tok = jax.vmap(lambda key, lp: jax.random.categorical(key, lp, axis=-1))(
        keys, masked)                                           # (B, K)
    tok_lp = jnp.take_along_axis(dist, tok[:, :, None], axis=-1)[:, :, 0]
    prev = jnp.take_along_axis(alive_scores, src[None, :], axis=1)
    scores = prev + tok_lp
    beams = jnp.broadcast_to(src[None, :], (b, k))
    neg = jnp.full((b, k), NEG_INF, jnp.float32)
    zero = jnp.zeros((b, k), jnp.int32)
    return (jnp.concatenate([scores, neg], 1),
            jnp.concatenate([tok, zero], 1),
            jnp.concatenate([beams, zero], 1))


def _step_diverse_beam(t, lprobs, alive_scores, k, num_groups, strength):
    """DiverseBeamSearch (Hamming diversity) parity (search.py:556-617):
    beams are striped into G groups; group g's lprobs are penalized by
    -strength * (count of tokens already chosen by groups < g this step).
    The penalty stays in the returned scores, as in the reference.

    Candidates are INTERLEAVED across groups (fairseq's
    torch.stack(..., dim=2).view) so that, combined with the caller's
    order-preserving alive selection, beam slot j keeps belonging to group
    j % G on the next step — selecting top-K by score instead would let
    the unpenalized group 0 take over every slot and the group slicing
    would penalize the wrong beams."""
    b, _, vocab = lprobs.shape
    sub = k // num_groups
    div = jnp.zeros((b, vocab), jnp.float32)
    all_s, all_t, all_bm = [], [], []
    for g in range(num_groups):
        lp_g = lprobs[:, g::num_groups]
        sc_g = alive_scores[:, g::num_groups]
        eff = lp_g - strength * div[:, None, :] if g > 0 else lp_g
        cand = sc_g[:, :, None] + eff
        s_g, idx = jax.lax.top_k(cand.reshape(b, sub * vocab), 2 * sub)
        tok = idx % vocab
        beam = (idx // vocab) * num_groups + g
        div = div.at[jnp.arange(b)[:, None], tok].add(1.0)
        all_s.append(s_g)
        all_t.append(tok)
        all_bm.append(beam)
    # interleave: (c0_g0, c0_g1, ..., c0_g{G-1}, c1_g0, ...)
    s = jnp.stack(all_s, axis=2).reshape(b, 2 * k)
    tok = jnp.stack(all_t, axis=2).reshape(b, 2 * k)
    bm = jnp.stack(all_bm, axis=2).reshape(b, 2 * k)
    return s, tok, bm


def _step_diverse_siblings(t, lprobs, alive_scores, k, rate):
    """DiverseSiblingsSearch parity (search.py:744-814): per-beam top-2K over
    the vocab, intra-sibling rank penalty gamma*rank subtracted (kept in the
    score), then global top-2K. Step 0 falls back to plain beam search."""
    b, _, vocab = lprobs.shape
    k2 = 2 * k
    cand = alive_scores[:, :, None] + lprobs                 # (B, K, V)
    s, idx = jax.lax.top_k(cand, k2)                         # per-beam
    s = s - (jnp.arange(1, k2 + 1, dtype=jnp.float32) * rate)[None, None, :]
    top, fidx = jax.lax.top_k(s.reshape(b, k * k2), k2)
    beams = fidx // k2
    toks = jnp.take_along_axis(idx.reshape(b, k * k2), fidx, axis=1)
    # both branches run every step under jit (the plain-beam fallback only
    # matters at t == 0); the extra top-k over K*V is accepted for exact
    # step-0 parity (search.py:773: unpenalized scores at the first step)
    s0, t0_, b0 = _step_beam(t, lprobs, alive_scores, k)
    first = t == 0
    return (jnp.where(first, s0, top), jnp.where(first, t0_, toks),
            jnp.where(first, b0, beams))


def _aux_step(p, cfg: m.S2STConfig, dim: int, n_layers: int, table,
              tokens_t, step, caches, cross_kvs, enc_pad):
    """One decode step of an aux text decoder. tokens_t: (N, 1) int32.
    Returns (lprobs fp32 (N, V), new caches)."""
    scale = 1.0 if cfg.no_scale_embedding else dim ** 0.5
    x = embedding(p["embed"], tokens_t, cfg.dtype) * jnp.asarray(scale, cfg.dtype)
    # incremental positions: all previous tokens are non-pad -> step+PAD+1
    x = x + table[step + PAD + 1].astype(cfg.dtype)[None, None, :]
    new_caches = []
    for i in range(n_layers):
        x, c, _ = decoder_layer_step(
            p[f"layer{i}"], x, caches[i], step, cross_kvs[i], enc_pad,
            cfg.decoder_attention_heads,
            normalize_before=cfg.decoder_normalize_before,
            activation=cfg.activation_fn)
        new_caches.append(c)
    if "final_ln" in p:
        x = layer_norm(p["final_ln"], x)
    logits = jnp.dot(x[:, 0], p["out_proj"]["w"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return lprobs, tuple(new_caches)


def _length_penalty(length, alpha):
    return length.astype(jnp.float32) ** alpha


def _ngram_ban_mask(tokens: jnp.ndarray, t, vocab: int, n: int) -> jnp.ndarray:
    """(B, K, V) additive mask banning tokens that would repeat an n-gram
    (NGramRepeatBlock parity, fairseq/ngram_repeat_block.py:39 — the CUDA
    kernel's job as pure vectorized XLA inside the decode loop).

    tokens[:, :, :t+1] is the generated prefix (position 0 = bos). A token v
    is banned at step t+1 if [tokens[t-n+2..t], v] already occurs in the
    prefix."""
    b, k, L = tokens.shape
    m = n - 1                                  # context length
    # trailing context: tokens at positions t-m+1 .. t  -> (B, K, m)
    ctx = jnp.stack([
        jnp.take(tokens, jnp.maximum(t - m + 1 + i, 0), axis=2)
        for i in range(m)], axis=-1)
    # all historical m-grams starting at j (j+m-1 <= t-1 so the banned token
    # j+m is within the prefix): match[b,k,j] = prefix[j..j+m-1] == ctx
    pos = jnp.arange(L)
    match = jnp.ones((b, k, L), bool)
    for i in range(m):
        shifted = jnp.roll(tokens, -i, axis=2)         # tokens[j+i] at col j
        match = match & (shifted == ctx[..., i:i + 1])
    valid = (pos[None, None, :] + m <= t) & (pos[None, None, :] + m >= 1)
    match = match & valid & (t + 1 >= n)
    # banned token for match at j is tokens[j+m]
    nxt = jnp.roll(tokens, -m, axis=2)                 # tokens[j+m] at col j
    if vocab <= 2048:
        # small (phone-level) vocab: one-hot contraction stays cheap
        onehot = jax.nn.one_hot(nxt, vocab, dtype=jnp.float32)  # (B,K,L,V)
        banned = jnp.einsum("bkl,bklv->bkv",
                            match.astype(jnp.float32), onehot)
    else:
        # large vocab: scatter-max of matched positions avoids the
        # (B,K,L,V) one-hot blowup
        bi = jnp.arange(b)[:, None, None]
        ki = jnp.arange(k)[None, :, None]
        banned = jnp.zeros((b, k, vocab), jnp.float32).at[
            bi, ki, nxt].max(match.astype(jnp.float32))
    return jnp.where(banned > 0, NEG_INF, 0.0)


def _gather_beams(tree, beam_idx, b, k):
    """Reorder the leading N=B*K axis of every leaf by (B, K) beam indices."""
    flat = (jnp.arange(b)[:, None] * k + beam_idx).reshape(-1)
    return jax.tree_util.tree_map(lambda x: x[flat], tree)


def beam_search_aux(variables, cfg: m.S2STConfig, which: str,
                    enc_tap: jnp.ndarray, enc_pad: jnp.ndarray,
                    bs_cfg: BeamConfig, prefix_tokens=None,
                    src_lengths=None, rng=None,
                    constraints=None, step_fns=None, init_caches=None,
                    vocab_size=None,
                    prefix_allowed_fn=None) -> Dict[str, jnp.ndarray]:
    """Beam-decode text from one aux decoder.

    which: "aux_asr_decoder" | "aux_st_decoder"; enc_tap (B, Ts, C) is the
    matching encoder middle-layer tap. Returns dict with tokens
    (B, K, max_len+1) (position 0 = EOS bos), scores (B, K) normalized,
    lengths (B, K) incl. the final EOS.

    Ensembles (EnsembleModel parity, sequence_generator.py:19): pass LISTS
    for `variables` and `enc_tap`/`enc_pad` — per-step log-probs are
    combined as log of the mean probability (logsumexp - log N).

    prefix_tokens: optional (B, P) int32, PAD-padded — forced decode prefix
    (fairseq sequence_generator._prefix_tokens: while t < P the prefix token
    keeps its own lprob, everything else is banned).
    src_lengths: (B,) int32, required when bs_cfg.min/max_len_a/b enable
    LengthConstrainedBeamSearch per-sentence bounds.
    rng: PRNGKey for strategy "sampling" (defaults to PRNGKey(0)).
    prefix_allowed_fn: optional jittable (t, alive_tokens (B,K,L)) ->
    bool (B,K,V) allowed-next-token mask — the TPU-native form of
    PrefixConstrainedBeamSearch's prefix_allowed_tokens_fn.
    constraints: a generate.constrained.ConstraintTables — switches to
    lexically constrained search (fairseq/search.py:219-528 dynamic beam
    allocation): per-beam trie/cursor state lives in the jitted loop and
    EOS is banned until every constraint phrase has been produced.
    """
    ens_vars = variables if isinstance(variables, (list, tuple)) \
        else [variables]
    ens_taps = enc_tap if isinstance(enc_tap, (list, tuple)) else [enc_tap]
    ens_pads = enc_pad if isinstance(enc_pad, (list, tuple)) else [enc_pad]
    n_models = len(ens_vars)
    k = bs_cfg.beam
    max_len = bs_cfg.max_len
    b, ts = ens_taps[0].shape[0], ens_taps[0].shape[1]
    if step_fns is not None:
        # generic step-function interface (e.g. the LSTM decoder): each
        # step_fns[mi](tokens_t (N,1), step, cache) -> (lprobs fp32 (N,V),
        # new cache); cache pytree leaves lead with N = B*K and reorder
        # under the beam gather like the transformer KV caches do.
        if init_caches is None or vocab_size is None:
            raise ValueError("step_fns needs init_caches and vocab_size")
        vocab = vocab_size
        caches_ens = tuple(init_caches)
        _model_step = lambda mi, last, t, cache: step_fns[mi](last, t, cache)
    else:
        ps = [v["params"][which] for v in ens_vars]
        p = ps[0]
        dim = cfg.asr_decoder_embed_dim if which == "aux_asr_decoder" \
            else cfg.st_decoder_embed_dim
        n_layers = cfg.asr_decoder_layers if which == "aux_asr_decoder" \
            else cfg.st_decoder_layers
        vocab = p["out_proj"]["w"].shape[1]
        heads = cfg.decoder_attention_heads
        head_dim = dim // heads
        table = sinusoidal_table(max_len + PAD + 8, dim, PAD)

        # tile encoder state to B*K (per model)
        enc_pads_k = [jnp.repeat(ep, k, axis=0) for ep in ens_pads]
        cross_kvs_ens = []
        caches_ens = []
        for mi in range(n_models):
            tap_k = jnp.repeat(ens_taps[mi], k, axis=0)    # (B*K, Ts, C)
            cross_kvs_ens.append(tuple(
                cross_attn_precompute(ps[mi][f"layer{i}"]["cross_attn"],
                                      tap_k, heads)
                for i in range(n_layers)))
            caches_ens.append(tuple(
                self_attn_cache_init(b * k, max_len + 1, heads, head_dim,
                                     cfg.dtype) for _ in range(n_layers)))
        caches_ens = tuple(caches_ens)

        def _model_step(mi, last, t, cache):
            return _aux_step(ps[mi], cfg, dim, n_layers, table, last, t,
                             cache, cross_kvs_ens[mi], enc_pads_k[mi])

    tokens0 = jnp.full((b, k, max_len + 2), PAD, jnp.int32)
    eos_id = bs_cfg.eos
    bos_id = bs_cfg.bos if bs_cfg.bos >= 0 else eos_id
    tokens0 = tokens0.at[:, :, 0].set(bos_id)              # bos (default eos)
    # step-0 semantics: fairseq's search.step uses only the first beam at
    # step 0 — emulated by starting every other beam at NEG_INF. Diverse
    # beam search needs the first beam of EACH group live (beams 0..G-1).
    n_live0 = (bs_cfg.diversity_num_groups
               if bs_cfg.strategy == "diverse_beam" else 1)
    if bs_cfg.strategy == "diverse_beam" and k % n_live0 != 0:
        raise ValueError("diverse_beam requires beam %% num_groups == 0")
    alive_scores0 = jnp.tile(jnp.asarray(
        [0.0] * n_live0 + [NEG_INF] * (k - n_live0),
        jnp.float32)[None], (b, 1))

    if bs_cfg.strategy == "sampling" and rng is None:
        rng = jax.random.PRNGKey(0)
    # static-width prefix buffer for traced-step indexing
    if prefix_tokens is not None:
        prefix_tokens = jnp.asarray(prefix_tokens, jnp.int32)
    min_lens = max_lens = None
    if bs_cfg.min_len_b >= 0 or bs_cfg.max_len_b >= 0:
        if src_lengths is None:
            raise ValueError("length-constrained search needs src_lengths")
        sl = jnp.asarray(src_lengths, jnp.float32)
        if bs_cfg.min_len_b >= 0:
            min_lens = bs_cfg.min_len_a * sl + bs_cfg.min_len_b
        if bs_cfg.max_len_b >= 0:
            max_lens = bs_cfg.max_len_a * sl + bs_cfg.max_len_b
    state = dict(
        step=jnp.zeros((), jnp.int32),
        alive_tokens=tokens0,
        alive_scores=alive_scores0,                        # cumulative lprob
        caches=caches_ens,
        fin_tokens=tokens0,
        fin_scores=jnp.full((b, k), NEG_INF, jnp.float32), # normalized
        fin_lens=jnp.zeros((b, k), jnp.int32),
        fin_flags=jnp.zeros((b, k), bool),
        # per-position score deltas along each hypothesis (fairseq's
        # positional_scores, the P- lines: cum-score differences)
        alive_pos=jnp.zeros((b, k, max_len + 2), jnp.float32),
        fin_pos=jnp.zeros((b, k, max_len + 2), jnp.float32),
    )
    if constraints is not None:
        from .constrained import init_constraint_state
        cnode0, cmet0 = init_constraint_state(constraints, b, k)
        state["cnode"], state["cmet"] = cnode0, cmet0

    def cond(s):
        # fairseq is_finished semantics (sequence_generator.py:542-585): a
        # sentence is DONE once K hypotheses have been finalized; the loop
        # runs until every sentence is done or max_len. No score-based
        # continuation: fairseq removes a done sentence from the batch, so
        # later (even better) candidates never replace its collected K.
        done = s["fin_flags"].all(axis=1)
        return (s["step"] < max_len) & ~done.all()

    def body(s):
        t = s["step"]
        last = jax.lax.dynamic_slice_in_dim(
            s["alive_tokens"].reshape(b * k, -1), t, 1, axis=1)  # (B*K,1)
        lps = []
        new_caches = []
        for mi in range(n_models):
            lp_m, c_m = _model_step(mi, last, t, s["caches"][mi])
            lps.append(lp_m)
            new_caches.append(c_m)
        new_caches = tuple(new_caches)
        if n_models == 1:
            lprobs = lps[0]
        else:
            # log of the mean probability (EnsembleModel parity)
            lprobs = jax.nn.logsumexp(jnp.stack(lps), axis=0) \
                - jnp.log(float(n_models))
        lprobs = lprobs.reshape(b, k, vocab)
        lprobs = lprobs.at[:, :, PAD].set(NEG_INF)  # never emit pad
        # min_len (sequence_generator.py:365): no EOS before min_len tokens
        lprobs = lprobs.at[:, :, eos_id].add(
            jnp.where(t < bs_cfg.min_len, NEG_INF, 0.0))
        if min_lens is not None:  # LengthConstrainedBeamSearch per-sentence
            lprobs = lprobs.at[:, :, eos_id].add(
                jnp.where(t < min_lens, NEG_INF, 0.0)[:, None])
        if max_lens is not None:
            # force EOS once max length is reached (search.py:551-552 sets
            # eos lprob to 0; every alive continuation is banned so the
            # sentence stops there, like fairseq's beam-filled finalize)
            at_max = (t >= max_lens)[:, None, None]
            forced_eos = jnp.full_like(lprobs, NEG_INF).at[:, :, eos_id].set(0.0)
            lprobs = jnp.where(at_max, forced_eos, lprobs)
        if prefix_tokens is not None:
            # forced prefix (_prefix_tokens parity): the prefix token keeps
            # its own lprob, every other token is banned
            plen = prefix_tokens.shape[1]
            ptok = jax.lax.dynamic_index_in_dim(
                jnp.pad(prefix_tokens, ((0, 0), (0, 1)),
                        constant_values=PAD), jnp.minimum(t, plen),
                axis=1, keepdims=False)                     # (B,)
            have = ptok != PAD
            own = jnp.take_along_axis(
                lprobs, ptok[:, None, None].repeat(k, 1), axis=2)  # (B,K,1)
            forced = jnp.where(
                jax.nn.one_hot(ptok, vocab, dtype=bool)[:, None, :],
                own, NEG_INF)
            lprobs = jnp.where(have[:, None, None], forced, lprobs)
        if prefix_allowed_fn is not None:
            # PrefixConstrainedBeamSearch (search.py:147-208): the TPU
            # form takes a JITTABLE mask fn (t, alive_tokens (B,K,L)) ->
            # bool (B,K,V) of allowed next tokens, replacing the
            # reference's per-sentence python-list callback
            allowed = prefix_allowed_fn(t, s["alive_tokens"])
            lprobs = jnp.where(allowed, lprobs, NEG_INF)
        if bs_cfg.no_repeat_ngram_size > 0:
            lprobs = lprobs + _ngram_ban_mask(
                s["alive_tokens"], t, vocab, bs_cfg.no_repeat_ngram_size)

        # strategy step -> 2K candidates (fairseq search.step parity)
        cand_cstate = None
        if constraints is not None:
            from .constrained import step_lexically_constrained
            top_scores, tok, beam_idx, cand_node, cand_met = \
                step_lexically_constrained(
                    constraints, k, vocab, lprobs, s["alive_scores"],
                    s["cnode"], s["cmet"])
            cand_cstate = (cand_node, cand_met)
        elif bs_cfg.strategy == "beam":
            top_scores, tok, beam_idx = _step_beam(
                t, lprobs, s["alive_scores"], k)
        elif bs_cfg.strategy == "sampling":
            top_scores, tok, beam_idx = _step_sampling(
                t, lprobs, s["alive_scores"], k, rng,
                bs_cfg.sampling_topk, bs_cfg.sampling_topp)
        elif bs_cfg.strategy == "diverse_beam":
            top_scores, tok, beam_idx = _step_diverse_beam(
                t, lprobs, s["alive_scores"], k,
                bs_cfg.diversity_num_groups, bs_cfg.diversity_strength)
        elif bs_cfg.strategy == "diverse_siblings":
            top_scores, tok, beam_idx = _step_diverse_siblings(
                t, lprobs, s["alive_scores"], k, bs_cfg.diversity_rate)
        else:
            raise ValueError(f"unknown search strategy {bs_cfg.strategy!r}")

        # candidate token buffers
        cand_tokens = jnp.take_along_axis(
            s["alive_tokens"], beam_idx[:, :, None], axis=1)  # (B,2K,L)
        write = jax.nn.one_hot(t + 1, cand_tokens.shape[2],
                               dtype=jnp.int32)[None, None, :]
        cand_tokens = cand_tokens * (1 - write) + tok[:, :, None] * write
        # per-position deltas: this step's lprob = cum - source beam's cum
        prev_cum = jnp.take_along_axis(s["alive_scores"], beam_idx, 1)
        cand_pscore = jnp.take_along_axis(
            s["alive_pos"], beam_idx[:, :, None], axis=1)
        cand_pscore = cand_pscore * (1 - write) \
            + (top_scores - prev_cum)[:, :, None] * write

        is_eos = tok == eos_id
        # ----- finished pool update: ARRIVAL-ORDER slot filling -----
        # fairseq finalize_hypos appends eos candidates (best-first within
        # a step) until K are collected, then the sentence is done and
        # later candidates are dropped — it never replaces a collected
        # hypothesis. Filling free slots in order reproduces that exactly
        # (and freezes done sentences for free: no free slots remain).
        norm = top_scores / _length_penalty(t + 1, bs_cfg.len_penalty)
        # fairseq only finalizes EOS candidates among the FIRST K of the 2K
        # (eos_mask[:, :beam_size], sequence_generator.py:395-410); an EOS
        # at rank >= K is dropped outright even if its normalized score
        # would win — parity requires reproducing that, not improving it
        cand_pos = jnp.arange(2 * k)[None, :]
        eos_scores = jnp.where(is_eos & (cand_pos < k), norm, NEG_INF)
        fin_top, fin_tokens, fin_lens, fin_flags, fin_pos = \
            _fill_finished_slots(
                s["fin_scores"], s["fin_tokens"], s["fin_lens"],
                s["fin_flags"], eos_scores, cand_tokens, t + 1, k,
                fin_pos=s["fin_pos"], cand_pos=cand_pscore)

        # ----- alive pool: top K non-eos -----
        if bs_cfg.strategy == "diverse_beam" or constraints is not None:
            # FIRST K non-eos in candidate order (not by score): keeps beam
            # slot j owned by group j % G (see _step_diverse_beam), and for
            # constrained search preserves the bank-stripe allocation —
            # re-sorting by score would drop the low-score high-bank
            # candidates that carry constraint progress (fairseq picks
            # actives by candidate order too, sequence_generator.py:430)
            pos = jnp.arange(2 * k, dtype=jnp.float32)[None, :]
            order_key = jnp.where(is_eos, 2 * k + pos, pos)
            _, alive_sel = jax.lax.top_k(-order_key, k)
            alive_top = jnp.take_along_axis(top_scores, alive_sel, 1)
            sel_eos = jnp.take_along_axis(is_eos, alive_sel, 1)
            alive_top = jnp.where(sel_eos, NEG_INF, alive_top)
        else:
            alive_cand = jnp.where(is_eos, NEG_INF, top_scores)
            alive_top, alive_sel = jax.lax.top_k(alive_cand, k)  # over 2K
        sel_beam = jnp.take_along_axis(beam_idx, alive_sel, 1)   # (B,K)
        alive_tokens = jnp.take_along_axis(
            cand_tokens, alive_sel[:, :, None], axis=1)
        alive_pos = jnp.take_along_axis(
            cand_pscore, alive_sel[:, :, None], axis=1)
        new_caches = _gather_beams(new_caches, sel_beam, b, k)

        out = dict(step=t + 1, alive_tokens=alive_tokens,
                   alive_scores=alive_top, caches=new_caches,
                   fin_tokens=fin_tokens, fin_scores=fin_top,
                   fin_lens=fin_lens, fin_flags=fin_flags,
                   alive_pos=alive_pos, fin_pos=fin_pos)
        if cand_cstate is not None:
            out["cnode"] = jnp.take_along_axis(cand_cstate[0], alive_sel, 1)
            out["cmet"] = jnp.take_along_axis(
                cand_cstate[1], alive_sel[:, :, None], axis=1)
        return out

    s = jax.lax.while_loop(cond, body, state)

    # finalize leftover alive hypotheses with a forced EOS whose
    # log-probability IS scored (fairseq runs one extra step restricted to
    # EOS at max_len, sequence_generator.py:375)
    t = s["step"]
    last = jax.lax.dynamic_slice_in_dim(
        s["alive_tokens"].reshape(b * k, -1), t, 1, axis=1)
    final_lps = []
    for mi in range(n_models):
        lp_m, _ = _model_step(mi, last, t, s["caches"][mi])
        final_lps.append(lp_m)
    if n_models == 1:
        final_lp = final_lps[0]
    else:
        final_lp = jax.nn.logsumexp(jnp.stack(final_lps), axis=0) \
            - jnp.log(float(n_models))
    eos_lp = final_lp.reshape(b, k, vocab)[:, :, eos_id]
    norm = (s["alive_scores"] + eos_lp) / _length_penalty(
        t + 1, bs_cfg.len_penalty)
    write = jax.nn.one_hot(t + 1, s["alive_tokens"].shape[2],
                           dtype=jnp.int32)[None, None, :]
    alive_tokens = (s["alive_tokens"] * (1 - write) + eos_id * write)
    alive_pos = s["alive_pos"] * (1 - write) + eos_lp[:, :, None] * write
    # forced-eos leftovers only FILL a sentence's remaining free slots
    # (done sentences are frozen — fairseq dropped them from the batch)
    fin_scores, fin_tokens, fin_lens, _, fin_pos = _fill_finished_slots(
        s["fin_scores"], s["fin_tokens"], s["fin_lens"], s["fin_flags"],
        norm, alive_tokens, t + 1, k,
        fin_pos=s["fin_pos"], cand_pos=alive_pos)
    # output sorted by score desc per sentence (fairseq sorts finalized)
    top, idx = jax.lax.top_k(fin_scores, k)
    return {
        "tokens": jnp.take_along_axis(fin_tokens, idx[:, :, None], 1),
        "scores": top,
        "lengths": jnp.take_along_axis(fin_lens, idx, 1),
        # deltas at positions 1..len (position 0 is the bos-EOS seed)
        "pos_scores": jnp.take_along_axis(fin_pos, idx[:, :, None], 1),
    }


def greedy_decode_aux(variables, cfg: m.S2STConfig, which: str,
                      enc_tap: jnp.ndarray, enc_pad: jnp.ndarray,
                      max_len: int = 200) -> Dict[str, jnp.ndarray]:
    """Greedy text decode (ScoreGenerator parity) == beam search with k=1."""
    out = beam_search_aux(variables, cfg, which, enc_tap, enc_pad,
                          BeamConfig(beam=1, max_len=max_len))
    return {"tokens": out["tokens"][:, 0], "lengths": out["lengths"][:, 0],
            "scores": out["scores"][:, 0]}


def score_sequences(variables, cfg: m.S2STConfig, which: str,
                    enc_tap: jnp.ndarray, enc_pad: jnp.ndarray,
                    tokens: jnp.ndarray, lengths: jnp.ndarray
                    ) -> Dict[str, jnp.ndarray]:
    """SequenceScorer parity (fairseq/sequence_scorer.py:12-155): teacher-
    forced scoring of given target sequences under an aux text decoder.

    tokens: (B, T) int32 gold targets ending in EOS, PAD-padded;
    lengths: (B,) token counts incl. the final EOS. Ensembles average
    PROBABILITIES then take the log (models>1 -> get_normalized_probs with
    log_probs=False, :78-80), exactly like beam decoding.

    Returns: positional_scores (B, T) fp32 (0 at pad), score (B,) = mean
    lprob per token (avg_probs.sum / tgt_len, :117-121).
    """
    ens_vars = variables if isinstance(variables, (list, tuple)) \
        else [variables]
    ens_taps = enc_tap if isinstance(enc_tap, (list, tuple)) else [enc_tap]
    ens_pads = enc_pad if isinstance(enc_pad, (list, tuple)) else [enc_pad]
    dim = cfg.asr_decoder_embed_dim if which == "aux_asr_decoder" \
        else cfg.st_decoder_embed_dim
    n_layers = cfg.asr_decoder_layers if which == "aux_asr_decoder" \
        else cfg.st_decoder_layers
    b, tt = tokens.shape
    # prev tokens: eos-front, pad-preserving (collater semantics)
    prev = jnp.where(tokens == PAD, PAD,
                     jnp.concatenate(
                         [jnp.full((b, 1), EOS, tokens.dtype),
                          tokens[:, :-1]], axis=1))
    lps = []
    for v, tap, pad_m in zip(ens_vars, ens_taps, ens_pads):
        logits = m.aux_decode(v["params"][which], cfg, dim, n_layers,
                              prev, tap, pad_m)
        lps.append(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
    if len(lps) == 1:
        lp = lps[0]
    else:
        lp = jax.nn.logsumexp(jnp.stack(lps), axis=0) - jnp.log(float(len(lps)))
    pos = jnp.take_along_axis(lp, tokens[:, :, None], axis=2)[:, :, 0]
    valid = jnp.arange(tt)[None, :] < lengths[:, None]
    pos = jnp.where(valid, pos, 0.0)
    score = pos.sum(axis=1) / jnp.maximum(lengths, 1).astype(jnp.float32)
    return {"positional_scores": pos, "score": score}


def ctc_argmax_decode(variables, cfg: m.S2STConfig, enc_tap0: jnp.ndarray,
                      enc_lens: jnp.ndarray) -> np.ndarray:
    """Best-path CTC decode over the CTC head (generator_score.py parity):
    argmax per frame -> collapse repeats -> drop blanks (blank=0).
    Host-side collapse (ragged output)."""
    logits = m.ctc_logits(variables, cfg, enc_tap0)
    ids = np.asarray(jnp.argmax(logits, axis=-1))        # (B, Ts)
    lens = np.asarray(enc_lens)
    out = []
    for row, n in zip(ids, lens):
        row = row[:n]
        collapsed = [int(t) for i, t in enumerate(row)
                     if t != 0 and (i == 0 or t != row[i - 1])]
        out.append(np.asarray(collapsed, np.int32))
    return out
