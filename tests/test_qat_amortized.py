"""Amortized scalar-QAT observers (reference parity: qlinear.py:41
update_step=3000 / qact.py:40 update_step=1000 — scale/zero_point are
recomputed every N updates and CACHED in between; round-3 built the
every-step variant, which measured 187.9 ms/step vs 68.3 baseline on v5e).

The cache rides the stats tree (so it shards, checkpoints, and resumes),
keyed by deterministic trace order of the activation sites."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2st_tpu.train.quantization import (init_scalar_qat_cache,
                                         wrap_loss_quant_noise)


def _tiny_setup():
    from s2st_tpu.models import transformer_text as tt
    cfg = tt.TransformerTextConfig(
        src_vocab_size=20, tgt_vocab_size=20,
        encoder_layers=1, decoder_layers=1,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=64, max_target_positions=64,
        dtype=jnp.float32)
    variables = dict(tt.init_transformer(jax.random.PRNGKey(0), cfg))
    variables.setdefault("stats", {})
    batch = {"src_tokens": jnp.asarray([[4, 5, 6, 2]], jnp.int32),
             "prev_output_tokens": jnp.asarray([[2, 7, 8]], jnp.int32),
             "target": jnp.asarray([[7, 8, 2]], jnp.int32)}

    def base_loss(variables, cfg, lcfg, batch, rng=None, train=True,
                  **kw):
        out = tt.forward(variables, cfg, batch, rng=rng,
                         deterministic=not train)
        logits = out["logits"].astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tgt = batch["target"]
        loss = -jnp.take_along_axis(lp, tgt[..., None], axis=-1).sum()
        return loss, {"new_stats": variables["stats"],
                      "sample_size": jnp.float32(tgt.size),
                      "logging": {"loss": loss}}

    return cfg, variables, batch, base_loss


def test_cache_init_discovers_sites():
    cfg, variables, batch, base_loss = _tiny_setup()
    wrapped = wrap_loss_quant_noise(base_loss, scalar_p=0.5)
    cache = init_scalar_qat_cache(wrapped, variables, cfg, None, batch)
    assert cache["w_scale"].shape[0] > 0           # quantizable leaves
    assert cache["act_scale"].shape[0] > 0         # linear/embed call sites
    assert wrapped.wants_step


def test_amortized_matches_inline_on_recompute_step():
    """At a step where BOTH cadences recompute, the amortized path must
    equal the inline (every-step) path bit-for-bit."""
    cfg, variables, batch, base_loss = _tiny_setup()
    wrapped = wrap_loss_quant_noise(base_loss, scalar_p=0.5,
                                    scalar_update_step=2, act_update_step=2)
    cache = init_scalar_qat_cache(wrapped, variables, cfg, None, batch)
    v_cached = {"params": variables["params"],
                "stats": {"_qscales": cache}}
    rng = jax.random.PRNGKey(3)
    # step 0: 0 % 2 == 0 -> full recompute on both cadences
    loss_a, ex_a = jax.jit(
        lambda v, b, s: wrapped(v, cfg, None, b, rng=rng, train=True,
                                step=s))(v_cached, batch,
                                         jnp.asarray(0, jnp.int32))
    loss_b, ex_b = jax.jit(
        lambda v, b: wrapped(v, cfg, None, b, rng=rng, train=True))(
        variables, batch)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    qs = ex_a["new_stats"]["_qscales"]
    assert np.all(np.asarray(qs["w_scale"]) > 0)
    assert np.all(np.asarray(qs["act_scale"]) > 0)


def test_cached_steps_reuse_scales():
    """Between recomputes the cached qparams are used verbatim: feeding a
    hand-poked cache at a non-recompute step must change the loss, and the
    returned cache must carry the poked values through unchanged."""
    cfg, variables, batch, base_loss = _tiny_setup()
    wrapped = wrap_loss_quant_noise(base_loss, scalar_p=0.5,
                                    scalar_update_step=4, act_update_step=4)
    cache = init_scalar_qat_cache(wrapped, variables, cfg, None, batch)
    rng = jax.random.PRNGKey(3)
    fn = jax.jit(lambda v, b, s: wrapped(v, cfg, None, b, rng=rng,
                                         train=True, step=s))
    # populate real scales at a recompute step
    _, ex0 = fn({"params": variables["params"], "stats": {"_qscales": cache}},
                batch, jnp.asarray(0, jnp.int32))
    real = ex0["new_stats"]["_qscales"]
    # non-recompute step with the real cache
    loss_real, ex1 = fn({"params": variables["params"],
                         "stats": {"_qscales": real}},
                        batch, jnp.asarray(1, jnp.int32))
    # same step with a poked cache (scales halved)
    poked = {k: (v / 2 if k.endswith("scale") else v)
             for k, v in real.items()}
    loss_poked, ex2 = fn({"params": variables["params"],
                          "stats": {"_qscales": poked}},
                         batch, jnp.asarray(1, jnp.int32))
    assert float(loss_real) != float(loss_poked)
    # pass-through: cached values survive a non-recompute step unchanged
    np.testing.assert_allclose(np.asarray(ex2["new_stats"]["_qscales"]
                                          ["w_scale"]),
                               np.asarray(poked["w_scale"]))


def test_trainer_e2e_amortized_qat(tmp_path):
    """CLI training with --quant-noise-scalar builds the cache, trains,
    and checkpoints it (the cache rides stats through save/resume)."""
    import random
    random.seed(0)
    d = str(tmp_path)
    for split, n in (("train", 40), ("valid", 8)):
        with open(f"{d}/{split}.txt", "w") as f:
            for _ in range(n):
                f.write(" ".join(f"w{random.randrange(8)}"
                                 for _ in range(random.randint(3, 8)))
                        + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    assert pp(["--only-source", "--trainpref", f"{d}/train.txt",
               "--validpref", f"{d}/valid.txt",
               "--destdir", bin_dir, "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    argv = [
        bin_dir, "--task", "language_modeling",
        "--arch", "transformer_lm_gpt2_tiny", "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "512", "--max-epoch", "1",
        "--tokens-per-sample", "32", "--sample-break-mode", "none",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--share-decoder-input-output-embed",
        "--quant-noise-scalar", "0.5",
        "--no-epoch-checkpoints"]
    assert train_main(argv) == 0
    import numpy as np
    with np.load(f"{d}/ckpt/checkpoint_last.npz") as z:
        qkeys = [k for k in z.files if "_qscales" in k]
        assert qkeys, "observer cache missing from the checkpoint stats"
        ws = z["stats::_qscales::w_scale"]
        assert ws.ndim == 1 and (ws > 0).all()
    # resume loads the cache back (template includes _qscales)
    assert train_main(argv + ["--max-epoch", "2"]) == 0


def test_static_recompute_flags_match_dynamic_cond():
    """The trainer-side STATIC qat_recompute flags (host step counter ->
    straight-line compiled branch) must be bit-identical to the dynamic
    lax.cond path at every step of the schedule (fresh, cached, and
    re-fresh steps)."""
    cfg, variables, batch, base_loss = _tiny_setup()
    wrapped = wrap_loss_quant_noise(base_loss, scalar_p=0.5,
                                    scalar_update_step=2, act_update_step=2)
    assert wrapped.qat_update_steps == (2, 2)
    cache = init_scalar_qat_cache(wrapped, variables, cfg, None, batch)
    variables["stats"]["_qscales"] = cache

    rng = jax.random.PRNGKey(3)
    stats_dyn = dict(variables["stats"])
    stats_sta = dict(variables["stats"])
    for step in range(4):
        flag = (step % 2 == 0, step % 2 == 0)
        ld, ed = wrapped({**variables, "stats": stats_dyn}, cfg, None,
                         batch, rng=rng, train=True,
                         step=jnp.asarray(step, jnp.int32))
        ls, es = wrapped({**variables, "stats": stats_sta}, cfg, None,
                         batch, rng=rng, train=True,
                         step=jnp.asarray(step, jnp.int32),
                         qat_recompute=flag)
        np.testing.assert_array_equal(np.asarray(ld), np.asarray(ls))
        qd, qs = ed["new_stats"]["_qscales"], es["new_stats"]["_qscales"]
        for k in ("w_scale", "w_zp", "act_scale", "act_zp"):
            # the straight-line branch compiles with different fusion than
            # the lax.cond body -> last-ulp rounding differences (~1e-9 on
            # ~5e-3 scales); the semantics, not the ulps, are under test
            np.testing.assert_allclose(np.asarray(qd[k]),
                                       np.asarray(qs[k]), rtol=1e-6,
                                       atol=1e-9)
        stats_dyn = {**stats_dyn, "_qscales": qd}
        stats_sta = {**stats_sta, "_qscales": qs}
