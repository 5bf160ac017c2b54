"""Training runtime over an 8-device virtual mesh: loss decreases, grad
accumulation equivalence, non-finite skip, sharding configs compile.

TPU-native analogue of the reference's distributed tests
(tests/distributed/, file-rendezvous spawn) — here a real jax mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2st_tpu.models import s2st_transformer as m
from s2st_tpu.parallel.mesh import make_mesh
from s2st_tpu.train.losses import LossConfig
from s2st_tpu.train.optim import adam, inverse_sqrt_schedule
from s2st_tpu.train.trainer import Trainer, TrainState, create_train_state
from tests.conftest import make_batch


@pytest.fixture(scope="module")
def small_cfg():
    return m.S2STConfig(
        src_vocab_size=20, tgt_vocab_size=20, input_feat_per_channel=8,
        conv_kernel_sizes=(5,), conv_channels=16,
        encoder_layers=1, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, middle_layers=(),
        decoder_layers=1, decoder_embed_dim=16, decoder_ffn_embed_dim=32,
        decoder_attention_heads=2, output_frame_dim=8,
        prenet_layers=1, prenet_dim=8, postnet_layers=1, postnet_conv_dim=8,
        ctc=False, aux_asr=False, aux_st=False,
        max_source_positions=128, max_target_positions=128,
        dtype=jnp.float32)


def _trainer(cfg, mesh, clip=1.0):
    tx = adam()
    sched = inverse_sqrt_schedule(1e-3, warmup_updates=4, warmup_init_lr=1e-4)
    return Trainer(cfg, LossConfig(), tx, sched, mesh, clip_norm=clip)


def _state(cfg, seed=0):
    variables = m.init_s2st(jax.random.PRNGKey(seed), cfg)
    return create_train_state(variables, adam())


def test_loss_decreases_on_overfit(small_cfg):
    # dropout off: the 12-step overfit check must be deterministic, not a
    # bet on the dropout rng stream
    cfg = small_cfg.replace(dropout=0.0, attention_dropout=0.0,
                            activation_dropout=0.0, prenet_dropout=0.0,
                            postnet_dropout=0.0)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    tr = _trainer(cfg, mesh)
    state = _state(cfg)
    batch = make_batch(cfg, b=2, src_t=21, tgt_t=13, seed=11)
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(12):
        state, metrics = tr.train_step(state, [batch],
                                       jax.random.fold_in(rng, i))
        losses.append(metrics["loss"])
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 12


def test_grad_accum_semantics(small_cfg):
    """update-freq accumulation follows the reference trainer semantics
    (trainer.py:823-843): grads SUMMED over microbatches, then multiplied by
    1/total_sample_size. (The reference's criterion is mean-reduced per
    microbatch, so accumulation is deliberately NOT equivalent to one big
    batch — we assert the actual contract instead.)"""
    from s2st_tpu.train.losses import LossConfig, s2st_loss
    cfg = small_cfg.replace(dropout=0.0, attention_dropout=0.0,
                            activation_dropout=0.0, prenet_dropout=0.0,
                            postnet_dropout=0.0)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    mb1 = make_batch(cfg, b=2, src_t=21, tgt_t=13, seed=13)
    mb2 = make_batch(cfg, b=2, src_t=21, tgt_t=13, seed=14)
    lcfg = LossConfig()
    state = _state(cfg, seed=1)
    rng = jax.random.PRNGKey(0)

    # hand-computed reference: sum of per-microbatch grads / total sample_size
    def one_grad(batch, sub):
        def lf(p):
            loss, extras = s2st_loss({"params": p, "stats": state.stats},
                                     cfg, lcfg, batch, rng=sub, train=True)
            return loss, extras["sample_size"]
        (loss, ss), g = jax.value_and_grad(lf, has_aux=True)(state.params)
        return g, ss

    g1, ss1 = one_grad(mb1, jax.random.fold_in(rng, 0))
    g2, ss2 = one_grad(mb2, jax.random.fold_in(rng, 1))
    total_ss = float(ss1) + float(ss2)
    ref_grads = jax.tree_util.tree_map(
        lambda a, b: (a + b) / total_ss, g1, g2)
    ref_gnorm = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(ref_grads))))

    tr = _trainer(cfg, mesh, clip=0.0)
    _, metrics = tr.train_step(state, [mb1, mb2], rng)
    assert abs(metrics["sample_size"] - total_ss) < 1e-6
    assert abs(metrics["gnorm"] - ref_gnorm) / ref_gnorm < 1e-4


def test_nonfinite_grads_skip_update(small_cfg):
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    tr = _trainer(small_cfg, mesh)
    state = _state(small_cfg)
    batch = make_batch(small_cfg, b=2, src_t=21, tgt_t=13)
    bad = dict(batch)
    bad["tgt_speech"] = batch["tgt_speech"] * np.inf
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state2, metrics = tr.train_step(state, [bad], jax.random.PRNGKey(0))
    assert int(state2.step) == 0  # update skipped
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dp,fsdp,tp", [(8, 1, 1), (2, 2, 2), (1, 4, 2)])
def test_mesh_configs_train(small_cfg, dp, fsdp, tp):
    """DP / FSDP / TP shardings all compile and execute on the virtual mesh."""
    if len(jax.devices()) < dp * fsdp * tp:
        pytest.skip("not enough virtual devices")
    mesh = make_mesh(dp=dp, fsdp=fsdp, tp=tp)
    tr = _trainer(small_cfg, mesh)
    state = _state(small_cfg)
    batch = make_batch(small_cfg, b=8, src_t=21, tgt_t=13, seed=17)
    state, metrics = tr.train_step(state, [batch], jax.random.PRNGKey(0))
    assert np.isfinite(metrics["loss"])
    assert int(state.step) == 1
    vmetrics = tr.valid_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(vmetrics["loss"])


def test_dp_equals_single_device(small_cfg):
    """The same batch must give the same loss on 1 device and on an 8-way
    data-parallel mesh (sharding is numerically transparent)."""
    cfg = small_cfg.replace(dropout=0.0, attention_dropout=0.0,
                            activation_dropout=0.0, prenet_dropout=0.0,
                            postnet_dropout=0.0)
    batch = make_batch(cfg, b=8, src_t=21, tgt_t=13, seed=19)
    rng = jax.random.PRNGKey(3)
    m1 = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    m8 = make_mesh(dp=8, fsdp=1, tp=1)
    tr1, tr8 = _trainer(cfg, m1, clip=0.0), _trainer(cfg, m8, clip=0.0)
    s1, s8 = _state(cfg, seed=2), _state(cfg, seed=2)
    s1, met1 = tr1.train_step(s1, [batch], rng)
    s8, met8 = tr8.train_step(s8, [batch], rng)
    assert abs(met1["loss"] - met8["loss"]) < 1e-3
    assert abs(met1["gnorm"] - met8["gnorm"]) < 1e-3


def test_reproducibility_same_seed(small_cfg):
    """Two fresh runs with identical seeds produce bit-identical loss
    sequences (tests/test_reproducibility.py parity)."""
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    batch = make_batch(small_cfg, b=2, src_t=21, tgt_t=13, seed=3)

    def run():
        tr = _trainer(small_cfg, mesh)
        state = _state(small_cfg, seed=5)
        rng = jax.random.PRNGKey(9)
        losses = []
        for i in range(4):
            state, met = tr.train_step(state, [batch],
                                       jax.random.fold_in(rng, i))
            losses.append(met["loss"])
        return losses

    a, b = run(), run()
    assert a == b, (a, b)


def test_resume_exact_continuation(small_cfg, tmp_path):
    """Save at step 2, restore, continue — loss at step 3 identical to an
    uninterrupted run (checkpoint_utils resume parity)."""
    from s2st_tpu.train.checkpoint import restore_state, save_checkpoint_file
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    batch = make_batch(small_cfg, b=2, src_t=21, tgt_t=13, seed=4)
    rng = jax.random.PRNGKey(11)

    tr = _trainer(small_cfg, mesh)
    state = _state(small_cfg, seed=6)
    losses = []
    ckpt_path = str(tmp_path / "mid.npz")
    for i in range(4):
        if i == 2:
            save_checkpoint_file(ckpt_path, state)
        state, met = tr.train_step(state, [batch], jax.random.fold_in(rng, i))
        losses.append(met["loss"])

    tr2 = _trainer(small_cfg, mesh)
    state2 = _state(small_cfg, seed=999)  # different init, then restore
    state2, _ = restore_state(state2, ckpt_path)
    resumed = []
    for i in range(2, 4):
        state2, met = tr2.train_step(state2, [batch],
                                     jax.random.fold_in(rng, i))
        resumed.append(met["loss"])
    np.testing.assert_allclose(resumed, losses[2:], rtol=1e-6)


def test_lr_scale_plateau_shrink(small_cfg):
    """lr_scale input multiplies the applied lr (reduce_lr_on_plateau's
    host-driven shrink)."""
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    batch = make_batch(small_cfg, b=2, src_t=21, tgt_t=13, seed=7)
    tr = _trainer(small_cfg, mesh)
    s1 = _state(small_cfg, seed=1)
    s1, met1 = tr.train_step(s1, [batch], jax.random.PRNGKey(0), lr_scale=1.0)
    tr2 = _trainer(small_cfg, mesh)
    s2 = _state(small_cfg, seed=1)
    s2, met2 = tr2.train_step(s2, [batch], jax.random.PRNGKey(0),
                              lr_scale=0.1)
    assert abs(met2["lr"] - 0.1 * met1["lr"]) < 1e-9


def test_flat_optimizer_matches_tree_path(small_cfg, tmp_path):
    """flat_optimizer=True (one-buffer adam core) must produce the same
    training trajectory as the per-leaf optax path, and its checkpoints
    stay in the per-leaf layout (loadable by a tree-path run)."""
    import jax
    import numpy as np
    from s2st_tpu.models import s2st_transformer as m
    from s2st_tpu.parallel.mesh import make_mesh
    from s2st_tpu.train.checkpoint import (restore_state,
                                           save_checkpoint_file)
    from s2st_tpu.train.losses import LossConfig
    from s2st_tpu.train.optim import (adam_state_is_flat, build_optimizer,
                                      inverse_sqrt_schedule)
    from s2st_tpu.train.trainer import Trainer, create_train_state
    from tests.conftest import make_batch

    mesh = make_mesh(dp=8)
    lcfg = LossConfig(ctc_weight=0.3, asr_ce_weight=0.3, st_ce_weight=0.3)
    batch = make_batch(small_cfg, b=8, src_t=33, tgt_t=17)

    def run(flat):
        tx = build_optimizer("adam", betas=(0.9, 0.98))
        v = m.init_s2st(jax.random.PRNGKey(0), small_cfg)
        tr = Trainer(small_cfg, lcfg, tx,
                     inverse_sqrt_schedule(1e-3, warmup_updates=4), mesh,
                     clip_norm=1.0, flat_optimizer=flat)
        st = tr.place_state(create_train_state(v, tx))
        assert adam_state_is_flat(st.opt_state) == flat
        losses = []
        for i in range(4):
            st, mm = tr.train_step(st, [batch], jax.random.PRNGKey(7))
            losses.append(mm["loss"])
        return st, losses

    st_flat, l_flat = run(True)
    st_tree, l_tree = run(False)
    np.testing.assert_allclose(l_flat, l_tree, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_flat.params["decoder"]["feat_proj"]["w"],
                   np.float32),
        np.asarray(st_tree.params["decoder"]["feat_proj"]["w"],
                   np.float32), atol=2e-5)

    # checkpoint: flat state saves per-leaf; loads into BOTH layouts
    path = str(tmp_path / "flat_ckpt.npz")
    save_checkpoint_file(path, st_flat)
    restored_tree, _ = restore_state(st_tree, path)
    assert not adam_state_is_flat(restored_tree.opt_state)
    restored_flat, _ = restore_state(st_flat, path)
    assert adam_state_is_flat(restored_flat.opt_state)
    idx = 0 if not isinstance(st_tree.opt_state,
                              tuple) else 0
    mu_tree = jax.tree_util.tree_leaves(
        restored_tree.opt_state)[1]  # count, then first mu leaf
    assert np.isfinite(np.asarray(mu_tree, np.float32)).all()


def test_adam_bf16_stats(small_cfg, tmp_path):
    """--adam-bf16-stats (reference --fp16-adam-stats, fairseq/optim/
    adam.py): moments stored bf16, update math fp32. The trajectory must
    track the fp32-stats run closely, the flat core must carry the dtype,
    and checkpoints must round-trip it."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from s2st_tpu.models import s2st_transformer as m
    from s2st_tpu.parallel.mesh import make_mesh
    from s2st_tpu.train.checkpoint import (restore_state,
                                           save_checkpoint_file)
    from s2st_tpu.train.losses import LossConfig
    from s2st_tpu.train.optim import (_find_adam, adam_state_is_flat,
                                      build_optimizer,
                                      inverse_sqrt_schedule)
    from s2st_tpu.train.trainer import Trainer, create_train_state
    from tests.conftest import make_batch

    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    lcfg = LossConfig(ctc_weight=0.3, asr_ce_weight=0.3, st_ce_weight=0.3)
    batch = make_batch(small_cfg, b=4, src_t=33, tgt_t=17)

    def run(stats_dtype, flat):
        kw = {} if stats_dtype is None else dict(stats_dtype=stats_dtype)
        tx = build_optimizer("adam", betas=(0.9, 0.98), **kw)
        v = m.init_s2st(jax.random.PRNGKey(0), small_cfg)
        tr = Trainer(small_cfg, lcfg, tx,
                     inverse_sqrt_schedule(1e-3, warmup_updates=4), mesh,
                     clip_norm=1.0, flat_optimizer=flat)
        st = tr.place_state(create_train_state(v, tx))
        losses = []
        for i in range(4):
            st, mm = tr.train_step(st, [batch], jax.random.PRNGKey(7))
            losses.append(mm["loss"])
        return st, losses

    st_bf, l_bf = run(jnp.bfloat16, flat=True)
    st_f32, l_f32 = run(None, flat=True)
    assert adam_state_is_flat(st_bf.opt_state)
    _, core = _find_adam(st_bf.opt_state)
    assert core.mu.dtype == jnp.bfloat16 and core.nu.dtype == jnp.bfloat16
    # bf16 moments perturb the trajectory slightly, not grossly
    np.testing.assert_allclose(l_bf, l_f32, rtol=2e-2)

    # tree (non-flat) path carries the dtype too
    st_bt, l_bt = run(jnp.bfloat16, flat=False)
    _, core_t = _find_adam(st_bt.opt_state)
    mu_leaf = jax.tree_util.tree_leaves(core_t.mu)[0]
    assert mu_leaf.dtype == jnp.bfloat16
    np.testing.assert_allclose(l_bt, l_bf, rtol=2e-3)

    # checkpoint: per-leaf bf16 on disk, restores into the flat layout
    path = str(tmp_path / "bf16_ckpt.npz")
    save_checkpoint_file(path, st_bf)
    restored, _ = restore_state(st_bf, path)
    assert adam_state_is_flat(restored.opt_state)
    _, rcore = _find_adam(restored.opt_state)
    assert rcore.mu.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(rcore.mu, np.float32),
        np.asarray(core.mu, np.float32), atol=0)
