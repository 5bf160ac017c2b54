"""Checkpointing: save/restore roundtrip, best-K retention GC, component
warm-start, averaging (checkpoint_utils.py + scripts/average_checkpoints.py
parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import s2st_transformer as m
from s2st_tpu.train.checkpoint import (CheckpointManager, average_checkpoints,
                                       load_checkpoint_file,
                                       load_pretrained_component,
                                       restore_state, save_checkpoint_file)
from s2st_tpu.train.optim import adam
from s2st_tpu.train.trainer import create_train_state


@pytest.fixture()
def state(tiny_cfg):
    variables = m.init_s2st(jax.random.PRNGKey(1), tiny_cfg)
    s = create_train_state(variables, adam())
    return type(s)(params=s.params, stats=s.stats, opt_state=s.opt_state,
                   step=jnp.asarray(7, jnp.int32))


def _tree_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip(tmp_path, state):
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint_file(p, state, {"epoch": 3, "val_metric": 1.5})
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    blank = type(state)(params=zeroed, stats=state.stats,
                        opt_state=state.opt_state,
                        step=jnp.zeros((), jnp.int32))
    restored, meta = restore_state(blank, p)
    _tree_equal(restored.params, state.params)
    _tree_equal(restored.opt_state, state.opt_state)
    assert int(restored.step) == 7
    assert meta["epoch"] == 3


def test_restore_reset_optimizer(tmp_path, state):
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint_file(p, state, {"epoch": 3})
    restored, meta = restore_state(state, p, reset_optimizer=True)
    assert int(restored.step) == int(state.step)
    # meta (incl. epoch/iterator position) survives: only --reset-dataloader
    # discards it, and that decision belongs to the caller (fairseq
    # checkpoint_utils.load_checkpoint:190-236 semantics)
    assert meta.get("epoch") == 3


def test_component_warm_start(tmp_path, state, tiny_cfg):
    p = str(tmp_path / "pre.npz")
    save_checkpoint_file(p, state)
    fresh = m.init_s2st(jax.random.PRNGKey(99), tiny_cfg)
    warm = load_pretrained_component(fresh, p, "encoder")
    _tree_equal(warm["params"]["encoder"], state.params["encoder"])
    # decoder untouched
    _tree_equal(warm["params"]["decoder"], fresh["params"]["decoder"])


def test_manager_best_k_and_epoch_gc(tmp_path, state):
    mgr = CheckpointManager(str(tmp_path), best_checkpoint_metric="mcd_loss",
                            keep_best_checkpoints=2, keep_last_epochs=2)
    for epoch, metric in enumerate([5.0, 3.0, 4.0, 2.0], start=1):
        mgr.save(state, epoch, val_metric=metric)
    files = {p.name for p in tmp_path.iterdir()}
    assert "checkpoint_last.npz" in files
    assert "checkpoint_best.npz" in files
    # keep_last_epochs=2 -> only epochs 3,4 survive
    assert "checkpoint3.npz" in files and "checkpoint4.npz" in files
    assert "checkpoint1.npz" not in files
    # keep_best=2 -> the two lowest metrics (2.0, 3.0) survive
    best = sorted(f for f in files if f.startswith("checkpoint.best_"))
    assert len(best) == 2
    assert any("2.000" in b for b in best) and any("3.000" in b for b in best)
    # checkpoint_best tracks the running best (metric 2.0)
    _, meta = load_checkpoint_file(str(tmp_path / "checkpoint_best.npz"))
    assert meta["val_metric"] == 2.0


def test_average_checkpoints(tmp_path, state):
    paths = []
    for i in range(3):
        scaled = jax.tree_util.tree_map(lambda x: x * (i + 1.0), state.params)
        s = type(state)(params=scaled, stats=state.stats,
                        opt_state=state.opt_state, step=state.step)
        p = str(tmp_path / f"c{i}.npz")
        save_checkpoint_file(p, s)
        paths.append(p)
    avg = average_checkpoints(paths)
    np.savez(str(tmp_path / "avg.npz"), **avg)
    restored, _ = restore_state(state, str(tmp_path / "avg.npz"))
    expect = jax.tree_util.tree_map(lambda x: x * 2.0, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_async_save_matches_sync_and_survives_donation(tmp_path, state):
    """--write-checkpoints-asynchronously: the background write must
    snapshot the state BEFORE the training loop's next donating step can
    reuse the live buffers, and the file set/bytes must match sync mode."""
    sync_dir, async_dir = tmp_path / "sync", tmp_path / "async"
    CheckpointManager(str(sync_dir)).save(state, 1, val_metric=2.0)

    mgr = CheckpointManager(str(async_dir), write_asynchronously=True)
    assert mgr.async_writer is not None
    mgr.save(state, 1, val_metric=2.0)
    # immediately clobber the live state through a DONATING jit, the way
    # the real train step does (trainer.py donate_argnums)
    clobber = jax.jit(
        lambda t: jax.tree_util.tree_map(lambda x: x * 0 - 1, t),
        donate_argnums=(0,))
    clobber((state.params, state.opt_state))
    mgr.wait()

    for name in ("checkpoint_last.npz", "checkpoint1.npz",
                 "checkpoint_best.npz"):
        fa, ma = load_checkpoint_file(str(async_dir / name))
        fs, ms = load_checkpoint_file(str(sync_dir / name))
        assert ma["step"] == ms["step"] == 7
        assert set(fa) == set(fs)
        for k in fs:
            np.testing.assert_array_equal(fa[k], fs[k])


def test_async_save_gc_and_last_checkpoint_wait(tmp_path, state):
    mgr = CheckpointManager(str(tmp_path), best_checkpoint_metric="loss",
                            keep_last_epochs=2, write_asynchronously=True)
    for epoch in range(1, 5):
        mgr.save(state, epoch)
    # last_checkpoint() drains the queue before looking at the directory
    assert mgr.last_checkpoint() is not None
    files = {p.name for p in tmp_path.iterdir()}
    assert "checkpoint4.npz" in files and "checkpoint3.npz" in files
    assert "checkpoint1.npz" not in files
