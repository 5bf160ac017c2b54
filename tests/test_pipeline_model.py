"""Pipeline parallelism WIRED INTO the S2ST model: training with a stage
mesh axis must reproduce the DP-only loss trajectory (gradients flow
through pipeline_apply's shard_map/ppermute/scan).

Reference analogue: the torch-Pipe pipeline transformer trains end-to-end
(fairseq/model_parallel/models/pipeline_parallel_transformer/model.py,
--pipeline-balance/-devices/-chunks flags, dataclass/configs.py:361-419).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import s2st_transformer as m
from s2st_tpu.parallel.mesh import make_mesh
from s2st_tpu.train.losses import LossConfig, s2st_loss
from s2st_tpu.train.optim import build_optimizer, inverse_sqrt_schedule
from s2st_tpu.train.trainer import Trainer, create_train_state
from tests.conftest import make_batch


@pytest.fixture(scope="module")
def det_cfg(tiny_cfg):
    """Deterministic tiny config: PP shares dropout rng across microbatches,
    so exact trajectory equality needs dropout == 0."""
    return tiny_cfg.replace(dropout=0.0, attention_dropout=0.0,
                            activation_dropout=0.0, prenet_dropout=0.0,
                            postnet_dropout=0.0)


def _run(mesh, cfg, n_steps=4, pp_chunks=1):
    variables = m.init_s2st(jax.random.PRNGKey(0), cfg)
    lcfg = LossConfig(ctc_weight=0.5, asr_ce_weight=0.3, st_ce_weight=0.3,
                      attn_loss_weight=0.2, label_smoothing=0.1)
    tx = build_optimizer("adam")
    trainer = Trainer(cfg, lcfg, tx, inverse_sqrt_schedule(1e-3, 10),
                      mesh, clip_norm=1.0, loss_fn=s2st_loss,
                      pp_chunks=pp_chunks)
    state = trainer.place_state(create_train_state(variables, tx))
    batch = make_batch(cfg, b=4, src_t=24, tgt_t=12, seed=5)
    losses = []
    for i in range(n_steps):
        state, metrics = trainer.train_step(
            state, [batch], jax.random.fold_in(jax.random.PRNGKey(7), i))
        losses.append(metrics["loss"])
    return np.asarray(losses)


def test_pp_matches_dp_loss_trajectory(det_cfg):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    devs = jax.devices()[:4]
    dp_losses = _run(make_mesh(devices=devs), det_cfg)
    pp_losses = _run(make_mesh(dp=2, pp=2, devices=devs), det_cfg,
                     pp_chunks=2)
    assert np.isfinite(dp_losses).all()
    np.testing.assert_allclose(pp_losses, dp_losses, rtol=2e-4, atol=2e-4)
    # training actually moved (gradients flowed through the pipeline)
    assert dp_losses[-1] != dp_losses[0]


def test_pp_cli_flags(tmp_path):
    """--pp-size/--pipeline-chunks through the training CLI."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-device virtual mesh")
    from s2st_tpu.cli.train import main as train_main
    from tests.make_tiny_corpus import make_tiny_corpus
    corpus = make_tiny_corpus(tmp_path / "corpus")
    rc = train_main([
        str(corpus), "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--task", "s2s_translation", "--arch", "s2st_transformer",
        "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "2", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0,1",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--max-tokens", "4000", "--required-batch-size-multiple", "8",
        "--batch-size", "8",
        "--max-epoch", "1", "--lr", "0.001",
        "--dp-size", "4", "--pp-size", "2", "--pipeline-chunks", "2",
        "--disable-validation",
    ])
    assert rc == 0
    assert (tmp_path / "ckpt" / "checkpoint_last.npz").exists()


def test_pp_composes_with_tp(det_cfg):
    """tp2 x stage2: tensor-parallel sharded matmuls inside pipeline
    stages — the remaining untested mesh-axis composition."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    devs = jax.devices()[:4]
    losses = _run(make_mesh(dp=1, tp=2, pp=2, devices=devs), det_cfg,
                  n_steps=2, pp_chunks=2)
    ref = _run(make_mesh(devices=devs), det_cfg, n_steps=2)
    assert np.isfinite(losses).all()
    np.testing.assert_allclose(losses, ref, rtol=5e-4, atol=5e-4)


def test_stacked_state_checkpoint_interchange(det_cfg, tmp_path):
    """A pipeline run's pre-stacked TrainState saves PER-LAYER checkpoints
    that load into non-PP runs, and vice versa (parallel.pipeline
    stack/unstack at the train/checkpoint.py boundary)."""
    import jax
    import numpy as np
    from s2st_tpu.models import s2st_transformer as m
    from s2st_tpu.parallel.mesh import make_mesh
    from s2st_tpu.parallel.pipeline import (stack_pipeline_tree,
                                            tree_is_stacked,
                                            unstack_pipeline_tree)
    from s2st_tpu.train.checkpoint import (restore_state,
                                           save_checkpoint_file)
    from s2st_tpu.train.losses import LossConfig
    from s2st_tpu.train.optim import adam, inverse_sqrt_schedule
    from s2st_tpu.train.trainer import Trainer, create_train_state

    cfg = det_cfg
    tx = adam()
    variables = m.init_s2st(jax.random.PRNGKey(3), cfg)

    # stack/unstack roundtrip preserves every leaf
    stacked = stack_pipeline_tree(variables["params"])
    assert tree_is_stacked(stacked)
    back = unstack_pipeline_tree(stacked)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables["params"])[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # PP trainer state -> checkpoint -> restore into a NON-PP state
    pp_mesh = make_mesh(dp=4, pp=2)
    tr = Trainer(cfg, LossConfig(), tx,
                 inverse_sqrt_schedule(1e-3, warmup_updates=4), pp_mesh,
                 pp_chunks=2)
    pp_state = tr.place_state(create_train_state(variables, tx))
    assert tree_is_stacked(pp_state.params)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint_file(path, pp_state)

    plain = create_train_state(m.init_s2st(jax.random.PRNGKey(9), cfg), tx)
    restored, _ = restore_state(plain, path)
    assert not tree_is_stacked(restored.params)
    np.testing.assert_allclose(
        np.asarray(restored.params["encoder"]["layer0"]["fc1"]["w"]),
        np.asarray(variables["params"]["encoder"]["layer0"]["fc1"]["w"]),
        atol=1e-6)

    # and back INTO a stacked state
    restored_pp, _ = restore_state(pp_state, path)
    assert tree_is_stacked(restored_pp.params)
    np.testing.assert_allclose(
        np.asarray(restored_pp.params["encoder"]["layers_stacked"]
                   ["fc1"]["w"][0]),
        np.asarray(variables["params"]["encoder"]["layer0"]["fc1"]["w"]),
        atol=1e-6)
