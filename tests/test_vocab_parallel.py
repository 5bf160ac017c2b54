"""Megatron-style vocab-parallel embedding (parallel/vocab_parallel.py):
op exactness + gradient, sharding-rule assignment, and end-to-end trainer
equivalence on a TP mesh vs replicated tables.

Reference reaches the same machinery through fairseq.model_parallel's
megatron VocabParallelEmbedding (fairseq/model_parallel/models/
transformer.py:48-77); here it is one shard_map with a psum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from s2st_tpu.models import s2st_transformer as m
from s2st_tpu.parallel.mesh import make_mesh, variables_shardings
from s2st_tpu.parallel.vocab_parallel import vocab_parallel_embedding
from s2st_tpu.train.losses import LossConfig
from s2st_tpu.train.optim import adam, inverse_sqrt_schedule
from s2st_tpu.train.trainer import Trainer, create_train_state
from tests.conftest import make_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def test_op_matches_plain_gather_and_grad():
    mesh = make_mesh(dp=2, fsdp=1, tp=4)
    V, D = 16, 8
    table = jax.random.normal(jax.random.PRNGKey(0), (V, D))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 6), 0, V)
    table_s = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh, P(("data", "fsdp"))))

    out = jax.jit(lambda t, i: vocab_parallel_embedding(t, i, mesh))(
        table_s, ids_s)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(table, ids, axis=0)))

    g_vp = jax.jit(jax.grad(lambda t: jnp.sum(jnp.sin(
        vocab_parallel_embedding(t, ids_s, mesh)))))(table_s)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.sin(
        jnp.take(t, ids, axis=0))))(table)
    np.testing.assert_allclose(np.asarray(g_vp), np.asarray(g_ref), rtol=1e-6)
    # grads are born vocab-sharded: no resharding in the backward pass
    assert g_vp.sharding.spec == P("model", None)


def _aux_cfg(vp: bool):
    return m.S2STConfig(
        src_vocab_size=20, tgt_vocab_size=20, input_feat_per_channel=8,
        conv_kernel_sizes=(5,), conv_channels=16,
        encoder_layers=1, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, middle_layers=(0,),
        decoder_layers=1, decoder_embed_dim=16, decoder_ffn_embed_dim=32,
        decoder_attention_heads=2, output_frame_dim=8,
        prenet_layers=1, prenet_dim=8, postnet_layers=1, postnet_conv_dim=8,
        ctc=False, aux_asr=True, aux_st=True,
        asr_decoder_layers=1, asr_decoder_embed_dim=16,
        st_decoder_layers=1, st_decoder_embed_dim=16,
        max_source_positions=128, max_target_positions=128,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        prenet_dropout=0.0, postnet_dropout=0.0,
        dtype=jnp.float32, vocab_parallel_embed=vp)


def test_sharding_rule_assignment():
    cfg = _aux_cfg(vp=True)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    variables = m.init_s2st(jax.random.PRNGKey(0), cfg)
    sh = variables_shardings(variables, mesh, vocab_parallel=True)
    embed_sh = sh["params"]["aux_asr_decoder"]["embed"]["w"]
    assert embed_sh.spec == P("model", None)  # and no fsdp extension
    # without the flag the table stays replicated-or-fsdp, never model-sharded
    sh0 = variables_shardings(variables, mesh, vocab_parallel=False)
    assert "model" not in jax.tree_util.tree_leaves(
        [sh0["params"]["aux_asr_decoder"]["embed"]["w"].spec])


def test_trainer_tp_equivalence():
    """TP=2 training with vocab-parallel aux embeddings matches TP=2 with
    replicated tables step for step (the op is numerically exact)."""
    lcfg = LossConfig(asr_ce_weight=1.0, st_ce_weight=1.0,
                      label_smoothing=0.1)
    batch = make_batch(_aux_cfg(False), b=4, src_t=21, tgt_t=13, seed=3)
    rng = jax.random.PRNGKey(7)

    def run(vp):
        cfg = _aux_cfg(vp)
        mesh = make_mesh(dp=2, fsdp=2, tp=2)
        tr = Trainer(cfg, lcfg, adam(),
                     inverse_sqrt_schedule(1e-3, warmup_updates=4), mesh,
                     clip_norm=1.0)
        assert tr.vocab_parallel == vp
        st = tr.place_state(create_train_state(
            m.init_s2st(jax.random.PRNGKey(0), cfg), adam()))
        if vp:
            assert st.params["aux_asr_decoder"]["embed"]["w"]\
                .sharding.spec == P("model", None)
        out = []
        for i in range(3):
            st, mm = tr.train_step(st, [batch], jax.random.fold_in(rng, i))
            out.append((mm["loss"], mm["aux_asr_loss"], mm["gnorm"]))
        return np.asarray(out)

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a, b, rtol=1e-5)
    assert a[0][1] > 0  # the aux path actually contributed loss
