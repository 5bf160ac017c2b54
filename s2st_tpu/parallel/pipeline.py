"""Pipeline parallelism: GPipe-style microbatched stage execution.

Parity: the reference's torch-Pipe pipeline transformer
(``fairseq/model_parallel/models/pipeline_parallel_transformer/`` +
``--pipeline-balance/--pipeline-devices/--pipeline-chunks`` flags,
``fairseq/dataclass/configs.py:361-419``). There, layers are partitioned
over devices and torch Pipe threads microbatches through them.

TPU-native design: one ``stage`` mesh axis; per-layer parameters are
STACKED on a leading layer axis and sharded over stages; inside
``shard_map`` each stage scans its local layer block and passes boundary
activations to the next stage with ``ppermute`` over ICI. Microbatching
(= ``--pipeline-chunks``) hides the pipeline bubble: with M microbatches
and S stages, utilization is M/(M+S-1).

The schedule is the classic GPipe loop: at tick t, stage s processes
microbatch t-s (when 0 <= t-s < M); activations enter at stage 0 and leave
at stage S-1.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(layer_params_list):
    """[{...}, {...}] per-layer pytrees -> one pytree with leading layer
    axis (sharded over the stage axis by pipeline_apply)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *layer_params_list)


def pipeline_apply(layer_fn: Callable, stacked_params, x: jnp.ndarray,
                   mesh: Mesh, n_micro: int, axis: str = "stage",
                   static_args: Tuple = ()) -> jnp.ndarray:
    """Run L stacked layers over the `axis` mesh dimension as a pipeline.

    layer_fn(params_i, h, *static_args) -> h  applies ONE layer.
    stacked_params: pytree with leading dim L (L % n_stages == 0).
    x: (B, ...) batch; B % n_micro == 0. Returns layer-L output, identical
    (up to fp reassociation) to sequentially applying all layers.
    """
    n_stages = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert L % n_stages == 0, (L, n_stages)
    b = x.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    per_stage = L // n_stages

    # microbatch axis up front: (M, mb, ...)
    xm = x.reshape((n_micro, mb) + x.shape[1:])

    param_spec = jax.tree_util.tree_map(
        lambda leaf: P(axis), stacked_params)

    def stage_body(params_local, xm_local):
        """Runs on ONE stage. params_local: leading dim per_stage.
        xm_local: full (M, mb, ...) — replicated input; only stage 0's
        copy is consumed."""
        sid = jax.lax.axis_index(axis)

        def run_block(h):
            def one(h, lp):
                return layer_fn(lp, h, *static_args), None
            h, _ = jax.lax.scan(one, h, params_local)
            return h

        n_ticks = n_micro + n_stages - 1
        zero = jnp.zeros_like(xm_local[0])
        outputs = jnp.zeros_like(xm_local)

        def tick(carry, t):
            recv, outputs = carry
            midx = t - sid                      # microbatch this stage runs
            active = (midx >= 0) & (midx < n_micro)
            # stage 0 reads fresh input; others use what arrived last tick
            h_in = jnp.where(sid == 0,
                             xm_local[jnp.clip(t, 0, n_micro - 1)], recv)
            h_out = run_block(h_in)
            h_out = jnp.where(active, h_out, zero)
            # pass to the next stage (ring; last stage's send is ignored)
            sent = jax.lax.ppermute(
                h_out, axis,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            # last stage writes its finished microbatch
            out_idx = jnp.clip(midx, 0, n_micro - 1)
            write = active & (sid == n_stages - 1)
            updated = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, h_out, outputs[out_idx]),
                out_idx, axis=0)
            return (sent, updated), None

        (_, outputs), _ = jax.lax.scan(
            tick, (zero, outputs), jnp.arange(n_ticks))
        # every stage computed an `outputs`; only the last stage's is real —
        # broadcast it to all (psum of masked copies)
        mask = (sid == n_stages - 1).astype(outputs.dtype)
        outputs = jax.lax.psum(outputs * mask, axis)
        return outputs

    try:
        fn = shard_map(stage_body, mesh=mesh,
                       in_specs=(param_spec, P()), out_specs=P(),
                       check_vma=False)
    except TypeError:  # older jax uses check_rep
        fn = shard_map(stage_body, mesh=mesh,
                       in_specs=(param_spec, P()), out_specs=P(),
                       check_rep=False)
    out = fn(stacked_params, xm)
    return out.reshape((b,) + x.shape[1:])
