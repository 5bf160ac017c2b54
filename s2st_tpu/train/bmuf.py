"""BMUF — block-momentum model averaging for periodic-sync data
parallelism (Chen & Huo 2016).

Parity: ``fairseq/optim/bmuf.py`` — workers run ``--global-sync-iter``
local optimizer steps between syncs; at a sync the block gradient
G = global_params - local_params is averaged across workers, smoothed
with block momentum (m' = BM * m + block_lr * mean(G)), and the global
model steps to global_params - m' (with an optional Nesterov lookahead
params = global - (1+BM) * m'); during ``--warmup-iterations`` the sync
is a plain parameter average/broadcast.

TPU-native: the reference's dist.all_reduce over NCCL becomes one jitted
sync program over a stacked (R, ...) replica axis (at scale: a shard_map
mean over the ``data`` mesh axis between the per-replica local-step jit
programs — BMUF exists precisely so the per-step program contains NO
cross-replica collective).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BMUFConfig:
    block_lr: float = 1.0
    block_momentum: float = 0.875
    global_sync_iter: int = 50
    warmup_iterations: int = 500
    use_nbm: bool = True          # Nesterov block momentum
    average_sync: bool = False


def bmuf_init(params) -> Dict[str, Any]:
    """global_params = the last synced model; smoothed_grads = m."""
    return {
        "global_params": jax.tree_util.tree_map(jnp.asarray, params),
        "smoothed_grads": jax.tree_util.tree_map(jnp.zeros_like, params),
    }


def bmuf_sync(replica_params, state: Dict[str, Any], cfg: BMUFConfig
              ) -> Tuple[Any, Dict[str, Any]]:
    """One block sync (bmuf.py _block_sync :76-94).

    replica_params: pytree whose leaves carry a leading replica axis R
    (each row = one worker's params after its local steps). Returns the
    (replicated) new params and the new state."""
    def leaf(local, global_p, m):
        grad = global_p[None] - local                  # (R, ...)
        mean_grad = jnp.mean(grad, axis=0)
        if cfg.block_momentum == 0.0:
            new_p = jnp.mean(local, axis=0)
            return new_p, global_p, m
        m_new = cfg.block_momentum * m + cfg.block_lr * mean_grad
        new_p = global_p - m_new
        new_global = new_p
        if cfg.use_nbm:
            new_p = new_p - cfg.block_momentum * m_new
        return new_p, new_global, m_new

    out = jax.tree_util.tree_map(
        leaf, replica_params, state["global_params"],
        state["smoothed_grads"])
    new_params = jax.tree_util.tree_map(lambda t: t[0], out,
                                        is_leaf=lambda x: isinstance(
                                            x, tuple))
    new_global = jax.tree_util.tree_map(lambda t: t[1], out,
                                        is_leaf=lambda x: isinstance(
                                            x, tuple))
    new_m = jax.tree_util.tree_map(lambda t: t[2], out,
                                   is_leaf=lambda x: isinstance(x, tuple))
    return new_params, {"global_params": new_global,
                        "smoothed_grads": new_m}


def warmup_sync(replica_params, state: Dict[str, Any],
                average: bool = False) -> Tuple[Any, Dict[str, Any]]:
    """Warmup sync (bmuf.py _warmup_sync :110-125): broadcast rank 0's
    model (or the average with --average-sync); momentum resets to the
    synced point."""
    pick = (lambda x: jnp.mean(x, axis=0)) if average else \
        (lambda x: x[0])
    new_params = jax.tree_util.tree_map(pick, replica_params)
    return new_params, bmuf_init(new_params)
