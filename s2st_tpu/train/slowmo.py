"""SlowMo — slow momentum over periodic-sync data parallelism
(Wang et al. 2020, "SlowMo: Improving Communication-Efficient Distributed
SGD with Slow Momentum").

Parity: the reference enables fairscale's ``SlowMoDistributedDataParallel``
via ``--ddp-backend slowmo`` (`fairseq/models/distributed_fairseq_model.py:
92-121`; `trainer.py:914-918` calls ``perform_slowmo`` after each optimizer
step). Semantics reproduced here:

- **base algorithm = localsgd**: workers run ``--localsgd-frequency`` local
  optimizer steps, then parameters are all-reduce averaged (the reference's
  ``sgp`` gossip variant is a bandwidth optimization of the same average —
  on TPU the ICI all-reduce IS the fast path, so localsgd is the native
  form; gossip is pointless when the interconnect does the mean in one op).
- **slow momentum step** at each sync (fairscale's
  ``_global_momentum_step``): with ``old_p`` = the slow (outer) params and
  ``p`` = the averaged fast params,

      buf   = slowmo_momentum * buf + (old_p - p) / base_lr
      old_p = old_p - slowmo_lr * base_lr * buf
      p     = old_p

  ``base_lr`` is the inner optimizer's current LR; ``slowmo_lr`` = 1.0 (the
  value fairseq always uses — it does not expose the flag).
- the world-size-tuned default momentum table
  (`distributed_fairseq_model.py:101-109`).

TPU-native: like BMUF (train/bmuf.py), the sync is one jitted program over
a stacked (R, ...) replica axis; at scale the mean becomes a psum over the
``data`` mesh axis between per-replica local-step programs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def default_slowmo_momentum(world_size: int) -> float:
    """distributed_fairseq_model.py:101-109 tuning table."""
    if world_size <= 16:
        return 0.0
    if world_size <= 32:
        return 0.2
    if world_size <= 64:
        return 0.5
    return 0.6


@dataclass(frozen=True)
class SlowMoConfig:
    slowmo_momentum: float = 0.5
    slowmo_lr: float = 1.0          # fairseq leaves fairscale's default
    localsgd_frequency: int = 3     # steps between syncs


def slowmo_init(params) -> Dict[str, Any]:
    """old_params = the slow/outer model; momentum buffers start at 0."""
    return {
        "old_params": jax.tree_util.tree_map(jnp.asarray, params),
        "momentum": jax.tree_util.tree_map(jnp.zeros_like, params),
    }


def slowmo_sync(replica_params, state: Dict[str, Any], cfg: SlowMoConfig,
                base_lr) -> Tuple[Any, Dict[str, Any]]:
    """One sync: average over the replica axis, then the slow momentum
    step. replica_params leaves carry a leading replica axis R. Returns
    (new params to broadcast back, new state). With slowmo_momentum == 0
    this reduces to plain local-SGD parameter averaging."""
    base_lr = jnp.asarray(base_lr, jnp.float32)

    def leaf(local, old_p, buf):
        avg = jnp.mean(local, axis=0)
        if cfg.slowmo_momentum == 0.0:
            return avg, avg, buf
        new_buf = (cfg.slowmo_momentum * buf
                   + (old_p - avg) / base_lr)
        new_old = old_p - cfg.slowmo_lr * base_lr * new_buf
        return new_old, new_old, new_buf

    out = jax.tree_util.tree_map(leaf, replica_params,
                                 state["old_params"], state["momentum"])
    is_t = lambda x: isinstance(x, tuple)  # noqa: E731
    new_params = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is_t)
    new_old = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is_t)
    new_buf = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is_t)
    return new_params, {"old_params": new_old, "momentum": new_buf}
