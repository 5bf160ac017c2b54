"""BASE layer (Lewis et al. 2021) — MoE with balanced token-to-expert
assignment.

Parity: ``fairseq/modules/base_layer.py`` — orthogonal expert centroids
route tokens by affinity; training uses the BALANCED auction assignment
(every expert gets exactly tokens/num_experts tokens), inference the
greedy top-1; routed tokens pass the expert's residual FFN sublayer gated
by sigmoid(affinity), then return to their positions.

TPU-native: the reference all_to_all's tokens across data-parallel
workers (one expert per GPU); here the experts live in one program — the
balanced assignment (an inherently sequential host auction, the C++ op in
the reference) enters the jitted graph through ``jax.pure_callback`` and
the dispatch/return are gathers. At scale the expert dimension shards
over the mesh's ``data`` axis with ``ppermute``-based all_to_all.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.balanced_assignment import balanced_assignment
from .core import Params, get_activation, layer_norm, layer_norm_init, \
    linear, linear_init


@dataclass(frozen=True)
class BaseLayerConfig:
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_experts: int = 4
    sublayers: int = 1
    activation_fn: str = "relu"


def init_base_layer(key, cfg: BaseLayerConfig) -> Params:
    ks = iter(jax.random.split(key, 2 + 2 * cfg.sublayers
                               * cfg.num_experts))
    # orthogonal(gain=0.1) centroids (base_layer.py:19-21)
    a = jax.random.normal(next(ks), (cfg.num_experts, cfg.embed_dim))
    q, _ = jnp.linalg.qr(a.T)
    centroids = 0.1 * q.T[:cfg.num_experts]
    p: Params = {"expert_centroids": centroids}
    for e in range(cfg.num_experts):
        for s in range(cfg.sublayers):
            fc2 = linear_init(next(ks), cfg.ffn_dim, cfg.embed_dim)
            # BaseSublayer zero-inits ff2 (base_layer.py:111): the expert
            # starts as identity and the gate learns when to use it
            fc2["w"] = jnp.zeros_like(fc2["w"])
            p[f"expert{e}_sub{s}"] = {
                "ln": layer_norm_init(cfg.embed_dim),
                "fc1": linear_init(next(ks), cfg.embed_dim, cfg.ffn_dim),
                "fc2": fc2,
            }
    return p


def _expert_ffn(p: Params, cfg: BaseLayerConfig, e: int,
                x: jnp.ndarray) -> jnp.ndarray:
    act = get_activation(cfg.activation_fn)
    for s in range(cfg.sublayers):
        lp = p[f"expert{e}_sub{s}"]
        h = layer_norm(lp["ln"], x)
        x = x + linear(lp["fc2"], act(linear(lp["fc1"], h)))
    return x


def base_layer_forward(p: Params, cfg: BaseLayerConfig, x: jnp.ndarray,
                       train: bool = True) -> jnp.ndarray:
    """x: (N, C) token features -> (N, C). Training routes with the
    balanced auction; capacity per expert = N // num_experts exactly."""
    n, c = x.shape
    e = cfg.num_experts
    assert n % e == 0, "token count must divide num_experts"
    # routing scores carry NO gradient (reference computes them under
    # no_grad, base_layer.py:40-42); the gate's dot product below does
    affinities = jax.lax.stop_gradient(
        jnp.dot(x, p["expert_centroids"].T))                # (N, E)

    def host_assign(scores):
        return balanced_assignment(
            np.asarray(scores, np.float32)).astype(np.int32)

    sort_by_expert = jax.pure_callback(
        host_assign,
        jax.ShapeDtypeStruct((n,), jnp.int32),
        affinities)
    routed = x[sort_by_expert]                              # (N, C)
    blocks = routed.reshape(e, n // e, c)
    outs = jnp.stack([_expert_ffn(p, cfg, ei, blocks[ei])
                      for ei in range(e)])
    routed_out = outs.reshape(n, c)
    # gate: sigmoid(routed · expert centroid), DIFFERENTIABLE into the
    # centroids (base_layer.py:52-53 recomputes the dot outside no_grad)
    expert_of_row = jnp.repeat(jnp.arange(e), n // e)
    gate_aff = jnp.sum(routed * p["expert_centroids"][expert_of_row],
                       axis=-1)
    alpha = jax.nn.sigmoid(gate_aff)[:, None]
    routed_out = alpha * routed_out + (1 - alpha) * routed
    # return tokens to their original positions
    out = jnp.zeros_like(x).at[sort_by_expert].set(routed_out)
    return out
