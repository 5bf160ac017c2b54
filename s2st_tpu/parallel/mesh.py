"""Device mesh + sharding rules (replaces the reference's entire distributed
layer: DDP/FSDP wrappers, Megatron TP groups, NCCL/XLA collective shims —
fairseq/distributed/*, fairseq/models/distributed_fairseq_model.py).

Design (SURVEY.md §2.6): one ``jax.sharding.Mesh`` with axes
  data  — batch (data parallel; gradient psum inserted by XLA),
  fsdp  — parameter/optimizer-state sharding (ZeRO-ish),
  model — tensor parallel (column/row-parallel matmuls, vocab-parallel
          embeddings/output projections).

Rules are path-based over the param pytree; XLA/GSPMD inserts all
collectives (all-gather for fsdp params, reduce-scatter/psum for grads,
all-reduce across the model axis) — no hand-written NCCL/MPI calls.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, fsdp: int = 1, tp: int = 1,
              pp: int = 1, devices=None) -> Mesh:
    """Axes: data (DP), fsdp (ZeRO), model (TP), stage (pipeline).

    The stage axis is consumed by parallel.pipeline.pipeline_apply
    (GPipe schedule; reference --pipeline-balance/-devices/-chunks,
    fairseq/dataclass/configs.py:361-419)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp * pp) == 0, (n, fsdp, tp, pp)
        dp = n // (fsdp * tp * pp)
    assert dp * fsdp * tp * pp == n, \
        f"mesh {dp}x{fsdp}x{tp}x{pp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp, tp, pp)
    return Mesh(arr, ("data", "fsdp", "model", "stage"))


# ---------------------------------------------------------------------------
# parameter partitioning
# ---------------------------------------------------------------------------

# (regex over "/"-joined path, spec builder). First match wins.
# Column-parallel: shard output dim on "model"; row-parallel: input dim.
_RULES: Tuple[Tuple[str, Any], ...] = (
    # attention projections: q/k/v column-parallel, out row-parallel
    (r".*/(self_attn|cross_attn)/(q|k|v)/w$", P(None, "model")),
    (r".*/(self_attn|cross_attn)/(q|k|v)/b$", P("model")),
    (r".*/(self_attn|cross_attn)/out/w$", P("model", None)),
    (r".*/(self_attn|cross_attn)/out/b$", P()),
    # FFN: fc1 column, fc2 row
    (r".*/fc1/w$", P(None, "model")),
    (r".*/fc1/b$", P("model")),
    (r".*/fc2/w$", P("model", None)),
    (r".*/fc2/b$", P()),
    # vocab-parallel OUTPUT projections (the big-vocab CE surface). Input
    # embedding tables are deliberately NOT vocab-sharded: XLA's sharding
    # propagation handles a gather from a vocab-sharded operand with an
    # "involuntary full rematerialization" (replicate-then-repartition of
    # the embedded activations, spmd_partitioner.cc:652 — measured: the
    # r2 MULTICHIP warnings came exactly from this rule), and the tables
    # are tiny next to activations. Megatron-style masked-gather+psum
    # embedding is a possible future Pallas/shard_map op if vocab grows.
    (r".*/out_proj/w$", P(None, "model")),
    (r".*/ctc_proj/w$", P(None, "model")),
    (r".*/ctc_proj/b$", P("model")),
    # subsampler convs: shard output channels
    (r".*/subsample/conv\d+/w$", P(None, None, "model")),
    (r".*/subsample/conv\d+/b$", P("model")),
)

# Opt-in (S2STConfig.vocab_parallel_embed): aux-decoder embedding tables
# vocab-sharded for the Megatron masked-gather+psum shard_map op
# (parallel/vocab_parallel.py). fsdp must NOT also shard these leaves —
# the op's in_spec is exactly P("model", None); an fsdp-sharded D dim
# would conflict with the ids' batch-row fsdp sharding inside the op.
_VOCAB_PARALLEL_RULES: Tuple[Tuple[str, Any], ...] = (
    (r".*/(aux_asr_decoder|aux_st_decoder)/embed/w$", P("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _with_fsdp(spec: P, shape: Tuple[int, ...], fsdp_size: int) -> P:
    """Add fsdp sharding on the largest unsharded, divisible dim."""
    if fsdp_size <= 1 or not shape:
        return spec
    parts = list(spec) + [None] * (len(shape) - len(spec))
    cand = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in cand:
        if parts[i] is None and shape[i] % fsdp_size == 0 and shape[i] >= 2 * fsdp_size:
            parts[i] = "fsdp"
            return P(*parts)
    return spec


def param_spec(path, leaf, mesh: Mesh, use_fsdp: bool = True,
               vocab_parallel: bool = False) -> P:
    s = _path_str(path)
    tp_size = mesh.shape.get("model", 1)
    if vocab_parallel and tp_size > 1:
        for pattern, rule_spec in _VOCAB_PARALLEL_RULES:
            if re.match(pattern, s) and leaf.shape[0] % tp_size == 0:
                return rule_spec  # never fsdp-extended (see _VOCAB_PARALLEL_RULES)
    # pre-stacked pipeline stacks (parallel.pipeline.stack_pipeline_tree):
    # leading layer axis sharded over "stage" so pipeline_apply's
    # P("stage") in_spec consumes the state layout with NO resharding
    # (r2 verdict Weak #1); TP rules apply to the shifted dims below.
    stacked = "layers_stacked" in s
    offset = 1 if stacked else 0
    spec = P(*(["stage"] * offset))
    if tp_size > 1:
        for pattern, rule_spec in _RULES:
            if re.match(pattern, s):
                # only apply if divisible
                parts = (["stage"] * offset) + list(rule_spec) \
                    + [None] * (len(leaf.shape) - len(rule_spec) - offset)
                ok = all(p is None or p == "stage"
                         or leaf.shape[i] % tp_size == 0
                         for i, p in enumerate(parts))
                if ok:
                    spec = P(*parts[:len(leaf.shape)])
                break
    if use_fsdp:
        spec = _with_fsdp(spec, leaf.shape, mesh.shape.get("fsdp", 1))
    return spec


def variables_shardings(variables, mesh: Mesh, use_fsdp: bool = True,
                        vocab_parallel: bool = False):
    """NamedSharding pytree matching a {"params","stats"} variables tree."""
    def assign(path, leaf):
        s = _path_str(path)
        if s.startswith("stats"):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_spec(path, leaf, mesh, use_fsdp,
                                              vocab_parallel))
    return jax.tree_util.tree_map_with_path(assign, variables)


def batch_spec(leaf) -> P:
    """Shard the batch dim over (data, fsdp); replicate scalars."""
    if getattr(leaf, "ndim", 0) == 0:
        return P()
    return P(("data", "fsdp"))


def batch_shardings(batch, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, batch_spec(leaf)), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def put_batch(batch, mesh: Mesh):
    """Device-put a host batch with batch-dim sharding.

    Single-process: one jax.device_put over the whole pytree — issuing one
    transfer per leaf costs a full dispatch round trip each on
    remote-attached TPUs.

    Multi-process: each process holds its ROW SLICE of the global batch
    (iterators.py row sharding); the global jax.Array is assembled with
    ``jax.make_array_from_process_local_data`` — the SPMD replacement for
    the reference's per-rank independent batches + NCCL grad all-reduce
    (fairseq/data/iterators.py:446-459 + trainer.py:823-827). Scalars
    (identical on every process by construction) replicate."""
    clean = {k: v for k, v in batch.items()
             if not isinstance(v, (list, str, type(None)))}
    nproc = jax.process_count()
    if nproc == 1:
        shardings = {k: NamedSharding(mesh, batch_spec(np.asarray(v)))
                     for k, v in clean.items()}
        return jax.device_put(clean, shardings)
    out = {}
    for k, v in clean.items():
        arr = np.asarray(v)
        sh = NamedSharding(mesh, batch_spec(arr))
        if arr.ndim == 0:
            gshape = arr.shape
        else:
            gshape = (arr.shape[0] * nproc,) + arr.shape[1:]
        out[k] = jax.make_array_from_process_local_data(sh, arr, gshape)
    return out
