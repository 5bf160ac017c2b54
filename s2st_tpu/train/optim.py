"""Optimizers + LR schedules (parity: fairseq/optim/*, fairseq/optim/lr_scheduler/*).

Implemented on optax. The fairseq update semantics are reproduced in
``trainer.py``: grads are summed over microbatches and workers, multiplied by
1/sample_size, clipped by global norm, then stepped (trainer.py:823-873).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# LR schedules: step (0-based num_updates) -> lr. fairseq convention is
# 1-based num_updates after the first step; we call with (updates + 1).
# ---------------------------------------------------------------------------

def inverse_sqrt_schedule(lr: float, warmup_updates: int = 4000,
                          warmup_init_lr: float = -1.0) -> Callable:
    """fairseq/optim/lr_scheduler/inverse_square_root_schedule.py:31-85."""
    if warmup_init_lr < 0:
        warmup_init_lr = 0.0 if warmup_updates > 0 else lr
    lr_step = (lr - warmup_init_lr) / max(warmup_updates, 1)
    decay_factor = lr * warmup_updates ** 0.5 if warmup_updates > 0 else lr

    def sched(num_updates):
        num_updates = jnp.asarray(num_updates, jnp.float32)
        warm = warmup_init_lr + num_updates * lr_step
        decay = decay_factor * jax.lax.rsqrt(jnp.maximum(num_updates, 1.0))
        return jnp.where(num_updates < warmup_updates, warm, decay)
    return sched


def fixed_schedule(lr: float, warmup_updates: int = 0) -> Callable:
    def sched(num_updates):
        num_updates = jnp.asarray(num_updates, jnp.float32)
        frac = jnp.minimum((num_updates + 1) / max(warmup_updates, 1), 1.0)
        return jnp.where(warmup_updates > 0, lr * frac, lr)
    return sched


def polynomial_decay_schedule(lr: float, total_num_update: int,
                              warmup_updates: int = 0, end_learning_rate: float = 0.0,
                              power: float = 1.0) -> Callable:
    def sched(num_updates):
        t = jnp.asarray(num_updates, jnp.float32)
        warm = lr * t / max(warmup_updates, 1)
        pct = 1.0 - (t - warmup_updates) / max(total_num_update - warmup_updates, 1)
        decay = (lr - end_learning_rate) * jnp.maximum(pct, 0.0) ** power \
            + end_learning_rate
        return jnp.where(t < warmup_updates, warm, decay)
    return sched


def cosine_schedule(lr: float, warmup_updates: int, max_update: int,
                    min_lr: float = 0.0) -> Callable:
    def sched(num_updates):
        t = jnp.asarray(num_updates, jnp.float32)
        warm = min_lr + (lr - min_lr) * t / max(warmup_updates, 1)
        pct = (t - warmup_updates) / max(max_update - warmup_updates, 1)
        cos = min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(jnp.pi * jnp.minimum(pct, 1.0)))
        return jnp.where(t < warmup_updates, warm, cos)
    return sched


def tri_stage_schedule(lr: float, warmup_steps: int, hold_steps: int,
                       decay_steps: int, init_lr_scale: float = 0.01,
                       final_lr_scale: float = 0.01) -> Callable:
    import math
    init_lr, final_lr = init_lr_scale * lr, final_lr_scale * lr

    def sched(num_updates):
        t = jnp.asarray(num_updates, jnp.float32)
        warm = init_lr + (lr - init_lr) * jnp.minimum(t / max(warmup_steps, 1), 1.0)
        decay_t = jnp.clip(t - warmup_steps - hold_steps, 0, decay_steps)
        factor = -math.log(max(final_lr_scale, 1e-8)) / max(decay_steps, 1)
        decay = lr * jnp.exp(-factor * decay_t)
        out = jnp.where(t < warmup_steps, warm,
                        jnp.where(t < warmup_steps + hold_steps, lr, decay))
        return jnp.maximum(out, final_lr)
    return sched


SCHEDULE_REGISTRY: dict = {}


def _register_schedules():
    SCHEDULE_REGISTRY.update({
        "inverse_sqrt": inverse_sqrt_schedule,
        "fixed": fixed_schedule,
        "polynomial_decay": polynomial_decay_schedule,
        "cosine": cosine_schedule,
        "tri_stage": tri_stage_schedule,
        "step": step_schedule,
        "triangular": triangular_schedule,
        "pass_through": pass_through_schedule,
        "reduce_lr_on_plateau": reduce_on_plateau_schedule,
        "reduce_on_plateau": reduce_on_plateau_schedule,
        "manual": manual_schedule,
    })


def step_schedule(lr: float, warmup_updates: int = 0,
                  decay_updates: int = 50000, decay_factor: float = 0.5
                  ) -> Callable:
    def sched(num_updates):
        import jax.numpy as jnp
        warm = jnp.minimum(num_updates / max(warmup_updates, 1), 1.0)
        n_decays = jnp.floor(num_updates / decay_updates)
        return lr * warm * decay_factor ** n_decays
    return sched


def triangular_schedule(lr: float, warmup_updates: int = 0,
                        max_lr: float = None, period: int = 5000) -> Callable:
    max_lr = max_lr or lr * 10
    def sched(num_updates):
        import jax.numpy as jnp
        cycle = jnp.abs((num_updates / period) % 2.0 - 1.0)
        return lr + (max_lr - lr) * (1.0 - cycle)
    return sched


def pass_through_schedule(lr: float, **kw) -> Callable:
    return lambda num_updates: lr


def manual_schedule(lr: float, epoch2lr: dict = None,
                    update2lr: dict = None) -> Callable:
    """fairseq optim/lr_scheduler/manual_lr_scheduler.py parity: piecewise
    lr by update count (jittable staircase over the sorted breakpoints).

    epoch2lr cannot be resolved inside a compiled update-indexed schedule
    (epoch boundaries are data-dependent); the CLI drives it host-side via
    ``manual_lr_host`` + the trainer's ``lr_scale`` input instead. Passing
    epoch2lr here is therefore an error rather than a silent no-op."""
    if epoch2lr:
        raise ValueError(
            "manual_schedule cannot apply epoch2lr on device; use "
            "manual_lr_host(...) and drive lr_scale from the CLI")
    import jax.numpy as jnp
    points = sorted((update2lr or {}).items())

    def sched(num_updates):
        out = jnp.asarray(lr, jnp.float32)
        for boundary, value in points:
            out = jnp.where(num_updates >= boundary,
                            jnp.asarray(value, jnp.float32), out)
        return out
    return sched


def parse_manual_lr_dict(s: str) -> dict:
    """Parse the reference's --epoch2lr/--update2lr dict strings
    (manual_lr_scheduler.py:34-53): keys may be "5", "1,2,3" (comma list)
    or "3-10" (inclusive range); values are floats."""
    import ast
    raw = ast.literal_eval(str(s).replace(" ", ""))
    if not isinstance(raw, dict):
        raise ValueError("epoch2lr/update2lr must evaluate to a dict")
    out: dict = {}
    for key, val in raw.items():
        key = str(key)
        if "," in key:
            for k in key.split(","):
                out[int(k)] = float(val)
        elif "-" in key:
            start, end = key.split("-")
            for k in range(int(start), int(end) + 1):
                out[int(k)] = float(val)
        else:
            out[int(key)] = float(val)
    return out


def manual_lr_host(lr: float, epoch2lr: Optional[dict] = None,
                   update2lr: Optional[dict] = None) -> Callable:
    """Host-side manual LR (manual_lr_scheduler.py:81-111 semantics):
    at each update the lr is update2lr[max key <= num_updates] if any such
    key exists, else epoch2lr[max key <= epoch] if any, else the base lr.
    Returns fn(epoch, num_updates) -> float; the CLI feeds it to the
    compiled step through the ``lr_scale`` input."""
    epoch2lr = epoch2lr or {}
    update2lr = update2lr or {}
    u_keys = sorted(update2lr)
    e_keys = sorted(epoch2lr)

    def fn(epoch: int, num_updates: int) -> float:
        uk = [k for k in u_keys if k <= num_updates]
        if uk:
            return update2lr[uk[-1]]
        ek = [k for k in e_keys if k <= epoch]
        if ek:
            return epoch2lr[ek[-1]]
        return lr
    return fn


def reduce_on_plateau_schedule(lr: float, warmup_updates: int = 0) -> Callable:
    """Base schedule is fixed(+warmup); the plateau shrink itself is
    host-driven via Trainer.train_step(lr_scale=...) — the compiled step
    takes the multiplier as an input (optim/lr_scheduler/
    reduce_lr_on_plateau.py parity)."""
    return fixed_schedule(lr, warmup_updates)


def build_schedule(name: str, lr: float, **kw) -> Callable:
    if not SCHEDULE_REGISTRY:
        _register_schedules()
    import inspect
    fn = SCHEDULE_REGISTRY[name]
    accepted = set(inspect.signature(fn).parameters)
    kw = {k: v for k, v in kw.items() if k in accepted}
    return fn(lr, **kw)


# ---------------------------------------------------------------------------
# optimizers (gradient transforms WITHOUT lr scaling; the trainer applies
# -lr(step) explicitly so schedules stay host-visible for logging)
# ---------------------------------------------------------------------------

def scale_by_adam_dtyped(b1: float, b2: float, eps: float,
                         stats_dtype) -> optax.GradientTransformation:
    """Adam with mu/nu STORED in ``stats_dtype`` (bf16), math in fp32.

    TPU-native equivalent of the reference's ``--fp16-adam-stats``
    (fairseq/optim/adam.py:42-47 + fp16_optimizer stats handling): halves
    the optimizer-state HBM traffic of the apply phase, trading moment
    precision. Reuses optax.ScaleByAdamState so the flat-core machinery
    below (_find_adam / flatten / unflatten) applies unchanged."""
    f32 = jnp.float32

    def init_fn(params):
        z = lambda p: jnp.zeros(p.shape, stats_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(f32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        mu_f = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
            state.mu, updates)
        nu_f = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(f32)
            + (1 - b2) * jnp.square(g.astype(f32)),
            state.nu, updates)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu_f, nu_f)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(lambda m: m.astype(stats_dtype), mu_f),
            nu=jax.tree_util.tree_map(lambda v: v.astype(stats_dtype), nu_f))
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def adam(betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0,
         stats_dtype=None) -> optax.GradientTransformation:
    """fairseq/optim/adam.py defaults (Adam w/ optional decoupled wd).
    stats_dtype: store moments in this dtype (--adam-bf16-stats)."""
    if stats_dtype is not None:
        core = scale_by_adam_dtyped(betas[0], betas[1], eps, stats_dtype)
    else:
        core = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    txs = [core]
    if weight_decay > 0:
        txs.append(optax.add_decayed_weights(weight_decay))
    return optax.chain(*txs)


def adafactor(weight_decay: float = 0.0) -> optax.GradientTransformation:
    return optax.adafactor(learning_rate=None, weight_decay_rate=weight_decay or None)


def sgd(momentum: float = 0.0) -> optax.GradientTransformation:
    if momentum > 0:
        return optax.trace(decay=momentum)
    return optax.identity()


def adagrad() -> optax.GradientTransformation:
    return optax.scale_by_rss()


def adadelta(rho: float = 0.9, eps: float = 1e-6):
    return optax.scale_by_adadelta(rho=rho, eps=eps)


def adamax(betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8):
    return optax.scale_by_adamax(b1=betas[0], b2=betas[1], eps=eps)


def nag(momentum: float = 0.99):
    """Nesterov accelerated gradient (fairseq/optim/nag.py)."""
    return optax.trace(decay=momentum, nesterov=True)


def lamb(betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0):
    """fused_lamb parity via optax (LAMB trust-ratio scaling)."""
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_trust_ratio())


def rmsprop(decay: float = 0.99, eps: float = 1e-8):
    return optax.scale_by_rms(decay=decay, eps=eps)


OPTIMIZER_REGISTRY = {
    "adam": adam,
    "adafactor": adafactor,
    "sgd": sgd,
    "adagrad": adagrad,
    "adadelta": adadelta,
    "adamax": adamax,
    "nag": nag,
    "lamb": lamb,
    "rmsprop": rmsprop,
}


def build_optimizer(name: str, **kw) -> optax.GradientTransformation:
    return OPTIMIZER_REGISTRY[name](**kw)


# ---------------------------------------------------------------------------
# flat-core optimizer state (training-time layout optimization)
#
# The param tree has ~700 leaves; running adam leaf-wise costs ~12 ms/step
# on v5e (hundreds of sub-HBM-saturating kernels) vs ~5 ms on one flat
# buffer (measured interleaved A/B, round 3). When enabled, the Trainer
# stores ScaleByAdamState.mu/.nu as single flat fp32 vectors and runs the
# whole apply phase in a handful of full-bandwidth kernels; checkpoints
# keep the per-leaf optax layout (train/checkpoint.py converts at the
# boundary, like the pipeline-parallel param stacks).
# ---------------------------------------------------------------------------

def flatten_like(template, tree=None, dtype=None):
    """Concatenate a tree's leaves (template's order) into one 1-D array."""
    import jax
    leaves = jax.tree_util.tree_leaves(tree if tree is not None else template)
    parts = [l.reshape(-1) for l in leaves]
    if dtype is not None:
        parts = [p.astype(dtype) for p in parts]
    return jnp.concatenate(parts)


def leaf_slices(template):
    """[(offset, size, shape)] in tree_leaves order."""
    import jax
    out = []
    off = 0
    for l in jax.tree_util.tree_leaves(template):
        out.append((off, l.size, l.shape))
        off += l.size
    return out


def unflatten_like(template, flat):
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    off = 0
    for l in leaves:
        out.append(flat[off:off + l.size].reshape(l.shape).astype(l.dtype))
        off += l.size
    return jax.tree_util.tree_unflatten(treedef, out)


def _find_adam(opt_state):
    """(index, ScaleByAdamState) inside a chain tuple, else None."""
    if isinstance(opt_state, optax.ScaleByAdamState):
        return -1, opt_state
    if isinstance(opt_state, tuple):
        for i, s in enumerate(opt_state):
            if isinstance(s, optax.ScaleByAdamState):
                return i, s
    return None


def adam_state_is_flat(opt_state) -> bool:
    found = _find_adam(opt_state)
    if not found:
        return False
    return not isinstance(found[1].mu, dict)


def _replace_adam(opt_state, new_adam):
    idx, _ = _find_adam(opt_state)
    if idx == -1:
        return new_adam
    lst = list(opt_state)
    lst[idx] = new_adam
    return tuple(lst)


def flatten_adam_state(opt_state, params):
    """Per-leaf optax adam state -> flat-core layout (mu/nu one vector).
    Returns None when the structure isn't a plain adam chain."""
    found = _find_adam(opt_state)
    if not found or adam_state_is_flat(opt_state):
        return opt_state if found else None
    _, st = found
    # dtype preserved: fp32 for plain adam, bf16 under --adam-bf16-stats
    flat = optax.ScaleByAdamState(
        count=st.count,
        mu=flatten_like(params, st.mu),
        nu=flatten_like(params, st.nu))
    return _replace_adam(opt_state, flat)


def unflatten_adam_state(opt_state, params):
    """Flat-core -> per-leaf optax layout (checkpoint format)."""
    if not adam_state_is_flat(opt_state):
        return opt_state
    _, st = _find_adam(opt_state)
    # per-leaf template in the stats dtype (fp32, or bf16 under
    # --adam-bf16-stats — the checkpoint keeps the storage dtype, like
    # the reference's fp16 stats)
    tmpl = jax.tree_util.tree_map(
        lambda p: jax.ShapeDtypeStruct(p.shape, st.mu.dtype), params)
    tree = optax.ScaleByAdamState(
        count=st.count,
        mu=unflatten_like(tmpl, st.mu),
        nu=unflatten_like(tmpl, st.nu))
    return _replace_adam(opt_state, tree)
