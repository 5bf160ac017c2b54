"""Checkpointing (parity: fairseq/checkpoint_utils.py).

Format: a single ``.npz`` per checkpoint with "/"-joined pytree paths as
keys, plus a pickled JSON-able metadata blob (step, epoch, iterator state,
val metrics, config echo). This keeps checkpoint averaging
(scripts/average_checkpoints.py parity) a pure numpy operation.

Feature parity: checkpoint_last / checkpoint_best / checkpoint{N} file set
(:69-115), keep-best-K by metric + retention GC (:138-187), resume incl.
iterator state (:190-278), component-wise pretrained load
(load_pretrained_component_from_model :784), checkpoint averaging.
"""

from __future__ import annotations

import json
import logging
import os
import re
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_SEP = "::"


def _host_array(x) -> np.ndarray:
    """Fetch a leaf to host. Multi-host FSDP/TP arrays are not fully
    addressable from one process — gather them (fairseq analogue: rank-0
    consolidated state_dict, trainer.py:205-230)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    # ONE batched device_get for every fully-addressable leaf: device_get
    # on a list starts async copies for all leaves before blocking, so the
    # fetch pipelines into a single transfer wave instead of ~700 serial
    # round trips (on the tunneled chip the per-leaf path made each
    # checkpoint save cost minutes); multi-host shards still gather per
    # leaf via _host_array
    addressable = [leaf for _, leaf in leaves
                   if not (isinstance(leaf, jax.Array)
                           and not leaf.is_fully_addressable)]
    fetched = iter(jax.device_get(addressable))
    flat = {}
    for path, leaf in leaves:
        parts = []
        for k in path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            val = _host_array(leaf)
        else:
            val = np.asarray(next(fetched))
        flat[prefix + _SEP.join(parts)] = val
    return flat


def unflatten_into(tree, flat: Dict[str, np.ndarray], prefix="",
                   strict: bool = True):
    """Rebuild a pytree with the same structure as `tree` from flat arrays."""
    def rebuild(path, leaf):
        parts = []
        for k in path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        key = prefix + _SEP.join(parts)
        if key not in flat:
            if strict:
                raise KeyError(f"checkpoint missing {key}")
            return leaf
        arr = flat[key]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch for {key}: "
                             f"ckpt {arr.shape} vs model {leaf.shape}")
        if arr.dtype.kind == "V":
            # npz stores ml_dtypes (bfloat16 moments under
            # --adam-bf16-stats) as raw void bytes; reinterpret
            arr = arr.view(np.dtype(leaf.dtype))
        return jnp.asarray(arr, dtype=leaf.dtype)
    return jax.tree_util.tree_map_with_path(rebuild, tree)


def _flatten_state(state, extra_meta: Optional[Dict] = None) -> Dict:
    """Host-side flat dict for a TrainState (one batched device fetch)."""
    from ..parallel.pipeline import tree_is_stacked, unstack_pipeline_tree
    from .optim import adam_state_is_flat, unflatten_adam_state
    params, opt_state = state.params, state.opt_state
    if adam_state_is_flat(opt_state):
        # flat-core optimizer (train/optim.py): checkpoints keep the
        # per-leaf optax layout
        opt_state = unflatten_adam_state(opt_state, params)
    if tree_is_stacked(params):
        params = unstack_pipeline_tree(params)
        opt_state = unstack_pipeline_tree(opt_state)
    flat = {}
    flat.update(flatten_tree(params, "params" + _SEP))
    flat.update(flatten_tree(state.stats, "stats" + _SEP))
    flat.update(flatten_tree(opt_state, "opt" + _SEP))
    meta = dict(extra_meta or {})
    meta["step"] = int(jax.device_get(state.step))
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    return flat


def save_checkpoint_files(paths, state, extra_meta: Optional[Dict] = None):
    """Write ONE state to several checkpoint names (epoch N + last + best
    all snapshot the same update): flatten/fetch once, np.savez once,
    hard-link the remaining names (copy when the fs refuses links). The
    naive loop paid a full device fetch + gigabyte write per name."""
    flat = _flatten_state(state, extra_meta)
    if jax.process_index() != 0:
        # multi-host: the flatten above is a COLLECTIVE (process_allgather
        # of sharded leaves) so every process reaches it; only rank 0
        # touches the filesystem (fairseq trainer.py:205-212)
        return
    step = json.loads(bytes(flat["__meta__"]))["step"]
    first = paths[0]
    tmp = first + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, first)
    logger.info(f"saved checkpoint to {first} (step {step})")
    for path in paths[1:]:
        tmp = path + ".tmp.npz"
        try:
            if os.path.exists(tmp):
                os.unlink(tmp)
            os.link(first, tmp)
        except OSError:
            import shutil
            shutil.copyfile(first, tmp)
        os.replace(tmp, path)
        logger.info(f"saved checkpoint to {path} (step {step})")


def save_checkpoint_file(path: str, state, extra_meta: Optional[Dict] = None):
    """state: TrainState-like with params/stats/opt_state/step.

    Checkpoints are always written in the per-layer layout: a pipeline-
    parallel run's pre-stacked state (parallel.pipeline) is unstacked here
    so its checkpoints load into non-PP runs (and torch export) unchanged."""
    save_checkpoint_files([path], state, extra_meta)


def peek_meta(path: str) -> Dict:
    """Read only the ``__meta__`` member of a checkpoint (cheap: npz members
    decompress lazily) — used to learn the quantization stage before
    building the restore template."""
    with np.load(path, allow_pickle=False) as z:
        if "__meta__" in z.files:
            return json.loads(bytes(z["__meta__"].tobytes()).decode("utf-8"))
    return {}


def load_checkpoint_file(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__").tobytes()).decode("utf-8")) \
        if "__meta__" in flat else {}
    return flat, meta


def restore_state(state, path: str, reset_optimizer: bool = False):
    """Returns (new_state, meta). Accepts a pre-stacked (pipeline-parallel)
    live state: the per-layer checkpoint is loaded through an unstacked
    template and the result restacked to match the input layout."""
    from ..parallel.pipeline import (stack_pipeline_tree, tree_is_stacked,
                                     unstack_pipeline_tree)
    from .optim import (adam_state_is_flat, flatten_adam_state,
                        unflatten_adam_state)
    stacked = tree_is_stacked(state.params)
    flat_opt = adam_state_is_flat(state.opt_state)
    tmpl_params = unstack_pipeline_tree(state.params) if stacked \
        else state.params
    tmpl_opt = unflatten_adam_state(state.opt_state, state.params) \
        if flat_opt else state.opt_state
    if stacked:
        tmpl_opt = unstack_pipeline_tree(tmpl_opt)
    fdict, meta = load_checkpoint_file(path)
    # iPQ checkpoints: rewrite plain-weight template subtrees to the
    # quantized {"centroids","assignments"} layout the checkpoint carries
    # (no-op otherwise) — lets eval CLIs load mid-/post-iPQ checkpoints
    tmpl_params = adapt_template_to_quantized(tmpl_params, fdict,
                                              "params" + _SEP)
    params = unflatten_into(tmpl_params, fdict, "params" + _SEP)
    stats = unflatten_into(state.stats, fdict, "stats" + _SEP, strict=False)
    if reset_optimizer:
        # drop ONLY optimizer state/step; epoch/iterator meta survives —
        # fairseq resets the dataloader with --reset-dataloader alone
        # (checkpoint_utils.load_checkpoint:190-236), the caller decides
        opt_state, step = state.opt_state, state.step
        if stacked:
            params = stack_pipeline_tree(params)
    else:
        opt_state = unflatten_into(tmpl_opt, fdict, "opt" + _SEP,
                                   strict=False)
        step = jnp.asarray(meta.get("step", 0), jnp.int32)
        if stacked:
            params = stack_pipeline_tree(params)
            opt_state = stack_pipeline_tree(opt_state)
        if flat_opt:
            opt_state = flatten_adam_state(opt_state, params)
    new_state = type(state)(params=params, stats=stats, opt_state=opt_state,
                            step=step)
    return new_state, meta


def load_variables_any(path: str, template=None):
    """Load {"params","stats"} from either our .npz format or a reference
    fairseq torch .pt checkpoint (auto-detected by extension)."""
    if path.endswith(".pt") or path.endswith(".bin"):
        from ..models.torch_import import load_fairseq_checkpoint
        return load_fairseq_checkpoint(path)
    flat, _ = load_checkpoint_file(path)
    assert template is not None, "npz load needs a template tree"
    params_tmpl = adapt_template_to_quantized(template["params"], flat,
                                              "params" + _SEP)
    return {
        "params": unflatten_into(params_tmpl, flat, "params" + _SEP),
        "stats": unflatten_into(template["stats"], flat, "stats" + _SEP,
                                strict=False),
    }


def adapt_template_to_quantized(params, flat: Dict[str, np.ndarray],
                                prefix: str):
    """iPQ checkpoints store quantized layers as centroids/assignments
    (pq/modules/qlinear.py layout) where a fresh model has a plain weight.
    Rewrite the template's {"w": ...} subtrees to the quantized shape when
    the checkpoint says so, so eval CLIs can load mid-/post-iPQ checkpoints
    without knowing the quantization config."""
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        key = prefix + k
        if (isinstance(v, dict) and "w" in v
                and key + _SEP + "centroids" in flat):
            nv = {"centroids": jnp.zeros(
                      flat[key + _SEP + "centroids"].shape, jnp.float32),
                  "assignments": jnp.zeros(
                      flat[key + _SEP + "assignments"].shape, jnp.int32)}
            if "b" in v:
                nv["b"] = v["b"]
            out[k] = nv
        elif isinstance(v, dict):
            out[k] = adapt_template_to_quantized(v, flat, key + _SEP)
        else:
            out[k] = v
    return out


def load_pretrained_component(variables, path: str, component: str):
    """Warm-start one component ("encoder"/"decoder"/...) from a checkpoint
    (checkpoint_utils.load_pretrained_component_from_model parity).
    Accepts our .npz or a fairseq .pt."""
    if path.endswith(".pt") or path.endswith(".bin"):
        loaded = load_variables_any(path)
        new_params = dict(variables["params"])
        src = loaded["params"][component]
        # shape-check against the template
        jax.tree_util.tree_map(
            lambda a, b: (_ for _ in ()).throw(ValueError(
                f"shape mismatch {a.shape} vs {b.shape}"))
            if tuple(np.asarray(a).shape) != tuple(b.shape) else None,
            src, variables["params"][component])
        new_params[component] = jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(a, b.dtype), src,
            variables["params"][component])
        return {"params": new_params, "stats": variables["stats"]}
    flat, _ = load_checkpoint_file(path)
    prefix = "params" + _SEP + component + _SEP
    sub = {k[len("params" + _SEP):]: v for k, v in flat.items()
           if k.startswith(prefix)}
    new_params = dict(variables["params"])
    new_params[component] = unflatten_into(
        variables["params"][component],
        {k[len(component + _SEP):]: v for k, v in sub.items()})
    return {"params": new_params, "stats": variables["stats"]}


# ---------------------------------------------------------------------------
# async writes
# ---------------------------------------------------------------------------

class _AsyncWriter:
    """Single background worker draining a FIFO of checkpoint-write
    closures (fetch + serialize + GC). One worker keeps writes ordered, so
    checkpoint_last is always the newest enqueued state."""

    def __init__(self):
        import queue
        import threading
        self._q: "queue.Queue" = queue.Queue()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._run, name="ckpt-writer", daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            try:
                if fn is not None:
                    fn()
            except BaseException as e:  # surfaced on next submit/wait
                self._err = e
            finally:
                self._q.task_done()

    def _reraise(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, fn):
        self._reraise()
        self._q.put(fn)

    def wait(self):
        self._q.join()
        self._reraise()


def _snapshot_state(state):
    """On-device copy of a TrainState's arrays, as ONE compiled program
    (per-leaf eager copies would pay a dispatch round trip each on a
    remote backend). The copy's buffers are fresh — the training loop may
    immediately re-enter the donating train step while the background
    thread fetches the snapshot."""
    tree = (state.params, state.stats, state.opt_state, state.step)
    params, stats, opt_state, step = _copy_tree(tree)
    view = SimpleNamespace(params=params, stats=stats,
                           opt_state=opt_state, step=step)
    return view


@jax.jit
def _copy_tree(tree):
    # jit WITHOUT donation: outputs cannot alias inputs, so this is a real
    # device-side materialization of new buffers
    return jax.tree_util.tree_map(jnp.copy, tree)


# ---------------------------------------------------------------------------
# save-dir policy
# ---------------------------------------------------------------------------

class CheckpointManager:
    """checkpoint_last / checkpoint_best / epoch & update checkpoints with
    keep-best-K / keep-last-N retention (checkpoint_utils.py:34-187 parity)."""

    def __init__(self, save_dir: str, best_checkpoint_metric: str = "loss",
                 maximize_best_checkpoint_metric: bool = False,
                 keep_best_checkpoints: int = -1, keep_last_epochs: int = -1,
                 keep_interval_updates: int = -1,
                 no_epoch_checkpoints: bool = False,
                 no_save_optimizer_state: bool = False,
                 write_asynchronously: bool = False):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.metric = best_checkpoint_metric
        self.maximize = maximize_best_checkpoint_metric
        self.keep_best = keep_best_checkpoints
        self.keep_last_epochs = keep_last_epochs
        self.keep_interval_updates = keep_interval_updates
        self.no_epoch_checkpoints = no_epoch_checkpoints
        self.best: Optional[float] = None
        # async writes (--write-checkpoints-asynchronously; reference:
        # checkpoint_utils.py:513 ioPath async_write). Multi-host keeps the
        # sync path: the flatten is a collective and a background thread
        # cannot guarantee cross-process ordering against training-step
        # collectives.
        self.async_writer: Optional[_AsyncWriter] = (
            _AsyncWriter() if write_asynchronously
            and jax.process_count() == 1 else None)
        if jax.process_index() == 0:
            # probe writability up-front (checkpoint_utils.py:815 parity)
            probe = self.save_dir / ".writability_probe"
            probe.write_text("ok")
            probe.unlink()

    def save(self, state, epoch: int, val_metric: Optional[float] = None,
             end_of_epoch: bool = True, num_updates: Optional[int] = None,
             extra_meta: Optional[Dict] = None):
        meta = dict(extra_meta or {})
        meta["epoch"] = epoch
        # every name written here snapshots the SAME state: collect them
        # and let save_checkpoint_files fetch/serialize once + link
        targets = []
        if val_metric is not None:
            meta["val_metric"] = float(val_metric)
            if self.best is None or (val_metric > self.best if self.maximize
                                     else val_metric < self.best):
                self.best = float(val_metric)
                targets.append("checkpoint_best.npz")
        wrote_epoch = end_of_epoch and not self.no_epoch_checkpoints
        if wrote_epoch:
            targets.append(f"checkpoint{epoch}.npz")
        wrote_interval = not end_of_epoch and num_updates is not None
        if wrote_interval:
            # mid-epoch update checkpoint (--save-interval-updates;
            # checkpoint_utils.py:74-78 checkpoint_{epoch}_{updates}.pt)
            targets.append(f"checkpoint_{epoch}_{num_updates}.npz")
        if val_metric is not None and self.keep_best > 0:
            targets.append(f"checkpoint.best_{self.metric}_"
                           f"{val_metric:.3f}."
                           f"{int(jax.device_get(state.step))}.npz")
        targets.append("checkpoint_last.npz")
        paths = [str(self.save_dir / t) for t in targets]
        gc_best = val_metric is not None and self.keep_best > 0

        def write_and_gc(snap):
            save_checkpoint_files(paths, snap, meta)
            if wrote_epoch:
                self._gc_epochs()
            if wrote_interval:
                self._gc_updates()
            if gc_best:
                self._gc_best()

        if self.async_writer is not None:
            # on-device snapshot first: the caller's next train step may
            # donate+overwrite the live state's buffers while we fetch
            snap = _snapshot_state(state)
            self.async_writer.submit(lambda: write_and_gc(snap))
        else:
            write_and_gc(state)

    def _gc_epochs(self):
        if self.keep_last_epochs <= 0 or jax.process_index() != 0:
            return
        ckpts = []
        for p in self.save_dir.glob("checkpoint[0-9]*.npz"):
            mt = re.fullmatch(r"checkpoint(\d+)\.npz", p.name)
            if mt:
                ckpts.append((int(mt.group(1)), p))
        for _, p in sorted(ckpts)[:-self.keep_last_epochs]:
            p.unlink()

    def _gc_updates(self):
        if self.keep_interval_updates <= 0 or jax.process_index() != 0:
            return
        ckpts = []
        for p in self.save_dir.glob("checkpoint_[0-9]*_[0-9]*.npz"):
            mt = re.fullmatch(r"checkpoint_(\d+)_(\d+)\.npz", p.name)
            if mt:
                ckpts.append((int(mt.group(2)), p))
        for _, p in sorted(ckpts)[:-self.keep_interval_updates]:
            p.unlink()

    def _gc_best(self):
        if jax.process_index() != 0:
            return
        pat = re.compile(
            rf"checkpoint\.best_{re.escape(self.metric)}_(-?[\d.]+)\.(\d+)\.npz")
        scored = []
        for p in self.save_dir.glob("checkpoint.best_*.npz"):
            mt = pat.fullmatch(p.name)
            if mt:
                scored.append((float(mt.group(1)), p))
        scored.sort(key=lambda x: x[0], reverse=self.maximize)
        for _, p in scored[self.keep_best:]:
            p.unlink()

    def wait(self):
        """Block until every enqueued async write has hit the filesystem
        (no-op in sync mode). Call before process exit and before reading
        files this manager wrote."""
        if self.async_writer is not None:
            self.async_writer.wait()

    def last_checkpoint(self) -> Optional[str]:
        self.wait()
        p = self.save_dir / "checkpoint_last.npz"
        return str(p) if p.is_file() else None


def average_checkpoints(paths: List[str]) -> Dict[str, np.ndarray]:
    """Parameter averaging (scripts/average_checkpoints.py parity); averages
    params (fp32 accumulate) and keeps the last checkpoint's stats/meta."""
    acc: Dict[str, np.ndarray] = {}
    meta = {}
    n = len(paths)
    for path in paths:
        flat, meta = load_checkpoint_file(path)
        for k, v in flat.items():
            if k.startswith("params" + _SEP):
                v64 = v.astype(np.float64) if np.issubdtype(v.dtype, np.floating) else v
                acc[k] = acc.get(k, 0) + v64 / n
            else:
                acc[k] = v  # stats/opt: keep last
    out = {}
    for k, v in acc.items():
        if k.startswith("params" + _SEP) and np.issubdtype(np.asarray(v).dtype, np.floating):
            with np.load(paths[-1]) as z:
                ref_dtype = z[k].dtype
            out[k] = np.asarray(v, dtype=ref_dtype)
        else:
            out[k] = np.asarray(v)
    out["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    return out
