"""Training CLI, flag-compatible with ``fairseq_cli.train`` for the
s2s_translation recipes (run_baseline.sh:93-118 flags).

Parity surface: epoch loop + update-freq grouping (fairseq_cli/train.py:
171-320), validate_and_save policy incl. --eval-inference MCD validation and
best-checkpoint-metric (:336-474), early-stopping patience (:208-233),
checkpoint_last resume with iterator fast-forward (checkpoint_utils.py:
190-278).

TPU-native: one device mesh (dp x fsdp x tp from flags), a jitted train
step per bucket shape, no process spawning — `jax.distributed.initialize`
would extend this to multi-host, the mesh code is already rank-agnostic.
"""

from __future__ import annotations

import logging
import math
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("s2st_tpu.train")


def main(argv: Optional[List[str]] = None, parsed_args=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout)
    if parsed_args is not None:
        # hydra_train hands over a namespace it already compiled from the
        # YAML config tree (cli/hydra_train.py); same object the two-pass
        # argparse path below yields.
        args = parsed_args
    else:
        from ..options import parse_training_args
        args = parse_training_args(argv)

    import jax
    from ..utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    from ..registry import get_task
    from ..logging_utils import ProgressLogger
    from ..parallel.mesh import make_mesh
    from ..train import checkpoint as ckpt
    from ..train.optim import build_optimizer, build_schedule
    from ..train.trainer import Trainer, create_train_state
    from ..data.iterators import GroupedIterator

    if getattr(args, "multihost", False):
        # multi-host bring-up: replaces the reference's rendezvous +
        # process-group machinery (distributed/utils.py:46-312) entirely.
        # On TPU pods initialize() auto-detects; elsewhere (e.g. the
        # 2-process CPU test) the standard JAX_* env vars configure it.
        import os
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(
                coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS"),
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        jax.distributed.initialize(**kw)
        logger.info(f"multihost: process {jax.process_index()} of "
                    f"{jax.process_count()}")
    data_rank, data_world = jax.process_index(), jax.process_count()
    is_main = data_rank == 0  # checkpoint writes are rank-0 only

    task_cls = get_task(args.task)
    task = task_cls.setup_task(args)
    model_cfg, init_fn, loss_fn = task.build_model_and_loss()
    loss_cfg = task.build_loss_config()

    # QAT: --quant-noise-pq (iPQ block noise) / --quant-noise-scalar (int8
    # fake-quant) train against transformed weights inside the fused step
    # (train/quantization.py; fairseq quant_noise.py + scalar quantize_model_)
    qn_pq = float(getattr(args, "quant_noise_pq", 0.0) or 0.0)
    qn_scalar = float(getattr(args, "quant_noise_scalar", 0.0) or 0.0)
    if qn_pq > 0 or qn_scalar > 0:
        from ..train.quantization import wrap_loss_quant_noise
        loss_fn = wrap_loss_quant_noise(
            loss_fn, pq_p=qn_pq,
            pq_block_size=getattr(args, "quant_noise_pq_block_size", 8),
            scalar_p=qn_scalar)
        logger.info(f"QAT enabled: quant_noise_pq={qn_pq} "
                    f"quant_noise_scalar={qn_scalar}")

    mesh = make_mesh(dp=args.dp_size, fsdp=args.fsdp_size, tp=args.tp_size,
                     pp=args.pp_size)
    logger.info(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    # model + optimizer
    from ..models import s2st_transformer as m
    # typed keys carry their PRNG implementation (no global config mutation):
    # --prng-impl rbg generates dropout masks with XLA's RngBitGenerator —
    # 167.6 -> 73.8 ms/step (MFU 0.151 -> 0.314) at the recipe operating
    # point on v5e vs jax's default threefry. Init stays threefry so
    # parameter initialization is impl-independent.
    init_rng = jax.random.PRNGKey(args.seed)
    train_rng = jax.random.key(
        args.seed + 1, impl=getattr(args, "prng_impl", "rbg"))
    variables = init_fn(init_rng)
    logger.info(f"model params: {m.param_count(variables):,}")

    lrs = [float(x) for x in str(args.lr).split(",")]
    warmup_init = args.warmup_init_lr if args.warmup_init_lr >= 0 else lrs[0]
    sched_kw = dict(warmup_updates=args.warmup_updates)
    if args.lr_scheduler == "inverse_sqrt":
        sched_kw["warmup_init_lr"] = warmup_init
    manual_lr = None  # host fn(epoch, num_updates) -> lr, manual sched only
    if args.lr_scheduler == "manual":
        # manual schedule (manual_lr_scheduler.py parity): epoch/update
        # breakpoints resolve HOST-side each step and reach the compiled
        # step through the lr_scale input over a constant base schedule
        from ..train.optim import manual_lr_host, parse_manual_lr_dict
        manual_lr = manual_lr_host(
            lrs[0], parse_manual_lr_dict(getattr(args, "epoch2lr", "{}")),
            parse_manual_lr_dict(getattr(args, "update2lr", "{}")))
        schedule = build_schedule("pass_through", lrs[0])
    else:
        schedule = build_schedule(args.lr_scheduler, lrs[0], **sched_kw)
    opt_kw = {}
    if args.optimizer == "adam":
        betas = eval(args.adam_betas) if isinstance(args.adam_betas, str) \
            else args.adam_betas
        opt_kw = dict(betas=tuple(betas), eps=args.adam_eps,
                      weight_decay=args.weight_decay)
        if getattr(args, "adam_bf16_stats", False):
            import jax.numpy as jnp
            opt_kw["stats_dtype"] = jnp.bfloat16
    tx = build_optimizer(args.optimizer, **opt_kw)
    # flat-core apply phase (train/optim.py): valid for plain adam without
    # weight decay; place_state additionally checks the mesh shards nothing
    flat_ok = (args.optimizer == "adam"
               and float(getattr(args, "weight_decay", 0.0) or 0.0) == 0.0
               # iPQ rewrites the param-tree structure mid-run and plants
               # int32 assignment buffers in it — keep the per-leaf path
               and not getattr(args, "quantization_config_path", None))
    trainer = Trainer(model_cfg, loss_cfg, tx, schedule, mesh,
                      clip_norm=args.clip_norm, loss_fn=loss_fn,
                      pp_chunks=args.pipeline_chunks,
                      flat_optimizer=flat_ok)
    state = create_train_state(variables, tx)

    if qn_scalar > 0:
        # amortized QAT observers (qlinear.py:41 update_step=3000 /
        # qact.py:40 update_step=1000 parity): cached scale/zero_point ride
        # the stats tree. Site discovery needs one abstract loss trace over
        # a representative batch — probe a throwaway iterator (does not
        # touch the training iterator's resume bookkeeping).
        from ..train.quantization import init_scalar_qat_cache
        probe_itr = task.get_batch_iterator(
            args.train_subset, max_tokens=args.max_tokens,
            max_sentences=args.batch_size, seed=args.seed, shuffle=False)
        probe_batch = next(iter(probe_itr.next_epoch_itr(shuffle=False)))
        qcache = init_scalar_qat_cache(
            loss_fn, {"params": state.params, "stats": state.stats},
            model_cfg, loss_cfg, probe_batch)
        state = type(state)(params=state.params,
                            stats={**state.stats, "_qscales": qcache},
                            opt_state=state.opt_state, step=state.step)
        logger.info(
            f"QAT observer cache: {qcache['w_scale'].shape[0]} weight "
            f"leaves, {qcache['act_scale'].shape[0]} activation sites "
            "(recomputed every 3000/1000 updates)")

    # frozen HuBERT frontend from a fairseq torch checkpoint
    # (build_hubert parity, s2st_transformer.py:684-697)
    if args.use_hubert and args.load_pretrained_hubert_from:
        from ..models.hubert import load_torch_hubert
        hub_params, hub_cfg = load_torch_hubert(
            args.load_pretrained_hubert_from)
        new_params = dict(state.params)
        new_params["hubert"] = hub_params
        state = type(state)(params=new_params, stats=state.stats,
                            opt_state=tx.init(new_params), step=state.step)
        logger.info(
            f"loaded pretrained hubert from {args.load_pretrained_hubert_from}")

    # component warm-starts (load_pretrained_component_from_model parity)
    for flag, comp in (("load_pretrained_encoder_from", "encoder"),
                       ("load_pretrained_decoder_from", "decoder")):
        path = getattr(args, flag, None)
        if path:
            v = ckpt.load_pretrained_component(
                {"params": state.params, "stats": state.stats}, path, comp)
            state = type(state)(params=v["params"], stats=v["stats"],
                                opt_state=state.opt_state, step=state.step)
            logger.info(f"warm-started {comp} from {path}")

    # iterative PQ driver (fairseq quantization_utils.Quantizer; one regex
    # group of layers is product-quantized per schedule span, centroids
    # keep training). Each stage rewrites the param tree -> fresh optimizer
    # state + one re-jit (the reference "reinitializes the Trainer").
    quantizer = None
    if getattr(args, "quantization_config_path", None):
        from ..train.quantization import PQQuantizer
        quantizer = PQQuantizer(args.quantization_config_path,
                                max_epoch=args.max_epoch or 0,
                                max_update=args.max_update or 0,
                                seed=args.seed)

    def _requantize(new_params):
        """Rebuild optimizer state + compiled steps around a param tree
        whose structure just changed (quantization stage boundary)."""
        from ..train.trainer import partition_params
        diff, _ = partition_params(new_params)
        st = type(state)(params=new_params, stats=state.stats,
                         opt_state=tx.init(diff), step=state.step)
        trainer.reinitialize()
        return trainer.place_state(st)

    # checkpoint manager + resume
    mgr = None
    start_epoch = 1
    itr_state = None
    resume_meta: dict = {}
    resumed = False
    if not args.no_save:
        import os as _os
        mgr = ckpt.CheckpointManager(
            args.save_dir,
            best_checkpoint_metric=args.best_checkpoint_metric,
            maximize_best_checkpoint_metric=args.maximize_best_checkpoint_metric,
            keep_best_checkpoints=args.keep_best_checkpoints,
            keep_last_epochs=args.keep_last_epochs,
            keep_interval_updates=args.keep_interval_updates,
            no_epoch_checkpoints=args.no_epoch_checkpoints,
            write_asynchronously=(
                getattr(args, "write_checkpoints_asynchronously", False)
                or _os.environ.get("S2ST_TPU_ASYNC_CHECKPOINT") == "1"))
    # --restore-file: default name -> save_dir/checkpoint_last.npz; an
    # explicit path/filename is honored as given, then under save_dir
    # (checkpoint_utils.load_checkpoint:190-236 semantics)
    restore_path = None
    restored_from_last = False
    restore_name = getattr(args, "restore_file", "checkpoint_last.npz")
    if restore_name and restore_name not in ("checkpoint_last.npz",
                                             "checkpoint_last.pt"):
        for cand in (Path(restore_name), Path(args.save_dir) / restore_name):
            if cand.is_file():
                restore_path = str(cand)
                break
        if restore_path is None:
            logger.warning(f"--restore-file {restore_name} not found; "
                           "starting fresh")
    elif mgr is not None:
        restore_path = mgr.last_checkpoint()
        restored_from_last = restore_path is not None
    if restore_path:
        if quantizer is not None:
            # a checkpoint saved mid-iPQ has quantized subtrees; replay the
            # structure transforms (n_iter=0) so the restore template
            # matches (the reference's n_iter=0 + state_dict path,
            # pq/utils.py:103-130)
            qstep = int(ckpt.peek_meta(restore_path).get(
                "quantizer_step", 0))
            if qstep > 0:
                from ..train.trainer import partition_params
                qparams = quantizer.fast_forward(state.params, qstep)
                state = type(state)(
                    params=qparams, stats=state.stats,
                    opt_state=tx.init(partition_params(qparams)[0]),
                    step=state.step)
        # model weights are ALWAYS restored; --reset-optimizer only drops
        # optimizer state/step (and restarts the epoch/iterator position),
        # matching fairseq where a reset flag nukes extra_state but never
        # skips the model load (trainer.py:440-530)
        state, resume_meta = ckpt.restore_state(
            state, restore_path, reset_optimizer=args.reset_optimizer)
        resumed = True
        if args.reset_dataloader:
            # ONLY --reset-dataloader restarts the epoch/iterator position
            # (fairseq: --reset-optimizer alone keeps extra_state's
            # train_iterator, checkpoint_utils.load_checkpoint:190-236)
            start_epoch = 1
        else:
            start_epoch = int(resume_meta.get("epoch", 0)) + 1
            itr_state = resume_meta.get("iterator")
        logger.info(f"resumed from {restore_path} at step {int(state.step)}")


    # data: every process forms the same global batches and collates its
    # row slice; put_batch assembles the global array (multi-host data
    # path — ShardedIterator + per-rank batches in the reference,
    # fairseq/data/iterators.py:446-459)
    epoch_itr = task.get_batch_iterator(
        args.train_subset, max_tokens=args.max_tokens,
        max_sentences=args.batch_size, seed=args.seed,
        shuffle=True, data_rank=data_rank, data_world=data_world)
    if itr_state:
        epoch_itr.load_state_dict(itr_state)
        start_epoch = epoch_itr.epoch

    state = trainer.place_state(state)  # commit shardings (no recompiles)
    num_updates = int(jax.device_get(state.step))  # one fetch at startup
    update_freq = [int(x) for x in str(args.update_freq).split(",")]

    eval_fn = None
    if args.eval_inference and args.arch.startswith("s2st"):
        _raw_eval = task.build_eval_inference_fn(
            model_cfg, max_iter=max(64, args.max_target_positions //
                                    max(args.n_frames_per_step, 1)))
        eval_fn = jax.jit(_raw_eval)
        eval_fn.sample_rate = getattr(_raw_eval, "sample_rate", 16000)

    progress = ProgressLogger(log_format=args.log_format,
                              log_interval=args.log_interval,
                              tensorboard_logdir=args.tensorboard_logdir,
                              log_file=args.log_file,
                              wandb_project=args.wandb_project,
                              wandb_run_name=args.wandb_run_name,
                              azureml_logging=args.azureml_logging)

    # EMA (trainer.py:924-936 parity) + diagnostics (SURVEY §5)
    from ..train.ema import EMAConfig, ema_step, init_ema
    from ..utils.diagnostics import HeartbeatWatchdog, report_nonfinite
    ema_params = None
    ema_cfg = None
    if args.store_ema:
        ema_cfg = EMAConfig(ema_decay=args.ema_decay,
                            ema_start_update=args.ema_start_update,
                            ema_update_freq=args.ema_update_freq)
        ema_params = init_ema(state.params)
        ema_path = Path(args.save_dir) / "checkpoint_last_ema.npz"
        if (resumed and restored_from_last and not args.reset_optimizer
                and ema_path.is_file()):
            # restore the EMA shadow on resume (fairseq persists EMA inside
            # the checkpoint, trainer.py:380-424; we keep a sibling npz).
            # Only when resuming from checkpoint_last — the sibling file
            # belongs to it; pairing it with an older --restore-file would
            # blend future weights into the restored run. Otherwise the
            # shadow re-seeds from the restored params.
            with np.load(str(ema_path)) as z:
                flat = {k: z[k] for k in z.files}
            ema_params = ckpt.unflatten_into(ema_params, flat, "params::")
            logger.info(f"restored EMA params from {ema_path}")
        _ema_step = jax.jit(lambda e, p, s: ema_step(ema_cfg, e, p, s))
    watchdog = HeartbeatWatchdog(args.heartbeat_timeout).start()

    max_epoch = args.max_epoch or math.inf
    max_update = args.max_update or math.inf
    patience_left = args.patience
    best_val = None
    epoch = start_epoch
    stop = False
    lr_scale = 1.0  # reduce_lr_on_plateau multiplier (host-driven)
    if resumed and not args.reset_optimizer:
        # plateau/early-stop state survives restarts (fairseq persists
        # scheduler state + `best` in checkpoints, trainer.py:380-424)
        lr_scale = float(resume_meta.get("lr_scale", 1.0))
        best_val = resume_meta.get("best_val", None)
        if best_val is not None:
            best_val = float(best_val)
        patience_left = int(resume_meta.get("patience_left", args.patience))

    from ..data.iterators import BufferedIterator

    # -- shared validate/save plumbing (mid-epoch + end-of-epoch) ----------
    _st = {"best_val": best_val, "patience_left": patience_left,
           "lr_scale": lr_scale, "stop": stop}

    def handle_val_result(val_metric):
        """Plateau shrink + early-stop patience (fairseq_cli/train.py:
        208-233). Mutates _st; returns val_metric unchanged."""
        if val_metric is None:
            return None
        better = (_st["best_val"] is None
                  or (val_metric > _st["best_val"]
                      if args.maximize_best_checkpoint_metric
                      else val_metric < _st["best_val"]))
        if better:
            _st["best_val"] = val_metric
            _st["patience_left"] = args.patience
        else:
            if args.lr_scheduler in ("reduce_lr_on_plateau",
                                     "reduce_on_plateau"):
                _st["lr_scale"] *= args.lr_shrink
                logger.info(f"plateau: lr_scale -> {_st['lr_scale']:.2e}")
            if args.patience > 0:
                _st["patience_left"] -= 1
                if _st["patience_left"] <= 0:
                    logger.info(f"early stop: no improvement in "
                                f"{args.patience} validations")
                    _st["stop"] = True
        return val_metric

    # config echo: checkpoints embed the fully-resolved flag namespace the
    # way fairseq checkpoints embed `cfg` (checkpoint_utils.py:34-56 /
    # torch_persistent_save state dict "args"/"cfg" keys) — this is what
    # lets hub.from_pretrained() rebuild the task+model with no flags
    _args_echo = {k: v for k, v in vars(args).items()
                  if isinstance(v, (bool, int, float, str, type(None)))
                  or (isinstance(v, (list, tuple))
                      and all(isinstance(x, (bool, int, float, str))
                              for x in v))}

    def save_meta(itr_sd):
        meta = {"iterator": itr_sd, "lr_scale": _st["lr_scale"],
                "best_val": _st["best_val"],
                "patience_left": _st["patience_left"],
                "args": _args_echo}
        if quantizer is not None:
            meta["quantizer_step"] = quantizer.quantization_step
        return meta

    def save_ema():
        if ema_params is not None:
            from ..train.checkpoint import flatten_tree
            # flatten gathers sharded leaves (collective) — all processes
            # participate; only rank 0 writes. The current stats (postnet
            # batch-norm running moments) ride along so the EMA file is a
            # complete eval checkpoint (generate_waveform --path ..._ema.npz
            # == fairseq's evaluate-with-EMA-weights path)
            flat = flatten_tree(ema_params, "params::")
            flat.update(flatten_tree(state.stats, "stats::"))
            if is_main:
                np.savez(str(Path(args.save_dir)
                             / "checkpoint_last_ema.npz"), **flat)

    last_validated = -1   # update count of the most recent validation —
    # prevents the end-of-epoch validate from re-running (and double-
    # shrinking plateau lr_scale / double-decrementing patience) when a
    # mid-epoch validation already ran at this exact update
    while not stop and epoch <= max_epoch:
        if args.profile and epoch == start_epoch:
            # --profile: jax trace of the first epoch (torch.cuda.profiler
            # parity, fairseq_cli/train.py:503-506)
            jax.profiler.start_trace("/tmp/s2st_tpu_profile")
        if quantizer is not None:
            qparams, changed = quantizer.begin_epoch(epoch, state.params)
            if changed:
                state = _requantize(qparams)
                if ema_params is not None:
                    # the shadow's tree structure changed: re-seed it
                    # (centroids start EMA from their post-EM values)
                    ema_params = init_ema(state.params)
        uf = update_freq[min(epoch - 1, len(update_freq) - 1)]
        # batches already consumed this epoch (mid-epoch resume offset);
        # captured BEFORE next_epoch_itr resets the iterator's own counter
        batches_done = epoch_itr.iterations_in_epoch
        # background-thread prefetch: host __getitem__/collate overlaps the
        # device step (BufferedIterator parity); DevicePrefetcher then keeps
        # the next groups' host->device transfers in flight so the compiled
        # step never waits on PCIe/tunnel bandwidth
        from ..data.iterators import DevicePrefetcher
        itr = DevicePrefetcher(
            GroupedIterator(
                BufferedIterator(epoch_itr.next_epoch_itr(shuffle=True)), uf),
            trainer._device_batch)
        inner_metrics: dict = {}
        metrics: dict = {}
        n_updates_epoch = 0
        broke_mid_epoch = False
        import time as _time
        _tick = _time.perf_counter()
        _steps_since_log = 0
        for i, (microbatches, dev_batches) in enumerate(
                progress.wrap(itr, prefix=f"epoch {epoch:03d}")):
            # rng folded from host-side counters — never fetch state.step
            # per iteration (a device round trip each time)
            step_rng = jax.random.fold_in(
                jax.random.fold_in(train_rng, epoch), num_updates)
            if manual_lr is not None:
                # manual schedule resolves host-side; base schedule is the
                # constant lrs[0], so scale = manual/base
                _st["lr_scale"] = (manual_lr(epoch, num_updates)
                                   / max(lrs[0], 1e-30))
            # metrics stay on device between log points so consecutive
            # steps pipeline without a host round trip
            want_metrics = ((i + 1) % args.log_interval == 0)
            state, metrics = trainer.train_step(state, dev_batches, step_rng,
                                                fetch_metrics=want_metrics,
                                                lr_scale=_st["lr_scale"])
            num_updates += 1
            _steps_since_log += 1
            batches_done += len(microbatches)
            watchdog.beat()
            if quantizer is not None:
                qparams, qchanged = quantizer.step_update(num_updates,
                                                          state.params)
                if qchanged:
                    state = _requantize(qparams)
                    if ema_params is not None:
                        ema_params = init_ema(state.params)
            if ema_params is not None:
                ema_params = _ema_step(ema_params, state.params, state.step)
            n_updates_epoch += 1
            if want_metrics:
                metrics = {k: float(v) for k, v in metrics.items()}
                _now = _time.perf_counter()
                _dt = max(_now - _tick, 1e-9)
                # wps/ups speed meters (trainer.py:1407 parity)
                metrics["ups"] = _steps_since_log / _dt
                metrics["wps"] = (metrics.get("sample_size", 0.0)
                                  * _steps_since_log / _dt)
                _tick, _steps_since_log = _now, 0
                if not np.isfinite(metrics.get("gnorm", 0.0)):
                    # NanDetector parity: name what went non-finite
                    logger.warning(
                        "non-finite gradient norm; update skipped.\n"
                        + report_nonfinite(params=state.params,
                                           batch=microbatches[0]))
                inner_metrics = metrics
                progress.log({**{k: round(float(v), 4)
                                 for k, v in metrics.items()},
                              "num_updates": num_updates},
                             tag="train_inner", step=num_updates)
            # mid-epoch validate/save (--validate-interval-updates /
            # --save-interval-updates; fairseq_cli/train.py:336-403)
            mid_val = None
            if (args.validate_interval_updates > 0
                    and num_updates % args.validate_interval_updates == 0
                    and not args.disable_validation
                    and num_updates >= args.validate_after_updates):
                mid_val = handle_val_result(
                    validate(args, task, trainer, state, eval_fn, progress,
                             train_rng))
                last_validated = num_updates
            if (mgr is not None and args.save_interval_updates > 0
                    and num_updates % args.save_interval_updates == 0):
                # iterator state counts CONSUMED batches (the iterator's own
                # counter runs ahead because of the prefetch buffer)
                itr_sd = {"epoch": epoch, "iterations_in_epoch": batches_done,
                          "shuffle": True}
                mgr.save(state, epoch, val_metric=mid_val,
                         end_of_epoch=False, num_updates=num_updates,
                         extra_meta=save_meta(itr_sd))
                save_ema()
            if num_updates >= max_update or _st["stop"]:
                stop = True
                broke_mid_epoch = True
                break

        if args.profile and epoch == start_epoch:
            jax.profiler.stop_trace()
            logger.info("profiler trace at /tmp/s2st_tpu_profile")

        if not inner_metrics and metrics:
            # epoch ended between log points: fetch the last step's metrics
            inner_metrics = {k: float(v)
                             for k, v in jax.device_get(metrics).items()}
        progress.print({**{k: round(float(v), 4)
                           for k, v in inner_metrics.items()},
                        "num_updates": num_updates, "epoch": epoch},
                       tag="train", step=num_updates)

        # validation
        val_metric = None
        do_validate = (not args.disable_validation
                       and epoch % args.validate_interval == 0
                       and num_updates >= args.validate_after_updates
                       and num_updates != last_validated)
        if do_validate:
            val_metric = handle_val_result(
                validate(args, task, trainer, state, eval_fn, progress,
                         train_rng))
            last_validated = num_updates
        if _st["stop"]:
            stop = True

        if mgr is not None:
            if broke_mid_epoch:
                # stopped inside the epoch (max-update/early-stop): the
                # iterator's own counter ran ahead via prefetch, so record
                # the CONSUMED position for exact resume
                itr_sd = {"epoch": epoch,
                          "iterations_in_epoch": batches_done,
                          "shuffle": True}
                mgr.save(state, epoch, val_metric=val_metric,
                         end_of_epoch=False,
                         num_updates=(num_updates
                                      if args.save_interval_updates > 0
                                      else None),
                         extra_meta=save_meta(itr_sd))
                save_ema()
            elif epoch % args.save_interval == 0:
                mgr.save(state, epoch, val_metric=val_metric,
                         extra_meta=save_meta(epoch_itr.state_dict()))
                save_ema()
        # --stop-min-lr: stop once the schedule decays below the floor
        # (fairseq_cli/train.py epoch-loop condition)
        if args.stop_min_lr > 0:
            cur_lr = float(schedule(num_updates + 1)) * _st["lr_scale"]
            if cur_lr < args.stop_min_lr:
                logger.info(f"stopping: lr {cur_lr:.3e} < "
                            f"--stop-min-lr {args.stop_min_lr:.3e}")
                stop = True
        epoch += 1

    watchdog.stop()
    if mgr is not None:
        # drain pending async checkpoint writes before the process exits
        mgr.wait()
    logger.info(f"done training at update {int(state.step)}")
    return 0


def validate(args, task, trainer, state, eval_fn, progress, rng):
    """Loss validation + optional MCD-with-inference
    (tasks/s2s_translation.py:217-264 parity). Returns the value of
    --best-checkpoint-metric."""
    import jax
    valid_itr = task.get_batch_iterator(
        args.valid_subset, max_tokens=args.max_tokens,
        max_sentences=args.batch_size, seed=args.seed, shuffle=False,
        data_rank=jax.process_index(), data_world=jax.process_count())
    agg: dict = {}
    weights: dict = {}
    n = 0
    mcd_sums = {"mcd_loss": 0.0, "targ_frames": 0.0, "pred_frames": 0.0,
                "nins": 0.0, "ndel": 0.0}
    bleu_fn = None
    if getattr(args, "eval_bleu", False) and \
            hasattr(task, "build_valid_bleu"):
        bleu_fn = task.build_valid_bleu(trainer.cfg)
    all_hyps: list = []
    all_refs: list = []
    for batch in progress.wrap(valid_itr.next_epoch_itr(shuffle=False),
                               prefix="valid"):
        if bleu_fn is not None:
            hyps, refs = bleu_fn(state.variables(), batch)
            if getattr(args, "eval_bleu_print_samples", False) and n == 0 \
                    and hyps:
                logger.info(f"example hypothesis: {hyps[0]}")
                logger.info(f"example reference: {refs[0]}")
            all_hyps.extend(hyps)
            all_refs.extend(refs)
        metrics = trainer.valid_step(state, batch, jax.random.fold_in(rng, n))
        ss = metrics.get("sample_size", 1.0) or 1.0
        for k, v in metrics.items():
            agg[k] = agg.get(k, 0.0) + float(v) * ss
            weights[k] = weights.get(k, 0.0) + ss
        n += 1
        if eval_fn is not None:
            db = trainer._device_batch(batch)
            out = eval_fn(state.variables(), db["src_speech"],
                          db["src_speech_lens"], db["tgt_speech"],
                          db["target_lengths"], jax.random.fold_in(rng, n))
            host = jax.device_get({k: out[k] for k in mcd_sums})
            for k in mcd_sums:
                mcd_sums[k] += float(host[k])
            if n == 1 and progress._tb is not None \
                    and jax.process_count() == 1:
                # audio/spectrogram/attention panels on the first batch
                wl = int(jax.device_get(out["example_wave_len"]))
                progress.log_audio(
                    "valid/pred_audio",
                    jax.device_get(out["example_wave"])[:max(wl, 1)],
                    getattr(eval_fn, "sample_rate", 16000), step=n)
                progress.log_spectrogram(
                    "valid/pred_spectrogram",
                    jax.device_get(out["example_feats"]), step=n)
                progress.log_attention(
                    "valid/attention", jax.device_get(out["example_attn"]),
                    step=n)
    stats = {k: agg[k] / max(weights[k], 1.0) for k in agg}
    if bleu_fn is not None and all_hyps:
        import sacrebleu
        # tokenize="none": hypotheses/refs are already detokenized per
        # --eval-bleu-detok (the reference passes tokenize="none" too
        # when a detokenizer is configured)
        stats["bleu"] = sacrebleu.corpus_bleu(
            all_hyps, [all_refs],
            tokenize="none" if getattr(args, "eval_bleu_detok", "space")
            != "space" else "13a").score
    if eval_fn is not None and mcd_sums["targ_frames"] > 0:
        stats["mcd_loss"] = mcd_sums["mcd_loss"] / mcd_sums["targ_frames"]
        stats["ins_rate"] = mcd_sums["nins"] / mcd_sums["targ_frames"]
        stats["del_rate"] = mcd_sums["ndel"] / mcd_sums["targ_frames"]
    progress.print({k: round(float(v), 4) for k, v in stats.items()},
                   tag="valid", step=int(state.step))
    return stats.get(args.best_checkpoint_metric)


def cli_main():
    sys.exit(main())


if __name__ == "__main__":
    cli_main()
