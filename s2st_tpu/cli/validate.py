"""Loss-only validation CLI (parity: fairseq_cli/validate.py): load a
checkpoint, run the criterion over one or more subsets, print aggregated
metrics."""

from __future__ import annotations

import logging
import sys
from typing import List, Optional

import numpy as np

logger = logging.getLogger("s2st_tpu.validate")


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout)
    from ..options import get_training_parser, _two_pass
    parser = get_training_parser()
    parser.add_argument("--path", required=True)
    args = _two_pass(parser, argv)

    import jax
    from ..registry import get_task
    from ..train import checkpoint as ckpt
    from ..train.optim import adam
    from ..train.trainer import Trainer, create_train_state
    from ..parallel.mesh import make_mesh

    task = get_task(args.task).setup_task(args)
    # model from the checkpoint's embedded config when present (fairseq
    # load_model_ensemble parity: no arch flags needed at validate)
    from ..options import model_args_from_checkpoint, task_args_scope
    with task_args_scope(task, model_args_from_checkpoint(args)):
        model_cfg, init_fn, loss_fn = task.build_model_and_loss()
    loss_cfg = task.build_loss_config()
    mesh = make_mesh(dp=args.dp_size, fsdp=args.fsdp_size, tp=args.tp_size)

    variables = init_fn(jax.random.PRNGKey(0))
    tx = adam()
    state = create_train_state(variables, tx)
    state, meta = ckpt.restore_state(state, args.path, reset_optimizer=True)
    logger.info(f"loaded {args.path} (step {meta.get('step', '?')})")
    trainer = Trainer(model_cfg, loss_cfg, tx, lambda s: 0.0, mesh,
                      loss_fn=loss_fn)

    rng = jax.random.PRNGKey(args.seed)
    for subset in args.valid_subset.split(","):
        itr = task.get_batch_iterator(subset, max_tokens=args.max_tokens,
                                      max_sentences=args.batch_size,
                                      shuffle=False)
        agg: dict = {}
        weights: dict = {}
        n = 0
        for batch in itr.next_epoch_itr(shuffle=False):
            metrics = trainer.valid_step(state, batch,
                                         jax.random.fold_in(rng, n))
            ss = metrics.get("sample_size", 1.0) or 1.0
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v) * ss
                weights[k] = weights.get(k, 0.0) + ss
            n += 1
        stats = {k: round(agg[k] / max(weights[k], 1.0), 4) for k in agg}
        logger.info(f"{subset} | {stats}")
        print(f"{subset} | loss {stats.get('loss', float('nan')):.4f}")
    return 0


def cli_main():
    sys.exit(main())


if __name__ == "__main__":
    cli_main()
