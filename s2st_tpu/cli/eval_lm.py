"""Language-model perplexity evaluation (parity: ``fairseq_cli/eval_lm.py``).

Scores --gen-subset with the trained LM and prints fairseq's summary:
"Evaluated N tokens in Xs (Y tokens/s)" and
"Loss (base 2): L.LLLL, Perplexity: PP.PP". ``--output-word-probs`` prints
per-word log2-probs like the reference's WordStat path (:215-230).
"""

from __future__ import annotations

import logging
import sys
import time
from typing import List, Optional

import numpy as np

logger = logging.getLogger("s2st_tpu.eval_lm")


class ContextWindow:
    """--context-window: stateful prepend of up to ``context_window``
    trailing tokens from the preceding blocks; context positions carry pad
    targets so the scoring mask skips them
    (fairseq/data/lm_context_window_dataset.py:50-80 collater semantics;
    row order = block order since eval iterates with shuffle=False)."""

    def __init__(self, tokens_per_sample: int, context_window: int,
                 pad: int = 1):
        self.tokens_per_sample = tokens_per_sample
        self.cw = context_window
        self.pad = pad
        self.prev_tokens = np.empty([0], np.int32)

    def add_context(self, src: np.ndarray, tgt: np.ndarray):
        bsz, tsz = src.shape
        pad, cw = self.pad, self.cw
        max_sample_len = self.tokens_per_sample + cw
        new_src = np.full([bsz, tsz + cw], pad, src.dtype)
        new_tgt = np.full([bsz, tsz + cw], pad, tgt.dtype)
        for i in range(bsz):
            sample_len = int((src[i] != pad).sum())
            extra = len(self.prev_tokens) + sample_len - max_sample_len
            if extra > 0:
                self.prev_tokens = self.prev_tokens[extra:]
            pads = np.full(cw - len(self.prev_tokens), pad, src.dtype)
            row = np.concatenate([self.prev_tokens, src[i], pads])
            new_src[i] = row
            new_tgt[i, len(self.prev_tokens):
                    len(self.prev_tokens) + tsz] = tgt[i]
            self.prev_tokens = row[row != pad][-cw:].astype(np.int32)
        return new_src, new_tgt


def load_lm_ensemble(model_cfg, init_fn, paths: List[str]):
    """Load LM checkpoints (.npz ours / .pt fairseq) and return
    (ensemble_variables, log_probs_fn(v, src_tokens)). Shared by this CLI
    and hub.LMHubInterface."""
    import jax
    import jax.numpy as jnp
    from ..models import transformer_lm as tlm
    from ..train import checkpoint as ckpt
    from ..train.optim import adam
    from ..train.trainer import create_train_state

    ens = []
    for path in paths:
        if path.endswith(".pt") or path.endswith(".bin"):
            from ..models.torch_import import (
                load_fairseq_checkpoint,
                transformer_lm_from_fairseq_state_dict)
            sd = load_fairseq_checkpoint(path)
            v = transformer_lm_from_fairseq_state_dict(
                sd, share_decoder_input_output_embed=(
                    model_cfg.share_decoder_input_output_embed))
            v = jax.tree_util.tree_map(np.asarray, v)
        else:
            template = init_fn(jax.random.PRNGKey(0))
            state = create_train_state(template, adam())
            state, meta = ckpt.restore_state(state, path,
                                             reset_optimizer=True)
            v = {"params": state.params, "stats": state.stats}
        logger.info(f"loaded checkpoint {path}")
        ens.append(v)

    if isinstance(model_cfg, tlm.TransformerLMConfig):
        # adaptive-softmax-aware log probs
        def _lp(v, src_tokens):
            return tlm.log_probs(v, model_cfg, {"src_tokens": src_tokens})
    else:
        from ..train.losses import lm_forward_fn
        _fwd = lm_forward_fn(model_cfg)

        def _lp(v, src_tokens):
            net = _fwd(v, model_cfg, {"src_tokens": src_tokens},
                       deterministic=True)
            return jax.nn.log_softmax(
                net["logits"].astype(jnp.float32), axis=-1)
    return ens, _lp


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout)
    from ..options import parse_eval_lm_args
    args = parse_eval_lm_args(argv)

    import jax
    import jax.numpy as jnp
    from ..models import transformer_lm as tlm
    from ..registry import get_task
    from ..train import checkpoint as ckpt
    from ..train.optim import adam
    from ..train.trainer import create_train_state

    cw = getattr(args, "context_window", 0) or 0
    if cw > 0:
        # blocks shrink so block+context fits the model's window
        # (fairseq_cli/eval_lm.py:244-246)
        assert cw < args.tokens_per_sample, \
            "--context-window must be < --tokens-per-sample"
        args.tokens_per_sample -= cw

    task = get_task(args.task).setup_task(args)
    # model from the checkpoint's embedded config when present (fairseq
    # load_model_ensemble parity: no arch flags needed at eval)
    from ..options import model_args_from_checkpoint, task_args_scope
    with task_args_scope(task, model_args_from_checkpoint(args)):
        model_cfg, init_fn, _ = task.build_model_and_loss()
    vocab = task.dictionary

    ens, _lp = load_lm_ensemble(model_cfg, init_fn, args.path.split(":"))

    @jax.jit
    def score(ens, src_tokens, target):
        lps = []
        for v in ens:
            lps.append(_lp(v, src_tokens))
        lp = lps[0] if len(lps) == 1 else \
            jax.nn.logsumexp(jnp.stack(lps), axis=0) - np.log(len(lps))
        pos = jnp.take_along_axis(lp, target[..., None], axis=-1)[..., 0]
        keep = target != 1
        return jnp.where(keep, pos, 0.0), keep

    if cw > 0:
        # the stateful context carry needs blocks in ascending document
        # order; mark the dataset so the iterator bypasses its default
        # descending-length sort (reference LMContextWindowDataset
        # ordered_indices = np.arange,
        # fairseq/data/lm_context_window_dataset.py:45-47)
        if args.gen_subset not in task.datasets:
            task.load_dataset(args.gen_subset)
        task.datasets[args.gen_subset].preserve_order = True
    itr = task.get_batch_iterator(args.gen_subset,
                                  max_tokens=args.max_tokens,
                                  max_sentences=args.batch_size,
                                  shuffle=False)

    ctx = ContextWindow(args.tokens_per_sample, cw) if cw > 0 else None

    t0 = time.perf_counter()
    loss_sum = 0.0
    n_tokens = 0
    for batch in itr.next_epoch_itr(shuffle=False):
        if ctx is not None:
            batch = dict(batch)
            batch["src_tokens"], batch["target"] = ctx.add_context(
                np.asarray(batch["src_tokens"]),
                np.asarray(batch["target"]))
        pos, keep = score(ens, jnp.asarray(batch["src_tokens"]),
                          jnp.asarray(batch["target"]))
        pos = np.asarray(pos)
        keep = np.asarray(keep)
        loss_sum += float(-pos.sum())
        n_tokens += int(keep.sum())
        if args.output_word_probs:
            tgt = np.asarray(batch["target"])
            for row in range(len(batch["id"])):
                words = [f"{vocab[int(t)]} [{p / np.log(2):.4f}]"
                         for t, p in zip(tgt[row], pos[row]) if t != 1]
                logger.info(f"id {int(batch['id'][row])}: "
                            + " ".join(words))
    dt = time.perf_counter() - t0
    avg_nll = loss_sum / max(n_tokens, 1) / np.log(2)  # base 2
    logger.info(f"Evaluated {n_tokens:,} tokens in {dt:.1f}s "
                f"({n_tokens / max(dt, 1e-9):.2f} tokens/s)")
    logger.info(f"Loss (base 2): {avg_nll:.4f}, "
                f"Perplexity: {2 ** avg_nll:.2f}")
    print(f"Loss (base 2): {avg_nll:.4f}, Perplexity: {2 ** avg_nll:.2f}")
    return 0


def cli_main():
    sys.exit(main())


if __name__ == "__main__":
    cli_main()
