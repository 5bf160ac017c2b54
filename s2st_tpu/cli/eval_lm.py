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

    task = get_task(args.task).setup_task(args)
    model_cfg, init_fn, _ = task.build_model_and_loss()
    vocab = task.dictionary

    ens = []
    for path in args.path.split(":"):
        if path.endswith(".pt") or path.endswith(".bin"):
            from ..models.torch_import import (
                load_fairseq_checkpoint, transformer_lm_from_fairseq_state_dict)
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

    itr = task.get_batch_iterator(args.gen_subset,
                                  max_tokens=args.max_tokens,
                                  max_sentences=args.batch_size,
                                  shuffle=False)
    t0 = time.perf_counter()
    loss_sum = 0.0
    n_tokens = 0
    for batch in itr.next_epoch_itr(shuffle=False):
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
