"""Batch text generation + BLEU scoring for translation models
(parity: ``fairseq_cli/generate.py``).

Loads an ensemble of text-transformer checkpoints, beam-decodes the
binarized <gen-subset>, and prints fairseq's S-/T-/H-/D-/P- lines plus the
"Translated N sentences (M tokens) in Ts" timing (:404-413) and the final
"Generate <split> with beam=<k>: <BLEU>" line. ``--score-reference`` runs
the SequenceScorer path instead (H-score = per-token-normalized lprob).

TPU-native: one jitted beam program per snap shape; the ensemble's
per-model encoders run inside the same program.
"""

from __future__ import annotations

import logging
import math
import sys
from functools import partial
from typing import List, Optional

import numpy as np

logger = logging.getLogger("s2st_tpu.generate")


def load_text_model_ensemble(paths: List[str], model_cfg, init_fn=None):
    """':'-separated checkpoint paths -> list of variables trees.
    ``.pt`` files go through the fairseq importer; ``.npz`` through the
    native checkpoint reader (template from init_fn, default: the text
    transformer)."""
    import jax
    from ..models import transformer_text as tt
    from ..models.torch_import import (load_fairseq_checkpoint,
                                       transformer_text_from_fairseq_state_dict)
    from ..train import checkpoint as ckpt
    from ..train.optim import adam
    from ..train.trainer import create_train_state

    if init_fn is None:
        import functools
        init_fn = functools.partial(tt.init_transformer, cfg=model_cfg)
    ens = []
    for path in paths:
        if path.endswith(".pt") or path.endswith(".bin"):
            sd = load_fairseq_checkpoint(path)
            v = transformer_text_from_fairseq_state_dict(
                sd,
                share_all_embeddings=model_cfg.share_all_embeddings,
                share_decoder_input_output_embed=(
                    model_cfg.share_decoder_input_output_embed))
            v = jax.tree_util.tree_map(np.asarray, v)
            logger.info(f"loaded fairseq checkpoint {path}")
        else:
            template = init_fn(jax.random.PRNGKey(0))
            state = create_train_state(template, adam())
            state, meta = ckpt.restore_state(state, path,
                                             reset_optimizer=True)
            v = {"params": state.params, "stats": state.stats}
            logger.info(
                f"loaded checkpoint {path} (step {meta.get('step', '?')})")
        ens.append(v)
    return ens


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout)
    from ..options import parse_generation_args
    args = parse_generation_args(argv)
    if args.task == "s2s_translation":  # the parser's default; retarget
        args.task = "translation"

    import jax
    import jax.numpy as jnp
    from ..generate.sequence_generator import BeamConfig, beam_search_aux
    from ..models import transformer_text as tt
    from ..registry import get_task
    from ..scoring import build_scorer

    task = get_task(args.task).setup_task(args)
    if args.task == "translation_lev":
        # NAT family decodes by iterative refinement, not beam search
        # (fairseq task.build_generator -> IterativeRefinementGenerator)
        return _main_nat(args, task)
    # rebuild the model from the checkpoint's embedded config when present
    # (fairseq load_model_ensemble parity: no arch flags needed at decode)
    from ..options import model_args_from_checkpoint, task_args_scope
    margs = model_args_from_checkpoint(args)
    with task_args_scope(task, margs):
        model_cfg, init_fn, _ = task.build_model_and_loss()
    src_dict, tgt_dict = task.source_dictionary, task.target_dictionary
    is_lstm = str(margs.arch).startswith("lstm")
    is_conv = str(margs.arch).startswith(("lightconv", "dynamicconv"))

    ens_vars = load_text_model_ensemble(args.path.split(":"), model_cfg,
                                        init_fn)
    from ..models.multilingual_transformer import MultilingualConfig
    if isinstance(model_cfg, MultilingualConfig):
        # per-pair generation (multilingual_translation inference uses a
        # single --source-lang/--target-lang pair): collapse the multi
        # model to the pair's transformer view and load data through the
        # plain translation task
        from ..models import multilingual_transformer as mt
        from ..tasks.translation import TranslationTask
        pair = f"{args.source_lang}-{args.target_lang}"
        views = []
        for v in ens_vars:
            view, pair_cfg = mt.pair_view(v, model_cfg, pair)
            views.append(view)
        ens_vars, model_cfg = views, pair_cfg
        task = TranslationTask(args, task.dicts[args.source_lang],
                               task.dicts[args.target_lang])
        src_dict, tgt_dict = task.source_dictionary, \
            task.target_dictionary
    qs = float(getattr(args, "quant_noise_scalar", 0.0) or 0.0)
    if qs > 0:
        # scalar-QAT checkpoints evaluate fully int8-quantized (IntLinear
        # p=1 at eval, scalar/modules/qlinear.py:71; the reference builds
        # the Int model from the checkpoint args at load)
        from ..train.quantization import quantize_params_scalar
        ens_vars = [{**v, "params": quantize_params_scalar(v["params"])}
                    for v in ens_vars]
        logger.info("decoding with int8 scalar-quantized weights "
                    f"(--quant-noise-scalar {qs})")
    gen_vars = ens_vars if (is_lstm or is_conv) else \
        [tt.generation_variables(v, model_cfg) for v in ens_vars]

    strategy = "beam"
    if args.sampling:
        strategy = "sampling"
    elif args.diverse_beam_groups > 0:
        strategy = "diverse_beam"
    elif args.diversity_rate > -1.0:
        strategy = "diverse_siblings"
    # fairseq max_len = min(a*src_len + b, max_positions - 1): the static
    # buffer takes the worst case; per-sentence bounds ride the
    # LengthConstrained path (BeamConfig.max_len_a/b) when a != 0
    pos_cfg = getattr(model_cfg, "base", model_cfg)  # conv cfg nests base
    hard_max = pos_cfg.max_target_positions - 2
    static_max = min(hard_max,
                     int(args.max_len_a * pos_cfg.max_source_positions
                         + args.max_len_b))
    bs_cfg = BeamConfig(beam=args.beam,
                        max_len=max(static_max, 2),
                        max_len_a=args.max_len_a,
                        max_len_b=(float(args.max_len_b)
                                   if args.max_len_a > 0 else -1.0),
                        min_len=args.min_len,
                        len_penalty=args.lenpen,
                        no_repeat_ngram_size=args.no_repeat_ngram_size,
                        strategy=strategy,
                        sampling_topk=args.sampling_topk,
                        sampling_topp=args.sampling_topp,
                        diversity_num_groups=max(args.diverse_beam_groups, 1),
                        diversity_strength=args.diverse_beam_strength,
                        diversity_rate=max(args.diversity_rate, 0.0),
                        # mBART-style custom stop token
                        # (translation_from_pretrained_bart build_generator)
                        eos=getattr(task, "generation_eos", lambda: 2)())
    nbest = min(args.nbest, args.beam)
    shim = None if (is_lstm or is_conv) else tt._aux_cfg(model_cfg)

    @partial(jax.jit, static_argnames=("has_prefix",))
    def infer(gen_vars, src_tokens, tgt_tokens, rng, has_prefix=False):
        prefix = tgt_tokens[:, :args.prefix_size] if has_prefix else None
        src_lens = jnp.sum(src_tokens != 1, axis=1)
        if getattr(model_cfg, "decoder_learned_pos", False):
            # BART family: learned-position decoder steps through the
            # generic step-fn beam interface
            k = bs_cfg.beam
            step_fns, caches, pads = [], [], []
            for v in gen_vars:
                enc = tt.encode(v, model_cfg, src_tokens,
                                deterministic=True)
                eo = jnp.repeat(enc["encoder_out"], k, axis=0)
                ep = jnp.repeat(enc["encoder_padding_mask"], k, axis=0)
                step_fns.append(tt.make_beam_step(v, model_cfg, eo, ep))
                caches.append(tt.init_beam_cache(
                    model_cfg, src_tokens.shape[0] * k, bs_cfg.max_len))
                pads.append(enc["encoder_padding_mask"])
            return beam_search_aux(
                gen_vars, shim, "decoder",
                [jnp.zeros((src_tokens.shape[0], 1, 1))] * len(gen_vars),
                pads, bs_cfg, prefix_tokens=prefix, src_lengths=src_lens,
                rng=rng, step_fns=step_fns, init_caches=caches,
                vocab_size=len(tgt_dict))
        if is_lstm or is_conv:
            from ..models import lightconv_model as lc
            from ..models import lstm as lstm_m
            step_fns, caches, pads = [], [], []
            k = bs_cfg.beam
            for v in gen_vars:
                if is_lstm:
                    enc = lstm_m.encode(v, model_cfg, src_tokens,
                                        deterministic=True)
                    eo = jnp.repeat(enc["encoder_out"], k, axis=0)
                    ep = jnp.repeat(enc["encoder_padding_mask"], k, axis=0)
                    step_fns.append(
                        lstm_m.make_beam_step(v, model_cfg, eo, ep))
                    caches.append(
                        lstm_m.init_beam_cache(v, model_cfg, enc, k))
                else:
                    enc = lc.encode(v, model_cfg, src_tokens,
                                    deterministic=True)
                    eo = jnp.repeat(enc["encoder_out"], k, axis=0)
                    ep = jnp.repeat(enc["encoder_padding_mask"], k, axis=0)
                    step_fns.append(lc.make_beam_step(v, model_cfg, eo, ep))
                    caches.append(lc.init_beam_cache(
                        model_cfg, src_tokens.shape[0] * k))
                pads.append(enc["encoder_padding_mask"])
            return beam_search_aux(
                gen_vars, shim, "decoder",
                [jnp.zeros((src_tokens.shape[0], 1, 1))] * len(gen_vars),
                pads, bs_cfg, prefix_tokens=prefix, src_lengths=src_lens,
                rng=rng, step_fns=step_fns, init_caches=caches,
                vocab_size=len(tgt_dict))
        taps, pads = [], []
        for v in gen_vars:
            enc = tt.encode(v, model_cfg, src_tokens, deterministic=True)
            taps.append(enc["encoder_out"])
            pads.append(enc["encoder_padding_mask"])
        return beam_search_aux(gen_vars, shim, "decoder", taps, pads,
                               bs_cfg, prefix_tokens=prefix,
                               src_lengths=src_lens, rng=rng)

    @jax.jit
    def score_ref(gen_vars, src_tokens, prev_tokens, target):
        """SequenceScorer parity: positional lprobs of the reference."""
        from ..models import lightconv_model as lc
        from ..models import lstm as lstm_m
        fwd = lstm_m.forward if is_lstm else \
            (lc.forward if is_conv else tt.forward)
        lps = []
        for v in gen_vars:
            out = fwd(v, model_cfg,
                      {"src_tokens": src_tokens,
                       "prev_output_tokens": prev_tokens},
                      deterministic=True)
            lps.append(jax.nn.log_softmax(
                out["logits"].astype(jnp.float32), axis=-1))
        lp = lps[0] if len(lps) == 1 else \
            jax.nn.logsumexp(jnp.stack(lps), axis=0) - np.log(len(lps))
        pos = jnp.take_along_axis(lp, target[..., None], axis=-1)[..., 0]
        keep = target != 1
        pos = jnp.where(keep, pos, 0.0)
        n = jnp.maximum(jnp.sum(keep, axis=1), 1)
        return {"positional_scores": pos,
                "score": jnp.sum(pos, axis=1) / n,
                "lengths": jnp.sum(keep, axis=1)}

    if qs > 0:
        # activation fake-quant hooks active while the decode programs
        # trace (ActivationQuantizer at eval = fully quantized activations)
        from ..train.quantization import scalar_act_quant

        def _actq(fn):
            def wrapped(*a, **k):
                with scalar_act_quant(train=False):
                    return fn(*a, **k)
            return wrapped
        infer = _actq(infer)
        score_ref = _actq(score_ref)

    remove_bpe = getattr(args, "remove_bpe", None)
    scorer = build_scorer(args)
    itr = task.get_batch_iterator(args.gen_subset,
                                  max_tokens=args.max_tokens,
                                  max_sentences=args.batch_size,
                                  shuffle=False)
    import time
    t0 = time.perf_counter()
    n_done = 0
    gen_tokens = 0
    rng0 = jax.random.PRNGKey(getattr(args, "seed", 1) or 1)
    n_batch = 0
    out_file = sys.stdout
    if args.results_path:
        import os
        os.makedirs(args.results_path, exist_ok=True)
        out_file = open(
            f"{args.results_path}/generate-{args.gen_subset}.txt", "w")
    for batch in itr.next_epoch_itr(shuffle=False):
        ids = np.asarray(batch["id"])
        src_np = np.asarray(batch["src_tokens"])
        if args.score_reference:
            out = score_ref(gen_vars, jnp.asarray(batch["src_tokens"]),
                            jnp.asarray(batch["prev_output_tokens"]),
                            jnp.asarray(batch["target"]))
            pos = np.asarray(out["positional_scores"])
            sc = np.asarray(out["score"])
            lens = np.asarray(out["lengths"])
            tgt_np = np.asarray(batch["target"])
            for row in range(len(ids)):
                sid = int(ids[row])
                src_str = src_dict.string(src_np[row], remove_bpe)
                ref = tgt_dict.string(tgt_np[row], remove_bpe,
                                      escape_unk=True)
                hyp = tgt_dict.string(tgt_np[row], remove_bpe)
                n = int(lens[row])
                print(f"S-{sid}\t{src_str}", file=out_file)
                print(f"T-{sid}\t{ref}", file=out_file)
                # fairseq prints scores in base 2 (generate.py:274,293)
                print(f"H-{sid}\t{sc[row] / math.log(2):.4f}\t{hyp}",
                      file=out_file)
                print(f"P-{sid}\t" + " ".join(
                    f"{x / math.log(2):.4f}" for x in pos[row, :n]),
                    file=out_file)
                # fairseq still feeds the scorer (hyp == reference here)
                scorer.add_string(ref, hyp)
                gen_tokens += n
                n_done += 1
            continue
        out = infer(gen_vars, jnp.asarray(batch["src_tokens"]),
                    jnp.asarray(batch.get("target",
                                          np.zeros_like(src_np))),
                    jax.random.fold_in(rng0, n_batch),
                    has_prefix=args.prefix_size > 0)
        n_batch += 1
        tokens = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        scores = np.asarray(out["scores"])
        pos_all = np.asarray(out["pos_scores"])
        has_target = "target" in batch
        tgt_np = np.asarray(batch["target"]) if has_target else None
        for row in range(len(ids)):
            sid = int(ids[row])
            src_str = src_dict.string(src_np[row], remove_bpe)
            print(f"S-{sid}\t{src_str}", file=out_file)
            ref = None
            if has_target:
                ref = tgt_dict.string(tgt_np[row], remove_bpe,
                                      escape_unk=True)
                print(f"T-{sid}\t{ref}", file=out_file)
            for j in range(nbest):
                n = int(lengths[row, j])
                hyp_ids = tokens[row, j, 1:1 + n]
                hyp_ids = hyp_ids[(hyp_ids != 2)
                                  & (hyp_ids != bs_cfg.eos)][:n]
                hyp_raw = tgt_dict.string(hyp_ids)
                hyp = tgt_dict.string(hyp_ids, remove_bpe)
                sc2 = scores[row, j] / math.log(2)   # base-2 parity
                print(f"H-{sid}\t{sc2:.4f}\t{hyp_raw}", file=out_file)
                print(f"D-{sid}\t{sc2:.4f}\t{hyp}", file=out_file)
                print(f"P-{sid}\t" + " ".join(
                    f"{x / math.log(2):.4f}"
                    for x in pos_all[row, j, 1:1 + n]), file=out_file)
                if j == 0:
                    gen_tokens += n
                    if ref is not None:
                        scorer.add_string(ref, hyp)
                    n_done += 1
    dt = time.perf_counter() - t0
    logger.info(f"Translated {n_done} sentences ({gen_tokens} tokens) in "
                f"{dt:.1f}s ({n_done / max(dt, 1e-9):.2f} sentences/s, "
                f"{gen_tokens / max(dt, 1e-9):.2f} tokens/s)")
    line = (f"Generate {args.gen_subset} with beam={args.beam}: "
            f"{scorer.result_string()}")
    print(line, file=out_file)
    if args.results_path:
        out_file.close()
        print(line)
    return 0


def _main_nat(args, task) -> int:
    """Iterative-refinement decode for the translation_lev task
    (IterativeRefinementGenerator parity; see
    generate/iterative_refinement.py)."""
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp
    from ..generate.iterative_refinement import (pick_best_beam,
                                                 refine_generate)
    from ..models import nat_transformer as natm
    from ..scoring import build_scorer
    from ..train import checkpoint as ckpt
    from ..train.optim import adam
    from ..train.trainer import create_train_state

    from ..options import model_args_from_checkpoint, task_args_scope
    margs = model_args_from_checkpoint(args)
    with task_args_scope(task, margs):
        model_cfg, init_fn, _ = task.build_model_and_loss()
    src_dict, tgt_dict = task.source_dictionary, task.target_dictionary
    arch = str(margs.arch)
    if arch.startswith("cmlm"):
        kind = "cmlm"
    elif arch.startswith("levenshtein"):
        kind = "levenshtein"
    elif arch.startswith("insertion"):
        kind = "insertion"
    elif arch.startswith("nacrf"):
        kind = "nacrf"
    else:
        kind = "nat"

    paths = args.path.split(":")
    ens_vars = []
    for p_ in paths:
        template = init_fn(jax.random.PRNGKey(0))
        state = create_train_state(template, adam())
        state, meta = ckpt.restore_state(state, p_, reset_optimizer=True)
        ens_vars.append({"params": state.params, "stats": state.stats})
        logger.info(f"loaded checkpoint {p_} "
                    f"(step {meta.get('step', '?')})")
    # ':'-joined paths = Levenshtein ensemble (EnsembleLevT semantics:
    # per-stage logsumexp-averaged heads; refine_generate rejects other
    # NAT kinds, like the reference)
    variables = ens_vars if len(ens_vars) > 1 else ens_vars[0]

    max_len = min(model_cfg.base.max_target_positions - 2,
                  int(args.max_len_a * model_cfg.base.max_source_positions
                      + args.max_len_b))
    infer = jax.jit(partial(
        refine_generate, cfg=model_cfg, kind=kind,
        max_iter=args.iter_decode_max_iter,
        adaptive=not args.iter_decode_force_max_iter,
        length_beam=max(args.iter_decode_with_beam, 1),
        max_len=max(max_len, 4),
        eos_penalty=args.iter_decode_eos_penalty))

    remove_bpe = getattr(args, "remove_bpe", None)
    scorer = build_scorer(args)
    itr = task.get_batch_iterator(args.gen_subset,
                                  max_tokens=args.max_tokens,
                                  max_sentences=args.batch_size,
                                  shuffle=False)
    t0 = time.perf_counter()
    n_done = 0
    gen_tokens = 0
    for batch in itr.next_epoch_itr(shuffle=False):
        ids = np.asarray(batch["id"])
        out = infer(variables, jnp.asarray(batch["src_tokens"]))
        best_tokens, best_scores, _ = pick_best_beam(
            jnp.asarray(out["tokens"]), jnp.asarray(out["scores"]))
        toks = np.asarray(best_tokens)
        sc = np.asarray(best_scores)
        src_np = np.asarray(batch["src_tokens"])
        tgt_np = np.asarray(batch.get("target")) \
            if "target" in batch else None
        for row in range(len(ids)):
            sid = int(ids[row])
            print(f"S-{sid}\t{src_dict.string(src_np[row], remove_bpe)}")
            ref = None
            if tgt_np is not None:
                ref = tgt_dict.string(tgt_np[row], remove_bpe,
                                      escape_unk=True)
                print(f"T-{sid}\t{ref}")
            ids_row = toks[row]
            keep = (ids_row != 1) & (ids_row != 0) & (ids_row != 2)
            hyp_raw = tgt_dict.string(ids_row[keep])
            hyp = tgt_dict.string(ids_row[keep], remove_bpe)
            sc2 = sc[row] / math.log(2)             # base-2 parity
            print(f"H-{sid}\t{sc2:.4f}\t{hyp_raw}")
            print(f"D-{sid}\t{sc2:.4f}\t{hyp}")
            gen_tokens += int(keep.sum())
            if ref is not None:
                scorer.add_string(ref, hyp)
            n_done += 1
    dt = time.perf_counter() - t0
    logger.info(f"Translated {n_done} sentences ({gen_tokens} tokens) in "
                f"{dt:.1f}s ({n_done / max(dt, 1e-9):.2f} sentences/s, "
                f"{gen_tokens / max(dt, 1e-9):.2f} tokens/s)")
    print(f"Generate {args.gen_subset} with beam={args.iter_decode_with_beam}"
          f": {scorer.result_string()}")
    return 0


def cli_main():
    sys.exit(main())


if __name__ == "__main__":
    cli_main()
