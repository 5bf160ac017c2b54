"""Text generation from the S2ST model's auxiliary decoders
(parity: fairseq_cli/generate_for_s2st.py).

The reference's trick (:107-110): swap ``model.decoder`` for
``aux_st_decoder`` (--scoring sacrebleu → ST BLEU) or ``aux_asr_decoder``
(--scoring wer → ASR WER), retarget the dictionary (:178-199), and run beam
search. Here the aux decoder IS addressed directly: the jitted beam search
(s2st_tpu.generate.sequence_generator) runs over the matching encoder tap.

Output format parity (:286-333): S-/T-/H-/D- lines + final scorer line
"Generate <split> with beam=<k>: <result>".
"""

from __future__ import annotations

import logging
import sys
from functools import partial
from typing import List, Optional

import numpy as np

logger = logging.getLogger("s2st_tpu.generate_for_s2st")


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout)
    from ..options import parse_generation_args
    args = parse_generation_args(argv)

    import jax
    import jax.numpy as jnp
    from ..utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    from ..registry import get_task
    from ..generate.sequence_generator import (BeamConfig, beam_search_aux,
                                               score_sequences)
    from ..models import s2st_transformer as m
    from ..scoring import build_scorer
    from ..train import checkpoint as ckpt
    from ..train.optim import adam
    from ..train.trainer import create_train_state

    task = get_task(args.task).setup_task(args)
    # model config comes from the checkpoint's embedded args when present
    # (fairseq load_model_ensemble parity — the reference's stage 10/11
    # commands pass no arch flags; run_baseline.sh:174-202)
    from ..options import model_args_from_checkpoint, task_args_scope
    margs = model_args_from_checkpoint(args)
    with task_args_scope(task, margs):
        model_cfg = task.build_model_config()

    # pick the aux decoder by scoring mode (reference :107-110)
    use_asr = args.scoring == "wer"
    which = "aux_asr_decoder" if use_asr else "aux_st_decoder"
    tgt_dict = task.src_dict if use_asr else task.tgt_dict
    if use_asr and not model_cfg.aux_asr:
        model_cfg = model_cfg.replace(aux_asr=True)
    if not use_asr and not model_cfg.aux_st:
        model_cfg = model_cfg.replace(aux_st=True)

    # ensemble: ':'-separated checkpoint paths (EnsembleModel parity)
    ens_vars = []
    for path in args.path.split(":"):
        if path.endswith(".pt") or path.endswith(".bin"):
            v = ckpt.load_variables_any(path)
            logger.info(f"loaded fairseq checkpoint {path}")
        else:
            template = m.init_s2st(jax.random.PRNGKey(0), model_cfg)
            state = create_train_state(template, adam())
            state, meta = ckpt.restore_state(state, path,
                                             reset_optimizer=True)
            v = {"params": state.params, "stats": state.stats}
            logger.info(
                f"loaded checkpoint {path} (step {meta.get('step', '?')})")
        assert which in v["params"], \
            f"{path} has no {which}; train with the matching ce-weight"
        ens_vars.append(v)

    # strategy precedence mirrors fairseq task.build_generator
    # (fairseq/tasks/fairseq_task.py:339-463)
    strategy = "beam"
    if args.sampling:
        if args.sampling_topk > 0 and args.sampling_topp > 0:
            # fairseq asserts the same exclusivity
            # (fairseq/tasks/fairseq_task.py build_generator)
            raise ValueError(
                "--sampling-topk and --sampling-topp are mutually exclusive")
        strategy = "sampling"
    elif args.diverse_beam_groups > 0:
        strategy = "diverse_beam"
    elif args.diversity_rate > -1.0:
        strategy = "diverse_siblings"
    bs_cfg = BeamConfig(beam=args.beam,
                        max_len=min(200, model_cfg.max_target_positions),
                        min_len=args.min_len,
                        len_penalty=args.lenpen,
                        no_repeat_ngram_size=args.no_repeat_ngram_size,
                        strategy=strategy,
                        sampling_topk=args.sampling_topk,
                        sampling_topp=args.sampling_topp,
                        diversity_num_groups=max(args.diverse_beam_groups, 1),
                        diversity_strength=args.diverse_beam_strength,
                        diversity_rate=max(args.diversity_rate, 0.0))
    nbest = min(args.nbest, args.beam)

    # lexically constrained decoding (generate.constrained; fairseq
    # --constraints): tables built once over the whole file so every
    # batch shares one compiled program; per-batch rows are slices
    cons_all = None
    if args.constraints:
        if not args.constraints_file:
            raise ValueError("--constraints needs --constraints-file")
        if args.prefix_size > 0:
            raise ValueError("--constraints and --prefix-size are exclusive")
        from ..generate.constrained import (build_constraint_tables,
                                            pack_constraints)
        cons_map, cons_text = {}, {}
        with open(args.constraints_file, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                phrases, texts = [], []
                for ph in parts[1:]:
                    if ph.strip():
                        toks = tgt_dict.encode_line(ph, append_eos=False)
                        phrases.append([int(t) for t in toks])
                        texts.append(ph)
                cons_map[parts[0]] = phrases
                cons_text[parts[0]] = texts

    def _taps_pads(ens_vars, src_speech, src_speech_lens):
        taps, pads = [], []
        for v in ens_vars:
            enc = m.encode(v, model_cfg, src_speech, src_speech_lens)
            t = enc["out_middle_layers"]
            taps.append(t[0] if (use_asr or len(t) == 1) else t[1])
            pads.append(enc["encoder_padding_mask"])
        return taps, pads

    @partial(jax.jit, static_argnames=("has_prefix",))
    def infer(ens_vars, src_speech, src_speech_lens, text, rng,
              has_prefix=False):
        taps, pads = _taps_pads(ens_vars, src_speech, src_speech_lens)
        prefix = text[:, :args.prefix_size] if has_prefix else None
        return beam_search_aux(ens_vars, model_cfg, which, taps, pads,
                               bs_cfg, prefix_tokens=prefix, rng=rng)

    def make_infer_constrained(tables):
        from ..generate.constrained import ConstraintTables

        @jax.jit
        def infer_cons(ens_vars, src_speech, src_speech_lens, arrays, rng):
            taps, pads = _taps_pads(ens_vars, src_speech, src_speech_lens)
            tb = ConstraintTables(arrays, tables.representation,
                                  tables.C, tables.E, tables.P)
            return beam_search_aux(ens_vars, model_cfg, which, taps, pads,
                                   bs_cfg, rng=rng, constraints=tb)

        return infer_cons

    @jax.jit
    def score_ref(ens_vars, src_speech, src_speech_lens, text, text_len):
        taps, pads = _taps_pads(ens_vars, src_speech, src_speech_lens)
        return score_sequences(ens_vars, model_cfg, which, taps, pads,
                               text, text_len)

    scorer = build_scorer(args)
    itr = task.get_batch_iterator(args.gen_subset,
                                  max_tokens=args.max_tokens,
                                  max_sentences=args.batch_size,
                                  shuffle=False)
    dataset = task.datasets[args.gen_subset]
    infer_cons = None
    if cons_all is None and args.constraints:
        from ..generate.constrained import (build_constraint_tables,
                                            pack_constraints)
        per_utt = [cons_map.get(str(uid), []) for uid in dataset.ids]
        n_with = sum(1 for c in per_utt if c)
        logger.info(f"constrained decoding ({args.constraints}): "
                    f"{n_with}/{len(per_utt)} utterances have constraints")
        cons_all = build_constraint_tables(
            pack_constraints(per_utt), len(tgt_dict), args.constraints)
        infer_cons = make_infer_constrained(cons_all)
    n_done = 0
    import time
    t0 = time.perf_counter()
    gen_tokens = 0
    text_key = "src_text" if use_asr else "tgt_text"
    rng0 = jax.random.PRNGKey(getattr(args, "seed", 1) or 1)
    n_batch = 0
    for batch in itr.next_epoch_itr(shuffle=False):
        ids = np.asarray(batch["id"])
        if args.score_reference:
            # SequenceScorer mode (fairseq generate --score-reference)
            out = score_ref(ens_vars, jnp.asarray(batch["src_speech"]),
                            jnp.asarray(batch["src_speech_lens"]),
                            jnp.asarray(batch[text_key]),
                            jnp.asarray(batch[f"{text_key}_len"]))
            pos = np.asarray(out["positional_scores"])
            sc = np.asarray(out["score"])
            lens = np.asarray(batch[f"{text_key}_len"])
            toks = np.asarray(batch[text_key])
            for row in range(len(ids)):
                if ids[row] < 0:
                    continue
                idx = int(ids[row])
                sample_id = dataset.ids[idx]
                ref = (dataset.src_texts[idx] if use_asr
                       else dataset.tgt_texts[idx])
                n = int(lens[row])
                hyp_ids = toks[row, :n]
                hyp = tgt_dict.string(hyp_ids[hyp_ids != 2])
                gen_tokens += n
                print(f"S-{sample_id}\t{sample_id}")
                print(f"T-{sample_id}\t{ref}")
                print(f"H-{sample_id}\t{sc[row]:.4f}\t{hyp}")
                print(f"P-{sample_id}\t" + " ".join(
                    f"{x:.4f}" for x in pos[row, :n]))
                scorer.add_string(ref, hyp)
                n_done += 1
            continue
        if infer_cons is not None:
            rows = jnp.asarray(np.maximum(ids, 0))
            arrays_b = {k: v[rows] for k, v in cons_all.arrays.items()}
            out = infer_cons(ens_vars, jnp.asarray(batch["src_speech"]),
                             jnp.asarray(batch["src_speech_lens"]),
                             arrays_b, jax.random.fold_in(rng0, n_batch))
        else:
            out = infer(ens_vars, jnp.asarray(batch["src_speech"]),
                        jnp.asarray(batch["src_speech_lens"]),
                        jnp.asarray(batch[text_key]),
                        jax.random.fold_in(rng0, n_batch),
                        has_prefix=args.prefix_size > 0)
        n_batch += 1
        tokens = np.asarray(out["tokens"])        # (B, K, L)
        lengths = np.asarray(out["lengths"])
        scores = np.asarray(out["scores"])
        for row in range(len(ids)):
            if ids[row] < 0:
                continue
            idx = int(ids[row])
            sample_id = dataset.ids[idx]
            ref = (dataset.src_texts[idx] if use_asr
                   else dataset.tgt_texts[idx])
            print(f"S-{sample_id}\t{sample_id}")
            print(f"T-{sample_id}\t{ref}")
            if infer_cons is not None:
                # C- lines precede the hypotheses (fairseq_cli/generate.py)
                for ph in cons_text.get(str(sample_id), []):
                    print(f"C-{sample_id}\t{ph}")
            for j in range(nbest):
                # hypothesis j: tokens[1..len] with eos stripped
                n = int(lengths[row, j])
                hyp_ids = tokens[row, j, 1:1 + n]
                hyp_ids = hyp_ids[hyp_ids != 2][:n]
                hyp = tgt_dict.string(hyp_ids)
                print(f"H-{sample_id}\t{scores[row, j]:.4f}\t{hyp}")
                print(f"D-{sample_id}\t{scores[row, j]:.4f}\t{hyp}")
                if j == 0:
                    gen_tokens += n
                    scorer.add_string(ref, hyp)
                    n_done += 1
    dt = time.perf_counter() - t0
    logger.info(f"Translated {n_done} sentences ({gen_tokens} tokens) in "
                f"{dt:.1f}s ({n_done / max(dt, 1e-9):.2f} sentences/s, "
                f"{gen_tokens / max(dt, 1e-9):.2f} tokens/s)")
    print(f"Generate {args.gen_subset} with beam={args.beam}: "
          f"{scorer.result_string()}")
    return 0


def cli_main():
    sys.exit(main())


if __name__ == "__main__":
    cli_main()
