"""Offline scoring CLI (parity: fairseq_cli/score.py): BLEU/WER between a
system-output file and a reference file, one sentence per line."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser("s2st_tpu score")
    p.add_argument("--sys", "-s", required=True, help="system output file")
    p.add_argument("--ref", "-r", required=True, nargs="+",
                   help="reference file(s); several enable multi-reference "
                        "BLEU (run_baseline.sh stage 9: sacrebleu with 4 "
                        "Fisher references)")
    p.add_argument("--scoring", default="sacrebleu",
                   choices=["sacrebleu", "bleu", "wer"])
    p.add_argument("--ignore-case", action="store_true")
    args = p.parse_args(argv)

    from ..scoring import BleuScorer, WerScorer

    def read_lines(path):
        with open(path, encoding="utf-8") as f:
            return [ln.strip() for ln in f]

    hyps = read_lines(args.sys)
    ref_streams = [read_lines(r) for r in args.ref]
    for rs in ref_streams:
        assert len(rs) == len(hyps), "sys/ref line-count mismatch"

    if len(ref_streams) > 1:
        if args.scoring == "wer":
            p.error("--scoring wer supports a single reference")
        if args.ignore_case:
            hyps = [h.lower() for h in hyps]
            ref_streams = [[r.lower() for r in rs] for rs in ref_streams]
        try:
            import sacrebleu
            print(str(sacrebleu.corpus_bleu(hyps, ref_streams)))
        except ImportError:
            from ..scoring import bleu_from_counts, corpus_bleu_counts_multi
            refs_per_hyp = [[rs[i].split() for rs in ref_streams]
                            for i in range(len(hyps))]
            score = bleu_from_counts(*corpus_bleu_counts_multi(
                refs_per_hyp, [h.split() for h in hyps]))
            print(f"BLEU4 = {score:.2f} ({len(ref_streams)} references)")
        return 0

    scorer = (WerScorer(lowercase=args.ignore_case)
              if args.scoring == "wer"
              else BleuScorer(lowercase=args.ignore_case))
    for hyp, ref in zip(hyps, ref_streams[0]):
        scorer.add_string(ref, hyp)
    print(scorer.result_string())
    return 0


if __name__ == "__main__":
    sys.exit(main())
