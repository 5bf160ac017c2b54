"""Offline scoring CLI (parity: fairseq_cli/score.py): BLEU/WER between a
system-output file and a reference file, one sentence per line."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser("s2st_tpu score")
    p.add_argument("--sys", "-s", required=True, help="system output file")
    p.add_argument("--ref", "-r", required=True, help="reference file")
    p.add_argument("--scoring", default="sacrebleu",
                   choices=["sacrebleu", "bleu", "wer"])
    p.add_argument("--ignore-case", action="store_true")
    args = p.parse_args(argv)

    from ..scoring import BleuScorer, WerScorer
    scorer = (WerScorer(lowercase=args.ignore_case)
              if args.scoring == "wer"
              else BleuScorer(lowercase=args.ignore_case))
    with open(args.sys, encoding="utf-8") as fs, \
            open(args.ref, encoding="utf-8") as fr:
        for hyp, ref in zip(fs, fr):
            scorer.add_string(ref.strip(), hyp.strip())
    print(scorer.result_string())
    return 0


if __name__ == "__main__":
    sys.exit(main())
