"""Dump a binarized dataset back to text on stdout (parity:
scripts/read_binarized.py). With --dict, ids map through the dictionary;
without, raw ids print space-separated."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        description="writes text from binarized file to stdout")
    p.add_argument("--dataset-impl", default=None,
                   choices=["mmap", "lazy", "cached", "raw", None])
    p.add_argument("--dict", metavar="FP", default=None,
                   help="dictionary containing known words")
    p.add_argument("--input", metavar="FP", required=True,
                   help="binarized file prefix to read")
    args = p.parse_args(argv)

    from ..data.dictionary import Dictionary
    from ..data.indexed_dataset import load_indexed_dataset

    dictionary = Dictionary.load(args.dict) if args.dict else None
    ds = load_indexed_dataset(args.input, dictionary,
                              dataset_impl=args.dataset_impl,
                              default="lazy")
    if ds is None:
        print(f"could not load dataset at {args.input}", file=sys.stderr)
        return 1
    for i in range(len(ds)):
        row = ds[i]
        if dictionary is None:
            print(" ".join(str(int(x)) for x in row))
        else:
            print(dictionary.string(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
