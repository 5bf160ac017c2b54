"""Split a manifest TSV into N shards / concatenate shards back
(reference: examples/s2s_trans/preprocessing/split_file.py — used with
parallel.pl to fan feature extraction over jobs; same --type split/concat
interface, output naming ``<stem>.audio.<i>.tsv`` 1-based and
``<stem>.audio_phone.tsv`` for the concatenation)."""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from .manifest_utils import load_tsv, save_tsv


def split_manifest(rows, n: int):
    """Contiguous shards; the last takes the remainder
    (split_file.py:16-22)."""
    per = len(rows) // n
    out = []
    start = 0
    for i in range(n):
        end = start + per if i < n - 1 else len(rows)
        out.append(rows[start:end])
        start = end
    return out


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser("s2st_tpu split_file")
    p.add_argument("--input-file", type=str)
    p.add_argument("--output-path", required=True, type=str)
    p.add_argument("--file-part", "-s", type=str, nargs="+")
    # the reference spells the choice "contat"; accept both
    p.add_argument("--type", required=True,
                   choices=["split", "concat", "contat"])
    p.add_argument("--n", type=int)
    args = p.parse_args(argv)

    os.makedirs(args.output_path, exist_ok=True)
    if args.type == "split":
        rows = load_tsv(args.input_file)
        stem = os.path.basename(args.input_file).split(".")[0]
        for i, shard in enumerate(split_manifest(rows, args.n)):
            save_tsv(shard,
                     os.path.join(args.output_path,
                                  f"{stem}.audio.{i + 1}.tsv"))
    else:
        rows = []
        for part in args.file_part:
            rows.extend(load_tsv(part))
        stem = os.path.basename(args.file_part[0]).split(".")[0]
        save_tsv(rows, os.path.join(args.output_path,
                                    f"{stem}.audio_phone.tsv"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
