"""Checkpoint parameter averaging CLI
(parity: scripts/average_checkpoints.py, used by run_baseline.sh:126-128
to average the last 15 epoch checkpoints before inference)."""

from __future__ import annotations

import argparse
import logging
import re
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("s2st_tpu.average_checkpoints")


def last_n_checkpoints(paths: List[str], n: int,
                       upper_bound: Optional[int] = None) -> List[str]:
    """Pick the n highest-numbered checkpoint{N}.npz files."""
    assert len(paths) == 1
    path = Path(paths[0])
    pt_regexp = re.compile(r"checkpoint(\d+)\.npz")
    found = []
    for p in path.iterdir():
        mt = pt_regexp.fullmatch(p.name)
        if mt and (upper_bound is None or int(mt.group(1)) <= upper_bound):
            found.append((int(mt.group(1)), str(p)))
    if len(found) < n:
        raise Exception(f"Found {len(found)} checkpoint files, need {n}")
    return [p for _, p in sorted(found, reverse=True)[:n]]


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    parser = argparse.ArgumentParser("s2st_tpu average_checkpoints")
    parser.add_argument("--inputs", nargs="+", required=True,
                        help="checkpoint files, or one dir with "
                             "--num-epoch-checkpoints")
    parser.add_argument("--output", required=True)
    parser.add_argument("--num-epoch-checkpoints", type=int, default=None)
    parser.add_argument("--checkpoint-upper-bound", type=int, default=None)
    args = parser.parse_args(argv)

    from ..train.checkpoint import average_checkpoints
    inputs = args.inputs
    if args.num_epoch_checkpoints is not None:
        inputs = last_n_checkpoints(inputs, args.num_epoch_checkpoints,
                                    args.checkpoint_upper_bound)
    logger.info(f"averaging {len(inputs)} checkpoints")
    avg = average_checkpoints(inputs)
    tmp = args.output + ".tmp.npz"
    np.savez(tmp, **avg)
    import os
    os.replace(tmp, args.output)
    logger.info(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
