"""A/B the scalar-QAT training-step overhead at the flagship operating
point (VERDICT r4 item 5: 82.9 ms with per-leaf lax.cond amortization vs
68.3 baseline; target <=1.1x baseline after the static-flag refactor).

Runs the same benchmark/bench_train harness three ways on the real chip:
  baseline        — no QAT
  qat_static      — amortized observers, trainer passes STATIC recompute
                    flags (cached straight-line programs; the new default)
Writes one JSON line per mode; robust-window medians.

Usage: python tools/qat_ab.py [--out /tmp/qat_ab.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("qat_ab")
    ap.add_argument("--out", default="/tmp/qat_ab.json")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)

    from s2st_tpu.benchmark.bench_train import run_train_bench

    results = {}
    t0 = time.time()
    results["baseline"] = run_train_bench(n_steps=args.steps)
    print(json.dumps({"mode": "baseline", **results["baseline"]}),
          flush=True)
    results["qat_static"] = run_train_bench(
        n_steps=args.steps, quant_noise_scalar=0.5)
    print(json.dumps({"mode": "qat_static", **results["qat_static"]}),
          flush=True)
    base = results["baseline"]["train_step_ms"]
    qat = results["qat_static"]["train_step_ms"]
    summary = {
        "baseline_ms": base,
        "qat_static_ms": qat,
        "overhead_x": round(qat / base, 3),
        "r4_qat_ms": 82.9,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)
    Path(args.out).write_text(json.dumps({**results, "summary": summary},
                                         indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
