"""Roofline residual attribution for the fused train step (VERDICT r4
item 6: recorded 67.7 ms vs the composed 59.1 ms floor; PERF.md blames
"non-GEMM elementwise time (LN/softmax/mask, fp32 CTC/CE)" without a
measurement).

Times the SAME fused step with loss terms ablated so each term's cost is
a subtraction of medians, robust to tunnel noise (benchmark/timing
windows). Each config is its own compile; run on the real chip with
nothing else on it.

Usage: python tools/roofline_ablate.py [--out /tmp/roofline.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


CONFIGS = [
    # (name, kwargs)
    ("full", {}),                                   # ctc=1 aux=1 (record pt)
    ("no_ctc", {"ctc_weight": 0.0}),                # CTC alpha-beta scan off
    ("no_aux", {"aux_weight": 0.0}),                # aux ASR/ST CE off
    ("speech_only", {"ctc_weight": 0.0, "aux_weight": 0.0}),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("roofline_ablate")
    ap.add_argument("--out", default="/tmp/roofline.json")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)

    from s2st_tpu.benchmark.bench_train import run_train_bench

    results = {}
    for name, kw in CONFIGS:
        t0 = time.time()
        r = run_train_bench(n_steps=args.steps, **kw)
        r["setup_wall_s"] = round(time.time() - t0, 1)
        results[name] = r
        print(json.dumps({"config": name, **r}), flush=True)

    full = results["full"]["train_step_ms"]
    attribution = {
        "ctc_ms": round(full - results["no_ctc"]["train_step_ms"], 2),
        "aux_ce_ms": round(full - results["no_aux"]["train_step_ms"], 2),
        "speech_core_ms": results["speech_only"]["train_step_ms"],
        "full_ms": full,
    }
    print(json.dumps({"attribution": attribution}), flush=True)
    Path(args.out).write_text(json.dumps({**results,
                                          "attribution": attribution},
                                         indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
