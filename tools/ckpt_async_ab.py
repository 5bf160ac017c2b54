"""A/B the async checkpoint writer on the chip (CKPT_ASYNC_AB.json).

Runs the recipe's stage-5 operating point twice for a few epochs on the
.recipe_run feature manifests — once with synchronous saves, once with
--write-checkpoints-asynchronously — and compares per-epoch wall time
derived from the checkpointN save timestamps in each run's log. The save
work (device->host fetch of the 72M-param state + .npz write) is the
per-epoch overhead being overlapped.

Usage: python tools/ckpt_async_ab.py [--features DIR] [--epochs N]
       [--json CKPT_ASYNC_AB.json]
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import subprocess
import sys
import time
from datetime import datetime
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

FLAGS = [
    "--config-yaml", "config.yaml", "--train-subset", "train",
    "--valid-subset", "dev", "--num-workers", "2", "--max-tokens", "2000",
    "--task", "s2s_translation", "--criterion", "s2st_loss",
    "--arch", "s2st_transformer", "--clip-norm", "1.0",
    "--n-frames-per-step", "4", "--bce-pos-weight", "5.0",
    "--dropout", "0.1", "--attention-dropout", "0.1",
    "--activation-dropout", "0.01", "--encoder-normalize-before",
    "--decoder-normalize-before", "--optimizer", "adam", "--lr", "1.5e-3",
    "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "60",
    "--seed", "1", "--label-smoothing", "0.1", "--asr-ce-weight", "0.3",
    "--st-ce-weight", "0.3", "--report-accuracy",
    "--skip-invalid-size-inputs-valid-test", "--ctc-weight", "0.0",
    "--middle-layers", "4,9", "--asr-decoder-layers", "1",
    "--st-decoder-layers", "1", "--asr-decoder-embed-dim", "64",
    "--st-decoder-embed-dim", "64", "--prenet-dim", "32",
    "--max-source-positions", "3000", "--fp16", "--disable-validation",
    "--log-format", "json",
]


def run_once(features: Path, save_dir: Path, epochs: int,
             async_writes: bool) -> dict:
    if save_dir.exists():
        shutil.rmtree(save_dir)
    log = save_dir / "log.txt"
    cmd = [sys.executable, "-m", "s2st_tpu.cli.train", str(features),
           "--save-dir", str(save_dir), "--max-epoch", str(epochs),
           "--log-file", str(log), *FLAGS]
    if async_writes:
        cmd.append("--write-checkpoints-asynchronously")
    t0 = time.time()
    p = subprocess.run(cmd, cwd=str(REPO), capture_output=True, text=True,
                       timeout=7200)
    wall = time.time() - t0
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    # per-epoch wall: timestamps of consecutive checkpointN saves in the
    # stdout (logger lines '... | saved checkpoint to .../checkpointN.npz')
    stamps = []
    for line in p.stdout.splitlines():
        mt = re.match(r"^(\S+ \S+) \| INFO \| s2st_tpu.train.checkpoint \| "
                      r"saved checkpoint to .*/checkpoint(\d+)\.npz", line)
        if mt:
            ts = datetime.strptime(mt.group(1)[:23], "%Y-%m-%d %H:%M:%S,%f")
            stamps.append((int(mt.group(2)), ts.timestamp()))
    gaps = [round(b[1] - a[1], 1)
            for a, b in zip(stamps, stamps[1:]) if b[0] == a[0] + 1]
    return {"async": async_writes, "total_wall_s": round(wall, 1),
            "epochs": epochs, "epoch_gaps_s": gaps,
            "median_epoch_s": (round(sorted(gaps)[len(gaps) // 2], 1)
                               if gaps else None)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("ckpt_async_ab")
    ap.add_argument("--features",
                    default=str(REPO / ".recipe_run" / "features"))
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--json", default=str(REPO / "CKPT_ASYNC_AB.json"))
    args = ap.parse_args(argv)
    features = Path(args.features)
    assert (features / "config.yaml").exists(), \
        f"no feature manifests at {features} (run tools/run_recipe_e2e.py)"

    rec = {"recorded_unix": round(time.time(), 1), "runs": []}
    try:
        import jax
        rec["platform"] = str(jax.devices()[0])
    except Exception as e:  # pragma: no cover
        rec["platform"] = f"unavailable: {e}"
    work = REPO / ".ckpt_ab"
    # interleave would be better against chip-day drift, but each run pays
    # a process bring-up; sync first, then async, then sync again to
    # bracket any drift
    for mode in (False, True, False):
        r = run_once(features, work / ("async" if mode else "sync"),
                     args.epochs, mode)
        rec["runs"].append(r)
        print(json.dumps(r))
    sync_meds = [r["median_epoch_s"] for r in rec["runs"] if not r["async"]]
    async_med = [r["median_epoch_s"] for r in rec["runs"] if r["async"]][0]
    if all(m is not None for m in sync_meds) and async_med is not None:
        rec["sync_median_epoch_s"] = min(sync_meds)
        rec["async_median_epoch_s"] = async_med
        rec["epoch_speedup"] = round(min(sync_meds) / async_med, 2)
    Path(args.json).write_text(json.dumps(rec, indent=1) + "\n")
    print(f"wrote {args.json}")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
