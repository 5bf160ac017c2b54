"""Observability / resilience utilities (SURVEY.md §5).

- NaN detection (fairseq/nan_detector.py parity): name the first parameter
  or gradient whose values go non-finite. On TPU we cannot hook module
  forwards; instead we scan pytrees on demand (cheap: one jitted
  all-finite reduction per leaf) when a non-finite loss/gnorm is observed —
  mirroring the reference's "re-run with NanDetector" flow
  (fairseq/trainer.py:882-898).
- Heartbeat watchdog (DistributedTimeoutWrapper parity,
  fairseq/distributed/distributed_timeout_wrapper.py:17-94): a daemon
  thread that raises in the main thread if no progress beat arrives within
  the timeout.
- Profiler: jax.profiler trace context (replaces torch.cuda.profiler +
  emit_nvtx, fairseq_cli/train.py:503-506).
- Compile-count watchdog (trainer.py:1447-1461 parity): warn when the
  number of jit compilations keeps growing mid-training (shape leaks).
"""

from __future__ import annotations

import contextlib
import logging
import os
import signal
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# NaN detection
# ---------------------------------------------------------------------------

def find_nonfinite(tree, prefix: str = "") -> List[str]:
    """Return the paths of all leaves containing non-finite values."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = prefix + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        arr = np.asarray(jax.device_get(leaf))
        if np.issubdtype(arr.dtype, np.floating) and not np.all(
                np.isfinite(arr)):
            n_bad = int(np.sum(~np.isfinite(arr)))
            bad.append(f"{name} ({n_bad}/{arr.size} non-finite)")
    return bad


def report_nonfinite(grads=None, params=None, batch=None) -> str:
    """Human-readable non-finite report (NanDetector output parity)."""
    lines = []
    for name, tree in (("grads", grads), ("params", params),
                       ("batch", batch)):
        if tree is not None:
            for entry in find_nonfinite(tree, prefix=f"{name}:"):
                lines.append(entry)
    return "\n".join(lines) if lines else "no non-finite values found"


# ---------------------------------------------------------------------------
# heartbeat watchdog
# ---------------------------------------------------------------------------

class HeartbeatWatchdog:
    """Signals SIGINT to the process if `beat()` is not called within
    `timeout` seconds (reference: heartbeat thread kills a hung rank)."""

    def __init__(self, timeout: float):
        self.timeout = timeout
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self):
        if self.timeout <= 0:
            return self

        def run():
            while not self._stop.wait(min(self.timeout / 4, 5.0)):
                if time.monotonic() - self._last > self.timeout:
                    logger.error(
                        f"no heartbeat for {self.timeout}s; interrupting")
                    os.kill(os.getpid(), signal.SIGINT)
                    return
        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def beat(self):
        self._last = time.monotonic()

    def stop(self):
        self._stop.set()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def profile(enabled: bool, logdir: str = "/tmp/s2st_tpu_profile"):
    """jax.profiler trace context (`--profile` flag)."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
    logger.info(f"profiler trace written to {logdir}")


class CompileWatchdog:
    """Warns when jit compilation keeps happening after warmup — the usual
    cause is dynamic shapes leaking into the step functions."""

    def __init__(self, warmup_steps: int = 3):
        self.warmup_steps = warmup_steps
        self.steps = 0
        self.compiles_after_warmup = 0
        self._baseline: Optional[int] = None

    @staticmethod
    def _count() -> int:
        try:
            from jax._src import monitoring  # noqa
            return 0
        except Exception:
            return 0

    def step(self, just_compiled: bool):
        self.steps += 1
        if self.steps > self.warmup_steps and just_compiled:
            self.compiles_after_warmup += 1
            logger.warning(
                f"XLA recompilation at step {self.steps} "
                f"({self.compiles_after_warmup} since warmup) — check for "
                "dynamic shapes (snap_shapes should bound the bucket menu)")
