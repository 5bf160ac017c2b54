"""Persistent XLA compilation cache for the CLIs.

The reference pays its CUDA kernel-compile cost once per install; under
JAX every process re-traces and re-compiles its jitted programs, and on a
remote/tunneled TPU backend a big train-step compile is minutes, not
seconds. Enabling JAX's persistent compilation cache makes every CLI
re-invocation (recipe stages, checkpoint_last resumes, generate runs —
e.g. the run_baseline.sh stage 5 resume loop) reuse the serialized
executables from earlier processes.

No reference analogue (fairseq has no cross-process compile cache); this
is TPU-native operational plumbing, mirroring the XLA-compile-time
watchdog concern of fairseq/trainer.py:1447-1461.

Env knobs:
  S2ST_TPU_NO_COMPILATION_CACHE=1   disable entirely
  S2ST_TPU_COMPILATION_CACHE_DIR    cache location
                                    (default ~/.cache/s2st_tpu/xla_cache)
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("s2st_tpu.compilation_cache")

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "s2st_tpu", "xla_cache")


def enable_persistent_cache() -> str | None:
    """Point JAX's persistent compilation cache at a per-user directory.

    Returns the cache dir, or None when disabled/unavailable. Safe to call
    multiple times and from concurrent processes (JAX writes cache entries
    atomically). Programs whose compile takes >=1s are cached, so unit-test
    micro-jits don't churn the directory.
    """
    if os.environ.get("S2ST_TPU_NO_COMPILATION_CACHE"):
        return None
    cache_dir = os.environ.get(
        "S2ST_TPU_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - old jax / RO filesystem
        logger.debug("persistent compilation cache unavailable: %s", e)
        return None
    return cache_dir
