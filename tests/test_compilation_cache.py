"""Persistent compilation cache plumbing (utils/compilation_cache.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_enable_points_jax_at_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("S2ST_TPU_COMPILATION_CACHE_DIR", str(tmp_path / "c"))
    monkeypatch.delenv("S2ST_TPU_NO_COMPILATION_CACHE", raising=False)
    from s2st_tpu.utils.compilation_cache import enable_persistent_cache
    import jax

    got = enable_persistent_cache()
    try:
        assert got == str(tmp_path / "c")
        assert os.path.isdir(got)
        assert jax.config.jax_compilation_cache_dir == got
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_disable_env_knob(monkeypatch):
    monkeypatch.setenv("S2ST_TPU_NO_COMPILATION_CACHE", "1")
    from s2st_tpu.utils.compilation_cache import enable_persistent_cache

    assert enable_persistent_cache() is None


def test_cache_persists_across_processes(tmp_path):
    """A compiled program lands in the cache dir and the second process
    reuses it (observable: cache dir is non-empty after run 1 and run 2
    does not add new entries for the identical program)."""
    prog = (
        "import os\n"
        "from s2st_tpu.utils.compilation_cache import "
        "enable_persistent_cache\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',"
        " 0.0)\n"
        "enable_persistent_cache()\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',"
        " 0.0)\n"
        "f = jax.jit(lambda x: jnp.tanh(x) @ x)\n"
        "print(float(f(jnp.ones((64, 64)))[0, 0]))\n"
    )
    env = {
        **os.environ,
        "S2ST_TPU_COMPILATION_CACHE_DIR": str(tmp_path / "cache"),
        "PYTHONPATH": REPO,
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
    }
    for _ in range(2):
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr
    entries = [p for p in (tmp_path / "cache").rglob("*") if p.is_file()]
    assert entries, "no cache entries written"
