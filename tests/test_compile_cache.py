"""Persistent compilation cache: entries written and reused across processes."""

import os
import subprocess
import sys

SCRIPT = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from speech2affective_gestures_tpu import compile_cache
d = compile_cache.enable({cache!r})
assert d == {cache!r}, d
# the helper's 0.5 s threshold is tuned for real programs; this test's
# toy compile is faster than that, so force-cache everything
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
t0 = time.perf_counter()
f = jax.jit(lambda x: jnp.tanh(x @ x) * 3 + 1)
f(jnp.ones((256, 256))).block_until_ready()
print("compile_s", time.perf_counter() - t0)
"""


def test_cache_populates_and_is_reused(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = str(tmp_path / "xla_cache")
    script = SCRIPT.format(repo=repo, cache=cache)
    env = {k: v for k, v in os.environ.items() if k != "S2AG_COMPILE_CACHE"}
    r1 = subprocess.run([sys.executable, "-c", script], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr
    entries = os.listdir(cache)
    assert entries, "first run must write a cache entry"
    r2 = subprocess.run([sys.executable, "-c", script], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr
    # second process reuses the entry (no new files beyond the first run's)
    assert set(os.listdir(cache)) == set(entries)


def test_disable_via_env(tmp_path, monkeypatch):
    monkeypatch.setenv("S2AG_COMPILE_CACHE", "0")
    from speech2affective_gestures_tpu import compile_cache

    assert compile_cache.enable() is None
