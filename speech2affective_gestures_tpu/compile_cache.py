"""Persistent XLA compilation cache.

Full-size GAN train-step programs take minutes to compile on this class of
host, and every process (bench tools, serve warmup, the driver's entry
checks) starts cold. JAX can persist compiled executables keyed by HLO so
later processes reuse them; nothing in the reference corresponds to this —
it is pure TPU-runtime infrastructure.

The user-facing CLI entries (main_v2 / main_v1 / serve) and the bench
tools call `enable()` themselves — short training runs are otherwise
compile-dominated (measured: a 2-epoch rehearsal spent ~90-250 s per epoch
on compiles vs ~4 s of steps). Library use stays opt-in. Export
S2AG_COMPILE_CACHE=/path to move the cache, =0 to disable everywhere.
Cache misses/compiles still work as before if the backend does not support
executable serialization — JAX logs a warning and continues, so this is
safe to leave on.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/s2ag_xla_cache")

# a warmed cache inside the repo checkout (tools/warm_compile_cache.py
# creates it; NOT shipped — on tunneled devices big-entry cache reads move
# at the tunnel's <1 MiB/s bulk rate and cost as much as compiling, see the
# tool's docstring). Auto-preferred when a checkout has one, e.g. a CI or
# serving fleet on real TPU hosts that warms it once per image.
REPO_WARM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".xla_warm_cache",
)


def enable(path: str | None = None) -> str | None:
    """Turn on the persistent compilation cache; returns the dir or None.

    Precedence: explicit arg > S2AG_COMPILE_CACHE env > repo-local warmed
    cache (if the checkout ships one) > DEFAULT_DIR.
    A value of "0"/"" disables. Must run before the first compilation to
    help that compilation (later calls still help subsequent ones).
    """
    import jax

    if path is None:
        path = os.environ.get("S2AG_COMPILE_CACHE")
    if path is None:
        path = (REPO_WARM_DIR if os.path.isdir(REPO_WARM_DIR)
                else DEFAULT_DIR)
    if not path or path == "0":
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful time; the default thresholds
    # (1 s / small-entry skip) drop exactly the programs we care about
    # re-using when the tunnel makes compiles slow
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
