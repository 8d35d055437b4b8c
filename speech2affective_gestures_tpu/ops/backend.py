"""Single source of truth for backend/platform detection.

The round-3 verdict found two divergent checks: ops/dsp.py accepted
backends ("tpu", "axon") as TPU while models/layers.py matched only
"tpu" — so on a platform reporting "axon" the Pallas GRU (the documented
TPU default engine) would silently fall back to lax.scan. Every module
now asks this helper instead of inspecting `jax.default_backend()`
itself, and bench.py stamps the resolved engine into its JSON artifact
so a silent fallback can never hide in a published number again.
"""

from __future__ import annotations

import jax

# platform strings that mean "a real TPU is the default backend".
# "axon" is the experimental tunnel plugin used in this environment; it
# registers TPU devices (device_kind "TPU v5 lite" etc.) under its own
# platform name on some versions.
_TPU_PLATFORMS = ("tpu", "axon")


def is_tpu() -> bool:
    """True iff the default JAX backend is a TPU (incl. the axon tunnel)."""
    return jax.default_backend() in _TPU_PLATFORMS


def backend_name() -> str:
    """The raw platform string (for logging/bench artifacts)."""
    return jax.default_backend()
