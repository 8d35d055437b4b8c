"""Honest device timing under async dispatch and unreliable sync primitives.

On the experimental `axon` TPU tunnel `jax.block_until_ready` can return
BEFORE device execution finishes, which silently inflates any
block-until-ready-based rate by the dispatch/execution overlap (measured on
this platform: "impossible" >peak TFLOP/s on chained matmuls). The only
sync that cannot lie is a VALUE FETCH: copying a scalar from the device to
the host can't complete until the producing program has actually run.

Two primitives:

- `fetch_scalar(x)`: device->host copy of one element — the honest barrier.
- `marginal_step_time(run_window)`: the *slope* estimator. One timed window
  measures `t(N) = overhead + N * step_time` where overhead bundles the
  tunnel RTT (~30 ms here), dispatch and the final fetch; timing two window
  sizes and taking `(t(N2) - t(N1)) / (N2 - N1)` cancels the constant term,
  leaving pure per-iteration device time. Medians over repeats reject
  tunnel-latency spikes.

`measure_peak_flops` applies the same estimator to a large bf16 matmul
chain, giving an on-device MXU peak to sanity-check MFU claims against the
spec-sheet number.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def fetch_scalar(x) -> float:
    """Copy ONE element of (the first leaf of) `x` to the host.

    Unlike `jax.block_until_ready`, the returned float PROVES the producing
    computation ran to completion — use it as the timing barrier. The
    element is indexed on-device first so only a scalar crosses the wire
    (device_get of a whole first leaf — e.g. an embedding table inside a
    TrainState — would ship megabytes through the ~30 ms-RTT tunnel at
    every barrier)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    if getattr(leaf, "ndim", 0):
        leaf = leaf[(0,) * leaf.ndim]
    return float(np.asarray(jax.device_get(leaf)))


def marginal_step_time(
    run_window: Callable[[int], float],
    windows: tuple[int, int] = (20, 60),
    reps: int = 3,
) -> dict:
    """Per-iteration device time via the two-window slope estimator.

    `run_window(n)` must dispatch n iterations and end with a value fetch
    from the final result (e.g. `fetch_scalar(metrics["loss"])`), returning
    elapsed wall seconds. Returns the median slope over `reps` repeats plus
    the raw samples for dispersion reporting.
    """
    n1, n2 = windows
    assert n2 > n1 > 0
    slopes = []
    for _ in range(reps):
        t1 = run_window(n1)
        t2 = run_window(n2)
        slopes.append((t2 - t1) / (n2 - n1))
    slopes = sorted(slopes)
    return {
        "sec_per_step": float(np.median(slopes)),
        "steps_per_sec": float(1.0 / np.median(slopes)),
        "slope_samples": slopes,
        "windows": windows,
        "reps": reps,
    }


def measure_peak_flops(
    size: int = 4096, dtype=jnp.bfloat16,
    windows: tuple[int, int] = (200, 600), reps: int = 5,
) -> float:
    """On-device dense-matmul FLOP/s, measured with the same honest slope
    estimator — the empirical ceiling to validate MFU against.

    The windows are large because one matmul is sub-millisecond: the slope
    signal (400 x ~0.8 ms) must dominate the tunnel's ~30 ms RTT jitter,
    or the estimate can even go negative."""

    # bounded-value dependent chain: feeding y=x@x back into itself
    # overflows bf16 to inf within two iterations (ones @ ones = n), and
    # inf-saturated chains have produced nonsense slopes on this platform —
    # instead each iteration multiplies the SAME bounded x, chained through
    # a tiny scalar to keep iterations sequential
    x = jnp.full((size, size), 1.0 / size, dtype)

    @jax.jit
    def mm(c):
        y = (x + c) @ x
        # consume EVERY output element: slicing here lets XLA narrow the
        # contraction to the consumed rows (observed: a y[0,:1] probe
        # "measured" 5x the chip's peak)
        return jnp.sum(y) * 1e-12

    fetch_scalar(mm(jnp.zeros((), dtype)))  # compile + warm the fetch path

    def run_window(n):
        c = jnp.zeros((), dtype)
        t0 = time.perf_counter()
        for _ in range(n):
            c = mm(c)
        fetch_scalar(c)
        return time.perf_counter() - t0

    res = marginal_step_time(run_window, windows, reps)
    return 2.0 * size**3 / res["sec_per_step"]


def time_compiled_step(
    step: Callable, init_carry, windows: tuple[int, int] = (20, 60),
    reps: int = 3,
) -> dict:
    """Honest steps/s of `carry = step(carry)` (dependent chain).

    `step` must return the next carry; the window ends with a value fetch
    from the final carry. The carry dependence serializes iterations so the
    slope is true per-step device time.

    `init_carry` may be a zero-arg factory — required when `step` donates
    its input buffers (each window then starts from fresh copies; the
    factory runs outside the timed region).
    """
    make = init_carry if callable(init_carry) else (lambda: init_carry)

    def run_window(n):
        carry = make()
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(carry)
        fetch_scalar(carry)
        return time.perf_counter() - t0

    # warm: compile + one fetched step
    fetch_scalar(step(make()))
    return marginal_step_time(run_window, windows, reps)
