"""Fused Pallas TPU kernel for one (bi)directional GRU layer.

The GAN step is bound by its recurrent scans: profiling
(tools/profile_step.py) shows ~10 us of op/dispatch latency per
`lax.scan` iteration against <1 us of MXU work, across 4 layers x 34
steps x many forwards per step. This kernel runs the ENTIRE time loop of
one layer as a single Pallas program: the hidden state lives in VMEM
scratch across sequential grid steps, the per-step input projections are
double-buffered in from HBM by the Pallas pipeline, and the gate matmuls
run as ONE MXU contraction per direction per step (gate weights
concatenated along the output axis, everything padded to the 128-lane
boundary so the gate slices are tile-aligned) — no per-step XLA op
dispatch at all.

Semantics are EXACTLY the torch GRU cell (gates r,z,n; n-gate uses
r * (W_hn h + b_hn)) as in models/layers.GRU — same math, different loop
engine (verified bit-comparable on TPU, tools/bench_gru_engine.py). The
backward pass is a second Pallas kernel (reverse time loop, gates
recomputed from the saved outputs) wired through jax.custom_vjp, so the
layer trains.

Kernel layout contract (prepared by `run_layer` from the scan layout):
  xp    (T, 3, D, B, P)   input projections per gate (r,z,n), H padded to
                          P = roundup(H, 128); both input and hidden
                          biases for r/z folded in, only the input bias
                          for n (b_hn must multiply by the reset gate
                          inside the cell);
  w_cat (D, P, 3P)        recurrent weights, gates concatenated on the
                          output axis (so hp slices land on lane tiles);
  b_hn  (D, 1, P)         the n-gate hidden bias;
  out   (T, D, B, P)      per-step hidden states (= layer outputs).

The backward direction is handled by the caller feeding time-reversed xp
(direction index 1) and re-flipping the outputs, exactly like the scan
path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_TILE = 128
LANE = 128
# time steps processed per grid iteration. Measured on the v5e: NO
# throughput difference vs 1 (the step is not per-grid-step-overhead
# bound), so the default stays 1 for minimal VMEM pressure; kept as a
# tuning knob for other chips (S2AG_GRU_TT).
TIME_BLOCK = int(os.environ.get("S2AG_GRU_TT", "1"))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(TT, xp_ref, wcat_ref, bhn_ref, out_ref, h_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    n_dir, _, P = h_ref.shape
    for d in range(n_dir):
        h = h_ref[d]                                    # (B, P)
        for tt in range(TT):
            hp = jnp.dot(h, wcat_ref[d],
                         preferred_element_type=jnp.float32)  # (B, 3P)
            hp_n = hp[:, 2 * P:] + bhn_ref[d]
            r = jax.nn.sigmoid(xp_ref[tt, 0, d] + hp[:, :P])
            z = jax.nn.sigmoid(xp_ref[tt, 1, d] + hp[:, P:2 * P])
            n = jnp.tanh(xp_ref[tt, 2, d] + r * hp_n)
            # gates/dots accumulate in f32; storage follows the input dtype
            h = ((1.0 - z) * n + z * h).astype(out_ref.dtype)
            out_ref[tt, d] = h
        h_ref[d] = h


def _tiles(B: int):
    # batch tile: 128 rows, halved for B >= 256 — the backward kernel's
    # working set (xp/ys/dys/dxp blocks + weights + grad accumulators) at
    # bt=128 exceeds scoped VMEM once pipeline double-buffering across two
    # batch blocks kicks in
    if B % B_TILE == 0 and B >= B_TILE:
        bt = 64 if B >= 256 else B_TILE
        return B // bt, bt
    return 1, B


def _fwd_call(xp, w_cat, b_hn, interpret=False):
    T, _, D, B, P = xp.shape
    nb, bt = _tiles(B)
    TT = TIME_BLOCK if T % TIME_BLOCK == 0 else 1
    return pl.pallas_call(
        functools.partial(_fwd_kernel, TT),
        grid=(nb, T // TT),
        in_specs=[
            pl.BlockSpec((TT, 3, D, bt, P), lambda b, t: (t, 0, 0, b, 0)),
            pl.BlockSpec((D, P, 3 * P), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((D, 1, P), lambda b, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TT, D, bt, P), lambda b, t: (t, 0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, D, B, P), xp.dtype),
        scratch_shapes=[pltpu.VMEM((D, bt, P), xp.dtype)],
        interpret=interpret,
    )(xp, w_cat, b_hn)


# ---------------------------------------------------------------------------
# backward (reverse time loop; gates recomputed from saved outputs)
# ---------------------------------------------------------------------------

def _bwd_kernel(TT, n_tblocks, xp_ref, wcat_ref, bhn_ref, ys_ref,
                ys_prev_ref, dys_ref, dxp_ref, dwcat_ref, dbhn_ref, dh_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)
    # this grid iteration processes time block rb (in reverse), i.e. global
    # steps [rb*TT, rb*TT + TT) walked from the top
    rb = n_tblocks - 1 - t

    @pl.when(t == 0)
    def _init_carry():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    @pl.when((b == 0) & (t == 0))
    def _init_accums():
        dwcat_ref[...] = jnp.zeros_like(dwcat_ref)
        dbhn_ref[...] = jnp.zeros_like(dbhn_ref)

    n_dir, _, P = dh_ref.shape
    for d in range(n_dir):
        dh_carry = dh_ref[d]
        dw_acc = jnp.zeros_like(dwcat_ref[d])
        dbn_acc = jnp.zeros_like(dbhn_ref[d])
        for tt in reversed(range(TT)):
            if tt > 0:
                h_prev = ys_ref[tt - 1, d]
            else:
                # previous block's last step; masked to 0 at global step 0
                h_prev = jnp.where(rb == 0, 0.0, ys_prev_ref[0, d])
            hp = jnp.dot(h_prev, wcat_ref[d],
                         preferred_element_type=jnp.float32)
            hp_n = hp[:, 2 * P:] + bhn_ref[d]
            r = jax.nn.sigmoid(xp_ref[tt, 0, d] + hp[:, :P])
            z = jax.nn.sigmoid(xp_ref[tt, 1, d] + hp[:, P:2 * P])
            n = jnp.tanh(xp_ref[tt, 2, d] + r * hp_n)

            dh = dys_ref[tt, d] + dh_carry
            dn = dh * (1.0 - z)
            dz = dh * (h_prev - n)
            dpre_n = dn * (1.0 - n * n)
            dr = dpre_n * hp_n
            dhp_n = dpre_n * r
            dpre_z = dz * z * (1.0 - z)
            dpre_r = dr * r * (1.0 - r)

            dxp_ref[tt, 0, d] = dpre_r.astype(dxp_ref.dtype)
            dxp_ref[tt, 1, d] = dpre_z.astype(dxp_ref.dtype)
            dxp_ref[tt, 2, d] = dpre_n.astype(dxp_ref.dtype)

            dhp_cat = jnp.concatenate([dpre_r, dpre_z, dhp_n], axis=1)
            # dh_prev = dh*z + dhp_cat @ W^T — contracted on W's OUTPUT dim
            # directly, so no transposed weight copy ever enters VMEM
            dh_carry = dh * z + jax.lax.dot_general(
                dhp_cat, wcat_ref[d], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw_acc += jax.lax.dot_general(
                h_prev, dhp_cat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P, 3P)
            dbn_acc += jnp.sum(dhp_n, axis=0, keepdims=True)
        dh_ref[d] = dh_carry
        # accumulate across every (b, t) grid step
        dwcat_ref[d] += dw_acc
        dbhn_ref[d] += dbn_acc


def _bwd_call(xp, w_cat, b_hn, ys, dys, interpret=False):
    T, _, D, B, P = xp.shape
    nb, bt = _tiles(B)
    TT = TIME_BLOCK if T % TIME_BLOCK == 0 else 1
    n_tb = T // TT

    dxp, dwcat, dbhn = pl.pallas_call(
        functools.partial(_bwd_kernel, TT, n_tb),
        grid=(nb, n_tb),
        in_specs=[
            pl.BlockSpec((TT, 3, D, bt, P),
                         lambda b, t: (n_tb - 1 - t, 0, 0, b, 0)),
            pl.BlockSpec((D, P, 3 * P), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((D, 1, P), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((TT, D, bt, P), lambda b, t: (n_tb - 1 - t, 0, b, 0)),
            # ONLY the last step of the previous time block (h_prev for
            # tt=0): a single-slice block keeps VMEM pressure down (a
            # TT-sized block OOMed scoped vmem at bs256); clamped at the
            # bottom, masked to 0 inside the kernel
            pl.BlockSpec(
                (1, D, bt, P),
                lambda b, t: (jnp.maximum((n_tb - 1 - t) * TT - 1, 0),
                              0, b, 0),
            ),
            pl.BlockSpec((TT, D, bt, P), lambda b, t: (n_tb - 1 - t, 0, b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TT, 3, D, bt, P),
                         lambda b, t: (n_tb - 1 - t, 0, 0, b, 0)),
            pl.BlockSpec((D, P, 3 * P), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((D, 1, P), lambda b, t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 3, D, B, P), xp.dtype),
            # weight/bias grads always accumulate in f32 (mixed-precision
            # master-grad convention); cast to the param dtype in _vjp_bwd
            jax.ShapeDtypeStruct((D, P, 3 * P), jnp.float32),
            jax.ShapeDtypeStruct((D, 1, P), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((D, bt, P), jnp.float32)],
        interpret=interpret,
    )(xp, w_cat, b_hn, ys, ys, dys)
    return dxp, dwcat, dbhn


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gru_layer(xp, w_cat, b_hn, interpret=False):
    """ys = fused GRU layer over time (padded layouts, see module doc)."""
    return _fwd_call(xp, w_cat, b_hn, interpret)


def _vjp_fwd(xp, w_cat, b_hn, interpret=False):
    ys = _fwd_call(xp, w_cat, b_hn, interpret)
    return ys, (xp, w_cat, b_hn, ys)


def _vjp_bwd(interpret, res, dys):
    xp, w_cat, b_hn, ys = res
    dxp, dwcat, dbhn = _bwd_call(xp, w_cat, b_hn, ys,
                                 dys.astype(ys.dtype), interpret)
    return dxp, dwcat.astype(w_cat.dtype), dbhn.astype(b_hn.dtype)


_gru_layer.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# adapter from the scan layout (models/layers.GRU)
# ---------------------------------------------------------------------------

def run_layer(xp_scan, w_hh_scan, b_hh_scan, interpret=False):
    """Drop-in replacement for the lax.scan over layers.GRU's cell.

    xp_scan  (T, D, B, 3H)  hoisted input projections (+ b_ih), gate order
                            (r, z, n) along the last axis;
    w_hh_scan (D, H, 3H); b_hh_scan (D, 3H)   torch-layout recurrent params.

    Returns (ys_scan (T, D, B, H), h_last (D, B, H)) exactly like the scan.
    """
    T, D, B, H3 = xp_scan.shape
    H = H3 // 3
    P = _round_up(H, LANE)

    def padH(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, P - H)])

    # per-gate views, H padded to the lane boundary
    xp = jnp.stack(
        [padH(xp_scan[..., :H]), padH(xp_scan[..., H:2 * H]),
         padH(xp_scan[..., 2 * H:])], 1,
    )  # (T, 3, D, B, P)
    b_hh = b_hh_scan.reshape(D, 3, H)
    # fold the r/z hidden biases into xp; keep b_hn separate (it multiplies
    # by the reset gate inside the cell)
    xp = xp.at[:, 0].add(padH(b_hh[:, 0])[:, None, :])
    xp = xp.at[:, 1].add(padH(b_hh[:, 1])[:, None, :])
    b_hn = padH(b_hh[:, 2])[:, None, :]  # (D, 1, P)

    # gate weights concatenated on the output axis, both dims padded
    def padW(w):  # (D, H, H) -> (D, P, P)
        return jnp.pad(w, ((0, 0), (0, P - H), (0, P - H)))

    gates = [padW(w_hh_scan[..., :H]), padW(w_hh_scan[..., H:2 * H]),
             padW(w_hh_scan[..., 2 * H:])]
    w_cat = jnp.concatenate(gates, axis=2)               # (D, P, 3P)

    # pad B to a friendly tile (8-multiple; 128-multiple for large batches)
    B_pad = _round_up(B, B_TILE if B >= B_TILE else 8)
    if B_pad != B:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, B_pad - B), (0, 0)))
    ys = _gru_layer(xp, w_cat, b_hn, interpret)
    ys = ys[:, :, :B, :H]
    return ys, ys[-1]
