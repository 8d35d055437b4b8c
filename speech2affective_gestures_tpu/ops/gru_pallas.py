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



# ===========================================================================
# v2: glue-free layout (round-3 MFU work)
#
# The v1 kernel above is fast inside, but the adapter around it is not: per
# layer per forward it pays a gate-split+pad+stack into (T, 3, D, B, P)
# (~40 MB materialized at bs128/H300), two 40 MB bias `at[].add`s, a time
# flip of xp for the reverse direction and another flip of its outputs.
# v2 removes ALL of that:
#
#   - xp arrives as (T, B, D*3P) — the layout ONE matmul per layer produces
#     directly (gate columns pre-padded to the lane boundary inside the
#     weight matrix; zero columns cost nothing in the matmul); the grid's
#     direction axis selects the d-th 3P segment via the block index map;
#   - biases are applied INSIDE the kernel (fused into the gate math);
#   - the reverse direction never flips: direction is a grid axis and the
#     time index map walks it backwards (and writes its outputs back in
#     forward time order, so the consumer needs no re-flip either);
#   - layer outputs are (T, B, D*P) with zeroed pad lanes, which IS the next
#     layer's matmul input (its weight rows for the pad lanes are zero) —
#     the exact (T, B, D*H) tensor is materialized once at the top of the
#     stack, not per layer.
#
# Cell math and numerics are identical to v1/scan (torch GRU semantics,
# f32 gate accumulation via preferred_element_type at any storage dtype).
# TPU lowering note: blocks keep (sublane, lane) = (batch-tile, 3P) as the
# trailing dims; T and D are leading grid-indexed axes.
# ===========================================================================


def _fwd_kernel_v2(xp_ref, wcat_ref, ball_ref, bhn_ref, out_ref, h_ref):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    P = h_ref.shape[-1]
    h = h_ref[...]                                          # (bt, P)
    hp = jnp.dot(h, wcat_ref[0], preferred_element_type=jnp.float32)
    xpb = xp_ref[0] + ball_ref[0]                           # (bt, 3P)
    r = jax.nn.sigmoid(xpb[:, :P] + hp[:, :P])
    z = jax.nn.sigmoid(xpb[:, P:2 * P] + hp[:, P:2 * P])
    n = jnp.tanh(xpb[:, 2 * P:] + r * (hp[:, 2 * P:] + bhn_ref[0]))
    h = ((1.0 - z) * n + z * h).astype(out_ref.dtype)
    out_ref[0] = h
    h_ref[...] = h


def _fwd_call_v2(xp, w_cat, b_all, b_hn, interpret=False):
    """xp (T, B, D*3P) -> ys (T, B, D*P); direction d reads/writes the d-th
    lane segment, walking time backwards for d=1 via the index maps."""
    T, B, _ = xp.shape
    D, P, _ = w_cat.shape
    nb, bt = _tiles(B)

    def t_eff(d, t):
        return jnp.where(d == 0, t, T - 1 - t)

    return pl.pallas_call(
        _fwd_kernel_v2,
        grid=(nb, D, T),
        in_specs=[
            pl.BlockSpec((1, bt, 3 * P), lambda b, d, t: (t_eff(d, t), b, d)),
            pl.BlockSpec((1, P, 3 * P), lambda b, d, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, 3 * P), lambda b, d, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda b, d, t: (d, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, P),
                               lambda b, d, t: (t_eff(d, t), b, d)),
        out_shape=jax.ShapeDtypeStruct((T, B, D * P), xp.dtype),
        scratch_shapes=[pltpu.VMEM((bt, P), xp.dtype)],
        interpret=interpret,
    )(xp, w_cat, b_all, b_hn)


def _bwd_kernel_v2(T, D, xp_ref, wcat_ref, ball_ref, bhn_ref, ys_prev_ref,
                   dys_ref, dxp_ref, dwcat_ref, dbhn_ref, dh_ref):
    b = pl.program_id(0)
    d = pl.program_id(1)
    t = pl.program_id(2)
    # walk each direction OPPOSITE to its forward walk: d=0 was forward
    # time ascending, so its backward descends (p = T-1-t); d=1 was
    # descending, so its backward ascends (p = t)
    p = jnp.where(d == 0, T - 1 - t, t)
    at_start = jnp.where(d == 0, p == 0, p == T - 1)

    @pl.when(t == 0)
    def _init_carry():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    @pl.when((b == 0) & (d == 0) & (t == 0))
    def _init_accums():
        dwcat_ref[...] = jnp.zeros_like(dwcat_ref)
        dbhn_ref[...] = jnp.zeros_like(dbhn_ref)

    P = dh_ref.shape[-1]
    h_prev = jnp.where(at_start, 0.0, ys_prev_ref[0])       # (bt, P)
    hp = jnp.dot(h_prev, wcat_ref[0], preferred_element_type=jnp.float32)
    xpb = xp_ref[0] + ball_ref[0]
    hpn_b = hp[:, 2 * P:] + bhn_ref[0]
    r = jax.nn.sigmoid(xpb[:, :P] + hp[:, :P])
    z = jax.nn.sigmoid(xpb[:, P:2 * P] + hp[:, P:2 * P])
    n = jnp.tanh(xpb[:, 2 * P:] + r * hpn_b)

    dh = dys_ref[0] + dh_ref[...]
    dn = dh * (1.0 - z)
    dz = dh * (h_prev - n)
    dpre_n = dn * (1.0 - n * n)
    dr = dpre_n * hpn_b
    dhp_n = dpre_n * r
    dpre_z = dz * z * (1.0 - z)
    dpre_r = dr * r * (1.0 - r)

    dxp_ref[0, :, :P] = dpre_r.astype(dxp_ref.dtype)
    dxp_ref[0, :, P:2 * P] = dpre_z.astype(dxp_ref.dtype)
    dxp_ref[0, :, 2 * P:] = dpre_n.astype(dxp_ref.dtype)

    dhp_cat = jnp.concatenate([dpre_r, dpre_z, dhp_n], axis=1)
    # dh_prev = dh*z + dhp_cat @ W^T (contract on W's output dim directly)
    dh_ref[...] = dh * z + jax.lax.dot_general(
        dhp_cat, wcat_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw = jax.lax.dot_general(
        h_prev, dhp_cat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbn = jnp.sum(dhp_n, axis=0, keepdims=True)
    # accumulators hold ALL directions (constant block index, so the block
    # never flushes mid-grid); the direction slot is selected statically
    for dd in range(D):
        @pl.when(d == dd)
        def _acc(dd=dd, dw=dw, dbn=dbn):
            dwcat_ref[dd] += dw
            dbhn_ref[dd] += dbn


def _bwd_call_v2(xp, w_cat, b_all, b_hn, ys, dys, interpret=False):
    T, B, _ = xp.shape
    D, P, _ = w_cat.shape
    nb, bt = _tiles(B)

    def t_eff(d, t):
        return jnp.where(d == 0, T - 1 - t, t)

    def t_prev(d, t):
        # h_prev's position in forward time: p-1 for d=0, p+1 for d=1
        return jnp.where(d == 0, jnp.maximum(T - 2 - t, 0),
                         jnp.minimum(t + 1, T - 1))

    dxp, dwcat, dbhn = pl.pallas_call(
        functools.partial(_bwd_kernel_v2, T, D),
        grid=(nb, D, T),
        in_specs=[
            pl.BlockSpec((1, bt, 3 * P), lambda b, d, t: (t_eff(d, t), b, d)),
            pl.BlockSpec((1, P, 3 * P), lambda b, d, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, 3 * P), lambda b, d, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda b, d, t: (d, 0, 0)),
            pl.BlockSpec((1, bt, P), lambda b, d, t: (t_prev(d, t), b, d)),
            pl.BlockSpec((1, bt, P), lambda b, d, t: (t_eff(d, t), b, d)),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, 3 * P), lambda b, d, t: (t_eff(d, t), b, d)),
            pl.BlockSpec((D, P, 3 * P), lambda b, d, t: (0, 0, 0)),
            pl.BlockSpec((D, 1, P), lambda b, d, t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D * 3 * P), xp.dtype),
            # weight/bias grads accumulate in f32 (mixed-precision master-
            # grad convention); cast to the param dtype in _vjp_bwd_v2
            jax.ShapeDtypeStruct((D, P, 3 * P), jnp.float32),
            jax.ShapeDtypeStruct((D, 1, P), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bt, P), jnp.float32)],
        interpret=interpret,
    )(xp, w_cat, b_all, b_hn, ys, dys)
    return dxp, dwcat, dbhn


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gru_layer_v2(xp, w_cat, b_all, b_hn, interpret=False):
    """ys (T, B, D*P) = fused GRU layer, v2 layout (see section banner)."""
    return _fwd_call_v2(xp, w_cat, b_all, b_hn, interpret)


def _vjp_fwd_v2(xp, w_cat, b_all, b_hn, interpret=False):
    ys = _fwd_call_v2(xp, w_cat, b_all, b_hn, interpret)
    return ys, (xp, w_cat, b_all, b_hn, ys)


def _vjp_bwd_v2(interpret, res, dys):
    xp, w_cat, b_all, b_hn, ys = res
    D, P, _ = w_cat.shape
    dxp, dwcat, dbhn = _bwd_call_v2(xp, w_cat, b_all, b_hn, ys,
                                    dys.astype(ys.dtype), interpret)
    # bias grad for the in-kernel xp + b_all add: reduce dxp over (T, B)
    dball = dxp.astype(jnp.float32).sum(axis=(0, 1)).reshape(D, 1, 3 * P)
    return (dxp, dwcat.astype(w_cat.dtype), dball.astype(b_all.dtype),
            dbhn.astype(b_hn.dtype))


_gru_layer_v2.defvjp(_vjp_fwd_v2, _vjp_bwd_v2)


# ---------------------------------------------------------------------------
# v2 adapters (used by models/layers.GRU's 'pallas' engine)
# ---------------------------------------------------------------------------

def pad_gate_weights(w_ih, H):
    """(cin, 3H) torch-layout input-projection weights -> (cin, 3P) with
    each gate's columns starting at a lane boundary (k*P)."""
    cin = w_ih.shape[0]
    P = _round_up(H, LANE)
    if P == H:
        return w_ih
    out = jnp.zeros((cin, 3 * P), w_ih.dtype)
    for g in range(3):
        out = out.at[:, g * P:g * P + H].set(w_ih[:, g * H:(g + 1) * H])
    return out


def stack_input_weights(w_ih_list, H, padded_input=False, num_dir_in=2):
    """Stack per-direction (cin, 3H) input-projection weights into the ONE
    (cin_eff, D, 3P) operand of the per-layer input matmul
    (einsum 'tbc,cdk->tbdk' + free reshape to (T, B, D*3P)), with gate
    columns pre-padded to lane boundaries. With padded_input=True the rows
    are expanded from num_dir_in*H to num_dir_in*P (zero rows on the pad
    lanes), so the matmul consumes the previous layer's padded (T, B, D*P)
    output directly — no slice/concat between layers."""
    P = _round_up(H, LANE)
    cols = [pad_gate_weights(w, H) for w in w_ih_list]       # (cin, 3P) each
    if padded_input and P != H:
        cin = w_ih_list[0].shape[0]
        assert cin == num_dir_in * H, (cin, num_dir_in, H)
        expanded = []
        for w in cols:
            out = jnp.zeros((num_dir_in * P, 3 * P), w.dtype)
            for i in range(num_dir_in):
                out = out.at[i * P:i * P + H].set(w[i * H:(i + 1) * H])
            expanded.append(out)
        cols = expanded
    return jnp.stack(cols, axis=1)                           # (cin_eff, D, 3P)


def run_layer_v2(xp, w_hh_scan, b_ih_stack, b_hh_stack, interpret=None):
    """xp (T, B, D, 3P) or (T, B, D*3P) from the pre-padded input matmul
    (NO bias, NO flip); w_hh_scan (D, H, 3H), b_ih_stack/b_hh_stack (D, 3H)
    torch layouts.

    Returns ys (T, B, D*P) — BOTH directions in forward time order, pad
    lanes zero — and h_last (D, B, H).

    interpret=None reads S2AG_GRU_PALLAS_INTERPRET (lets CPU tests exercise
    the full module path through the kernel in interpret mode)."""
    if interpret is None:
        interpret = os.environ.get("S2AG_GRU_PALLAS_INTERPRET", "") == "1"
    H = w_hh_scan.shape[1]
    D = w_hh_scan.shape[0]
    P = _round_up(H, LANE)
    if xp.ndim == 4:
        xp = xp.reshape(xp.shape[0], xp.shape[1], -1)        # free
    T, B, _ = xp.shape

    def padH(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, P - H)])

    def padW(w):  # (D, H, H) -> (D, P, P)
        return jnp.pad(w, ((0, 0), (0, P - H), (0, P - H)))

    w_cat = jnp.concatenate(
        [padW(w_hh_scan[..., :H]), padW(w_hh_scan[..., H:2 * H]),
         padW(w_hh_scan[..., 2 * H:])], axis=2)              # (D, P, 3P)
    b_ih = b_ih_stack.reshape(D, 3, H)
    b_hh = b_hh_stack.reshape(D, 3, H)
    # r/z slots carry b_ih + b_hh; the n slot carries ONLY b_ih_n (b_hn
    # multiplies by the reset gate inside the cell)
    b_all = jnp.concatenate(
        [padH(b_ih[:, 0] + b_hh[:, 0]), padH(b_ih[:, 1] + b_hh[:, 1]),
         padH(b_ih[:, 2])], axis=1)[:, None, :]              # (D, 1, 3P)
    b_hn = padH(b_hh[:, 2])[:, None, :]                      # (D, 1, P)

    B_pad = _round_up(B, B_TILE if B >= B_TILE else 8)
    if B_pad != B:
        xp = jnp.pad(xp, ((0, 0), (0, B_pad - B), (0, 0)))
    ys = _gru_layer_v2(xp, w_cat, b_all, b_hn, interpret)
    ys = ys[:, :B]
    # d=0's final state is at the last frame, d=1's (reverse walk, outputs
    # stored in forward order) at the first
    h_last = [ys[-1, :, :H]]
    if D == 2:
        h_last.append(ys[0, :, P:P + H])
    return ys, jnp.stack(h_last, axis=0)
