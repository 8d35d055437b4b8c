"""Fused Pallas GRU layer vs the lax.scan reference — values AND gradients.

Runs the kernel in interpret mode (tests force CPU); the compiled TPU path
is exercised by bench/profiling runs and the training entry, where
S2AG_GRU_ENGINE=pallas is the TPU default (models/layers._gru_engine).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2affective_gestures_tpu.ops import gru_pallas

T, D, B, H = 7, 2, 4, 12


def scan_reference(xp_scan, w_hh, b_hh):
    """The exact cell from models/layers.GRU (torch semantics)."""
    hsz = w_hh.shape[1]

    def cell(h, xp_t):
        hp = jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh[:, None, :]
        r = jax.nn.sigmoid(xp_t[..., :hsz] + hp[..., :hsz])
        z = jax.nn.sigmoid(xp_t[..., hsz:2 * hsz] + hp[..., hsz:2 * hsz])
        n = jnp.tanh(xp_t[..., 2 * hsz:] + r * hp[..., 2 * hsz:])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((xp_scan.shape[1], xp_scan.shape[2], hsz), xp_scan.dtype)
    h_last, ys = jax.lax.scan(cell, h0, xp_scan)
    return ys, h_last


@pytest.fixture()
def inputs(rng):
    xp = rng.standard_normal((T, D, B, 3 * H)).astype(np.float32)
    w = (rng.standard_normal((D, H, 3 * H)) / np.sqrt(H)).astype(np.float32)
    b = (rng.standard_normal((D, 3 * H)) * 0.1).astype(np.float32)
    return jnp.asarray(xp), jnp.asarray(w), jnp.asarray(b)


def test_forward_matches_scan(inputs):
    xp, w, b = inputs
    want_ys, want_h = scan_reference(xp, w, b)
    got_ys, got_h = gru_pallas.run_layer(xp, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-6)


def test_forward_unidirectional(rng):
    xp = jnp.asarray(rng.standard_normal((T, 1, B, 3 * H)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((1, H, 3 * H)) / 4).astype(np.float32))
    b = jnp.zeros((1, 3 * H), jnp.float32)
    want_ys, _ = scan_reference(xp, w, b)
    got_ys, _ = gru_pallas.run_layer(xp, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_scan(inputs):
    """Full VJP vs autodiff-through-scan: d/dxp, d/dw_hh, d/db_hh."""
    xp, w, b = inputs

    def loss_scan(xp, w, b):
        ys, _ = scan_reference(xp, w, b)
        return jnp.sum(jnp.sin(ys) * jnp.cos(ys * 0.5 + 0.1))

    def loss_pallas(xp, w, b):
        ys, _ = gru_pallas.run_layer(xp, w, b, interpret=True)
        return jnp.sum(jnp.sin(ys) * jnp.cos(ys * 0.5 + 0.1))

    want = jax.grad(loss_scan, argnums=(0, 1, 2))(xp, w, b)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(xp, w, b)
    for name, g_got, g_want in zip(("dxp", "dw_hh", "db_hh"), got, want):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), rtol=2e-4, atol=1e-5,
            err_msg=name,
        )


def test_gradients_with_batch_padding(rng):
    """B not a multiple of the tile: padded rows must not pollute the
    weight gradients."""
    xp = jnp.asarray(rng.standard_normal((5, 2, 3, 3 * H)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((2, H, 3 * H)) / 4).astype(np.float32))
    b = jnp.asarray((rng.standard_normal((2, 3 * H)) * 0.1).astype(np.float32))

    def loss(fn):
        def inner(xp, w, b):
            ys, _ = fn(xp, w, b)
            return jnp.sum(ys ** 2)
        return inner

    want = jax.grad(loss(scan_reference), argnums=(1, 2))(xp, w, b)
    got = jax.grad(
        loss(lambda *a: gru_pallas.run_layer(*a, interpret=True)),
        argnums=(1, 2),
    )(xp, w, b)
    for g_got, g_want in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=2e-4, atol=1e-5)


def test_time_blocked_kernel_matches_scan(rng, monkeypatch):
    """TT=2 path (the production default for T=34): values + grads."""
    monkeypatch.setattr(gru_pallas, "TIME_BLOCK", 2)
    T2 = 8
    xp = jnp.asarray(rng.standard_normal((T2, D, B, 3 * H)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((D, H, 3 * H)) / 4).astype(np.float32))
    b = jnp.asarray((rng.standard_normal((D, 3 * H)) * 0.1).astype(np.float32))

    want_ys, want_h = scan_reference(xp, w, b)
    got_ys, got_h = gru_pallas.run_layer(xp, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        def inner(xp, w, b):
            ys, _ = fn(xp, w, b)
            return jnp.sum(jnp.sin(ys) * ys)
        return inner

    want = jax.grad(loss(scan_reference), argnums=(0, 1, 2))(xp, w, b)
    got = jax.grad(
        loss(lambda *a: gru_pallas.run_layer(*a, interpret=True)),
        argnums=(0, 1, 2),
    )(xp, w, b)
    for name, g_got, g_want in zip(("dxp", "dw", "db"), got, want):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=2e-4, atol=1e-5, err_msg=name)


def test_time_block_fallback_when_not_divisible(monkeypatch, rng):
    """T not divisible by TIME_BLOCK falls back to per-step grid."""
    monkeypatch.setattr(gru_pallas, "TIME_BLOCK", 4)
    xp = jnp.asarray(rng.standard_normal((7, 1, 4, 3 * H)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((1, H, 3 * H)) / 4).astype(np.float32))
    b = jnp.zeros((1, 3 * H), jnp.float32)
    want_ys, _ = scan_reference(xp, w, b)
    got_ys, _ = gru_pallas.run_layer(xp, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                               rtol=1e-5, atol=1e-6)


def test_multi_batch_block_gradients(rng):
    """B=256 triggers the nb>1 grid (bt=64): the cross-block dwcat/dbhn
    accumulation and per-block dh carry re-init must agree with the scan —
    this is exactly the bench sweep's large-batch configuration, invisible
    to the small-B tests above."""
    Hs, Ts, Bs = 8, 4, 256
    xp = jnp.asarray(
        (rng.standard_normal((Ts, D, Bs, 3 * Hs)) * 0.3).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((D, Hs, 3 * Hs)) / 4).astype(np.float32))
    b = jnp.asarray((rng.standard_normal((D, 3 * Hs)) * 0.1).astype(np.float32))
    # the tiling really is multi-block for this shape
    assert gru_pallas._tiles(Bs) == (4, 64)

    want_ys, want_h = scan_reference(xp, w, b)
    got_ys, got_h = gru_pallas.run_layer(xp, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        def inner(xp, w, b):
            ys, _ = fn(xp, w, b)
            return jnp.sum(jnp.sin(ys) * ys)
        return inner

    want = jax.grad(loss(scan_reference), argnums=(0, 1, 2))(xp, w, b)
    got = jax.grad(
        loss(lambda *a: gru_pallas.run_layer(*a, interpret=True)),
        argnums=(0, 1, 2),
    )(xp, w, b)
    for name, g_got, g_want in zip(("dxp", "dw_hh", "db_hh"), got, want):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
