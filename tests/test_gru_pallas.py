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


# ---------------------------------------------------------------------------
# v2 kernel (glue-free layout: in-kernel biases, grid-index-map direction
# reversal, padded-through stack) — see ops/gru_pallas.py v2 section
# ---------------------------------------------------------------------------

def _v2_reference(x, w_ih, w_hh, b_ih, b_hh, H, D):
    """The scan engine's exact math for one layer, from raw inputs."""
    xps = []
    for d in range(D):
        xp = x @ w_ih[d] + b_ih[d]
        xps.append(jnp.flip(xp, 0) if d else xp)
    ys, h_last = scan_reference(jnp.stack(xps, 1), w_hh, b_hh)
    outs = [ys[:, 0]]
    if D == 2:
        outs.append(jnp.flip(ys[:, 1], 0))
    return jnp.concatenate(outs, -1), h_last


def _v2_run(x, w_ih, w_hh, b_ih, b_hh, H, D):
    P = gru_pallas._round_up(H, gru_pallas.LANE)
    w_stack = gru_pallas.stack_input_weights(
        [w_ih[d] for d in range(D)], H, padded_input=False, num_dir_in=D)
    xp = jnp.einsum("tbc,cdk->tbdk", x, w_stack)
    ys, h_last = gru_pallas.run_layer_v2(xp, w_hh, b_ih, b_hh, interpret=True)
    outs = [ys[:, :, d * P:d * P + H] for d in range(D)]
    return (outs[0] if D == 1 else jnp.concatenate(outs, -1)), h_last


@pytest.mark.parametrize("D2,H2,C2,B2", [
    (2, 12, 5, 4),     # H padded 12 -> 128, small batch (pad to 8)
    (1, 12, 7, 4),     # unidirectional
    (2, 40, 40, 4),
    (2, 8, 6, 256),    # nb>1 grid (bt=64): cross-block dw accumulation
])
def test_v2_values_and_gradients(rng, D2, H2, C2, B2):
    Tv = 6
    x = jnp.asarray(rng.standard_normal((Tv, B2, C2)).astype(np.float32))
    w_ih = jnp.asarray(
        (rng.standard_normal((D2, C2, 3 * H2)) * 0.3).astype(np.float32))
    w_hh = jnp.asarray(
        (rng.standard_normal((D2, H2, 3 * H2)) / 4).astype(np.float32))
    b_ih = jnp.asarray(
        (rng.standard_normal((D2, 3 * H2)) * 0.1).astype(np.float32))
    b_hh = jnp.asarray(
        (rng.standard_normal((D2, 3 * H2)) * 0.1).astype(np.float32))

    want_y, want_h = _v2_reference(x, w_ih, w_hh, b_ih, b_hh, H2, D2)
    got_y, got_h = _v2_run(x, w_ih, w_hh, b_ih, b_hh, H2, D2)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        def inner(args):
            y, h = fn(x, *args, H2, D2)
            return jnp.sum(jnp.sin(y) * y) + jnp.sum(h * 0.7)
        return inner

    want = jax.grad(loss(_v2_reference))((w_ih, w_hh, b_ih, b_hh))
    got = jax.grad(loss(_v2_run))((w_ih, w_hh, b_ih, b_hh))
    for name, g_got, g_want in zip(("w_ih", "w_hh", "b_ih", "b_hh"),
                                   got, want):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=3e-4, atol=3e-5, err_msg=name)
    gx_w = jax.grad(
        lambda xx: _v2_reference(xx, w_ih, w_hh, b_ih, b_hh, H2, D2)[0].sum()
    )(x)
    gx_g = jax.grad(
        lambda xx: _v2_run(xx, w_ih, w_hh, b_ih, b_hh, H2, D2)[0].sum()
    )(x)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_w),
                               rtol=3e-4, atol=3e-5, err_msg="dx")


def test_v2_pad_lanes_stay_zero(rng):
    """The padded-through stack contract: ys pad lanes must be exactly 0
    (the next layer's matmul relies on its zero weight rows meeting zero
    activations)."""
    H2, D2, C2 = 12, 2, 5
    x = jnp.asarray(rng.standard_normal((6, 4, C2)).astype(np.float32))
    w_ih = jnp.asarray(
        (rng.standard_normal((D2, C2, 3 * H2)) * 0.5).astype(np.float32))
    w_hh = jnp.asarray(
        (rng.standard_normal((D2, H2, 3 * H2)) / 3).astype(np.float32))
    b = jnp.asarray((rng.standard_normal((D2, 3 * H2)) * 0.2).astype(np.float32))
    w_stack = gru_pallas.stack_input_weights(
        [w_ih[d] for d in range(D2)], H2, padded_input=False, num_dir_in=D2)
    xp = jnp.einsum("tbc,cdk->tbdk", x, w_stack)
    ys, _ = gru_pallas.run_layer_v2(xp, w_hh, b, b, interpret=True)
    P = gru_pallas._round_up(H2, gru_pallas.LANE)
    for d in range(D2):
        np.testing.assert_array_equal(
            np.asarray(ys[..., d * P + H2:(d + 1) * P]), 0.0)


def test_v2_module_stack_matches_scan_engine(rng, monkeypatch):
    """Full 3-layer bidirectional GRU module: pallas-v2 engine (interpret
    mode) vs the scan engine — outputs, final states and parameter
    gradients. This pins the whole padded-through stack plumbing
    (stack_input_weights row expansion, per-layer reshape, exit concat)."""
    monkeypatch.setenv("S2AG_GRU_PALLAS_INTERPRET", "1")
    import importlib

    from speech2affective_gestures_tpu.models import layers as L

    x = jnp.asarray(rng.standard_normal((3, 5, 11)).astype(np.float32))

    def run(engine):
        monkeypatch.setenv("S2AG_GRU_ENGINE", engine)
        gru = L.GRU(hidden_size=12, num_layers=3, bidirectional=True,
                    dropout=0.0)
        vs = gru.init(jax.random.key(0), x)
        out, finals = gru.apply(vs, x)
        g = jax.grad(lambda p: gru.apply({"params": p}, x)[0].sum())(
            vs["params"])
        return out, finals, g

    o_s, f_s, g_s = run("scan")
    o_p, f_p, g_p = run("pallas")
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_s),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_s),
                               rtol=3e-5, atol=3e-6)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_p))
    for path, v in jax.tree_util.tree_leaves_with_path(g_s):
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(v), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))


def test_v2_bf16_storage_f32_accumulation(rng):
    """bf16 inputs (mixed precision): storage dtype follows the input,
    gate math accumulates in f32 — values track the f32 path within bf16
    resolution."""
    H2, D2, C2 = 12, 2, 5
    x = rng.standard_normal((6, 4, C2)).astype(np.float32)
    w_ih = (rng.standard_normal((D2, C2, 3 * H2)) * 0.3).astype(np.float32)
    w_hh = (rng.standard_normal((D2, H2, 3 * H2)) / 4).astype(np.float32)
    b = (rng.standard_normal((D2, 3 * H2)) * 0.1).astype(np.float32)

    y32, _ = _v2_run(jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh),
                     jnp.asarray(b), jnp.asarray(b), H2, D2)
    y16, _ = _v2_run(jnp.asarray(x, jnp.bfloat16),
                     jnp.asarray(w_ih, jnp.bfloat16),
                     jnp.asarray(w_hh, jnp.bfloat16),
                     jnp.asarray(b, jnp.bfloat16),
                     jnp.asarray(b, jnp.bfloat16), H2, D2)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.05, atol=0.05)


def test_v2_stack_dropout_matches_scan_engine(rng, monkeypatch):
    """With inter-layer dropout ACTIVE, the pallas engine must consume the
    dropout rng exactly like the scan engine (masks drawn on the unpadded
    (T, B, D*H) tensor, same Dropout call order) — same seed, same
    trajectory. Regression: masks were drawn on the padded D*P tensor,
    silently desynchronizing the engines whenever dropout > 0."""
    monkeypatch.setenv("S2AG_GRU_PALLAS_INTERPRET", "1")
    from speech2affective_gestures_tpu.models import layers as L

    x = jnp.asarray(rng.standard_normal((4, 3, 9)).astype(np.float32))

    def run(engine):
        monkeypatch.setenv("S2AG_GRU_ENGINE", engine)
        gru = L.GRU(hidden_size=10, num_layers=3, bidirectional=True,
                    dropout=0.5)
        vs = gru.init(jax.random.key(0), x)
        out, finals = gru.apply(
            vs, x, deterministic=False,
            rngs={"dropout": jax.random.key(7)},
        )
        return np.asarray(out), np.asarray(finals)

    o_s, f_s = run("scan")
    o_p, f_p = run("pallas")
    np.testing.assert_allclose(o_p, o_s, rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(f_p, f_s, rtol=3e-5, atol=3e-6)
