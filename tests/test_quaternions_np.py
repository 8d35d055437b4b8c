"""Numpy Quaternions class vs the reference's utils/Quaternions.py (loaded
as an oracle module)."""

import numpy as np
import pytest

from _reference_oracle import load

from speech2affective_gestures_tpu.ops.quaternions_np import Quaternions

ref_mod = load("utils/Quaternions.py", "_ref_np_quat")
RefQ = ref_mod.Quaternions if ref_mod is not None else None

needs_ref = pytest.mark.skipif(RefQ is None,
                               reason="reference Quaternions not importable")


def rand_q(rng, shape=(16,), unit=True):
    q = rng.standard_normal(shape + (4,))
    if unit:
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return q


@pytest.fixture()
def nprng():
    return np.random.default_rng(0)


@needs_ref
def test_mul_div_neg_abs(nprng):
    a, b = rand_q(nprng), rand_q(nprng)
    np.testing.assert_allclose((Quaternions(a) * Quaternions(b)).qs,
                               (RefQ(a) * RefQ(b)).qs, atol=1e-12)
    np.testing.assert_allclose((Quaternions(a) / Quaternions(b)).qs,
                               (RefQ(a).__div__(RefQ(b))).qs, atol=1e-12)
    np.testing.assert_allclose((-Quaternions(a)).qs, (-RefQ(a)).qs)
    np.testing.assert_allclose(abs(Quaternions(a)).qs, abs(RefQ(a)).qs,
                               atol=1e-12)


@needs_ref
def test_vector_rotation(nprng):
    q = rand_q(nprng)
    v = nprng.standard_normal((16, 3))
    np.testing.assert_allclose(Quaternions(q) * v, RefQ(q) * v, atol=1e-10)


@needs_ref
def test_scalar_multiplication_slerp_scaling(nprng):
    q = rand_q(nprng)
    s = nprng.uniform(0, 1, 16)
    np.testing.assert_allclose((Quaternions(q) * s).qs, (RefQ(q) * s).qs,
                               atol=1e-10)


@needs_ref
def test_log_exp(nprng):
    q = rand_q(nprng)
    np.testing.assert_allclose(Quaternions(q).log(), RefQ(q).log(),
                               atol=1e-12)
    w = nprng.standard_normal((16, 3)) * 0.8
    np.testing.assert_allclose(Quaternions.exp(w).qs, RefQ.exp(w).qs,
                               atol=1e-12)


@needs_ref
@pytest.mark.parametrize("order", ["xyz", "yzx", "zxy", "xzy", "yxz", "zyx"])
def test_euler_all_orders(nprng, order):
    q = rand_q(nprng)
    np.testing.assert_allclose(Quaternions(q).euler(order=order),
                               RefQ(q).euler(order=order), atol=1e-12)


@needs_ref
def test_angle_axis_and_transforms(nprng):
    q = rand_q(nprng)
    a1, x1 = Quaternions(q).angle_axis()
    a2, x2 = RefQ(q).angle_axis()
    np.testing.assert_allclose(a1, a2, atol=1e-10)
    np.testing.assert_allclose(x1, x2, atol=1e-10)
    np.testing.assert_allclose(Quaternions(q).transforms(),
                               RefQ(q).transforms(), atol=1e-12)


@needs_ref
def test_from_transforms_matches_reference(nprng):
    q = rand_q(nprng)
    m = Quaternions(q).transforms()
    np.testing.assert_allclose(Quaternions.from_transforms(m).qs,
                               RefQ.from_transforms(m).qs, atol=1e-10)
    # round trip recovers the rotation (up to sign)
    back = Quaternions.from_transforms(m).qs
    sign = np.sign(np.sum(back * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(back * sign, q, atol=1e-7)


@needs_ref
def test_slerp_between_from_euler(nprng):
    a, b = rand_q(nprng), rand_q(nprng)
    t = nprng.uniform(0, 1, 16)
    np.testing.assert_allclose(
        Quaternions.slerp(Quaternions(a), Quaternions(b), t).qs,
        RefQ.slerp(RefQ(a), RefQ(b), t).qs, atol=1e-10,
    )
    v0 = nprng.standard_normal((16, 3))
    v1 = nprng.standard_normal((16, 3))
    np.testing.assert_allclose(Quaternions.between(v0, v1).qs,
                               RefQ.between(v0, v1).qs, atol=1e-10)
    es = nprng.uniform(-np.pi, np.pi, (16, 3))
    for world in (False, True):
        np.testing.assert_allclose(
            Quaternions.from_euler(es, "zyx", world=world).qs,
            RefQ.from_euler(es, "zyx", world=world).qs, atol=1e-12,
        )


@needs_ref
def test_constrained(nprng):
    q = rand_q(nprng)
    for axis_fn in ("constrained_x", "constrained_y", "constrained_z"):
        np.testing.assert_allclose(
            getattr(Quaternions(q), axis_fn)().qs,
            getattr(RefQ(q), axis_fn)().qs, atol=1e-10,
        )


@needs_ref
def test_interpolate(nprng):
    q = rand_q(nprng, (8,))
    # reference's interpolate calls `.log` as a property-less method ref
    # :234-235 (np.average(abs(self).log, ...)) — which is a BUG upstream
    # (passes the bound method); only compare against the corrected math
    ws = nprng.uniform(0.1, 1.0, 8)
    got = Quaternions(q).interpolate(ws)
    want = Quaternions.exp(np.average(abs(RefQ(q)).log(), axis=0, weights=ws))
    np.testing.assert_allclose(got.qs, want.qs, atol=1e-10)


@needs_ref
def test_average(nprng):
    # upstream average() imports numpy.core.umath_tests (dead in modern
    # numpy); validate ours against the eigen decomposition it encodes
    base = rand_q(nprng, (1,))[0]
    jitter = Quaternions.exp(nprng.standard_normal((32, 3)) * 0.05)
    cluster = (Quaternions(np.tile(base, (32, 1))) * jitter).qs
    avg = Quaternions(cluster).average().qs[0]
    sign = np.sign(np.sum(avg * base))
    np.testing.assert_allclose(avg * sign, base, atol=0.05)


def test_id_helpers():
    q = Quaternions.id(5)
    assert q.qs.shape == (5, 4)
    np.testing.assert_array_equal(q.reals, np.ones(5))
    q2 = Quaternions.id((2, 3))
    assert q2.qs.shape == (2, 3, 4)
    like = Quaternions.id_like(Quaternions.id(4))
    assert like.qs.shape == (4, 4)


def test_reshape_actually_reshapes():
    # upstream reshape is a no-op bug (utils/Quaternions.py:230-232); ours
    # really reshapes — divergence documented in the class docstring
    q = Quaternions.id((2, 3))
    q.reshape((6,))
    assert q.qs.shape == (6, 4)
