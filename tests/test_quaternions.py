"""Quaternion ops vs the reference torch implementation (oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu.ops import quaternions as q

from _reference_oracle import reference_quaternions

ref = reference_quaternions()

pytestmark = pytest.mark.skipif(ref is None, reason="reference quats not importable")

ORDERS = ["xyz", "yzx", "zxy", "xzy", "yxz", "zyx"]


def _rand_unit_quats(rng, shape):
    x = rng.standard_normal(shape + (4,)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_qmul(rng):
    a = _rand_unit_quats(rng, (6, 5))
    b = _rand_unit_quats(rng, (6, 5))
    got = np.asarray(q.qmul(jnp.asarray(a), jnp.asarray(b)))
    want = ref.qmul_np(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_qrot(rng):
    quat = _rand_unit_quats(rng, (8,))
    v = rng.standard_normal((8, 3)).astype(np.float32)
    got = np.asarray(q.qrot(jnp.asarray(quat), jnp.asarray(v)))
    want = ref.qrot_np(quat, v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("order", ORDERS)
def test_qeuler(order, rng):
    quat = _rand_unit_quats(rng, (16,))
    got = np.asarray(q.qeuler(jnp.asarray(quat), order))
    want = ref.qeuler_np(quat, order)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_expmap_to_quaternion(rng):
    e = rng.standard_normal((12, 3)).astype(np.float32)
    got = np.asarray(q.expmap_to_quaternion(jnp.asarray(e)))
    want = ref.expmap_to_quaternion_np(e)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_qfix(rng):
    quat = _rand_unit_quats(rng, (20, 4))
    # inject sign flips
    quat[5:9] *= -1
    got = np.asarray(q.qfix(jnp.asarray(quat)))
    import torch

    want = ref.qfix(torch.from_numpy(quat.copy())).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("order", ORDERS)
def test_euler_to_quaternion_roundtrip(order, rng):
    e = (rng.standard_normal((10, 3)) * 0.4).astype(np.float32)
    quat = np.asarray(q.euler_to_quaternion(jnp.asarray(e), order))
    want = ref.euler_to_quaternion(e, order)
    np.testing.assert_allclose(quat, want, rtol=1e-4, atol=1e-5)
