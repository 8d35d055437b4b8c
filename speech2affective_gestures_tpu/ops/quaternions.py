"""Quaternion algebra in jnp (w, x, y, z convention).

Capability parity with reference `utils/Quaternions_torch.py` (qmul, qrot,
qeuler for all six Euler orders, expmap<->quaternion, qfix continuity,
euler_to_quaternion).  All functions are shape-polymorphic over leading
dimensions, jit/vmap-friendly, and free of data-dependent control flow.
Needed by the BVH/GENEA pipeline and the quaternion angle loss.
"""

from __future__ import annotations

import jax.numpy as jnp


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*r for (..., 4) quaternions."""
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    rw, rx, ry, rz = jnp.moveaxis(r, -1, 0)
    return jnp.stack(
        (
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ),
        axis=-1,
    )


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of unit quaternions (conjugate)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qeuler(q: jnp.ndarray, order: str, epsilon: float = 0.0) -> jnp.ndarray:
    """Quaternion -> Euler angles, matching the six conventions of the
    reference (utils/Quaternions_torch.py:56-100)."""
    q0, q1, q2, q3 = jnp.moveaxis(q, -1, 0)

    def asin(x):
        return jnp.arcsin(jnp.clip(x, -1.0 + epsilon, 1.0 - epsilon))

    if order == "xyz":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = asin(2 * (q1 * q3 + q0 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == "yzx":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = asin(2 * (q1 * q2 + q0 * q3))
    elif order == "zxy":
        x = asin(2 * (q0 * q1 + q2 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "xzy":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 + q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = asin(2 * (q0 * q3 - q1 * q2))
    elif order == "yxz":
        x = asin(2 * (q0 * q1 - q2 * q3))
        y = jnp.arctan2(2 * (q1 * q3 + q0 * q2), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q1 * q2 + q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "zyx":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = asin(2 * (q0 * q2 - q1 * q3))
        z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    else:
        raise ValueError("order must be one of xyz, yzx, zxy, xzy, yxz, zyx")
    return jnp.stack((x, y, z), axis=-1)


def expmap_to_quaternion(e: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> quaternion (..., 4); sinc-stable near zero."""
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate((w, xyz), axis=-1)


def qfix(q: jnp.ndarray, time_axis: int = 0) -> jnp.ndarray:
    """Enforce sign continuity along `time_axis` by flipping frames whose dot
    product with the previous frame is negative (cumulative parity trick,
    ref utils/Quaternions_torch.py:144-187) — no sequential loop needed.
    """
    q = jnp.moveaxis(q, time_axis, 0)
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flips = jnp.cumsum((dots < 0).astype(jnp.int32), axis=0) % 2
    # first frame keeps its sign; subsequent frames flip by cumulative parity
    sign = jnp.concatenate([jnp.ones((1,) + flips.shape[1:], q.dtype),
                            1.0 - 2.0 * flips.astype(q.dtype)], axis=0)
    return jnp.moveaxis(q * sign[..., None], 0, time_axis)


def euler_to_quaternion(e: jnp.ndarray, order: str) -> jnp.ndarray:
    """Euler angles (..., 3) -> quaternion, composing per-axis rotations in
    `order`; flips sign for right-handed orders to keep w >= 0 at identity
    (ref utils/Quaternions_torch.py:209-247)."""
    x, y, z = jnp.moveaxis(e, -1, 0)
    zeros = jnp.zeros_like(x)
    rx = jnp.stack((jnp.cos(x / 2), jnp.sin(x / 2), zeros, zeros), axis=-1)
    ry = jnp.stack((jnp.cos(y / 2), zeros, jnp.sin(y / 2), zeros), axis=-1)
    rz = jnp.stack((jnp.cos(z / 2), zeros, zeros, jnp.sin(z / 2)), axis=-1)
    rot = {"x": rx, "y": ry, "z": rz}
    result = rot[order[0]]
    for axis in order[1:]:
        result = qmul(result, rot[axis])
    if order in ("xyz", "yzx", "zxy"):
        result = -result
    return result
