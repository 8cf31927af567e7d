"""Quaternion and rotation-representation math, TPU-first.

All functions are pure ``jax.numpy`` programs: no in-place mutation, static
shapes, arbitrary leading batch dimensions, and everything is `vmap`/`jit`
compatible so the feature codec and FK stack compile into single XLA programs.

Quaternions use the Hamilton convention with the real part first:
``q = [w, x, y, z]``.

Behavioral parity targets (semantics only, reimplemented from scratch):
  reference mld/data/humanml/common/quaternion.py:16-341
  (qinv, qmul, qrot, qnormalize, qfix, qbetween, quaternion_to_matrix,
   quaternion_to_cont6d, cont6d_to_matrix)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "qinv",
    "qnormalize",
    "qmul",
    "qrot",
    "qfix_np",
    "qbetween",
    "quaternion_to_matrix",
    "quaternion_to_cont6d",
    "cont6d_to_matrix",
    "matrix_to_cont6d",
]


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (= conjugate). q: (..., 4), w-first."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) to unit length."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*r. Both (..., 4), w-first; broadcasting supported."""
    qw, qx, qy, qz = jnp.split(q, 4, axis=-1)
    rw, rx, ry, rz = jnp.split(r, 4, axis=-1)
    w = qw * rw - qx * rx - qy * ry - qz * rz
    x = qw * rx + qx * rw + qy * rz - qz * ry
    y = qw * ry - qx * rz + qy * rw + qz * rx
    z = qw * rz + qx * ry - qy * rx + qz * rw
    return jnp.concatenate([w, x, y, z], axis=-1)


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4).

    Uses the two-cross-product identity: v + 2*(w*(u x v) + u x (u x v))
    with u = imaginary part of q. Shapes broadcast against each other.
    """
    qw = q[..., :1]
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (qw * uv + uuv)


def qfix_np(q: np.ndarray) -> np.ndarray:
    """Enforce sign continuity of a quaternion time series (host/numpy).

    q: (T, J, 4). Flips the sign of q[t] whenever the dot product with the
    previous (already fixed) frame is negative. Sequential by nature; used
    only in host-side data preprocessing.
    """
    assert q.shape[-1] == 4
    result = q.copy()
    dot_products = np.sum(q[1:] * q[:-1], axis=-1)
    mask = dot_products < 0
    mask = (np.cumsum(mask, axis=0) % 2).astype(bool)
    result[1:][mask] *= -1
    return result


def qbetween(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating direction v0 onto v1. Inputs (..., 3) need not be unit."""
    v = jnp.cross(v0, v1)
    n0 = jnp.sqrt(jnp.sum(v0 * v0, axis=-1, keepdims=True))
    n1 = jnp.sqrt(jnp.sum(v1 * v1, axis=-1, keepdims=True))
    w = n0 * n1 + jnp.sum(v0 * v1, axis=-1, keepdims=True)
    q = jnp.concatenate([w, v], axis=-1)
    return qnormalize(q)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (..., 4) -> rotation matrix(es) (..., 3, 3)."""
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def quaternion_to_cont6d(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) -> continuous 6D rotation (first two matrix columns).

    Matches the column layout of the reference codec
    (mld/data/humanml/common/quaternion.py:308-318): the 6D vector is
    ``concat(R[..., 0], R[..., 1])`` i.e. the first two *columns* of R.
    """
    rot = quaternion_to_matrix(q)
    return jnp.concatenate([rot[..., 0], rot[..., 1]], axis=-1)


def cont6d_to_matrix(c: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D rotation (..., 6) -> rotation matrix (..., 3, 3).

    Gram-Schmidt on the two encoded columns; the result has x/y/z as
    *columns* (matching quaternion.py:320-336 in the reference codec).
    """
    x_raw = c[..., 0:3]
    y_raw = c[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_cont6d(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> continuous 6D (first two columns)."""
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)
