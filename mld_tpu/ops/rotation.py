"""Rotation representation conversions (jnp, batched).

Parity target: the vendored pytorch3d conversions the reference duplicates
at mld/utils/rotation_conversions.py and mld/data/a2m/utils/
rotation_conversions.py (551 LoC each): axis-angle / quaternion / matrix /
rotation-6d. Convention: quaternions w-first; rotation_6d here is the
pytorch3d flavor (first two ROWS of R, flattened) — distinct from the
HumanML3D codec's column-based cont6d in ops/quaternion.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from .quaternion import quaternion_to_matrix


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) rotation vectors -> (..., 4) unit quaternions."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = angles < eps
    # sin(x/2)/x -> 0.5 - x^2/48 for small x
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles ** 2) / 48.0, jnp.sin(half) / jnp.where(
            small, 1.0, angles))
    return jnp.concatenate(
        [jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    # grad-safe norm: d|x|/dx at x=0 is 0/0 = NaN, which poisons any
    # optimization through an identity rotation (e.g. SMPL fitting init)
    sumsq = jnp.sum(q[..., 1:] ** 2, axis=-1, keepdims=True)
    norms = jnp.sqrt(sumsq + 1e-24)
    half = jnp.arctan2(norms, q[..., :1])
    angles = 2 * half
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles ** 2) / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, angles))
    return q[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): first two rows flattened (pytorch3d)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt on the two encoded rows."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.linalg.norm(a2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) w-first (numerically-stable branch select)."""
    m = matrix
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    trace = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = safe_sqrt(1 + trace) / 2
    qx = safe_sqrt(1 + m00 - m11 - m22) / 2
    qy = safe_sqrt(1 - m00 + m11 - m22) / 2
    qz = safe_sqrt(1 - m00 - m11 + m22) / 2

    # four candidate constructions; pick the one with the largest pivot
    c0 = jnp.stack([qw,
                    (m[..., 2, 1] - m[..., 1, 2]) / (4 * qw),
                    (m[..., 0, 2] - m[..., 2, 0]) / (4 * qw),
                    (m[..., 1, 0] - m[..., 0, 1]) / (4 * qw)], -1)
    c1 = jnp.stack([(m[..., 2, 1] - m[..., 1, 2]) / (4 * qx),
                    qx,
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * qx),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * qx)], -1)
    c2 = jnp.stack([(m[..., 0, 2] - m[..., 2, 0]) / (4 * qy),
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * qy),
                    qy,
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * qy)], -1)
    c3 = jnp.stack([(m[..., 1, 0] - m[..., 0, 1]) / (4 * qz),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * qz),
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * qz),
                    qz], -1)
    pivots = jnp.stack([qw, qx, qy, qz], -1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    # canonical: non-negative w
    return q * jnp.sign(q[..., :1] + 1e-12)


def axis_angle_to_rotation_6d(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(d6: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(
        rotation_6d_to_matrix(d6)))
