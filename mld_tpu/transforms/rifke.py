"""Rifke: rotation-invariant forward-kinematics features (jnp).

Parity target: mld/transforms/joints2jfeats/rifke.py:11-142 +
joints2jfeats/tools.py (get_forward_direction, get_floor softmin). Used by
the Temos APE/AVE metrics (metrics/compute.py:30).
"""
from __future__ import annotations

import jax.numpy as jnp

HUMANML3D_JOINTS = [
    "root", "RH", "LH", "BP", "RK", "LK", "BT", "RMrot", "LMrot", "BLN",
    "RF", "LF", "BMN", "RSI", "LSI", "BUN", "RS", "LS", "RE", "LE", "RW",
    "LW",
]

MMM_JOINTS = [
    "root", "BP", "BT", "BLN", "BUN", "LS", "LE", "LW", "RS", "RE", "RW",
    "LH", "LK", "LA", "LMrot", "LF", "RH", "RK", "RA", "RMrot", "RF",
]

_JOINT_NAMES = {"humanml3d": HUMANML3D_JOINTS, "mmm": MMM_JOINTS,
                "mmmns": MMM_JOINTS}


def matrix_of_angles(cos, sin, inv=False):
    """2x2 rotation matrices from cos/sin stacks (geometry.py:22-28)."""
    sin = -sin if inv else sin
    row1 = jnp.stack([cos, -sin], axis=-1)
    row2 = jnp.stack([sin, cos], axis=-1)
    return jnp.stack([row1, row2], axis=-2)


def _softmin(x, softness=0.5, axis=-1):
    maxi = jnp.max(-x, axis=axis)
    mini = jnp.min(-x, axis=axis)
    return -(maxi + jnp.log(softness + jnp.exp(mini - maxi)))


def get_floor(poses, jointstype="humanml3d"):
    names = _JOINT_NAMES[jointstype]
    idx = [names.index(n) for n in ("LMrot", "LF", "RMrot", "RF")]
    foot_heights = jnp.min(poses[..., idx, 1], axis=-1)
    return _softmin(foot_heights, softness=0.5, axis=-1)


def get_forward_direction(poses, jointstype="humanml3d"):
    names = _JOINT_NAMES[jointstype]
    LS, RS = names.index("LS"), names.index("RS")
    LH, RH = names.index("LH"), names.index("RH")
    across = (poses[..., RH, :] - poses[..., LH, :]
              + poses[..., RS, :] - poses[..., LS, :])
    forward = jnp.stack([-across[..., 2], across[..., 0]], axis=-1)
    return forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)


class Rifke:
    """joints [..., T, J, 3] <-> features [..., T, 1 + (J-1)*3 + 1 + 2]."""

    def __init__(self, jointstype: str = "humanml3d"):
        self.jointstype = jointstype

    def __call__(self, joints):
        poses = joints
        floor = get_floor(poses, self.jointstype)  # [..., ] scalar over time
        poses = poses.at[..., 1].add(-floor[..., None, None])

        translation = poses[..., 0, :]
        root_y = translation[..., 1]
        trajectory = translation[..., [0, 2]]
        poses = poses[..., 1:, :]
        poses = poses.at[..., [0, 2]].add(-trajectory[..., None, :])

        vel_trajectory = jnp.diff(trajectory, axis=-2)
        vel_trajectory = jnp.concatenate(
            [0 * vel_trajectory[..., :1, :], vel_trajectory], axis=-2)

        forward = get_forward_direction(poses, self.jointstype)
        angles = jnp.arctan2(forward[..., 0], forward[..., 1])
        vel_angles = jnp.diff(angles, axis=-1)
        vel_angles = jnp.concatenate([0 * vel_angles[..., :1], vel_angles],
                                     axis=-1)

        sin, cos = forward[..., 0], forward[..., 1]
        rot_inv = matrix_of_angles(cos, sin, inv=True)

        poses_local = jnp.einsum("...lj,...jk->...lk", poses[..., [0, 2]],
                                 rot_inv)
        poses_local = jnp.stack(
            [poses_local[..., 0], poses[..., 1], poses_local[..., 1]],
            axis=-1)
        poses_features = poses_local.reshape(poses_local.shape[:-2] + (-1,))

        vel_traj_local = jnp.einsum("...j,...jk->...k", vel_trajectory,
                                    rot_inv)
        return jnp.concatenate(
            [root_y[..., None], poses_features, vel_angles[..., None],
             vel_traj_local], axis=-1)

    @staticmethod
    def extract(features):
        root_y = features[..., 0]
        poses_features = features[..., 1:-3]
        vel_angles = features[..., -3]
        vel_trajectory_local = features[..., -2:]
        return root_y, poses_features, vel_angles, vel_trajectory_local

    def inverse(self, features):
        root_y, poses_features, vel_angles, vel_traj_local = self.extract(
            features)
        angles = jnp.cumsum(vel_angles, axis=-1)
        angles = angles - angles[..., :1]
        rotations = matrix_of_angles(jnp.cos(angles), jnp.sin(angles))

        poses_local = poses_features.reshape(
            poses_features.shape[:-1] + (-1, 3))
        poses = jnp.einsum("...lj,...jk->...lk", poses_local[..., [0, 2]],
                           rotations)
        poses = jnp.stack([poses[..., 0], poses_local[..., 1],
                           poses[..., 1]], axis=-1)

        vel_traj = jnp.einsum("...j,...jk->...k", vel_traj_local, rotations)
        trajectory = jnp.cumsum(vel_traj, axis=-2)
        trajectory = trajectory - trajectory[..., :1, :]

        poses = jnp.concatenate([0 * poses[..., :1, :], poses], axis=-2)
        poses = poses.at[..., 0, 1].set(root_y)
        poses = poses.at[..., [0, 2]].add(trajectory[..., None, :])
        return poses
