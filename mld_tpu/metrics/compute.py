"""Temos APE/AVE metrics (mld/models/metrics/compute.py:15-196 parity)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mld_tpu.transforms.rifke import Rifke, matrix_of_angles


def _variance(x: np.ndarray, length: int, axis=0) -> np.ndarray:
    """Unbiased-by-length variance (metrics/utils variance semantics)."""
    mean = x.mean(axis)
    out = (x - mean) ** 2
    return out.sum(axis) / (length - 1)


class ComputeMetrics:
    """APE/AVE on root/trajectory/pose/joints in the Rifke canonical frame."""

    def __init__(self, njoints: int = 22, jointstype: str = "humanml3d",
                 force_in_meter: bool = True):
        self.njoints = njoints
        self.jointstype = jointstype
        self.force_in_meter = force_in_meter
        self.rifke = Rifke(jointstype=jointstype)
        self.reset()

    def reset(self):
        self.count = 0
        self.count_seq = 0
        self.APE_root = 0.0
        self.APE_traj = 0.0
        self.APE_pose = np.zeros(self.njoints - 1)
        self.APE_joints = np.zeros(self.njoints)
        self.AVE_root = 0.0
        self.AVE_traj = 0.0
        self.AVE_pose = np.zeros(self.njoints - 1)
        self.AVE_joints = np.zeros(self.njoints)

    def _transform(self, joints: np.ndarray):
        """[B, T, J, 3] -> (poses, poses_local, root, trajectory), numpy."""
        feats = self.rifke(jnp.asarray(joints, jnp.float32))
        root_y, poses_features, vel_angles, vel_traj_local = Rifke.extract(
            feats)
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
        root = jnp.concatenate(
            [trajectory[..., :, :1], root_y[..., None],
             trajectory[..., :, 1:2]], axis=-1)
        poses = jnp.concatenate([0 * poses[..., :1, :], poses], axis=-2)
        poses = poses.at[..., 0, 1].set(root_y)
        poses = poses.at[..., [0, 2]].add(trajectory[..., None, :])

        if self.force_in_meter:
            factor = (1000.0 if self.jointstype == "mmm"
                      else 1000.0 * 0.75 / 480.0)
            poses, poses_local, root, trajectory = (
                poses / factor, poses_local / factor, root / factor,
                trajectory / factor)
        return (np.asarray(poses), np.asarray(poses_local), np.asarray(root),
                np.asarray(trajectory))

    def update(self, jts_text, jts_ref, lengths):
        lengths = [int(x) for x in np.asarray(lengths)]
        self.count += sum(lengths)
        self.count_seq += len(lengths)
        pt, plt_, rt, tt = self._transform(np.asarray(jts_text))
        pr, plr, rr, tr = self._transform(np.asarray(jts_ref))

        l2 = lambda a, b, axis: np.linalg.norm(a - b, axis=axis)
        for i, L in enumerate(lengths):
            self.APE_root += l2(rt[i, :L], rr[i, :L], 1).sum()
            self.APE_pose += l2(plt_[i, :L], plr[i, :L], 2).sum(0)
            self.APE_traj += l2(tt[i, :L], tr[i, :L], 1).sum()
            self.APE_joints += l2(pt[i, :L], pr[i, :L], 2).sum(0)

            self.AVE_root += l2(_variance(rt[i, :L], L),
                                _variance(rr[i, :L], L), 0)
            self.AVE_traj += l2(_variance(tt[i, :L], L),
                                _variance(tr[i, :L], L), 0)
            self.AVE_pose += l2(_variance(plt_[i, :L], L),
                                _variance(plr[i, :L], L), 1)
            self.AVE_joints += l2(_variance(pt[i, :L], L),
                                  _variance(pr[i, :L], L), 1)

    def compute(self) -> dict:
        count, count_seq = max(self.count, 1), max(self.count_seq, 1)
        out = {
            "APE_root": self.APE_root / count,
            "APE_traj": self.APE_traj / count,
            "APE_mean_pose": self.APE_pose.mean() / count,
            "APE_mean_joints": self.APE_joints.mean() / count,
            "AVE_root": self.AVE_root / count_seq,
            "AVE_traj": self.AVE_traj / count_seq,
            "AVE_mean_pose": self.AVE_pose.mean() / count_seq,
            "AVE_mean_joints": self.AVE_joints.mean() / count_seq,
        }
        return {k: float(v) for k, v in out.items()}
