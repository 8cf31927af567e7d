"""Kinematic-chain forward / inverse kinematics.

FK is a pure JAX function (jit/vmap-friendly; the chain walk is unrolled at
trace time over the static skeleton topology, each step a batched qrot/matmul).
IK runs on host numpy — it is only used in offline data preprocessing.

Behavioral parity target: reference mld/data/humanml/common/skeleton.py:4-196.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter1d

from mld_tpu.ops.quaternion import (
    cont6d_to_matrix,
    qbetween,
    qinv,
    qmul,
    qrot,
)
from .param_util import parents_from_chains


class Skeleton:
    """Skeleton with unit offset directions and kinematic chains.

    offsets_raw: (J, 3) unit direction of each joint relative to its parent.
    chains: list of joint-index chains, root-first.
    """

    def __init__(self, offsets_raw: np.ndarray, chains):
        self.offsets_raw = np.asarray(offsets_raw, dtype=np.float32)
        self.chains = chains
        self.num_joints = len(self.offsets_raw)
        self.parents = parents_from_chains(self.num_joints, chains)
        self._offsets = None  # scaled offsets (J, 3)

    # ---------------------------------------------------------------- offsets
    def set_offsets(self, offsets: np.ndarray):
        self._offsets = np.asarray(offsets, dtype=np.float32)

    def offsets_from_joints(self, joints: np.ndarray) -> np.ndarray:
        """Scale unit offsets by bone lengths measured from one pose (J, 3)."""
        offsets = self.offsets_raw.copy()
        for i in range(1, self.num_joints):
            bone = np.linalg.norm(joints[i] - joints[self.parents[i]])
            offsets[i] = bone * offsets[i]
        self._offsets = offsets
        return offsets

    @property
    def offsets(self) -> np.ndarray:
        assert self._offsets is not None, "call set_offsets/offsets_from_joints first"
        return self._offsets

    # --------------------------------------------------------------------- FK
    def forward_kinematics(self, quat_params: jnp.ndarray, root_pos: jnp.ndarray,
                           do_root_rot: bool = True) -> jnp.ndarray:
        """FK from per-joint local quaternions. JAX, batched over axis 0.

        quat_params: (B, J, 4), root_pos: (B, 3) -> joints (B, J, 3).
        """
        offsets = jnp.asarray(self.offsets)
        B = quat_params.shape[0]
        joints = jnp.zeros(quat_params.shape[:-1] + (3,), quat_params.dtype)
        joints = joints.at[:, 0].set(root_pos)
        for chain in self.chains:
            if do_root_rot:
                rot = quat_params[:, 0]
            else:
                rot = jnp.broadcast_to(
                    jnp.asarray([1.0, 0.0, 0.0, 0.0], quat_params.dtype), (B, 4))
            for i in range(1, len(chain)):
                rot = qmul(rot, quat_params[:, chain[i]])
                offset_vec = jnp.broadcast_to(offsets[chain[i]], (B, 3))
                joints = joints.at[:, chain[i]].set(
                    qrot(rot, offset_vec) + joints[:, chain[i - 1]])
        return joints

    def forward_kinematics_cont6d(self, cont6d_params: jnp.ndarray,
                                  root_pos: jnp.ndarray,
                                  do_root_rot: bool = True) -> jnp.ndarray:
        """FK from per-joint continuous-6D rotations. JAX, batched over axis 0.

        cont6d_params: (B, J, 6), root_pos: (B, 3) -> joints (B, J, 3).
        """
        offsets = jnp.asarray(self.offsets)
        B = cont6d_params.shape[0]
        joints = jnp.zeros(cont6d_params.shape[:-1] + (3,), cont6d_params.dtype)
        joints = joints.at[:, 0].set(root_pos)
        for chain in self.chains:
            if do_root_rot:
                mat = cont6d_to_matrix(cont6d_params[:, 0])
            else:
                mat = jnp.broadcast_to(jnp.eye(3, dtype=cont6d_params.dtype),
                                       (B, 3, 3))
            for i in range(1, len(chain)):
                mat = jnp.matmul(mat, cont6d_to_matrix(cont6d_params[:, chain[i]]))
                offset_vec = offsets[chain[i]]
                joints = joints.at[:, chain[i]].set(
                    jnp.einsum("bij,j->bi", mat, offset_vec)
                    + joints[:, chain[i - 1]])
        return joints

    # --------------------------------------------------------------------- IK
    def inverse_kinematics_np(self, joints: np.ndarray, face_joint_idx,
                              smooth_forward: bool = False) -> np.ndarray:
        """Per-frame local quaternions from joint positions (host numpy).

        joints: (T, J, 3) -> quat_params (T, J, 4). Root quaternion faces the
        body toward Z+ (derived from hip/shoulder cross axes); children are
        recovered by aligning the unit offset direction with the observed bone.
        """
        l_hip, r_hip, sdr_r, sdr_l = face_joint_idx
        across = (joints[:, r_hip] - joints[:, l_hip]) + (
            joints[:, sdr_r] - joints[:, sdr_l])
        across = across / np.linalg.norm(across, axis=-1, keepdims=True)

        forward = np.cross(np.array([[0.0, 1.0, 0.0]]), across, axis=-1)
        if smooth_forward:
            forward = gaussian_filter1d(forward, 20, axis=0, mode="nearest")
        forward = forward / np.linalg.norm(forward, axis=-1, keepdims=True)

        target = np.broadcast_to(np.array([0.0, 0.0, 1.0]), forward.shape)
        root_quat = np.array(qbetween(forward, target))
        root_quat[0] = np.array([1.0, 0.0, 0.0, 0.0])

        quat_params = np.zeros(joints.shape[:-1] + (4,))
        quat_params[:, 0] = root_quat
        T = len(joints)
        for chain in self.chains:
            rot = root_quat
            for j in range(len(chain) - 1):
                u = np.broadcast_to(self.offsets_raw[chain[j + 1]], (T, 3))
                v = joints[:, chain[j + 1]] - joints[:, chain[j]]
                v = v / np.linalg.norm(v, axis=-1, keepdims=True)
                rot_u_v = np.asarray(qbetween(u, v))
                rot_loc = np.asarray(qmul(qinv(rot), rot_u_v))
                quat_params[:, chain[j + 1]] = rot_loc
                rot = np.asarray(qmul(rot, rot_loc))
        return quat_params
