"""HumanML3D 263-dim motion feature codec.

Feature layout (nfeats = 4 + (J-1)*3 + (J-1)*6 + J*3 + 4; 263 for J=22):
  [root_rot_vel(1), root_lin_vel_xz(2), root_y(1),
   ric(J-1 x 3), rot6d(J-1 x 6), local_vel(J x 3), foot_contact(4)]

The decode direction (features -> joints) is the inference hot path and is a
single fused jnp program built on cumulative sums — `recover_from_ric` maps
onto XLA as two cumsums plus batched quaternion rotations, no sequential loop.
The encode direction (`process_file`) is offline host preprocessing (numpy).

Behavioral parity target:
  reference mld/data/humanml/scripts/motion_process.py:169-430
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mld_tpu.ops.quaternion import (
    qfix_np,
    qinv,
    qmul,
    qrot,
    quaternion_to_cont6d,
)
from .param_util import (
    T2M_FACE_JOINT_IDX,
    T2M_FID_L,
    T2M_FID_R,
    T2M_KINEMATIC_CHAIN,
    T2M_LOWER_LEG_IDX,
    T2M_RAW_OFFSETS,
)
from .skeleton import Skeleton

__all__ = [
    "recover_root_rot_pos",
    "recover_from_ric",
    "recover_from_rot",
    "process_file",
    "uniform_skeleton",
    "nfeats_for_joints",
]


def nfeats_for_joints(joints_num: int) -> int:
    return 4 + (joints_num - 1) * 3 + (joints_num - 1) * 6 + joints_num * 3 + 4


# --------------------------------------------------------------------- decode
def recover_root_rot_pos(data: jnp.ndarray):
    """Integrate root yaw + planar velocity into global root rotation/position.

    data: (..., T, nfeats). Returns (r_rot_quat (..., T, 4), r_pos (..., T, 3)).
    """
    rot_vel = data[..., 0]
    # yaw angle at frame t = sum of rot_vel over frames < t
    zeros = jnp.zeros_like(rot_vel[..., :1])
    r_rot_ang = jnp.cumsum(jnp.concatenate([zeros, rot_vel[..., :-1]], -1), -1)

    cos, sin = jnp.cos(r_rot_ang), jnp.sin(r_rot_ang)
    zero = jnp.zeros_like(cos)
    r_rot_quat = jnp.stack([cos, zero, sin, zero], axis=-1)

    # planar displacement of frame t comes from velocity stored at frame t-1
    vel_xz = data[..., :-1, 1:3]
    pad = jnp.zeros(data.shape[:-2] + (1, 2), data.dtype)
    vel_xz = jnp.concatenate([pad, vel_xz], axis=-2)  # (..., T, 2)
    zeros_y = jnp.zeros(vel_xz.shape[:-1] + (1,), data.dtype)
    step = jnp.concatenate(
        [vel_xz[..., 0:1], zeros_y, vel_xz[..., 1:2]], axis=-1)
    # rotate per-frame step into the world frame, then integrate
    step = qrot(qinv(r_rot_quat), step)
    r_pos = jnp.cumsum(step, axis=-2)
    # root height comes straight from the features; build by concat rather
    # than .at[].set — scatters lower poorly on TPU (serving hot path)
    r_pos = jnp.concatenate(
        [r_pos[..., 0:1], data[..., 3:4], r_pos[..., 2:3]], axis=-1)
    return r_rot_quat, r_pos


def recover_from_ric(data: jnp.ndarray, joints_num: int) -> jnp.ndarray:
    """Rotation-invariant local positions + root track -> global joints.

    data: (..., T, nfeats) -> joints (..., T, J, 3).
    """
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4:(joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))

    positions = qrot(qinv(r_rot_quat)[..., None, :], positions)
    # add the planar root track (y untouched) without scatters: broadcast a
    # [..., 1, 3] offset with a zero y channel
    zeros_y = jnp.zeros_like(r_pos[..., 1:2])
    offset = jnp.concatenate(
        [r_pos[..., 0:1], zeros_y, r_pos[..., 2:3]], axis=-1)
    positions = positions + offset[..., None, :]
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_from_rot(data: jnp.ndarray, joints_num: int,
                     skeleton: Skeleton) -> jnp.ndarray:
    """Rot6d channels + root track -> global joints via FK.

    data: (T, nfeats) (single sequence) -> joints (T, J, 3).
    """
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d = jnp.concatenate([r_rot_cont6d, data[..., start:end]], axis=-1)
    cont6d = cont6d.reshape(-1, joints_num, 6)
    return skeleton.forward_kinematics_cont6d(cont6d, r_pos.reshape(-1, 3))


# --------------------------------------------------------------------- encode
def uniform_skeleton(positions: np.ndarray, tgt_offsets: np.ndarray,
                     raw_offsets=T2M_RAW_OFFSETS,
                     chains=T2M_KINEMATIC_CHAIN,
                     l_idx=T2M_LOWER_LEG_IDX,
                     face_joint_idx=T2M_FACE_JOINT_IDX) -> np.ndarray:
    """Retarget a joint sequence onto the canonical skeleton (leg-length scale + IK/FK)."""
    src = Skeleton(raw_offsets, chains)
    src_offset = src.offsets_from_joints(positions[0])
    l1, l2 = l_idx
    src_leg = np.abs(src_offset[l1]).max() + np.abs(src_offset[l2]).max()
    tgt_leg = np.abs(tgt_offsets[l1]).max() + np.abs(tgt_offsets[l2]).max()
    scale = tgt_leg / src_leg

    tgt_root_pos = positions[:, 0] * scale
    quat_params = src.inverse_kinematics_np(positions, face_joint_idx)
    src.set_offsets(tgt_offsets)
    return np.asarray(
        src.forward_kinematics(jnp.asarray(quat_params, jnp.float32),
                               jnp.asarray(tgt_root_pos, jnp.float32)))


def _foot_detect(positions, thres, fid_l, fid_r):
    velfactor = np.array([thres, thres])
    d_l = np.sum((positions[1:, fid_l] - positions[:-1, fid_l]) ** 2, axis=-1)
    d_r = np.sum((positions[1:, fid_r] - positions[:-1, fid_r]) ** 2, axis=-1)
    feet_l = (d_l < velfactor).astype(np.float64)
    feet_r = (d_r < velfactor).astype(np.float64)
    return feet_l, feet_r


def process_file(positions: np.ndarray, feet_thre: float,
                 tgt_offsets: np.ndarray | None = None,
                 raw_offsets=T2M_RAW_OFFSETS,
                 chains=T2M_KINEMATIC_CHAIN,
                 l_idx=T2M_LOWER_LEG_IDX,
                 fid_r=T2M_FID_R, fid_l=T2M_FID_L,
                 face_joint_idx=T2M_FACE_JOINT_IDX,
                 do_uniform_skeleton: bool = True):
    """Joints (T, J, 3) -> (features (T-1, nfeats), global_positions, rifke_positions, l_velocity).

    Pipeline: optional retarget -> floor/origin/Z+ canonicalization -> foot
    contacts -> IK (smoothed forward) -> cont6d params -> RIFKE local
    positions -> root/joint velocities -> concat.
    """
    positions = np.asarray(positions, dtype=np.float64).copy()

    if do_uniform_skeleton and tgt_offsets is not None:
        positions = np.asarray(
            uniform_skeleton(positions, np.asarray(tgt_offsets), raw_offsets,
                             chains, l_idx, face_joint_idx),
            dtype=np.float64)

    # put on floor
    positions[:, :, 1] -= positions.min(axis=0).min(axis=0)[1]

    # root XZ at origin (first frame)
    root_pos_init = positions[0]
    positions = positions - root_pos_init[0] * np.array([1.0, 0.0, 1.0])
    root_pos_init = positions[0]

    # rotate so the initial pose faces Z+
    r_hip, l_hip, sdr_r, sdr_l = face_joint_idx
    across = (root_pos_init[r_hip] - root_pos_init[l_hip]) + (
        root_pos_init[sdr_r] - root_pos_init[sdr_l])
    across = across / np.linalg.norm(across)
    forward_init = np.cross(np.array([[0.0, 1.0, 0.0]]), across, axis=-1)
    forward_init = forward_init / np.linalg.norm(forward_init, axis=-1,
                                                 keepdims=True)
    from mld_tpu.ops.quaternion import qbetween  # local import to avoid cycle
    root_quat_init = np.asarray(
        qbetween(forward_init, np.array([[0.0, 0.0, 1.0]])))
    root_quat_init = np.broadcast_to(root_quat_init,
                                     positions.shape[:-1] + (4,))
    positions = np.asarray(qrot(jnp.asarray(root_quat_init, jnp.float32),
                                jnp.asarray(positions, jnp.float32)),
                           dtype=np.float64)

    global_positions = positions.copy()
    feet_l, feet_r = _foot_detect(positions, feet_thre, fid_l, fid_r)

    # cont6d via smoothed IK
    skel = Skeleton(raw_offsets, chains)
    quat_params = skel.inverse_kinematics_np(positions, face_joint_idx,
                                             smooth_forward=True)
    cont_6d_params = np.asarray(
        quaternion_to_cont6d(jnp.asarray(quat_params)))
    r_rot = quat_params[:, 0].copy()

    # root linear velocity in the root frame
    velocity = (positions[1:, 0] - positions[:-1, 0]).copy()
    velocity = np.asarray(qrot(jnp.asarray(r_rot[1:]), jnp.asarray(velocity)))
    # root angular velocity
    r_velocity = np.asarray(
        qmul(jnp.asarray(r_rot[1:]), qinv(jnp.asarray(r_rot[:-1]))))

    # RIFKE local positions: root-centered XZ, then rotate into root frame
    positions[..., 0] -= positions[:, 0:1, 0]
    positions[..., 2] -= positions[:, 0:1, 2]
    positions = np.asarray(
        qrot(jnp.asarray(np.repeat(r_rot[:, None], positions.shape[1], axis=1)),
             jnp.asarray(positions)))

    root_y = positions[:, 0, 1:2]
    r_velocity = np.arcsin(r_velocity[:, 2:3])
    l_velocity = velocity[:, [0, 2]]
    root_data = np.concatenate([r_velocity, l_velocity, root_y[:-1]], axis=-1)

    rot_data = cont_6d_params[:, 1:].reshape(len(cont_6d_params), -1)
    ric_data = positions[:, 1:].reshape(len(positions), -1)

    local_vel = np.asarray(
        qrot(jnp.asarray(np.repeat(r_rot[:-1, None],
                                   global_positions.shape[1], axis=1)),
             jnp.asarray(global_positions[1:] - global_positions[:-1])))
    local_vel = local_vel.reshape(len(local_vel), -1)

    data = np.concatenate(
        [root_data, ric_data[:-1], rot_data[:-1], local_vel, feet_l, feet_r],
        axis=-1)
    return data, global_positions, positions, l_velocity


# quaternion sign-continuity fix is re-exported for preprocessing scripts
qfix = qfix_np
