"""SMPL body model as a pure-JAX LBS layer.

The reference leans on the smplx package (mld/transforms/smpl.py:213+,
Rotation2xyz at mld/transforms/rotation2xyz.py:10-114) for the
action-to-motion joints path. Here LBS is a few einsums — exactly the shape
of compute TPUs are built for — loading the standard SMPL pickle when
available. Without the asset, `SkeletonApprox` provides a
topology-faithful 24-joint FK fallback so a2m pipelines stay runnable.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mld_tpu.ops.rotation import rotation_6d_to_matrix

SMPL_NUM_JOINTS = 24

# SMPL kinematic tree (parent per joint) — public model topology
SMPL_PARENTS = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
                16, 17, 18, 19, 20, 21]

# canonical rest-pose joint offsets (meters, approximate neutral body) used
# by the no-asset fallback; topology matches SMPL_PARENTS
_APPROX_OFFSETS = np.array([
    [0.0, 0.0, 0.0], [0.06, -0.09, -0.01], [-0.06, -0.09, -0.01],
    [0.0, 0.11, -0.01], [0.04, -0.38, 0.0], [-0.04, -0.38, 0.0],
    [0.0, 0.14, 0.0], [-0.01, -0.4, -0.04], [0.01, -0.4, -0.04],
    [0.0, 0.05, 0.02], [0.03, -0.06, 0.12], [-0.03, -0.06, 0.12],
    [0.0, 0.21, -0.03], [0.08, 0.11, -0.02], [-0.08, 0.11, -0.02],
    [0.0, 0.07, 0.03], [0.11, 0.05, -0.02], [-0.11, 0.05, -0.02],
    [0.26, -0.01, -0.02], [-0.26, -0.01, -0.02], [0.25, 0.01, 0.0],
    [-0.25, 0.01, 0.0], [0.09, -0.01, -0.01], [-0.09, -0.01, -0.01],
], dtype=np.float32)


def _fk_from_matrices(rot_mats, joints_rest, parents):
    """Batched FK: rot_mats [B, J, 3, 3], joints_rest [J, 3] -> [B, J, 3]."""
    B = rot_mats.shape[0]
    J = len(parents)
    rel = [joints_rest[0]] + [
        joints_rest[j] - joints_rest[parents[j]] for j in range(1, J)]
    rel = jnp.asarray(np.stack(rel))

    glob_rot = [rot_mats[:, 0]]
    glob_pos = [jnp.broadcast_to(rel[0], (B, 3))]
    for j in range(1, J):
        p = parents[j]
        glob_rot.append(jnp.matmul(glob_rot[p], rot_mats[:, j]))
        glob_pos.append(
            jnp.einsum("bij,j->bi", glob_rot[p], rel[j]) + glob_pos[p])
    return jnp.stack(glob_pos, axis=1), jnp.stack(glob_rot, axis=1)


class SMPLLayer:
    """Minimal SMPL: shape blendshapes + LBS, jax end to end.

    Loads basicModel/SMPL_NEUTRAL.pkl (chumpy-free fields). vertices()
    requires the asset; joints() works with the fallback skeleton too.
    """

    def __init__(self, model_path: Optional[str] = None):
        self.has_asset = False
        self.parents = SMPL_PARENTS
        if model_path and os.path.exists(model_path):
            self._load(model_path)
        else:
            self.joints_rest = _APPROX_OFFSETS_ABS()

    def _load(self, path: str):
        import pickle
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")

        def npy(x):
            try:
                return np.asarray(x.todense(), np.float32)  # sparse
            except AttributeError:
                return np.asarray(x, np.float32)

        self.v_template = jnp.asarray(npy(data["v_template"]))
        self.shapedirs = jnp.asarray(npy(data["shapedirs"]))
        self.J_regressor = jnp.asarray(npy(data["J_regressor"]))
        self.weights = jnp.asarray(npy(data["weights"]))
        self.posedirs = jnp.asarray(npy(data["posedirs"]))
        kt = np.asarray(data["kintree_table"])
        self.parents = [-1] + list(kt[0][1:].astype(int))
        self.joints_rest = self.J_regressor @ self.v_template
        if "f" in data:  # triangle faces for mesh rendering/export
            self.faces = np.asarray(data["f"], np.int64)
        self.has_asset = True

    def joints(self, rot6d: jnp.ndarray,
               translation: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """rot6d [B, 24, 6] (+trans [B, 3]) -> joints [B, 24, 3]."""
        rot_mats = rotation_6d_to_matrix(rot6d)
        pos, _ = _fk_from_matrices(rot_mats, np.asarray(self.joints_rest),
                                   self.parents)
        if translation is not None:
            pos = pos + translation[:, None, :]
        return pos

    def vertices(self, rot6d: jnp.ndarray,
                 translation: Optional[jnp.ndarray] = None,
                 betas: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Full LBS -> [B, 6890, 3]. Requires the SMPL asset."""
        assert self.has_asset, "SMPL asset required for vertices"
        B = rot6d.shape[0]
        v = self.v_template[None]
        if betas is not None:
            v = v + jnp.einsum("bl,vcl->bvc", betas, self.shapedirs)
        joints_rest = jnp.einsum("jv,bvc->bjc",
                                 self.J_regressor, v)

        rot_mats = rotation_6d_to_matrix(rot6d)  # [B, 24, 3, 3]
        ident = jnp.eye(3)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
        v = v + jnp.einsum("bp,vcp->bvc", pose_feature, self.posedirs)

        J = len(self.parents)
        rel = jnp.concatenate(
            [joints_rest[:, :1],
             joints_rest[:, 1:] - joints_rest[:, self.parents[1:]]], axis=1)
        # build global transforms
        glob_rot = [rot_mats[:, 0]]
        glob_pos = [rel[:, 0]]
        for j in range(1, J):
            p = self.parents[j]
            glob_rot.append(jnp.matmul(glob_rot[p], rot_mats[:, j]))
            glob_pos.append(
                jnp.einsum("bij,bj->bi", glob_rot[p], rel[:, j])
                + glob_pos[p])
        R = jnp.stack(glob_rot, 1)                      # [B, J, 3, 3]
        t = jnp.stack(glob_pos, 1)                      # [B, J, 3]
        # remove rest-pose joint locations (standard LBS correction)
        t_corr = t - jnp.einsum("bjik,bjk->bji", R, joints_rest)

        W = self.weights                               # [V, J]
        R_v = jnp.einsum("vj,bjik->bvik", W, R)
        t_v = jnp.einsum("vj,bji->bvi", W, t_corr)
        verts = jnp.einsum("bvik,bvk->bvi", R_v, v) + t_v
        if translation is not None:
            verts = verts + translation[:, None, :]
        return verts


def _APPROX_OFFSETS_ABS() -> np.ndarray:
    """Accumulate the approximate per-bone offsets into rest joints."""
    joints = np.zeros_like(_APPROX_OFFSETS)
    for j in range(1, SMPL_NUM_JOINTS):
        joints[j] = joints[SMPL_PARENTS[j]] + _APPROX_OFFSETS[j]
    return joints


class Rotation2Joints:
    """feats2joints for a2m features (mld.py:119-143 semantics).

    features [B, T, 150] = 24 x rot6d + translation row -> joints
    [B, T, 24, 3]; `vertstrans` adds the root translation track.
    """

    def __init__(self, smpl_path: Optional[str] = None):
        self.smpl = SMPLLayer(smpl_path)

    def __call__(self, feats: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 vertstrans: bool = True) -> jnp.ndarray:
        B, T, D = feats.shape
        x = feats.reshape(B * T, 25, 6)
        rot6d = x[:, :24]
        trans = x[:, 24, :3]
        joints = self.smpl.joints(rot6d,
                                  trans if vertstrans else None)
        joints = joints.reshape(B, T, 24, 3)
        if mask is not None:
            joints = joints * mask[..., None, None]
        return joints
