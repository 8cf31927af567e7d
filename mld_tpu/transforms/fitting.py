"""Joints -> SMPL pose fitting, batched and jitted.

Replaces the reference's per-frame LBFGS SMPLify3D loop
(fit.py:104-280 + mld/transforms/joints2rots/smplify.py:47, brute-force
shell-parallelized in scripts/fit_motion_parallel.sh) with ONE vectorized
optimization over all frames simultaneously: parameters are per-frame rot6d
poses + translation (+ shared betas with the SMPL asset), objective is
joint reprojection + temporal smoothness + pose regularization, optimizer
is Adam under jit. Hours of per-frame CPU LBFGS become seconds of batched
TPU matmuls.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mld_tpu.models.smpl import SMPLLayer, SMPL_NUM_JOINTS
from mld_tpu.ops.rotation import matrix_to_rotation_6d

# map HumanML3D 22 joints onto the first 22 SMPL joints (same ordering)
_N_FIT_JOINTS = 22


def _identity_rot6d(B):
    eye = matrix_to_rotation_6d(jnp.eye(3)[None])  # [1, 6]
    return jnp.tile(eye[None], (B, SMPL_NUM_JOINTS, 1))


class GMMPosePrior:
    """Max-mixture Gaussian pose prior (joints2rots/prior.py:52 semantics).

    Loads the reference's gmm_08.pkl (means [K, 69], covars [K, 69, 69],
    weights [K]) over the 23 body joints' axis-angle pose; energy is the
    min-over-components weighted Mahalanobis distance, evaluated in jnp.
    """

    def __init__(self, gmm_path: Optional[str] = None):
        self.available = False
        if gmm_path and os.path.exists(gmm_path):
            import pickle
            with open(gmm_path, "rb") as f:
                gmm = pickle.load(f, encoding="latin1")
            means = np.asarray(gmm["means"], np.float32)
            covs = np.asarray(gmm["covars"], np.float32)
            weights = np.asarray(gmm["weights"], np.float32)
            self.means = jnp.asarray(means)
            self.precisions = jnp.asarray(np.linalg.inv(covs))
            # constant per-component: -log w + 0.5 log|Sigma|
            sign, logdet = np.linalg.slogdet(covs)
            self.const = jnp.asarray(-np.log(weights) + 0.5 * logdet)
            self.available = True

    def __call__(self, pose_aa_body: jnp.ndarray) -> jnp.ndarray:
        """pose_aa_body: [T, 69] axis-angle (joints 1..23) -> scalar energy."""
        diff = pose_aa_body[:, None, :] - self.means[None]      # [T, K, 69]
        maha = 0.5 * jnp.einsum("tki,kij,tkj->tk", diff,
                                self.precisions, diff)
        return jnp.mean(jnp.min(maha + self.const[None], axis=1))


class BatchedSMPLFitter:
    def __init__(self, smpl_path: Optional[str] = None,
                 num_steps: int = 300, lr: float = 0.03,
                 w_smooth: float = 1.0, w_reg: float = 1e-3,
                 gmm_path: Optional[str] = None, w_prior: float = 1e-4,
                 polish_steps: int = 25, polish_anchor: float = 1e-4):
        self.smpl = SMPLLayer(smpl_path)
        self.num_steps = num_steps
        self.lr = lr
        self.w_smooth = w_smooth
        self.w_reg = w_reg
        self.w_prior = w_prior
        self.polish_steps = polish_steps
        self.polish_anchor = polish_anchor
        if gmm_path is None and smpl_path:
            gmm_path = os.path.join(os.path.dirname(smpl_path), "gmm_08.pkl")
        self.prior = GMMPosePrior(gmm_path)
        self._fit = jax.jit(self._fit_impl)

    def _objective(self, params, target_joints):
        rot6d, trans = params["rot6d"], params["trans"]
        joints = self.smpl.joints(rot6d, trans)  # [T, 24, 3]
        data = jnp.mean(jnp.sum(
            (joints[:, :_N_FIT_JOINTS]
             - target_joints[:, :_N_FIT_JOINTS]) ** 2, -1))
        smooth = jnp.mean(jnp.sum(
            (rot6d[1:] - rot6d[:-1]) ** 2, (-1, -2))) + jnp.mean(
            jnp.sum((trans[1:] - trans[:-1]) ** 2, -1))
        ident = _identity_rot6d(rot6d.shape[0])
        reg = jnp.mean(jnp.sum((rot6d - ident) ** 2, (-1, -2)))
        total = data + self.w_smooth * smooth + self.w_reg * reg
        if self.prior.available:
            from mld_tpu.ops.rotation import rotation_6d_to_axis_angle
            pose_aa = rotation_6d_to_axis_angle(rot6d[:, 1:])  # body joints
            total = total + self.w_prior * self.prior(
                pose_aa.reshape(pose_aa.shape[0], -1))
        return total

    def _fit_impl(self, target_joints):
        T = target_joints.shape[0]
        params = {
            "rot6d": _identity_rot6d(T),
            "trans": target_joints[:, 0],  # init at root track
        }
        # cosine-decayed Adam: the flat-lr run plateaus an order of
        # magnitude above the per-frame LBFGS arm of the fit-quality
        # study; decaying to lr/25 closes the final-convergence gap
        # (scripts/fit_quality_study.py table)
        tx = optax.adam(optax.cosine_decay_schedule(
            self.lr, self.num_steps, alpha=0.04))
        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(self._objective)(params,
                                                              target_joints)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=self.num_steps)
        if self.polish_steps > 0:
            params = self._polish(params, target_joints[:, :_N_FIT_JOINTS])
        return params, losses

    # ------------------------------------------------- second-order polish
    def _frame_residual(self, p, target, p0):
        """Per-frame residual vector for Gauss-Newton.

        p: [147] = rot6d (24*6) + trans (3). Residuals are the 66 joint
        errors plus a weak anchor to the Adam iterate p0 — the anchor
        both regularizes the underdetermined dims (e.g. hand joints that
        no target constrains) and preserves the smoothness the first
        phase optimized for.
        """
        rot6d = p[: SMPL_NUM_JOINTS * 6].reshape(SMPL_NUM_JOINTS, 6)
        trans = p[SMPL_NUM_JOINTS * 6:]
        joints = self.smpl.joints(rot6d[None], trans[None])[0]
        data = (joints[:_N_FIT_JOINTS] - target).reshape(-1)
        anchor = jnp.sqrt(self.polish_anchor) * (p - p0)
        return jnp.concatenate([data, anchor])

    def _polish(self, params, targets):
        """Per-frame Levenberg-Marquardt on the Adam iterate.

        The reference reaches ~0.0022 MPJPE with per-frame strong-Wolfe
        LBFGS at ~480 ms/frame (fit.py:191-277, smplify.py:218-245);
        first-order Adam plateaus ~2.5x above it
        (docs/fit_quality_r3.json). This closes the gap with a
        curvature step: all frames' [147-param] Gauss-Newton subproblems
        are solved simultaneously (vmapped [147,147] Cholesky solves —
        microseconds on the MXU), with the classic multiplicative
        trust-region lambda carried per frame.
        """
        T = params["trans"].shape[0]
        p0 = jnp.concatenate(
            [params["rot6d"].reshape(T, -1), params["trans"]], -1)

        def one_frame(p_init, target):
            def cost(p):
                r = self._frame_residual(p, target, p_init)
                return jnp.sum(r * r)

            def step(carry, _):
                p, lam = carry
                r = self._frame_residual(p, target, p_init)
                J = jax.jacfwd(self._frame_residual)(p, target, p_init)
                H = J.T @ J + lam * jnp.eye(p.shape[0])
                g = J.T @ r
                delta = jax.scipy.linalg.solve(H, g, assume_a="pos")
                p_new = p - delta
                better = cost(p_new) < cost(p)
                p = jnp.where(better, p_new, p)
                lam = jnp.where(better, lam * 0.5, lam * 2.5)
                return (p, lam), None

            (p, _), _ = jax.lax.scan(step, (p_init, 1e-3), None,
                                     length=self.polish_steps)
            return p

        p = jax.vmap(one_frame)(p0, targets)
        return {"rot6d": p[:, : SMPL_NUM_JOINTS * 6].reshape(
                    T, SMPL_NUM_JOINTS, 6),
                "trans": p[:, SMPL_NUM_JOINTS * 6:]}

    def fit(self, joints: np.ndarray) -> Dict[str, np.ndarray]:
        """joints [T, J>=22, 3] -> {rot6d [T, 24, 6], trans [T, 3],
        joints_fit [T, 24, 3], loss_curve [steps]}"""
        target = jnp.asarray(joints[:, :_N_FIT_JOINTS], jnp.float32)
        if target.shape[1] < _N_FIT_JOINTS:
            raise ValueError("need at least 22 joints")
        params, losses = self._fit(target)
        fit_joints = self.smpl.joints(params["rot6d"], params["trans"])
        out = {k: np.asarray(v) for k, v in params.items()}
        out["joints_fit"] = np.asarray(fit_joints)
        out["loss_curve"] = np.asarray(losses)
        return out

    def vertices(self, rot6d, trans):
        """Mesh vertices for export (requires the SMPL asset)."""
        return np.asarray(self.smpl.vertices(jnp.asarray(rot6d),
                                             jnp.asarray(trans)))
