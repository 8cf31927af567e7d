"""Stage-dependent MLD losses as pure jnp functions.

Parity target: mld/models/losses/mld.py:10-177 —
  vae:            SmoothL1(recons_feature)*λ_rec + SmoothL1(recons_joints)*λ_joint
                  + KL(q ‖ N(0,1))*λ_kl
  diffusion:      MSE(noise_pred, noise) (ε-pred) or MSE(pred, latent) (sample-pred)
  vae_diffusion:  adds gen_feature/gen_joints terms

Reductions follow the reference exactly: plain means over the padded
tensors (padding contributes identically to both operands by construction).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from mld_tpu.config import LossConfig


def _row_mean(loss_elems: jnp.ndarray,
              row_valid: "jnp.ndarray | None") -> jnp.ndarray:
    """Mean over all elements, optionally weighting rows by validity.

    Rows here are batch entries; with static padded shapes every row has the
    same element count, so the weighted row-mean equals the plain global mean
    whenever all rows are valid (reference-exact), and excludes ghost rows
    introduced by pad-to-device-count on multi-chip meshes otherwise.
    """
    per_row = loss_elems.reshape(loss_elems.shape[0], -1).mean(axis=1)
    if row_valid is None:
        return per_row.mean()
    w = row_valid.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0, row_valid=None) -> jnp.ndarray:
    """torch SmoothL1Loss(reduction='mean') semantics."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _row_mean(loss, row_valid)


def mse(pred: jnp.ndarray, target: jnp.ndarray, row_valid=None) -> jnp.ndarray:
    return _row_mean((pred - target) ** 2, row_valid)


def kl_standard_normal(mu: jnp.ndarray, logvar: jnp.ndarray,
                       row_valid=None) -> jnp.ndarray:
    """mean KL( N(mu, exp(logvar/2)) ‖ N(0,1) ), matching
    torch.distributions.kl_divergence(...).mean()."""
    return _row_mean(0.5 * (mu ** 2 + jnp.exp(logvar) - 1.0 - logvar),
                     row_valid)


def vae_losses(feats_rst, feats_ref, joints_rst, joints_ref, mu, logvar,
               cfg: LossConfig, row_valid=None
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    recons_feature = smooth_l1(feats_rst, feats_ref, row_valid=row_valid)
    recons_joints = smooth_l1(joints_rst, joints_ref, row_valid=row_valid)
    kl_motion = kl_standard_normal(mu, logvar, row_valid=row_valid)
    total = (cfg.lambda_rec * recons_feature
             + cfg.lambda_joint * recons_joints
             + cfg.lambda_kl * kl_motion)
    return total, {
        "recons_feature": recons_feature,
        "recons_joints": recons_joints,
        "kl_motion": kl_motion,
        "total": total,
    }


def diffusion_losses(pred, target, cfg: LossConfig, predict_epsilon=True,
                     row_valid=None
                     ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    name = "inst_loss" if predict_epsilon else "x_loss"
    loss = mse(pred, target, row_valid=row_valid)
    return loss, {name: loss, "total": loss}
