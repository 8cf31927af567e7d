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


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    """torch SmoothL1Loss(reduction='mean') semantics."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.mean(loss)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def kl_standard_normal(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """mean KL( N(mu, exp(logvar/2)) ‖ N(0,1) ), matching
    torch.distributions.kl_divergence(...).mean()."""
    return jnp.mean(0.5 * (mu ** 2 + jnp.exp(logvar) - 1.0 - logvar))


def vae_losses(feats_rst, feats_ref, joints_rst, joints_ref, mu, logvar,
               cfg: LossConfig) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    recons_feature = smooth_l1(feats_rst, feats_ref)
    recons_joints = smooth_l1(joints_rst, joints_ref)
    kl_motion = kl_standard_normal(mu, logvar)
    total = (cfg.lambda_rec * recons_feature
             + cfg.lambda_joint * recons_joints
             + cfg.lambda_kl * kl_motion)
    return total, {
        "recons_feature": recons_feature,
        "recons_joints": recons_joints,
        "kl_motion": kl_motion,
        "total": total,
    }


def diffusion_losses(pred, target, cfg: LossConfig, predict_epsilon=True
                     ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    name = "inst_loss" if predict_epsilon else "x_loss"
    loss = mse(pred, target)
    return loss, {name: loss, "total": loss}
