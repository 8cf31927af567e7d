"""Jit-compiled training steps for both stages.

Replaces the Lightning step dispatch (mld/models/modeltype/mld.py:811-912 +
train_vae_forward:476 / train_diffusion_forward:522) with pure functions over
(TrainState, batch, rng). Frozen submodules (VAE during diffusion stage, CLIP
always) are carried in `state.frozen` and never receive gradients.

Data-parallel: the step is jitted with batch sharded along the mesh "data"
axis and params replicated; XLA inserts the gradient all-reduce over ICI.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mld_tpu.losses.mld import (
    diffusion_losses,
    kl_standard_normal,
    mse,
    smooth_l1,
    vae_losses,
)
from mld_tpu.models.mld import MLD


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any                # trainable params subtree
    frozen: Any                # frozen params (vae in stage-2, clip, ...)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_optimizer(lr: float = 1e-4,
                   weight_decay: float = 1e-2,
                   skip_nonfinite: bool = True
                   ) -> optax.GradientTransformation:
    """AdamW with torch-default hyperparams (mld.py:88-90 uses torch AdamW).

    Wrapped in `apply_if_finite`: a step with non-finite gradients is
    skipped instead of poisoning the params (the reference has no failure
    handling at all — SURVEY §5)."""
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def create_train_state(mld: MLD, params: Dict, stage: str,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> TrainState:
    tx = tx or make_optimizer(mld.cfg.train.lr)
    if stage == "vae":
        trainable = {"vae": params["vae"]}
        frozen = {k: v for k, v in params.items() if k != "vae"}
    elif stage == "diffusion":
        trainable = {"denoiser": params["denoiser"]}
        frozen = {k: v for k, v in params.items() if k != "denoiser"}
    elif stage == "vae_diffusion":
        trainable = {k: params[k] for k in ("vae", "denoiser") if k in params}
        frozen = {k: v for k, v in params.items() if k not in trainable}
    else:
        raise ValueError(f"stage {stage} not supported")
    return TrainState(step=jnp.zeros((), jnp.int32), params=trainable,
                      frozen=frozen, opt_state=tx.init(trainable), tx=tx)


def full_params(state: TrainState) -> Dict:
    return {**state.frozen, **state.params}


def _fast_dropout_key(rng):
    """Typed `rbg` key for the dropout stream.

    threefry bit generation for the per-layer dropout masks is the single
    most expensive part of a training step on TPU — the compiled HLO is
    dominated by u32 round tensors ([B,T,F]-shaped, thousands of ops).
    XLA's RngBitGenerator (`rbg`) emits bits at near-HBM speed; dropout
    needs a statistical stream, not a splittable-crypto one. Noise /
    timestep / latent sampling keep threefry (parity tests replay those
    exact streams)."""
    seed = jax.random.bits(rng, (4,), jnp.uint32)
    return jax.random.wrap_key_data(seed, impl="rbg")


# --------------------------------------------------------------------- stages
def _maybe_remat(mld: MLD, fn):
    """Rematerialize a forward under the loss when cfg.train.remat is set
    (trade FLOPs for activation memory — useful for long no-VAE clips)."""
    return jax.checkpoint(fn) if mld.cfg.train.remat else fn


def _compute_cast(mld: MLD, tree):
    """Mixed-precision training: when cfg.model.dtype == "bfloat16", the
    model forwards run with params/activations cast to bf16 (MXU at full
    rate, half the HBM traffic) while the master params, optimizer state
    and loss math stay f32. The cast is differentiable, so value_and_grad
    over the f32 masters still yields f32 gradients."""
    if mld.dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(mld.dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _f32(*xs):
    out = tuple(x.astype(jnp.float32) for x in xs)
    return out[0] if len(out) == 1 else out


def vae_loss(mld: MLD, trainable, frozen, batch, rng, train=True):
    params = _compute_cast(mld, {**frozen, **trainable})
    feats_ref = batch["motion"]
    mask = batch["mask"]
    rng_z, rng_d = jax.random.split(rng)
    if train:
        drop1, drop2 = jax.random.split(_fast_dropout_key(rng_d))
    else:
        drop1 = drop2 = None
    z, (mu, logvar) = _maybe_remat(
        mld, lambda p, f: mld.encode_motion(p, f, mask, rng_z,
                                            dropout_rng=drop1))(
            params, feats_ref.astype(mld.dtype))
    feats_rst = _maybe_remat(
        mld, lambda p, zz: mld.decode_latent(p, zz, mask,
                                             dropout_rng=drop2,
                                             serving=False))(params, z)
    feats_rst, mu, logvar = _f32(feats_rst, mu, logvar)
    joints_rst = mld.feats2joints(feats_rst)
    joints_ref = mld.feats2joints(feats_ref)
    total, logs = vae_losses(feats_rst, feats_ref, joints_rst, joints_ref,
                             mu, logvar, mld.cfg.loss,
                             row_valid=batch.get("row_valid"))
    return total, logs


def diffusion_loss(mld: MLD, trainable, frozen, batch, rng, train=True):
    params = _compute_cast(mld, {**frozen, **trainable})
    feats_ref = batch["motion"]
    mask = batch["mask"]
    B = feats_ref.shape[0]
    rng_z, rng_drop, rng_noise, rng_t, rng_cond = jax.random.split(rng, 5)

    # latent (stop-grad through frozen VAE; mld.py:526-528)
    if mld.is_vae:
        z, _ = mld.encode_motion(params, feats_ref.astype(mld.dtype),
                                 mask, rng_z)
        z = jax.lax.stop_gradient(_f32(z))
    else:
        z = feats_ref

    # condition with classifier-free-guidance drop (mld.py:536-541)
    if mld.condition in ("text", "text_uncond"):
        # serving=False: keep the frozen CLIP pass un-chunked inside the
        # train step (the chunking win was measured for serving only)
        cond = mld.encode_text_tokens(params, batch["text_ids"],
                                      serving=False)
        # the uncond embedding is prompt-independent: encode the ONE
        # stored row (context-8 in features mode, mld.py:143-149) and
        # broadcast the embedding, exactly like serving's _generate_impl
        uncond = jnp.broadcast_to(
            mld.encode_text_tokens(params, mld.uncond_ids, serving=False),
            cond.shape)
        drop = jax.random.bernoulli(
            rng_drop, mld.cfg.model.guidance_uncondp, (B, 1, 1))
        cond_emb = jnp.where(drop, uncond, cond)
        cond_emb = jax.lax.stop_gradient(cond_emb)
    else:
        cond_emb = batch["action"]

    noise = jax.random.normal(rng_noise, z.shape, z.dtype)
    t = jax.random.randint(rng_t, (B,), 0,
                           mld.schedule.num_train_timesteps)
    noisy = mld.noise_scheduler.add_noise(z, noise, t)
    rng_dropout = (_fast_dropout_key(jax.random.fold_in(rng, 7))
                   if train else None)
    denoise_fn = _maybe_remat(
        mld, lambda p, x: mld.denoise(
            p, x, t, cond_emb.astype(mld.dtype)
            if mld.condition in ("text", "text_uncond") else cond_emb,
            mask if not mld.is_vae else None,
            dropout_rng=rng_dropout, cond_rng=rng_cond if train else None,
            training=train))
    pred = _f32(denoise_fn(params, noisy.astype(mld.dtype)))

    predict_epsilon = mld.cfg.train.predict_epsilon
    target = noise if predict_epsilon else z
    total, logs = diffusion_losses(pred, target, mld.cfg.loss,
                                   predict_epsilon,
                                   row_valid=batch.get("row_valid"))
    return total, logs


def vae_diffusion_loss(mld: MLD, trainable, frozen, batch, rng, train=True):
    """Joint finetune stage (mld.py:818-830): vae recon + diffusion +
    generated-sample feature/joint losses."""
    params = {**frozen, **trainable}
    rng_v, rng_d, rng_g = jax.random.split(rng, 3)
    total_v, logs_v = vae_loss(mld, trainable, frozen, batch, rng_v, train)
    total_d, logs_d = diffusion_loss(mld, trainable, frozen, batch, rng_d,
                                     train)

    # generation pass: sample through the full reverse process
    feats_ref = batch["motion"]
    mask = batch["mask"]
    if mld.condition in ("text", "text_uncond"):
        gen_in = batch["text_ids"]
    else:
        gen_in = batch["action"]
    # the reference computes the generation pass under torch.no_grad()
    # (mld.py:554-616 test_diffusion_forward): gen losses are monitoring
    # terms only and must NOT backprop through the reverse-diffusion scan.
    # stop_gradient must be applied to the PARAMS, not just the output:
    # under value_and_grad, params with live tangents entering the fused
    # Pallas serving kernels (which have no JVP rule) fail at trace time
    # even if the result is later stop_gradient'ed.
    sg_params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    gen_feats = jax.lax.stop_gradient(
        mld._generate_impl(sg_params, gen_in, mask, rng_g))
    gen_joints = mld.feats2joints(gen_feats)
    joints_ref = mld.feats2joints(feats_ref)
    row_valid = batch.get("row_valid")
    gen_feature = smooth_l1(gen_feats, feats_ref, row_valid=row_valid)
    gen_joints_l = smooth_l1(gen_joints, joints_ref, row_valid=row_valid)

    cfg = mld.cfg.loss
    total = (total_v + total_d + cfg.lambda_gen * gen_feature
             + cfg.lambda_joint * gen_joints_l)
    logs = {**logs_v, **logs_d, "gen_feature": gen_feature,
            "gen_joints": gen_joints_l, "total": total}
    return total, logs


_STAGE_LOSSES = {"vae": vae_loss, "diffusion": diffusion_loss,
                 "vae_diffusion": vae_diffusion_loss}


def make_train_step(mld: MLD, stage: str, donate: bool = True):
    """Returns jitted step: (state, batch, rng) -> (state, logs)."""
    loss_fn = _STAGE_LOSSES[stage]

    def step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(mld, p, state.frozen, batch, rng),
            has_aux=True)
        (_, logs), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads)
        logs = dict(logs)
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_scan(mld: MLD, stage: str, donate: bool = True):
    """Returns jitted multi-step program: (state, batches, rng) ->
    (state, logs[K]) where `batches` is a batch dict with a leading
    step axis [K, ...] and the K optimizer steps run as one lax.scan.

    One dispatch + one host->device transfer per K steps: per-step launch
    latency (which dominates on tunneled/remote devices and adds host
    jitter everywhere) is amortized K-fold. Semantics are identical to
    calling make_train_step K times.
    """
    loss_fn = _STAGE_LOSSES[stage]

    def multi(state: TrainState, batches, rng):
        k = jax.tree_util.tree_leaves(batches)[0].shape[0]
        rngs = jax.random.split(rng, k)

        def body(st, inp):
            batch, srng = inp
            grad_fn = jax.value_and_grad(
                lambda p: loss_fn(mld, p, st.frozen, batch, srng),
                has_aux=True)
            (_, logs), grads = grad_fn(st.params)
            logs = dict(logs)
            logs["grad_norm"] = optax.global_norm(grads)
            return st.apply_gradients(grads), logs

        return jax.lax.scan(body, state, (batches, rngs))

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def make_device_train_scan(mld: MLD, stage: str, batch_size: int,
                           donate: bool = True):
    """K optimizer steps per dispatch with ON-DEVICE batch sampling from a
    device-resident corpus (data/device_dataset.py): (state, arrays, rng,
    K static) -> (state, logs[K]).

    The steady-state training loop transfers nothing per dispatch but one
    PRNG key — the host input pipeline (and its serialized tunnel uploads,
    the measured bottleneck) vanishes from the loop entirely.
    """
    from mld_tpu.data.device_dataset import sample_batch

    loss_fn = _STAGE_LOSSES[stage]
    unit = mld.cfg.dataset.unit_len
    max_len = mld.cfg.dataset.max_motion_len

    def multi(state: TrainState, arrays, rng, k: int):
        rngs = jax.random.split(rng, k)

        def body(st, srng):
            k_batch, k_step = jax.random.split(srng)
            batch = sample_batch(arrays, k_batch, batch_size, unit,
                                 max_len)
            grad_fn = jax.value_and_grad(
                lambda p: loss_fn(mld, p, st.frozen, batch, k_step),
                has_aux=True)
            (_, logs), grads = grad_fn(st.params)
            logs = dict(logs)
            logs["grad_norm"] = optax.global_norm(grads)
            return st.apply_gradients(grads), logs

        return jax.lax.scan(body, state, rngs)

    return jax.jit(multi, static_argnums=(3,),
                   donate_argnums=(0,) if donate else ())


def make_eval_step(mld: MLD, stage: str):
    loss_fn = _STAGE_LOSSES[stage]

    def step(state: TrainState, batch, rng):
        _, logs = loss_fn(mld, state.params, state.frozen, batch, rng,
                          train=False)
        return logs

    return jax.jit(step)
